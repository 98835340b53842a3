package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** FlacEncode round-trips through the fixture-validated FlacDecode:
  * every reference fixture's PCM re-encodes to a stream the strict
  * decoder (CRC-8/CRC-16/STREAMINFO-MD5 ladder) accepts and reconstructs
  * sample-exactly at the native params. */
class FlacEncodeSpec extends AnyFunSuite {

  private def resourceBytes(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try in.readAllBytes() finally in.close()
  }

  private val fixtures = Seq(
    "fixed_orders", "verbatim8", "lpc_orders", "stereo_modes", "bits24_ms",
    "wasted_bits", "escape_parts", "short_tail", "tune_n", "tune_o")

  for (name <- fixtures) {
    test(s"$name PCM survives encode -> strict decode sample-exactly") {
      val d = FlacDecode.decode(resourceBytes(s"/flac/$name.flac")).get
      val enc = FlacEncode.encode(d.samples, d.sampleRate, d.channels,
        d.bitsPerSample)
      val rt = FlacDecode.decode(enc)
      assert(rt.isDefined, s"$name re-encode rejected by the strict decoder")
      assert(rt.get.sampleRate == d.sampleRate && rt.get.channels == d.channels
        && rt.get.bitsPerSample == d.bitsPerSample)
      assert(java.util.Arrays.equals(rt.get.samples, d.samples),
        s"$name round-trip not sample-exact")
    }
  }

  test("pathological inputs: noise, constants, tiny and odd-tail blocks") {
    val rng = new java.util.Random(7)
    val cases = Seq(
      ("white noise 16-bit stereo", Array.fill(2 * 777)(rng.nextInt(65536) - 32768), 2, 16),
      ("constant mono", Array.fill(500)(1234), 1, 16),
      ("single sample", Array(-42), 1, 16),
      ("8-bit sawtooth", Array.tabulate(300)(i => (i % 255) - 127), 1, 8),
      ("24-bit ramp", Array.tabulate(1000)(i => i * 8000 - 4000000), 1, 24))
    for ((label, pcm, ch, bits) <- cases) {
      val enc = FlacEncode.encode(pcm, 8000, ch, bits, blockSize = 192)
      val d = FlacDecode.decode(enc)
      assert(d.isDefined, s"$label rejected")
      assert(java.util.Arrays.equals(d.get.samples, pcm), s"$label not exact")
    }
  }

  test("multi-frame indexing: streams longer than 128 blocks keep sync") {
    // exercises the multi-byte coded frame number (frame 128+)
    val pcm = Array.tabulate(130 * 16)(i => (i * 37) % 1000 - 500)
    val enc = FlacEncode.encode(pcm, 8000, 1, 16, blockSize = 16)
    val d = FlacDecode.decode(enc)
    assert(d.isDefined && java.util.Arrays.equals(d.get.samples, pcm))
  }
}
