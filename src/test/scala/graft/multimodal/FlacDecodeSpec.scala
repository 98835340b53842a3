package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** FlacDecode vs the committed reference fixtures: every stream produced
  * by the independent spec-based encoder (tools/gen_flac_fixtures.py)
  * must reconstruct its raw-PCM sidecar SAMPLE-EXACTLY, through the
  * format's own CRC-8 / CRC-16 / STREAMINFO-MD5 integrity ladder. */
class FlacDecodeSpec extends AnyFunSuite {

  private def resourceBytes(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try in.readAllBytes() finally in.close()
  }

  private def sidecarPcm(name: String): Array[Int] = {
    val raw = resourceBytes(s"/flac_pcm/$name.pcm")
    val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(raw.length / 4)(bb.getInt())
  }

  private val expected: Map[String, (Int, Int, Int)] = Map(
    // name -> (sampleRate, channels, bitsPerSample)
    "fixed_orders" -> (8000, 1, 16),
    "verbatim8" -> (8000, 1, 8),
    "lpc_orders" -> (16000, 1, 16),
    "stereo_modes" -> (44100, 2, 16),
    "bits24_ms" -> (48000, 2, 24),
    "wasted_bits" -> (8000, 1, 16),
    "escape_parts" -> (8000, 1, 16),
    "short_tail" -> (22050, 1, 16),
    "tune_n" -> (22050, 2, 16),
    "tune_o" -> (8000, 1, 24))

  for ((name, (sr, ch, bps)) <- expected.toSeq.sortBy(_._1)) {
    test(s"$name.flac decodes sample-exact to its PCM sidecar") {
      val got = FlacDecode.decode(resourceBytes(s"/flac/$name.flac"))
      assert(got.isDefined, s"$name failed to decode")
      val d = got.get
      assert((d.sampleRate, d.channels, d.bitsPerSample) == ((sr, ch, bps)))
      val want = sidecarPcm(name)
      assert(d.samples.length == want.length,
        s"sample count ${d.samples.length} vs ${want.length}")
      d.samples.indices.find(i => d.samples(i) != want(i)).foreach(i =>
        fail(s"first divergence at $i: got ${d.samples(i)} want ${want(i)}"))
    }
  }

  test("decoded stream params agree with the header-only Flac.parse tier") {
    for (name <- expected.keys) {
      val bytes = resourceBytes(s"/flac/$name.flac")
      val full = FlacDecode.decode(bytes).get
      val meta = Flac.parse(bytes).get
      assert(meta.sample_rate == full.sampleRate && meta.channels == full.channels)
      assert(meta.duration_ms ==
        (full.samples.length / full.channels).toLong * 1000L / full.sampleRate)
    }
  }

  test("corruption anywhere in the integrity ladder quarantines (None)") {
    val clean = resourceBytes("/flac/fixed_orders.flac")
    assert(FlacDecode.decode(clean).isDefined)
    // flip a bit in the audio payload: CRC-16 (and MD5) must catch it
    val corruptPayload = clean.clone()
    corruptPayload(clean.length - 40) = (corruptPayload(clean.length - 40) ^ 0x10).toByte
    assert(FlacDecode.decode(corruptPayload).isEmpty, "payload corruption not caught")
    // flip a bit in the first frame header: CRC-8 must catch it
    val corruptHeader = clean.clone()
    corruptHeader(4 + 4 + 34 + 2) = (corruptHeader(4 + 4 + 34 + 2) ^ 0x01).toByte
    assert(FlacDecode.decode(corruptHeader).isEmpty, "header corruption not caught")
    // truncation mid-frame
    assert(FlacDecode.decode(clean.take(clean.length - 10)).isEmpty)
    // non-FLAC payloads
    assert(FlacDecode.decode("not a flac stream at all".getBytes).isEmpty)
    assert(FlacDecode.decode(Array.emptyByteArray).isEmpty)
  }
}
