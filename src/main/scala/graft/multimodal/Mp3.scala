package graft.multimodal

/** MPEG-1/2/2.5 Layer III (MP3) header-only metadata: sample rate and
  * channel count from the first valid frame header, duration from walking
  * every frame header (each one encodes its own byte length, so VBR files
  * measure exactly) — no decoding, no codec library, pure byte offsets.
  * The JDK's AudioSystem has no MP3 SPI, so this closes the "MP3 metadata
  * is a stub" gap the honest way: the container math IS public spec.
  *
  * Total like [[Mp4.parse]]: any payload without a parsable frame chain
  * yields None (quarantine contract). An ID3v2 tag prefix is skipped via
  * its syncsafe length; leading junk is tolerated by scanning to the
  * first valid header.
  */
object Mp3 {

  /** Field names match [[Multimodal.audioMeta]]'s struct schema. */
  final case class AudioMeta(sample_rate: Int, channels: Int, duration_ms: Long)

  // index: [versionGroup][sampleRateIndex]; versionGroup 0=MPEG1, 1=MPEG2, 2=MPEG2.5
  private val SampleRates = Array(
    Array(44100, 48000, 32000),
    Array(22050, 24000, 16000),
    Array(11025, 12000, 8000))

  // Layer III bitrates (kbps); MPEG2/2.5 share one table
  private val BitratesV1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BitratesV2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private final case class Frame(sampleRate: Int, channels: Int,
                                 samples: Int, byteLen: Int)

  /** Decode one Layer III frame header at `o`, or None if invalid. */
  private def frameAt(b: Array[Byte], o: Int): Option[Frame] = {
    if (o + 4 > b.length) return None
    val h0 = b(o) & 0xff; val h1 = b(o + 1) & 0xff
    val h2 = b(o + 2) & 0xff; val h3 = b(o + 3) & 0xff
    if (h0 != 0xff || (h1 & 0xe0) != 0xe0) return None
    val versionBits = (h1 >> 3) & 0x3 // 0=2.5, 2=MPEG2, 3=MPEG1 (1 reserved)
    val layerBits = (h1 >> 1) & 0x3   // 1 = Layer III
    if (versionBits == 1 || layerBits != 1) return None
    val vGroup = if (versionBits == 3) 0 else if (versionBits == 2) 1 else 2
    val brIdx = (h2 >> 4) & 0xf
    val srIdx = (h2 >> 2) & 0x3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/bad
    val bitrate = (if (vGroup == 0) BitratesV1 else BitratesV2)(brIdx) * 1000
    val sampleRate = SampleRates(vGroup)(srIdx)
    val padding = (h2 >> 1) & 0x1
    val channels = if (((h3 >> 6) & 0x3) == 3) 1 else 2
    // Layer III: 1152 samples/frame (MPEG1), 576 (MPEG2/2.5);
    // frame bytes = samplesPerFrame/8 * bitrate / sampleRate + padding
    val samples = if (vGroup == 0) 1152 else 576
    val len = samples / 8 * bitrate / sampleRate + padding
    if (len < 4) None else Some(Frame(sampleRate, channels, samples, len))
  }

  /** Offset just past an ID3v2 tag, if present (10-byte header with a
    * 28-bit syncsafe payload size). */
  private def skipId3(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      10 + size
    } else 0

  def parse(bytes: Array[Byte]): Option[AudioMeta] =
    try {
      var off = skipId3(bytes)
      // tolerate leading junk: scan to the first offset that parses AND
      // whose implied next frame also parses (a random 0xFF byte rarely
      // fakes two chained headers)
      var first: Option[Frame] = None
      while (first.isEmpty && off + 4 <= bytes.length) {
        first = frameAt(bytes, off).filter { f =>
          val next = off + f.byteLen
          next >= bytes.length || frameAt(bytes, next).isDefined
        }
        if (first.isEmpty) off += 1
      }
      first.map { f0 =>
        var totalSamples = 0L
        var cur: Option[Frame] = first
        while (cur.isDefined) {
          totalSamples += cur.get.samples
          off += cur.get.byteLen
          cur = frameAt(bytes, off)
        }
        AudioMeta(f0.sampleRate, f0.channels,
          totalSamples * 1000L / f0.sampleRate)
      }
    } catch { case _: Exception => None }
}
