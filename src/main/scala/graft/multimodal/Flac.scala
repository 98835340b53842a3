package graft.multimodal

/** FLAC header-only metadata from the mandatory STREAMINFO block: sample
  * rate, channel count and total-sample count live in the first metadata
  * block of every FLAC stream (format spec: "fLaC" magic, then metadata
  * blocks, STREAMINFO first) — no frame decode, no codec library, pure
  * bit offsets, same contract as [[Mp3.parse]]/[[Mp4.parse]].
  *
  * Total: any payload without the magic or a well-formed 34-byte
  * STREAMINFO yields None (quarantine contract). A total-samples field of
  * 0 means "unknown" per spec and is also quarantined here — a metadata
  * row without duration would break the typed struct's promise.
  */
object Flac {

  def parse(b: Array[Byte]): Option[Mp3.AudioMeta] =
    try {
      if (b.length < 4 + 4 + 34) return None
      if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return None
      // metadata block header: 1 bit last-flag, 7 bits type, 24 bits length
      val blockType = b(4) & 0x7f
      val blockLen = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
      if (blockType != 0 || blockLen != 34) return None // STREAMINFO must be first
      val o = 8
      // STREAMINFO bit layout after the four 16/16/24/24-bit size fields
      // (10 bytes): sample rate 20 bits, channels-1 3 bits, bps-1 5 bits,
      // total samples 36 bits
      val sr = ((b(o + 10) & 0xff) << 12) | ((b(o + 11) & 0xff) << 4) |
        ((b(o + 12) & 0xff) >> 4)
      val channels = ((b(o + 12) >> 1) & 0x7) + 1
      val totalSamples =
        ((b(o + 13) & 0xfL) << 32) | ((b(o + 14) & 0xffL) << 24) |
          ((b(o + 15) & 0xffL) << 16) | ((b(o + 16) & 0xffL) << 8) |
          (b(o + 17) & 0xffL)
      if (sr <= 0 || totalSamples <= 0) None
      else Some(Mp3.AudioMeta(sr, channels, totalSamples * 1000L / sr))
    } catch { case _: Exception => None }
}
