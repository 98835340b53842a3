package graft.multimodal

/** Pure-JVM FLAC encoder (RFC 9639) — the write half of the audio
  * conversion tier, making WAV↔FLAC a real round-trip the way the image
  * tier round-trips PNG↔WebP. Emits spec-conformant streams: STREAMINFO
  * with the true PCM MD5 (so any decoder running the `flac -t` ladder —
  * ours does — verifies the samples end-to-end), fixed-blocksize frames
  * with per-channel subframe selection among CONSTANT / VERBATIM /
  * FIXED(0–4), Rice-coded residuals with a per-partition parameter fit,
  * and frame CRC-8/CRC-16.
  *
  * Compression is deliberately modest (fixed predictors only — no LPC
  * analysis, no stereo decorrelation search): the engine's job is a
  * correct, verifiable interchange path, not squeezing the last percent;
  * a deployment that needs ratio swaps in libFLAC behind the same byte
  * contract. Correctness is what's locked: FlacEncodeSpec round-trips
  * every reference fixture's PCM through encode→[[FlacDecode]] (which
  * re-verifies CRCs and the MD5) sample-exactly, and q205 hash-gates the
  * same round-trip against q204's oracle literals. */
object FlacEncode {

  private final class BitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def write(v: Long, bits: Int): Unit = {
      var left = bits
      while (left > 0) {
        val take = math.min(left, 56 - n)
        acc = (acc << take) | ((v >>> (left - take)) & ((1L << take) - 1))
        n += take
        left -= take
        while (n >= 8) {
          n -= 8
          out.write(((acc >>> n) & 0xff).toInt)
        }
      }
    }
    def writeSigned(v: Int, bits: Int): Unit = write(v.toLong & ((1L << bits) - 1), bits)
    def writeUnary(q: Int): Unit = {
      var left = q
      while (left >= 32) { write(0L, 32); left -= 32 }
      write(1L, left + 1)
    }
    def align(): Unit = if (n > 0) write(0L, 8 - n)
    def bytes: Array[Byte] = { require(n == 0); out.toByteArray }
  }

  private def crc8(b: Array[Byte]): Int = {
    var crc = 0
    for (x <- b) {
      crc ^= x & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
    }
    crc
  }

  private def crc16(b: Array[Byte]): Int = {
    var crc = 0
    for (x <- b) {
      crc ^= (x & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
    }
    crc
  }

  private def utf8Coded(n0: Long): Array[Byte] = {
    if (n0 < 0x80) return Array(n0.toByte)
    var nBytes = 2
    while (n0 >= (1L << (5 * nBytes + 1)) && nBytes < 6) nBytes += 1
    val head = ((0xff << (8 - nBytes)) & 0xff) | (n0 >> (6 * (nBytes - 1))).toInt
    val out = new Array[Byte](nBytes)
    out(0) = head.toByte
    var i = 1
    while (i < nBytes) {
      out(i) = (0x80 | ((n0 >> (6 * (nBytes - 1 - i))) & 0x3f)).toByte
      i += 1
    }
    out
  }

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  private def residual(x: Array[Int], order: Int): Array[Long] = {
    val c = FixedCoefs(order)
    val out = new Array[Long](x.length - order)
    var i = order
    while (i < x.length) {
      var p = 0L
      var j = 0
      while (j < c.length) { p += c(j).toLong * x(i - 1 - j); j += 1 }
      out(i - order) = x(i) - p
      i += 1
    }
    out
  }

  private def zigzag(r: Long): Long = if (r >= 0) r << 1 else (-r << 1) - 1

  /** Rice parameter minimizing an upper-bound cost for this partition. */
  private def bestRice(res: Array[Long], from: Int, until: Int): (Int, Long) = {
    var bestK = 0
    var bestCost = Long.MaxValue
    var k = 0
    while (k <= 14) {
      var cost = 0L
      var i = from
      while (i < until && cost < bestCost) {
        cost += (zigzag(res(i)) >>> k) + 1 + k
        i += 1
      }
      if (cost < bestCost) { bestCost = cost; bestK = k }
      k += 1
    }
    (bestK, bestCost)
  }

  private def writeSubframe(bw: BitWriter, x: Array[Int], bps: Int): Unit = {
    val n = x.length
    val const = n > 0 && x.forall(_ == x(0))
    if (const) {
      bw.write(0L, 1); bw.write(0L, 6); bw.write(0L, 1)
      bw.writeSigned(x(0), bps)
      return
    }
    // pick the fixed order with the cheapest rice-bound residual; fall
    // back to verbatim when prediction doesn't pay (noise, 8-bit chirps)
    var bestOrder = 0
    var bestCost = Long.MaxValue
    var bestRes: Array[Long] = null
    var o = 0
    while (o <= 4 && o < n) {
      val res = residual(x, o)
      val (_, cost) = bestRice(res, 0, res.length)
      val total = cost + o.toLong * bps
      if (total < bestCost) { bestCost = total; bestOrder = o; bestRes = res }
      o += 1
    }
    if (bestCost >= n.toLong * bps) {
      bw.write(0L, 1); bw.write(1L, 6); bw.write(0L, 1)
      var i = 0
      while (i < n) { bw.writeSigned(x(i), bps); i += 1 }
      return
    }
    bw.write(0L, 1)
    bw.write(0x08L | bestOrder, 6)
    bw.write(0L, 1) // no wasted bits
    var i = 0
    while (i < bestOrder) { bw.writeSigned(x(i), bps); i += 1 }
    // residual: RICE method, partition order 0 (one partition), fitted k
    val (k, _) = bestRice(bestRes, 0, bestRes.length)
    bw.write(0L, 2)
    bw.write(0L, 4)
    bw.write(k.toLong, 4)
    i = 0
    while (i < bestRes.length) {
      val u = zigzag(bestRes(i))
      bw.writeUnary((u >>> k).toInt)
      bw.write(u & ((1L << k) - 1), k)
      i += 1
    }
  }

  private val SampleSizeCodes = Map(8 -> 1L, 12 -> 2L, 16 -> 4L, 20 -> 5L, 24 -> 6L)

  /** Encode interleaved samples (frame-major) to a complete FLAC stream.
    * `bps` ∈ {8, 12, 16, 20, 24}; samples must fit bps bits signed. */
  def encode(samples: Array[Int], sampleRate: Int, channels: Int,
             bps: Int, blockSize: Int = 4096): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(SampleSizeCodes.contains(bps), s"unsupported bps $bps")
    require(sampleRate > 0 && sampleRate < (1 << 20), s"sampleRate $sampleRate")
    require(samples.length % channels == 0, "ragged interleave")
    val nFrames = samples.length / channels
    // STREAMINFO
    val md5 = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val nb = (bps + 7) / 8
      val buf = new Array[Byte](samples.length * nb)
      var i = 0
      while (i < samples.length) {
        var k = 0
        while (k < nb) { buf(i * nb + k) = ((samples(i) >> (8 * k)) & 0xff).toByte; k += 1 }
        i += 1
      }
      d.digest(buf)
    }
    val si = new BitWriter
    // min/max blocksize: the spec excludes the (possibly short) LAST
    // frame from the minimum, so a fixed-blocksize stream reports the
    // nominal size for both regardless of the tail
    si.write(blockSize.toLong, 16)
    si.write(blockSize.toLong, 16)
    si.write(0L, 24); si.write(0L, 24)
    si.write(sampleRate.toLong, 20)
    si.write((channels - 1).toLong, 3)
    si.write((bps - 1).toLong, 5)
    si.write(nFrames.toLong, 36)
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.bytes)
    out.write(md5)
    // frames
    var frameIdx = 0L
    var pos = 0
    while (pos < nFrames) {
      val bs = math.min(blockSize, nFrames - pos)
      val hw = new BitWriter
      hw.write(0x3ffeL, 14)
      hw.write(0L, 1)
      hw.write(0L, 1) // fixed blocksize strategy
      hw.write(0x7L, 4) // 16-bit blocksize-1 at header end
      hw.write(0L, 4) // sample rate from STREAMINFO
      hw.write((channels - 1).toLong, 4) // independent channels
      hw.write(SampleSizeCodes(bps), 3)
      hw.write(0L, 1)
      for (b <- utf8Coded(frameIdx)) hw.write(b.toLong & 0xff, 8)
      hw.write((bs - 1).toLong, 16)
      val header = hw.bytes
      val fw = new BitWriter
      for (b <- header) fw.write(b.toLong & 0xff, 8)
      fw.write(crc8(header).toLong, 8)
      var c = 0
      while (c < channels) {
        val ch = new Array[Int](bs)
        var i = 0
        while (i < bs) { ch(i) = samples((pos + i) * channels + c); i += 1 }
        writeSubframe(fw, ch, bps)
        c += 1
      }
      fw.align()
      val body = fw.bytes
      fw.write(crc16(body).toLong, 16)
      out.write(fw.bytes, 0, fw.bytes.length)
      pos += bs
      frameIdx += 1
    }
    out.toByteArray
  }
}
