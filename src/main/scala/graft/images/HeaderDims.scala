package graft.images

/** Header-only (width, height) parsers for formats javax.imageio has no
  * reader for in this offline JVM: WebP (all three bitstream flavors) and
  * HEIC/HEIF/AVIF (ISO-BMFF `ispe`). Closes the dims tier of the
  * reference's HEIC/WebP surface (`modules/tiling.py:87` accepts `.heic`
  * at scan; `other_tasks.py:59-60` lists webp in the conversion matrix):
  * the S2/F5 "dims without decode" projection works for these formats
  * even though pixel decode remains out of scope (the reference degrades
  * the same way without pillow-heif/imageio —
  * `batch_processor.py:12-22`).
  *
  * Pure byte-array functions — no I/O, no state; used from the same
  * per-row UDF path as the ImageIO header probe ([[ImageCodec.dimsOf]]
  * falls back here when no ImageIO reader claims the bytes). Malformed
  * or truncated input returns None (C2 per-item isolation), never
  * throws.
  */
object HeaderDims {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
  private def le32(b: Array[Byte], i: Int): Long =
    (le16(b, i).toLong) | (le16(b, i + 2).toLong << 16)
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + s.length && s.indices.forall(k => u8(b, i + k) == s.charAt(k))

  /** Dims from any supported header; tried in signature order. */
  def dims(bytes: Array[Byte]): Option[(Int, Int)] =
    try webpDims(bytes).orElse(heifDims(bytes))
    catch { case _: Exception => None }

  /** WebP: RIFF container, first chunk decides the flavor.
    *  - `VP8 ` (lossy): 3-byte frame tag, start code 9D 01 2A, then two
    *    LE16s whose low 14 bits are width/height (upper 2 bits are the
    *    scaling hint).
    *  - `VP8L` (lossless): 0x2F signature, then 28 bits of (w−1, h−1)
    *    packed LE, 14 bits each.
    *  - `VP8X` (extended): 4 flag bytes, then LE24 canvas (w−1, h−1). */
  def webpDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 25 || !tag(b, 0, "RIFF") || !tag(b, 8, "WEBP")) return None
    if (tag(b, 12, "VP8 ")) {
      if (b.length < 30 || u8(b, 23) != 0x9d || u8(b, 24) != 0x01 || u8(b, 25) != 0x2a) None
      else Some((le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff))
    } else if (tag(b, 12, "VP8L")) {
      if (u8(b, 20) != 0x2f) None
      else {
        val bits = le32(b, 21)
        Some((((bits & 0x3fff) + 1).toInt, (((bits >>> 14) & 0x3fff) + 1).toInt))
      }
    } else if (tag(b, 12, "VP8X")) {
      if (b.length < 30) None
      else Some((le24(b, 24) + 1, le24(b, 27) + 1))
    } else None
  }

  /** HEIC/HEIF/AVIF: ISO-BMFF box walk `meta` → `iprp` → `ipco`,
    * collecting every `ispe` (Image Spatial Extents: fullbox, BE32 w/h).
    * An HEIC carries one ispe per item (primary, thumbnail, grid tiles);
    * the PRIMARY image is the largest canvas, so the max-area ispe is
    * reported — matching what a full decoder (pillow-heif) returns for
    * every non-adversarial file without parsing the item-reference
    * graph. */
  def heifDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 16 || !tag(b, 4, "ftyp")) return None
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    // fullbox containers carry 4 version/flags bytes before children
    def walk(start: Long, end: Long): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size0 = be32(b, off.toInt)
        val boxEnd =
          if (size0 == 0) end
          else if (size0 == 1) {
            if (off + 16 > end) return
            off + be64(b, off.toInt + 8)
          } else off + size0
        if (boxEnd > end || boxEnd <= off) return
        val t = off.toInt + 4
        if (tag(b, t, "meta")) walk(off + 12, boxEnd)
        else if (tag(b, t, "iprp") || tag(b, t, "ipco")) walk(off + 8, boxEnd)
        else if (tag(b, t, "ispe") && boxEnd >= off + 20)
          found += ((be32(b, off.toInt + 12).toInt, be32(b, off.toInt + 16).toInt))
        off = boxEnd
      }
    }
    walk(0L, b.length.toLong)
    if (found.isEmpty) None
    else Some(found.maxBy { case (w, h) => w.toLong * h })
  }

  /** TIFF-based RAW (CR2/NEF/ARW/DNG — the reference accepts these at
    * scan, `modules/tiling.py:87`, and converts RAW via imageio,
    * `modules/other_tasks.py:45-51`): header-only dims from the IFD
    * tree. IFD0 of a RAW file is typically the embedded THUMBNAIL, so
    * every chained IFD and SubIFD (tag 0x014A) is walked and the
    * max-area (ImageWidth, ImageLength) pair wins — [[heifDims]]'
    * primary-image policy. Fires ONLY on definite RAW signatures (CR2's
    * "CR" marker, a DNGVersion tag, or a NIKON/SONY Make tag), so plain
    * TIFF keeps going to the JDK's ImageIO reader; full RAW pixel
    * decode (demosaic) stays declared-out-of-scope like HEIC/WebP
    * decode. Pixel-free, total: malformed input → None. */
  /** EXIF Orientation (TIFF tag 0x0112, values 1-8) from a JPEG's APP1
    * Exif segment, or from TIFF-direct bytes. Byte-level and total like
    * every parser here: segments are walked FF-marker by FF-marker until
    * SOS; the embedded TIFF is read at its own endianness with all
    * offsets relative to the TIFF header (the classic Exif off-by-base
    * bug class). Missing segment / tag / malformed input → None — a
    * pipeline treats that as orientation 1 (top-left) by convention,
    * but the DISTINCTION matters for audits, so None is surfaced. */
  def exifOrientation(b: Array[Byte]): Option[Int] =
    try {
      def tiffOrientation(base: Int, limit: Int): Option[Int] = {
        if (base + 8 > limit) return None
        val le = tag(b, base, "II") && u8(b, base + 2) == 42
        val be = tag(b, base, "MM") && u8(b, base + 3) == 42
        if (!le && !be) return None
        def u16(i: Int): Int =
          if (le) le16(b, i) else (u8(b, i) << 8) | u8(b, i + 1)
        def u32(i: Int): Long = if (le) le32(b, i) else be32(b, i)
        val ifd = base + u32(base + 4).toInt
        if (ifd + 2 > limit) return None
        val n = u16(ifd)
        var i = 0
        while (i < n && ifd + 2 + 12 * (i + 1) <= limit) {
          val e = ifd + 2 + 12 * i
          if (u16(e) == 0x0112 && u16(e + 2) == 3) {
            val v = u16(e + 8)
            return if (v >= 1 && v <= 8) Some(v) else None
          }
          i += 1
        }
        None
      }
      if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
        // JPEG: walk segments to find APP1/Exif
        var i = 2
        while (i + 4 <= b.length && u8(b, i) == 0xff) {
          val marker = u8(b, i + 1)
          if (marker == 0xda) return None // SOS: entropy data, stop
          val len = (u8(b, i + 2) << 8) | u8(b, i + 3)
          if (marker == 0xe1 && tag(b, i + 4, "Exif") &&
              u8(b, i + 8) == 0 && u8(b, i + 9) == 0)
            return tiffOrientation(i + 10, math.min(b.length, i + 2 + len))
          i += 2 + len
        }
        None
      } else if (b.length >= 8 && (tag(b, 0, "II") || tag(b, 0, "MM")))
        tiffOrientation(0, b.length)
      else None
    } catch { case _: Exception => None }

  def rawDims(b: Array[Byte]): Option[(Int, Int)] =
    try {
      if (b.length < 8) return None
      val le = tag(b, 0, "II") && u8(b, 2) == 42 && u8(b, 3) == 0
      val be = tag(b, 0, "MM") && u8(b, 2) == 0 && u8(b, 3) == 42
      if (!le && !be) return None
      def u16(i: Int): Int =
        if (le) le16(b, i) else (u8(b, i) << 8) | u8(b, i + 1)
      def u32(i: Int): Long = if (le) le32(b, i) else be32(b, i)

      val isCr2 = b.length >= 10 && tag(b, 8, "CR")
      var isRawTagged = false // DNGVersion or a known RAW vendor Make
      var best = Option.empty[(Int, Int)]
      var visited = 0
      def walkIfd(offL: Long): Unit = {
        val off = offL.toInt
        if (offL <= 0 || offL > Int.MaxValue || off + 2 > b.length) return
        if (visited > 32) return
        visited += 1
        val n = u16(off)
        var w = -1L; var h = -1L
        val subs = scala.collection.mutable.ArrayBuffer.empty[Long]
        var i = 0
        while (i < n && off + 2 + 12 * (i + 1) <= b.length) {
          val e = off + 2 + 12 * i
          val t = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
          val inline: Long =
            if (typ == 3) u16(e + 8) else if (typ == 4) u32(e + 8) else -1L
          if (t == 256) w = inline
          else if (t == 257) h = inline
          else if (t == 0xc612) isRawTagged = true // DNGVersion
          else if (t == 271 && typ == 2) {        // Make, ASCII
            val p = (if (cnt <= 4) e + 8 else u32(e + 8)).toInt
            if (p >= 0 && p + 5 <= b.length) {
              val make = new String(b, p, math.min(cnt.toInt, 16).max(0),
                "ISO-8859-1").takeWhile(_ != 0)
              if (make.startsWith("NIKON") || make.startsWith("SONY"))
                isRawTagged = true
            }
          } else if (t == 0x014a && (typ == 4 || typ == 13)) { // SubIFD(s)
            if (cnt == 1) subs += u32(e + 8)
            else {
              val p = u32(e + 8).toInt
              var k = 0
              while (k < cnt && p >= 0 && p + 4 * (k + 1) <= b.length) {
                subs += u32(p + 4 * k); k += 1
              }
            }
          }
          i += 1
        }
        if (w > 0 && h > 0 &&
          best.forall { case (bw, bh) => w * h > bw.toLong * bh })
          best = Some((w.toInt, h.toInt))
        subs.foreach(walkIfd)
        val nextPtr = off + 2 + 12 * n
        if (nextPtr + 4 <= b.length) walkIfd(u32(nextPtr))
      }
      walkIfd(u32(4))
      if (isCr2 || isRawTagged) best else None
    } catch { case _: Exception => None }
}
