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
}
