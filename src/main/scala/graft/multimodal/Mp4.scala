package graft.multimodal

/** Minimal MP4/QuickTime (ISO base media) container-metadata parser: pure
  * byte walking over the box tree, no codec. Extracts what a video
  * pipeline's metadata stage needs — track dimensions (`tkhd`), movie
  * duration (`mvhd`), and frame rate derived from the sample table
  * (`stts` deltas at the `mdhd` media timescale) — so
  * [[Multimodal.videoMeta]] / [[Multimodal.frameSampleGrid]] can run from
  * real file bytes rather than caller-supplied columns.
  *
  * Parsing is total: any malformed, truncated, or non-BMFF payload (and
  * any file without a video track) yields None — the same quarantine
  * contract as audio/image decode. Only the box headers and the handful
  * of fixed-offset fields below are touched; sample DATA (`mdat`) is
  * never read, so this is header-cost even on multi-GB payloads.
  */
object Mp4 {

  /** Field names match [[Multimodal.videoMeta]]'s struct schema. */
  final case class VideoMeta(width: Int, height: Int, fps: Double, duration_ms: Long)

  private final case class Box(typ: String, start: Int, end: Int) // payload bounds

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  /** Child boxes of the byte range [from, until): each box is
    * [size:u32][type:4cc][payload]; size==1 → a u64 largesize follows the
    * type; size==0 → the box extends to the end of the enclosing range.
    * Malformed sizes terminate the walk (never throw, never loop). */
  private def children(b: Array[Byte], from: Int, until: Int): List[Box] = {
    var off = from
    val out = List.newBuilder[Box]
    var ok = true
    while (ok && off + 8 <= until) {
      val size32 = u32(b, off)
      val typ = new String(b, off + 4, 4, "ISO-8859-1")
      var payload = off + 8
      val boxEnd: Long =
        if (size32 == 1L && off + 16 <= until) { payload = off + 16; off + u64(b, off + 8) }
        else if (size32 == 0L) until.toLong
        else off + size32
      if (boxEnd < payload || boxEnd > until) ok = false
      else {
        out += Box(typ, payload, boxEnd.toInt)
        off = boxEnd.toInt
      }
    }
    out.result()
  }

  /** (timescale, duration ticks) from mvhd — v0: u32s at +12/+16 after
    * version+flags; v1: u32 at +20, u64 at +24 (creation/modification
    * widen to u64). */
  private def mvhdInfo(b: Array[Byte], x: Box): Option[(Long, Long)] = {
    val v = b(x.start) & 0xff
    if (v == 0 && x.end - x.start >= 20) Some((u32(b, x.start + 12), u32(b, x.start + 16)))
    else if (v == 1 && x.end - x.start >= 32) Some((u32(b, x.start + 20), u64(b, x.start + 24)))
    else None
  }

  /** (width, height) from tkhd's trailing 16.16 fixed-point pair. v0
    * layout reaches them at +76 (4 verflags + 20 times/ids + 16
    * layer/volume + 36 matrix); v1's 64-bit times push that to +88. */
  private def tkhdDims(b: Array[Byte], x: Box): Option[(Int, Int)] = {
    val v = b(x.start) & 0xff
    if (v != 0 && v != 1) return None // unknown version: quarantine, don't misread
    val off = if (v == 1) x.start + 88 else x.start + 76
    if (x.end - off >= 8) Some((u16(b, off), u16(b, off + 4))) else None
  }

  private def mdhdTimescale(b: Array[Byte], x: Box): Option[Long] = {
    val v = b(x.start) & 0xff
    if (v == 0 && x.end - x.start >= 16) Some(u32(b, x.start + 12))
    else if (v == 1 && x.end - x.start >= 28) Some(u32(b, x.start + 20))
    else None
  }

  /** handler_type 4cc at +8 (after version+flags and pre_defined). */
  private def handlerType(b: Array[Byte], x: Box): Option[String] =
    if (x.end - x.start >= 12) Some(new String(b, x.start + 8, 4, "ISO-8859-1")) else None

  /** (total samples, total ticks) from the time-to-sample table. */
  private def sttsTotals(b: Array[Byte], x: Box): Option[(Long, Long)] = {
    if (x.end - x.start < 8) return None
    val n = u32(b, x.start + 4)
    if (x.end - x.start < 8 + n * 8) return None
    var i = 0L; var samples = 0L; var ticks = 0L
    while (i < n) {
      val o = x.start + 8 + (i * 8).toInt
      val count = u32(b, o)
      samples += count
      ticks += count * u32(b, o + 4)
      i += 1
    }
    Some((samples, ticks))
  }

  private final case class Track(w: Int, h: Int, fps: Double)

  private def videoTrack(b: Array[Byte], trak: Box): Option[Track] = {
    val kids = children(b, trak.start, trak.end)
    for {
      tkhd <- kids.find(_.typ == "tkhd")
      mdia <- kids.find(_.typ == "mdia")
      mkids = children(b, mdia.start, mdia.end)
      hdlr <- mkids.find(_.typ == "hdlr")
      ht <- handlerType(b, hdlr)
      if ht == "vide"
      mdhd <- mkids.find(_.typ == "mdhd")
      mts <- mdhdTimescale(b, mdhd)
      minf <- mkids.find(_.typ == "minf")
      stbl <- children(b, minf.start, minf.end).find(_.typ == "stbl")
      stts <- children(b, stbl.start, stbl.end).find(_.typ == "stts")
      totals <- sttsTotals(b, stts)
      dims <- tkhdDims(b, tkhd)
      if totals._2 > 0
    } yield Track(dims._1, dims._2, totals._1.toDouble * mts / totals._2)
  }

  /** First video track's (width, height, fps) + movie duration, or None. */
  def parse(bytes: Array[Byte]): Option[VideoMeta] =
    try {
      for {
        moov <- children(bytes, 0, bytes.length).find(_.typ == "moov")
        mkids = children(bytes, moov.start, moov.end)
        mvhd <- mkids.find(_.typ == "mvhd")
        info <- mvhdInfo(bytes, mvhd)
        if info._1 > 0
        track <- mkids.filter(_.typ == "trak")
          .flatMap(videoTrack(bytes, _)).headOption
      } yield VideoMeta(track.w, track.h, track.fps, info._2 * 1000L / info._1)
    } catch { case _: Exception => None }
}
