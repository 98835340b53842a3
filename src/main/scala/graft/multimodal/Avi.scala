package graft.multimodal

/** One decoded video frame in the container-agnostic schema shared by the
  * GIF and AVI decode paths ([[Multimodal.decodeVideoFrames]]): raster
  * dims, the frame's presentation timestamp, and exact pixel digests
  * (integer channel sum + md5 of the big-endian ARGB int stream) so
  * content can be verified or deduplicated without shipping rasters
  * through the driver. */
final case class VideoFrame(frame_idx: Int, width: Int, height: Int,
                            ts_ms: Long, rgb_sum: Long, argb_md5: String)

object VideoFrame {
  /** Exact digests of a row-major ARGB raster: integer R+G+B channel sum
    * and md5 of the big-endian ARGB int stream. The ONE definition of the
    * digest contract — GIF and AVI frames must digest identical rasters
    * identically or cross-container frame dedup silently breaks. */
  private[multimodal] def digest(argb: Array[Int]): (Long, String) = {
    val buf = java.nio.ByteBuffer.allocate(argb.length * 4)
    var rgbSum = 0L
    argb.foreach { p =>
      rgbSum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      buf.putInt(p)
    }
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(buf.array()).map("%02x".format(_)).mkString
    (rgbSum, md5)
  }
}

/** AVI (RIFF) container parsing and MJPEG frame decode — the second
  * moving-image path that is REAL end to end offline: the container walk
  * is pure byte arithmetic (RIFF chunks are trivially simpler than
  * ISO-BMFF), and Motion-JPEG stores every frame as a complete JPEG,
  * which the JDK's ImageIO decodes without any external codec.
  *
  * What this covers vs [[Mp4]]: MP4 metadata is real but its AVC/HEVC
  * sample data has no offline JVM decoder, so MP4 frame decode stays a
  * declared stub; AVI+MJPEG (the standard camera/capture interchange
  * format) gets both metadata AND pixels from real bytes here.
  *
  * Layout parsed (all little-endian, chunks word-aligned):
  * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf ...) ...)
  * LIST('movi' {NN}dc|{NN}db ...))` — fps from the video stream's
  * `strh.dwRate/dwScale`, dims from `avih`, frame payloads from the
  * `movi` data chunks of the video stream (nested `LIST('rec ')`
  * groups descended).
  *
  * Parsing is total: malformed, truncated, or non-AVI payloads (and AVI
  * files whose frames ImageIO cannot decode) yield None — the same
  * quarantine-not-throw contract as Gif/Mp3/Mp4/ImageCodec.
  */
object Avi {

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** A RIFF chunk: `id` is the chunk fourcc ("LIST" for lists, in which
    * case `listType` is the list's own fourcc and the payload starts
    * after it). Bounds are [start, end) over the data only. */
  private final case class Chunk(id: String, listType: Option[String],
                                 start: Int, end: Int)

  /** Chunk walk over [from, until): [id:4cc][size:u32le][data][pad to
    * even]. Malformed sizes terminate the walk — never throw, never
    * loop. */
  private def children(b: Array[Byte], from: Int, until: Int): List[Chunk] = {
    var off = from
    val out = List.newBuilder[Chunk]
    var ok = true
    while (ok && off + 8 <= until) {
      val id = fourcc(b, off)
      val size = u32(b, off + 4)
      val dataStart = off + 8
      val dataEnd = dataStart + size
      if (dataEnd < dataStart || dataEnd > until) ok = false
      else {
        if (id == "LIST" && size >= 4)
          out += Chunk(id, Some(fourcc(b, dataStart)), dataStart + 4, dataEnd.toInt)
        else
          out += Chunk(id, None, dataStart, dataEnd.toInt)
        off = dataEnd.toInt + (size.toInt & 1) // word alignment pad
      }
    }
    out.result()
  }

  private def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI "

  /** (hdrl list, movi list) if both present. The RIFF form payload
    * starts after the 'AVI ' form type at offset 12. */
  private def topLists(b: Array[Byte]): Option[(Chunk, Chunk)] = {
    val top = children(b, 12, b.length)
    for {
      hdrl <- top.find(_.listType.contains("hdrl"))
      movi <- top.find(_.listType.contains("movi"))
    } yield (hdrl, movi)
  }

  /** Video stream: (stream index in hdrl order → the "NN" of its movi
    * chunk ids, dwScale, dwRate, dwLength) from the first 'vids' strh. */
  private def videoStream(b: Array[Byte], hdrl: Chunk): Option[(Int, Long, Long, Long)] = {
    val strls = children(b, hdrl.start, hdrl.end).filter(_.listType.contains("strl"))
    strls.zipWithIndex.flatMap { case (strl, idx) =>
      children(b, strl.start, strl.end)
        .find(c => c.id == "strh" && c.end - c.start >= 36)
        .filter(c => fourcc(b, c.start) == "vids")
        .map(c => (idx, u32(b, c.start + 20), u32(b, c.start + 24), u32(b, c.start + 32)))
    }.headOption
  }

  /** Container metadata in [[Multimodal.videoMeta]]'s schema: dims from
    * the main `avih` header, fps = strh dwRate/dwScale (falling back to
    * 1e6/avih.dwMicroSecPerFrame), duration = frame count at that rate.
    * Header-cost only — no frame data is touched, the same
    * header-vs-pixels split as Mp4/ImageCodec. */
  def parse(bytes: Array[Byte]): Option[Mp4.VideoMeta] = {
    if (!isAvi(bytes)) return None
    try {
      topLists(bytes).flatMap { case (hdrl, _) =>
        val avih = children(bytes, hdrl.start, hdrl.end)
          .find(c => c.id == "avih" && c.end - c.start >= 40)
        avih.flatMap { a =>
          val usPerFrame = u32(bytes, a.start)
          val totalFrames = u32(bytes, a.start + 16)
          val w = u32(bytes, a.start + 32).toInt
          val h = u32(bytes, a.start + 36).toInt
          val vs = videoStream(bytes, hdrl)
          val fps = vs match {
            case Some((_, scale, rate, _)) if scale > 0 && rate > 0 =>
              rate.toDouble / scale
            case _ => if (usPerFrame > 0) 1e6 / usPerFrame else 0.0
          }
          val nFrames = vs.map(_._4).filter(_ > 0).getOrElse(totalFrames)
          val durationMs =
            if (fps > 0) math.round(nFrames * 1000.0 / fps) else 0L
          if (w <= 0 || h <= 0) None
          else Some(Mp4.VideoMeta(w, h, fps, durationMs))
        }
      }
    } catch { case _: Exception => None }
  }

  /** Data chunks of stream `idx` inside movi, in file order — descends
    * nested 'rec ' grouping lists. Accepts compressed ('dc') and
    * uncompressed ('db') video chunks. */
  private def frameChunks(b: Array[Byte], movi: Chunk, idx: Int): List[Chunk] = {
    val prefix = f"$idx%02d"
    def walk(from: Int, until: Int): List[Chunk] =
      children(b, from, until).flatMap {
        case rec if rec.listType.contains("rec ") => walk(rec.start, rec.end)
        case c if c.id == prefix + "dc" || c.id == prefix + "db" => List(c)
        case _ => Nil
      }
    walk(movi.start, movi.end)
  }

  /** Decode every MJPEG frame: raster dims + exact pixel digests in the
    * shared [[VideoFrame]] schema, ts_ms from the frame index at the
    * stream's scale/rate (exact integer arithmetic). None when the
    * payload is not AVI, has no video stream, or any frame fails to
    * decode — per-frame quarantine would silently shift timestamps. */
  def frames(bytes: Array[Byte]): Option[Seq[VideoFrame]] = {
    if (!isAvi(bytes)) return None
    try {
      for {
        (hdrl, movi) <- topLists(bytes)
        (idx, scale, rate, _) <- videoStream(bytes, hdrl)
        if rate > 0 && scale > 0
        chunks = frameChunks(bytes, movi, idx)
        decoded = chunks.zipWithIndex.map { case (c, i) =>
          decodeFrame(bytes, c).map { img =>
            val w = img.getWidth; val h = img.getHeight
            val (rgbSum, md5) = VideoFrame.digest(img.getRGB(0, 0, w, h, null, 0, w))
            VideoFrame(i, w, h, i.toLong * 1000L * scale / rate, rgbSum, md5)
          }
        }
        if decoded.nonEmpty && decoded.forall(_.isDefined)
      } yield decoded.map(_.get)
    } catch { case _: Exception => None }
  }

  /** Raw ARGB raster of frame `idx` for kernels that need the pixels
    * themselves — the AVI twin of [[Gif.frameArgb]]. */
  def frameArgb(bytes: Array[Byte], idx: Int): Option[Array[Int]] = {
    if (!isAvi(bytes)) return None
    try {
      for {
        (hdrl, movi) <- topLists(bytes)
        (sidx, _, _, _) <- videoStream(bytes, hdrl)
        c <- frameChunks(bytes, movi, sidx).lift(idx)
        img <- decodeFrame(bytes, c)
      } yield img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
    } catch { case _: Exception => None }
  }

  private def decodeFrame(b: Array[Byte], c: Chunk): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(b, c.start, c.end - c.start)))
    catch { case _: Exception => None }
}
