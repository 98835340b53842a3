package graft.multimodal

/** Animated-GIF frame decode and metadata — the one moving-image container
  * the JDK ships a full codec for (javax.imageio's GIF plugin), so unlike
  * MP4/MPEG this path is REAL end to end: pixels, per-frame delays,
  * offsets and disposal all come from the actual payload, fully offline.
  *
  * This closes the "video frame decode is a stub" gap for GIF clips:
  * [[Multimodal.videoMetaFromBytes]] recognizes GIF payloads through
  * [[parse]] (so they flow through the same `videoMeta` schema and
  * frame-sampling grid as MP4), and [[Multimodal.decodeGifFrames]]
  * returns the decoded frames themselves.
  *
  * Decode contract: each frame is returned AS STORED (its own raster,
  * with its logical-screen offset and disposal method) — inter-frame
  * composition is the caller's choice, exactly as ImageIO exposes it.
  * Pixels are digested per frame (exact integer channel sums + md5 of the
  * ARGB raster) so tests and dedup can verify content without shipping
  * rasters through the driver; [[frameArgb]] returns the raw pixels for
  * kernels that need them.
  *
  * Malformed or non-GIF payloads yield None — the same
  * quarantine-not-throw contract as Mp3/Mp4/ImageCodec.
  */
object Gif {

  /** One decoded frame: raster dims/offset, timing, disposal, and exact
    * pixel digests (channel sums are exact integers; md5 is of the
    * row-major ARGB int stream, big-endian). */
  final case class GifFrame(frame_idx: Int, width: Int, height: Int,
                            x: Int, y: Int, delay_cs: Int, disposal: String,
                            rgb_sum: Long, argb_md5: String)

  /** Run `f` with a GIF reader over `bytes`, closing BOTH the reader and
    * its ImageInputStream (dispose() does not close the stream — leaking
    * it per row is exactly what a per-payload UDF would amplify). */
  private def withReader[A](bytes: Array[Byte])(f: javax.imageio.ImageReader => A): A = {
    val r = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      r.setInput(iis, false, false) // need metadata for delays/offsets
      f(r)
    } finally {
      r.dispose()
      iis.close()
    }
  }

  private def isGif(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 6 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8'

  private def attr(node: org.w3c.dom.Node, name: String): Option[String] = {
    val attrs = node.getAttributes
    Option(attrs).flatMap(a => Option(a.getNamedItem(name))).map(_.getNodeValue)
  }

  private def findNodes(root: org.w3c.dom.Node, name: String): Seq[org.w3c.dom.Node] = {
    val out = scala.collection.mutable.ArrayBuffer[org.w3c.dom.Node]()
    def walk(n: org.w3c.dom.Node): Unit = {
      if (n.getNodeName == name) out += n
      var c = n.getFirstChild
      while (c != null) { walk(c); c = c.getNextSibling }
    }
    walk(root)
    out.toSeq
  }

  /** Per-frame GraphicControlExtension delay in centiseconds — metadata
    * only, no raster decode. */
  private def delayCs(r: javax.imageio.ImageReader, i: Int): Int = {
    val tree = r.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
    findNodes(tree, "GraphicControlExtension").headOption
      .flatMap(attr(_, "delayTime")).map(_.toInt).getOrElse(0)
  }

  /** Decode every frame with its GraphicControlExtension timing and
    * ImageDescriptor offset. None for non-GIF / undecodable payloads. */
  def frames(bytes: Array[Byte]): Option[Seq[GifFrame]] = {
    if (!isGif(bytes)) return None
    try {
      withReader(bytes) { r =>
        val n = r.getNumImages(true)
        if (n <= 0) None
        else Some((0 until n).map { i =>
          val img = r.read(i)
          val tree = r.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
          val gce = findNodes(tree, "GraphicControlExtension").headOption
          val desc = findNodes(tree, "ImageDescriptor").headOption
          val delay = gce.flatMap(attr(_, "delayTime")).map(_.toInt).getOrElse(0)
          val disposal = gce.flatMap(attr(_, "disposalMethod")).getOrElse("none")
          val x = desc.flatMap(attr(_, "imageLeftPosition")).map(_.toInt).getOrElse(0)
          val y = desc.flatMap(attr(_, "imageTopPosition")).map(_.toInt).getOrElse(0)
          val w = img.getWidth
          val h = img.getHeight
          val (rgbSum, md5) = VideoFrame.digest(img.getRGB(0, 0, w, h, null, 0, w))
          GifFrame(i, w, h, x, y, delay, disposal, rgbSum, md5)
        })
      }
    } catch { case _: Exception => None }
  }

  /** Raw ARGB pixels of one frame (row-major ints), for kernels that need
    * the raster itself rather than a digest. */
  def frameArgb(bytes: Array[Byte], idx: Int): Option[Array[Int]] = {
    if (!isGif(bytes)) return None
    try {
      withReader(bytes) { r =>
        if (idx < 0 || idx >= r.getNumImages(true)) None
        else {
          val img = r.read(idx)
          Some(img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth))
        }
      }
    } catch { case _: Exception => None }
  }

  /** GIF clip → the SAME VideoMeta shape MP4 produces, so GIF payloads
    * flow through videoMetaFromBytes / frameSampleGrid unchanged:
    * width/height from the logical screen descriptor, duration as the sum
    * of frame delays (centiseconds → ms), fps as frames over that span.
    * METADATA COST ONLY — frame counting and delays come from
    * getImageMetadata, no raster is ever decoded here (that is
    * [[frames]]' job), preserving the header-vs-pixels split the
    * metadata path promises. Consequence (shared with Mp4.parse, whose
    * mdat is never read): a payload with intact structure but corrupt
    * pixel data passes parse yet fails [[frames]] — metadata validity
    * does not certify decodability; quarantine on the stage you run.
    * A single-frame or all-zero-delay GIF is a still image: fps 0,
    * duration 0 — the sampling grid then yields no frames, which is the
    * right answer for a non-animation. */
  def parse(bytes: Array[Byte]): Option[Mp4.VideoMeta] = {
    if (!isGif(bytes)) return None
    try {
      withReader(bytes) { r =>
        val tree = r.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
        val lsd = findNodes(tree, "LogicalScreenDescriptor").headOption
        val w = lsd.flatMap(attr(_, "logicalScreenWidth")).map(_.toInt)
          .getOrElse(r.getWidth(0))
        val h = lsd.flatMap(attr(_, "logicalScreenHeight")).map(_.toInt)
          .getOrElse(r.getHeight(0))
        val n = r.getNumImages(true)
        if (n <= 0) None
        else {
          val durationMs = (0 until n).map(delayCs(r, _).toLong * 10).sum
          val fps = if (durationMs > 0) n * 1000.0 / durationMs else 0.0
          Some(Mp4.VideoMeta(w, h, fps, durationMs))
        }
      }
    } catch { case _: Exception => None }
  }
}
