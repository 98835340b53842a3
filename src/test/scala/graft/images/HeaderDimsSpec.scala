package graft.images

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level fixtures for the WebP/HEIC header-dims parsers — built by
  * hand from the published container layouts, so the spec documents the
  * exact byte offsets the parser reads. */
class HeaderDimsSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def le16(v: Int) = bytes(v & 0xff, (v >> 8) & 0xff)
  private def le24(v: Int) = bytes(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff)
  private def le32(v: Long) =
    bytes((v & 0xff).toInt, ((v >> 8) & 0xff).toInt, ((v >> 16) & 0xff).toInt,
      ((v >> 24) & 0xff).toInt)
  private def be32(v: Int) =
    bytes((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)

  private def riff(fourcc: String, payload: Array[Byte]): Array[Byte] =
    ascii("RIFF") ++ le32(4 + 8 + payload.length) ++ ascii("WEBP") ++
      ascii(fourcc) ++ le32(payload.length) ++ payload

  test("WebP lossy (VP8 ): 14-bit LE dims after the 9D 01 2A start code") {
    val payload = bytes(0, 0, 0, 0x9d, 0x01, 0x2a) ++ le16(320) ++ le16(240) ++
      bytes(0, 0, 0, 0)
    assert(HeaderDims.dims(riff("VP8 ", payload)) === Some((320, 240)))
  }

  test("WebP lossless (VP8L): 28 packed bits of (w-1, h-1)") {
    val w = 100; val h = 50
    val packed = (w - 1).toLong | ((h - 1).toLong << 14)
    val payload = bytes(0x2f) ++ le32(packed) ++ bytes(0, 0, 0)
    assert(HeaderDims.dims(riff("VP8L", payload)) === Some((100, 50)))
  }

  test("WebP extended (VP8X): LE24 canvas minus-one dims") {
    val payload = bytes(0x02, 0, 0, 0) ++ le24(999) ++ le24(799)
    assert(HeaderDims.dims(riff("VP8X", payload)) === Some((1000, 800)))
  }

  private def box(t: String, body: Array[Byte]): Array[Byte] =
    be32(8 + body.length) ++ ascii(t) ++ body

  private def heic(ispes: Seq[(Int, Int)]): Array[Byte] = {
    val ispeBoxes = ispes.map { case (w, h) =>
      box("ispe", be32(0) ++ be32(w) ++ be32(h))
    }.foldLeft(Array.empty[Byte])(_ ++ _)
    val meta = box("meta", be32(0) ++ box("iprp", box("ipco", ispeBoxes)))
    box("ftyp", ascii("heic") ++ be32(0) ++ ascii("mif1heic")) ++ meta ++
      box("mdat", bytes(1, 2, 3))
  }

  test("HEIC: max-area ispe wins (primary over thumbnail and grid tiles)") {
    assert(HeaderDims.dims(heic(Seq((160, 120), (640, 480), (320, 240)))) ===
      Some((640, 480)))
  }

  test("HEIC with a single ispe") {
    assert(HeaderDims.dims(heic(Seq((4032, 3024)))) === Some((4032, 3024)))
  }

  test("malformed and truncated inputs return None, never throw") {
    assert(HeaderDims.dims(Array.emptyByteArray).isEmpty)
    assert(HeaderDims.dims(ascii("RIFFxxxxWEBPVP8 ")).isEmpty)
    assert(HeaderDims.dims(heic(Seq.empty)).isEmpty)
    assert(HeaderDims.dims(riff("VP8 ", bytes(0, 0, 0, 1, 2, 3, 4, 5, 6, 7))).isEmpty)
    // a box whose declared size overruns the buffer must terminate cleanly
    val overrun = box("ftyp", ascii("heic")) ++ be32(1 << 30) ++ ascii("meta")
    assert(HeaderDims.dims(overrun).isEmpty)
  }

  test("ImageCodec.dimsOf falls back to header parsers for WebP, still reads PNG") {
    val webp = riff("VP8X", bytes(0x02, 0, 0, 0) ++ le24(11) ++ le24(7))
    assert(ImageCodec.dimsOf(webp) === Some((12, 8)))
    val img = new java.awt.image.BufferedImage(5, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    assert(ImageCodec.dimsOf(out.toByteArray) === Some((5, 9)))
  }

  test("rawDims: CR2 primary wins over IFD0 thumbnail; plain TIFF declines") {
    import graft.multimodal.Fixtures.rawTiffBytes
    assert(HeaderDims.rawDims(rawTiffBytes(Seq((160, 120), (5760, 3840)), "cr2"))
      === Some((5760, 3840)))
    assert(HeaderDims.rawDims(rawTiffBytes(Seq((256, 171), (6000, 4000)), "dng"))
      === Some((6000, 4000)))
    // single-IFD CR2 still parses
    assert(HeaderDims.rawDims(rawTiffBytes(Seq((100, 80)), "cr2")) === Some((100, 80)))
    // plain TIFF (no RAW signature) must fall through to ImageIO, not claim
    assert(HeaderDims.rawDims(rawTiffBytes(Seq((160, 120), (5760, 3840)), "tiff")).isEmpty)
    assert(ImageCodec.dimsOf(rawTiffBytes(Seq((160, 120), (5760, 3840)), "cr2"))
      === Some((5760, 3840)))
  }

  test("rawDims is total: junk, truncation and bit-flips never throw") {
    import graft.multimodal.Fixtures.rawTiffBytes
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 300) {
      val junk = Array.fill[Byte](rnd.nextInt(120))(rnd.nextInt().toByte)
      HeaderDims.rawDims(junk)
    }
    val fix = rawTiffBytes(Seq((160, 120), (5760, 3840)), "cr2")
    for (cut <- 1 until fix.length) HeaderDims.rawDims(fix.take(cut))
    for (i <- fix.indices) {
      val mut = fix.clone(); mut(i) = (mut(i) ^ 0xff).toByte
      HeaderDims.rawDims(mut)
    }
  }
}
