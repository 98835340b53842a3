package graft.images

import java.awt.image.BufferedImage
import org.scalatest.funsuite.AnyFunSuite

/** VP8 lossy encoder: the arithmetic coder must round-trip bit-exactly
  * through the decoder's own Bool reader, the forward transforms must be
  * inverses of the spec IDCT/IWHT within integer rounding, and a full
  * encode must (a) decode through [[Vp8.decodeYuv]] to EXACTLY the
  * encoder's in-loop reconstruction — proving bitstream conformance
  * against the decoder that is itself byte-exact vs libwebp — and
  * (b) land within a quality-appropriate PSNR of the source.
  * tools/check_webp_encoder.py --lossy additionally decodes these
  * streams with the system libwebp out-of-band. */
class Vp8EncoderSpec extends AnyFunSuite {

  // ------------------------------------------------ bool coder

  test("bool encoder round-trips through the decoder, carries included") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 40) {
      val n = 1 + rnd.nextInt(5000)
      val probs = Array.fill(n)(1 + rnd.nextInt(254))
      val bits = trial match {
        case 0 => Array.fill(n)(1) // low-prob all-ones stresses the carry walk
        case 1 => Array.fill(n)(0)
        case _ => Array.fill(n)(rnd.nextInt(2))
      }
      val be = new Vp8Encoder.BoolEnc
      var i = 0
      while (i < n) { be.put(probs(i), bits(i)); i += 1 }
      val enc = be.bytes()
      val br = new Vp8.Bool(enc, 0, enc.length)
      i = 0
      while (i < n) {
        assert(br.bool(probs(i)) == bits(i), s"trial $trial sym $i")
        i += 1
      }
    }
  }

  test("bool encoder literal matches the decoder's literal") {
    val be = new Vp8Encoder.BoolEnc
    be.literal(0x5a, 8); be.literal(3, 2); be.literal(126, 7)
    val enc = be.bytes()
    val br = new Vp8.Bool(enc, 0, enc.length)
    assert(br.literal(8) == 0x5a)
    assert(br.literal(2) == 3)
    assert(br.literal(7) == 126)
  }

  // ------------------------------------------------ transforms

  test("idct(fdct(r)) == r within ±1 per sample") {
    val rnd = new scala.util.Random(7)
    val res = new Array[Int](16)
    for (_ <- 0 until 2000) {
      val blk = Array.fill(16)(rnd.nextInt(511) - 255)
      val f = new Array[Int](16)
      Vp8Encoder.fdct4x4(blk, f)
      Vp8.idct4x4(f, 0, res)
      for (i <- 0 until 16)
        assert(math.abs(res(i) - blk(i)) <= 1, s"pos $i: ${res(i)} vs ${blk(i)}")
    }
  }

  test("iwht(fwht(dc)) == dc within ±1 per slot") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 2000) {
      val dcs = Array.fill(16)(rnd.nextInt(4081) - 2040)
      val f = new Array[Int](16)
      Vp8Encoder.fwht(dcs, f)
      val big = new Array[Int](384)
      Vp8.inverseWht(f, big)
      for (b <- 0 until 16)
        assert(math.abs(big(b * 16) - dcs(b)) <= 1, s"dc $b: ${big(b * 16)} vs ${dcs(b)}")
    }
  }

  // ------------------------------------------------ full round trips

  private def gradient(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / math.max(1, w - 1)
      val g = (y * 255) / math.max(1, h - 1)
      val b = ((x + y) * 255) / math.max(1, w + h - 2)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def blocks(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val pal = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000, 0x808080)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, pal(((x / 8) + (y / 8)) % pal.length))
    img
  }

  private def noise(w: Int, h: Int, seed: Int): BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rnd.nextInt() & 0xffffff)
    img
  }

  private def srcLuma(img: BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      out(y * w + x) = (16839 * ((p >> 16) & 0xff) + 33059 * ((p >> 8) & 0xff) +
        6420 * (p & 0xff) + (16 << 16) + (1 << 15)) >> 16
    }
    out
  }

  private def psnrY(img: BufferedImage, f: Vp8.Yuv): Double = {
    val src = srcLuma(img)
    var se = 0.0
    for (i <- src.indices) {
      val d = src(i) - (f.y(i) & 0xff)
      se += d.toDouble * d
    }
    if (se == 0) 99.0 else 10 * math.log10(255.0 * 255 * src.length / se)
  }

  private val shapes =
    Seq(("gradient", gradient(64, 48)), ("blocks", blocks(48, 48)),
      ("noise", noise(33, 17, 3)), ("tall", gradient(16, 80)),
      ("tiny", blocks(5, 3)))

  for ((name, img) <- shapes)
    test(s"$name: decoder output equals the encoder's in-loop recon exactly") {
      for (quality <- Seq(30, 75, 95)) {
        val (bytes, recon) = Vp8Encoder.encodeWithRecon(img, quality)
        val f = Vp8.decodeYuv(bytes).getOrElse(fail(s"$name q$quality: no decode"))
        assert((f.width, f.height) == (img.getWidth, img.getHeight))
        assert(java.util.Arrays.equals(f.y, recon.y), s"$name q$quality Y")
        assert(java.util.Arrays.equals(f.u, recon.u), s"$name q$quality U")
        assert(java.util.Arrays.equals(f.v, recon.v), s"$name q$quality V")
      }
    }

  test("smooth content lands above 34 dB luma PSNR at quality 75") {
    val img = gradient(64, 48)
    val f = Vp8.decodeYuv(Vp8Encoder.encode(img, 75)).get
    val p = psnrY(img, f)
    assert(p >= 34.0, s"psnr $p")
  }

  test("quality knob: higher quality gives higher PSNR and larger files") {
    val img = noise(64, 64, 9)
    val lo = Vp8Encoder.encode(img, 20)
    val hi = Vp8Encoder.encode(img, 90)
    assert(hi.length > lo.length)
    val plo = psnrY(img, Vp8.decodeYuv(lo).get)
    val phi = psnrY(img, Vp8.decodeYuv(hi).get)
    assert(phi > plo + 3, s"q90 $phi vs q20 $plo")
  }

  test("flat image compresses to skip-dominated near-nothing") {
    val img = new BufferedImage(128, 128, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(120, 130, 140)); g.fillRect(0, 0, 128, 128)
    g.dispose()
    val bytes = Vp8Encoder.encode(img, 75)
    assert(bytes.length < 1200, s"${bytes.length} bytes for a flat 128x128")
    val f = Vp8.decodeYuv(bytes).get
    assert(psnrY(img, f) >= 40.0)
  }

  test("container round trip: ImageCodec and HeaderDims both accept the file") {
    val img = gradient(40, 26)
    val bytes = Vp8Encoder.encode(img, 75)
    assert(ImageCodec.dimsOf(bytes).contains((40, 26)))
    val back = ImageCodec.decode(bytes).getOrElse(fail("ImageCodec missed the file"))
    assert((back.getWidth, back.getHeight) == (40, 26))
  }
}
