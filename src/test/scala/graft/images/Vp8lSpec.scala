package graft.images

import org.scalatest.funsuite.AnyFunSuite

/** Golden-pixel validation of the pure-JVM VP8L decoder against the
  * system libwebp ENCODER's output (tools/gen_webp_fixtures.py): each
  * fixture is a deterministic pixel pattern encoded losslessly, so the
  * decode must reproduce the .rgba bytes EXACTLY — any transform,
  * Huffman or LZ77 bug shows as a first-divergent-pixel assertion. The
  * patterns push different bitstream features: palette (color indexing
  * + pixel packing), gradients (predictors + subtract-green),
  * repetitive tiles (LZ77 + color cache), LCG noise (plain literals,
  * code-length-coded Huffman), odd/tiny sizes (block boundaries). */
class Vp8lSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/webp/$name")
    assert(in != null, s"missing test resource /webp/$name")
    try in.readAllBytes() finally in.close()
  }

  private val fixtures = Seq("solid16", "alpha8", "grad64", "pal33",
    "noise128", "tiles80", "photo256", "one1", "tiny3x2", "wide301")

  for (f <- fixtures) test(s"$f decodes byte-exactly to libwebp's input pixels") {
    val golden = res(s"$f.rgba")
    val dims = new String(res(s"$f.dims"), "UTF-8").trim.split(" ").map(_.toInt)
    val (w, h) = (dims(0), dims(1))
    val img = Vp8l.decode(res(s"$f.webp"))
      .getOrElse(fail(s"$f: decode returned None"))
    assert(img.getWidth == w && img.getHeight == h,
      s"$f: dims ${img.getWidth}x${img.getHeight} vs ${w}x$h")
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val argb = img.getRGB(x, y)
        val i = (y * w + x) * 4
        val ok = ((argb >>> 16) & 0xff) == (golden(i) & 0xff) &&
          ((argb >>> 8) & 0xff) == (golden(i + 1) & 0xff) &&
          (argb & 0xff) == (golden(i + 2) & 0xff) &&
          (argb >>> 24) == (golden(i + 3) & 0xff)
        assert(ok, f"$f: pixel ($x,$y) got 0x$argb%08x want rgba " +
          s"${golden(i) & 0xff},${golden(i + 1) & 0xff}," +
          s"${golden(i + 2) & 0xff},${golden(i + 3) & 0xff}")
        x += 1
      }
      y += 1
    }
  }

  test("the q88 webp fixture is a real VP8L file: solid pixels decode") {
    val bytes = graft.multimodal.Fixtures.webpBytes(100, 50)
    val img = Vp8l.decode(bytes).getOrElse(fail("fixture did not decode"))
    assert(img.getWidth == 100 && img.getHeight == 50)
    val want = graft.multimodal.Fixtures.WebpFixtureArgb
    for (y <- 0 until 50; x <- 0 until 100)
      assert(img.getRGB(x, y) == want, s"pixel ($x,$y)")
    // header-dims tier (q88's routing) still reads the same file
    assert(HeaderDims.webpDims(bytes).contains((100, 50)))
  }

  for (f <- fixtures) test(s"$f round-trips through the VP8L encoder bit-exactly") {
    val golden = res(s"$f.rgba")
    val dims = new String(res(s"$f.dims"), "UTF-8").trim.split(" ").map(_.toInt)
    val (w, h) = (dims(0), dims(1))
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 4
      img.setRGB(x, y, ((golden(i + 3) & 0xff) << 24) | ((golden(i) & 0xff) << 16) |
        ((golden(i + 1) & 0xff) << 8) | (golden(i + 2) & 0xff))
    }
    val webp = Vp8l.encode(img)
    val back = Vp8l.decode(webp).getOrElse(fail(s"$f: re-decode returned None"))
    assert(back.getWidth == w && back.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(back.getRGB(x, y) == img.getRGB(x, y), s"$f: pixel ($x,$y)")
  }

  test("non-WebP and truncated bytes quarantine as None, never throw") {
    assert(Vp8l.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Vp8l.decode(Array.empty[Byte]).isEmpty)
    val good = res("grad64.webp")
    assert(Vp8l.decode(good.take(20)).isEmpty)       // truncated mid-header
    assert(Vp8l.decode(good.take(good.length / 2)).isEmpty) // truncated body
    // flip a payload byte: either decodes to SOMETHING or None, never throws
    val corrupt = good.clone()
    corrupt(good.length - 3) = (corrupt(good.length - 3) ^ 0x5f).toByte
    Vp8l.decode(corrupt)
  }
}
