package graft.images

import org.scalatest.funsuite.AnyFunSuite

/** VP8 (lossy WebP) decoder vs libwebp golden fixtures: every committed
  * fixture must reproduce libwebp's YUV planes AND its fancy-upsampled
  * RGBA byte-exactly. The fixtures sweep the keyframe feature space:
  * filter off/normal/simple/sharpness/autofilter, 1 and 4 segments,
  * qualities 10-95, odd/even/non-MB-aligned sizes (see
  * tools/gen_vp8_fixtures.py). */
class Vp8Spec extends AnyFunSuite {

  private val dir = new java.io.File("src/test/resources/vp8")
  private def bytes(n: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(new java.io.File(dir, n).toPath)

  private val fixtures = dir.listFiles().filter(_.getName.endsWith(".webp"))
    .map(_.getName.stripSuffix(".webp")).sorted

  test("fixture inventory covers the filtered and unfiltered families") {
    assert(fixtures.count(_.startsWith("nf_")) >= 10)
    assert(fixtures.count(_.startsWith("f_")) >= 7)
  }

  for (name <- fixtures)
    test(s"$name: YUV planes and RGBA byte-identical to libwebp") {
      val webp = bytes(s"$name.webp")
      val gold = bytes(s"$name.yuv")
      val Array(w, h) = scala.io.Source.fromFile(new java.io.File(dir, s"$name.dims"))
        .mkString.trim.split(" ").map(_.toInt)
      val f = Vp8.decodeYuv(webp).getOrElse(fail(s"$name did not decode"))
      assert((f.width, f.height) == (w, h))
      val cw = f.chromaW; val ch = f.chromaH
      assert(java.util.Arrays.equals(f.y, java.util.Arrays.copyOfRange(gold, 0, w * h)))
      assert(java.util.Arrays.equals(f.u,
        java.util.Arrays.copyOfRange(gold, w * h, w * h + cw * ch)))
      assert(java.util.Arrays.equals(f.v,
        java.util.Arrays.copyOfRange(gold, w * h + cw * ch, w * h + 2 * cw * ch)))
      // RGBA via the fancy upsampler == WebPDecodeRGBA
      val grgba = bytes(s"$name.rgba")
      val img = Vp8.decode(webp).get
      var k = 0
      while (k < w * h) {
        val p = img.getRGB(k % w, k / w)
        val e = ((grgba(4 * k) & 0xff) << 16) | ((grgba(4 * k + 1) & 0xff) << 8) |
          (grgba(4 * k + 2) & 0xff) | ((grgba(4 * k + 3) & 0xff) << 24)
        assert(p == e, s"pixel $k (${k % w},${k / w})")
        k += 1
      }
    }

  test("non-VP8 and corrupt inputs decode to None, never throw") {
    assert(Vp8.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Vp8.decode(new Array[Byte](64)).isEmpty)
    // a VP8L (lossless) file is not claimed by the lossy decoder
    val lossless = new java.io.File("src/test/resources/webp/solid16.webp")
    if (lossless.exists())
      assert(Vp8.decode(java.nio.file.Files.readAllBytes(lossless.toPath)).isEmpty)
    // truncated lossy file: every prefix either decodes or returns None
    val full = bytes(s"${fixtures.head}.webp")
    for (n <- Seq(10, 20, full.length / 2))
      Vp8.decode(java.util.Arrays.copyOf(full, n)) // must not throw
  }

  test("ImageCodec decode chain picks up lossy WebP pixels") {
    val img = ImageCodec.decode(bytes("nf_grad64.webp"))
    assert(img.exists(i => i.getWidth == 64 && i.getHeight == 48))
  }
}
