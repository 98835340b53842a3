package graft.images

/** Dev harness for tools/check_webp_encoder.py, lossy edition: encodes a
  * sweep of synthetic images with [[Vp8Encoder]] and writes, as the
  * expected pixels, OUR OWN decoder's RGBA — which `Vp8Spec` proves
  * byte-exact against libwebp over the golden fixtures. The Python
  * script then decodes our streams with the SYSTEM libwebp; a match
  * proves the encoder emits conformant VP8 to the reference decoder,
  * not merely to this package. Run:
  *   sbt "Test/runMain graft.images.Vp8EncodeDump /tmp/vp8_enc"
  *   python3 tools/check_webp_encoder.py /tmp/vp8_enc
  */
object Vp8EncodeDump {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(args.headOption.getOrElse("/tmp/vp8_enc"))
    java.nio.file.Files.createDirectories(out)
    val rnd = new scala.util.Random(5)
    def gradient(w: Int, h: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val r = (x * 255) / math.max(1, w - 1)
        val g = (y * 255) / math.max(1, h - 1)
        img.setRGB(x, y, (r << 16) | (g << 8) | ((r + g) / 2))
      }
      img
    }
    def noise(w: Int, h: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rnd.nextInt() & 0xffffff)
      img
    }
    def blocks(w: Int, h: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val pal = Array(0xc03020, 0x20c030, 0x2030c0, 0xf0f0f0, 0x101010)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, pal(((x / 8) + (y / 8)) % pal.length))
      img
    }
    val cases = Seq(
      ("grad64_q75", gradient(64, 48), 75),
      ("grad64_q95", gradient(64, 48), 95),
      ("grad64_q20", gradient(64, 48), 20),
      ("noise33x17_q75", noise(33, 17), 75),
      ("noise128_q50", noise(128, 128), 50),
      ("blocks48_q75", blocks(48, 48), 75),
      ("tiny5x3_q75", blocks(5, 3), 75),
      ("tall16x80_q60", gradient(16, 80), 60),
      ("wide200x10_q80", gradient(200, 10), 80))
    for ((name, img, quality) <- cases) {
      val bytes = Vp8Encoder.encode(img, quality)
      val dec = Vp8.decode(bytes).getOrElse(sys.error(s"$name: no self-decode"))
      val w = dec.getWidth; val h = dec.getHeight
      val rgba = new Array[Byte](w * h * 4)
      for (y <- 0 until h; x <- 0 until w) {
        val p = dec.getRGB(x, y)
        val i = (y * w + x) * 4
        rgba(i) = ((p >> 16) & 0xff).toByte
        rgba(i + 1) = ((p >> 8) & 0xff).toByte
        rgba(i + 2) = (p & 0xff).toByte
        rgba(i + 3) = ((p >>> 24) & 0xff).toByte
      }
      java.nio.file.Files.write(out.resolve(s"$name.webp"), bytes)
      java.nio.file.Files.write(out.resolve(s"$name.rgba"), rgba)
      java.nio.file.Files.write(out.resolve(s"$name.dims"), s"$w $h\n".getBytes)
      println(s"$name: ${bytes.length} bytes")
    }
  }
}
