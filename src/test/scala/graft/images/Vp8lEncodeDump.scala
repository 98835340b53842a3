package graft.images

/** Dev harness for tools/check_webp_encoder.py: re-encodes every golden
  * fixture's .rgba with [[Vp8l.encode]] into a target directory, where
  * the Python script decodes them with the SYSTEM libwebp and compares
  * pixels — the proof that the encoder's output is valid WebP to the
  * reference decoder, not merely to our own. Run:
  *   sbt "Test/runMain graft.images.Vp8lEncodeDump /tmp/vp8l_enc"
  *   python3 tools/check_webp_encoder.py /tmp/vp8l_enc
  */
object Vp8lEncodeDump {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(args.headOption.getOrElse("/tmp/vp8l_enc"))
    java.nio.file.Files.createDirectories(out)
    val names = Seq("solid16", "alpha8", "grad64", "pal33", "noise128",
      "tiles80", "photo256", "one1", "tiny3x2", "wide301")
    for (n <- names) {
      def res(s: String): Array[Byte] = {
        val in = getClass.getResourceAsStream(s"/webp/$s")
        try in.readAllBytes() finally in.close()
      }
      val golden = res(s"$n.rgba")
      val dims = new String(res(s"$n.dims"), "UTF-8").trim.split(" ").map(_.toInt)
      val (w, h) = (dims(0), dims(1))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      for (y <- 0 until h; x <- 0 until w) {
        val i = (y * w + x) * 4
        img.setRGB(x, y,
          ((golden(i + 3) & 0xff) << 24) | ((golden(i) & 0xff) << 16) |
            ((golden(i + 1) & 0xff) << 8) | (golden(i + 2) & 0xff))
      }
      java.nio.file.Files.write(out.resolve(s"$n.webp"), Vp8l.encode(img))
      java.nio.file.Files.write(out.resolve(s"$n.rgba"), golden)
      java.nio.file.Files.write(out.resolve(s"$n.dims"), s"$w $h\n".getBytes)
      println(s"$n: encoded")
    }
  }
}
