package graft.images

/** Dev harness: decode each VP8 fixture and diff against libwebp's YUV
  * reference. `runMain graft.images.Vp8Dump [prefix]`. */
object Vp8Dump {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("src/test/resources/vp8")
    val prefix = args.headOption.getOrElse("")
    val names = dir.listFiles().filter(_.getName.endsWith(".webp"))
      .map(_.getName.stripSuffix(".webp")).sorted.filter(_.startsWith(prefix))
    for (name <- names) {
      val webp = java.nio.file.Files.readAllBytes(new java.io.File(dir, s"$name.webp").toPath)
      val gold = java.nio.file.Files.readAllBytes(new java.io.File(dir, s"$name.yuv").toPath)
      val Array(w, h) = scala.io.Source.fromFile(new java.io.File(dir, s"$name.dims"))
        .mkString.trim.split(" ").map(_.toInt)
      Vp8.decodeYuv(webp) match {
        case None => println(s"$name: DECODE FAILED")
        case Some(f) =>
          val cw = (w + 1) / 2; val ch = (h + 1) / 2
          val gy = gold.slice(0, w * h)
          val gu = gold.slice(w * h, w * h + cw * ch)
          val gv = gold.slice(w * h + cw * ch, w * h + 2 * cw * ch)
          def diff(a: Array[Byte], b: Array[Byte], W: Int, plane: String): String = {
            var n = 0; var firstPos = -1; var maxd = 0
            var i = 0
            while (i < a.length) {
              if (a(i) != b(i)) {
                n += 1
                if (firstPos < 0) firstPos = i
                val d = math.abs((a(i) & 0xff) - (b(i) & 0xff))
                if (d > maxd) maxd = d
              }
              i += 1
            }
            if (n == 0) s"$plane OK"
            else s"$plane DIFF n=$n first=(${firstPos % W},${firstPos / W}) " +
              s"got=${a(firstPos) & 0xff} want=${b(firstPos) & 0xff} maxd=$maxd"
          }
          val grgba = java.nio.file.Files.readAllBytes(
            new java.io.File(dir, s"$name.rgba").toPath)
          val img = Vp8.decode(webp).get
          val rgba = new Array[Byte](w * h * 4)
          var k = 0
          while (k < w * h) {
            val p = img.getRGB(k % w, k / w)
            rgba(4 * k) = ((p >> 16) & 0xff).toByte
            rgba(4 * k + 1) = ((p >> 8) & 0xff).toByte
            rgba(4 * k + 2) = (p & 0xff).toByte
            rgba(4 * k + 3) = ((p >>> 24) & 0xff).toByte
            k += 1
          }
          println(s"$name: ${diff(f.y, gy, w, "Y")} | ${diff(f.u, gu, cw, "U")} | " +
            diff(f.v, gv, cw, "V") + " | " + diff(rgba, grgba, w * 4, "RGBA"))
      }
    }
  }
}
