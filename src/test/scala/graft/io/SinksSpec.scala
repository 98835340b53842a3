package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

class SinksSpec extends SparkSpec {

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private def readAll(dir: Path): Seq[String] =
    Files.walk(dir).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        // skip Hadoop metadata: _SUCCESS markers and .crc checksum files
        Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
      }
      .toSeq
      .map(p => new String(Files.readAllBytes(p), StandardCharsets.UTF_8))

  test("requireEmptyDir: creates missing, rejects non-empty") {
    val d = tmpDir("graft-sink-pre")
    val sub = d.resolve("fresh")
    Sinks.requireEmptyDir(sub.toString) // creates
    assert(Files.isDirectory(sub))
    Files.write(sub.resolve("x.txt"), "x".getBytes)
    intercept[java.io.IOException] { Sinks.requireEmptyDir(sub.toString) }
  }

  test("chunked text uses the reference's blank-line record separator") {
    import spark.implicits._
    val d = tmpDir("graft-sink-chunk").resolve("out")
    val df = Seq((0L, "alpha"), (0L, "beta"), (1L, "gamma"))
      .toDF("chunk", "value")
    Sinks.writeChunkedText(df.repartition(1), d.toString)
    // reference split writes line + "\n\n" (other_tasks.py:87): every
    // record is followed by a blank line, including the last
    val chunk0 = readAll(d.resolve("chunk=0")).mkString
    assert(chunk0.split("\n", -1).count(_ == "alpha") == 1)
    assert(chunk0 == "alpha\n\nbeta\n\n" || chunk0 == "beta\n\nalpha\n\n")
    val chunk1 = readAll(d.resolve("chunk=1")).mkString
    assert(chunk1 == "gamma\n\n")
  }

  test("split then merge preserves the line multiset") {
    import spark.implicits._
    val lines = (1 to 57).map(i => s"line body $i")
    val d = tmpDir("graft-sink-rt").resolve("chunks")
    val df = lines.zipWithIndex
      .map { case (l, i) => (i.toLong / 10, l) }
      .toDF("chunk", "value")
    Sinks.writeChunkedText(df, d.toString)
    // re-read the chunk files as the reference's merge would (blank-line
    // separated records) and compare the multiset of non-blank lines
    val back = spark.read.text(d.toString + "/chunk=*")
      .filter(col("value") =!= "")
      .collect().map(_.getString(0))
    assert(back.sorted.toSeq == lines.sorted)
  }

  test("merged single file concatenates all rows") {
    import spark.implicits._
    val d = tmpDir("graft-sink-merge")
    val out = d.resolve("merged.txt")
    Sinks.writeMergedText(Seq("a", "b", "c").toDF("value").coalesce(1), out.toString)
    val content = new String(Files.readAllBytes(out), StandardCharsets.UTF_8)
    assert(content.split("\n").sorted.toSeq == Seq("a", "b", "c"))
  }
}
