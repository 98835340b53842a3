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

  test("packed shards: files match the cumsum-packing model, manifest accounts for every token") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val budget = 256L
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "source", "text")
    val manifest = Sinks.writePackedShards(docs, out, budget).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))

    // Scala model of the same packing
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def nTokens(t: String): Long = t.toLowerCase.split("\\s+").count(_.nonEmpty).toLong
    val packed: Seq[(String, Long, String, Long)] =
      rows.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
        var cum = 0L
        ds.sortBy(_._1).toSeq.map { case (_, _, text) =>
          cum += nTokens(text)
          val bin = math.max(cum - 1, 0L) / budget
          (src, bin, text, nTokens(text))
        }
      }
    val model: Map[(String, Long), (String, Long, Long)] =
      packed.groupBy(t => (t._1, t._2)).map { case (key, ts) =>
        key -> ((ts.map(_._3).mkString("\n\n"), ts.size.toLong, ts.map(_._4).sum))
      }

    // all-blank shards (zero tokens by construction) are dropped from BOTH
    // the files and the manifest — every manifest row must name a real file
    val visibleModel = model.filter { case (_, (text, _, _)) => text.trim.nonEmpty }
    assert(manifest.length == visibleModel.size, "manifest row per non-blank model shard")
    manifest.foreach { case (src, bin, file, nDocs, nToks) =>
      val (text, mDocs, mToks) = visibleModel((src, bin))
      assert(nDocs == mDocs && nToks == mToks, s"manifest counts wrong for $src/$bin")
      val p = java.nio.file.Paths.get(out, file)
      assert(java.nio.file.Files.exists(p), s"manifest names missing file $file")
      val got = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(got == text, s"shard $file content differs from model")
    }
    // every corpus token is accounted for exactly once (dropped blank
    // shards carry zero tokens, so the accounting is unaffected)
    val totalTokens = rows.map(r => nTokens(r._3)).sum
    assert(manifest.map(_._5).sum == totalTokens)
  }

  test("q119 training shards: byte-exact files in the deterministic global order") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft-train-shards").toString
    val order = graft.text.CorpusStats.trainingOrder(spark, sfDir)
    val rows = order.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)

    // Global order model: positions must be exactly the dense sequence
    // 0..n-1 when walked in (okey, doc_id) order.
    val byKey = rows.sortBy(r => (r._2, r._1))
    byKey.zipWithIndex.foreach { case ((doc, _, shard, pos), i) =>
      assert(shard == i / graft.text.CorpusStats.ShufDocsPerShard &&
        pos == i % graft.text.CorpusStats.ShufDocsPerShard,
        s"doc $doc at global index $i has ($shard,$pos)")
    }
    // Deterministic: a fresh plan yields the identical frame.
    val again = graft.text.CorpusStats.trainingOrder(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSeq == rows.toSeq, "training order is not reproducible")

    // Byte-exact shard files.
    val texts = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val ordered = order.join(texts, Seq("doc_id"))
      .select(col("doc_id"), col("shard_id"), col("pos"), col("text"))
    val manifest = Sinks.writeTrainingShards(ordered, out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val textBy = texts.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val model = rows.groupBy(_._3).map { case (shard, ds) =>
      shard -> ds.sortBy(_._4).map(d => textBy(d._1)).mkString("\n\n")
    }
    val visible = model.filter(_._2.exists(_ > ' '))
    assert(manifest.length == visible.size)
    manifest.foreach { case (shard, file, nDocs, firstDoc) =>
      val p = java.nio.file.Paths.get(out, file)
      assert(java.nio.file.Files.exists(p), s"missing shard file $file")
      val got = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(got == model(shard), s"shard $file differs from model")
      assert(nDocs == rows.count(_._3 == shard))
      assert(firstDoc == rows.filter(_._3 == shard).map(_._1).min)
    }
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
