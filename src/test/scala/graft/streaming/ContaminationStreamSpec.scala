package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.CorpusStats

/** The streaming twin of q190: [[Streaming.contaminationStream]] must flag
  * exactly the documents the batch screen flags (identical gram space —
  * the shared ContamGramArraySql kernel), with exact per-doc hit counts,
  * each emitted exactly once regardless of trigger slicing. */
class ContaminationStreamSpec extends SparkSpec {

  private def h60(s: String): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)

  test("streamed contamination screen ≡ sequential model, exactly once per doc") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Array[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty)
    def grams(t: String): Seq[Long] = {
      val ws = toks(t)
      if (ws.length < CorpusStats.ContamN) Seq.empty
      else ws.sliding(CorpusStats.ContamN).map(g => h60(g.mkString(" "))).toSeq
    }
    val evalDocs = docs.filter(d => d._1 % CorpusStats.ContamMod == CorpusStats.ContamRes)
    val evalSet = evalDocs.flatMap(d => grams(d._3)).toSet
    assert(evalSet.nonEmpty, "fixture needs a non-empty eval gram set")

    // plant one KNOWN contaminated ingest doc: copies 8 consecutive
    // tokens from an eval doc (id chosen outside the eval residue class)
    val src = evalDocs.find(d => toks(d._3).length >= CorpusStats.ContamN).get
    val copied = toks(src._3).take(CorpusStats.ContamN).mkString(" ")
    val plantedId = 1000001L
    assert(plantedId % CorpusStats.ContamMod != CorpusStats.ContamRes)
    val planted = (plantedId, "srcX", s"zq zq zq $copied zq zq zq")

    val train = docs.filter(d => d._1 % CorpusStats.ContamMod != CorpusStats.ContamRes) :+ planted
    val base = 1700000000000L
    val rows = train.zipWithIndex.map { case ((id, s, t), i) =>
      // spread arrivals over ~3 hours so several windows finalize
      Streaming.DocIngestRow(id, new java.sql.Timestamp(base + i * 20000L), s, t)
    }
    val model = train.map { case (id, s, t) =>
      (id, s, grams(t).count(evalSet.contains).toLong)
    }.filter(_._3 > 0)
    assert(model.exists(_._1 == plantedId), "planted doc must be contaminated in the model")

    val evalGrams = CorpusStats.evalGramSet(spark, sfDir)
    val stream = MemoryStream[Streaming.DocIngestRow]
    val q = Streaming.contaminationStream(stream.toDF(), evalGrams)
      .writeStream.format("memory").queryName("contam_stream")
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      stream.addData(a.toSeq); q.processAllAvailable()
      stream.addData(b.toSeq); q.processAllAvailable()
      // sentinel: clean text far in the future advances the watermark so
      // every real window finalizes; itself never matches so never emits
      stream.addData(Streaming.DocIngestRow(-1L,
        new java.sql.Timestamp(rows.last.ts.getTime + 48L * 3600 * 1000),
        "zz", "zz zz"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("contam_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.map(_._1).distinct.length == got.length, "a doc emitted twice")
    assert(got.sortBy(_._1) == model.sortBy(_._1).toSeq,
      s"streamed flags ${got.length} vs model ${model.length}")
    assert(got.exists(_._1 == plantedId), "planted doc not flagged by the stream")
  }

  test("contamination screen: checkpointed restart emits a pre-stop doc exactly once") {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    import org.apache.spark.sql.types.StructType
    val spark0 = spark
    import spark0.implicits._
    def deleteRecursively(p: Path): Unit =
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))

    val base = Files.createTempDirectory("graft-contam-restart")
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    try {
      // a synthetic eval gram set: the 8-gram of words e1..e8
      val evalText = (1 to 8).map(i => s"e$i").mkString(" ")
      val evalGrams = Seq((0L, evalText)).toDF("doc_id", "text")
        .select(graft.text.TextOps.tokens(lower(col("text"))).as("toks"))
        .select(explode(expr(CorpusStats.ContamGramArraySql)).as("g"))
      val contaminated = s"pre $evalText post pad pad pad"
      val schema = StructType.fromDDL(
        "doc_id BIGINT, ts TIMESTAMP, source STRING, text STRING")
      def ts(h: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:30:00")
      def start() = Streaming.contaminationStream(
          spark.readStream.schema(schema).parquet(in), evalGrams)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

      Seq((1L, ts(10), "s", contaminated),
          (2L, ts(10), "s", "clean words only here nothing shared at all"))
        .toDF("doc_id", "ts", "source", "text")
        .coalesce(1).write.mode("append").parquet(in)
      val q1 = start(); q1.processAllAvailable(); q1.stop(); q1.awaitTermination()
      assert(spark.read.schema("doc_id BIGINT, source STRING, n_hits BIGINT")
        .parquet(out).count() == 0, "window emitted before finality")

      Seq((3L, ts(12), "s", contaminated), (4L, ts(20), "s", "zz zz"))
        .toDF("doc_id", "ts", "source", "text")
        .coalesce(1).write.mode("append").parquet(in)
      val q2 = start(); q2.processAllAvailable(); q2.stop(); q2.awaitTermination()

      val got = spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set((1L, "s", 1L), (3L, "s", 1L)),
        s"expected docs 1 and 3 flagged exactly once with one matched gram, got $got")
      assert(spark.read.parquet(out).count() == 2)
    } finally deleteRecursively(base)
  }
}
