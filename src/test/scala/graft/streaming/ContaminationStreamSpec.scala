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
}
