package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming crawl-frontier gate must admit exactly one spelling per
  * canonical URL (first arrival wins, q212's keeper rule), drop
  * spellings of already-landed canonicals, quarantine junk, and hold no
  * join state. */
class FrontierStreamSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)

  test("frontier gate: spelling-dedup, landed-anti-join, junk quarantine") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val landed = Seq("https://x.com/b?id=1").toDF("url")
    val stream = MemoryStream[Streaming.UrlIngestRow]
    val q = Streaming.frontierIngestStream(stream.toDF(), landed)
      .writeStream.format("memory").queryName("frontier_stream")
      .outputMode("append").start()
    try {
      stream.addData(
        Streaming.UrlIngestRow("https://x.com/a", ts(0)),
        // same canonical as the row above: a later spelling loses
        Streaming.UrlIngestRow("HTTPS://X.com:443/a#frag", ts(1000)),
        // equivalent of an already-landed canonical: dropped
        Streaming.UrlIngestRow("https://x.com/b?utm_source=f&id=1", ts(2000)),
        Streaming.UrlIngestRow("not a url", ts(3000)))
      q.processAllAvailable()
      // spelling-dedup must also hold ACROSS micro-batches
      stream.addData(
        Streaming.UrlIngestRow("https://x.com/a?utm_campaign=z", ts(4000)),
        Streaming.UrlIngestRow("https://y.co.uk/c", ts(5000)))
      q.processAllAvailable()
      val ops = q.recentProgress.flatMap(_.stateOperators)
        .map(_.operatorName).distinct.toSeq
      assert(ops.nonEmpty && ops.forall(o => !o.toLowerCase.contains("join")),
        s"frontier gate must hold no join state, found: $ops")
    } finally q.stop()

    val got = spark.table("frontier_stream").collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    assert(got == Set(
      ("https://x.com/a", "https://x.com/a"),
      ("https://y.co.uk/c", "https://y.co.uk/c")))
  }

  test("frontier gate: checkpointed restart keeps pre-stop state, no replay") {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    import org.apache.spark.sql.types.StructType
    val spark0 = spark
    import spark0.implicits._
    def deleteRecursively(p: Path): Unit =
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))

    val base = Files.createTempDirectory("graft-frontier-restart")
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    try {
      val landed = Seq("https://seen.com/old").toDF("url")
      val schema = StructType.fromDDL("url STRING, ts TIMESTAMP")
      def t(h: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
      def start() = Streaming.frontierIngestStream(
          spark.readStream.schema(schema).parquet(in), landed)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

      Seq(("https://new.com/p1", t(10)), ("https://seen.com/old#x", t(10)))
        .toDF("url", "ts").coalesce(1).write.mode("append").parquet(in)
      val q1 = start(); q1.processAllAvailable(); q1.stop(); q1.awaitTermination()

      // while DOWN: a re-spelling of the PRE-STOP admitted canonical
      // (must be dropped by restored state) and one genuinely new URL
      Seq(("https://new.com/p1?utm_source=s", t(10)), ("https://new.com/p2", t(10)))
        .toDF("url", "ts").coalesce(1).write.mode("append").parquet(in)
      val q2 = start(); q2.processAllAvailable(); q2.stop(); q2.awaitTermination()

      val got = spark.read.schema("url STRING, ts TIMESTAMP, canon STRING")
        .parquet(out).collect().map(_.getString(0)).toSeq.sorted
      assert(got == Seq("https://new.com/p1", "https://new.com/p2"),
        s"expected exactly p1 (once) and p2, got $got")
    } finally deleteRecursively(base)
  }
}
