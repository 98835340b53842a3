package graft.streaming

import java.nio.file.{Files, Path}
import java.util.Comparator
import graft.SparkSpec
import org.apache.spark.sql.types.StructType

/** End-to-end streaming durability: [[Streaming.ingestDedup]] driven from a
  * REAL file source into a REAL file sink with a checkpoint location, the
  * query stopped and restarted mid-stream. This is the production shape
  * (landing zone → dedup-at-the-door → curated sink) the MemoryStream
  * specs can't cover:
  *  - the restarted query must resume from the checkpoint, NOT reprocess
  *    batch 1 (the file sink's metadata log makes replays visible as
  *    duplicate rows — exactly-once is asserted on the final output);
  *  - dedup STATE must survive the restart: a text first seen before the
  *    stop and repeated after it must still be dropped, which only happens
  *    if the state store was restored from the checkpoint.
  */
class FileStreamRestartSpec extends SparkSpec {

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))

  test("ingestDedup: file source + checkpoint; restart is exactly-once and keeps state") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-restart")
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      val corpus = Seq("known corpus text").toDF("text")
      val schema = StructType.fromDDL("doc_id BIGINT, ts TIMESTAMP, text STRING")
      def startQuery() = Streaming.ingestDedup(
          spark.readStream.schema(schema).parquet(in), corpus)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

      // batch 1: an in-batch duplicate (doc 3) and a corpus hit (doc 4)
      Seq((1L, ts(0), "alpha"), (2L, ts(1), "beta"),
          (3L, ts(2), "alpha"), (4L, ts(3), "known corpus text"))
        .toDF("doc_id", "ts", "text")
        .coalesce(1).write.mode("append").parquet(in)
      val q1 = startQuery()
      q1.processAllAvailable()
      q1.stop(); q1.awaitTermination()

      // while the query is DOWN: a cross-restart duplicate (doc 5 repeats
      // batch 1's "beta"), a fresh doc, and another corpus hit land
      Seq((5L, ts(4), "beta"), (6L, ts(5), "gamma"),
          (7L, ts(6), "known corpus text"))
        .toDF("doc_id", "ts", "text")
        .coalesce(1).write.mode("append").parquet(in)
      val q2 = startQuery()
      q2.processAllAvailable()
      q2.stop(); q2.awaitTermination()

      val got = spark.read.parquet(out).select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "alpha"), (2L, "beta"), (6L, "gamma")),
        s"expected exactly-once {1,2,6}, got $got")
      // exactly-once also means no row appears twice in the files the
      // sink's metadata log exposes
      assert(spark.read.parquet(out).count() == 3)
    } finally deleteRecursively(base)
  }

  test("trendingItems: Misra-Gries state survives a checkpointed restart") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-trend-restart")
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    try {
      val schema = StructType.fromDDL("item STRING")
      // memory sinks cannot recover a checkpoint; foreachBatch is the
      // restartable Update-mode sink shape (snapshots appended per batch)
      def start() = Streaming.trendingItems(
          spark.readStream.schema(schema).parquet(in), k = 8, nShards = 2)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

      val batch1 = Seq("a", "a", "b", "c")
      batch1.toDF("item").coalesce(1).write.mode("append").parquet(in)
      val q1 = start()
      q1.processAllAvailable(); q1.stop(); q1.awaitTermination()
      val preRestart = spark.read.parquet(out)
        .agg(org.apache.spark.sql.functions.max("seq")).collect()(0).getLong(0)

      val batch2 = Seq("a", "b", "b", "d")
      batch2.toDF("item").coalesce(1).write.mode("append").parquet(in)
      val q2 = start()
      q2.processAllAvailable(); q2.stop(); q2.awaitTermination()

      // only post-restart snapshots (seq beyond the pre-restart max) are
      // examined — cumulative counts there prove the MG state (and its
      // processed-item total) was restored from the checkpoint, and the
      // checkpointed offsets prove batch 1 was not replayed
      val rows = spark.read.parquet(out)
        .filter(org.apache.spark.sql.functions.col("seq") > preRestart).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      val lastSeq = rows.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._5).max }
      val last = rows.filter(r => r._5 == lastSeq(r._1))
      def shard(it: String) = math.floorMod(it.hashCode, 2)
      val touched = batch2.map(shard).toSet
      val exact = (batch1 ++ batch2).groupBy(identity)
        .map { case (i, xs) => i -> xs.size.toLong }
      val expected = exact.filter { case (i, _) => touched(shard(i)) }
      assert(last.map(r => r._2 -> r._3).toMap == expected,
        s"restored-state snapshot must carry pre-restart counts: $last vs $expected")
      // per-shard processed totals also span the restart
      last.groupBy(_._1).foreach { case (s, rs) =>
        val n = (batch1 ++ batch2).count(i => shard(i) == s).toLong
        assert(rs.head._4 == n, s"shard $s total $n, got ${rs.head._4}")
      }
    } finally deleteRecursively(base)
  }
}
