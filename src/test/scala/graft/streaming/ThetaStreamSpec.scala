package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.relational.Events

/** The stream side of q164's landing story: [[Streaming.dailyUserSketches]]
  * must emit each finalized day EXACTLY ONCE, its DataSketches payload must
  * be consumable by Spark's own theta functions (cross-implementation
  * compatibility — the rows land beside batch `dailyThetaSketches` output),
  * and the WAU computed from the STREAMED sketches must equal the full
  * batch recompute. */
class ThetaStreamSpec extends SparkSpec {

  test("streamed daily sketches: exactly once per day, estimates exact, WAU ≡ batch") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Streaming.EventRow].collect().sortBy(_.ts.getTime)
    val dayMs = 24L * 3600 * 1000
    // sentinel far past the last real day: advances the watermark so
    // every real day finalizes; its own day must NOT be emitted (not
    // yet final when the input drains)
    val sentinel = Streaming.EventRow(-1L,
      new java.sql.Timestamp(ev.last.ts.getTime + 3 * dayMs), 999999L, "x", 0.0)

    val stream = MemoryStream[Streaming.EventRow]
    val q = Streaming.dailyUserSketches(stream.toDF())
      .writeStream.format("memory").queryName("theta_days")
      .outputMode("append").start()
    try {
      val (a, b) = ev.splitAt(ev.length / 2)
      stream.addData(a.toSeq); q.processAllAvailable()
      stream.addData(b.toSeq); q.processAllAvailable()
      stream.addData(sentinel); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("theta_days")
    val days = streamed.select("day").collect().map(_.getTimestamp(0).getTime)
    assert(days.length == days.distinct.length, "a day emitted twice")
    val realDays = ev.map(e => Math.floorDiv(e.ts.getTime, dayMs) * dayMs).distinct
    assert(days.sorted.toSeq == realDays.sorted.toSeq,
      s"emitted ${days.length} days, observed ${realDays.length}")

    // per-day estimate (via SPARK's theta_sketch_estimate over our
    // DataSketches payload) equals the exact distinct-user count
    val exactDau = ev.groupBy(e => Math.floorDiv(e.ts.getTime, dayMs) * dayMs)
      .view.mapValues(_.map(_.user_id).distinct.size.toLong).toMap
    streamed
      .select(col("day"), expr("cast(theta_sketch_estimate(sk) as bigint)").as("est"))
      .collect().foreach { r =>
        val d = r.getTimestamp(0).getTime
        assert(r.getLong(1) == exactDau(d),
          s"day $d: estimate ${r.getLong(1)} vs exact ${exactDau(d)}")
      }

    // the landing contract end-to-end: WAU from the STREAMED sketch rows
    // equals the full batch recompute (same estimates, same days)
    val wauStream = Events.thetaWauFromDaily(streamed).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSeq
    val wauBatch = Events.thetaRollingActiveUsers(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSeq
    assert(wauStream == wauBatch,
      s"streamed-sketch WAU diverged: $wauStream vs $wauBatch")
  }
}
