package graft.relational

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q164's stated 100 TB story, proven end-to-end: per-day Theta sketches
  * LAND as a parquet table once, and tomorrow's WAU report is a union of
  * the landed rows with sketches built from ONLY the new days' events —
  * the q87 land-once pattern applied to sketch state. The contract that
  * makes the landing trustworthy is landed-union ≡ full recompute,
  * including when a landing boundary splits a day (the append-only
  * top-up case), which the per-day collapse in `thetaWauFromDaily`
  * re-unions before the window algebra. */
class ThetaPersistenceSpec extends SparkSpec {

  private def wauRows(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSeq

  test("landed daily sketches ∪ fresh-day sketches ≡ full recompute") {
    val ev = graft.Tables.events(spark, sfDir)
    val maxDay = ev.agg(max(date_trunc("day", col("ts")))).head().getTimestamp(0)
    val full = wauRows(Events.thetaRollingActiveUsers(spark, sfDir))
    assert(full.nonEmpty)

    // day-boundary landing: history (all but the last 2 days) lands to
    // parquet; "tomorrow" sketches only the fresh tail and unions.
    val cutoff = new java.sql.Timestamp(maxDay.getTime - 2L * 24 * 3600 * 1000)
    val hist = ev.filter(col("ts") < lit(cutoff))
    val fresh = ev.filter(col("ts") >= lit(cutoff))
    assert(hist.limit(1).count() == 1 && fresh.limit(1).count() == 1,
      "test premise: both sides of the cutoff must hold events")
    val landDir = Files.createTempDirectory("theta_land").toString
    Events.dailyThetaSketches(hist).write.mode("overwrite").parquet(landDir)
    val landed = spark.read.parquet(landDir)
    val incremental = wauRows(Events.thetaWauFromDaily(
      landed.unionByName(Events.dailyThetaSketches(fresh))))
    assert(incremental == full,
      s"landed-union diverged from full recompute: $incremental vs $full")

    // MID-DAY landing boundary: the split day lands twice (one partial
    // sketch per landing); the per-day collapse must re-union them so the
    // report still equals the full recompute bit-for-bit.
    val midCut = new java.sql.Timestamp(maxDay.getTime - (2L * 24 + 12) * 3600 * 1000)
    val histM = ev.filter(col("ts") < lit(midCut))
    val freshM = ev.filter(col("ts") >= lit(midCut))
    val landDirM = Files.createTempDirectory("theta_land_mid").toString
    Events.dailyThetaSketches(histM).write.mode("overwrite").parquet(landDirM)
    val incrementalM = wauRows(Events.thetaWauFromDaily(
      spark.read.parquet(landDirM).unionByName(Events.dailyThetaSketches(freshM))))
    assert(incrementalM == full,
      "mid-day split landing diverged from full recompute")
  }
}
