package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("zValue matches an independent Scala interleave model") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L),
      (7L, 200L), (128L, 1L))
    def model(a: Long, b: Long): Long =
      (0 until 8).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val got = pairs.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pairs.map { case (a, b) => model(a, b) })
    // canonical checks: interleave(255,255) fills all 16 bits
    assert(model(255L, 255L) == 65535L)
  }

  test("z-clustered layout prunes row groups on a 2D box where round-robin cannot") {
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(pmod(col("l_partkey"), lit(256L)).as("x"),
        pmod(col("l_suppkey"), lit(256L)).as("y"))
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), 8))
    // 16 one-row-group files: z-range-clustered vs round-robin
    li.repartitionByRange(16, col("z")).sortWithinPartitions(col("z"))
      .write.parquet(s"$base/zsorted")
    li.repartition(16).write.parquet(s"$base/shuffled")
    // rows EMITTED BY THE SCAN (after row-group stats pruning, before the
    // residual filter) for a 2D box predicate — the quantity z-ordering
    // exists to shrink
    def scanRows(dir: String): Long = {
      val df = spark.read.parquet(dir).filter(col("x") < 16 && col("y") < 16)
      val scan = allPlanNodes(executedPlanOf(df)).collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.getOrElse(fail("no FileSourceScanExec in the plan"))
      scan.metrics("numOutputRows").value
    }
    val nTotal = li.count()
    val zRows = scanRows(s"$base/zsorted")
    val rrRows = scanRows(s"$base/shuffled")
    // round-robin files all span the full (x, y) domain → nothing prunes
    assert(rrRows == nTotal,
      s"round-robin layout should scan everything, got $rrRows of $nTotal")
    // the box [0,16)² maps to z < 512, one thin z-range → most of the 16
    // z-files have disjoint stats envelopes and their row groups skip
    assert(zRows * 4 <= rrRows,
      s"z-layout should prune at least 4x: z=$zRows vs rr=$rrRows")
  }
}
