package graft.io

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayoutSpec extends SparkSpec {

  test("partitioned write prunes directories at planning time") {
    val out = Files.createTempDirectory("graft-layout").resolve("docs").toString
    val docs = graft.Tables.documents(spark, sfDir)
    Layout.writePartitioned(docs, out, Seq("lang"))

    val back = Layout.readPartitioned(spark, out)
    assert(back.count() == docs.count())

    val filtered = back.filter(col("lang") === "en")
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    // the lang predicate must be a partition filter (directory pruning),
    // not a data filter evaluated per row
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filters: ${scan.metadata}")
    assert(filtered.count() == docs.filter(col("lang") === "en").count())

    // pruned scan lists only the matching partition's files
    val allFiles = scan.relation.location.inputFiles.length
    val langs = docs.select("lang").distinct().count()
    assert(langs > 1, "fixture needs multiple lang partitions")
  }

  test("bucketed tables join and aggregate WITHOUT a shuffle on the bucket key") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text", "lang")
    Layout.writeBucketed(docs, "docs_bucketed", "doc_id", 4)
    Layout.writeBucketed(
      docs.select(col("doc_id"), length(col("text")).as("len")),
      "lens_bucketed", "doc_id", 4)
    try {
      val joined = spark.table("docs_bucketed")
        .join(spark.table("lens_bucketed"), "doc_id")
      joined.collect()
      val plan = joined.queryExecution.executedPlan
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] = {
        val kids = p match {
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(s.plan)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case o => o.children
        }
        (p match { case s: ShuffleExchangeExec => Seq(s); case _ => Nil }) ++
          kids.flatMap(shuffles)
      }
      assert(shuffles(plan).isEmpty,
        "bucket-key join shuffled — bucketing metadata not used")
      assert(joined.count() == docs.count())
      // aggregation on the bucket key is exchange-free too
      val agg = spark.table("docs_bucketed").groupBy("doc_id").agg(count(lit(1)))
      agg.collect()
      assert(shuffles(agg.queryExecution.executedPlan).isEmpty,
        "bucket-key aggregation shuffled")
    } finally {
      spark.sql("DROP TABLE IF EXISTS docs_bucketed")
      spark.sql("DROP TABLE IF EXISTS lens_bucketed")
    }
  }

  test("ErrorIfExists refuses a second write (reference K6 precondition)") {
    val out = Files.createTempDirectory("graft-layout2").resolve("docs").toString
    val docs = graft.Tables.documents(spark, sfDir).limit(10)
    Layout.writePartitioned(docs, out, Seq("lang"))
    intercept[Exception] {
      Layout.writePartitioned(docs, out, Seq("lang"))
    }
  }
}
