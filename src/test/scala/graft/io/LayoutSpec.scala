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

  test("ErrorIfExists refuses a second write (reference K6 precondition)") {
    val out = Files.createTempDirectory("graft-layout2").resolve("docs").toString
    val docs = graft.Tables.documents(spark, sfDir).limit(10)
    Layout.writePartitioned(docs, out, Seq("lang"))
    intercept[Exception] {
      Layout.writePartitioned(docs, out, Seq("lang"))
    }
  }
}
