package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q233's work-∝-batch contract, plan-asserted (the q87 spec extended to
  * the four-probe composition): the landed corpus tables may only be
  * SCANNED — no corpus-table row may feed a shuffle exchange, and none
  * may sit directly under a broadcast (without a join/aggregate reducing
  * it to a batch-bounded frame first). */
class IngestSpec extends SparkSpec {

  test("q233: every batch doc classified exactly once, statuses complete") {
    val out = Ingest.incrementalIngest(spark, sfDir).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    val batch = graft.Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(10)) === 7).count()
    assert(total == batch, "every batch doc must carry exactly one status")
    val statuses = out.map(_.getAs[String]("status")).toSet
    // ALL five screens must fire, not just be subset-legal — a screen
    // whose class is empty on both engines passes the oracle vacuously
    // (the r11 ADVICE finding: exact_dup was 0 rows before the verbatim
    // plant). The plants guarantee each class even at sf0.001.
    assert(statuses ==
      Set("dup_url", "exact_dup", "near_dup", "contained", "ingested"),
      s"every status class must be non-empty, got $statuses")
  }

  test("q233: corpus rows never enter a shuffle; broadcasts are batch-bounded") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, GenerateExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, BroadcastQueryStageExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val plan = executedPlanOf(Ingest.incrementalIngest(spark, sfDir))
    // corpus rows = the landed catalog tables AND the raw documents
    // parquet filtered to the corpus slice (URL probe + anchor fetch read
    // it directly)
    def isCorpusScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(r =>
          r.toString.contains("graft_corpus_") ||
            r.toString.contains("documents.parquet"))
      case _ => false
    }
    val scanned = allPlanNodes(plan).collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
    }.flatten
    for (t <- Seq("graft_corpus_sigs_", "graft_corpus_bands_",
        "graft_corpus_post_", "graft_corpus_dfreq_"))
      assert(scanned.exists(_.contains(t)), s"landed table $t not read")
    // Ban 1: no corpus scan feeds a shuffle exchange. Walk each
    // shuffle's subtree WITHOUT crossing broadcast boundaries (rows
    // leaving via a broadcast are not being shuffled) and WITHOUT
    // crossing joins/aggregates whose output is batch-bounded — a
    // semi-join against a broadcast batch frame, or an aggregate of one,
    // reduces corpus rows to ≤|batch| survivors, and shuffling THOSE is
    // the work-∝-batch contract working as designed.
    def shuffledSide(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: BroadcastExchangeLike => Seq(p)
      case _: BroadcastQueryStageExec => Seq(p)
      case j: BaseJoinExec => Seq(p) // join output is the reduced frame
      case _: BaseAggregateExec => Seq(p)
      case s: QueryStageExec => p +: shuffledSide(s.plan)
      case a: AdaptiveSparkPlanExec => p +: shuffledSide(a.executedPlan)
      case other => p +: other.children.flatMap(shuffledSide)
    }
    val shuffleOffenders = allPlanNodes(plan)
      .collect { case s: ShuffleExchangeExec => s }
      .filter(s => shuffledSide(s).exists(isCorpusScan))
    assert(shuffleOffenders.isEmpty,
      s"corpus scan feeds a shuffle exchange:\n${shuffleOffenders.map(_.nodeName).mkString("\n")}")
    // Ban 2: no corpus scan sits DIRECTLY under a broadcast — reachable
    // without crossing a join (whose build side is a batch frame) or an
    // aggregate (which reduces to a batch-bounded set). A violation
    // means a corpus-sized frame became a build side.
    def directScan(p: SparkPlan): Boolean = p match {
      case f if isCorpusScan(f) => true
      case _: BaseJoinExec => false
      case _: BaseAggregateExec => false
      case _: GenerateExec => false
      case a: AdaptiveSparkPlanExec => directScan(a.executedPlan)
      case s: QueryStageExec => directScan(s.plan)
      case other => other.children.exists(directScan)
    }
    val bcOffenders = allPlanNodes(plan).filter {
      case b: BroadcastExchangeLike => b.children.exists(directScan)
      case _ => false
    }
    assert(bcOffenders.isEmpty,
      s"corpus scan directly under a broadcast:\n${bcOffenders.map(_.nodeName).mkString("\n")}")
  }
}
