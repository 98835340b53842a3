package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec}

/** The "scale-killer sweep" as a regression lock instead of a manual
  * audit, over the executed plan of EVERY registered query (built once,
  * shared by each ban below).
  *
  * Ban 1 — unbounded cross products:
  *
  *  - CARTESIAN (non-broadcast cross product) allowed ONLY for q42/q48 —
  *    the deliberately bounded brute-force oracle baselines for their
  *    LSH twins (input capped by a doc_id predicate, stated in their
  *    scaladoc). Everything else, including the BNLJ-whitelisted
  *    queries, fails on a CartesianProduct — so if a broadcast hint is
  *    ever dropped and the planner falls back to a shuffled cross
  *    product, the sweep still catches it.
  *  - BROADCAST nested-loop allowed additionally for q44/q49/q70/q99/
  *    q183 (tiny probe/centroid/LUT side broadcast against the streamed
  *    corpus),
  *    q66/q71/q83/q104/q109/q110 (a broadcast ONE-ROW aggregate attached
  *    to bounded rows — the scalar-subquery shape; q71's is the N-total
  *    exactness guard) and q75 (k = 8 broadcast centroids per
  *    k-means assignment pass — the MLlib dataflow). The broadcast
  *    itself bounds these: the build side must fit in the driver/
  *    executor broadcast limit or the job fails loudly.
  *
  * Ban 2 — unpartitioned windows over unbounded frames: a
  * `Window.orderBy(...)` with no partition spec moves EVERY input row to
  * one task (Spark's own WindowExec warning) — correct at sf0.1, fatal at
  * 100 TB when the frame grows with the data (the class that made q59's
  * vocab rank and q166's bucket cumsum `weak` in round 6). An executed
  * WindowExec/WindowGroupLimitExec with an empty partition spec is
  * allowed only when the frame provably cannot grow with the corpus:
  *
  *  - STRUCTURAL: the window orders by Dist's `__pid` column — the
  *    globalRowNumber/globalCumSum offsets frame, ≤ numParts rows by
  *    construction; or a limit node (GlobalLimit/TakeOrderedAndProject)
  *    bounds the window's own subtree (q59's top-50 rank).
  *  - DECLARED: the query appears in `boundedCensusWindows` with the
  *    documented cardinality bound of its aggregated census frame
  *    (≤ |days|, ≤ |langs|, ≤ 64 spectrum buckets, …) — frames keyed on
  *    a DOMAIN-bounded attribute, not on corpus volume.
  *
  * Anything else that starts planning one of these nodes is a regression
  * (a join key was lost, a broadcast hint dropped, a filter stopped
  * pushing, a census key became corpus-keyed) — caught at sf0.001 cost. */
class PlanHygieneSpec extends SparkSpec {

  private val cartesianBaselines = Set("q42_ngram_jaccard_topk", "q48_cosine_neardup")
  private val broadcastLoopAllowed = cartesianBaselines ++ Set(
    "q44_cosine_topk", "q49_ann_ivf_topk", "q59_vocab_coverage",
    "q70_int8_ann_topk", "q183_pq_ann", // 8 broadcast probe-LUT maps × streamed codes
    // q194 composes q44+q70+q183 (their broadcast-probe scans); q192
    // attaches the broadcast ONE-ROW centroid to the streamed corpus
    "q194_quant_recall_audit", "q192_centroid_selection",

    "q66_tfidf_terms", "q71_heavy_hitters", "q75_kmeans", "q83_quality_audit",
    "q99_rrf_fusion", "q104_pmi_pairs", "q109_mixture_plan",
    "q110_triangle_count", "q115_equidepth_histogram", "q116_cluster_top_terms",
    "q117_spend_deciles", "q120_file_merge_oracle", "q121_file_dedup_oracle",
    "q124_exact_stratified_sample", "q133_index_maintenance",
    "q134_embedding_outliers", "q137_bm25_retrieval", "q139_ann_recall_audit",
    "q142_quality_calibration", "q144_token_budget_selection",
    "q150_theta_overlap", "q153_cusum_drift", "q158_benford_audit",
    "q162_distribution_drift", "q165_conversion_survival",
    "q167_session_depth",
    // q175: the one-row grand total attaches to the |sources|-row frame
    // (never the corpus-sized join) before broadcasting
    "q175_source_divergence",
    // q184: the one-row global n_unlinked audit attaches to the
    // |segments|-row census frame
    "q184_pseudonymize",
    // q191: the one-row doc-count total attaches to the tier cut
    // (q117's spendDeciles shape)
    "q191_perplexity_buckets",
    // q201: the one-row doc-count total attaches to the decile cut
    // (the same q117 shape)
    "q201_crawl_drift")

  /** Queries whose unpartitioned windows run over a DOMAIN-bounded
    * aggregated census frame (value = the bound, stated for the audit
    * trail). Keys here are attributes whose cardinality is fixed by the
    * domain — calendar days, languages, digit/bucket alphabets — never
    * by corpus volume. */
  private val boundedCensusWindows: Map[String, String] = Map(
    "q101_concurrency_sweep" -> "calendar-bounded hourly grid (8,760 rows/yr)",
    "q124_exact_stratified_sample" -> "Hare allocation over the <=|langs| strata frame",
    "q130_shard_balance" -> "serpentine rank over the <=|sources|x|langs| strata frame",
    "q153_cusum_drift" -> "CUSUM prefix frames over the <=365-rows/yr daily aggregate",
    "q165_conversion_survival" -> "running sum over the <=|days| offset census",
    "q168_burst_census" -> "census total over <=|distinct peak values| rows",
    "q171_temperature_mixture" -> "apportionment over the <=|langs| frame",
    "q173_gap_spectrum" -> "shares over the <=64-row log2 bucket spectrum",
    "q177_source_concentration" -> "Gini rank over the <=|sources| mass frame",
    "q188_dsir_selection" -> "grand totals over the <=4096-row hashed-bucket frame",
    "q191_perplexity_buckets" -> "LM grand total over the <=4096-row hashed-bucket frame",
    "q193_epoch_mixture" -> "greedy budget cut over the 4*|sources| increment frame",
    "q200_cluster_size_census" -> "shares over the <=64-row log2 size spectrum")

  // name -> every node in the executed plan (AQE-unwrapped, subqueries
  // included), built ONCE and shared by both sweeps below.
  private lazy val planNodes: Seq[(String, Seq[SparkPlan])] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> allPlanNodes(executedPlanOf(fn(spark, sfDir)))
    }

  test("no registered query plans an unbounded cross product") {
    val offenders = planNodes.flatMap { case (name, nodes) =>
      nodes.collect {
        case _: CartesianProductExec if !cartesianBaselines(name) =>
          s"$name: CartesianProduct"
        case _: BroadcastNestedLoopJoinExec if !broadcastLoopAllowed(name) =>
          s"$name: BroadcastNestedLoopJoin"
      }.distinct
    }
    assert(offenders.isEmpty,
      s"unbounded join shapes appeared outside the whitelist:\n${offenders.mkString("\n")}")
  }

  private def boundedByConstruction(w: SparkPlan): Boolean = {
    val (partitionSpec, orderSpec) = w match {
      case e: WindowExec => (e.partitionSpec, e.orderSpec)
      case e: WindowGroupLimitExec => (e.partitionSpec, e.orderSpec)
      case _ => return true
    }
    partitionSpec.nonEmpty ||
      // Dist.globalRowNumber/globalCumSum offsets frame: numParts rows.
      orderSpec.exists(_.references.exists(_.name == "__pid")) ||
      // a limit below the window bounds its input outright (q59 top-50).
      allPlanNodes(w).exists {
        case _: GlobalLimitExec | _: TakeOrderedAndProjectExec => true
        case _ => false
      }
  }

  test("no unpartitioned window runs over a corpus-growing frame") {
    val offenders = planNodes.flatMap { case (name, nodes) =>
      if (boundedCensusWindows.contains(name)) Nil
      else nodes.collect {
        case w: WindowExec if !boundedByConstruction(w) =>
          s"$name: unpartitioned WindowExec over ${w.child.nodeName}"
        case w: WindowGroupLimitExec if !boundedByConstruction(w) =>
          s"$name: unpartitioned WindowGroupLimitExec over ${w.child.nodeName}"
      }.distinct
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows outside the bounded whitelist:\n${offenders.mkString("\n")}")
  }
}
