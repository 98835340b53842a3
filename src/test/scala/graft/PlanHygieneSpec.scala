package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** The "scale-killer sweep" as a regression lock instead of a manual
  * audit: NO registered query may plan an unbounded cross product. Two
  * separate allowances, so each query keeps the strongest ban that still
  * fits its documented shape:
  *
  *  - CARTESIAN (non-broadcast cross product) allowed ONLY for q42/q48 —
  *    the deliberately bounded brute-force oracle baselines for their
  *    LSH twins (input capped by a doc_id predicate, stated in their
  *    scaladoc). Everything else, including the BNLJ-whitelisted
  *    queries, fails on a CartesianProduct — so if a broadcast hint is
  *    ever dropped and the planner falls back to a shuffled cross
  *    product, the sweep still catches it.
  *  - BROADCAST nested-loop allowed additionally for q44/q49/q70/q99
  *    (tiny probe/centroid side broadcast against the streamed corpus),
  *    q66/q71/q83/q104/q109/q110 (a broadcast ONE-ROW aggregate attached
  *    to bounded rows — the scalar-subquery shape; q71's is the N-total
  *    exactness guard) and q75 (k = 8 broadcast centroids per
  *    k-means assignment pass — the MLlib dataflow). The broadcast
  *    itself bounds these: the build side must fit in the driver/
  *    executor broadcast limit or the job fails loudly.
  *
  * Anything else that starts planning one of these nodes is a regression
  * (a join key was lost, a broadcast hint dropped, a filter stopped
  * pushing) — this sweep catches it at sf0.001 cost. */
class PlanHygieneSpec extends SparkSpec {

  private val cartesianBaselines = Set("q42_ngram_jaccard_topk", "q48_cosine_neardup")
  private val broadcastLoopAllowed = cartesianBaselines ++ Set(
    "q44_cosine_topk", "q49_ann_ivf_topk", "q70_int8_ann_topk",
    "q66_tfidf_terms", "q71_heavy_hitters", "q75_kmeans", "q83_quality_audit",
    "q99_rrf_fusion", "q104_pmi_pairs", "q109_mixture_plan",
    "q110_triangle_count", "q115_equidepth_histogram", "q116_cluster_top_terms",
    "q117_spend_deciles", "q120_file_merge_oracle", "q121_file_dedup_oracle",
    "q124_exact_stratified_sample", "q133_index_maintenance",
    "q134_embedding_outliers", "q137_bm25_retrieval", "q139_ann_recall_audit",
    "q142_quality_calibration", "q144_token_budget_selection",
    "q150_theta_overlap", "q153_cusum_drift", "q158_benford_audit",
    "q162_distribution_drift", "q165_conversion_survival",
    "q167_session_depth")

  test("no registered query plans an unbounded cross product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val nodes = allPlanNodes(executedPlanOf(fn(spark, sfDir)))
        val bad = nodes.collect {
          case _: CartesianProductExec if !cartesianBaselines(name) =>
            s"$name: CartesianProduct"
          case _: BroadcastNestedLoopJoinExec if !broadcastLoopAllowed(name) =>
            s"$name: BroadcastNestedLoopJoin"
        }
        bad.distinct
      }
    assert(offenders.isEmpty,
      s"unbounded join shapes appeared outside the whitelist:\n${offenders.mkString("\n")}")
  }
}
