package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** The "scale-killer sweep" as a regression lock instead of a manual
  * audit: NO registered query may plan an unbounded cross product. The
  * only plans allowed to carry a CartesianProduct / nested-loop join are
  * the documented bounded baselines:
  *
  *  - q42/q48: deliberately bounded brute-force oracle baselines for
  *    their LSH twins (input capped by a doc_id predicate, stated in
  *    their scaladoc);
  *  - q44/q49/q70: a BROADCAST tiny probe/centroid side against the
  *    streamed corpus — the nested loop is over ≤8 broadcast rows per
  *    input row, the 100 TB-legitimate scan shape;
  *  - q66: a broadcast ONE-ROW aggregate (the corpus doc count) attached
  *    to every row — the scalar-subquery shape, bounded by construction;
  *  - q75: k-means assignment passes — k = 8 broadcast centroids against
  *    the streamed corpus, the MLlib dataflow.
  *
  * Anything else that starts planning one of these nodes is a regression
  * (a join key was lost, a broadcast hint dropped, a filter stopped
  * pushing) — this sweep catches it at sf0.001 cost. */
class PlanHygieneSpec extends SparkSpec {

  private val boundedBaselines = Set(
    "q42_ngram_jaccard_topk", "q48_cosine_neardup",
    "q44_cosine_topk", "q49_ann_ivf_topk", "q70_int8_ann_topk",
    "q66_tfidf_terms", "q75_kmeans")

  test("no registered query plans an unbounded cross product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => boundedBaselines(name) }
      .flatMap { case (name, fn) =>
        val nodes = allPlanNodes(executedPlanOf(fn(spark, sfDir)))
        val bad = nodes.collect {
          case c: CartesianProductExec => s"$name: CartesianProduct"
          case b: BroadcastNestedLoopJoinExec => s"$name: BroadcastNestedLoopJoin"
        }
        bad.distinct
      }
    assert(offenders.isEmpty,
      s"unbounded join shapes appeared outside the whitelist:\n${offenders.mkString("\n")}")
  }
}
