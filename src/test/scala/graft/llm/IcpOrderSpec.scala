package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q229 in-context pretraining ordering: conservation, window shape,
  * and the coherence property the ordering exists for — windows are
  * single-cluster except at the ≤ k−1 cluster boundaries. */
class IcpOrderSpec extends SparkSpec {

  private lazy val rows = Similarity.icpOrder(spark, sfDir).collect()

  test("conservation: every embedding lands in exactly one window slot") {
    val total = rows.map(_.getLong(1)).sum
    val n = graft.Tables.embeddings(spark, sfDir).count()
    assert(total == n)
    // all windows full except possibly the last
    val sorted = rows.sortBy(_.getLong(0))
    assert(sorted.init.forall(_.getLong(1) == 32))
    assert(sorted.last.getLong(1) <= 32)
  }

  test("coherence: cluster changes only at cluster boundaries (≤ k−1 splits)") {
    val extra = rows.map(r => r.getLong(2) - 1).sum // n_clusters − 1 per window
    assert(extra <= 7, s"cluster fragmentation across windows: $extra")
    assert(rows.forall(_.getLong(2) >= 1))
  }

  test("the order is deterministic across rebuilds") {
    val again = Similarity.icpOrder(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
