package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q118 SemDeDup-style semantic dedup: the per-cluster prune must equal a
  * bounded brute-force over each cluster's members, and the decision must
  * be exact integer arithmetic (no drift between the join-shaped
  * distributed form and a direct pairwise evaluation). */
class SemanticDedupSpec extends SparkSpec {

  /** int8 quantization mirror of the query's scheme (q70's): floor toward
    * -inf of x/mx*127 over doubles. */
  private def q8(v: Seq[Float]): Array[Long] = {
    val mx = v.map(x => math.abs(x.toDouble)).max
    if (mx == 0.0) Array.fill(v.size)(0L)
    else v.map(x => math.floor(x.toDouble / mx * 127.0).toLong).toArray
  }

  test("q118: distributed per-cluster prune equals brute-force within clusters") {
    val out = Similarity.semanticDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.nonEmpty)

    // Brute-force oracle: same assignment, all pairs within each cluster.
    val (a2, _) = Similarity.kmeansAssignment(spark, sfDir)
    val cid = a2.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> q8(r.getSeq[Float](1))).toMap
    val tau2 = Similarity.SemTauCents * Similarity.SemTauCents
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val expected = vecs.keys.toSeq.sorted.map { id =>
      val qa = vecs(id)
      val na = dot(qa, qa)
      val partners = vecs.keys.toSeq.filter(o => o < id && cid(o) == cid(id))
        .filter { o =>
          val qb = vecs(o); val d = dot(qa, qb)
          d > 0 && 10000L * d * d >= tau2 * dot(qb, qb) * na
        }
      if (partners.isEmpty) (id, cid(id), "keep", -1L)
      else (id, cid(id), "drop", partners.min)
    }
    assert(out.sortBy(_._1).toSeq == expected,
      "distributed prune diverged from the per-cluster brute force")
  }

  test("q118: drops are a strict subset and every family keeps its min id") {
    val rows = Similarity.semanticDedup(spark, sfDir).collect()
    val drops = rows.filter(_.getString(2) == "drop")
    val keeps = rows.filter(_.getString(2) == "keep").map(_.getLong(0)).toSet
    assert(drops.nonEmpty, "threshold should drop something on the test corpus")
    assert(keeps.nonEmpty)
    // dup_of must point at a lower id; the pointed-at doc may itself be
    // dropped (families chain), but the chain bottoms out at a kept id.
    drops.foreach { r =>
      assert(!r.isNullAt(3) && r.getLong(3) < r.getLong(0))
    }
    rows.filter(_.getString(2) == "keep").foreach(r => assert(r.isNullAt(3)))
  }
}
