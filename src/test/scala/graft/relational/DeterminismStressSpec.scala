package graft.relational

import graft.SparkSpec

/** In-session repeat-stress lock for the two driver-red rows of round 4
  * (CORRECTNESS_r04: q112/q115 hash-mismatch that no isolated re-run
  * reproduced). Both queries are pure long/string outputs, so any two
  * value-equal runs must be identical row-for-row; this spec runs each
  * query repeatedly inside ONE warm session — interleaved, the way the
  * driver's full Verify session runs them — at sf0.01 (the driver's
  * scale factor) and asserts every repetition collects the exact same
  * rows. Any residual run-to-run nondeterminism (q115 sits on
  * [[graft.Dist.globalCumSum]]'s sampled range exchange) trips here
  * instead of surfacing as an unreproducible driver artifact. */
class DeterminismStressSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"
  private val reps = 8

  test("q112/q115 are rep-for-rep identical across a warm session at sf0.01") {
    val q112 = graft.SparkEntry.queries("q112_market_share")
    val q115 = graft.SparkEntry.queries("q115_equidepth_histogram")
    val ref112 = q112(spark, sf001).collect().toSeq
    val ref115 = q115(spark, sf001).collect().toSeq
    assert(ref112.nonEmpty && ref115.nonEmpty)
    (1 until reps).foreach { i =>
      // interleave the two so each rep re-plans against a session whose
      // state (AQE stats, checkpoint RDDs, broadcast cache) has churned
      val got112 = q112(spark, sf001).collect().toSeq
      val got115 = q115(spark, sf001).collect().toSeq
      assert(got112 == ref112, s"q112 diverged on repetition $i")
      assert(got115 == ref115, s"q115 diverged on repetition $i")
    }
  }
}
