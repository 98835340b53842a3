package graft.llm

import java.nio.file.Files

import graft.SparkSpec

/** The dedup/ANN tier's 100 TB claim as a MEASURED regression lock, not
  * an argued one: on a 10× corpus with constant duplicate density (the
  * isomorphic-copy construction in [[Scaling]] — each copy reproduces
  * the base corpus's pair structure exactly, no shingle crosses copies),
  * candidate volumes must grow ~linearly. A quadratic shape (all-pairs,
  * a lost bucket key, a prefix filter that stopped filtering) would grow
  * ~100× and fail these bounds loudly. Wall-times live in SCALING.md
  * (ScalingBench); only the deterministic counts are asserted here. */
class ScalingSpec extends SparkSpec {

  test("q41/q94/q118/q143 candidate volumes grow sub-quadratically at 10x") {
    val work = Files.createTempDirectory("graft_scaling_spec").toString
    val base = s"$work/x1"
    val big = s"$work/x10"
    Scaling.materialize(spark, sfDir, base, 1)
    Scaling.materialize(spark, sfDir, big, 10)

    // q41 MinHash LSH banding: ~10x from the 10 copies plus a small
    // cross-copy band-collision tail; quadratic would be ~100x.
    val lsh1 = Scaling.lshCandidateCount(spark, base)
    val lsh10 = Scaling.lshCandidateCount(spark, big)
    assert(lsh1 > 0, "test premise: base corpus must produce LSH candidates")
    assert(lsh10 >= 8 * lsh1 && lsh10 <= 20 * lsh1,
      s"q41 candidates not ~linear at 10x: $lsh1 -> $lsh10")

    // q94 span dedup: EXACTLY 10x — token-prefixing is a bijection, so
    // each copy reproduces the base dup-span census and no span matches
    // across copies.
    val spans1 = graft.text.CorpusStats.spanDedup(spark, base).count()
    val spans10 = graft.text.CorpusStats.spanDedup(spark, big).count()
    assert(spans1 > 0 && spans10 == 10 * spans1,
      s"q94 dup spans not exactly 10x: $spans1 -> $spans10")

    // q118 SemDeDup with the production scaling k ∝ N: within-cluster
    // comparison volume stays ~linear (fixed k would go quadratic — the
    // k=8 registration is the oracle shape, not the 100 TB shape).
    val sem1 = Scaling.semanticPairVolume(spark, base, 8)
    val sem10 = Scaling.semanticPairVolume(spark, big, 80)
    assert(sem1 > 0 && sem10 <= 20 * sem1,
      s"q118 pair volume not ~linear at 10x with k scaled: $sem1 -> $sem10")

    // q143 PPJoin prefix filtering: ~10x (prefix choice shifts slightly
    // with global document frequencies; quadratic would be ~100x).
    val ppj1 = Scaling.containmentCandidateCount(spark, base)
    val ppj10 = Scaling.containmentCandidateCount(spark, big)
    assert(ppj1 > 0 && ppj10 >= 5 * ppj1 && ppj10 <= 20 * ppj1,
      s"q143 candidates not ~linear at 10x: $ppj1 -> $ppj10")

    // q71 heavy hitters with the production scaling k ∝ flatness: the
    // isomorphic copies hold every per-token count CONSTANT while N
    // grows 10×, so the registered k = 64 certificate must REFUSE on the
    // scaled corpus (the BENCH_SF1 finding — a wrong "exact" top-20 may
    // never ship silently), while k = 640 re-certifies and returns the
    // true brute-force top-20.
    import org.apache.spark.sql.functions._
    intercept[Exception] {
      graft.text.CorpusStats.heavyHittersAt(spark, big, 64).collect()
    }
    val hh = graft.text.CorpusStats.heavyHittersAt(spark, big, 640).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val brute = graft.Tables.documents(spark, big)
      .select(explode(graft.text.TextOps.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(20).collect()
      .zipWithIndex.map { case (r, i) => (i + 1L, r.getString(0), r.getLong(1)) }
      .toSeq
    assert(hh == brute, s"k-scaled q71 must equal brute force at 10x")

    // q71b: the ADAPTIVE entry derives k from the failed k = 64 attempt's
    // own measured (N, c_min) and certifies at 10× with no caller-chosen
    // k — the registered query now reports a real answer where q71's
    // fixed-k guard refuses (r12 judge task 4; refusal property above
    // stays locked).
    val adaptive = graft.text.CorpusStats.heavyHittersAdaptive(spark, big)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(adaptive == brute, "q71b adaptive must equal brute force at 10x")
  }
}
