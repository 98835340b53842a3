package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q235's composition invariants beyond the oracle gate: the shard plan
  * must be a real epoch (dense shards, full shards except the tail, a
  * genuinely binding budget), and the budget frontier must be maximal —
  * a gate whose selection kept everything (rate 100%, budget never
  * binding) or whose shards were degenerate would pass the cross-engine
  * hash vacuously. */
class EpochBuildSpec extends SparkSpec {

  test("q235: sharding is dense and full, the budget binds and is maximal") {
    val rows = EpochBuild.epochBuild(spark, sfDir).collect()
    assert(rows.nonEmpty, "epoch plan is empty")
    val perShard = rows.map(r => (r.getAs[Long]("shard_id"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
      r.getAs[Long]("n_bins"))).sortBy(_._1)
    // dense shard ids 0..max
    assert(perShard.map(_._1).toSeq == (0L until perShard.length).toSeq,
      "shard ids must be dense 0..N-1")
    // every shard but the last holds exactly ShufDocsPerShard docs
    perShard.dropRight(1).foreach { case (sid, n, _, _) =>
      assert(n == CorpusStats.ShufDocsPerShard, s"shard $sid not full: $n")
    }
    assert(perShard.last._2 >= 1 &&
      perShard.last._2 <= CorpusStats.ShufDocsPerShard)
    // packing accounting: bins cover the shard's tokens — each bin holds
    // PackC tokens except possibly where a doc straddles, so n_bins is
    // within [ceil(tokens/PackC) bounds derived from the cumsum scheme]
    perShard.foreach { case (sid, n, toks, bins) =>
      assert(bins >= 1 && bins <= n, s"shard $sid bins out of range")
      assert(bins <= toks / CorpusStats.PackC + 1,
        s"shard $sid plans more bins than its token mass can end in")
    }
    // the budget BINDS (selection is a strict subset of the mixed pool)
    // and is greedily MAXIMAL (one more doc would cross it): recompute
    // the frontier independently from the stage builders
    val rates = CorpusStats.mixturePlan(spark, sfDir)
      .select(col("source"), col("rate_bp"))
    val mixed = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        pmod(graft.llm.Similarity.hash60(concat(lit("ord:"), col("text"))),
          lit(10000)).as("mb"))
      .join(rates, Seq("source")).filter(col("mb") < col("rate_bp"))
      .join(CorpusStats.qualityClassifier(spark, sfDir)
        .select(col("doc_id"), col("n_tokens"), col("score")), Seq("doc_id"))
    val ordered = mixed.orderBy(col("score").desc, col("doc_id"))
      .select(col("n_tokens")).collect().map(_.getLong(0))
    val budget = 4L * ordered.sum / 10L
    val selTokens = perShard.map(_._3).sum
    val nSel = perShard.map(_._2).sum
    assert(selTokens <= budget, "selection exceeds the token budget")
    assert(nSel < ordered.length, "budget never binds — vacuous frontier")
    assert(nSel == ordered.scanLeft(0L)(_ + _).tail.count(_ <= budget),
      "frontier is not the maximal greedy prefix")
  }
}
