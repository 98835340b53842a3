package graft.llm

import graft.SparkSpec

/** q224 preference-pair prep: pipeline conservation, the planted
  * degenerate class, prompt dedup ordering, and the length-bias audit
  * arithmetic — on a corpus small enough to verify by hand. */
class DpoSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dpo").toString
    rows.toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    Dpo.dpoPairs(spark, dir).collect().map(r =>
      r.getString(0) -> r).toMap
  }

  test("conservation + pairing: candidates = degenerate + dup + kept") {
    // 4 docs, one source; doc 3 has no successor -> 3 candidates
    val docs = Seq(
      (0L, "s", "aaaaaaaaaaBBBBBBBBBB"), // prompt aaaa.., chosen BBBB..
      (1L, "s", "ccccccccccDDDDDDDDDD"),
      (2L, "s", "aaaaaaaaaaBBBBBBBBBB"), // duplicate text -> dup prompt
      (3L, "s", "eeeeeeeeeeFFFFFFFFFF"))
    val m = run(docs)
    val r = m("s")
    assert(r.getLong(1) == 3) // n_candidates
    val (deg, dup, kept) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(deg + dup + kept == 3)
    assert(dup == 1) // doc 2's prompt duplicates doc 0's; doc 0 wins
    assert(r.getLong(5) == kept) // every kept pair passes the render audit
  }

  test("planted annotator-duplicate class is screened (doc_id % 41 == 5)") {
    val docs = (0L to 6L).map(i => (i, "s", f"prompt$i%04d--chosen$i%04d"))
    val r = run(docs)("s")
    // doc 5 pairs with doc 6 but rejected := chosen -> degenerate
    assert(r.getLong(2) == 1)
    assert(r.getLong(1) == 6)
    assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == 6)
  }

  test("length-bias audit: margin and chosen-longer reflect real lengths") {
    // doc 0: text len 20 -> chosen len 10; doc 1: len 8 -> its cont (len 4)
    // becomes doc 0's rejected. margin = 10 - 4 = 6, chosen longer.
    val docs = Seq(
      (0L, "s", "aaaaaaaaaaBBBBBBBBBB"),
      (1L, "s", "ccccDDDD"))
    val r = run(docs)("s")
    assert(r.getLong(4) == 1)
    assert(r.getLong(6) == 1) // n_chosen_longer
    assert(r.getLong(7) == 6) // margin_sum
    assert(r.getLong(8) == 10 + 4) // mask_sum = both response lengths
  }

  test("spans drive mask_sum: rendered template is the q214 contract") {
    val docs = Seq((0L, "s", "ppppppppppRRRRRRRRRR"), (1L, "s", "qqqqqqqqqqSSSSSSSSSS"))
    val r = run(docs)("s")
    // one kept pair; mask = len(chosen) + len(rejected) = 10 + 10
    assert(r.getLong(8) == 20)
    assert(r.getLong(5) == 1) // parse-back + span audit green
  }
}
