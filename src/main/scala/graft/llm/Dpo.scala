package graft.llm

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Preference-pair (DPO/RLHF reward-data) preparation — the stage after
  * SFT shard prep (q214): turn a corpus into (prompt, chosen, rejected)
  * triples, screen them, and audit the two biases that silently ruin
  * preference tuning [Rafailov et al., "Direct Preference Optimization",
  * arXiv:2305.18290; Park et al., "Disentangling Length from Quality in
  * DPO", arXiv:2403.19159 — length bias is THE documented DPO failure
  * mode, so the census must carry it].
  *
  * Documented pipeline contract (q224), in order:
  *   1. PAIR CONSTRUCTION — each document is the preference anchor:
  *      `prompt` = first half of its text, `chosen` = its own
  *      continuation (second half), `rejected` = the continuation of the
  *      successor document (doc_id + 1; a mismatched-response negative,
  *      the standard synthetic-negative recipe). Docs without a
  *      successor produce no pair.
  *   2. DEGENERATE SCREEN — a pair with chosen == rejected carries no
  *      preference signal and must be DROPPED (counted, never trained
  *      on). A planted annotator-duplicate class (doc_id % 41 == 5 sets
  *      rejected := chosen) guarantees the screen is exercised.
  *   3. PROMPT DEDUP — one pair per distinct prompt (first anchor by
  *      doc_id wins): conflicting preferences for one prompt are label
  *      noise. The corpus's planted duplicate texts make this screen
  *      fire too.
  *   4. TEMPLATE RENDER + AUDIT — both sides render through the q214
  *      chat template (user prompt / assistant response); the loss-mask
  *      spans must slice back to exactly the response and the parse
  *      must invert (ok flag, counted).
  *   5. CENSUS — per source: candidate/degenerate/dup/kept counts
  *      (conservation: candidates = degenerate + dup + kept), render
  *      audit passes, the LENGTH-BIAS audit (how often chosen is the
  *      longer side, and the signed char margin), mask volume derived
  *      from the SPANS (a span-offset bug moves it), and a mod-prime
  *      md5 fingerprint over both rendered sides (binds the exact
  *      shard bytes).
  *
  * Ground truth by construction: the oracle rebuilds every step from
  * doc_id arithmetic and direct string concatenation — a pairing,
  * screening, dedup-ordering, rendering or span defect breaks counts or
  * the fingerprint.
  *
  * 100 TB shape: one equi-join on a narrow computed key (doc_id + 1 —
  * shuffle carries id + text halves once), one digest-keyed exchange
  * for the prompt-dedup window (the unavoidable dedup shuffle; the
  * window key is md5(prompt), never raw text), per-row render kernels,
  * and one map-side-combined census aggregate. No broadcast of
  * corpus-sized state, no window over an unpartitioned frame. */
object Dpo {

  private val P = 1000000007L

  /** Render one (prompt, response) exchange through the shared chat
    * template and audit it (spans slice to the response, parse
    * inverts). Returns (rendered, maskChars, ok); null = quarantined
    * (marker injection — cannot happen on the clean harness corpus, so
    * the oracle expects zero quarantines). */
  private val renderSide = udf { (prompt: String, response: String) =>
    val turns = Seq(Sft.Turn("user", prompt), Sft.Turn("assistant", response))
    Sft.render(turns).map { r =>
      val ok = Sft.spansConsistent(r, turns) && Sft.parse(r.text).contains(turns)
      (r.text, Sft.maskChars(r), ok)
    }.orNull
  }

  def dpoPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val half = expr("length(text) div 2")
    val base = docs.select(
      col("doc_id"), col("source"),
      substr(col("text"), lit(1), half).as("prompt"),
      substr(col("text"), half + 1, length(col("text")) - half).as("cont"))
    val partner = base.select((col("doc_id") - 1).as("anchor_id"),
      col("cont").as("partner_cont"))
    val pairs = base
      .join(partner, col("doc_id") === col("anchor_id"))
      .select(col("doc_id"), col("source"), col("prompt"),
        col("cont").as("chosen"),
        when(pmod(col("doc_id"), lit(41)) === 5, col("cont"))
          .otherwise(col("partner_cont")).as("rejected"))
      .withColumn("degenerate", col("chosen") === col("rejected"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("prompt")), col("degenerate"))
          .orderBy(col("doc_id"))))
    val kept = !col("degenerate") && col("rn") === 1
    val rc = renderSide(col("prompt"), col("chosen"))
    val rr = renderSide(col("prompt"), col("rejected"))
    pairs
      .withColumn("rc", when(kept, rc))
      .withColumn("rr", when(kept, rr))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_candidates"),
        sum(when(col("degenerate"), 1L).otherwise(0L)).as("n_degenerate"),
        sum(when(!col("degenerate") && col("rn") > 1, 1L).otherwise(0L))
          .as("n_dup_prompt"),
        sum(when(kept, 1L).otherwise(0L)).as("n_pairs"),
        sum(when(kept && col("rc._3") && col("rr._3"), 1L).otherwise(0L))
          .as("n_ok"),
        sum(when(kept && length(col("chosen")) > length(col("rejected")), 1L)
          .otherwise(0L)).as("n_chosen_longer"),
        sum(when(kept,
          length(col("chosen")).cast("long") - length(col("rejected"))))
          .as("margin_sum"),
        sum(when(kept, col("rc._2") + col("rr._2"))).cast("long")
          .as("mask_sum"),
        pmod(sum(when(kept,
          pmod(conv(substring(md5(concat(col("rc._1"), lit("#"), col("rr._1"))),
            1, 15), 16, 10).cast("long"), lit(P))).otherwise(0L)), lit(P))
          .as("fp_sum"))
      .orderBy(col("source"))
  }

  /** Oracle: the whole pipeline from doc_id arithmetic — successor join,
    * planted degeneracy, digest-dedup window, direct template
    * concatenation, mask = response lengths. All lengths are DuckDB
    * `length()` (CHARACTERS — matches Spark's `length`/`substr`), never
    * `strlen` (bytes): the two agree only on ASCII corpora, and the
    * prompt split / margin / mask must stay aligned when a document
    * carries non-ASCII text (the explicit chars-not-bytes choice the
    * q232 oracle also makes). */
  val dpoPairsSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, source,
       |    substr(text, 1, length(text) // 2) AS prompt,
       |    substr(text, length(text) // 2 + 1,
       |           length(text) - length(text) // 2) AS cont
       |  FROM documents
       |), pr AS (
       |  SELECT a.doc_id, a.source, a.prompt, a.cont AS chosen,
       |    CASE WHEN a.doc_id % 41 = 5 THEN a.cont ELSE b.cont END AS rejected
       |  FROM h a JOIN h b ON b.doc_id = a.doc_id + 1
       |), scr AS (
       |  SELECT *, chosen = rejected AS degenerate,
       |    row_number() OVER (PARTITION BY md5(prompt), chosen = rejected
       |                       ORDER BY doc_id) AS rn
       |  FROM pr
       |), r AS (
       |  SELECT *, NOT degenerate AND rn = 1 AS kept,
       |    '<|user|>' || chr(10) || prompt || chr(10) || '<|assistant|>'
       |      || chr(10) || chosen || chr(10) || '<|end|>' AS rc,
       |    '<|user|>' || chr(10) || prompt || chr(10) || '<|assistant|>'
       |      || chr(10) || rejected || chr(10) || '<|end|>' AS rr
       |  FROM scr
       |)
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_candidates,
       |  CAST(SUM(CASE WHEN degenerate THEN 1 ELSE 0 END) AS BIGINT) AS n_degenerate,
       |  CAST(SUM(CASE WHEN NOT degenerate AND rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_prompt,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       |  CAST(SUM(CASE WHEN kept AND length(chosen) > length(rejected)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_chosen_longer,
       |  CAST(SUM(CASE WHEN kept
       |    THEN length(chosen) - length(rejected) END) AS BIGINT) AS margin_sum,
       |  CAST(SUM(CASE WHEN kept
       |    THEN length(chosen) + length(rejected) END) AS BIGINT) AS mask_sum,
       |  CAST(SUM(CASE WHEN kept THEN
       |      CAST(concat('0x', substr(md5(rc || '#' || rr), 1, 15)) AS BIGINT) % $P
       |    ELSE 0 END) % $P AS BIGINT) AS fp_sum
       |FROM r GROUP BY source ORDER BY source""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q224_dpo_pairs", dpoPairs, Some(dpoPairsSql)))
}
