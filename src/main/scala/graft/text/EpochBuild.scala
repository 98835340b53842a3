package graft.text

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q235: the EPOCH-BUILD composition gate — the output tier's e2e twin of
  * q218/q233 (ingest) and q234 (versioning). Every stage below is
  * oracle-gated alone; what single-stage gates cannot see is the
  * COMPOSITION a real "build the training epoch" job runs nightly: a
  * selection frontier computed over the wrong subset, a shard assignment
  * taken before the budget cut, or a packer reading pre-shuffle order
  * would each leave every per-stage gate green while the epoch a trainer
  * consumes is silently wrong. The chain, each stage the registered
  * query's exact semantics re-scoped to the previous stage's output:
  *
  *  1. MIX (q109 → q119 stage 1): per-source rate_bp from the token
  *     inventory; keep doc iff `hash60("ord:"++text) mod 10⁴ < rate_bp`;
  *  2. BUDGET (q144): rank the MIXED subset by the q90 classifier score
  *     (best first, doc_id tie-break) and keep docs until 40% of the
  *     mixed subset's tokens are spent — `Dist.globalCumSum` over the
  *     total order, the budget a broadcast one-row aggregate;
  *  3. ORDER+SHARD (q119 stages 2–3): deterministic shuffle by
  *     `hash60("shuf:"++doc_id)`, global position via
  *     `Dist.globalRowNumber`, `shard_id = pos div 64`;
  *  4. PACK (q63 re-scoped): within each shard in training order, token
  *     cumsum → `bin_id = (cum−1) div 256` — the per-shard sequence
  *     budget accounting;
  *  5. MANIFEST (q125's census idiom): one row per shard with doc/token/
  *     bin counts and a bit_xor fingerprint over
  *     (doc_id, shard_id, pos, bin_id) — the hash gate certifies the
  *     full assignment AND the packing, not just totals.
  *
  * 100 TB shape: stages 1–2 are one corpus scan + the q144 range-
  * partitioned cumsum (never a single-partition window); stage 3 is
  * q119's range partition + broadcast offsets; stage 4's window
  * partitions by shard_id (epoch/64 docs per partition value, bounded by
  * construction); the census is one map-combined aggregate over the
  * selected subset. Mixture rates and the budget ride in as broadcast
  * aggregates — no driver-side collects, no corpus-growing broadcast. */
object EpochBuild {

  import graft.llm.Similarity.hash60

  def epochBuild(spark: SparkSession, dir: String): DataFrame = {
    val rates = CorpusStats.mixturePlan(spark, dir)
      .select(col("source"), col("rate_bp"))
    // stage 1: availability-capped source mixing (q109 plan, q119 MIX)
    val mixed = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        pmod(hash60(concat(lit("ord:"), col("text"))), lit(10000)).as("mb"))
      .join(broadcast(rates), Seq("source"))
      .filter(col("mb") < col("rate_bp"))
      .select(col("doc_id"), col("source"))
    // stage 2: quality frontier under the 40%-of-mixed-tokens budget (q144)
    val clf = CorpusStats.qualityClassifier(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("score"))
    val scored = mixed.join(clf, Seq("doc_id"))
    val budget = scored.agg(sum(col("n_tokens")).cast("long").as("total_toks"))
    val sel = graft.Dist.globalCumSum(scored,
        struct((-col("score")).as("negs"), col("doc_id")), col("n_tokens"))
      .crossJoin(broadcast(budget))
      .filter(col("cum") <= expr("4 * total_toks div 10"))
      .select(col("doc_id"), col("n_tokens"),
        hash60(concat(lit("shuf:"), col("doc_id").cast("string"))).as("okey"))
    // stage 3: deterministic shuffle + sharding (q119)
    val sharded = graft.Dist.globalRowNumber(sel, struct(col("okey"), col("doc_id")))
      .withColumn("shard_id", expr(s"(rn - 1) div ${CorpusStats.ShufDocsPerShard}"))
      .withColumn("pos", expr(s"(rn - 1) % ${CorpusStats.ShufDocsPerShard}"))
    // stage 4: per-shard sequence packing in training order (q63)
    val w = Window.partitionBy(col("shard_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = sharded
      .withColumn("cumtok", sum(col("n_tokens")).over(w))
      .withColumn("bin_id",
        expr(s"greatest(cumtok - 1, 0L) div ${CorpusStats.PackC}"))
    // stage 5: manifest census (q125's fingerprint idiom)
    packed
      .select(col("shard_id"), col("n_tokens"), col("bin_id"),
        hash60(concat_ws("\u001f", col("doc_id"), col("shard_id"),
          col("pos"), col("bin_id"))).as("fp"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"),
        countDistinct(col("bin_id")).cast("long").as("n_bins"),
        expr("bit_xor(fp)").cast("long").as("asg_fp"))
      .orderBy(col("shard_id"))
  }

  /** Oracle: the identical five-stage chain in SQL — q109's rate CTE,
    * q90's score, the q144 frontier via window cumsum, q119's
    * ROW_NUMBER order, q63's per-shard packing — so any composition
    * drift (frontier over the wrong subset, shard before cut, packing
    * off training order) moves a count or the fingerprint. */
  val epochBuildSql: String = {
    def h60(key: String) =
      s"CAST(concat('0x', substr(md5($key), 1, 15)) AS BIGINT)"
    s"""WITH s AS (
       |  SELECT source,
       |    CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1
       |), t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total, COUNT(*) AS n_sources FROM s),
       |r AS (
       |  SELECT source,
       |    least(10000, (10000 * (total // n_sources)) // n_tokens) AS rate_bp
       |  FROM s CROSS JOIN t
       |), mix AS (
       |  SELECT d.doc_id FROM documents d JOIN r USING (source)
       |  WHERE ${h60("'ord:' || d.text")} % 10000 < r.rate_bp
       |), clf AS MATERIALIZED (
       |  SELECT doc_id, n_tokens, score
       |  FROM (${CorpusStats.qualityClassifierSql}) c
       |), j AS (
       |  SELECT clf.doc_id, clf.n_tokens, clf.score
       |  FROM mix JOIN clf USING (doc_id)
       |), rk AS (
       |  SELECT *, SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    SUM(n_tokens) OVER () AS total_toks
       |  FROM j
       |), sel AS (
       |  SELECT doc_id, n_tokens,
       |    ${h60("'shuf:' || CAST(doc_id AS VARCHAR)")} AS okey
       |  FROM rk WHERE cum <= 4 * total_toks // 10
       |), o AS (
       |  SELECT doc_id, n_tokens,
       |    ROW_NUMBER() OVER (ORDER BY okey, doc_id) AS rn
       |  FROM sel
       |), sh AS (
       |  SELECT doc_id, n_tokens,
       |    (rn - 1) // ${CorpusStats.ShufDocsPerShard} AS shard_id,
       |    (rn - 1) % ${CorpusStats.ShufDocsPerShard} AS pos
       |  FROM o
       |), p AS (
       |  SELECT *, CAST(greatest(SUM(n_tokens) OVER (PARTITION BY shard_id
       |      ORDER BY pos ROWS UNBOUNDED PRECEDING) - 1, 0)
       |      // ${CorpusStats.PackC} AS BIGINT) AS bin_id
       |  FROM sh
       |)
       |SELECT shard_id, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(COUNT(DISTINCT bin_id) AS BIGINT) AS n_bins,
       |  CAST(bit_xor(${h60("concat_ws(chr(31), doc_id, shard_id, pos, bin_id)")}) AS BIGINT) AS asg_fp
       |FROM p GROUP BY 1 ORDER BY 1""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q235_epoch_build", epochBuild, Some(epochBuildSql)))
}
