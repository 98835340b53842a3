package graft.text

import graft.QueryDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q231: credential/secret scanning — the redaction stage beside PII
  * (q61) every code-and-web pretraining pipeline runs: leaked cloud
  * key ids, VCS access tokens and raw hex secrets must never reach a
  * training shard (models memorize and regurgitate them; this is the
  * detect-secrets pass the Stack/CommonCrawl curation stacks apply).
  *
  * Detection contract (documented, deterministic): three pattern
  * classes —
  *   - cloud access-key ids `AKIA[A-Z0-9]{16}`,
  *   - VCS personal-access tokens `ghp_[A-Za-z0-9]{36}`,
  *   - generic 64-hex secrets `\b[0-9a-f]{64}\b`.
  * Charset-class + length replaces the usual Shannon-entropy threshold
  * on purpose: entropy is float-fragile across engines, while the
  * class rule is integer-exact and covers the same leak shapes.
  * Redaction rewrites every match to `[SECRET]` (all classes, all
  * occurrences).
  *
  * Ground truth by construction (q61's discipline): the harness corpus
  * is clean, so residue classes plant one secret of each kind built
  * from md5(doc_id) arithmetic both engines share; the census binds
  * per-class detection counts, the any-secret doc count, and a
  * fingerprint over the redacted BYTES — a missed match, an
  * over-match, or a wrong replacement moves it.
  *
  * Scale shape: pure per-row regexp kernels (codegen, no UDF) + one
  * census aggregate; redacted text never shuffles. */
object Secrets {

  private val P = 1000000007L

  private val AwsRe = "AKIA[A-Z0-9]{16}"
  private val GhpRe = "ghp_[A-Za-z0-9]{36}"
  private val HexRe = "\\b[0-9a-f]{64}\\b"

  private def redact(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      AwsRe, "[SECRET]"), GhpRe, "[SECRET]"), HexRe, "[SECRET]")

  def secretScan(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val m7 = pmod(col("doc_id"), lit(7))
    val h = md5(col("doc_id").cast("string"))
    val planted = concat(col("text"),
      when(m7 === 1, concat(lit(" key=AKIA"), upper(substring(h, 1, 16))))
        .when(m7 === 3, concat(lit(" token ghp_"), substring(concat(h, h), 1, 36)))
        .when(m7 === 5, concat(lit(" sig "), concat(h, h)))
        .otherwise(lit("")))
    docs
      .select(col("source"),
        size(regexp_extract_all(planted, lit(AwsRe), lit(0))).cast("long").as("n_aws"),
        size(regexp_extract_all(planted, lit(GhpRe), lit(0))).cast("long").as("n_ghp"),
        size(regexp_extract_all(planted, lit(HexRe), lit(0))).cast("long").as("n_hex"),
        md5(redact(planted)).as("red_md5"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_aws")).as("n_aws"),
        sum(col("n_ghp")).as("n_ghp"),
        sum(col("n_hex")).as("n_hex"),
        sum(when(col("n_aws") + col("n_ghp") + col("n_hex") > 0, 1L)
          .otherwise(0L)).as("n_docs_hit"),
        pmod(sum(pmod(conv(substring(col("red_md5"), 1, 15), 16, 10)
          .cast("long"), lit(P))), lit(P)).as("fp_sum"))
      .orderBy(col("source"))
  }

  /** Oracle: the same plants from md5(doc_id) arithmetic, the same
    * three regexes ('g' flag), the same redacted fingerprint. */
  val secretScanSql: String =
    s"""WITH r AS (
       |  SELECT source,
       |    text || CASE doc_id % 7
       |      WHEN 1 THEN ' key=AKIA' || upper(substr(md5(doc_id::VARCHAR), 1, 16))
       |      WHEN 3 THEN ' token ghp_'
       |        || substr(md5(doc_id::VARCHAR) || md5(doc_id::VARCHAR), 1, 36)
       |      WHEN 5 THEN ' sig ' || md5(doc_id::VARCHAR) || md5(doc_id::VARCHAR)
       |      ELSE '' END AS planted
       |  FROM documents
       |), s AS (
       |  SELECT source,
       |    len(regexp_extract_all(planted, 'AKIA[A-Z0-9]{16}')) AS n_aws,
       |    len(regexp_extract_all(planted, 'ghp_[A-Za-z0-9]{36}')) AS n_ghp,
       |    len(regexp_extract_all(planted, '\\b[0-9a-f]{64}\\b')) AS n_hex,
       |    md5(regexp_replace(regexp_replace(regexp_replace(planted,
       |      'AKIA[A-Z0-9]{16}', '[SECRET]', 'g'),
       |      'ghp_[A-Za-z0-9]{36}', '[SECRET]', 'g'),
       |      '\\b[0-9a-f]{64}\\b', '[SECRET]', 'g')) AS red_md5
       |  FROM r
       |)
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_aws) AS BIGINT) AS n_aws,
       |  CAST(SUM(n_ghp) AS BIGINT) AS n_ghp,
       |  CAST(SUM(n_hex) AS BIGINT) AS n_hex,
       |  CAST(SUM(CASE WHEN n_aws + n_ghp + n_hex > 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_docs_hit,
       |  CAST(SUM(CAST(concat('0x', substr(red_md5, 1, 15)) AS BIGINT) % $P)
       |    % $P AS BIGINT) AS fp_sum
       |FROM s GROUP BY source ORDER BY source""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q231_secret_scan", secretScan, Some(secretScanSql)))
}
