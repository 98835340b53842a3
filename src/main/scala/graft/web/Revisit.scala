package graft.web

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q223: revisit scheduling — the crawl-MAINTENANCE op that consumes
  * the sitemap freshness/priority hints q217 only parsed (its scaladoc
  * promised "hints the q212 frontier consumes"; this is the consumer):
  * for every known URL, WHEN to re-fetch it.
  *
  * Semantics (documented contract): each URL's sitemap entry carries
  * `lastmod` (W3C date), `changefreq`, and `priority`; the revisit
  * interval maps changefreq → seconds (always 900, hourly 3600, daily
  * 86400, weekly 604800, monthly 2592000), `next_fetch = epoch(lastmod)
  * + interval`, and a URL is DUE when next_fetch ≤ the audit cutoff.
  * Priority rides as basis points (integer-exact ordering weight for
  * the fetch queue).
  *
  * Ground truth by construction over `documents` (q208 discipline) —
  * but the Spark side must reach it through the REAL parsers: each row
  * renders an actual `<urlset>` XML document (one entry; a residue
  * class renders a DEFECTIVE loc-less entry, another a messy
  * port+fragment URL spelling), `Sitemap.parse` extracts the entry,
  * and `Url.canonicalize` collapses the spelling — while the oracle
  * computes every field directly from doc_id arithmetic. A parser or
  * canonicalization defect moves n_parsed, the due census, or the
  * schedule fingerprint.
  *
  * Scale shape: per-row kernels + one groupBy census — a real revisit
  * scheduler runs exactly this over the landed URL table per
  * maintenance wave. */
object Revisit {

  /** 2026-07-20T00:00:00Z — the audit cutoff both engines share. */
  private val CutoffEpoch = 1784505600L

  private val parseEntry = udf { (xml: String) =>
    Sitemap.parse(xml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .headOption.map(e => (Option(Url.canonicalize(e.loc)).getOrElse(""),
        e.lastmod.getOrElse(""), e.changefreq.getOrElse(""),
        e.priority.getOrElse(-1.0)))
  }

  def revisitSchedule(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val cfIdx = pmod(col("doc_id"), lit(5))
    val cf = when(cfIdx === 0, "always").when(cfIdx === 1, "hourly")
      .when(cfIdx === 2, "daily").when(cfIdx === 3, "weekly")
      .otherwise("monthly")
    val day = pmod(col("doc_id"), lit(28)) + 1
    val lastmod = concat(lit("2026-07-"), lpad(day.cast("string"), 2, "0"))
    val prTenths = pmod(col("doc_id"), lit(10)) + 1 // 1..10 → 0.1..1.0
    val priority = when(prTenths === 10, "1.0")
      .otherwise(concat(lit("0."), prTenths.cast("string")))
    val defective = pmod(col("doc_id"), lit(17)) === 3
    val messy = pmod(col("doc_id"), lit(9)) === 2
    val loc = when(messy,
      concat(lit("https://crawl.example.org:443/u/"),
        col("doc_id").cast("string"), lit("#frag")))
      .otherwise(concat(lit("https://crawl.example.org/u/"),
        col("doc_id").cast("string")))
    val xml = concat(
      lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\"><url>"),
      when(defective, lit("")).otherwise(concat(lit("<loc>"), loc, lit("</loc>"))),
      lit("<lastmod>"), lastmod, lit("</lastmod>"),
      lit("<changefreq>"), cf, lit("</changefreq>"),
      lit("<priority>"), priority, lit("</priority>"),
      lit("</url></urlset>"))
    val interval = when(col("p_cf") === "always", 900L)
      .when(col("p_cf") === "hourly", 3600L)
      .when(col("p_cf") === "daily", 86400L)
      .when(col("p_cf") === "weekly", 604800L)
      .otherwise(lit(2592000L))
    docs
      .select(cf.as("cf_class"), parseEntry(xml).as("e"))
      .select(col("cf_class"), col("e._1").as("canon"),
        col("e._2").as("p_lastmod"), col("e._3").as("p_cf"),
        col("e._4").as("p_priority"))
      .withColumn("next_fetch",
        when(col("canon").isNotNull,
          unix_timestamp(to_timestamp(col("p_lastmod"), "yyyy-MM-dd"))
            + interval))
      .groupBy(col("cf_class"))
      .agg(count(lit(1)).as("n_urls"),
        count(col("canon")).as("n_parsed"),
        sum(when(col("next_fetch") <= CutoffEpoch, 1L).otherwise(0L))
          .as("n_due"),
        sum(when(col("canon").isNotNull,
          round(col("p_priority") * 10000).cast("long"))).as("pr_bp_sum"),
        // per-row mod before the sum: overflow-safe at any group size,
        // same residue as the oracle's exact sum-then-mod
        pmod(sum(pmod(coalesce(col("next_fetch"), lit(0L)), lit(1000000007L))),
          lit(1000000007L)).as("sched_fp"),
        sum(when(col("canon").contains(":443"), 1L)
          .when(col("canon").contains("#"), 1L).otherwise(0L))
          .as("n_uncanonical"))
      .orderBy(col("cf_class"))
  }

  /** Oracle: every field from doc_id arithmetic; the canonical form of
    * the messy spelling is the plain URL (port + fragment collapse), so
    * n_uncanonical must be ZERO — a canonicalization defect raises it. */
  val revisitScheduleSql: String =
    s"""WITH u AS (
      |  SELECT
      |    CASE doc_id % 5 WHEN 0 THEN 'always' WHEN 1 THEN 'hourly'
      |      WHEN 2 THEN 'daily' WHEN 3 THEN 'weekly' ELSE 'monthly' END AS cf_class,
      |    CASE doc_id % 5 WHEN 0 THEN 900 WHEN 1 THEN 3600
      |      WHEN 2 THEN 86400 WHEN 3 THEN 604800 ELSE 2592000 END AS ival,
      |    doc_id % 17 = 3 AS defective,
      |    epoch(CAST('2026-07-' || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0')
      |      AS DATE))::BIGINT AS lm_epoch,
      |    (doc_id % 10 + 1) * 1000 AS pr_bp
      |  FROM documents
      |)
      |SELECT cf_class,
      |  CAST(COUNT(*) AS BIGINT) AS n_urls,
      |  CAST(SUM(CASE WHEN defective THEN 0 ELSE 1 END) AS BIGINT) AS n_parsed,
      |  CAST(SUM(CASE WHEN NOT defective AND lm_epoch + ival <= $CutoffEpoch
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_due,
      |  CAST(SUM(CASE WHEN defective THEN NULL ELSE pr_bp END) AS BIGINT) AS pr_bp_sum,
      |  CAST(SUM(CASE WHEN defective THEN 0 ELSE lm_epoch + ival END)
      |    % 1000000007 AS BIGINT) AS sched_fp,
      |  CAST(0 AS BIGINT) AS n_uncanonical
      |FROM u GROUP BY cf_class ORDER BY cf_class""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q223_revisit_schedule", revisitSchedule, Some(revisitScheduleSql)))
}
