package graft.web

import graft.QueryDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q225: crawl-trap detection — the frontier-protection op every real
  * crawler runs beside robots (q211) and revisit scheduling (q223).
  * Calendar pages, session-id spellings and unbounded pagination
  * generate INFINITE distinct URLs over near-constant content; a
  * frontier that can't spot them spends its fetch budget in one
  * domain's trap [the classic crawler-trap problem — see Heydon &
  * Najork, "Mercator: A Scalable, Extensible Web Crawler", WWW 1999,
  * §3.2 on URL aliasing and traps].
  *
  * Detection contract (content + shape, no knowledge of the plant):
  *   1. TEMPLATE a URL by collapsing volatile tokens: hex runs of ≥ 8
  *      chars → `H` first (session ids; applied before the digit rule
  *      so an all-digit id still reads as one token), then digit runs
  *      → `N`.
  *   2. Per (registered domain, template): `n_urls` = URL volume,
  *      `n_content` = distinct fetched-content values.
  *   3. A template is a TRAP when n_urls ≥ 20 AND n_urls ≥ 5 ×
  *      n_content — many spellings, little content. Thresholds are part
  *      of the documented contract (tuned so a clean article family
  *      with 1:1 content never fires).
  *
  * Ground truth by construction over `documents` (q208 discipline):
  * every row synthesizes one URL in one of four families — clean
  * articles (distinct content per URL), a calendar trap (constant
  * content), a session-id trap (8-hex token over 7 underlying items),
  * and coarse pagination (one content value per 32 pages) — across
  * three registered domains; the registered-domain step runs the REAL
  * `Url.registeredDomain` kernel. The oracle recomputes templates with
  * its own regexp engine and the census from the same arithmetic; a
  * templating or threshold defect moves which templates flag and breaks
  * the template fingerprint.
  *
  * Scale shape: per-row regexp kernels (codegen'd, no UDF in the
  * template path), then a TWO-level aggregate — (domain, template,
  * content) partials combine map-side so the exchange carries one row
  * per distinct content per template, never per URL; the per-domain
  * census is a second slim aggregate. This is the frontier-side
  * screen, so it must stay cheaper than one fetch per URL — and it is:
  * two narrow shuffles over digests and counts. */
object Traps {

  private val P = 1000000007L

  private val regDomainUdf = udf { (u: String) =>
    Url.registeredDomain(Url.host(u))
  }

  /** The documented template collapse: hex≥8 first, then digits. */
  private def template(url: Column): Column =
    regexp_replace(regexp_replace(url, "[0-9a-f]{8,}", "H"), "[0-9]+", "N")

  def crawlTraps(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val base = expr("doc_id div 4")
    val v = pmod(col("doc_id"), lit(4))
    val hostIdx = pmod(base, lit(3))
    val host = when(hostIdx === 0, "news.example.com")
      .when(hostIdx === 1, "www.sample.co.uk")
      .otherwise("data.gov.uk")
    val bs = base.cast("string")
    val mm = lpad((pmod(base, lit(12)) + 1).cast("string"), 2, "0")
    val dd = lpad((pmod(base, lit(28)) + 1).cast("string"), 2, "0")
    val sess = substring(md5(col("doc_id").cast("string")), 1, 8)
    val g = pmod(base, lit(7)).cast("string")
    val page32 = expr("(doc_id div 4) div 32").cast("string")
    val url = when(v === 0, concat(lit("https://"), host, lit("/a/item"), bs))
      .when(v === 1, concat(lit("https://"), host, lit("/cal?d=2026-"), mm,
        lit("-"), dd))
      .when(v === 2, concat(lit("https://"), host, lit("/p/item"), g,
        lit("?s="), sess))
      .otherwise(concat(lit("https://"), host, lit("/list?page="), bs))
    val content = when(v === 0, concat(lit("article "), host, lit(" "), bs))
      .when(v === 1, concat(lit("calendar "), host))
      .when(v === 2, concat(lit("page "), host, lit(" "), g))
      .otherwise(concat(lit("list "), host, lit(" "), page32))
    docs
      .select(url.as("url"), content.as("content"))
      .select(regDomainUdf(col("url")).as("domain"),
        template(col("url")).as("tpl"), col("content"))
      .groupBy(col("domain"), col("tpl"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("content")).as("n_content"))
      .withColumn("trap",
        col("n_urls") >= 20 && col("n_urls") >= lit(5) * col("n_content"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_templates"),
        sum(when(col("trap"), 1L).otherwise(0L)).as("n_trap_templates"),
        sum(col("n_urls")).as("n_urls"),
        sum(when(col("trap"), col("n_urls")).otherwise(0L)).as("n_trapped_urls"),
        pmod(sum(when(col("trap"),
          pmod(conv(substring(md5(col("tpl")), 1, 15), 16, 10).cast("long"),
            lit(P))).otherwise(0L)), lit(P)).as("tpl_fp"))
      .orderBy(col("domain"))
  }

  /** Oracle: same synthesis from doc_id arithmetic, templates via
    * DuckDB's regexp engine ('g' flag — Spark replaces all by default),
    * same thresholds. */
  val crawlTrapsSql: String =
    s"""WITH u AS (
       |  SELECT
       |    CASE (doc_id // 4) % 3 WHEN 0 THEN 'news.example.com'
       |      WHEN 1 THEN 'www.sample.co.uk' ELSE 'data.gov.uk' END AS host,
       |    CASE (doc_id // 4) % 3 WHEN 0 THEN 'example.com'
       |      WHEN 1 THEN 'sample.co.uk' ELSE 'data.gov.uk' END AS domain,
       |    (doc_id // 4)::VARCHAR AS bs,
       |    lpad(((doc_id // 4) % 12 + 1)::VARCHAR, 2, '0') AS mm,
       |    lpad(((doc_id // 4) % 28 + 1)::VARCHAR, 2, '0') AS dd,
       |    substr(md5(doc_id::VARCHAR), 1, 8) AS sess,
       |    ((doc_id // 4) % 7)::VARCHAR AS g,
       |    ((doc_id // 4) // 32)::VARCHAR AS page32,
       |    doc_id % 4 AS v
       |  FROM documents
       |), b AS (
       |  SELECT domain,
       |    CASE v
       |      WHEN 0 THEN 'https://' || host || '/a/item' || bs
       |      WHEN 1 THEN 'https://' || host || '/cal?d=2026-' || mm || '-' || dd
       |      WHEN 2 THEN 'https://' || host || '/p/item' || g || '?s=' || sess
       |      ELSE 'https://' || host || '/list?page=' || bs
       |    END AS url,
       |    CASE v
       |      WHEN 0 THEN 'article ' || host || ' ' || bs
       |      WHEN 1 THEN 'calendar ' || host
       |      WHEN 2 THEN 'page ' || host || ' ' || g
       |      ELSE 'list ' || host || ' ' || page32
       |    END AS content
       |  FROM u
       |), t AS (
       |  SELECT domain,
       |    regexp_replace(regexp_replace(url, '[0-9a-f]{8,}', 'H', 'g'),
       |      '[0-9]+', 'N', 'g') AS tpl,
       |    content
       |  FROM b
       |), agg AS (
       |  SELECT domain, tpl, COUNT(*) AS n_urls,
       |    COUNT(DISTINCT content) AS n_content
       |  FROM t GROUP BY domain, tpl
       |), fl AS (
       |  SELECT *, n_urls >= 20 AND n_urls >= 5 * n_content AS trap FROM agg
       |)
       |SELECT domain,
       |  CAST(COUNT(*) AS BIGINT) AS n_templates,
       |  CAST(SUM(CASE WHEN trap THEN 1 ELSE 0 END) AS BIGINT) AS n_trap_templates,
       |  CAST(SUM(n_urls) AS BIGINT) AS n_urls,
       |  CAST(SUM(CASE WHEN trap THEN n_urls ELSE 0 END) AS BIGINT) AS n_trapped_urls,
       |  CAST(SUM(CASE WHEN trap THEN
       |      CAST(concat('0x', substr(md5(tpl), 1, 15)) AS BIGINT) % $P
       |    ELSE 0 END) % $P AS BIGINT) AS tpl_fp
       |FROM fl GROUP BY domain ORDER BY domain""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q225_crawl_traps", crawlTraps, Some(crawlTrapsSql)))
}
