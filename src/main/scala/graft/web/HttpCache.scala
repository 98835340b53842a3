package graft.web

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q228: conditional-GET revalidation planning — the bandwidth side of
  * crawl maintenance. q223 decides WHEN to revisit a URL; this decides
  * HOW: a stored copy that is still fresh is skipped, a stale copy
  * with a validator revalidates with If-None-Match/If-Modified-Since
  * (a 304 costs headers, not the body), and only a stale copy WITHOUT
  * a validator pays a full fetch [HTTP caching semantics, RFC 9111
  * §4.2 freshness + §4.3 validation; at Common-Crawl scale the 304
  * path is most of the politeness budget].
  *
  * Header kernel ([[parse]], total): case-insensitive names over CRLF
  * (or bare-LF) lines, status line skipped; `ETag` and `Last-Modified`
  * first-wins; `Cache-Control` directives UNION across repeated
  * headers (comma-split; `max-age=N` with a non-numeric N is ignored,
  * `no-cache` is a flag). Last-Modified parses through the shared
  * RFC 1123 clock ([[Feed.rfc822Epoch]]).
  *
  * Plan contract ([[plan]]; documented order):
  *   1. `no-cache` → revalidate when a validator exists, else fetch;
  *   2. `max-age` present and age < max-age → skip (fresh);
  *   3. otherwise stale: validator → revalidate, else fetch.
  * (No heuristic freshness: a copy without explicit lifetime is
  * treated stale — the conservative crawl-side choice.)
  *
  * q228 ground truth by construction (q223 discipline): every
  * `documents` row renders a REAL HTTP response head — ETag /
  * Last-Modified (arithmetically-correct RFC 1123 weekday) /
  * Cache-Control presence all residue-chosen — and the stored-copy age
  * comes from the fetch-history table (plain arithmetic). The Spark
  * side must reach the census through the real header parser; the
  * oracle classifies from doc_id arithmetic alone. The census binds
  * per-action URL counts, the body bytes the plan AVOIDS fetching
  * (skip + 304), and a Last-Modified clock fingerprint so a date-parse
  * defect breaks the gate, not just a spec.
  *
  * Scale shape: per-row kernels + one census aggregate — the
  * maintenance-wave shape, embarrassingly parallel. */
object HttpCache {

  final case class CacheInfo(etag: Option[String], lastModified: Option[Long],
                             maxAge: Option[Long], noCache: Boolean)

  /** Parse an HTTP response HEAD (status line + headers). Total. */
  def parse(head: String): CacheInfo = {
    if (head == null) return CacheInfo(None, None, None, noCache = false)
    var etag: Option[String] = None
    var lm: Option[Long] = None
    var maxAge: Option[Long] = None
    var noCache = false
    for (line <- head.split("\r\n|\n")) {
      val colon = line.indexOf(':')
      if (colon > 0 && !line.startsWith("HTTP/")) {
        val name = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        name match {
          case "etag" => if (etag.isEmpty) etag = Some(value)
          case "last-modified" =>
            if (lm.isEmpty) lm = Feed.rfc822Epoch(value)
          case "cache-control" =>
            for (d <- value.split(',').map(_.trim.toLowerCase(java.util.Locale.ROOT))) {
              if (d == "no-cache") noCache = true
              else if (d.startsWith("max-age="))
                d.substring(8).trim.toLongOption.foreach(v =>
                  if (maxAge.isEmpty) maxAge = Some(v))
            }
          case _ =>
        }
      }
    }
    CacheInfo(etag, lm, maxAge, noCache)
  }

  /** The documented plan order. */
  def plan(info: CacheInfo, ageS: Long): String = {
    val validator = info.etag.nonEmpty || info.lastModified.nonEmpty
    if (info.noCache) { if (validator) "revalidate" else "fetch" }
    else if (info.maxAge.exists(ageS < _)) "skip"
    else if (validator) "revalidate"
    else "fetch"
  }

  // ------------------------------------------------------ q228 gate

  private val P = 1000000007L

  /** Parse + plan one stored response: (action, lm_epoch|-1). */
  private val planUdf = udf { (head: String, ageS: Long) =>
    val info = parse(head)
    (plan(info, ageS), info.lastModified.getOrElse(-1L))
  }

  def revalidationPlan(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val m3 = pmod(col("doc_id"), lit(3))
    val m4 = pmod(col("doc_id"), lit(4))
    val m5 = pmod(col("doc_id"), lit(5))
    val dayNum = pmod(col("doc_id"), lit(28)) + 1
    val dd = lpad(dayNum.cast("string"), 2, "0")
    val dow = Feed.rfc1123Dow(dayNum) // the shared q226/q228 render clock
    val etagHdr = when(m3 === 0,
      concat(lit("ETag: \"v"), col("doc_id").cast("string"), lit("\"\r\n")))
      .otherwise(lit(""))
    val lmHdr = when(m4 =!= 1,
      concat(lit("Last-Modified: "), dow, lit(", "), dd,
        lit(" Jul 2026 00:00:00 GMT\r\n"))).otherwise(lit(""))
    val ccHdr = when(m5 === 0, lit("Cache-Control: public, max-age=86400\r\n"))
      .when(m5 === 1, lit("Cache-Control: no-cache\r\n"))
      .when(m5 === 2, lit("Cache-Control: max-age=604800\r\n"))
      .otherwise(lit(""))
    val head = concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"),
      etagHdr, lmHdr, ccHdr, lit("Server: x\r\n"))
    val ageS = (pmod(col("doc_id"), lit(10)) * 43200L).cast("long")
    val bodyLen = length(concat(lit("body "), col("doc_id").cast("string")))
    docs
      .select(planUdf(head, ageS).as("p"), bodyLen.cast("long").as("body_len"))
      .select(col("p._1").as("action"), col("p._2").as("lm"), col("body_len"))
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n_urls"),
        sum(when(col("action") =!= "fetch", col("body_len")).otherwise(0L))
          .as("body_bytes_saved"),
        // per-row mod before the sum (the ts_fp convention): no Long
        // wraparound at any group size, identical residue to the oracle
        pmod(sum(pmod(when(col("lm") >= 0, col("lm")).otherwise(0L),
          lit(P))), lit(P)).as("lm_fp"))
      .orderBy(col("action"))
  }

  /** Oracle: the plan order replayed in SQL from the residue classes;
    * the Last-Modified clock from date arithmetic. */
  val revalidationPlanSql: String =
    s"""WITH u AS (
       |  SELECT doc_id,
       |    doc_id % 3 = 0 OR doc_id % 4 <> 1 AS validator,
       |    doc_id % 5 = 1 AS nocache,
       |    CASE doc_id % 5 WHEN 0 THEN 86400 WHEN 2 THEN 604800 END AS max_age,
       |    (doc_id % 10) * 43200 AS age_s,
       |    CASE WHEN doc_id % 4 <> 1 THEN
       |      epoch(CAST('2026-07-' || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0')
       |        AS DATE))::BIGINT ELSE -1 END AS lm,
       |    strlen('body ' || doc_id) AS body_len
       |  FROM documents
       |), a AS (
       |  SELECT *,
       |    CASE
       |      WHEN nocache AND validator THEN 'revalidate'
       |      WHEN nocache THEN 'fetch'
       |      WHEN max_age IS NOT NULL AND age_s < max_age THEN 'skip'
       |      WHEN validator THEN 'revalidate'
       |      ELSE 'fetch' END AS action
       |  FROM u
       |)
       |SELECT action,
       |  CAST(COUNT(*) AS BIGINT) AS n_urls,
       |  CAST(SUM(CASE WHEN action <> 'fetch' THEN body_len ELSE 0 END)
       |    AS BIGINT) AS body_bytes_saved,
       |  CAST(SUM(CASE WHEN lm >= 0 THEN lm ELSE 0 END) % $P AS BIGINT) AS lm_fp
       |FROM a GROUP BY action ORDER BY action""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q228_revalidation_plan", revalidationPlan, Some(revalidationPlanSql)))
}
