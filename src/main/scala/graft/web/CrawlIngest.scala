package graft.web

import graft.QueryDef
import graft.llm.Similarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q218: the END-TO-END crawl-ingest gate — every ingest door this
  * engine ships, COMPOSED into one pipeline over `documents` and bound
  * by one census. Each stage is individually oracle-gated elsewhere
  * (q206 WARC, q215 charset, q207 extract, q209/q210 boilerplate, q211
  * robots, q212 frontier, q20 exact dedup, q41 near-dup); what single-
  * stage gates cannot see is the COMPOSITION — stage ordering,
  * quarantine propagation, double counting — which is exactly what this
  * query pins.
  *
  * Ground truth by construction (q210's discipline), per documents row
  * (b = doc_id div 2):
  *  - URL: q208's host family over five hosts / four registered
  *    domains; spelling v = doc_id % 2 (plain vs ?utm_source tracking
  *    param) — both spellings canonicalize to one URL, so the frontier
  *    keeps the even doc and drops the odd one BEFORE any fetch;
  *  - robots: path class b % 4 against the q211 fixture policy as
  *    graftbot (0 `/a/` allow, 1 `/private/` deny, 2 `/private/pub/`
  *    allow via longest-match, 3 `/tmp` deny) — denied keepers are
  *    never fetched;
  *  - fetch: the page renders with per-registered-domain chrome around
  *    a rendered text, wraps in a real HTTP response + WARC record +
  *    gzip member, and the pipeline reads it back through the REAL
  *    chain — Warc.parseFile → HTTP head split → WHATWG charset decode
  *    (three declaration spellings by b % 3: HTTP `charset=` param,
  *    UTF-8 BOM, `<meta charset>`) → Html.extractText;
  *  - rendered text: b % 13 == 5 docs render the text OF doc
  *    2·(b−8) (cross-domain syndication — the exact screen must drop
  *    them), b % 13 == 9 docs render that text plus a trailing note
  *    (near-dup — the MinHash-LSH screen must catch exactly the pairs
  *    whose exact Jaccard ≥ 0.9, which the oracle recomputes);
  *  - b % 11 == 4 docs additionally carry a unique marker line with a
  *    non-ASCII character ("café"), so a charset-precedence defect
  *    corrupts a KEPT line and moves the fingerprint;
  *  - boilerplate: q209/q210's domain-scoped ≥2-pages line rule (chrome
  *    always blanks; a rendered text repeated within one domain blanks
  *    too — the oracle models it);
  *  - exact screen: one keeper (min doc_id) per recovered text across
  *    the whole fetched corpus (cross-domain syndication dedup);
  *  - near-dup screen: q41's machinery — identical-shingle-set collapse,
  *    64-perm MinHash, 8×8 banding, exact-Jaccard ≥ 0.9 verify — over
  *    the exact survivors' RECOVERED text; a gid with a verified
  *    smaller partner drops, as do non-representative members.
  *
  * The census binds per registered domain: stage-by-stage counts AND a
  * mod-prime md5 fingerprint sum over the curated texts — a defect in
  * any stage (or in their ordering) moves a count or the fingerprint.
  *
  * Scale shape: every per-doc step is a kernel; frontier and exact
  * screens are min-aggregates on slim keys (md5 of text, canonical
  * URL); boilerplate follows the q209 hash-only exchange discipline;
  * the near-dup screen is the q41 rep-space band join. Nothing
  * corpus-sized broadcasts: the verify's payload attaches are shuffle
  * joins on gid (the rep frame grows with distinct content, so it may
  * never be a broadcast build side), asserted suite-wide by
  * PlanHygieneSpec's broadcast-bound rule.
  */
object CrawlIngest {

  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private val canonicalizeUdf = udf { (u: String) => Url.canonicalize(u) }
  private val domainUdf = udf { (u: String) => Url.registeredDomain(Url.host(u)) }

  /** Render the fetched page as real WARC bytes: HTTP response with the
    * charset-declaration variant, one gzip member. cv: 0 = HTTP
    * `charset=` param, 1 = UTF-8 BOM (bare content-type), 2 = `<meta
    * charset>` in the head (bare content-type). */
  private val renderWarc = udf { (uri: String, cv: Int, html: String) =>
    val ctype = if (cv == 0) "text/html; charset=utf-8" else "text/html"
    val body =
      if (cv == 1) Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ html.getBytes(Utf8)
      else html.getBytes(Utf8)
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(Iso) ++ body
    Warc.renderGzMembers(Warc.renderRecord("response", Some(uri),
      "application/http; msgtype=response", http))
  }

  /** The read chain: WARC parse → charset sniff+decode → extract →
    * lines. Total: anything degrading yields an empty array (the
    * census fingerprint then exposes it). */
  private val fetchExtract = udf { (bytes: Array[Byte]) =>
    Warc.parseFile(bytes) match {
      case Seq(r) if r.warcType == "response" && r.httpStatus.contains(200) =>
        val (html, _) = Html.decodePayload(r.httpCharset, r.payload)
        val t = Html.extractText(html)
        if (t == null || t.isEmpty) Array.empty[String] else t.split('\n')
      case _ => Array.empty[String]
    }
  }

  def crawlIngestE2e(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val b = expr("doc_id div 2")
    val v = pmod(col("doc_id"), lit(2))
    val hostIdx = pmod(b, lit(5))
    val host = when(hostIdx === 0, "news.example.com")
      .when(hostIdx === 1, "www.sample.co.uk")
      .when(hostIdx === 2, "cdn.assets.example.com")
      .when(hostIdx === 3, "shop.example.org")
      .otherwise("data.gov.uk")
    val cls = pmod(b, lit(4))
    val bs = b.cast("string")
    val path = when(cls === 0, concat(lit("/a/item"), bs))
      .when(cls === 1, concat(lit("/private/p"), bs))
      .when(cls === 2, concat(lit("/private/pub/d"), bs))
      .otherwise(concat(lit("/tmp/x"), bs))
    val raw = concat(lit("https://"), host, path,
      when(v === 1, lit("?utm_source=feed")).otherwise(lit("")))
    val s13 = pmod(b, lit(13))
    val facts = docs.select(col("doc_id"), col("text"),
      raw.as("raw"), path.as("path"), s13.as("s13"), b.as("b"),
      when((s13 === 5 || s13 === 9) && b >= 8, (b - 8) * 2).as("anchor_id"))
    val anchors = docs
      .select(col("doc_id").as("anchor_id"), col("text").as("anchor_text"))
    // per-doc fetch facts; the REAL canonicalization/domain kernels run
    // here (the oracle builds both directly from doc_id arithmetic)
    val d0 = facts.join(anchors, Seq("anchor_id"), "left")
      .select(col("doc_id"), col("raw"), col("path"), col("b"),
        canonicalizeUdf(col("raw")).as("canon"),
        domainUdf(col("raw")).as("domain"),
        // anchor_text (not anchor_id) gates the fallback: an id-sparse
        // corpus (the sf1 isomorphic scaling strides copies apart) can
        // compute an anchor id that does not exist — such docs render
        // their own text, on both engines
        when(col("s13") === 5 && col("anchor_text").isNotNull, col("anchor_text"))
          .when(col("s13") === 9 && col("anchor_text").isNotNull,
            concat(col("anchor_text"), lit(" q218 syndication note trailing")))
          .otherwise(col("text")).as("rtext"))
      .transform(graft.Dist.durableCkpt)
    // ---- stage 1: frontier — one fetch per canonical, earliest wins
    val keepers = d0.groupBy(col("canon")).agg(min(col("doc_id")).as("keeper"))
    val d1 = d0.join(keepers, Seq("canon"))
      .withColumn("is_keeper", col("doc_id") === col("keeper"))
    // ---- stage 2: robots (q211's policy, evaluated as graftbot)
    val policy = Robots.policyFor(Web.RobotsTxt, "graftbot")
    val allowedUdf = udf { (p: String) => policy.allowed(p) }
    val d2 = d1.withColumn("allowed", allowedUdf(col("path")))
    // ---- stage 3: fetch through the real WARC/charset/extract chain
    val marker = col("b") % 11 === 4
    val html = concat(
      when(pmod(col("b"), lit(3)) === 2,
        lit("<html><head><meta charset=\"utf-8\"></head>"))
        .otherwise(lit("<html>")),
      lit("<body><div>Welcome to "), col("domain"), lit(" portal</div><p>"),
      col("rtext"), lit("</p>"),
      when(marker, concat(lit("<p>q218u doc "), col("doc_id").cast("string"),
        lit(" café</p>"))).otherwise(lit("")),
      lit("<div>Contact "), col("domain"), lit(" admin</div></body></html>"))
    val fetched = d2.filter(col("is_keeper") && col("allowed"))
      .select(col("doc_id"), col("domain"),
        fetchExtract(renderWarc(col("canon"),
          pmod(col("b"), lit(3)).cast("int"), html)).as("lines"))
      .transform(graft.Dist.durableCkpt)
    // ---- stage 4: boilerplate (q209 hygiene: hashes shuffle, text
    // re-attaches per page)
    val lineHashes = fetched
      .select(col("doc_id"), col("domain"),
        posexplode(col("lines")).as(Seq("pos", "line")))
      .select(col("doc_id"), col("domain"), col("pos"), md5(col("line")).as("lh"))
    val counts = lineHashes.groupBy(col("domain"), col("lh"))
      .agg(countDistinct(col("doc_id")).as("n_pages"))
    val keptPos = lineHashes.join(counts, Seq("domain", "lh"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(when(col("n_pages") < 2, col("pos"))))
        .as("kept_pos"))
    val rec = fetched.join(keptPos, Seq("doc_id"))
      .select(col("doc_id"), col("domain"),
        array_join(transform(col("kept_pos"),
          p => element_at(col("lines"), p + 1)), "\n").as("recovered"))
      .transform(graft.Dist.durableCkpt)
    // ---- stage 5: exact screen — one keeper per recovered text,
    // corpus-wide (cross-domain syndication dedup); slim md5 keys
    val exKeepers = rec.groupBy(md5(col("recovered")).as("rh"))
      .agg(min(col("doc_id")).as("ek"))
    val ex = rec.withColumn("rh", md5(col("recovered")))
      .join(exKeepers, Seq("rh"))
      .withColumn("is_ex_keeper", col("doc_id") === col("ek"))
    val sur = ex.filter(col("is_ex_keeper"))
      .select(col("doc_id"), col("recovered"))
    // ---- stage 6: near-dup screen (q41's exact machinery over the
    // survivors' recovered text)
    val hsF = sur
      .select(col("doc_id"), Similarity.hashedShingles(col("recovered")).as("hs"))
      .filter(size(col("hs")) > 0)
    val grps = hsF.groupBy(col("hs"))
      .agg(min(col("doc_id")).as("gid"),
        sort_array(collect_list(col("doc_id"))).as("members"))
      .transform(graft.Dist.durableCkpt)
    val reps = grps.select(col("gid"), col("hs"))
    val bk = Similarity.bandKeysFor(reps, "gid")
    val cand = bk.select(col("bkey"), col("gid").as("gid_a"))
      .join(bk.select(col("bkey"), col("gid").as("gid_b")), Seq("bkey"))
      .filter(col("gid_a") < col("gid_b"))
      .select(col("gid_a"), col("gid_b")).distinct()
    // Payload attaches are runtime-size-decided (Dist.sizedBroadcast):
    // the rep frame is the distinct-shingle-set frame of the whole
    // rendered corpus — it grows (sublinearly but unboundedly) with
    // distinct content, so an unconditional broadcast HINT is the class
    // a 100 TB ingest gate cannot build-side — but grps is checkpointed,
    // so a MEASURED bound decides: tiny (every test/bench SF) it
    // broadcasts, past the bound the gid shuffle joins carry each hs
    // array once, candidates slim (two longs) — the q203 bucket-aligned
    // discipline without the landed table.
    val sized = graft.Dist.sizedBroadcast(grps.select(col("gid"), col("hs")))
    val verified = cand
      .join(sized.select(col("gid").as("gid_a"), col("hs").as("hs_a")),
        Seq("gid_a"))
      .join(sized.select(col("gid").as("gid_b"), col("hs").as("hs_b")),
        Seq("gid_b"))
      .withColumn("shared",
        graft.functions.ArrayKernels.sortedIntersectCount(col("hs_a"), col("hs_b")))
      .filter(lit(10) * col("shared") >=
        lit(9) * (size(col("hs_a")) + size(col("hs_b")) - col("shared")))
    val droppedGids = verified.select(col("gid_b").as("gid")).distinct()
    // one explode, one combined predicate: a doc drops when it is a
    // non-keeper member OR its whole group lost the verify (gid
    // dropped). Each doc lives in exactly one group, so the exploded
    // rows are already distinct — no union, no dedup exchange.
    val ndrop = grps.select(col("gid"), explode(col("members")).as("doc_id"))
      .join(droppedGids.withColumn("gdrop", lit(true)), Seq("gid"), "left")
      .filter(col("doc_id") =!= col("gid") || col("gdrop"))
      .select(col("doc_id"))
      .withColumn("nd", lit(true))
    // ---- census per registered domain
    val flags = d2
      .join(ex.select(col("doc_id"), col("is_ex_keeper"),
        col("recovered")), Seq("doc_id"), "left")
      .join(ndrop, Seq("doc_id"), "left")
      .select(col("domain"),
        col("is_keeper"), col("allowed"),
        (col("is_keeper") && col("allowed")).as("f"),
        col("is_ex_keeper"), col("recovered"),
        coalesce(col("nd"), lit(false)).as("nd"))
    flags.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_keeper"), 1L).otherwise(0L)).as("n_frontier"),
        sum(when(col("f"), 1L).otherwise(0L)).as("n_fetched"),
        sum(when(col("f") && col("recovered") === "", 1L).otherwise(0L))
          .as("n_blanked"),
        sum(when(col("f") && !col("is_ex_keeper"), 1L).otherwise(0L))
          .as("n_exact_drop"),
        sum(when(col("f") && col("is_ex_keeper") && col("nd"), 1L)
          .otherwise(0L)).as("n_neardup_drop"),
        sum(when(col("f") && col("is_ex_keeper") && !col("nd"), 1L)
          .otherwise(0L)).as("n_curated"),
        sum(when(col("f") && col("is_ex_keeper") && !col("nd"),
          pmod(conv(substring(md5(col("recovered")), 1, 15), 16, 10)
            .cast("long"), lit(1000000007L))).otherwise(0L)).as("fp_sum"))
      .orderBy(col("domain"))
  }

  // ------------------------------------------------------------- oracle

  private def permRowsSql: String =
    (0 until Similarity.NumPerms)
      .map(i => s"(${i}, ${Similarity.permA(i)}, ${Similarity.permB(i)})")
      .mkString(", ")

  /** The oracle models every stage directly: URLs/domains/robots
    * verdicts from doc_id arithmetic, recovery from the per-domain
    * rendered-text dup rule, the exact screen as a min-per-text window,
    * and the near-dup screen by REPLICATING the MinHash banding (same
    * perms, same 8×8 bands, exact-Jaccard verify) over the survivors —
    * the q41 oracle pattern applied to the composed pipeline. */
  val crawlIngestE2eSql: String = {
    val P = Similarity.P
    s"""WITH base AS (
      |  SELECT doc_id, text, doc_id // 2 AS b, doc_id % 2 AS v FROM documents
      |), u AS (
      |  SELECT doc_id, text, b,
      |    CASE b % 5 WHEN 0 THEN 'example.com' WHEN 1 THEN 'sample.co.uk'
      |      WHEN 2 THEN 'example.com' WHEN 3 THEN 'example.org'
      |      ELSE 'data.gov.uk' END AS domain,
      |    'https://' || CASE b % 5
      |      WHEN 0 THEN 'news.example.com' WHEN 1 THEN 'www.sample.co.uk'
      |      WHEN 2 THEN 'cdn.assets.example.com' WHEN 3 THEN 'shop.example.org'
      |      ELSE 'data.gov.uk' END ||
      |    CASE b % 4 WHEN 0 THEN '/a/item' || b::VARCHAR
      |      WHEN 1 THEN '/private/p' || b::VARCHAR
      |      WHEN 2 THEN '/private/pub/d' || b::VARCHAR
      |      ELSE '/tmp/x' || b::VARCHAR END AS canon,
      |    CASE WHEN b % 4 IN (0, 2) THEN 1 ELSE 0 END AS allowed
      |  FROM base
      |), rt AS (
      |  SELECT u.doc_id, u.domain, u.canon, u.allowed, u.b,
      |    CASE WHEN u.b % 13 = 5 AND a.text IS NOT NULL THEN a.text
      |         WHEN u.b % 13 = 9 AND a.text IS NOT NULL
      |           THEN a.text || ' q218 syndication note trailing'
      |         ELSE u.text END AS rtext
      |  FROM u LEFT JOIN base a
      |    ON a.doc_id = (u.b - 8) * 2 AND u.b % 13 IN (5, 9) AND u.b >= 8
      |), fr AS MATERIALIZED (
      |  SELECT *, MIN(doc_id) OVER (PARTITION BY canon) AS keeper FROM rt
      |), rec AS MATERIALIZED (
      |  SELECT doc_id, domain,
      |    CASE WHEN COUNT(*) OVER (PARTITION BY domain, rtext) > 1
      |         THEN '' ELSE rtext END ||
      |    CASE WHEN b % 11 = 4 THEN
      |      CASE WHEN COUNT(*) OVER (PARTITION BY domain, rtext) > 1
      |           THEN '' ELSE chr(10) END
      |      || 'q218u doc ' || doc_id::VARCHAR || ' café'
      |    ELSE '' END AS recovered
      |  FROM fr WHERE doc_id = keeper AND allowed = 1
      |), ex AS MATERIALIZED (
      |  SELECT *, MIN(doc_id) OVER (PARTITION BY recovered) AS ek FROM rec
      |), sur AS MATERIALIZED (
      |  SELECT doc_id, recovered FROM ex WHERE doc_id = ek
      |), shc AS MATERIALIZED (
      |  SELECT doc_id, list_distinct(list_transform(
      |    list_filter(string_split_regex(lower(recovered), '\\s+'), t -> t <> ''),
      |    t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % $P)) AS hs
      |  FROM sur
      |), gg AS MATERIALIZED (
      |  SELECT hs, MIN(doc_id) AS gid FROM shc WHERE len(hs) > 0 GROUP BY hs
      |), th2 AS (SELECT gid, unnest(hs) AS h FROM gg),
      |perms(i, pa, pb) AS (VALUES $permRowsSql),
      |sigs2 AS (
      |  SELECT gid, i, MIN((pa * h + pb) % $P) AS sig
      |  FROM th2 CROSS JOIN perms GROUP BY gid, i
      |), bands2 AS MATERIALIZED (
      |  SELECT gid, i // ${Similarity.RowsPerBand} AS band,
      |    list(sig ORDER BY i) AS bsig
      |  FROM sigs2 GROUP BY gid, i // ${Similarity.RowsPerBand}
      |), cand2 AS (
      |  SELECT DISTINCT x.gid AS ga, y.gid AS gb
      |  FROM bands2 x JOIN bands2 y ON x.band = y.band AND x.bsig = y.bsig
      |  WHERE x.gid < y.gid
      |), ver2 AS (
      |  SELECT ga, gb FROM cand2
      |  JOIN gg ia ON ia.gid = ga JOIN gg ib ON ib.gid = gb
      |  WHERE 10 * len(list_intersect(ia.hs, ib.hs))
      |    >= 9 * (len(ia.hs) + len(ib.hs) - len(list_intersect(ia.hs, ib.hs)))
      |), memb AS (
      |  SELECT s.doc_id, MIN(s2.doc_id) AS gid FROM shc s
      |  JOIN shc s2 ON s.hs = s2.hs
      |  WHERE len(s.hs) > 0 GROUP BY s.doc_id
      |), ndrop AS (
      |  SELECT doc_id FROM memb
      |  WHERE doc_id <> gid OR gid IN (SELECT DISTINCT gb FROM ver2)
      |), verd AS (
      |  SELECT fr.domain,
      |    CASE WHEN fr.doc_id = fr.keeper THEN 1 ELSE 0 END AS is_k,
      |    CASE WHEN fr.doc_id = fr.keeper AND fr.allowed = 1 THEN 1 ELSE 0 END AS f,
      |    CASE WHEN ex.doc_id IS NOT NULL AND ex.doc_id = ex.ek THEN 1 ELSE 0 END AS is_ek,
      |    CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS nd,
      |    CASE WHEN ex.recovered = '' THEN 1 ELSE 0 END AS blank,
      |    ex.recovered AS recovered
      |  FROM fr
      |  LEFT JOIN ex ON ex.doc_id = fr.doc_id
      |  LEFT JOIN ndrop nd ON nd.doc_id = fr.doc_id
      |)
      |SELECT domain,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(is_k) AS BIGINT) AS n_frontier,
      |  CAST(SUM(f) AS BIGINT) AS n_fetched,
      |  CAST(SUM(f * blank) AS BIGINT) AS n_blanked,
      |  CAST(SUM(f * (1 - is_ek)) AS BIGINT) AS n_exact_drop,
      |  CAST(SUM(f * is_ek * nd) AS BIGINT) AS n_neardup_drop,
      |  CAST(SUM(f * is_ek * (1 - nd)) AS BIGINT) AS n_curated,
      |  CAST(SUM(CASE WHEN f = 1 AND is_ek = 1 AND nd = 0 THEN
      |    CAST(concat('0x', substr(md5(recovered), 1, 15)) AS BIGINT)
      |      % 1000000007 ELSE 0 END) AS BIGINT) AS fp_sum
      |FROM verd GROUP BY domain ORDER BY domain""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q218_crawl_ingest_e2e", crawlIngestE2e, Some(crawlIngestE2eSql)))
}
