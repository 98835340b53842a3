package graft.web

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom feed ingestion (q226) — the THIRD discovery channel
  * beside robots (q211) and sitemaps (q217): feeds are how a polite
  * crawler learns about NEW content between sitemap waves, with
  * publication timestamps sharper than `<lastmod>`.
  *
  * Parser contract (same deliberately-small total scanner as
  * [[Sitemap]] — feeds in the wild are machine-generated and flat):
  *  - Kind detection by root element: `<rss` → RSS 2.0 (items are
  *    `<item>` blocks; link is `<link>` TEXT; timestamp is `<pubDate>`
  *    in RFC 822 / RFC 1123 form), `<feed` → Atom (items are `<entry>`
  *    blocks; link is the `href` ATTRIBUTE of the first `<link>` whose
  *    `rel` is absent or "alternate"; timestamp is `<updated>` in
  *    RFC 3339 form). Anything else parses to no items.
  *  - An item without a link is NOT a discovery and drops (counted by
  *    the caller); title and timestamp are optional. The five XML
  *    entities decode in text nodes. Truncated trailing blocks drop;
  *    adversarial bytes can never throw.
  *
  * q226 ground truth by construction over `documents` (q223's
  * discipline): each row renders a REAL one-item feed — even doc_ids as
  * RSS (with a correct English weekday name computed arithmetically),
  * odd as Atom; a residue class is DEFECTIVE (link omitted), another
  * spells the link with redundant port + fragment (the canonicalizer
  * must collapse it), another embeds an `&amp;` entity in the title.
  * The Spark side must reach every census number through the real
  * parser + `Url.canonicalize`; the oracle computes all of it from
  * doc_id arithmetic.
  *
  * Scale shape: per-row parse kernels + one census aggregate — the
  * embarrassingly-parallel shape of a feed-polling wave. */
object Feed {

  /** One feed item: canonical discovery link, optional decoded title,
    * optional epoch-seconds timestamp. */
  final case class Item(link: String, title: Option[String], ts: Option[Long])

  private[web] def rfc822Epoch(s: String): Option[Long] =
    scala.util.Try(java.time.ZonedDateTime.parse(s.trim,
      java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
      .toEpochSecond).toOption

  private def rfc3339Epoch(s: String): Option[Long] =
    scala.util.Try(java.time.OffsetDateTime.parse(s.trim)
      .toEpochSecond).toOption

  /** First `<link ...>` in `block` whose rel is absent or "alternate",
    * returning its href attribute. Attribute scanner, quote-delimited,
    * total. An attribute name only matches at a word boundary
    * (whitespace before it — `hreflang="…"` is not `lang`), and an
    * empty href is NOT a link (the linkless-drop contract). */
  private def atomLink(block: String): Option[String] = {
    var pos = 0
    while (pos < block.length) {
      val open = block.indexOf("<link", pos)
      if (open < 0) return None
      val end = block.indexOf(">", open)
      if (end < 0) return None
      val tag = block.substring(open, end)
      def attr(name: String): Option[String] = {
        val needle = name + "=\""
        var at = tag.indexOf(needle)
        while (at > 0 && !Character.isWhitespace(tag.charAt(at - 1)))
          at = tag.indexOf(needle, at + 1)
        if (at < 0) None
        else {
          val vs = at + needle.length
          val ve = tag.indexOf('"', vs)
          if (ve < 0) None else Some(tag.substring(vs, ve))
        }
      }
      val rel = attr("rel")
      if (rel.isEmpty || rel.contains("alternate")) {
        val href = attr("href").filter(_.nonEmpty)
        if (href.nonEmpty) return href.map(Sitemap.decodeXml)
      }
      pos = end + 1
    }
    None
  }

  /** Name of the document's ROOT element: the first `<` that opens a
    * real element, skipping comments, doctype/CDATA (`<!`), and
    * processing instructions (`<?`). Total; "" when none exists. */
  private[web] def rootElement(xml: String): String = {
    var pos = 0
    while (pos < xml.length) {
      val lt = xml.indexOf('<', pos)
      if (lt < 0 || lt + 1 >= xml.length) return ""
      if (xml.startsWith("<!--", lt)) {
        val close = xml.indexOf("-->", lt + 4)
        if (close < 0) return ""
        pos = close + 3
      } else if (xml.charAt(lt + 1) == '!' || xml.charAt(lt + 1) == '?') {
        val close = xml.indexOf('>', lt + 1)
        if (close < 0) return ""
        pos = close + 1
      } else {
        var e = lt + 1
        while (e < xml.length && (Character.isLetterOrDigit(xml.charAt(e)) ||
          xml.charAt(e) == ':' || xml.charAt(e) == '-')) e += 1
        return xml.substring(lt + 1, e)
      }
    }
    ""
  }

  /** Parse one feed document. Returns (kind, items): kind is "rss",
    * "atom", or "" when the ROOT ELEMENT is neither — markers inside
    * comments or longer element names (`<feedback>`) never
    * misclassify. */
  def parse(xml: String): (String, Seq[Item]) = {
    if (xml == null) return ("", Seq.empty)
    val root = rootElement(xml)
    val isRss = root == "rss"
    val isAtom = root == "feed"
    if (isRss) {
      val items = Sitemap.blocks(xml, "item").flatMap { b =>
        Sitemap.tagText(b, "link").map { link =>
          Item(link, Sitemap.tagText(b, "title"),
            Sitemap.tagText(b, "pubDate").flatMap(rfc822Epoch))
        }
      }
      ("rss", items)
    } else if (isAtom) {
      val items = Sitemap.blocks(xml, "entry").flatMap { b =>
        atomLink(b).map { link =>
          Item(link, Sitemap.tagText(b, "title"),
            Sitemap.tagText(b, "updated").flatMap(rfc3339Epoch))
        }
      }
      ("atom", items)
    } else ("", Seq.empty)
  }

  // ------------------------------------------------------ q226 gate

  private val P = 1000000007L

  /** English weekday name for 2026-07-`dayNum` (2026-07-01 is a
    * Wednesday, so weekday = (dayNum + 2) % 7 with 0 = Sunday) — the
    * RFC 1123 render clock SHARED by q226 and q228; one copy so the
    * anchor arithmetic can never drift between the two gates. */
  private[web] def rfc1123Dow(dayNum: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dowIdx = pmod(dayNum + 2, lit(7))
    when(dowIdx === 0, "Sun").when(dowIdx === 1, "Mon")
      .when(dowIdx === 2, "Tue").when(dowIdx === 3, "Wed")
      .when(dowIdx === 4, "Thu").when(dowIdx === 5, "Fri").otherwise("Sat")
  }

  /** Parse + canonicalize + summarize one rendered feed:
    * (n_items, canon_link, ts, title_chars) — nulls when the single
    * item dropped. */
  private val parseFeed = udf { (xml: String) =>
    val (_, items) = parse(xml)
    items.headOption.map { it =>
      (items.size, Option(Url.canonicalize(it.link)).getOrElse(""),
        it.ts.getOrElse(-1L), it.title.map(_.length).getOrElse(0))
    }
  }

  def feedDiscovery(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val id = col("doc_id").cast("string")
    val kind = when(pmod(col("doc_id"), lit(2)) === 0, "rss").otherwise("atom")
    val defective = pmod(col("doc_id"), lit(17)) === 3
    val messy = pmod(col("doc_id"), lit(9)) === 2
    val entity = pmod(col("doc_id"), lit(13)) === 7
    val dayNum = pmod(col("doc_id"), lit(28)) + 1
    val dd = lpad(dayNum.cast("string"), 2, "0")
    val hh = lpad(pmod(col("doc_id"), lit(24)).cast("string"), 2, "0")
    val dow = rfc1123Dow(dayNum)
    val link = when(messy,
      concat(lit("https://feeds.example.org:443/u/"), id, lit("#frag")))
      .otherwise(concat(lit("https://feeds.example.org/u/"), id))
    val title = when(entity, concat(lit("A &amp; B "), id))
      .otherwise(concat(lit("Post "), id))
    val rssXml = concat(
      lit("<?xml version=\"1.0\"?><rss version=\"2.0\"><channel><title>c</title><item><title>"),
      title, lit("</title>"),
      when(defective, lit("")).otherwise(concat(lit("<link>"), link, lit("</link>"))),
      lit("<pubDate>"), dow, lit(", "), dd, lit(" Jul 2026 "), hh,
      lit(":00:00 GMT</pubDate></item></channel></rss>"))
    val atomXml = concat(
      lit("<feed xmlns=\"http://www.w3.org/2005/Atom\"><title>c</title><entry><title>"),
      title, lit("</title>"),
      when(defective, lit("")).otherwise(
        concat(lit("<link rel=\"alternate\" href=\""), link, lit("\"/>"))),
      lit("<updated>2026-07-"), dd, lit("T"), hh,
      lit(":00:00Z</updated></entry></feed>"))
    val xml = when(kind === "rss", rssXml).otherwise(atomXml)
    docs
      .select(kind.as("kind"), parseFeed(xml).as("p"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_feeds"),
        sum(when(col("p").isNotNull, col("p._1").cast("long")).otherwise(0L))
          .as("n_items"),
        // per-row mod BEFORE the sum: addends stay < 2^30, so the Long
        // accumulator can't wrap even at 10^10-row groups (same residue
        // as the oracle's exact HUGEINT sum-then-mod)
        pmod(sum(pmod(coalesce(when(col("p._3") >= 0, col("p._3")), lit(0L)),
          lit(P))), lit(P)).as("ts_fp"),
        sum(coalesce(col("p._4").cast("long"), lit(0L))).as("title_chars"),
        sum(when(col("p._2").contains(":443"), 1L)
          .when(col("p._2").contains("#"), 1L).otherwise(0L))
          .as("n_uncanonical"))
      .orderBy(col("kind"))
  }

  /** Oracle: kind, defect classes, the shared UTC instant (GMT pubDate
    * ≡ Z updated), entity-decoded title lengths — all from doc_id
    * arithmetic; canonical links collapse, so n_uncanonical must be
    * ZERO. */
  val feedDiscoverySql: String =
    s"""WITH u AS (
       |  SELECT
       |    CASE doc_id % 2 WHEN 0 THEN 'rss' ELSE 'atom' END AS kind,
       |    doc_id % 17 = 3 AS defective,
       |    epoch(CAST('2026-07-' || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0')
       |      || ' ' || lpad((doc_id % 24)::VARCHAR, 2, '0')
       |      || ':00:00' AS TIMESTAMP))::BIGINT AS ts,
       |    CASE WHEN doc_id % 13 = 7 THEN strlen('A & B ' || doc_id)
       |      ELSE strlen('Post ' || doc_id) END AS title_len
       |  FROM documents
       |)
       |SELECT kind,
       |  CAST(COUNT(*) AS BIGINT) AS n_feeds,
       |  CAST(SUM(CASE WHEN defective THEN 0 ELSE 1 END) AS BIGINT) AS n_items,
       |  CAST(SUM(CASE WHEN defective THEN 0 ELSE ts END)
       |    % 1000000007 AS BIGINT) AS ts_fp,
       |  CAST(SUM(CASE WHEN defective THEN 0 ELSE title_len END) AS BIGINT)
       |    AS title_chars,
       |  CAST(0 AS BIGINT) AS n_uncanonical
       |FROM u GROUP BY kind ORDER BY kind""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q226_feed_discovery", feedDiscovery, Some(feedDiscoverySql)))
}
