package graft.web

/** sitemaps.org XML parsing — the discovery side of the crawl-policy
  * pair (robots.txt says what MAY be fetched; the sitemap says what the
  * site WANTS fetched, with freshness and priority hints a frontier
  * scheduler consumes).
  *
  * Both document kinds parse: `<urlset>` (url entries with optional
  * lastmod / changefreq / priority) and `<sitemapindex>` (child sitemap
  * locs). Gzip payloads (.xml.gz, the common shipping form) inflate via
  * the shared [[Warc.gunzipAll]]. The parser is total: junk or
  * truncated XML yields the entries that parsed completely, garbage
  * yields none (quarantine at the caller) — the same per-item contract
  * as every decode kernel here. A deliberately SMALL scanner, not an
  * XML library: the five XML entities, the four known child tags, no
  * namespace validation — sitemaps in the wild are machine-generated
  * and flat, and a total scanner cannot be made to throw by adversarial
  * crawl bytes.
  */
object Sitemap {

  /** One sitemap entry: `kind` is "url" (urlset member) or "sitemap"
    * (index member). */
  final case class Entry(kind: String, loc: String, lastmod: Option[String],
                         changefreq: Option[String], priority: Option[Double])

  private[web] def decodeXml(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&") // amp LAST (double-escape safe)

  /** Inner text of the first `<tag>...</tag>` inside `block`. */
  private[web] def tagText(block: String, tag: String): Option[String] = {
    val open = block.indexOf(s"<$tag>")
    if (open < 0) return None
    val start = open + tag.length + 2
    val close = block.indexOf(s"</$tag>", start)
    if (close < 0) None
    else Some(decodeXml(block.substring(start, close).trim)).filter(_.nonEmpty)
  }

  /** Every complete `<container>...</container>` block, in order. */
  private[web] def blocks(xml: String, container: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    var go = true
    while (go) {
      val open = xml.indexOf(s"<$container>", pos)
      if (open < 0) go = false
      else {
        val close = xml.indexOf(s"</$container>", open)
        if (close < 0) go = false // truncated trailing block drops
        else {
          out += xml.substring(open + container.length + 2, close)
          pos = close + container.length + 3
        }
      }
    }
    out.result()
  }

  /** Parse one sitemap document (plain or gzip bytes). */
  def parse(bytes: Array[Byte]): Seq[Entry] = {
    if (bytes == null) return Seq.empty
    val xml = new String(Warc.gunzipAll(bytes)._1,
      java.nio.charset.StandardCharsets.UTF_8)
    val urls = blocks(xml, "url").flatMap { b =>
      tagText(b, "loc").map { loc =>
        Entry("url", loc, tagText(b, "lastmod"), tagText(b, "changefreq"),
          tagText(b, "priority").flatMap(_.toDoubleOption))
      }
    }
    val subs = blocks(xml, "sitemap").flatMap { b =>
      tagText(b, "loc").map(Entry("sitemap", _, tagText(b, "lastmod"), None, None))
    }
    urls ++ subs
  }
}
