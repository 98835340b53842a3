package graft.web

import graft.SparkSpec

class WebSpec extends SparkSpec {

  test("q206: record census matches the fixture layout, junk quarantines") {
    val rows = Web.warcRecords(spark, sfDir).collect()
    assert(rows.length == 11)
    val byFile = rows.groupBy(_.getString(0))
    assert(byFile("crawl_a.warc.gz").length == 3)
    assert(byFile("crawl_b.warc.gz").length == 2)
    assert(byFile("crawl_c.warc").length == 3)
    assert(byFile("crawl_d.warc.gz").length == 2)
    val junk = byFile("junk_w.warc").head
    assert(junk.isNullAt(1) && junk.isNullAt(2) && junk.isNullAt(6))
    // payload integrity: the 404 body is byte-exact
    val miss = rows.find(r => !r.isNullAt(4) && r.getInt(4) == 404).get
    assert(miss.getLong(6) == 8L) // "not here"
  }

  test("q207: extraction equals the hand-derived page text") {
    val rows = Web.htmlExtract(spark, sfDir).collect()
    assert(rows.length == 5)
    val n1 = rows.find(_.getString(0).endsWith("item1")).get
    assert(n1.getString(1) == "Budget Vote" && n1.getInt(2) == 1
      && n1.getInt(3) == 7)
    assert(n1.getString(4).contains("wide margin & takes effect"))
    // 404 / 301 / request records never reach the extraction tier
    assert(!rows.exists(_.getString(0).contains("item9")))
    assert(!rows.exists(_.getString(0).contains("/old/")))
  }

  test("q209/q210 exchange hygiene: no raw line payload crosses a shuffle") {
    for (df <- Seq(Web.boilerplateLines(spark, sfDir),
                   Web.webPipeline(spark, sfDir));
         ex <- shuffleExchanges(df);
         attr <- ex.children.flatMap(_.output)) {
      // "buf" is an ObjectHashAggregate partial buffer, not payload
      assert(!Set("line", "payload", "content").contains(attr.name),
        s"raw payload column ${attr.name} crossed an exchange")
    }
  }

  test("q209: domain-scoped boilerplate is removed, content kept in order") {
    val rows = Web.boilerplateLines(spark, sfDir).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val kept = r.getString(4)
      assert(!kept.contains("Home | World | Tech"))
      assert(!kept.contains("Copyright 2026"))
      assert(!kept.contains("About Archive Contact"))
      assert(!kept.contains("Powered by QuillPress"))
    }
    val n3 = rows.find(_.getString(1).endsWith("item3")).get
    assert(n3.getInt(2) == 5 && n3.getInt(3) == 3)
    assert(n3.getString(4) ==
      "Rail Strike Ends / Rail strike ends / Trains resume service tonight after a six-day stoppage.")
  }

  test("q208: canonicalization collapses the eight spellings per page") {
    val rows = Web.urlCanonical(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // closed-form model over doc_id 0..499 (sf0.001): base 0..62,
    // host = base%5, full bases carry 8 variants → 2 canonicals (plain
    // + the ?id= one), the partial base 62 (v 0..3) carries 1
    assert(rows == Seq(
      ("data.gov.uk", 96L, 96L, 24L),
      ("example.com", 204L, 204L, 51L),
      ("example.org", 96L, 96L, 24L),
      ("sample.co.uk", 104L, 104L, 26L)))
  }

  test("q210: every unique-text doc recovers byte-exactly through the pipeline") {
    val rows = Web.webPipeline(spark, sfDir).collect()
    // sf0.001: 20 sources, 25 docs each, no same-source exact dups
    assert(rows.length == 20)
    assert(rows.forall(r => r.getLong(1) == 25L && r.getLong(2) == 25L))
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
  }

  test("q217: sitemap audit parses both kinds, canonicalizes, quarantines") {
    val rows = Web.sitemapAudit(spark, sfDir).collect()
    assert(rows.length == 8)
    val junk = rows.filter(_.getString(0) == "junk_sm.xml")
    assert(junk.length == 1 && junk.head.isNullAt(2))
    val messy = rows.find(r => !r.isNullAt(3) &&
      r.getString(3).startsWith("HTTPS://Maps")).get
    assert(messy.getString(4) == "https://maps.example.com/b/page1")
    assert(rows.count(r => !r.isNullAt(2) && r.getString(2) == "sitemap") == 2)
  }

  test("q216: link graph resolves every href class, drops mailto") {
    val rows = Web.linkGraph(spark, sfDir).collect()
    assert(rows.length == 9)
    assert(!rows.exists(_.getString(1).startsWith("mailto")))
    val up = rows.find(_.getString(1) == "../up").get
    assert(up.getString(2) == "https://links.example.com/up")
    val ext = rows.find(_.getString(1).contains("utm_source")).get
    assert(ext.getString(2) == "https://other.sample.co.uk/x?id=9"
      && ext.getString(3) == "sample.co.uk")
    val bold = rows.find(_.getString(1) == "/a/b").get
    assert(bold.getString(4) == "bold link & more")
  }

  test("q215: each declaration mechanism decodes to the expected text") {
    val rows = Web.charsetDecode(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(
      ("cs_bom.warc.gz", "utf-8", "Héllo café"),
      ("cs_header.warc.gz", "iso-8859-1", "naïve résumé"),
      ("cs_meta.warc", "utf-8", "Zürich Straße"),
      ("cs_none.warc.gz", "windows-1252", "a’b…c")))
  }

  test("q213: WET conversion round-trips the extracted text byte-exactly") {
    val rows = Web.wetConversion(spark, sfDir).collect()
    assert(rows.length == 5)
    assert(rows.forall(r => !r.isNullAt(1) && r.getLong(2) > 0))
    val n3 = rows.find(_.getString(0).endsWith("item3")).get
    val expected = "Rail Strike Ends\nHome | World | Tech\nRail strike ends\n" +
      "Trains resume service tonight after a six-day stoppage.\n" +
      "Copyright 2026 News Example"
    assert(n3.getLong(2) == expected.length.toLong)
  }

  test("q212: frontier keeps one fetch per canonical, politeness-spaced") {
    val rows = Web.crawlFrontier(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // closed-form: frontier = canonical count from the q208 model;
    // makespan = (frontier-1) * domain delay
    assert(rows == Seq(
      ("data.gov.uk", 96L, 24L, 23L * 10000L),
      ("example.com", 204L, 51L, 50L * 2000L),
      ("example.org", 96L, 24L, 23L * 5000L),
      ("sample.co.uk", 104L, 26L, 25L * 1000L)))
  }

  test("q211: robots census matches the hand-derived per-class verdicts") {
    val rows = Web.robotsAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((0L, 100L, 100L), (1L, 100L, 0L), (2L, 100L, 100L),
      (3L, 100L, 0L), (4L, 100L, 0L)))
  }
}
