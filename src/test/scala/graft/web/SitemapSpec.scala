package graft.web

import org.scalatest.funsuite.AnyFunSuite

class SitemapSpec extends AnyFunSuite {

  test("urlset: loc required, optional fields optional, entities decode") {
    val xml = """<urlset>
      |<url><loc>https://a.com/1</loc><lastmod>2026-01-02</lastmod>
      |<changefreq>weekly</changefreq><priority>0.9</priority></url>
      |<url><loc>https://a.com/2?x=1&amp;y=2</loc></url>
      |<url><loc></loc></url>
      |<url><priority>1.0</priority></url>
      |</urlset>""".stripMargin
    val es = Sitemap.parse(xml.getBytes("UTF-8"))
    assert(es.map(_.loc) == Seq("https://a.com/1", "https://a.com/2?x=1&y=2"))
    assert(es.head.lastmod.contains("2026-01-02"))
    assert(es.head.changefreq.contains("weekly"))
    assert(es.head.priority.contains(0.9))
    assert(es(1).lastmod.isEmpty && es(1).priority.isEmpty)
  }

  test("sitemapindex: child locs with kind=sitemap") {
    val xml = "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>" +
      "<lastmod>2026-02-03</lastmod></sitemap>" +
      "<sitemap><loc>https://a.com/s2.xml.gz</loc></sitemap></sitemapindex>"
    val es = Sitemap.parse(xml.getBytes("UTF-8"))
    assert(es.map(e => (e.kind, e.loc)) == Seq(
      ("sitemap", "https://a.com/s1.xml"), ("sitemap", "https://a.com/s2.xml.gz")))
    assert(es.head.lastmod.contains("2026-02-03"))
  }

  test("gzip payloads inflate; junk and truncation never throw") {
    val xml = "<urlset><url><loc>https://a.com/z</loc></url></urlset>"
    val gz = Warc.renderGzMembers(xml.getBytes("UTF-8"))
    assert(Sitemap.parse(gz).map(_.loc) == Seq("https://a.com/z"))
    assert(Sitemap.parse("not xml".getBytes).isEmpty)
    assert(Sitemap.parse(Array.emptyByteArray).isEmpty)
    assert(Sitemap.parse(null).isEmpty)
    // truncated trailing block drops, complete prefix survives
    val two = "<urlset><url><loc>https://a.com/1</loc></url><url><loc>https://a.co"
    assert(Sitemap.parse(two.getBytes).map(_.loc) == Seq("https://a.com/1"))
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 200)
      Sitemap.parse(Array.fill[Byte](rnd.nextInt(120))(rnd.nextInt().toByte))
  }

  test("double-escaped entities stay escaped one level") {
    val xml = "<urlset><url><loc>https://a.com/?q=&amp;lt;tag&amp;gt;</loc></url></urlset>"
    assert(Sitemap.parse(xml.getBytes).head.loc == "https://a.com/?q=&lt;tag&gt;")
  }
}
