package graft.web

import org.scalatest.funsuite.AnyFunSuite

/** The q226 feed parser: RSS/Atom kind detection, link rules, RFC 822 /
  * RFC 3339 timestamps, entity decode, and totality on broken input. */
class FeedSpec extends AnyFunSuite {

  private val rss =
    """<?xml version="1.0"?><rss version="2.0"><channel><title>c</title>
      |<item><title>A &amp; B</title><link>https://e.org/a</link>
      |<pubDate>Wed, 01 Jul 2026 08:00:00 GMT</pubDate></item>
      |<item><title>Two</title><link>https://e.org/b</link>
      |<pubDate>garbage date</pubDate></item>
      |<item><title>no link, drops</title></item>
      |</channel></rss>""".stripMargin

  private val atom =
    """<feed xmlns="http://www.w3.org/2005/Atom"><title>c</title>
      |<entry><title>One</title><link rel="self" href="https://e.org/self"/>
      |<link rel="alternate" href="https://e.org/a"/>
      |<updated>2026-07-01T08:00:00Z</updated></entry>
      |<entry><title>bare link</title><link href="https://e.org/b"/></entry>
      |<entry><title>only self, drops</title><link rel="self" href="https://e.org/s"/></entry>
      |</feed>""".stripMargin

  test("rss: items, entity-decoded titles, rfc822 epoch, linkless drop") {
    val (kind, items) = Feed.parse(rss)
    assert(kind == "rss")
    assert(items.map(_.link) == Seq("https://e.org/a", "https://e.org/b"))
    assert(items.head.title.contains("A & B"))
    // 2026-07-01T08:00:00Z
    assert(items.head.ts.contains(1782892800L))
    assert(items(1).ts.isEmpty) // bad date -> item kept, ts dropped
  }

  test("atom: rel=self skipped, alternate/bare href wins, rfc3339 epoch") {
    val (kind, items) = Feed.parse(atom)
    assert(kind == "atom")
    assert(items.map(_.link) == Seq("https://e.org/a", "https://e.org/b"))
    assert(items.head.ts.contains(1782892800L))
  }

  test("rfc822 without weekday and with numeric zone still parses") {
    val x = "<rss><channel><item><link>u</link>" +
      "<pubDate>1 Jul 2026 08:00:00 +0000</pubDate></item></channel></rss>"
    assert(Feed.parse(x)._2.head.ts.contains(1782892800L))
  }

  test("totality: garbage, truncation, wrong root, null") {
    assert(Feed.parse(null) == ("", Seq.empty))
    assert(Feed.parse("") == ("", Seq.empty))
    assert(Feed.parse("<html><body>nope</body></html>") == ("", Seq.empty))
    // truncated trailing item drops, complete one survives
    val t = rss.substring(0, rss.indexOf("<item><title>Two"))
    assert(Feed.parse(t)._2.size == 1)
    // adversarial: unclosed tags everywhere, must not throw
    assert(Feed.parse("<rss><item><link>x")._2.isEmpty)
  }

  test("kind detection reads the ROOT element, not the first substring") {
    assert(Feed.parse("<rss version='2.0'/>")._1 == "rss")
    assert(Feed.parse("<feed/>")._1 == "atom")
    // markers inside comments / prolog / doctype never misclassify
    assert(Feed.parse("<!-- <feed> migration note --><rss><channel/></rss>")._1 == "rss")
    assert(Feed.parse("<?xml version=\"1.0\"?><!DOCTYPE x><feed/>")._1 == "atom")
    // longer element names are not a prefix match
    assert(Feed.parse("<feedback><item/></feedback>")._1 == "")
    assert(Feed.parse("<rsschannel/>")._1 == "")
  }

  test("atom link rules: empty href drops; attr names match at boundaries") {
    // empty href is not a discovery (the linkless-drop contract)
    assert(Feed.parse(
      "<feed><entry><link rel=\"alternate\" href=\"\"/></entry></feed>")
      ._2.isEmpty)
    // hreflang is not href; barrel is not rel
    val (_, items) = Feed.parse(
      "<feed><entry><link hreflang=\"en\" href=\"https://e.org/a\"/></entry>" +
        "<entry><link barrel=\"nofollow\" href=\"https://e.org/b\"/></entry></feed>")
    assert(items.map(_.link) == Seq("https://e.org/a", "https://e.org/b"))
  }
}
