package graft.web

import org.scalatest.funsuite.AnyFunSuite

class UrlSpec extends AnyFunSuite {

  test("scheme/host lower-case, fragment strip, default ports") {
    assert(Url.canonicalize("HTTPS://News.Example.COM/A#sec")
      == "https://news.example.com/A")
    assert(Url.canonicalize("http://a.com:80/x") == "http://a.com/x")
    assert(Url.canonicalize("https://a.com:443/x") == "https://a.com/x")
    // non-default port kept
    assert(Url.canonicalize("https://a.com:8443/x") == "https://a.com:8443/x")
    // path case preserved (paths are case-sensitive)
    assert(Url.canonicalize("https://a.com/CaseSensitive")
      == "https://a.com/CaseSensitive")
  }

  test("dot segments resolve; empty path becomes /; trailing slash kept") {
    assert(Url.canonicalize("https://a.com/a/x/../b/./c")
      == "https://a.com/a/b/c")
    assert(Url.canonicalize("https://a.com") == "https://a.com/")
    assert(Url.canonicalize("https://a.com/a/") == "https://a.com/a/")
    assert(Url.canonicalize("https://a.com/a/b/..") == "https://a.com/a/")
    // climbing past root clamps (RFC 3986 remove_dot_segments)
    assert(Url.canonicalize("https://a.com/../../x") == "https://a.com/x")
  }

  test("percent-escapes: unreserved decode, others upper-case hex") {
    assert(Url.canonicalize("https://a.com/it%65m%2Dx")
      == "https://a.com/item-x")
    assert(Url.canonicalize("https://a.com/a%3ab") == "https://a.com/a%3Ab")
    assert(Url.canonicalize("https://a.com/%7Euser") == "https://a.com/~user")
  }

  test("tracking params drop; other params keep original order") {
    assert(Url.canonicalize("https://a.com/p?utm_source=x&id=3&fbclid=y&z=1")
      == "https://a.com/p?id=3&z=1")
    assert(Url.canonicalize("https://a.com/p?utm_campaign=x")
      == "https://a.com/p")
    assert(Url.canonicalize("https://a.com/p?b=2&a=1")
      == "https://a.com/p?b=2&a=1") // no reorder
    // bare ref is content-bearing on many sites (?ref=<branch>) — kept;
    // ref_src is the referral-only spelling — stripped
    assert(Url.canonicalize("https://a.com/p?ref=hn&gclid=1&q=ok")
      == "https://a.com/p?ref=hn&q=ok")
    assert(Url.canonicalize("https://a.com/p?ref_src=twsrc&q=ok")
      == "https://a.com/p?q=ok")
  }

  test("unparseable → null (quarantine)") {
    assert(Url.canonicalize(null) == null)
    assert(Url.canonicalize("not a url") == null)
    assert(Url.canonicalize("://missing") == null)
    assert(Url.canonicalize("https://") == null)
  }

  test("registeredDomain: two-label default, multi-part suffixes, edge hosts") {
    assert(Url.registeredDomain("news.example.com") == "example.com")
    assert(Url.registeredDomain("cdn.assets.example.com") == "example.com")
    assert(Url.registeredDomain("blog.sample.co.uk") == "sample.co.uk")
    assert(Url.registeredDomain("data.gov.uk") == "data.gov.uk")
    assert(Url.registeredDomain("a.b.co.jp") == "b.co.jp")
    assert(Url.registeredDomain("example.com") == "example.com")
    assert(Url.registeredDomain("localhost") == "localhost")
    assert(Url.registeredDomain("10.0.0.1") == "10.0.0.1")
    assert(Url.registeredDomain("Example.COM.") == "example.com")
  }

  test("resolve: RFC 3986 reference resolution against a base page") {
    val base = "https://a.com/dir/page?q=1#top"
    assert(Url.resolve(base, "x/y") == "https://a.com/dir/x/y")
    assert(Url.resolve(base, "../up") == "https://a.com/dir/../up")
    assert(Url.resolve(base, "/abs") == "https://a.com/abs")
    assert(Url.resolve(base, "//cdn.b.org/z") == "https://cdn.b.org/z")
    assert(Url.resolve(base, "?id=2") == "https://a.com/dir/page?id=2")
    assert(Url.resolve(base, "#sec") == "https://a.com/dir/page#sec")
    assert(Url.resolve(base, "") == base)
    assert(Url.resolve(base, "http://other.com/p") == "http://other.com/p")
    // base with no path: directory is /
    assert(Url.resolve("https://a.com", "x") == "https://a.com/x")
    assert(Url.resolve("https://a.com", "?q=1") == "https://a.com/?q=1")
    // non-fetch schemes are not crawl targets
    assert(Url.resolve(base, "mailto:x@y.z") == null)
    assert(Url.resolve(base, "javascript:void(0)") == null)
    assert(Url.resolve(base, "data:text/plain,hi") == null)
    assert(Url.resolve(null, "x") == null)
    assert(Url.resolve("junk", "x") == null)
  }

  test("host: strips scheme, port, path, query, fragment") {
    assert(Url.host("https://A.B.com:8080/p?q#f") == "a.b.com")
    assert(Url.host("https://a.com") == "a.com")
    assert(Url.host("junk") == null)
  }
}
