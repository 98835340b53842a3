package graft.web

import org.scalatest.funsuite.AnyFunSuite

/** The q228 RFC 9111 kernel: header parsing and the documented plan
  * order, on hand-written heads. */
class HttpCacheSpec extends AnyFunSuite {

  test("parse: validators, max-age, no-cache, case-insensitive names") {
    val i = HttpCache.parse(
      "HTTP/1.1 200 OK\r\netag: \"abc\"\r\n" +
        "LAST-MODIFIED: Wed, 01 Jul 2026 00:00:00 GMT\r\n" +
        "Cache-Control: public, max-age=3600\r\nServer: x\r\n")
    assert(i.etag.contains("\"abc\""))
    assert(i.lastModified.contains(1782864000L)) // 2026-07-01T00:00:00Z
    assert(i.maxAge.contains(3600L))
    assert(!i.noCache)
  }

  test("parse: repeated Cache-Control unions; first ETag/LM wins") {
    val i = HttpCache.parse(
      "Cache-Control: no-cache\r\nCache-Control: max-age=60\r\n" +
        "ETag: one\r\nETag: two\r\n")
    assert(i.noCache && i.maxAge.contains(60L))
    assert(i.etag.contains("one"))
  }

  test("parse is total: garbage, bad dates, bad max-age, null") {
    assert(HttpCache.parse(null) == HttpCache.CacheInfo(None, None, None, false))
    assert(HttpCache.parse("???\r\n::\r\n") ==
      HttpCache.CacheInfo(None, None, None, false))
    val i = HttpCache.parse(
      "Last-Modified: not a date\r\nCache-Control: max-age=lots\r\n")
    assert(i.lastModified.isEmpty && i.maxAge.isEmpty)
  }

  test("plan: the documented order") {
    def info(etag: Boolean, ma: Option[Long], nc: Boolean) =
      HttpCache.CacheInfo(if (etag) Some("e") else None, None, ma, nc)
    // no-cache dominates even when fresh by age
    assert(HttpCache.plan(info(etag = true, Some(9999), nc = true), 0) == "revalidate")
    assert(HttpCache.plan(info(etag = false, Some(9999), nc = true), 0) == "fetch")
    // fresh wins over validator
    assert(HttpCache.plan(info(etag = true, Some(100), nc = false), 99) == "skip")
    // stale: validator decides
    assert(HttpCache.plan(info(etag = true, Some(100), nc = false), 100) == "revalidate")
    assert(HttpCache.plan(info(etag = false, Some(100), nc = false), 100) == "fetch")
    // no explicit lifetime = stale (conservative)
    assert(HttpCache.plan(info(etag = false, None, nc = false), 0) == "fetch")
  }
}
