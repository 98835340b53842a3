package graft.web

import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {

  private val files = Web.fixtureFiles().toMap

  test("multi-member gz: warcinfo + response + request all parse") {
    val recs = Warc.parseFile(files("crawl_a.warc.gz"))
    assert(recs.map(_.warcType) == Seq("warcinfo", "response", "request"))
    val resp = recs(1)
    assert(resp.targetUri.contains("https://news.example.com/articles/item1"))
    assert(resp.httpStatus.contains(200))
    assert(resp.httpContentType.contains("text/html"))
    assert(new String(resp.payload).startsWith("<html><head><title>Budget Vote"))
    // request: no status line, no content-type, empty body
    val req = recs(2)
    assert(req.httpStatus.isEmpty && req.httpContentType.isEmpty
      && req.payload.isEmpty)
  }

  test("one member holding two records: both parse with correct statuses") {
    val recs = Warc.parseFile(files("crawl_b.warc.gz"))
    assert(recs.map(_.httpStatus) == Seq(Some(200), Some(404)))
    assert(recs(1).httpContentType.contains("text/plain"))
    assert(new String(recs(1).payload) == "not here")
  }

  test("uncompressed .warc: response + metadata + redirect") {
    val recs = Warc.parseFile(files("crawl_c.warc"))
    assert(recs.map(_.warcType) == Seq("response", "metadata", "response"))
    assert(recs(1).httpStatus.isEmpty) // warc-fields block, not http
    assert(new String(recs(1).payload) == "fetchDurationMs: 120")
    assert(recs(2).httpStatus.contains(301))
  }

  test("corrupt trailing gzip member: earlier records survive intact") {
    val recs = Warc.parseFile(files("crawl_d.warc.gz"))
    assert(recs.length == 2 && recs.forall(_.httpStatus.contains(200)))
  }

  test("junk bytes parse to zero records, never throw") {
    assert(Warc.parseFile(files("junk_w.warc")).isEmpty)
    assert(Warc.parseFile(Array.emptyByteArray).isEmpty)
    assert(Warc.parseFile(null).isEmpty)
  }

  test("truncated payload is dropped, records before it are kept") {
    val whole = Warc.gunzipAll(files("crawl_a.warc.gz"))._1
    // cut inside the second record's payload
    val recs = Warc.parseRecords(whole.take(whole.length / 2))
    assert(recs.nonEmpty && recs.length < 3)
  }

  test("totality fuzz: random mutations and cuts never throw") {
    val rnd = new scala.util.Random(99)
    val base = Warc.gunzipAll(files("crawl_b.warc.gz"))._1
    for (_ <- 0 until 200) {
      val cut = rnd.nextInt(base.length)
      Warc.parseRecords(base.take(cut))
      val mut = base.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt().toByte
      Warc.parseRecords(mut)
      Warc.parseFile(Array.fill[Byte](rnd.nextInt(100))(rnd.nextInt().toByte))
    }
  }

  test("writer inverse: parseFile(renderGzMembers(renderRecord...)) = identity") {
    val rnd = new scala.util.Random(7)
    val recs = Seq(
      ("conversion", Some("https://a.com/x"), "text/plain",
        "line one\nline two".getBytes("UTF-8")),
      ("metadata", Some("https://a.com/x?q=1&r=2"), "application/warc-fields",
        Array.emptyByteArray),
      ("resource", None, "application/octet-stream",
        Array.fill[Byte](1000)(rnd.nextInt().toByte)))
    val rendered = recs.map { case (t, u, c, b) => Warc.renderRecord(t, u, c, b) }
    for (bytes <- Seq(rendered.reduce(_ ++ _), // plain concatenation
                      Warc.renderGzMembers(rendered: _*))) { // member-per-record
      val got = Warc.parseFile(bytes)
      assert(got.length == recs.length)
      for ((r, (t, u, c, b)) <- got.zip(recs)) {
        assert(r.warcType == t && r.targetUri == u && r.contentType.contains(c))
        assert(java.util.Arrays.equals(r.payload, b))
      }
    }
  }

  test("gunzipAll: mid-member truncation keeps fully inflated prefix") {
    val gz = files("crawl_a.warc.gz")
    val (data, truncated) = Warc.gunzipAll(gz.take(gz.length - 10))
    assert(truncated || data.nonEmpty) // never throws; prefix retained
  }
}
