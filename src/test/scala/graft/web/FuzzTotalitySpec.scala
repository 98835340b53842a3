package graft.web

import org.scalatest.funsuite.AnyFunSuite

/** Mutation-fuzz totality sweep over every byte-level parser in the
  * engine. The ingest tier's standing contract is TOTAL parsing —
  * adversarial crawl bytes quarantine, they never throw — and each
  * parser's own spec proves it on hand-written negatives. This spec
  * proves it on thousands of seeded mutations of REAL valid inputs
  * (bit flips, truncations, splices, pure noise), which reach the deep
  * branches hand-written negatives miss: a checksum that passes by
  * luck, a length field pointing past the buffer, a nested structure
  * cut mid-token.
  *
  * Deterministic by construction (fixed seeds, java.util.Random's
  * documented LCG), so a failure reproduces exactly from the printed
  * (parser, fixture, iteration) triple. */
class FuzzTotalitySpec extends AnyFunSuite {

  private def res(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try in.readAllBytes() finally in.close()
  }

  /** One seeded mutation of `seed`: flips, then maybe truncation, then
    * maybe a spliced duplicate slice; sometimes pure noise instead. */
  private def mutate(seed: Array[Byte], rnd: java.util.Random): Array[Byte] = {
    if (seed.isEmpty || rnd.nextInt(10) == 0) {
      val b = new Array[Byte](rnd.nextInt(256))
      rnd.nextBytes(b)
      return b
    }
    var b = seed.clone()
    for (_ <- 0 to rnd.nextInt(8))
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
    if (rnd.nextInt(3) == 0) b = b.take(1 + rnd.nextInt(b.length))
    if (rnd.nextInt(3) == 0) {
      val from = rnd.nextInt(b.length)
      val len = math.min(b.length - from, 1 + rnd.nextInt(64))
      val at = rnd.nextInt(b.length)
      b = (b.take(at) ++ b.slice(from, from + len) ++ b.drop(at)).toArray
    }
    b
  }

  private def sweep(name: String, seeds: Seq[Array[Byte]], iters: Int)(
      parse: Array[Byte] => Any): Unit =
    test(s"$name is total under $iters seeded mutations per fixture") {
      for ((seed, si) <- seeds.zipWithIndex) {
        val rnd = new java.util.Random(0xF00D + si)
        for (i <- 0 until iters) {
          val b = mutate(seed, rnd)
          try parse(b)
          catch {
            case e: Throwable =>
              fail(s"$name threw on fixture#$si iter#$i: $e")
          }
        }
      }
    }

  private def s(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.UTF_8)

  // --- WARC (multi-member gzip + raw): the crawl front door ---
  sweep("Warc.parseRecords",
    Web.fixtureFiles().map(_._2), iters = 300)(Warc.parseRecords(_))

  // --- PDF subset parser: xref-tolerant object scan + content streams ---
  sweep("Pdf.extract",
    Seq("doc_simple.pdf", "doc_flate.pdf", "doc_tounicode.pdf",
      "doc_type0.pdf").map(n => res(s"/pdf/$n")), iters = 300)(Pdf.extract(_))

  // --- FLAC strict decoder: CRC ladder must reject, never throw ---
  sweep("FlacDecode.decode",
    Seq("fixed_orders", "stereo_modes", "escape_parts")
      .map(n => res(s"/flac/$n.flac")), iters = 200)(graft.multimodal.FlacDecode.decode(_))

  // --- XML scanners: sitemap + both feed kinds ---
  private val sitemapXml =
    ("""<?xml version="1.0"?><urlset><url><loc>https://e.org/a</loc>""" +
      """<lastmod>2026-07-01</lastmod><changefreq>daily</changefreq>""" +
      """<priority>0.8</priority></url></urlset>""").getBytes("UTF-8")
  sweep("Sitemap.parse", Seq(sitemapXml), iters = 400)(Sitemap.parse(_))

  private val feedXml =
    ("""<rss version="2.0"><channel><item><title>A &amp; B</title>""" +
      """<link>https://e.org/a</link>""" +
      """<pubDate>Wed, 01 Jul 2026 08:00:00 GMT</pubDate></item>""" +
      """</channel></rss>""").getBytes("UTF-8")
  private val atomXml =
    ("""<feed><entry><title>T</title><link rel="alternate" """ +
      """href="https://e.org/a"/><updated>2026-07-01T08:00:00Z</updated>""" +
      """</entry></feed>""").getBytes("UTF-8")
  sweep("Feed.parse", Seq(feedXml, atomXml), iters = 400)(b => Feed.parse(s(b)))

  // --- HTML extraction: script/style scan + entity decode ---
  private val htmlBytes =
    ("""<html><head><title>T</title><style>b{}</style></head><body>""" +
      """<script>var x="<p>";</script><p>Para &amp; one</p>""" +
      """<a href="/x">link</a><!-- c --></body></html>""").getBytes("UTF-8")
  sweep("Html.extractText", Seq(htmlBytes), iters = 400)(
    b => Html.extractText(s(b)))

  // --- image bitstreams: lossy VP8, lossless VP8L, header-dims ---
  sweep("Vp8/Vp8l/HeaderDims",
    Seq("grad64.webp", "alpha8.webp", "noise128.webp")
      .map(n => res(s"/webp/$n")), iters = 150) { b =>
    graft.images.Vp8.decode(b)
    graft.images.Vp8l.decode(b)
    graft.images.HeaderDims.dims(b)
  }

  // --- media metadata parsers (the q88 router's kernels) ---
  sweep("media metadata parsers",
    Seq(res("/flac/fixed_orders.flac")), iters = 150) { b =>
    graft.multimodal.Flac.parse(b)
    graft.multimodal.Mp3.parse(b)
    graft.multimodal.Mp4.parse(b)
    graft.multimodal.Ogg.parse(b)
    graft.multimodal.Gif.parse(b)
    graft.multimodal.Avi.parse(b)
  }

  // --- HTTP cache-header kernel (q228) ---
  private val httpHead =
    ("HTTP/1.1 200 OK\r\nETag: \"v1\"\r\n" +
      "Last-Modified: Wed, 01 Jul 2026 00:00:00 GMT\r\n" +
      "Cache-Control: public, max-age=86400\r\n").getBytes("UTF-8")
  sweep("HttpCache.parse", Seq(httpHead), iters = 400)(
    b => HttpCache.parse(s(b)))

  // --- URL kernels: canonicalize / resolve / registeredDomain ---
  private val urlBytes = Seq(
    "https://News.Example.com:443/a/x/../it%65m1?utm_source=f&id=2#frag",
    "http://data.gov.uk/path;p=1?a=%2F%2e",
    "//cdn.example.org/a%ZZbad").map(_.getBytes("UTF-8"))
  sweep("Url kernels", urlBytes, iters = 400) { b =>
    val u = s(b)
    Url.canonicalize(u)
    Url.resolve("https://base.example.com/dir/page", u)
    Url.registeredDomain(Url.host(u))
  }
}
