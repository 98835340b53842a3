package graft.web

import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {

  test("block tags segment, inline tags vanish in place") {
    assert(Html.extractText("<p>foo<b>bar</b>baz</p><p>two</p>")
      == "foobarbaz\ntwo")
    assert(Html.extractText("a<br>b") == "a\nb")
    assert(Html.extractText("<td>x</td><td>y</td>") == "x\ny")
  }

  test("script/style/noscript content is dropped entirely") {
    assert(Html.extractText(
      "<p>keep</p><script>var a = '<p>no</p>';</script><p>also</p>")
      == "keep\nalso")
    assert(Html.extractText("<style>p{content:'x'}</style>hi") == "hi")
    assert(Html.extractText("<noscript><p>ignored</p></noscript>ok") == "ok")
    // unterminated script swallows the tail rather than leaking code
    assert(Html.extractText("<p>a</p><script>open(") == "a")
  }

  test("comments and doctype are dropped") {
    assert(Html.extractText("<!DOCTYPE html><p>x</p><!-- note -->y") == "x\ny")
    assert(Html.extractText("a<!-- unterminated") == "a")
  }

  test("entities: named, decimal, hex, nbsp, malformed") {
    assert(Html.extractText("a &amp; b") == "a & b")
    assert(Html.extractText("&lt;tag&gt;") == "<tag>")
    assert(Html.extractText("x&#65;y") == "xAy")
    assert(Html.extractText("x&#x41;y") == "xAy")
    assert(Html.extractText("a&nbsp;&nbsp;b") == "a b") // nbsp → space, collapsed
    assert(Html.extractText("AT&T and R&D") == "AT&T and R&D") // stray &
    assert(Html.extractText("&bogus; &#xzz;") == "&bogus; &#xzz;")
  }

  test("whitespace normalizes per line; empty lines collapse") {
    assert(Html.extractText("<p>  a   b  </p>\n\n<p>\t c </p>") == "a b\nc")
    assert(Html.extractText("<div></div><div></div>") == "")
  }

  test("title: entity-decoded, collapsed; absent → None") {
    assert(Html.title("<title> A &amp;  B </title>").contains("A & B"))
    assert(Html.title("<TITLE lang=en>x</TITLE>").contains("x"))
    assert(Html.title("<p>no title</p>").isEmpty)
    assert(Html.title("<title></title>").isEmpty)
  }

  test("links: quoted, single-quoted, bare; document order") {
    val html = """<a href="/a">1</a><A HREF='b.html'>2</A><a href=c>3</a>"""
    assert(Html.links(html) == Seq("/a", "b.html", "c"))
    assert(Html.links("<a name=x>no href</a>") == Seq.empty)
    assert(Html.links("<a href=\"?q=1&amp;r=2\">e</a>") == Seq("?q=1&r=2"))
  }

  test("anchors: (href, text) pairs; nested markup flattens, entities decode") {
    val html = """<a href="/a"><b>Bold</b> &amp; plain</a><a href='b'>two
                 |lines</a><a href=c></a>""".stripMargin
    assert(Html.anchors(html) == Seq(
      ("/a", "Bold & plain"), ("b", "two lines"), ("c", "")))
    assert(Html.anchors("<a href=\"?q=1&amp;r=2\">x</a>").head._1 == "?q=1&r=2")
    assert(Html.anchors("<a name=skip>no href</a>").isEmpty)
  }

  test("null html → null text (quarantine contract)") {
    assert(Html.extractText(null) == null)
  }

  test("charset precedence: BOM > HTTP header > meta > windows-1252") {
    import java.nio.charset.StandardCharsets.UTF_8
    val bom = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte)
    // BOM wins even against a contradicting header
    val (t1, c1) = Html.decodePayload(Some("iso-8859-1"),
      bom ++ "café".getBytes(UTF_8))
    assert(t1 == "café" && c1 == "utf-8")
    // header wins over meta
    val metaDoc = "<meta charset=\"utf-8\">naïve".getBytes("ISO-8859-1")
    assert(Html.decodePayload(Some("iso-8859-1"), metaDoc)._2 == "iso-8859-1")
    // meta when nothing else declares
    val (t3, c3) = Html.decodePayload(None,
      "<meta charset=utf-8><p>Zürich</p>".getBytes(UTF_8))
    assert(c3 == "utf-8" && t3.contains("Zürich"))
    // silence → 1252: 0x92 is ’ there, a control char in latin-1
    val (t4, c4) = Html.decodePayload(None, Array('a'.toByte, 0x92.toByte))
    assert(c4 == "windows-1252" && t4 == "a’")
    // UTF-16 BOMs
    assert(Html.decodePayload(None,
      "﻿hi".getBytes("UTF-16LE"))._1 == "hi")
    assert(Html.decodePayload(None,
      "﻿hi".getBytes("UTF-16BE"))._1 == "hi")
    // unknown label falls through to the default, never throws
    assert(Html.decodePayload(Some("not-a-charset"),
      "x".getBytes(UTF_8))._2 == "windows-1252")
    // malformed bytes replace, not throw
    val (t5, _) = Html.decodePayload(Some("utf-8"), Array(0xff.toByte))
    assert(t5 == "�")
  }

  test("O(n) guard: pathological nesting finishes fast") {
    val big = "<div>" * 20000 + "x" + "</div>" * 20000
    val t0 = System.nanoTime()
    assert(Html.extractText(big) == "x")
    assert((System.nanoTime() - t0) / 1e9 < 5.0)
    // script-HEAVY page: per-element lowercase would be quadratic here
    val scripty = "<p>k</p>" + "<script>f();</script>" * 20000
    val t1 = System.nanoTime()
    assert(Html.extractText(scripty) == "k")
    assert((System.nanoTime() - t1) / 1e9 < 5.0)
  }
}
