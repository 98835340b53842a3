package graft.web

import org.scalatest.funsuite.AnyFunSuite

/** The PDF subset parser against the independent generator's fixtures
  * (tools/gen_pdf_fixtures.py) — expected literals are what the writer
  * printed, re-stated here by hand. */
class PdfSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/pdf/$name")
    require(in != null, s"missing /pdf/$name")
    try in.readAllBytes() finally in.close()
  }

  private def textOf(name: String): Seq[(Int, Option[String])] =
    Pdf.extract(res(name))

  test("simple: raw stream, Tj/Td, paren + backslash + octal escapes") {
    assert(textOf("doc_simple.pdf") == Seq(
      1 -> Some("First line with A octal\nParen (test) and backslash \\ done")))
  }

  test("flate: TJ kerning, hex string, quote operators") {
    assert(textOf("doc_flate.pdf") == Seq(
      1 -> Some("Hello flate\nHex bytes!\nsecond via quote\nthird via dquote")))
  }

  test("nested page tree, contents array, indirect /Length") {
    assert(textOf("doc_pages.pdf") == Seq(
      1 -> Some("Page one text"),
      2 -> Some("Split content part one\npart two"),
      3 -> Some("Page three text")))
  }

  test("ToUnicode CMap: bfchar singles + bfrange run") {
    assert(textOf("doc_tounicode.pdf") == Seq(1 -> Some("Zürich café")))
  }

  test("Type0/Identity-H: 2-byte codes via bfrange + bfchar") {
    assert(textOf("doc_type0.pdf") == Seq(1 -> Some("GRΔΩ")))
  }

  test("WinAnsiEncoding: 0x92/0x85 only correct under windows-1252") {
    assert(textOf("doc_winansi.pdf") == Seq(1 -> Some("café a’b …c")))
  }

  test("damage totality: truncated prefix and junk quarantine, never throw") {
    assert(textOf("trunc.pdf").isEmpty)
    assert(textOf("junk.pdf").isEmpty)
    assert(Pdf.extract(null).isEmpty)
    assert(Pdf.extract(Array.emptyByteArray).isEmpty)
  }

  test("fuzz totality: random cuts and mutations never throw") {
    val base = res("doc_pages.pdf")
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val cut = base.take(rnd.nextInt(base.length))
      Pdf.extract(cut)
      val mut = base.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Pdf.extract(mut)
    }
  }
}
