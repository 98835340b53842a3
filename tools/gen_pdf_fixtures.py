#!/usr/bin/env python3
"""Generate PDF fixtures from the public format spec (ISO 32000-1).

Pure-Python reference WRITER, written independently of the Scala parser
(graft/web/Pdf.scala): the writer follows the spec's file layout (body
objects, xref table, trailer) and content-stream text operators; the
parser must recover the exact text literals below. No PDF library
exists in this container, so cross-validation is spec-vs-spec plus the
format's own structural checks (xref offsets are exact, stream /Length
is exact) — the FLAC fixture discipline (tools/gen_flac_fixtures.py).

Outputs:
  src/main/resources/pdf/<name>.pdf    fixture documents
  (stdout)                             expected (file, page, text) rows

Coverage matrix: raw + FlateDecode content streams, /Length as a direct
number AND as an indirect reference, literal strings with \\( \\) \\\\
and octal escapes, hex strings, Tj / TJ-with-kerning / ' / " / T*
operators, Td/TD line moves, a nested page tree, a /Contents ARRAY
split across two streams, a simple font with a /ToUnicode CMap (bfchar
+ bfrange), a Type0/Identity-H font with 2-byte codes, /WinAnsiEncoding
bytes that only decode correctly under windows-1252, a truncated file
(prefix quarantine) and a junk file (whole-file quarantine).
"""
import os
import zlib

ROOT = os.path.join(os.path.dirname(__file__), "..")
PDF_DIR = os.path.join(ROOT, "src/main/resources/pdf")


class Builder:
    def __init__(self):
        self.objects = []  # bodies, object number = index + 1

    def add(self, body):
        if isinstance(body, str):
            body = body.encode("latin-1")
        self.objects.append(body)
        return len(self.objects)

    def reserve(self):
        self.objects.append(None)
        return len(self.objects)

    def set(self, num, body):
        if isinstance(body, str):
            body = body.encode("latin-1")
        self.objects[num - 1] = body

    def stream(self, extra, data, flate=False, length_ref=None):
        if flate:
            data = zlib.compress(data)
            extra = "/Filter /FlateDecode " + extra
        if length_ref is not None:
            self.set(length_ref, str(len(data)))
            head = f"<< /Length {length_ref} 0 R {extra}>>\nstream\n".encode("latin-1")
        else:
            head = f"<< /Length {len(data)} {extra}>>\nstream\n".encode("latin-1")
        return head + data + b"\nendstream"

    def build(self, root):
        out = bytearray()
        out += b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"
        offsets = [0] * (len(self.objects) + 1)
        for i, body in enumerate(self.objects):
            offsets[i + 1] = len(out)
            out += f"{i + 1} 0 obj\n".encode("latin-1")
            out += body
            out += b"\nendobj\n"
        xref_at = len(out)
        out += f"xref\n0 {len(self.objects) + 1}\n".encode("latin-1")
        out += b"0000000000 65535 f \n"
        for i in range(1, len(self.objects) + 1):
            out += f"{offsets[i]:010d} 00000 n \n".encode("latin-1")
        out += (f"trailer\n<< /Size {len(self.objects) + 1} /Root {root} 0 R >>\n"
                f"startxref\n{xref_at}\n%%EOF\n").encode("latin-1")
        return bytes(out)


def page_obj(parent, contents, font):
    if isinstance(contents, list):
        c = "[" + " ".join(f"{n} 0 R" for n in contents) + "]"
    else:
        c = f"{contents} 0 R"
    return (f"<< /Type /Page /Parent {parent} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> >> /Contents {c} >>")


HELV = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

expected = []  # (file, page, text)


def emit(name, data):
    with open(os.path.join(PDF_DIR, name), "wb") as f:
        f.write(data)


# ---------------------------------------------------------- doc_simple.pdf
# raw (unfiltered) content stream; Tj + Td; paren/backslash/octal escapes
def doc_simple():
    b = Builder()
    font = b.add(HELV)
    content = (rb"BT /F1 12 Tf 72 720 Td (First line with \101 octal) Tj "
               rb"0 -14 Td (Paren \(test\) and backslash \\ done) Tj ET")
    cs = b.add(b.stream("", content))
    pages = b.reserve()
    page = b.add(page_obj(pages, cs, font))
    b.set(pages, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>")
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>")
    emit("doc_simple.pdf", b.build(root))
    expected.append(("doc_simple.pdf", 1,
                     "First line with A octal\n"
                     "Paren (test) and backslash \\ done"))


# ----------------------------------------------------------- doc_flate.pdf
# FlateDecode; TJ with kerning, hex string, ' and " operators, T*
def doc_flate():
    b = Builder()
    font = b.add(HELV)
    content = (b"BT /F1 11 Tf 12 TL 72 720 Td [(Hel) -20 (lo flate)] TJ "
               b"0 -14 Td <48657820627974657321> Tj "
               b"(second via quote) ' "
               b"2 1 (third via dquote) \" "
               b"T* ET")
    cs = b.add(b.stream("", content, flate=True))
    pages = b.reserve()
    page = b.add(page_obj(pages, cs, font))
    b.set(pages, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>")
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>")
    data = b.build(root)
    emit("doc_flate.pdf", data)
    expected.append(("doc_flate.pdf", 1,
                     "Hello flate\nHex bytes!\nsecond via quote\n"
                     "third via dquote"))
    return data


# ----------------------------------------------------------- doc_pages.pdf
# nested page tree; /Contents ARRAY split across two streams; /Length via
# an indirect reference on the first stream
def doc_pages():
    b = Builder()
    font = b.add(HELV)
    len_ref = b.reserve()
    csa = b.add(b.stream("", b"BT /F1 12 Tf 72 720 Td (Split content part one) Tj",
                         length_ref=len_ref))
    csb = b.add(b.stream("", b"0 -14 Td (part two) Tj ET"))
    cs1 = b.add(b.stream("", b"BT /F1 12 Tf 72 720 Td (Page one text) Tj ET",
                         flate=True))
    cs3 = b.add(b.stream("", b"BT /F1 12 Tf 72 720 Td (Page three text) Tj ET"))
    pages = b.reserve()
    inner = b.reserve()
    p1 = b.add(page_obj(pages, cs1, font))
    p2 = b.add(page_obj(inner, [csa, csb], font))
    p3 = b.add(page_obj(inner, cs3, font))
    b.set(inner, f"<< /Type /Pages /Parent {pages} 0 R /Kids [{p2} 0 R {p3} 0 R] /Count 2 >>")
    b.set(pages, f"<< /Type /Pages /Kids [{p1} 0 R {inner} 0 R] /Count 3 >>")
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>")
    emit("doc_pages.pdf", b.build(root))
    expected.append(("doc_pages.pdf", 1, "Page one text"))
    expected.append(("doc_pages.pdf", 2, "Split content part one\npart two"))
    expected.append(("doc_pages.pdf", 3, "Page three text"))


# ------------------------------------------------------- doc_tounicode.pdf
# simple font + ToUnicode CMap: bfchar singles and a bfrange run
def doc_tounicode():
    b = Builder()
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"12 dict begin\nbegincmap\n"
            b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
            b"4 beginbfchar\n"
            b"<41> <005A>\n"   # A -> Z
            b"<42> <00FC>\n"   # B -> u-umlaut
            b"<44> <00E9>\n"   # D -> e-acute
            b"<20> <0020>\n"   # space -> space
            b"endbfchar\n"
            b"1 beginbfrange\n<61> <7A> <0061>\nendbfrange\n"  # a..z identity
            b"endcmap\nend\nend")
    cmap_obj = b.add(b.stream("", cmap, flate=True))
    font = b.add(f"<< /Type /Font /Subtype /TrueType /BaseFont /Custom "
                 f"/ToUnicode {cmap_obj} 0 R >>")
    # codes: A B r i c h SP c a f D  ->  Zürich café
    cs = b.add(b.stream("", b"BT /F1 12 Tf 72 720 Td (ABrich cafD) Tj ET"))
    pages = b.reserve()
    page = b.add(page_obj(pages, cs, font))
    b.set(pages, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>")
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>")
    emit("doc_tounicode.pdf", b.build(root))
    expected.append(("doc_tounicode.pdf", 1, "Zürich café"))


# ----------------------------------------------------------- doc_type0.pdf
# Type0 / Identity-H: 2-byte codes, bfrange identity run + bfchar Greeks
def doc_type0():
    b = Builder()
    cmap = (b"begincmap\n"
            b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            b"1 beginbfrange\n<0041> <005A> <0041>\nendbfrange\n"
            b"2 beginbfchar\n<1234> <0394>\n<1235> <03A9>\nendbfchar\n"
            b"endcmap")
    cmap_obj = b.add(b.stream("", cmap))
    font = b.add(f"<< /Type /Font /Subtype /Type0 /BaseFont /Cust "
                 f"/Encoding /Identity-H /ToUnicode {cmap_obj} 0 R >>")
    # hex string: 2-byte codes G R <Delta> <Omega>
    cs = b.add(b.stream("", b"BT /F1 12 Tf 72 720 Td <0047005212341235> Tj ET"))
    pages = b.reserve()
    page = b.add(page_obj(pages, cs, font))
    b.set(pages, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>")
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>")
    emit("doc_type0.pdf", b.build(root))
    expected.append(("doc_type0.pdf", 1, "GRΔΩ"))


# --------------------------------------------------------- doc_winansi.pdf
# /WinAnsiEncoding, no ToUnicode: bytes 0x92/0x85 are only correct in 1252
def doc_winansi():
    b = Builder()
    font = b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                 "/Encoding /WinAnsiEncoding >>")
    cs = b.add(b.stream("", b"BT /F1 12 Tf 72 720 Td (caf\351 a\222b \205c) Tj ET"))
    pages = b.reserve()
    page = b.add(page_obj(pages, cs, font))
    b.set(pages, f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>")
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>")
    emit("doc_winansi.pdf", b.build(root))
    expected.append(("doc_winansi.pdf", 1, "café a’b …c"))


def main():
    os.makedirs(PDF_DIR, exist_ok=True)
    doc_simple()
    flate_bytes = doc_flate()
    doc_pages()
    doc_tounicode()
    doc_type0()
    doc_winansi()
    # damaged: a 60% prefix of doc_flate.pdf — the page tree survives but
    # the content stream is cut; the parser must quarantine, not throw
    emit("trunc.pdf", flate_bytes[: int(len(flate_bytes) * 0.6)])
    # junk: not a PDF at all
    emit("junk.pdf", b"this is not a pdf at all")
    print("expected (file, page, text):")
    for f, p, t in expected:
        print(f"  {f} page {p}: {t!r}")


if __name__ == "__main__":
    main()
