package graft.web

/** Pure-JVM HTML→text extraction — the step between a crawl's HTTP
  * payloads and every text operator in this engine (dedup, quality,
  * tokenization). Same tier as the reference's caption/text readers
  * (modules/other_tasks.py reads text payloads as-is); a web pipeline
  * needs the markup stripped first.
  *
  * The extraction contract (deterministic, documented, spec-locked —
  * the jusText/trafilatura family's pre-segmentation step):
  *  1. `<!-- comments -->`, `<!DOCTYPE ...>`, and the full element
  *     content of `<script>`, `<style>`, `<noscript>` are dropped;
  *  2. inline phrase tags (a, b, i, em, strong, span, code, u, s,
  *     small, sub, sup, abbr, mark, time, wbr) are removed in place —
  *     `foo<b>bar</b>` reads "foobar";
  *  3. every other tag is a LINE BREAK (block elements, br, td, li, …
  *     all segment text; over-segmenting is harmless because empty
  *     lines collapse, under-segmenting would glue paragraphs);
  *  4. character entities decode after tag removal: the common named
  *     set plus numeric `&#NNN;` / `&#xHH;` (nbsp → plain space);
  *  5. whitespace normalizes per line (runs → one space, trim), empty
  *     lines drop, lines join with '\n'.
  */
object Html {

  private val Inline = Set("a", "b", "i", "em", "strong", "span", "code",
    "u", "s", "small", "sub", "sup", "abbr", "mark", "time", "wbr")

  private val Named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ", "mdash" -> "\u2014",
    "ndash" -> "\u2013", "hellip" -> "\u2026", "copy" -> "\u00a9",
    "reg" -> "\u00ae", "trade" -> "\u2122", "laquo" -> "\u00ab",
    "raquo" -> "\u00bb", "rsquo" -> "\u2019", "lsquo" -> "\u2018",
    "rdquo" -> "\u201d", "ldquo" -> "\u201c")

  /** Decode one entity starting at `i` (which points at '&').
    * Returns (decoded text, chars consumed) — ("&", 1) when it isn't a
    * well-formed entity, so stray ampersands survive verbatim. */
  private def entityAt(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return ("&", 1)
    val body = s.substring(i + 1, semi)
    val dec: Option[String] =
      if (body.startsWith("#x") || body.startsWith("#X"))
        scala.util.Try(Integer.parseInt(body.drop(2), 16)).toOption
          .filter(c => c > 0 && c <= 0x10ffff).map(c => new String(Character.toChars(c)))
      else if (body.startsWith("#"))
        body.drop(1).toIntOption
          .filter(c => c > 0 && c <= 0x10ffff).map(c => new String(Character.toChars(c)))
      else Named.get(body)
    dec.map((_, semi - i + 1)).getOrElse(("&", 1))
  }

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') { val (t, n) = entityAt(s, i); sb ++= t; i += n }
      else { sb += s.charAt(i); i += 1 }
    }
    sb.toString
  }

  /** ASCII-only lower fold — tag names are matched byte-wise per the
    * HTML spec; String.toLowerCase is locale-sensitive (tr/az dotless-i)
    * and length-changing (U+0130 → two chars), both of which corrupt
    * offset-based scans over crawl bytes. */
  private def asciiLower(s: String): String = {
    val a = s.toCharArray
    var j = 0
    while (j < a.length) {
      val c = a(j); if (c >= 'A' && c <= 'Z') a(j) = (c + 32).toChar; j += 1
    }
    new String(a)
  }

  /** Lower-cased (ASCII fold) tag name at `i` (after "<" / "</");
    * empty if none. */
  private def tagNameAt(s: String, i: Int): String = {
    var j = i
    while (j < s.length && (s.charAt(j).isLetterOrDigit)) j += 1
    asciiLower(s.substring(i, j))
  }

  /** Index of `</name` at or after `from`, ASCII-case-insensitively;
    * -1 if absent. Per-char regionMatches keeps offsets aligned with
    * the ORIGINAL string (no lowercase copy) and stays O(n·|name|). */
  private def indexOfCloseTag(s: String, name: String, from: Int): Int = {
    // ASCII-only per-char fold: regionMatches(true, ...) is UNICODE
    // case-insensitive (U+017F 'ſ' matches 's', U+212A matches 'k'),
    // which would let "</ſcript>" inside a script body close the
    // element — tag names fold only A-Z per the HTML spec
    def matchesAt(i: Int): Boolean = {
      var j = 0
      while (j < name.length) {
        val c = s.charAt(i + j)
        val folded = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        if (folded != name.charAt(j)) return false
        j += 1
      }
      true
    }
    var i = math.max(from, 0)
    val last = s.length - name.length - 2
    while (i <= last) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '/' && matchesAt(i + 2))
        return i
      i += 1
    }
    -1
  }

  /** Raw text with tags resolved per the contract (rules 1–3): one
    * linear scan, no backtracking — a per-row kernel that stays O(n)
    * on adversarial crawl bytes. */
  private def stripTags(html: String): String = {
    val sb = new StringBuilder(html.length)
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && html.charAt(i + 1) == '!') {
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
          sb += '\n'
        } else {
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          val name = tagNameAt(html, if (closing) i + 2 else i + 1)
          val gt = html.indexOf('>', i)
          if (gt < 0) i = n
          else if (!closing && (name == "script" || name == "style" || name == "noscript")) {
            val e = indexOfCloseTag(html, name, gt)
            if (e < 0) i = n
            else { val g2 = html.indexOf('>', e); i = if (g2 < 0) n else g2 + 1 }
            sb += '\n'
          } else {
            if (!Inline.contains(name)) sb += '\n'
            i = gt + 1
          }
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Full extraction per the 5-rule contract. */
  def extractText(html: String): String = {
    if (html == null) return null
    decodeEntities(stripTags(html))
      .split('\n')
      .iterator
      .map(_.replaceAll("[\\s\u00a0]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  private val TitleRe =
    java.util.regex.Pattern.compile("(?is)<title[^>]*>(.*?)</title>")
  private val HrefRe = java.util.regex.Pattern.compile(
    "(?is)<a\\b[^>]*?href\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>]+))")

  /** `<title>` content, entity-decoded and whitespace-collapsed. */
  def title(html: String): Option[String] = {
    val m = TitleRe.matcher(html)
    if (m.find())
      Some(decodeEntities(m.group(1)).replaceAll("[\\s\u00a0]+", " ").trim)
        .filter(_.nonEmpty)
    else None
  }

  /** href values of anchor tags, document order, entity-decoded. */
  def links(html: String): Seq[String] = {
    val m = HrefRe.matcher(html)
    val out = Seq.newBuilder[String]
    while (m.find()) {
      val raw = Option(m.group(1)).orElse(Option(m.group(2)))
        .getOrElse(m.group(3))
      out += decodeEntities(raw)
    }
    out.result()
  }

  private val AnchorRe = java.util.regex.Pattern.compile(
    "(?is)<a\\b[^>]*?href\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>]+))[^>]*>(.*?)</a>")

  /** (href, anchor text) pairs in document order — anchor text is the
    * full extraction contract applied to the anchor's inner markup
    * (nested inline tags flatten, entities decode, whitespace
    * normalizes; multi-line anchors collapse to one space-joined
    * string), because anchor text is training signal, not markup. */
  def anchors(html: String): Seq[(String, String)] = {
    val m = AnchorRe.matcher(html)
    val out = Seq.newBuilder[(String, String)]
    while (m.find()) {
      val raw = Option(m.group(1)).orElse(Option(m.group(2)))
        .getOrElse(m.group(3))
      val text = extractText(m.group(4)).replace('\n', ' ')
      out += ((decodeEntities(raw), text))
    }
    out.result()
  }

  // --------------------------------------------------- charset handling

  private val MetaCharsetRe = java.util.regex.Pattern.compile(
    "(?is)<meta[^>]*charset\\s*=\\s*[\"']?([\\w][\\w.:-]*)")

  /** Canonical lower-case charset name via the JVM registry; None for
    * labels the JVM doesn't know (caller falls through). */
  private def resolve(label: String): Option[java.nio.charset.Charset] =
    try Some(java.nio.charset.Charset.forName(label.trim))
    catch { case _: Exception => None }

  /** WHATWG-precedence charset sniffing for a fetched HTML payload:
    * BOM > HTTP `charset=` parameter > `<meta charset>` in the first
    * 1024 bytes > windows-1252 (the web's legacy default — decoding
    * mislabeled bytes as 1252 is the behavior every browser and every
    * crawl pipeline standardized on). Returns (charset, bomLength). */
  def detectCharset(httpCharset: Option[String],
                    payload: Array[Byte]): (java.nio.charset.Charset, Int) = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    if (payload.length >= 3 && payload(0) == 0xef.toByte &&
        payload(1) == 0xbb.toByte && payload(2) == 0xbf.toByte)
      return (utf8, 3)
    if (payload.length >= 2 && payload(0) == 0xff.toByte && payload(1) == 0xfe.toByte)
      return (java.nio.charset.StandardCharsets.UTF_16LE, 2)
    if (payload.length >= 2 && payload(0) == 0xfe.toByte && payload(1) == 0xff.toByte)
      return (java.nio.charset.StandardCharsets.UTF_16BE, 2)
    httpCharset.flatMap(resolve) match {
      case Some(cs) => (cs, 0)
      case None =>
        val head = new String(payload, 0, math.min(1024, payload.length),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val m = MetaCharsetRe.matcher(head)
        val meta = if (m.find()) resolve(m.group(1)) else None
        (meta.getOrElse(java.nio.charset.Charset.forName("windows-1252")), 0)
    }
  }

  /** Decode a fetched HTML payload to a String under the sniffed
    * charset (BOM stripped). Total: undecodable byte sequences map to
    * U+FFFD rather than failing the row (the per-item contract). */
  def decodePayload(httpCharset: Option[String],
                    payload: Array[Byte]): (String, String) = {
    val (cs, bom) = detectCharset(httpCharset, payload)
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    val text = dec.decode(java.nio.ByteBuffer.wrap(
      payload, bom, payload.length - bom)).toString
    (text, cs.name().toLowerCase(java.util.Locale.ROOT))
  }
}
