package graft.web

import scala.collection.mutable

/** Pure-JVM PDF text extraction (ISO 32000-1 subset) — after HTML, the
  * next-largest extractable payload class in a real crawl. Same tier
  * contract as [[Html]]: total parsing (junk → zero pages, damage →
  * quarantine, never throw), deterministic documented semantics.
  *
  * Supported subset (the text-extraction core):
  *  - body objects located by scanning for `N G obj` (xref ignored —
  *    crawl-damaged files routinely have broken xref tables; object
  *    boundaries are self-describing), full COS types: numbers, names,
  *    booleans, null, literal strings (escapes incl. octal), hex
  *    strings, arrays, dictionaries, references, streams;
  *  - stream data by direct or INDIRECT /Length (resolved on demand),
  *    falling back to an `endstream` scan; /Filter absent or
  *    /FlateDecode (java.util.zip.Inflater) — any other filter
  *    quarantines the page;
  *  - document walk: trailer /Root (or any /Type /Catalog object) →
  *    /Pages tree (cycle-guarded DFS) → /Page objects in tree order;
  *    /Contents as one stream or an array (concatenated with a
  *    newline, per the spec's "treated as a single stream" rule);
  *  - text operators inside BT/ET: Tf (font select), Tj / TJ (kerning
  *    numbers ignored) / ' / " show text, Td / TD / T* / Tm and ' / "
  *    start a NEW LINE; everything else is skipped with its operands;
  *  - character decoding per the selected font: /ToUnicode CMap when
  *    present (begincodespacerange fixes the code width; bfchar
  *    singles, bfrange runs with scalar or array destinations;
  *    unmapped codes → U+FFFD), else /Subtype /Type0 quarantines (a
  *    2-byte font with no CMap is unrecoverable), else /Encoding
  *    /WinAnsiEncoding → windows-1252, else ISO-8859-1;
  *  - lines trim, empties drop, join with '\n' (the [[Html]] contract).
  *
  * Fixtures are built by an independent spec-based writer
  * (tools/gen_pdf_fixtures.py, the FLAC discipline); q220 gates every
  * page's text against the literals that writer printed.
  */
object Pdf {

  sealed trait PObj
  final case class PNum(v: Double) extends PObj
  final case class PBool(b: Boolean) extends PObj
  case object PNull extends PObj
  final case class PName(s: String) extends PObj
  final case class PStr(bytes: Array[Byte]) extends PObj
  final case class PArr(items: Vector[PObj]) extends PObj
  final case class PDict(m: Map[String, PObj]) extends PObj
  final case class PRef(num: Int) extends PObj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends PObj
  /** A bare keyword token (content-stream operator, `obj`, `R`, …). */
  final case class PKw(s: String) extends PObj

  private def isWs(c: Int) =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == 0 || c == '\f'
  private def isDelim(c: Int) =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Token/value reader over raw bytes. Never throws on malformed
    * input — readers return None/degraded values and the caller stops. */
  final class Lexer(val b: Array[Byte], var pos: Int) {
    def atEnd: Boolean = pos >= b.length
    private def c(i: Int): Int = b(i) & 0xff

    def skipWs(): Unit = {
      var go = true
      while (go && pos < b.length) {
        if (isWs(c(pos))) pos += 1
        else if (c(pos) == '%') { // comment to EOL
          while (pos < b.length && c(pos) != '\n' && c(pos) != '\r') pos += 1
        } else go = false
      }
    }

    private def readRaw(): String = {
      val s = pos
      while (pos < b.length && !isWs(c(pos)) && !isDelim(c(pos))) pos += 1
      new String(b, s, pos - s, java.nio.charset.StandardCharsets.ISO_8859_1)
    }

    private def readName(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (pos < b.length && !isWs(c(pos)) && !isDelim(c(pos))) {
        if (c(pos) == '#' && pos + 2 < b.length) {
          val h = Character.digit(c(pos + 1), 16); val l = Character.digit(c(pos + 2), 16)
          if (h >= 0 && l >= 0) { sb += ((h << 4) | l).toChar; pos += 3 }
          else { sb += c(pos).toChar; pos += 1 }
        } else { sb += c(pos).toChar; pos += 1 }
      }
      PName(sb.toString)
    }

    private def readLiteralString(): PStr = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (pos < b.length && depth > 0) {
        val ch = c(pos)
        if (ch == '\\' && pos + 1 < b.length) {
          pos += 1
          val e = c(pos)
          e match {
            case 'n' => out.write('\n'); pos += 1
            case 'r' => out.write('\r'); pos += 1
            case 't' => out.write('\t'); pos += 1
            case 'b' => out.write('\b'); pos += 1
            case 'f' => out.write('\f'); pos += 1
            case '(' => out.write('('); pos += 1
            case ')' => out.write(')'); pos += 1
            case '\\' => out.write('\\'); pos += 1
            case '\r' => pos += 1; if (pos < b.length && c(pos) == '\n') pos += 1
            case '\n' => pos += 1 // line continuation
            case d if d >= '0' && d <= '7' =>
              var v = 0; var n = 0
              while (n < 3 && pos < b.length && c(pos) >= '0' && c(pos) <= '7') {
                v = (v << 3) | (c(pos) - '0'); pos += 1; n += 1
              }
              out.write(v & 0xff)
            case other => out.write(other); pos += 1
          }
        } else {
          if (ch == '(') depth += 1
          else if (ch == ')') depth -= 1
          if (depth > 0) out.write(ch)
          pos += 1
        }
      }
      PStr(out.toByteArray)
    }

    private def readHexString(): PStr = {
      pos += 1 // '<'
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var go = true
      while (go && pos < b.length) {
        val ch = c(pos)
        if (ch == '>') { go = false; pos += 1 }
        else {
          val d = Character.digit(ch, 16)
          if (d >= 0) {
            if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
          }
          pos += 1
        }
      }
      if (hi >= 0) out.write(hi << 4) // odd length pads with 0
      PStr(out.toByteArray)
    }

    /** Next token as a PObj (composites NOT assembled; '[', ']', '<<',
      * '>>' come back as PKw). None at end of input. */
    def nextToken(): Option[PObj] = {
      skipWs()
      if (atEnd) return None
      val ch = c(pos)
      if (ch == '/') Some(readName())
      else if (ch == '(') Some(readLiteralString())
      else if (ch == '<') {
        if (pos + 1 < b.length && c(pos + 1) == '<') { pos += 2; Some(PKw("<<")) }
        else Some(readHexString())
      } else if (ch == '>') {
        if (pos + 1 < b.length && c(pos + 1) == '>') { pos += 2; Some(PKw(">>")) }
        else { pos += 1; Some(PKw(">")) }
      } else if (ch == '[') { pos += 1; Some(PKw("[")) }
      else if (ch == ']') { pos += 1; Some(PKw("]")) }
      else if (ch == '{') { pos += 1; Some(PKw("{")) }
      else if (ch == '}') { pos += 1; Some(PKw("}")) }
      else {
        val raw = readRaw()
        if (raw.isEmpty) { pos += 1; nextToken() } // stray delimiter byte
        else raw match {
          case "true" => Some(PBool(true))
          case "false" => Some(PBool(false))
          case "null" => Some(PNull)
          case _ =>
            raw.toDoubleOption match {
              case Some(d) => Some(PNum(d))
              case None => Some(PKw(raw))
            }
        }
      }
    }

    /** One complete VALUE (assembles arrays/dicts; folds `N G R` into
      * PRef by two-token lookahead). Bounded recursion via `depth`. */
    def nextValue(depth: Int = 0): Option[PObj] = {
      if (depth > 64) return None
      nextToken() match {
        case Some(PKw("[")) =>
          val items = Vector.newBuilder[PObj]
          var go = true
          while (go) {
            val save = pos
            nextToken() match {
              case Some(PKw("]")) | None => go = false
              case _ =>
                pos = save
                nextValue(depth + 1) match {
                  case Some(v) => items += v
                  case None => go = false
                }
            }
          }
          Some(PArr(items.result()))
        case Some(PKw("<<")) =>
          val m = Map.newBuilder[String, PObj]
          var go = true
          while (go) {
            nextToken() match {
              case Some(PKw(">>")) | None => go = false
              case Some(PName(k)) =>
                nextValue(depth + 1) match {
                  case Some(v) => m += k -> v
                  case None => go = false
                }
              case _ => // malformed key: skip
            }
          }
          Some(PDict(m.result()))
        case Some(PNum(n)) if n >= 0 && n == n.toInt =>
          // `N G R` indirect-reference lookahead (restores on miss)
          val s1 = pos
          nextToken() match {
            case Some(PNum(g)) if g >= 0 =>
              nextToken() match {
                case Some(PKw("R")) => Some(PRef(n.toInt))
                case _ => pos = s1; Some(PNum(n))
              }
            case _ => pos = s1; Some(PNum(n))
          }
        case other => other
      }
    }

    /** After a dict value: if the next keyword is `stream`, consume the
      * EOL and return the data start offset. */
    def streamDataStart(): Option[Int] = {
      val save = pos
      nextToken() match {
        case Some(PKw("stream")) =>
          if (pos < b.length && c(pos) == '\r') pos += 1
          if (pos < b.length && c(pos) == '\n') pos += 1
          Some(pos)
        case _ => pos = save; None
      }
    }
  }

  /** A parsed document: object number → (value, streamDataStart). */
  final class Doc(val bytes: Array[Byte]) {
    // object number -> offset just after the `obj` keyword
    val objPos: Map[Int, Int] = scanObjPositions(bytes)
    private val memo = mutable.Map.empty[Int, Option[PObj]]
    private val resolving = mutable.Set.empty[Int]

    /** Parse object `num` (memoized, cycle-guarded). Streams get their
      * data extracted here (direct or indirect /Length, endstream
      * fallback). */
    def obj(num: Int): Option[PObj] = memo.getOrElseUpdate(num, {
      if (!resolving.add(num)) None
      else try {
        objPos.get(num).flatMap { off =>
          val lx = new Lexer(bytes, off)
          lx.nextValue() match {
            case Some(d @ PDict(m)) =>
              lx.streamDataStart() match {
                case Some(start) =>
                  val len: Option[Int] = m.get("Length") match {
                    case Some(PNum(n)) => Some(n.toInt)
                    case Some(PRef(r)) => obj(r) match {
                      case Some(PNum(n)) => Some(n.toInt)
                      case _ => None
                    }
                    case _ => None
                  }
                  val end = len match {
                    case Some(n) if start + n <= bytes.length => start + n
                    case _ =>
                      val e = indexOfKeyword(bytes, "endstream", start)
                      if (e < 0) bytes.length
                      else { // strip one trailing EOL
                        var x = e
                        if (x > start && bytes(x - 1) == '\n') x -= 1
                        if (x > start && bytes(x - 1) == '\r') x -= 1
                        x
                      }
                  }
                  Some(PStream(d,
                    java.util.Arrays.copyOfRange(bytes, start, math.min(end, bytes.length))))
                case None => Some(d)
              }
            case Some(PNum(n)) =>
              // could be the start of `N G R`-style? a plain number object
              Some(PNum(n))
            case other => other
          }
        }
      } finally resolving.remove(num)
    })

    def deref(o: PObj): Option[PObj] = o match {
      case PRef(n) => obj(n).flatMap(deref)
      case v => Some(v)
    }

    def dict(o: PObj): Option[PDict] = deref(o) match {
      case Some(d: PDict) => Some(d)
      case Some(PStream(d, _)) => Some(d)
      case _ => None
    }
  }

  private def indexOfKeyword(b: Array[Byte], kw: String, from: Int): Int = {
    val k = kw.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = math.max(from, 0)
    val last = b.length - k.length
    while (i <= last) {
      var j = 0
      while (j < k.length && b(i + j) == k(j)) j += 1
      if (j == k.length) return i
      i += 1
    }
    -1
  }

  /** Scan for `N G obj` headers: every standalone `obj` keyword with two
    * preceding integers. Later definitions of the same number win (the
    * incremental-update rule). */
  private def scanObjPositions(b: Array[Byte]): Map[Int, Int] = {
    val out = mutable.Map.empty[Int, Int]
    var from = 0
    var go = true
    while (go) {
      val i = indexOfKeyword(b, "obj", from)
      if (i < 0) go = false
      else {
        from = i + 3
        val before = i == 0 || isWs(b(i - 1) & 0xff)
        val after = i + 3 >= b.length || isWs(b(i + 3) & 0xff) || isDelim(b(i + 3) & 0xff)
        if (before && after) {
          // back-scan: ws, int (gen), ws, int (num)
          var p = i - 1
          while (p >= 0 && isWs(b(p) & 0xff)) p -= 1
          val genEnd = p
          while (p >= 0 && b(p) >= '0' && b(p) <= '9') p -= 1
          val genStart = p + 1
          while (p >= 0 && isWs(b(p) & 0xff)) p -= 1
          val numEnd = p
          while (p >= 0 && b(p) >= '0' && b(p) <= '9') p -= 1
          val numStart = p + 1
          if (genEnd >= genStart && numEnd >= numStart &&
              (numStart == 0 || isWs(b(numStart - 1) & 0xff) || isDelim(b(numStart - 1) & 0xff))) {
            val numStr = new String(b, numStart, numEnd - numStart + 1,
              java.nio.charset.StandardCharsets.ISO_8859_1)
            numStr.toIntOption.foreach(n => out(n) = i + 3)
          }
        }
      }
    }
    out.toMap
  }

  // ------------------------------------------------------------ document

  /** Decode one content/CMap stream: no filter → raw; /FlateDecode →
    * inflate; anything else → None (page quarantines). */
  private def decodeStream(doc: Doc, s: PStream): Option[Array[Byte]] = {
    val filt = s.dict.m.get("Filter").flatMap(doc.deref)
    filt match {
      case None => Some(s.raw)
      case Some(PName("FlateDecode")) => inflate(s.raw)
      case Some(PArr(Vector(PName("FlateDecode")))) => inflate(s.raw)
      case _ => None
    }
  }

  /** Content streams a sane PDF page needs are far below this; a flate
    * payload inflating past it is a decompression bomb and the stream
    * QUARANTINES (None) instead of growing until OOM — the same bounded
    * contract as [[Warc.gunzipAll]], which a crawl-facing decoder must
    * honor (an Error escapes every catch and kills the task). */
  private val MaxStreamBytes = 256L << 20

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      // size hint clamped: data.length * 4 overflows Int past 512 MiB
      val hint = math.min(math.max(64L, data.length.toLong * 4), 1L << 20).toInt
      val out = new java.io.ByteArrayOutputStream(hint)
      val buf = new Array[Byte](8192)
      var guard = 0
      var over = false
      while (!over && !inf.finished() && !inf.needsInput() &&
             !inf.needsDictionary() && guard < (1 << 16)) {
        val n = inf.inflate(buf)
        if (out.size().toLong + n > MaxStreamBytes) over = true
        else out.write(buf, 0, n)
        if (n == 0) guard += 1 else guard = 0
      }
      if (!over && inf.finished()) Some(out.toByteArray) else None
    } catch {
      case _: Exception => None
    } finally inf.end()
  }

  /** One selected font's decoding rule. */
  private final case class Font(codeBytes: Int,
                                toUnicode: Option[Map[Int, String]],
                                winAnsi: Boolean,
                                type0: Boolean)

  private def parseCMap(bytes: Array[Byte]): (Int, Map[Int, String]) = {
    val lx = new Lexer(bytes, 0)
    var codeBytes = 1
    val map = mutable.Map.empty[Int, String]
    def codeOf(s: Array[Byte]): Int = s.foldLeft(0)((a, b) => (a << 8) | (b & 0xff))
    def strOf(s: Array[Byte]): String = {
      // UTF-16BE code units
      new String(s, java.nio.charset.StandardCharsets.UTF_16BE)
    }
    var mode = ""
    var go = true
    while (go) {
      lx.nextToken() match {
        case None => go = false
        case Some(PKw("begincodespacerange")) => mode = "cs"
        case Some(PKw("endcodespacerange")) => mode = ""
        case Some(PKw("beginbfchar")) => mode = "c"
        case Some(PKw("endbfchar")) => mode = ""
        case Some(PKw("beginbfrange")) => mode = "r"
        case Some(PKw("endbfrange")) => mode = ""
        case Some(PStr(a)) if mode == "cs" =>
          codeBytes = math.max(codeBytes, a.length)
          lx.nextToken() // the range's upper bound
        case Some(PStr(a)) if mode == "c" =>
          lx.nextToken() match {
            case Some(PStr(dst)) => map(codeOf(a)) = strOf(dst)
            case _ =>
          }
        case Some(PStr(a)) if mode == "r" =>
          (lx.nextToken(), lx.nextToken()) match {
            case (Some(PStr(hi)), Some(PStr(dst))) =>
              val lo = codeOf(a); val h = codeOf(hi)
              val d0 = codeOf(dst)
              var cc = lo
              while (cc <= h && cc - lo < 65536) {
                map(cc) = new String(Character.toChars(d0 + (cc - lo)))
                cc += 1
              }
            case (Some(PStr(hi)), Some(PKw("["))) =>
              val lo = codeOf(a); val h = codeOf(hi)
              var cc = lo
              var inArr = true
              while (inArr) {
                lx.nextToken() match {
                  case Some(PStr(dst)) =>
                    if (cc <= h) { map(cc) = strOf(dst); cc += 1 }
                  case Some(PKw("]")) | None => inArr = false
                  case _ =>
                }
              }
            case _ =>
          }
        case _ =>
      }
    }
    (codeBytes, map.toMap)
  }

  private def fontOf(doc: Doc, fontObj: PObj): Option[Font] = {
    doc.dict(fontObj).map { fd =>
      val type0 = fd.m.get("Subtype").flatMap(doc.deref)
        .contains(PName("Type0"))
      val winAnsi = fd.m.get("Encoding").flatMap(doc.deref)
        .contains(PName("WinAnsiEncoding"))
      val tu = fd.m.get("ToUnicode").flatMap(doc.deref).flatMap {
        case s: PStream => decodeStream(doc, s).map(parseCMap)
        case _ => None
      }
      tu match {
        case Some((cb, map)) =>
          Font(if (type0) math.max(cb, 2) else cb, Some(map), winAnsi, type0)
        case None => Font(if (type0) 2 else 1, None, winAnsi, type0)
      }
    }
  }

  private def decodeShown(f: Font, s: Array[Byte]): Option[String] = {
    f.toUnicode match {
      case Some(map) =>
        val sb = new StringBuilder
        var i = 0
        while (i + f.codeBytes <= s.length) {
          var code = 0
          var j = 0
          while (j < f.codeBytes) { code = (code << 8) | (s(i + j) & 0xff); j += 1 }
          sb ++= map.getOrElse(code, "�")
          i += f.codeBytes
        }
        Some(sb.toString)
      case None if f.type0 => None // 2-byte codes with no CMap: unrecoverable
      case None if f.winAnsi =>
        Some(new String(s, java.nio.charset.Charset.forName("windows-1252")))
      case None =>
        Some(new String(s, java.nio.charset.StandardCharsets.ISO_8859_1))
    }
  }

  /** Interpret one page's content stream per the operator contract.
    * None = quarantine (unsupported filter/font made text unrecoverable). */
  private def pageText(doc: Doc, content: Array[Byte],
                       fonts: Map[String, Font]): Option[String] = {
    val lx = new Lexer(content, 0)
    val lines = Vector.newBuilder[String]
    val cur = new StringBuilder
    val stack = mutable.ArrayBuffer.empty[PObj]
    var font: Option[Font] = fonts.values.headOption
    var bad = false
    def newLine(): Unit = {
      if (cur.nonEmpty) { lines += cur.toString; cur.clear() }
    }
    def show(bytesShown: Array[Byte]): Unit = {
      font match {
        case Some(f) => decodeShown(f, bytesShown) match {
          case Some(t) => cur ++= t
          case None => bad = true
        }
        case None => bad = true
      }
    }
    var go = true
    while (go && !bad) {
      lx.nextValue() match {
        case None => go = false
        case Some(PKw(op)) =>
          op match {
            case "BT" | "ET" => newLine()
            case "Tf" =>
              stack.collectFirst { case PName(n) => n }
                .foreach(n => font = fonts.get(n).orElse(font))
            case "Td" | "TD" | "T*" | "Tm" => newLine()
            case "Tj" =>
              stack.lastOption.collect { case PStr(s) => s }.foreach(show)
            case "'" =>
              newLine()
              stack.lastOption.collect { case PStr(s) => s }.foreach(show)
            case "\"" =>
              newLine()
              stack.lastOption.collect { case PStr(s) => s }.foreach(show)
            case "TJ" =>
              stack.lastOption.collect { case PArr(items) => items }
                .foreach(_.foreach {
                  case PStr(s) => show(s)
                  case _ =>
                })
            case _ => // unmodeled operator: drop operands
          }
          stack.clear()
        case Some(v) => stack += v
      }
    }
    newLine()
    if (bad) None
    else Some(lines.result().map(_.trim).filter(_.nonEmpty).mkString("\n"))
  }

  /** All pages' extracted text, in page-tree order. Empty = quarantine
    * at the caller (junk, no catalog, empty tree). A page whose content
    * or fonts are unsupported yields a null text (page-level
    * quarantine) rather than dropping silently. */
  def extract(bytes: Array[Byte]): Seq[(Int, Option[String])] = {
    if (bytes == null || bytes.length < 8) return Seq.empty
    try {
      val doc = new Doc(bytes)
      // catalog: trailer /Root if readable, else any /Type /Catalog
      val rootNum: Option[Int] = {
        val t = bytes.lastIndexOfSlice("trailer".getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1))
        val fromTrailer = if (t < 0) None else {
          val lx = new Lexer(bytes, t + 7)
          lx.nextValue() match {
            case Some(PDict(m)) => m.get("Root").collect { case PRef(n) => n }
            case _ => None
          }
        }
        fromTrailer.orElse(doc.objPos.keys.toSeq.sorted.find { n =>
          doc.obj(n) match {
            case Some(PDict(m)) => m.get("Type").contains(PName("Catalog"))
            case _ => false
          }
        })
      }
      val pagesRoot = rootNum.flatMap(doc.obj).flatMap {
        case PDict(m) => m.get("Pages")
        case _ => None
      }
      // DFS the page tree
      val pages = Vector.newBuilder[PDict]
      val seen = mutable.Set.empty[Int]
      def walk(o: PObj, depth: Int): Unit = {
        if (depth > 32) return
        val num = o match { case PRef(n) => Some(n); case _ => None }
        if (num.exists(n => !seen.add(n))) return
        doc.dict(o).foreach { d =>
          d.m.get("Type").flatMap(doc.deref) match {
            case Some(PName("Pages")) =>
              d.m.get("Kids").flatMap(doc.deref) match {
                case Some(PArr(kids)) => kids.foreach(walk(_, depth + 1))
                case _ =>
              }
            case Some(PName("Page")) => pages += d
            case _ =>
          }
        }
      }
      pagesRoot.foreach(walk(_, 0))
      pages.result().zipWithIndex.map { case (pd, i) =>
        val text: Option[String] = {
          val streams: Option[Vector[Array[Byte]]] =
            pd.m.get("Contents").flatMap(doc.deref) match {
              case Some(s: PStream) => decodeStream(doc, s).map(Vector(_))
              case Some(PArr(items)) =>
                val parts = items.map(doc.deref(_) match {
                  case Some(s: PStream) => decodeStream(doc, s)
                  case _ => None
                })
                if (parts.forall(_.isDefined)) Some(parts.flatten)
                else None
              case _ => None
            }
          val fonts: Map[String, Font] =
            pd.m.get("Resources").flatMap(doc.dict).toSeq
              .flatMap(_.m.get("Font")).flatMap(doc.dict).toSeq
              .flatMap(_.m.toSeq)
              .flatMap { case (name, fo) => fontOf(doc, fo).map(name -> _) }
              .toMap
          streams.flatMap { ss =>
            val joined = ss.reduceOption((a, b) => a ++ "\n".getBytes ++ b)
              .getOrElse(Array.emptyByteArray)
            pageText(doc, joined, fonts)
          }
        }
        (i + 1, text)
      }
    } catch {
      case _: Exception => Seq.empty
    }
  }
}
