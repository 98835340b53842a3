package graft.web

/** One parsed WARC record (ISO 28500 / WARC-1.1), with its HTTP message
  * head already split off when the block carries one.
  *
  * `payload` is the HTTP message body for `application/http` blocks and
  * the raw record block otherwise — i.e. always "the bytes a pipeline
  * consumes next" (HTML for a response, nothing for a request head).
  */
final case class WarcRecord(
    warcType: String,
    targetUri: Option[String],
    contentType: Option[String],
    httpStatus: Option[Int],
    httpContentType: Option[String],
    httpCharset: Option[String],
    payload: Array[Byte])

/** Pure-JVM WARC reader — the ingest format of web-crawl training-data
  * pipelines (Common Crawl ships ~100 TB/month of exactly these files).
  *
  * Reference behavior anchor: the reference engine's scan tier reads
  * whole files and quarantines unparseable ones per item
  * (modules/tiling.py:87 ext-whitelist scan; batch_processor.py decode
  * `continue` on failure); this extends the same contract to the crawl
  * container: total parsing, malformed tail → keep the prefix, junk →
  * zero records (the caller emits a quarantine row, q88 discipline).
  *
  * Format facts used (public WARC spec + gzip RFC 1952):
  *  - a WARC file is a sequence of records; each record is a header
  *    block (`WARC/1.x` version line, then `Name: value` lines, CRLF
  *    line ends) terminated by an empty line, followed by exactly
  *    `Content-Length` block bytes, followed by two CRLFs;
  *  - `.warc.gz` files store each record (or run of records) as an
  *    independent gzip MEMBER, concatenated — which is what makes the
  *    format splittable at scale: a cluster reader can seek to any
  *    member boundary and start clean. Single-JVM shape here: one file
  *    = one task (binaryFile), members inflated in sequence
  *    (GZIPInputStream consumes concatenated members natively);
  *  - records whose Content-Type is `application/http` carry an HTTP
  *    message: status/request line, header lines, empty line, body.
  */
object Warc {

  /** Hard cap on inflated bytes a single parse call will materialize —
    * just under the JVM array ceiling. Hitting it reports truncation
    * (prefix kept) rather than throwing; the splittable member reader
    * ([[memberOffsets]]) is the scale path that keeps per-task memory
    * bounded by the largest MEMBER, never the file. */
  val MaxInflatedBytes: Long = Int.MaxValue.toLong - 16

  /** Inflate a (possibly multi-member) gzip stream. Returns the bytes
    * successfully inflated plus a truncation flag: a corrupt or
    * truncated member keeps every fully-read earlier byte (records
    * already inflated stay parseable — the per-item isolation
    * contract). Non-gzip input passes through unchanged. */
  def gunzipAll(bytes: Array[Byte]): (Array[Byte], Boolean) = {
    if (bytes.length < 2 || bytes(0) != 0x1f.toByte || bytes(1) != 0x8b.toByte)
      return (bytes, false)
    // size hint clamped: bytes.length * 4 overflows Int for inputs
    // >= 512 MiB (typical Common Crawl WARCs are ~1 GiB), and a negative
    // hint throws IllegalArgumentException OUTSIDE the IOException
    // handler — one big file would fail the task instead of quarantining
    val hint = math.max(64L, math.min(bytes.length.toLong * 4, 1L << 24)).toInt
    val out = new java.io.ByteArrayOutputStream(hint)
    // the stream must be CLOSED on every path (not abandoned): its
    // native zlib Inflater is released only in close(), and one leaked
    // native stream per decompressed payload degraded repeated runs
    // superlinearly (the renderGzMembers Deflater twin of the same bug,
    // found r13 via thread dumps stuck in zlib init)
    var in: java.util.zip.GZIPInputStream = null
    try {
      in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      var over = false
      // oversized-inflation guard: a single-cell payload must stay under
      // the JVM array ceiling; past it we stop and report truncation
      // (records already inflated stay parseable) instead of OOM-ing
      while (n >= 0 && !over) {
        if (out.size().toLong + n > MaxInflatedBytes) over = true
        else { out.write(buf, 0, n); n = in.read(buf) }
      }
      (out.toByteArray, over)
    } catch {
      case _: java.io.IOException => (out.toByteArray, true)
    } finally if (in != null) in.close()
  }

  /** One gzip member's placement in a `.warc.gz` file: compressed byte
    * range [offset, offset+clen) and its inflated size.
    *
    * `recStart`: the member's first inflated bytes are "WARC/" — a
    * slice may CUT before such a member (record-aligned boundary). The
    * .warc.gz convention compresses record-per-member (ISO 28500
    * Annex D), but a re-compressed container can split a record across
    * members; a non-aligned member must stay glued to its predecessor
    * or the spanning record silently vanishes at the slice boundary. */
  final case class GzMember(offset: Long, clen: Long, ilen: Long,
                            recStart: Boolean = true)

  /** Enumerate gzip member boundaries by streaming the input ONCE with
    * O(1) memory (headers parsed per RFC 1952, deflate bodies inflated
    * into a discard buffer, trailers skipped) — the index that makes a
    * multi-gigabyte `.warc.gz` splittable: a cluster reader hands each
    * `(file, memberRange)` slice to its own task, so per-task memory is
    * bounded by the largest MEMBER, never the file. Stops at the first
    * corrupt/truncated member keeping every complete one before it
    * (same prefix semantics as [[gunzipAll]]); non-gzip input yields an
    * empty index (caller treats the file as one identity slice). */
  def memberIndex(in: java.io.InputStream): Seq[GzMember] = {
    val members = Vector.newBuilder[GzMember]
    val buf = new Array[Byte](1 << 16)
    var bufLen = 0
    var bufPos = 0
    var abs = 0L // file offset of buf(bufPos)
    def fill(): Boolean = {
      if (bufPos < bufLen) true
      else {
        bufPos = 0; bufLen = 0
        val n = in.read(buf)
        if (n <= 0) false else { bufLen = n; true }
      }
    }
    def readByte(): Int =
      if (!fill()) -1
      else { val b = buf(bufPos) & 0xff; bufPos += 1; abs += 1; b }
    def skip(n: Int): Boolean = {
      var k = 0
      while (k < n) { if (readByte() < 0) return false; k += 1 }
      true
    }
    def skipZeroTerminated(): Boolean = {
      var b = readByte()
      while (b > 0) b = readByte()
      b == 0
    }
    var ok = true
    while (ok && fill()) {
      val start = abs
      // ---- RFC 1952 header: magic, CM=8, FLG, MTIME(4), XFL, OS
      val m1 = readByte(); val m2 = readByte(); val cm = readByte()
      if (m1 != 0x1f || m2 != 0x8b || cm != 8) ok = false
      else {
        val flg = readByte()
        ok = flg >= 0 && skip(6)
        if (ok && (flg & 4) != 0) { // FEXTRA: 2-byte LE length + bytes
          val x1 = readByte(); val x2 = readByte()
          ok = x1 >= 0 && x2 >= 0 && skip(x1 | (x2 << 8))
        }
        if (ok && (flg & 8) != 0) ok = skipZeroTerminated()   // FNAME
        if (ok && (flg & 16) != 0) ok = skipZeroTerminated()  // FCOMMENT
        if (ok && (flg & 2) != 0) ok = skip(2)                // FHCRC
        if (ok) {
          // ---- deflate body: inflate + discard, counting both sides
          val inf = new java.util.zip.Inflater(true)
          val scratch = new Array[Byte](1 << 16)
          var ilen = 0L
          var handedLen = 0
          var corrupt = false
          val head = new Array[Byte](5)
          var headLen = 0
          try {
            while (!inf.finished() && !corrupt) {
              if (inf.needsInput()) {
                bufPos += handedLen; abs += handedLen; handedLen = 0
                if (!fill()) corrupt = true // truncated body
                else {
                  handedLen = bufLen - bufPos
                  inf.setInput(buf, bufPos, handedLen)
                }
              }
              if (!corrupt) {
                try {
                  val n = inf.inflate(scratch)
                  if (headLen < 5 && n > 0) {
                    val take = math.min(5 - headLen, n)
                    System.arraycopy(scratch, 0, head, headLen, take)
                    headLen += take
                  }
                  ilen += n
                  if (n == 0 && inf.needsDictionary()) corrupt = true
                } catch {
                  case _: java.util.zip.DataFormatException => corrupt = true
                }
              }
            }
            if (!corrupt) {
              val consumed = handedLen - inf.getRemaining
              bufPos += consumed; abs += consumed
            }
          } finally inf.end()
          // ---- trailer: CRC32 + ISIZE
          ok = !corrupt && skip(8)
          if (ok) {
            val recStart = headLen == 5 && head(0) == 'W' && head(1) == 'A' &&
              head(2) == 'R' && head(3) == 'C' && head(4) == '/'
            members += GzMember(start, abs - start, ilen, recStart)
          }
        }
      }
    }
    members.result()
  }

  private val Crlf = "\r\n"

  /** Find `\r\n\r\n` from `from`; -1 if absent. */
  private def headerEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Parse `Name: value` lines (names case-folded); malformed lines are
    * skipped — headers we don't need never abort the record. */
  private def parseHeaders(block: String): Map[String, String] =
    block.split(Crlf).iterator.flatMap { line =>
      val c = line.indexOf(':')
      if (c <= 0) None
      else Some(line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT) -> line.substring(c + 1).trim)
    }.toMap

  /** Split an `application/http` block into (statusLine?, headers,
    * body). Request blocks yield no status (their first line is a
    * request line). */
  private def parseHttp(block: Array[Byte])
      : (Option[Int], Option[String], Option[String], Array[Byte]) = {
    val he = headerEnd(block, 0)
    if (he < 0) return (None, None, None, block)
    val head = new String(block, 0, he, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split(Crlf)
    val status = lines.headOption.filter(_.startsWith("HTTP/")).flatMap { sl =>
      sl.split(" ", 3).lift(1).flatMap(_.toIntOption)
    }
    val hdrs = parseHeaders(lines.drop(1).mkString(Crlf))
    // mime only: parameters are not part of the type; the charset
    // parameter rides separately (transcoding input)
    val ct = hdrs.get("content-type")
    val mime = ct.map(_.split(";")(0).trim.toLowerCase(java.util.Locale.ROOT))
    val charset = ct.flatMap(_.split(";").drop(1).iterator
      .map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .collectFirst { case p if p.startsWith("charset=") =>
        p.substring(8).trim.stripPrefix("\"").stripSuffix("\"")
      })
    (status, mime, charset,
      java.util.Arrays.copyOfRange(block, he + 4, block.length))
  }

  /** Parse every complete record from (already inflated) WARC bytes.
    * Total: the first structural violation ends the scan, keeping every
    * record before it; a short final block is dropped (a consumer must
    * never see a partial payload as if it were whole). */
  def parseRecords(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var pos = 0
    var ok = true
    while (ok && pos < bytes.length) {
      // tolerate inter-record CRLF padding
      while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n')
        pos += 2
      if (pos >= bytes.length) ok = false
      else {
        val he = headerEnd(bytes, pos)
        val versionOk = he > pos &&
          new String(bytes, pos, math.min(5, bytes.length - pos),
            java.nio.charset.StandardCharsets.ISO_8859_1) == "WARC/"
        if (!versionOk) ok = false
        else {
          val head = new String(bytes, pos, he - pos,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          val hdrs = parseHeaders(head.split(Crlf).drop(1).mkString(Crlf))
          (hdrs.get("warc-type"), hdrs.get("content-length").flatMap(_.toLongOption)) match {
            case (Some(wt), Some(len)) if len >= 0 && he + 4 + len <= bytes.length =>
              val block = java.util.Arrays.copyOfRange(
                bytes, he + 4, (he + 4 + len).toInt)
              val ct = hdrs.get("content-type").map(_.trim)
              val isHttp = ct.exists(_.toLowerCase(java.util.Locale.ROOT).startsWith("application/http"))
              val (status, mime, charset, payload) =
                if (isHttp) parseHttp(block) else (None, None, None, block)
              out += WarcRecord(wt, hdrs.get("warc-target-uri"), ct,
                status, mime, charset, payload)
              pos = (he + 4 + len).toInt
            case _ => ok = false // missing/short: stop, keep prefix
          }
        }
      }
    }
    out.result()
  }

  /** Whole pipeline for one file's bytes: inflate members, parse
    * records. Junk in → empty out (quarantine at the caller). */
  def parseFile(bytes: Array[Byte]): Seq[WarcRecord] =
    if (bytes == null) Seq.empty
    else parseRecords(gunzipAll(bytes)._1)

  // ------------------------------------------------------------ writer

  private val IsoW = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Render one WARC record (version line, headers, Content-Length
    * block, double-CRLF trailer) — the WRITE half of this source.
    * [[parseRecords]] is its exact inverse on the fields it models. */
  def renderRecord(wtype: String, uri: Option[String], ctype: String,
                   block: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $wtype\r\n"
    uri.foreach(u => h ++= s"WARC-Target-URI: $u\r\n")
    h ++= "WARC-Date: 2026-08-01T00:00:00Z\r\n"
    h ++= s"WARC-Record-ID: <urn:graft:$wtype:${uri.getOrElse("-")}>\r\n"
    h ++= s"Content-Type: $ctype\r\n"
    h ++= s"Content-Length: ${block.length}\r\n\r\n"
    h.toString.getBytes(IsoW) ++ block ++ "\r\n\r\n".getBytes(IsoW)
  }

  /** One gzip member per record, concatenated — the splittable
    * `.warc.gz` layout (a cluster reader seeks to any member boundary
    * and starts clean). */
  def renderGzMembers(records: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for (r <- records) {
      val gz = new java.util.zip.GZIPOutputStream(out)
      // close(), not just finish(): finish() flushes the member but never
      // releases the native zlib stream (Deflater.end() runs only in
      // close()); at one leaked ~quarter-MB native allocation per
      // rendered record, repeated q218/q222 runs degraded 2x PER RUN —
      // thread dumps showed every executor thread inside Deflater.init
      // fighting the bloated native allocator (r13; the cross-rep
      // ascending bench vectors q222 [4.1→24.0 s] were exactly this).
      // Closing also closes `out` — a no-op for ByteArrayOutputStream.
      gz.write(r); gz.close()
    }
    out.toByteArray
  }

  /** A WET-style `conversion` record: the extracted text of a fetched
    * page as a text/plain block (UTF-8) — what the Common Crawl WET
    * tier ships per response record. */
  def renderConversion(uri: String, text: String): Array[Byte] =
    renderRecord("conversion", Some(uri), "text/plain",
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
