package graft.web

/** URL canonicalization + registered-domain extraction — the key
  * functions of crawl-side dedup (the cheapest dedup a 100 TB pipeline
  * runs is "same page, different URL spelling", BEFORE any content
  * hash; domain extraction feeds the per-domain caps and boilerplate
  * scopes in text.CorpusStats).
  *
  * Canonical form (RFC 3986 §6 syntax-based normalization plus the
  * tracking-parameter strip every crawl pipeline applies):
  *  1. scheme and host lower-case;
  *  2. fragment removed;
  *  3. default port removed (http:80, https:443);
  *  4. path dot-segments resolved (`/a/../b`, `/./` → `/b`); empty
  *     path → "/";
  *  5. percent-escapes of UNRESERVED chars (ALPHA / DIGIT / - . _ ~)
  *     decoded; every other escape upper-cased hex (`%3a` → `%3A`);
  *  6. tracking params dropped from the query — `utm_*`, `fbclid`,
  *     `gclid`, `msclkid`, `ref` — other params kept in original
  *     order; an emptied query drops its '?'.
  *
  * Registered domain: last-two-labels heuristic with an embedded
  * multi-part-suffix subset of the Public Suffix List (co.uk-style
  * country second-levels). Deliberately a DOCUMENTED SUBSET — the full
  * PSL is a data file a deployment ships alongside; the algorithm
  * (longest matching suffix + one label) is the real one.
  */
object Url {

  private val MultiPartSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "co.in", "net.in", "org.in",
    "co.nz", "net.nz", "org.nz", "co.za", "com.cn", "com.mx",
    "com.ar", "com.tr", "co.kr", "com.sg", "com.hk", "com.tw")

  private def isUnreserved(c: Char): Boolean =
    c.isLetterOrDigit && c < 128 || c == '-' || c == '.' || c == '_' || c == '~'

  /** Rule 5 over one URL component. */
  private[web] def normalizeEscapes(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hex = s.substring(i + 1, i + 3)
        scala.util.Try(Integer.parseInt(hex, 16)).toOption match {
          case Some(v) if isUnreserved(v.toChar) => sb += v.toChar; i += 3
          case Some(_) =>
            sb += '%'; sb ++= hex.toUpperCase(java.util.Locale.ROOT); i += 3
          case None => sb += c; i += 1
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Rule 4 (RFC 3986 §5.2.4 remove_dot_segments). */
  private[web] def resolveDots(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (seg <- path.split("/", -1).drop(1)) seg match {
      case "." => // skip
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case s => out += s
    }
    // a trailing "." / ".." still ends the path with a slash
    val trailingSlash = path.endsWith("/.") || path.endsWith("/..") || path.endsWith("/")
    val joined = "/" + out.mkString("/")
    if (trailingSlash && !joined.endsWith("/")) joined + "/" else joined
  }

  /** Referral-analytics params that never select content. Bare `ref`
    * is deliberately NOT here: on many real sites it is content-bearing
    * (?ref=<branch> on code hosts), and stripping it would silently
    * merge distinct pages in crawl dedup. */
  private def isTracking(param: String): Boolean = {
    // Locale.ROOT: default-locale toLowerCase breaks on tr/az dotless-i
    // ("FBCLID" -> "fbclıd"), un-stripping uppercase tracking spellings
    val name = param.split("=", 2)(0).toLowerCase(java.util.Locale.ROOT)
    name.startsWith("utm_") || name == "fbclid" || name == "gclid" ||
      name == "msclkid" || name == "ref_src"
  }

  /** Canonicalize per the 6-rule contract; null/unparseable → null
    * (quarantine — same per-item contract as every decode kernel). */
  def canonicalize(url: String): String = {
    if (url == null) return null
    val noFrag = { val h = url.indexOf('#'); if (h < 0) url else url.substring(0, h) }
    val sep = noFrag.indexOf("://")
    if (sep <= 0) return null
    val scheme = noFrag.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    if (!scheme.forall(c => c.isLetterOrDigit && c < 128)) return null
    val rest = noFrag.substring(sep + 3)
    if (rest.isEmpty) return null
    val pathStart = { val i = rest.indexWhere(c => c == '/' || c == '?'); if (i < 0) rest.length else i }
    var hostPort = rest.substring(0, pathStart).toLowerCase(java.util.Locale.ROOT)
    if (hostPort.isEmpty) return null
    if ((scheme == "http" && hostPort.endsWith(":80")) ||
        (scheme == "https" && hostPort.endsWith(":443")))
      hostPort = hostPort.substring(0, hostPort.lastIndexOf(':'))
    val pq = rest.substring(pathStart)
    val qMark = pq.indexOf('?')
    val rawPath = if (qMark < 0) pq else pq.substring(0, qMark)
    val path = resolveDots(normalizeEscapes(if (rawPath.isEmpty) "/" else rawPath))
    val query =
      if (qMark < 0) ""
      else {
        val kept = pq.substring(qMark + 1).split("&", -1)
          .filter(p => p.nonEmpty && !isTracking(p))
          .map(normalizeEscapes)
        if (kept.isEmpty) "" else "?" + kept.mkString("&")
      }
    scheme + "://" + hostPort + path + query
  }

  /** Registered domain of a host (eTLD+1 under the embedded suffix
    * subset); IPs and single-label hosts return as-is. */
  def registeredDomain(host: String): String = {
    if (host == null) return null
    val h = host.toLowerCase(java.util.Locale.ROOT).stripSuffix(".")
    val labels = h.split('.')
    if (labels.length <= 2) return h
    if (labels.forall(_.forall(_.isDigit))) return h // IPv4
    val lastTwo = labels.takeRight(2).mkString(".")
    if (MultiPartSuffixes.contains(lastTwo)) labels.takeRight(3).mkString(".")
    else lastTwo
  }

  /** RFC 3986 §5 reference resolution — the kernel that turns a page's
    * relative hrefs into fetchable URLs (without it a link graph only
    * sees absolute links). Returns the TARGET (un-normalized; callers
    * feed it to [[canonicalize]], whose dot-segment pass finishes §5.3
    * merging); null when the base is unusable or the ref is a
    * non-fetch scheme (mailto:, javascript:, data:). */
  def resolve(base: String, ref: String): String = {
    if (base == null || ref == null) return null
    val r = ref.trim
    // absolute reference with a scheme of its own
    val colon = r.indexOf(':')
    if (colon > 0 && r.substring(0, colon).forall(c => c.isLetterOrDigit && c < 128)) {
      return if (r.regionMatches(true, 0, "http:", 0, 5) ||
        r.regionMatches(true, 0, "https:", 0, 6)) r
      else null // mailto:, javascript:, data:, tel: — not crawl targets
    }
    val sep = base.indexOf("://")
    if (sep <= 0) return null
    val scheme = base.substring(0, sep)
    val rest = base.substring(sep + 3)
    val pathStart = { val i = rest.indexWhere(c => c == '/' || c == '?'); if (i < 0) rest.length else i }
    val authority = rest.substring(0, pathStart)
    if (authority.isEmpty) return null
    val pq = rest.substring(pathStart)
    val basePath = { val q = pq.indexWhere(c => c == '?' || c == '#'); if (q < 0) pq else pq.substring(0, q) }
    if (r.isEmpty) return base
    if (r.startsWith("//")) return scheme + ":" + r
    if (r.startsWith("/")) return s"$scheme://$authority$r"
    if (r.startsWith("?")) return s"$scheme://$authority${if (basePath.isEmpty) "/" else basePath}$r"
    if (r.startsWith("#"))
      return s"$scheme://$authority${if (basePath.isEmpty) "/" else basePath}$r"
    // relative path: merge onto the base path's directory (§5.3 merge)
    val dir = {
      val cut = basePath.lastIndexOf('/')
      if (cut < 0) "/" else basePath.substring(0, cut + 1)
    }
    s"$scheme://$authority$dir$r"
  }

  /** Host of a URL (no port), lower-cased; null if unparseable. */
  def host(url: String): String = {
    if (url == null) return null
    val sep = url.indexOf("://")
    if (sep <= 0) return null
    val rest = url.substring(sep + 3)
    val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    val hp = (if (end < 0) rest else rest.substring(0, end)).toLowerCase(java.util.Locale.ROOT)
    val colon = hp.lastIndexOf(':')
    val h = if (colon >= 0 && hp.substring(colon + 1).forall(_.isDigit)) hp.substring(0, colon) else hp
    if (h.isEmpty) null else h
  }
}
