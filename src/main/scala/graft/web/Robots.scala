package graft.web

/** RFC 9309 (Robots Exclusion Protocol) — the crawl-compliance side of
  * the web tier: a training-data pipeline that ingests crawl output
  * must be able to AUDIT which fetched URLs a polite crawler was
  * allowed to fetch, and re-filter when policies change.
  *
  * Implemented per the RFC:
  *  - groups: one or more `User-agent` lines followed by `Allow` /
  *    `Disallow` rules; unknown directives (Sitemap, Crawl-delay, …)
  *    and `#` comments are ignored; keys are case-insensitive;
  *  - group selection: all groups whose user-agent token equals the
  *    crawler's product token (case-insensitive) merge; if none match,
  *    the `*` groups apply; no group → everything allowed;
  *  - rule matching: patterns are path prefixes where `*` matches any
  *    character sequence and a trailing `$` anchors the end;
  *  - precedence: the MOST SPECIFIC match wins — longest pattern in
  *    octets; on a length tie the least restrictive (Allow) wins;
  *    no matching rule → allowed. Empty `Disallow:` means allow-all
  *    (it can never match more specifically than anything).
  */
object Robots {

  /** One rule; the regex is compiled lazily per executor (the parsed
    * policy object ships in the closure, patterns are data). */
  final case class Rule(allow: Boolean, pattern: String) {
    @transient lazy val re: java.util.regex.Pattern = {
      val anchored = pattern.endsWith("$")
      val body = if (anchored) pattern.dropRight(1) else pattern
      val quoted = body.split("\\*", -1)
        .map(java.util.regex.Pattern.quote).mkString(".*")
      java.util.regex.Pattern.compile(
        "^" + quoted + (if (anchored) "$" else ".*"))
    }
    def matches(path: String): Boolean = re.matcher(path).matches()
  }

  final case class Policy(rules: Seq[Rule]) {
    /** RFC 9309 §2.2.2 precedence: longest matching pattern; tie →
      * allow. No match → allowed. */
    def allowed(path: String): Boolean = {
      var bestLen = -1
      var bestAllow = true
      for (r <- rules if r.matches(path)) {
        val len = r.pattern.length
        if (len > bestLen) { bestLen = len; bestAllow = r.allow }
        else if (len == bestLen) bestAllow = bestAllow || r.allow
      }
      bestAllow
    }
  }

  private final case class Group(agents: Seq[String], rules: Seq[Rule])

  /** Parse robots.txt into groups. Total: junk lines are skipped. */
  private def parseGroups(txt: String): Seq[Group] = {
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var inRules = false
    def flush(): Unit =
      if (agents.nonEmpty) { groups += Group(agents, rules) }
    for (raw <- txt.linesIterator) {
      val line = { val h = raw.indexOf('#'); if (h < 0) raw else raw.substring(0, h) }.trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) { flush(); agents = Vector.empty; rules = Vector.empty; inRules = false }
            agents :+= value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            inRules = true
            if (value.nonEmpty) rules :+= Rule(key == "allow", value)
          case _ => if (agents.nonEmpty) inRules = true // group-member directive
        }
      }
    }
    flush()
    groups.result()
  }

  /** The merged policy for one crawler token: exact-token groups if any
    * exist, else the `*` groups, else empty (allow-all). */
  def policyFor(robotsTxt: String, agent: String): Policy = {
    if (robotsTxt == null) return Policy(Seq.empty)
    val groups = parseGroups(robotsTxt)
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val exact = groups.filter(_.agents.contains(a))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    Policy(chosen.flatMap(_.rules))
  }
}
