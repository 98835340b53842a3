package graft.web

import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {

  private val fixture = Robots.policyFor(Web.RobotsTxt, "graftbot")

  test("group selection: specific token beats the deny-all * group") {
    assert(fixture.allowed("/a/item1"))
    // an unknown crawler falls to the * group: deny-all
    val other = Robots.policyFor(Web.RobotsTxt, "otherbot")
    assert(!other.allowed("/a/item1"))
    // agent match is case-insensitive
    assert(Robots.policyFor(Web.RobotsTxt, "GraftBot").allowed("/a/item1"))
  }

  test("longest-match precedence: Allow /private/pub/ overrides Disallow /private/") {
    assert(!fixture.allowed("/private/p1"))
    assert(fixture.allowed("/private/pub/d1"))
  }

  test("wildcard + end anchor: /*.pdf$ matches only pdf-terminated paths") {
    assert(!fixture.allowed("/docs/file9.pdf"))
    assert(fixture.allowed("/a/file9.pdf.html")) // $ anchor: not at end
  }

  test("bare prefix: /tmp disallows /tmp, /tmp/, /tmpfile") {
    assert(!fixture.allowed("/tmp"))
    assert(!fixture.allowed("/tmp/x1"))
    assert(!fixture.allowed("/tmpfile"))
  }

  test("no matching rule and no matching group both mean allowed") {
    assert(fixture.allowed("/elsewhere")) // no rule matches
    assert(Robots.policyFor("User-agent: x\nDisallow: /", "y")
      .allowed("/anything")) // no group matches
    assert(Robots.policyFor("", "y").allowed("/"))
    assert(Robots.policyFor(null, "y").allowed("/"))
  }

  test("tie on pattern length: allow wins (RFC least-restrictive rule)") {
    val p = Robots.policyFor(
      "User-agent: *\nAllow: /dir/\nDisallow: /dir/", "bot")
    assert(p.allowed("/dir/x"))
  }

  test("empty Disallow means allow-all; comments and unknowns ignored") {
    val p = Robots.policyFor(
      "# top\nUser-agent: * # trailing\nDisallow:\nCrawl-delay: 7", "bot")
    assert(p.allowed("/any"))
  }

  test("a later user-agent line after rules starts a NEW group") {
    val txt = "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y"
    assert(!Robots.policyFor(txt, "a").allowed("/x1"))
    assert(Robots.policyFor(txt, "a").allowed("/y1"))
    assert(!Robots.policyFor(txt, "b").allowed("/y1"))
    assert(Robots.policyFor(txt, "b").allowed("/x1"))
  }

  test("stacked user-agent lines share one rule set") {
    val txt = "User-agent: a\nUser-agent: b\nDisallow: /z"
    assert(!Robots.policyFor(txt, "a").allowed("/z"))
    assert(!Robots.policyFor(txt, "b").allowed("/z"))
  }

  test("ua lines stack across blank lines until a rule appears (RFC grammar)") {
    // vip and * here form ONE group — vip inherits the deny
    val merged = "User-agent: vip\n\nUser-agent: *\nDisallow: /"
    assert(!Robots.policyFor(merged, "vip").allowed("/anything"))
    // a group-member directive (even an ignorable one) closes the ua
    // stack, so vip's empty group then shadows the * deny-all
    val closed = "User-agent: vip\nCrawl-delay: 1\n\nUser-agent: *\nDisallow: /"
    assert(Robots.policyFor(closed, "vip").allowed("/anything"))
  }

  test("wildcard in the middle: /a*/b matches /aX/b and /a/q/b") {
    val p = Robots.policyFor("User-agent: *\nDisallow: /a*/b", "bot")
    assert(!p.allowed("/aX/b"))
    assert(!p.allowed("/a/q/bc"))
    assert(p.allowed("/c/b"))
  }
}
