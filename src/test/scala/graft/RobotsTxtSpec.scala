package graft

import org.apache.spark.sql.functions._

import graft.operators.RobotsTxt

class RobotsTxtSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """# sample robots
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: *.pdf$
      |Crawl-delay: 5
      |""".stripMargin

  test("longest-match with allow-wins-ties, wildcards, and $ anchor") {
    val rules = RobotsTxt.rulesFor(body, "anybot")
    assert(rules.toSeq == Seq("D/private", "A/private/ok", "D*.pdf$"))
    assert(RobotsTxt.isAllowed(rules, "/"))
    assert(RobotsTxt.isAllowed(rules, "/page/1"))
    assert(!RobotsTxt.isAllowed(rules, "/private"))
    assert(!RobotsTxt.isAllowed(rules, "/private/sub"))
    assert(RobotsTxt.isAllowed(rules, "/private/ok"))
    assert(RobotsTxt.isAllowed(rules, "/private/ok/deeper"))
    assert(!RobotsTxt.isAllowed(rules, "/files/doc.pdf"))
    assert(RobotsTxt.isAllowed(rules, "/files/doc.pdfx")) // $ anchors the end
    // no rules at all -> allowed
    assert(RobotsTxt.isAllowed(Array.empty, "/anything"))
  }

  test("agent group selection: longest token wins, * is the fallback") {
    val txt =
      """User-agent: graftbot-images
        |Disallow: /img
        |
        |User-agent: graftbot
        |Disallow: /graft-only
        |
        |User-agent: *
        |Disallow: /everyone
        |""".stripMargin
    assert(RobotsTxt.rulesFor(txt, "GraftBot/1.0").toSeq == Seq("D/graft-only"))
    assert(RobotsTxt.rulesFor(txt, "graftbot-images v2").toSeq == Seq("D/img"))
    assert(RobotsTxt.rulesFor(txt, "otherbot").toSeq == Seq("D/everyone"))
    // stacked user-agent lines share one rule set; same-token groups merge
    val stacked =
      """User-agent: a
        |User-agent: b
        |Disallow: /x
        |
        |User-agent: a
        |Disallow: /y
        |""".stripMargin
    assert(RobotsTxt.rulesFor(stacked, "a").toSeq == Seq("D/x", "D/y"))
    assert(RobotsTxt.rulesFor(stacked, "b").toSeq == Seq("D/x"))
    // empty Disallow (allow-all idiom) contributes no rule
    assert(RobotsTxt.rulesFor("User-agent: *\nDisallow:\n", "x").isEmpty)
    // a malformed blank User-agent token never outranks the '*' group
    val blankUa = "User-agent:\nDisallow: /\n\nUser-agent: *\nDisallow: /private\n"
    assert(RobotsTxt.rulesFor(blankUa, "foobot").toSeq == Seq("D/private"))
  }

  test("ruleMatches: backtracking wildcard edge cases") {
    assert(RobotsTxt.ruleMatches("/a*b*c", "/aXXbYYc-tail"))
    assert(!RobotsTxt.ruleMatches("/a*b$", "/aXXbY"))
    assert(RobotsTxt.ruleMatches("/a*b$", "/aXXb"))
    assert(RobotsTxt.ruleMatches("*", "/anything"))
    assert(RobotsTxt.ruleMatches("/p", "/p"))
    assert(!RobotsTxt.ruleMatches("/p$", "/page"))
  }

  test("evaluate joins corpus URLs to per-domain rules without re-parsing") {
    val robots = Seq(
      ("a.test", body),
      ("b.test", "User-agent: *\nDisallow: /\n")).toDF("domain", "robots_txt")
    val urls = Seq(
      (1L, "https://a.test/page/1"),
      (2L, "https://a.test/private/x"),
      (3L, "https://a.test/private/ok/x"),
      (4L, "https://b.test/anything"),
      (5L, "https://norobots.test/free")).toDF("id", "url")
    val out = RobotsTxt.evaluate(urls, "url", robots, "domain", "robots_txt",
      agent = "graftbot")
    assert(out.columns.toSeq == Seq("id", "url", "allowed"))
    val m = out.select($"id", $"allowed").as[(Long, Boolean)].collect().toMap
    assert(m == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> true))
  }

  test("evaluate normalizes domain case, dedups captures, drops null domains") {
    // robots domain recorded with mixed case + a duplicate capture + a
    // null-domain junk row: one row per URL comes back, with the
    // lexicographically greatest body deciding deterministically
    val robots = Seq(
      ("Example.COM", "User-agent: *\nDisallow: /\n"),
      ("example.com", "User-agent: *\nDisallow: /private\n"),
      (null.asInstanceOf[String], "User-agent: *\nDisallow: /\n"))
      .toDF("domain", "robots_txt")
    val urls = Seq(
      (1L, "https://example.com/open"),
      (2L, "https://EXAMPLE.com/private/x")).toDF("id", "url")
    val out = RobotsTxt.evaluate(urls, "url", robots, "domain", "robots_txt",
      agent = "bot")
    assert(out.count() == 2) // no fan-out from the duplicate capture
    val m = out.select($"id", $"allowed").as[(Long, Boolean)].collect().toMap
    // max(body) deterministically picks the "/private" capture
    assert(m(1L) && !m(2L))
  }
}
