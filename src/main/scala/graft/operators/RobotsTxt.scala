package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** robots.txt (RFC 9309) parsing and URL evaluation for crawl pipelines.
  *
  * Crawl-derived corpora carry compliance obligations: a page fetched
  * before a Disallow rule landed, or re-filtered retroactively, must be
  * droppable by replaying robots rules over the corpus. Common Crawl ships
  * the robots.txt captures themselves (robotstxt.paths per crawl), so the
  * rule source is a (domain, robots_txt) table.
  *
  * Semantics implemented from the public RFC: groups of `User-agent`
  * lines followed by `Allow`/`Disallow` rules; the applicable group is the
  * one whose agent token is the LONGEST (case-insensitive) match for the
  * caller's agent, with `*` as lowest-priority fallback, and all groups
  * sharing that token merge; per-path decision is longest-pattern-match
  * wins with Allow winning ties; `*` wildcards and a `$` end anchor in
  * patterns; no matching rule (or no robots.txt at all) means allowed.
  *
  * Scale shape: robots bodies parse ONCE per domain into a rules array
  * (the robots table is tiny next to the corpus), the corpus equi-joins
  * that table by domain — no broadcast of unbounded state, no per-row
  * re-parse — and a compiled map evaluates the match per row.
  */
object RobotsTxt {

  /** Rules for `agent` from one robots.txt body, encoded `"A<pat>"` /
    * `"D<pat>"` in file order; empty patterns (which the RFC defines as
    * matching nothing) are dropped. */
  def rulesFor(txt: String, agent: String): Array[String] = {
    if (txt == null) return Array.empty
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // (uaToken, rules) groups in file order
    val groups = scala.collection.mutable.ArrayBuffer.empty[(String, scala.collection.mutable.ArrayBuffer[String])]
    var currentAgents: List[String] = Nil
    var inHeader = true
    txt.split("\r?\n").foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inHeader) currentAgents = Nil // a new group starts
            currentAgents =
              value.toLowerCase(java.util.Locale.ROOT) :: currentAgents
            inHeader = true
          case "allow" | "disallow" =>
            if (currentAgents.nonEmpty) {
              if (inHeader) {
                // first rule of the group: materialize one bucket per agent
                currentAgents.foreach { a =>
                  groups += ((a, scala.collection.mutable.ArrayBuffer.empty[String]))
                }
                inHeader = false
              }
              if (value.nonEmpty) {
                val enc = (if (key == "allow") "A" else "D") + value
                groups.takeRight(currentAgents.size).foreach(_._2 += enc)
              }
            }
          case _ => () // sitemap, crawl-delay, unknown: ignored
        }
      }
    }
    // longest agent token contained in the caller's agent; '*' fallback.
    // Blank tokens (malformed "User-agent:" lines) never apply — every
    // agent contains "", so they would outrank the '*' group otherwise.
    val tokens = groups.map(_._1).distinct
    val applicable = tokens.filter(t => t.nonEmpty && t != "*" && agentLc.contains(t))
    val chosen =
      if (applicable.nonEmpty) applicable.maxBy(_.length)
      else if (tokens.contains("*")) "*"
      else return Array.empty
    groups.filter(_._1 == chosen).flatMap(_._2).toArray
  }

  /** Longest-match decision for one path (allowed when no rule matches). */
  def isAllowed(rules: Array[String], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      val allow = r.charAt(0) == 'A'
      val pat = r.substring(1)
      if (ruleMatches(pat, path)) {
        if (pat.length > bestLen || (pat.length == bestLen && allow && !bestAllow)) {
          bestLen = pat.length
          bestAllow = allow
        }
      }
      i += 1
    }
    bestLen < 0 || bestAllow
  }

  /** RFC 9309 §2.2.3 pattern match: anchored at the path start, `*`
    * matches any run, trailing `$` anchors the end. */
  private[graft] def ruleMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var i = 0
    var j = 0
    var starI = -1
    var starJ = -1
    while (true) {
      if (i == pat.length) {
        if (!anchored || j == path.length) return true
        if (starI < 0) return false
        starJ += 1
        if (starJ > path.length) return false
        i = starI + 1
        j = starJ
      } else if (pat.charAt(i) == '*') {
        starI = i
        starJ = j
        i += 1
      } else if (j < path.length && pat.charAt(i) == path.charAt(j)) {
        i += 1
        j += 1
      } else {
        if (starI < 0) return false
        starJ += 1
        if (starJ > path.length) return false
        i = starI + 1
        j = starJ
      }
    }
    false // unreachable
  }

  /** Append an `allowed` flag to `urls`: each URL is checked against its
    * domain's robots rules for `agent`. URLs whose domain has no robots
    * row are allowed (the RFC default for an absent robots.txt).
    * Robots domains are lowercased to match [[TextFunctions.urlDomain]],
    * null domains are dropped, and duplicate captures of one domain keep
    * the lexicographically greatest body — deterministic; pre-select the
    * wanted capture (e.g. newest by date) upstream when it matters. */
  def evaluate(urls: DataFrame, urlCol: String, robots: DataFrame,
      domainCol: String, txtCol: String, agent: String): DataFrame = {
    val spark = urls.sparkSession
    // parse once per DOMAIN — never per corpus row
    val rulesSchema = StructType(Seq(
      StructField("__robots_domain", StringType, nullable = false),
      StructField("__rules", ArrayType(StringType, containsNull = false),
        nullable = false)))
    val rules = robots
      .select(lower(col(domainCol).cast("string")).as("d"),
        col(txtCol).cast("string").as("t"))
      .filter(col("d").isNotNull)
      .groupBy(col("d")).agg(max(col("t")).as("t"))
      .map { r =>
        Row(r.getString(0),
          rulesFor(if (r.isNullAt(1)) null else r.getString(1), agent).toSeq)
      }(org.apache.spark.sql.Encoders.row(rulesSchema))
    // robots matching is case-SENSITIVE on paths (RFC 9309) — the
    // non-lowercased flavor of the shared path extraction
    val pathCol = TextFunctions.urlPathQuery(col(urlCol), lowercased = false)
    val joined = urls
      .withColumn("__domain", TextFunctions.urlDomain(col(urlCol)))
      .withColumn("__path", pathCol)
      .join(rules, col("__domain") === col("__robots_domain"), "left")
    val n = urls.schema.fields.length
    val outSchema = StructType(urls.schema.fields :+
      StructField("allowed", BooleanType, nullable = false))
    joined.map { r =>
      val path = r.getString(n + 1)
      val allowed =
        if (r.isNullAt(n + 3)) true
        else isAllowed(r.getSeq[String](n + 3).toArray, path)
      Row.fromSeq(r.toSeq.take(n) :+ allowed)
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
