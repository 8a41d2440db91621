package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column expressions for the training-data pipeline surface.
  *
  * Everything here is a pure Catalyst expression (whole-stage-codegen'd, no
  * UDFs) so the same logic scales from the 500-row fixture to billions of
  * documents: per-row, shuffle-free, and pushdown-friendly.
  *
  * The heuristics are deliberately deterministic and cross-engine
  * expressible so each has a DuckDB oracle (see SparkEntry.oracleSql).
  */
object TextFunctions {

  /** Whitespace tokens (empty-safe). */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** Within-document repetition: the fraction of duplicate word n-grams
    * (1 - distinct/total; 0 for docs shorter than `n` tokens) — the
    * Gopher-style repetition-filter signal for training-data quality.
    * Pure per-row expression; no shuffle. */
  def dupNgramRatio(text: Column, n: Int): Column = {
    val sh = graft.operators.Dedup.shingles(graft.operators.Dedup.tokens(text), n)
    when(size(sh) <= 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(sh)).cast("double") / size(sh).cast("double"))
  }

  /** Per-group token-count distribution (q47's corpus-stats shape).
    *
    * Percentile scale note: `exact = true` uses `percentile` — a SORT-BASED
    * aggregate holding the whole group in memory; right for the oracle path
    * (bit-comparable to DuckDB's quantile_cont) and for groups bounded in
    * the thousands-to-millions. `exact = false` uses `approx_percentile`
    * (t-digest sketch, CONSTANT memory per group, mergeable map-side) — the
    * only safe choice when a group can be billions of rows at 100 TB. */
  def corpusStats(df: org.apache.spark.sql.DataFrame, groupCol: String,
      textCol: String, exact: Boolean = false,
      accuracy: Int = 10000): org.apache.spark.sql.DataFrame = {
    def pct(q: Double): Column =
      if (exact) expr(s"percentile(__toks, $q)")
      else expr(s"approx_percentile(__toks, $q, $accuracy)")
    df.select(col(groupCol), tokenCount(col(textCol)).cast("double").as("__toks"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("__toks")), 6).as("avg_tokens"),
        round(pct(0.5), 6).as("p50_tokens"),
        round(pct(0.95), 6).as("p95_tokens"),
        round(min(col("__toks")), 6).as("min_tokens"),
        round(max(col("__toks")), 6).as("max_tokens"))
  }

  /** BPE-ish subword count: word-characters runs and single non-space
    * punctuation both count as tokens (a cheap stand-in for a real BPE;
    * deliberately regex-only so it's codegen'd and oracle-checkable). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", ""))

  def punctRatio(text: Column): Column =
    punctCount(text).cast("double") / greatest(length(text), lit(1)).cast("double")

  /** Tiny multilingual stopword lexicon used by both quality scoring and the
    * language-ID heuristic. */
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val stopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein")
  val stopwordsEs: Seq[String] = Seq("el", "la", "de", "y", "es", "un")
  val stopwordsFr: Seq[String] = Seq("le", "la", "de", "et", "est", "un")

  private def wordAlternation(ws: Seq[String]): String =
    ws.mkString("\\b(", "|", ")\\b")

  /** Count of matches of any word in `ws` (word-boundary anchored). */
  def stopwordHits(text: Column, ws: Seq[String]): Column =
    size(regexp_extract_all(text, lit(wordAlternation(ws)), lit(0)))

  def stopwordRatio(text: Column, ws: Seq[String] = stopwordsEn): Column =
    stopwordHits(text, ws).cast("double") / greatest(tokenCount(text), lit(1)).cast("double")

  /** Quality score in [0,1]: long-enough, some punctuation, native stopword
    * density — the classic C4-style cheap filters folded into one number. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val punctScore = least(punctRatio(text) * 20.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    round((lenScore + punctScore + stopScore) / 3.0, 6)
  }

  /** Argmax language over per-language stopword hit counts, deterministic
    * tie-break by priority order en > de > es > fr, 'und' (undetermined)
    * when no lexicon hits at all. */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, stopwordsEn)
    val de = stopwordHits(text, stopwordsDe)
    val es = stopwordHits(text, stopwordsEs)
    val fr = stopwordHits(text, stopwordsFr)
    val m = greatest(en, de, es, fr)
    when(m === 0, lit("und"))
      .when(en === m, lit("en"))
      .when(de === m, lit("de"))
      .when(es === m, lit("es"))
      .otherwise(lit("fr"))
  }

  /** 64-bit content fingerprint: xxhash64 of the normalized token stream.
    * Scale path (not oracle-matched — DuckDB has no xxhash64). */
  def fingerprint64(text: Column): Column =
    xxhash64(array_join(tokens(lower(text)), " "))

  /** Position-weighted rolling fingerprint that IS oracle-expressible: both
    * engines share md5; each token contributes
    * `position * nibble_value(first hex nibble of its md5)`. Small enough to
    * never overflow, order-sensitive like a real rolling hash. */
  def rollingFingerprint(text: Column): Column = {
    val toks = tokens(lower(text))
    // zip_with over token array and its 1-based positions
    val positions = transform(toks, (_, i) => i + 1)
    val contribs = zip_with(toks, positions, (t, p) =>
      p * (instr(lit("0123456789abcdef"), substring(md5(t), 1, 1)) - 1))
    aggregate(contribs, lit(0L), (acc, x) => acc + x)
  }
}
