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

  /** Unicode SCRIPT composition of a document — the multilingual-corpus
    * filter that runs before any language model: fractions of Latin,
    * Cyrillic, Han (CJK), Arabic, Devanagari, Hangul, digits, and
    * whitespace over all code points, plus the dominant script. Counted
    * per CODE POINT in one compiled map (no per-char rows ever
    * materialize); classes use `Character.UnicodeScript`, whose
    * assignments for these majors agree with RE2's `\p{Script}` classes,
    * so a DuckDB regexp oracle can recount them independently. */
  def scriptStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val in = df.select(org.apache.spark.sql.functions.col(idCol),
      org.apache.spark.sql.functions.col(textCol).cast("string"))
    val names = Seq("latin", "cyrillic", "han", "arabic", "devanagari",
      "hangul", "digit", "space", "other")
    val schema = StructType(
      in.schema.fields(0) +:
        StructField("n_codepoints", LongType) +:
        names.map(n => StructField(s"frac_$n", DoubleType)) :+
        StructField("dominant_script", StringType))
    in.map { row =>
      val text = if (row.isNullAt(1)) "" else row.getString(1)
      val counts = new Array[Long](names.size)
      var i = 0
      var n = 0L
      while (i < text.length) {
        val cp = text.codePointAt(i)
        i += Character.charCount(cp)
        n += 1
        val k =
          if (Character.isDigit(cp)) 6
          else if (Character.isWhitespace(cp)) 7
          else Character.UnicodeScript.of(cp) match {
            case Character.UnicodeScript.LATIN => 0
            case Character.UnicodeScript.CYRILLIC => 1
            case Character.UnicodeScript.HAN => 2
            case Character.UnicodeScript.ARABIC => 3
            case Character.UnicodeScript.DEVANAGARI => 4
            case Character.UnicodeScript.HANGUL => 5
            case _ => 8
          }
        counts(k) += 1
      }
      val fracs = names.indices.map(k =>
        if (n == 0) 0.0 else counts(k).toDouble / n)
      // dominant = the largest SCRIPT class (digits/space/other excluded);
      // ties break by class order; all-zero -> "none"
      val scriptIdx = (0 until 6).maxBy(counts(_))
      val dominant = if (counts(scriptIdx) == 0) "none" else names(scriptIdx)
      org.apache.spark.sql.Row.fromSeq(
        row.get(0) +: n +: fracs :+ dominant)
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** PII patterns for redaction/counting. Kept to constructs that parse and
    * match identically under Java regex (Spark) and RE2 (DuckDB, C4's
    * tooling): character classes, bounded repetition, `\b` word boundaries —
    * no backreferences or lookaround. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?"
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def piiEmailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailRe), lit(0)))
  def piiPhoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(phoneRe), lit(0)))
  def piiIpCount(text: Column): Column =
    size(regexp_extract_all(text, lit(ipv4Re), lit(0)))

  /** PII redaction: emails, then phone numbers, then IPv4 literals replaced
    * by typed placeholder tokens (the standard pre-training scrub step).
    * Order matters — emails are redacted first so an address can never be
    * partially eaten by the narrower patterns. Pure per-row regexp_replace
    * chain: codegen'd, shuffle-free, linear scan at any corpus size. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  /** URLs in the text (`http`/`https`, up to the next whitespace). */
  val urlRe = "https?://[^\\s]+"

  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(urlRe), lit(0))

  /** Registrable host of a URL: the authority part before any `/`, `?`,
    * `#` or `:port`, lowercased — the C4-style domain key for per-domain
    * quality stats, caps, and blocklists. */
  val domainRe = "https?://([^/?#:\\s]+)"

  def urlDomain(url: Column): Column =
    lower(regexp_extract(url, domainRe, 1))

  /** Path + query of a URL with scheme/authority and any `#fragment`
    * removed, normalized so the root is always `/` (a bare host, and a
    * bare host with only a query, both get the leading slash — the same
    * resource must never yield two keys). `lowercased = true` is the
    * canonicalization flavor (SURT keys); `false` preserves case for
    * case-sensitive consumers (robots.txt matching, RFC 9309). */
  def urlPathQuery(url: Column, lowercased: Boolean): Column = {
    val u = if (lowercased) lower(url) else url
    val rest = regexp_replace(regexp_replace(u, "(?i)^https?://[^/?#]*", ""),
      "#.*$", "")
    when(rest === "", lit("/"))
      .when(rest.startsWith("?"), concat(lit("/"), rest))
      .otherwise(rest)
  }

  /** SURT (Sort-friendly URI Reordering Transform) key — the canonical CDX
    * index key (Internet Archive convention, public: pywb/OpenWayback
    * docs): scheme and `:port` dropped, host lowercased, a leading `www.`
    * stripped, host labels reversed comma-joined, then `)` and the
    * lowercased path+query (`/` when empty). URLs sharing a registrable
    * suffix sort adjacently — the property crawl indexes and per-site
    * range scans rely on. Query-parameter reordering is intentionally NOT
    * applied (parameter order is preserved). Pure Column expression. */
  def surtKey(url: Column): Column = {
    val u = lower(url)
    val host = regexp_replace(regexp_extract(u, domainRe, 1), "^www\\.", "")
    concat(array_join(reverse(split(host, "\\.")), ","), lit(")"),
      urlPathQuery(url, lowercased = true))
  }

  /** TF-IDF top-`k` keyword extraction per document: tf = in-doc term count,
    * idf = ln(N / df) with N = distinct non-empty docs, top-k by
    * (score desc, term asc). The classic two-level aggregation — per-(doc,
    * term) counts roll up map-side before any exchange, the document
    * frequency is one term-keyed agg whose partitioning the score join then
    * reuses, and N rides in as a broadcast single-row cross join (never a
    * driver collect). The top-k window partitions by doc — millions of
    * small partitions, no global sort. Scores are rounded to 6 BEFORE
    * ranking so the rank order is reproducible across engines. */
  def tfidfTopK(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nonEmpty = df.filter(length(trim(col(textCol))) > 0)
    val tok = nonEmpty
      .select(col(idCol).as("id"),
        explode(graft.operators.Dedup.tokens(col(textCol))).as("term"))
    val tf = tok.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // distinct doc ids in `tok` == distinct ids with non-empty trimmed text
    // (every such doc yields >= 1 token), so N comes from the corpus rows
    // directly — no second token explode just to count documents
    val nDocs = nonEmpty.agg(countDistinct(col(idCol)).as("n"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf").cast("double") *
          log(col("n").cast("double") / col("df").cast("double")), 6))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rk") <= k)
      .select(col("id"), col("term"), col("tfidf"), col("rk"))
  }

  /** Gopher-style quality-rule verdict (Rae et al. 2021 §A1.1 — the
    * canonical pre-training document filter, also RedPajama/Dolma's rule
    * core): per-doc booleans for the word-count band, mean-word-length
    * band, alphabetic-word fraction, symbol ratio, and duplicate-bigram
    * fraction, plus the conjunction `keep`. Emitting per-rule flags (not
    * just the verdict) is what makes threshold sweeps and rejection
    * accounting one aggregation instead of a recompute.
    *
    * Everything except the bigram stage is per-row expressions; the bigram
    * distinct-fraction is the same per-row form as [[dupNgramRatio]] — no
    * shuffle anywhere, scan-speed at any corpus size.
    *
    * `carry` names extra input columns to pass through unchanged (e.g. the
    * source label a downstream mixture stage partitions on) — carrying them
    * here keeps composed pipelines join-free instead of re-joining flags
    * back to the corpus on the doc id. */
  def gopherQualityRules(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, carry: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val t = trim(col(textCol).cast("string"))
    val toks = split(t, "\\s+")
    val nw = when(length(t) === 0, lit(0)).otherwise(size(toks))
    val chars = length(regexp_replace(t, "\\s+", ""))
    val alphaW = when(length(t) === 0, lit(0))
      .otherwise(size(filter(toks, w => w.rlike("[A-Za-z]"))))
    val hashes = length(col(textCol)) - length(regexp_replace(col(textCol), "#", ""))
    val dup2 = dupNgramRatio(col(textCol), 2)
    def flag(c: org.apache.spark.sql.Column) = when(c, 1L).otherwise(0L)
    df.select(
        Seq(col(idCol).as("id"), nw.as("nw"), chars.as("chars"), alphaW.as("aw"),
          hashes.as("hashes"), dup2.as("dup2")) ++ carry.map(col): _*)
      .select(Seq(col("id"), col("nw").cast("long").as("n_words"),
        flag(col("nw").between(50, 100000)).as("r_words"),
        flag(col("nw") > 0 &&
          (col("chars").cast("double") / col("nw")).between(3, 10)).as("r_mean_len"),
        flag(col("nw") > 0 &&
          col("aw").cast("double") / col("nw") >= 0.8).as("r_alpha"),
        flag(col("nw") > 0 &&
          col("hashes").cast("double") / col("nw") <= 0.1).as("r_symbol"),
        flag(col("dup2") <= 0.3).as("r_dup")) ++ carry.map(col): _*)
      .withColumn("keep",
        col("r_words") * col("r_mean_len") * col("r_alpha")
          * col("r_symbol") * col("r_dup"))
  }

  /** Compiled twin of [[gopherQualityRules]] for hot composed pipelines
    * (q91 runs the rules as ONE stage of a multi-stage pass): the whole
    * rule chain — tokenize, per-token alpha test, bigram distinct fraction
    * — runs as one JVM map per row instead of the interpreted array-HOF
    * tower (`transform`/`slice`/`concat_ws`/`array_distinct`/`filter`+
    * `rlike` never enter whole-stage codegen; every element walks the
    * expression interpreter). Bit-identical rows to [[gopherQualityRules]]
    * — SQL `trim` (spaces only), Java-regex `\s` whitespace, split limit
    * -1, [[graft.operators.Dedup.shingleStringsOf]] bigrams — and the spec
    * asserts lockstep on the fixture. Same output schema, same `carry`
    * contract. */
  def gopherQualityRulesFlat(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, carry: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val in = df.select(col(idCol).as("id") +:
      col(textCol).cast("string").as("t") +: carry.map(col): _*)
    val carryFields = carry.zipWithIndex.map { case (_, i) => in.schema.fields(2 + i) }
    val schema = StructType(
      Seq(in.schema.fields(0),
        StructField("n_words", LongType),
        StructField("r_words", LongType, nullable = false),
        StructField("r_mean_len", LongType, nullable = false),
        StructField("r_alpha", LongType, nullable = false),
        StructField("r_symbol", LongType, nullable = false),
        StructField("r_dup", LongType, nullable = false)) ++
      carryFields :+ StructField("keep", LongType, nullable = false))
    // Java-regex \s, the class Spark's split/regexp_replace compile
    def isRe(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    in.map { row =>
      val id = row.get(0)
      val text = if (row.isNullAt(1)) null else row.getString(1)
      val carryVals = carry.indices.map(i => row.get(2 + i))
      if (text == null)
        // NULL text: every nw-derived flag folds to 0, dup2 to 0.0 (r_dup 1)
        org.apache.spark.sql.Row.fromSeq(
          Seq(id, null, 0L, 0L, 0L, 0L, 1L) ++ carryVals :+ 0L)
      else {
        var from = 0
        var until = text.length
        while (from < until && text.charAt(from) == ' ') from += 1
        while (until > from && text.charAt(until - 1) == ' ') until -= 1
        val t = text.substring(from, until)
        val toks: Array[String] =
          if (t.isEmpty) null else WhitespaceRe.split(t, -1)
        val nw = if (t.isEmpty) 0 else toks.length
        var chars = 0
        var k = 0
        while (k < t.length) { if (!isRe(t.charAt(k))) chars += 1; k += 1 }
        var aw = 0
        if (toks != null) {
          var i = 0
          while (i < toks.length) {
            val w = toks(i)
            var j = 0
            var hit = false
            while (!hit && j < w.length) {
              val c = w.charAt(j)
              if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hit = true
              j += 1
            }
            if (hit) aw += 1
            i += 1
          }
        }
        var hashes = 0
        k = 0
        while (k < text.length) { if (text.charAt(k) == '#') hashes += 1; k += 1 }
        val sh = graft.operators.Dedup.shingleStringsOf(text, 2)
        val dup2 =
          if (sh.isEmpty) 0.0
          else {
            val set = new java.util.HashSet[String]()
            var i = 0
            while (i < sh.length) { set.add(sh(i)); i += 1 }
            1.0 - set.size.toDouble / sh.length.toDouble
          }
        def flag(b: Boolean) = if (b) 1L else 0L
        val rWords = flag(nw >= 50 && nw <= 100000)
        val rMean = flag(nw > 0 && {
          val m = chars.toDouble / nw; m >= 3 && m <= 10 })
        val rAlpha = flag(nw > 0 && aw.toDouble / nw >= 0.8)
        val rSymbol = flag(nw > 0 && hashes.toDouble / nw <= 0.1)
        val rDup = flag(dup2 <= 0.3)
        org.apache.spark.sql.Row.fromSeq(
          Seq(id, nw.toLong, rWords, rMean, rAlpha, rSymbol, rDup) ++
            carryVals :+ (rWords * rMean * rAlpha * rSymbol * rDup))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** First BPE-training iteration (Sennrich et al. 2016 §3.2, the merge-pair
    * count): frequency of adjacent character pairs, counted over DISTINCT
    * words weighted by word frequency. The word-keyed pre-aggregation is the
    * scale move BPE trainers rely on: pair counting is O(vocabulary), not
    * O(corpus) — at 100 TB the char-pair explode runs over the (tiny)
    * distinct-word table, and both aggregations combine map-side. Returns
    * the top `k` (pair, n) merge candidates, count-desc then pair. */
  def bpePairStats(df: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    val words = df
      .select(explode(tokens(col(textCol).cast("string"))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    words
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Full iterative BPE merge training (Sennrich et al. 2016 §3.2): the
    * corpus aggregates ONCE to the (word, freq) vocabulary table, then each
    * round counts adjacent SYMBOL pairs over the current segmentations
    * (frequency-weighted), selects merges (count-desc, pair asc tie-break —
    * deterministic), and re-segments every word containing them. Returns
    * the ordered merge list.
    *
    * `batchSize` > 1 applies the standard batched-trainer move: one round
    * accepts up to `batchSize` pairs from the count-sorted candidate list,
    * greedily, skipping any candidate that could INTERACT with an
    * already-accepted pair. Two pairs (a,b), (c,d) interact only when an
    * occurrence of one can overlap, destroy, create, or feed an occurrence
    * of the other: d = a' (the candidate's right symbol sits where an
    * accepted pair starts), c = b' (its left sits where one ends), either
    * symbol equals an accepted MERGED token, or its merged token equals any
    * accepted symbol or merged token. Sharing only a left (a = c) or only a
    * right (b = d) symbol canNOT interact — "e r" and "o r" never overlap —
    * so those batch together. Accepted pairs' counts are mutually invariant
    * and the batch fold (one rule per pair, at most one fires per position)
    * equals applying them sequentially. The one divergence from strict
    * greedy order: a pair CREATED by an accepted merge (e.g. (p,ar) right
    * after (a,r)) can outrank a later accepted pair; sequential training
    * emits it in between. That reordering is the accepted batched-BPE
    * approximation. When EXACT greedy order at production merge counts is
    * required, use [[bpeTrainMergesExact]] — vocabulary-level collect +
    * driver-local incremental trainer, zero Spark rounds per merge.
    *
    * Scale shape: the per-round work is O(vocabulary), never O(corpus) —
    * the explode + agg runs over the distinct-word table, the driver
    * collects ≤ 4×batchSize rows per round, and segmentations are eagerly
    * local-checkpointed every round (same lineage discipline as
    * [[graft.operators.Dedup.connectedComponents]]; a per-round join tree
    * would otherwise stack `numMerges` deep). No end-of-word marker (plain
    * within-word BPE). */
  def bpeTrainMerges(df: org.apache.spark.sql.DataFrame, textCol: String,
      numMerges: Int, batchSize: Int = 1): Seq[(String, String)] =
    bpeTrainMergesWithRounds(df, textCol, numMerges, batchSize)._1

  /** [[bpeTrainMerges]] plus the number of Spark rounds used (spec hook for
    * the round-count bound: rounds ≤ ceil(numMerges / batchSize) unless
    * symbol collisions shrink a batch). */
  private[graft] def bpeTrainMergesWithRounds(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      numMerges: Int, batchSize: Int = 1): (Seq[(String, String)], Int) = {
    require(numMerges >= 1, s"numMerges $numMerges")
    require(batchSize >= 1, s"batchSize $batchSize")
    val spark = df.sparkSession
    import spark.implicits._
    var seg = df
      .select(explode(tokens(col(textCol).cast("string"))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      // per-char segmentation via substring — a zero-width regex split
      // would leave a trailing empty symbol under limit -1
      .select(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("parts"), col("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var taken = 0
    var rounds = 0
    var exhausted = false
    while (taken < numMerges && !exhausted) {
      val want = math.min(batchSize, numMerges - taken)
      // over-fetch so collision-skipped candidates don't starve the batch
      val top = seg
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(parts) - 1), " +
            "i -> struct(parts[i - 1] AS a, parts[i] AS b))")).as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(want * 4)
        .as[(String, String, Long)].collect()
      if (top.isEmpty) exhausted = true
      else {
        // greedy non-interacting selection in count order (see Scaladoc for
        // the derivation): candidate (c,d)→m is compatible with accepted
        // lefts A, rights B, outputs M iff d∉A (no overlap at an accepted
        // start), c∉B (none at an accepted end), c,d∉M (an accepted output
        // can't create/feed candidate occurrences mid-fold), m∉A∪B∪M (the
        // candidate's output can't feed an accepted rule or collide).
        // Shared left or shared right symbols alone are fine.
        val lefts = scala.collection.mutable.HashSet.empty[String]
        val rights = scala.collection.mutable.HashSet.empty[String]
        val outs = scala.collection.mutable.HashSet.empty[String]
        val accepted = Seq.newBuilder[(String, String)]
        var nAccepted = 0
        top.iterator.takeWhile(_ => nAccepted < want).foreach { case (a, b, _) =>
          val m = a + b
          if (!lefts(b) && !rights(a) && !outs(a) && !outs(b) &&
              !lefts(m) && !rights(m) && !outs(m)) {
            accepted += ((a, b))
            lefts += a; rights += b; outs += m
            nAccepted += 1
          }
        }
        val batch = accepted.result()
        merges ++= batch
        taken += batch.size
        // SQL string literal with backslash + quote escaping (symbols come
        // from corpus text)
        def q(s: String): String =
          "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
        // left-to-right single-pass merge fold: a trailing `a` merges when
        // `b` follows. The merged element can never re-trigger its own rule
        // (a+b = a would need an empty b), and disjointness stops it from
        // triggering any other rule, so whole-element equality is exactly
        // the classic non-rescanning merge, batch-wide.
        val rules = batch.map { case (a, b) =>
          s"""WHEN size(acc) > 0 AND element_at(acc, -1) = ${q(a)}
             |     AND x = ${q(b)}
             |THEN concat(slice(acc, 1, size(acc) - 1), array(${q(a + b)}))"""
            .stripMargin
        }.mkString("\n")
        val next = seg.select(expr(
          s"""aggregate(parts, CAST(array() AS array<string>), (acc, x) ->
             |  CASE $rules
             |       ELSE concat(acc, array(x)) END)""".stripMargin)
          .as("parts"), col("freq"))
          // fully-merged (single-part) words are terminal: they can never
          // contribute another pair, and sequence(1, 0) would count DOWN
          .filter(size(col("parts")) >= 2)
          .localCheckpoint(true)
        seg.unpersist()
        seg = next
      }
      rounds += 1
    }
    seg.unpersist()
    (merges.result(), rounds)
  }

  /** Exact BPE merge training at production merge counts. ONE Spark
    * aggregation reduces the corpus to its (word, freq) vocabulary table
    * (O(corpus), map-side combined); the table collects to the driver
    * (guarded by `maxVocab` — a directed error, not an OOM); and the
    * classic incremental-count trainer runs locally: a lazy max-heap over
    * pair counts, each merge touching only the words that contain the
    * merged pair. Zero Spark rounds per merge — 32k merges are driver-local
    * work on the word-count summary instead of 32k sequential jobs. This is
    * the two-level architecture production tokenizer trainers use
    * (word-count reduction distributed once, merge loop in memory); greedy
    * order and tie-break (count desc, pair asc) are IDENTICAL to
    * [[bpeTrainMerges]] at batchSize = 1, spec-pinned on the q92 fixture.
    * Use the distributed iterative path only when the vocabulary itself is
    * too large to collect. */
  def bpeTrainMergesExact(df: org.apache.spark.sql.DataFrame, textCol: String,
      numMerges: Int, maxVocab: Int = 2000000): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges $numMerges")
    require(maxVocab >= 1, s"maxVocab $maxVocab")
    val spark = df.sparkSession
    import spark.implicits._
    val vocabDf = df
      .select(explode(tokens(col(textCol).cast("string"))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic overflow guard: count the aggregate (cached, so the
    // corpus pass runs once) BEFORE collecting — an unordered limit would
    // retain an arbitrary subset when the vocab overflows
    val vocab =
      try {
        val n = vocabDf.count()
        require(n <= maxVocab,
          s"BPE vocabulary for column '$textCol' has $n distinct words, " +
            s"exceeding maxVocab=$maxVocab; raise maxVocab or train with " +
            "the distributed bpeTrainMerges path")
        vocabDf.as[(String, Long)].collect()
      } finally vocabDf.unpersist()
    import scala.collection.mutable
    val words = vocab.map { case (w, _) => w.map(_.toString).toArray }
    val freqs = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def bump(p: (String, String), d: Long): Unit = {
      val n = counts.getOrElse(p, 0L) + d
      if (n <= 0L) counts.remove(p) else counts(p) = n
    }
    var i = 0
    while (i < words.length) {
      val w = words(i); val f = freqs(i)
      var j = 0
      while (j < w.length - 1) {
        val p = (w(j), w(j + 1))
        bump(p, f)
        where.getOrElseUpdate(p, mutable.HashSet.empty) += i
        j += 1
      }
      i += 1
    }
    // max-heap with lazy invalidation: an entry is live iff its recorded
    // count equals the pair's current count (every count change re-pushes,
    // so the current count always has a live entry). Max = highest count,
    // then lexicographically smallest pair — the same deterministic
    // tie-break as the distributed ORDER BY n DESC, a, b.
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val ca = y._2.compareTo(x._2)
          if (ca != 0) ca else y._3.compareTo(x._3)
        }
      }
    }
    val pq = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    counts.foreach { case ((a, b), n) => pq.enqueue((n, a, b)) }
    val merges = Seq.newBuilder[(String, String)]
    var taken = 0
    var done = false
    while (taken < numMerges && !done) {
      var best: (String, String) = null
      while (best == null && pq.nonEmpty) {
        val (n, a, b) = pq.dequeue()
        if (counts.getOrElse((a, b), 0L) == n) best = ((a, b))
      }
      if (best == null) done = true
      else {
        val (a, b) = best
        merges += ((a, b)); taken += 1
        val touched = mutable.HashSet.empty[(String, String)]
        val affected = where.getOrElse((a, b), mutable.HashSet.empty).toArray
        java.util.Arrays.sort(affected)
        affected.foreach { wi =>
          val w = words(wi); val f = freqs(wi)
          var j = 0
          while (j < w.length - 1) {
            val p = (w(j), w(j + 1))
            bump(p, -f)
            where.get(p).foreach(_ -= wi)
            touched += p
            j += 1
          }
          // left-to-right non-rescanning merge — same semantics as the
          // distributed fold (a just-merged token never re-triggers)
          val out = mutable.ArrayBuffer.empty[String]
          var k = 0
          while (k < w.length) {
            if (k < w.length - 1 && w(k) == a && w(k + 1) == b) {
              out += a + b; k += 2
            } else { out += w(k); k += 1 }
          }
          val nw = out.toArray
          words(wi) = nw
          j = 0
          while (j < nw.length - 1) {
            val p = (nw(j), nw(j + 1))
            bump(p, f)
            where.getOrElseUpdate(p, mutable.HashSet.empty) += wi
            touched += p
            j += 1
          }
        }
        touched.foreach { p =>
          counts.get(p).foreach(n => pq.enqueue((n, p._1, p._2)))
        }
      }
    }
    merges.result()
  }

  /** Apply a trained merge list: classic BPE encoding — start from the
    * character segmentation of each whitespace token and repeatedly merge
    * the present pair with the lowest merge rank. Compiled per-row map
    * (the merge table broadcasts in the closure, rank lookup is a hash
    * map); O(word length^2 * merges-present) per word, no shuffle.
    * Returns (id, n_subwords, subwords). */
  def bpeEncode(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    // fanOut: greedy merge encoding is O(word_len^2 x merges) per word —
    // compute-dense per byte, so a narrow input must spread first (§2.5)
    val in = graft.operators.ScaleToolkit.fanOut(
      df.select(col(idCol).as("id"), col(textCol).cast("string").as("t")))
    val schema = StructType(Seq(
      in.schema.fields(0),
      StructField("n_subwords", LongType, nullable = false),
      StructField("subwords", ArrayType(StringType), nullable = false)))
    in.map { row =>
      val text = if (row.isNullAt(1)) "" else row.getString(1)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      WhitespaceRe.split(text.trim, -1).foreach { w =>
        if (w.nonEmpty) {
          var parts = w.map(_.toString).toArray
          var done = parts.length < 2
          while (!done) {
            var best = -1
            var bestRank = Int.MaxValue
            var i = 0
            while (i < parts.length - 1) {
              val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
              if (r < bestRank) { bestRank = r; best = i }
              i += 1
            }
            if (best < 0 || bestRank == Int.MaxValue) done = true
            else {
              parts = (parts.take(best) :+ (parts(best) + parts(best + 1))) ++
                parts.drop(best + 2)
              done = parts.length < 2
            }
          }
          out ++= parts
        }
      }
      org.apache.spark.sql.Row(row.get(0), out.length.toLong, out.toSeq)
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  private val WhitespaceRe = java.util.regex.Pattern.compile("\\s+")

  /** Compiled twin of [[chunkWindows]] for the hot path: the window loop
    * runs as one JVM lambda instead of the interpreted
    * sequence/transform/slice HOF chain. SQL `trim` semantics (spaces
    * only), `\s+` split with limit -1 (Spark's `split` keeps a trailing
    * empty token for newline-terminated text; `Pattern.split`'s default
    * limit 0 would drop it), NO lowercasing — bit-identical rows to
    * `explode(chunkWindows(...))`; keep the two in lockstep (spec asserts
    * equality, incl. trailing-newline input). Emits (id, start, n_toks,
    * chunk). */
  def chunkWindowsFlat(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, window: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val in = df.select(col(idCol).as("id"), col(textCol).cast("string").as("t"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      in.schema.fields(0),
      org.apache.spark.sql.types.StructField("start",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_toks",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("chunk",
        org.apache.spark.sql.types.StringType)))
    in.flatMap { row =>
      if (row.isNullAt(1)) Iterator.empty
      else {
        val id = row.get(0)
        val text = row.getString(1)
        var from = 0
        var until = text.length
        while (from < until && text.charAt(from) == ' ') from += 1
        while (until > from && text.charAt(until - 1) == ' ') until -= 1
        val toks = WhitespaceRe.split(text.substring(from, until), -1)
        val lastStart = math.max(1, toks.length - (window - stride))
        Iterator.range(1, lastStart + 1, stride).map { start =>
          val end = math.min(start - 1 + window, toks.length)
          val sb = new java.lang.StringBuilder()
          var k = start - 1
          while (k < end) {
            if (k > start - 1) sb.append(' ')
            sb.append(toks(k))
            k += 1
          }
          org.apache.spark.sql.Row(id, start, end - start + 1, sb.toString)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** CCNet-style n-gram LM quality score (Wenzek et al. 2020 §3.3 uses a
    * 5-gram KenLM; same signal, bigram order, exact arithmetic): each
    * document scored by the mean negative log-likelihood of its word
    * bigrams under a Laplace-smoothed bigram model trained on a reference
    * "clean" corpus — low avg_nll ≈ fluent, high ≈ gibberish/boilerplate.
    * nll(w1 w2) = ln((c(w1·) + V) / (c(w1 w2) + 1)); unseen contexts
    * degrade smoothly to ln(V).
    *
    * Scale shape: the LM is a keyed TABLE, never a broadcast — both lookup
    * joins shuffle on their own key (bigram, then first word), so a
    * billion-bigram LM trains and serves with the same plan; only the
    * single-row vocab count rides a broadcast cross join. Returns
    * (id, n_bigrams, avg_nll); docs with fewer than 2 tokens drop out. */
  def bigramLmScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, train: org.apache.spark.sql.DataFrame,
      trainTextCol: String): org.apache.spark.sql.DataFrame = {
    import graft.operators.Dedup
    // both bigram streams run the shingle loop as ONE compiled lambda
    // (Dedup.shingleStringsOf) — the interpreted transform/slice/concat_ws
    // HOF chain never enters whole-stage codegen (same trade as the q58
    // decontamination reshape; measured 3.5 s -> ~1 s at sf0.1)
    val trainBigrams = train.select(col(trainTextCol).cast("string").as("t"))
      .flatMap(r => Dedup.shingleStringsOf(r.getString(0), 2))(
        org.apache.spark.sql.Encoders.STRING).toDF("s")
    val c2 = trainBigrams.groupBy(col("s")).agg(count(lit(1)).as("c2"))
    // context counts roll up from the bigram table (one row per TYPE), not
    // from a second explode of the corpus — the training text is scanned
    // once for the model, once for the vocab
    val c1 = c2.groupBy(substring_index(col("s"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    val vocab = train
      .select(explode(Dedup.tokens(col(trainTextCol))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val docIn = df.select(col(idCol).as("id"), col(textCol).cast("string").as("t"))
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      docIn.schema.fields(0),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    docIn.flatMap { row =>
        val id = row.get(0)
        Dedup.shingleStringsOf(row.getString(1), 2).iterator
          .map(s => org.apache.spark.sql.Row(id, s))
      }(org.apache.spark.sql.Encoders.row(docSchema))
      .withColumn("w1", substring_index(col("s"), " ", 1))
      .join(c2, Seq("s"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("nll",
        log((coalesce(col("c1"), lit(0L)) + col("v")).cast("double")
          / (coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("nll")), 6).as("avg_nll"))
  }

  /** Context-window chunking for training-example prep: overlapping token
    * windows of `window` tokens at `stride` intervals (stride < window =
    * overlap). Start positions run 1, 1+stride, ... up to len - window +
    * stride, so every token lands in at least one chunk and the final chunk
    * may be short; docs shorter than one window yield exactly one chunk.
    * Pure per-row expression — chunks explode map-side, nothing shuffles
    * until the caller aggregates. Returns array<struct<start int, chunk
    * string>> (1-based starts). */
  def chunkWindows(text: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val t = tokens(text)
    val starts = sequence(lit(1),
      greatest(lit(1), size(t) - lit(window - stride)), lit(stride))
    transform(starts, i =>
      struct(i.as("start"), concat_ws(" ", slice(t, i, lit(window))).as("chunk")))
  }

  /** Per-group vocabulary statistics: total tokens, distinct types, hapax
    * legomena (types occurring once in the group), and type-token ratio —
    * the Zipf-shape summary that flags synthetic/templated text (low TTR,
    * few hapaxes) vs natural prose. Two-level aggregation: per-(group,
    * token) counts combine map-side before the exchange, then one row per
    * type rolls up per group — the token stream itself never shuffles. */
  def vocabStats(df: org.apache.spark.sql.DataFrame, groupCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val tc = df.select(col(groupCol).as("g"),
        explode(graft.operators.Dedup.tokens(col(textCol))).as("w"))
      .groupBy(col("g"), col("w")).agg(count(lit(1)).as("c"))
    tc.groupBy(col("g"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr",
        round(col("n_types").cast("double") / col("n_tokens"), 6))
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

  // -------------------------------------------- linear text classification

  /** fastText-style linear classifier INFERENCE: logit = bias + the mean
    * of per-token weights looked up through the hashing trick (md5 16-bit
    * bucket mod the weight count — the same codegen digest the samplers
    * use, so an oracle can recompute every score). The weight vector is a
    * plain literal array (train it anywhere); this is the shape of the
    * CCNet/RefinedWeb-style quality-filter models applied at corpus
    * scale: pure Column expressions, no UDF, no shuffle, whole-stage
    * codegen. Empty/blank docs score exactly `bias`. */
  def linearTextScore(text: Column, weights: Seq[Double],
      bias: Double = 0.0): Column = {
    require(weights.nonEmpty, "linearTextScore needs at least one weight")
    val toks = tokens(lower(text))
    val w = array(weights.map(x => lit(x)): _*)
    val contribs = transform(toks, t => element_at(w,
      (graft.operators.Sampling.md5Bucket16(t) % weights.size).cast("int") + 1))
    when(length(trim(text)) === 0, lit(bias)).otherwise(
      lit(bias) + aggregate(contribs, lit(0.0d), (a, x) => a + x) / size(toks))
  }

  /** [[linearTextScore]] through the logistic link: the keep-probability
    * a binary quality filter thresholds on. */
  def linearTextProb(text: Column, weights: Seq[Double],
      bias: Double = 0.0): Column =
    lit(1.0) / (lit(1.0) + exp(-linearTextScore(text, weights, bias)))

  // -------------------------------------------------- sentence segmentation

  private val SentenceEndRe = java.util.regex.Pattern.compile(
    """(?<=[.!?]['")\]»’”]?)\s+""")

  /** Rule-based sentence segmentation: split AFTER a run of `.`/`!`/`?`
    * (plus one optional closing quote/bracket) followed by whitespace —
    * the terminator stays with its sentence. Deliberately dictionary-free
    * (no abbreviation list): deterministic, language-agnostic, and cheap,
    * the right shape for chunk-boundary and per-sentence dedup work where
    * a rare "Dr. Smith" over-split is harmless. Emits (id, sentence_idx,
    * sentence) from one compiled flatMap; blank docs emit nothing. */
  def splitSentencesFlat(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val in = df.select(col(idCol).as("id"), col(textCol).cast("string").as("t"))
    val schema = StructType(Seq(
      in.schema.fields(0),
      StructField("sentence_idx", IntegerType, nullable = false),
      StructField("sentence", StringType, nullable = false)))
    in.flatMap { row =>
      if (row.isNullAt(1)) Iterator.empty
      else {
        val id = row.get(0)
        SentenceEndRe.split(row.getString(1).trim, -1).iterator
          .map(_.trim).filter(_.nonEmpty).zipWithIndex
          .map { case (s, i) => org.apache.spark.sql.Row(id, i, s) }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  // ------------------------------------------------------ mojibake repair

  // Windows-1252's 0x80–0x9F graphic characters (the NON-Latin-1 slots):
  // the reverse map lets a string be re-encoded to the exact byte the
  // broken decoder read
  private val Cp1252Reverse: Map[Char, Byte] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F
  ).map { case (c, b) => c -> b.toByte }

  /** One round of the classic mojibake repair (the core ftfy case): if
    * the WHOLE string re-encodes to Windows-1252 bytes that form strictly
    * valid UTF-8 with at least one multi-byte sequence, that decoding is
    * what the original writer meant ("Ã©" → "é"). Conservative by
    * construction: any unmappable character (CJK, emoji, …) or any
    * byte-sequence error leaves the text untouched. */
  private def repairOnce(s: String): Option[String] = {
    // cheap gate: mojibake needs a UTF-8 lead byte read as Latin-1/1252
    if (!s.exists(c => c >= 'Â' && c <= 'ô')) return None
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x100) bytes(i) = c.toByte
      else Cp1252Reverse.get(c) match {
        case Some(b) => bytes(i) = b
        case None => return None // genuine non-Latin text: never touch
      }
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out.length < s.length) Some(out) else None // real multi-byte seen
    } catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  /** Repair double-encoded text, iterating for stacked mojibake ("Ã©"
    * encoded wrong twice reads "ÃƒÂ©"); bounded rounds, conservative
    * no-op on anything that is not a perfect re-encoding. */
  def fixMojibakeString(s: String, maxRounds: Int = 3): String = {
    var cur = s
    var i = 0
    while (i < maxRounds) {
      repairOnce(cur) match {
        case Some(next) => cur = next; i += 1
        case None => i = maxRounds
      }
    }
    cur
  }

  /** (id, text_fixed, changed) per row — one compiled map. */
  def fixMojibakeFlat(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val in = df.select(col(idCol).as("id"), col(textCol).cast("string").as("t"))
    val schema = StructType(Seq(
      in.schema.fields(0),
      StructField("text_fixed", StringType),
      StructField("changed", BooleanType, nullable = false)))
    in.map { row =>
      val t = if (row.isNullAt(1)) null else row.getString(1)
      val fixed = if (t == null) null else fixMojibakeString(t)
      org.apache.spark.sql.Row(row.get(0), fixed, t != null && fixed != t)
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
