package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate string (edit-distance) self-join — the entity-resolution /
  * fuzzy-dedup primitive a training-data pipeline needs when near-dup keys
  * are SHORT strings (titles, names, URLs) rather than whole documents
  * (where MinHash shingles, [[Dedup]], are the right tool).
  *
  * Returns every pair within Levenshtein distance `maxDist`, exactly. The
  * candidate stage is PREFIX FILTERING over positional q-gram bags (the
  * Ed-Join scheme, Xiao/Wang/Lin VLDB 2008, public): one edit disturbs at
  * most `q` grams, so two strings within distance k share all but at most
  * `k*q` of the longer bag — and by the prefix-filter lemma their
  * `k*q + 1` globally RAREST gram keys (rarest-first is the classic
  * frequency ordering) must intersect. Only those prefix keys join, so
  * frequent grams ("th", "e ") never drive the candidate join unless a
  * string consists of nothing else.
  *
  * Scale shape (the 100-TB contract):
  *  - gram keys ship with id + length only — never the strings; the verify
  *    join re-attaches strings by id;
  *  - join keys per string are k*q + 1 of its rarest grams, so posting
  *    lists in the candidate join are the SMALL ones by construction —
  *    frequency ordering is the skew guard, not a lossy cap;
  *  - strings too short to carry k*q + 1 grams go through a length-band
  *    fallback join (|len1 - len2| <= k is necessary for lev <= k), so no
  *    pair escapes;
  *  - verification is Spark's codegen'd `levenshtein` on distinct
  *    candidate pairs only, never a cross join.
  */
object FuzzyJoin {

  /** All unordered pairs (id_a < id_b) with `levenshtein <= maxDist`,
    * as (id_a, id_b, dist). */
  def editSelfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0 && q >= 1)
    val spark = df.sparkSession
    import spark.implicits._

    // persisted: the id/key frame is read FIVE times (gram build, short-string
    // fallback probe+build, and both verify-join sides); without the persist
    // every consumer re-runs the upstream scan/projection — and, when the
    // caller feeds a `distinct()` (the corpus form), its full exchange too.
    // Rows are (id, short key, len) — the lightweight-proxy shape §2.3 of the
    // optimization guide says to cache, never the documents themselves.
    val docs = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("len", length($"s"))
      .transform(ScaleToolkit.cached)
    val prefixLen = maxDist * q + 1

    // q-gram bag as (gram-key, occurrence-rank) keys: equal grams within one
    // string get distinct ranks, so matches mean BAG intersection (the
    // form the mismatch-count bound needs). Built with hash aggregations
    // (partial-agg friendly): count per (id, gram key), explode ranks 1..cnt.
    // Persisted: consumed twice (the frequency aggregate and the prefix
    // join probe) — ~q rows per string of (id, len, gk, occ).
    //
    // Gram keys are xxhash64 LONGS, not the gram strings (§2.2/§2.3 narrow
    // keys): every downstream aggregate, window and self-join then hashes /
    // shuffles 8-byte longs instead of q-char strings. This is EXACT, not
    // approximate: the prefix-filter lemma only needs ONE consistent total
    // order over bag elements shared by all strings (posting, gk, occ is
    // one), and a hash collision can only MERGE two grams' bag elements —
    // shared grams stay shared, so the candidate set remains a superset of
    // the true pairs under any key mapping; the codegen'd levenshtein verify
    // below then keeps exactly the true pairs either way.
    val grams = docs
      .select($"id", $"len", explode(gramsArray($"s", q)).as("gram"))
      .select($"id", $"len", xxhash64($"gram").as("gk"))
      .groupBy($"id", $"len", $"gk").agg(count(lit(1)).as("cnt"))
      .select($"id", $"len", $"gk",
        explode(sequence(lit(1), $"cnt")).as("occ"))
      .transform(ScaleToolkit.cached)

    // global key frequencies order each string's grams rarest-first; ties
    // break on (gk, occ) so the order is one total order across strings
    val freq = grams.groupBy($"gk", $"occ").agg(count(lit(1)).as("posting"))
    // persisted: both sides of the candidate self-join scan this frame; the
    // pre-persist plan duplicated the ENTIRE scan→grams→freq-join→window
    // chain once per side (36 Exchanges / 16 scans in the q112 physical plan)
    val prefix = grams.join(freq, Seq("gk", "occ"))
      .withColumn("r", row_number().over(Window.partitionBy($"id")
        .orderBy($"posting", $"gk", $"occ")))
      .filter($"r" <= prefixLen)
      .select($"id", $"len", $"gk", $"occ")
      .transform(ScaleToolkit.cached)

    // candidate pairs: prefix keys intersect + the length bound
    val a = prefix.select($"id".as("id1"), $"len".as("l1"), $"gk", $"occ")
    val b = prefix.select($"id".as("id2"), $"len".as("l2"), $"gk", $"occ")
    val prefixPairs = a.join(b, Seq("gk", "occ"))
      .filter($"id1" < $"id2" && abs($"l1" - $"l2") <= maxDist)
      .select($"id1", $"id2")

    // fallback: strings with fewer than prefixLen grams cannot carry a
    // full prefix — pair them with EVERY string in a +-k length band
    val lowIds = docs.filter($"len" - q + 1 < prefixLen).select($"id", $"len")
    val bandProbe = lowIds.select($"id".as("id1"), $"len".as("l1"),
      explode(sequence($"len" - maxDist, $"len" + maxDist)).as("band"))
    val bandBuild = docs.select($"id".as("id2"), $"len".as("band"))
    val fallback = bandProbe.join(bandBuild, "band")
      .filter($"id1" =!= $"id2")
      .select(least($"id1", $"id2").as("id1"), greatest($"id1", $"id2").as("id2"))

    val candidates = prefixPairs.union(fallback).distinct()

    // verify: re-attach strings by id, keep true matches only; the
    // thresholded levenshtein abandons a pair as soon as the running
    // distance exceeds k (returns -1), so verify cost is O(k * len) per
    // candidate instead of O(len^2)
    candidates
      .join(docs.select($"id".as("id1"), $"s".as("s1")), "id1")
      .join(docs.select($"id".as("id2"), $"s".as("s2")), "id2")
      .withColumn("dist", levenshtein($"s1", $"s2", maxDist))
      .filter($"dist" >= 0)
      .select($"id1".as("id_a"), $"id2".as("id_b"), $"dist")
  }

  /** Character q-grams of `s` in order (empty for strings shorter than q). */
  private[operators] def gramsArray(s: Column, q: Int): Column =
    when(length(s) < q, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s) - (q - 1)),
        i => s.substr(i, lit(q))))
}
