package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate string (edit-distance) self-join — the entity-resolution /
  * fuzzy-dedup primitive a training-data pipeline needs when near-dup keys
  * are SHORT strings (titles, names, URLs) rather than whole documents
  * (where MinHash shingles, [[Dedup]], are the right tool).
  *
  * Returns every pair within Levenshtein distance `maxDist`, exactly: the
  * candidate stage uses q-gram COUNT FILTERING (Gravano et al., VLDB 2001,
  * public), which is complete — `lev(s1, s2) <= k` implies the q-gram bags
  * share at least `max(|s1|, |s2|) - q + 1 - k*q` grams, because one edit
  * disturbs at most `q` grams. Candidates sharing fewer kept grams than
  * that bound cannot be within distance k and are never verified.
  *
  * Scale shape (the 100-TB contract):
  *  - grams ship as (gram, occurrence) keys with id + length only — never
  *    the strings; the verify join re-attaches strings by id;
  *  - ultra-frequent gram keys (posting list > `freqCap`) are dropped
  *    before the self-join — the skew guard — but at most `maxDrop` per
  *    string, and every drop LOWERS that string's count threshold by one,
  *    so completeness is preserved (a dropped gram could have contributed
  *    at most one shared-gram count);
  *  - strings too short (or too drop-depleted) to retain a positive
  *    threshold go through a length-band fallback join (|len1 - len2| <= k
  *    is necessary for lev <= k), so no pair escapes;
  *  - verification is Spark's codegen'd `levenshtein` on the candidate
  *    pairs only, never a cross join.
  */
object FuzzyJoin {

  /** All unordered pairs (id_a < id_b) with `levenshtein <= maxDist`,
    * as (id_a, id_b, dist). */
  def editSelfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2, freqCap: Int = 5000,
      maxDrop: Int = 3): DataFrame = {
    require(maxDist >= 0 && q >= 1 && freqCap >= 1 && maxDrop >= 0)
    val spark = df.sparkSession
    import spark.implicits._

    val docs = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("len", length($"s"))

    // q-gram bag as (gram, occurrence-rank) keys: equal grams within one
    // string get distinct ranks, so an equi-join computes BAG intersection
    // (the form the count-filter lemma needs).
    val grams = docs
      .select($"id", $"len", posexplode(gramsArray($"s", q)).as(Seq("p", "gram")))
      .withColumn("occ",
        row_number().over(Window.partitionBy($"id", $"gram").orderBy($"p")))
      .select($"id", $"len", $"gram", $"occ")

    // skew guard: drop gram keys with oversized postings, at most maxDrop
    // per string; count each string's drops to relax its threshold
    val keyed = grams
      .withColumn("posting", count(lit(1)).over(Window.partitionBy($"gram", $"occ")))
      .withColumn("dropRank", row_number().over(Window.partitionBy($"id")
        .orderBy($"posting".desc, $"gram", $"occ")))
      .withColumn("dropped", $"posting" > freqCap && $"dropRank" <= maxDrop)
    val kept = keyed.filter(!$"dropped").select($"id", $"len", $"gram", $"occ")
    val drops = keyed.groupBy($"id").agg(
      sum(when($"dropped", 1).otherwise(0)).as("d"))

    // a string is low-signal when even a full gram match cannot reach a
    // positive threshold against a same-length partner: route to fallback.
    // Anchored on docs (left join), NOT on the gram rows — strings shorter
    // than q have no grams at all and must land in the fallback set.
    val signal = docs.select($"id", $"len")
      .join(drops, Seq("id"), "left")
      .withColumn("d", coalesce($"d", lit(0L)))
      .withColumn("lowSig",
        $"len" - q + 1 - maxDist * q - $"d" - maxDrop <= lit(0))

    val gramSide = kept.join(signal.select($"id", $"d", $"lowSig"), "id")
      .filter(!$"lowSig")
      .select($"id", $"len", $"d", $"gram", $"occ")

    // count-filter pairs: shared kept grams >= max(len) - q + 1 - k*q - d1 - d2
    val a = gramSide.select($"id".as("id1"), $"len".as("l1"), $"d".as("d1"),
      $"gram", $"occ")
    val b = gramSide.select($"id".as("id2"), $"len".as("l2"), $"d".as("d2"),
      $"gram", $"occ")
    val counted = a.join(b, Seq("gram", "occ"))
      .filter($"id1" < $"id2" && abs($"l1" - $"l2") <= maxDist)
      .groupBy($"id1", $"id2", $"l1", $"l2", $"d1", $"d2")
      .agg(count(lit(1)).as("shared"))
      .filter($"shared" >=
        greatest($"l1", $"l2") - q + 1 - maxDist * q - $"d1" - $"d2")
      .select($"id1", $"id2")

    // fallback: low-signal strings pair with EVERY string in a length band
    // of +-k (each low-signal string fans out to 2k+1 band keys)
    val lowIds = signal.filter($"lowSig").select($"id", $"len")
    val bandProbe = lowIds.select($"id".as("id1"), $"len".as("l1"),
      explode(sequence($"len" - maxDist, $"len" + maxDist)).as("band"))
    val bandBuild = docs.select($"id".as("id2"), $"len".as("band"))
    val fallback = bandProbe.join(bandBuild, "band")
      .filter($"id1" =!= $"id2")
      .select(least($"id1", $"id2").as("id1"), greatest($"id1", $"id2").as("id2"))

    val candidates = counted.union(fallback).distinct()

    // verify: re-attach strings by id, keep true matches only
    candidates
      .join(docs.select($"id".as("id1"), $"s".as("s1")), "id1")
      .join(docs.select($"id".as("id2"), $"s".as("s2")), "id2")
      .withColumn("dist", levenshtein($"s1", $"s2"))
      .filter($"dist" <= maxDist)
      .select($"id1".as("id_a"), $"id2".as("id_b"), $"dist")
  }

  /** Character q-grams of `s` in order (empty for strings shorter than q). */
  private[operators] def gramsArray(s: Column, q: Int): Column =
    when(length(s) < q, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s) - (q - 1)),
        i => s.substr(i, lit(q))))
}
