package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling + test-set decontamination for the training-data
  * pipeline surface. Everything here is hash-derived, NOT RNG-derived:
  * reproducible across runs, task retries, and engines — a requirement for
  * auditable training mixtures (and what makes the operators
  * oracle-checkable in DuckDB).
  */
object Sampling {

  /** 16-bit bucket of md5(key) via nibble arithmetic — portable to any
    * engine with md5 and string functions (the DuckDB oracle runs the
    * identical formula, digit by digit). */
  def md5Bucket16(key: Column): Column = {
    def nib(k: Int): Column =
      instr(lit("0123456789abcdef"), substring(md5(key), k, 1)) - 1
    nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)
  }

  /** Deterministic hash sample: keep rows whose md5 bucket of `keyCol`
    * falls below `rate` * 65536. A pure per-row filter — no shuffle, no RNG
    * seed plumbing, stable under retries and across engines; the sampled
    * set for a given key population never changes. Rate granularity is
    * 1/65536. */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate $rate outside [0, 1]")
    df.filter(md5Bucket16(keyCol.cast("string")) < math.round(rate * 65536).toInt)
  }

  /** Capped stratified sample: at most `maxPerStratum` rows per stratum,
    * chosen deterministically in md5 order of the key (key string as the
    * total tie-break). The partitioned window sorts and spills — a skewed
    * stratum never materializes in memory, the same shape as the capped
    * near-dup buckets. */
  def stratifiedCap(df: DataFrame, strataCol: Column, keyCol: Column,
      maxPerStratum: Int): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(keyCol.cast("string")), keyCol.cast("string"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerStratum)
      .drop("__rn")
  }

  /** Test-set decontamination: drop every training document that shares ANY
    * `n`-word shingle with the benchmark corpus (the standard n-gram-overlap
    * decontamination rule for LLM training data).
    *
    * Scale shape: the benchmark side is distinct-shingled and BROADCAST
    * (benchmark suites are thousands of documents; the training corpus is
    * the 100 TB side). The training side shingles per-row with the array-HOF
    * form — NOT [[Dedup.shingleRows]], whose window would shuffle the whole
    * corpus before the probe — so contamination detection is a map-side hash
    * probe and only the (tiny) contaminated id set shuffles for the final
    * anti-join on the doc id.
    *
    * Cost note: the array-HOF shingle evaluates interpreted (~2x the wall
    * time of the window-based [[Dedup.shingleRows]] at fixture scale) —
    * accepted, because the window form would SHUFFLE the full corpus before
    * the probe, which loses at 100 TB where shuffle, not CPU, is the
    * bottleneck. */
  def decontaminate(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 3): DataFrame = {
    // no array_distinct: the broadcast probe + id distinct dedup anyway, and
    // the per-doc distinct is another interpreted O(shingles^2) HOF pass
    def shingled(df: DataFrame, id: String, text: String): DataFrame =
      df.select(col(id).as("id"),
        explode(Dedup.shingles(Dedup.tokens(col(text)), n)).as("s"))
    val benchShingles = broadcast(
      shingled(bench, benchIdCol, benchTextCol).select(col("s")).distinct())
    val contaminated = shingled(train, idCol, textCol)
      .join(benchShingles, Seq("s"))
      .select(col("id").as(idCol)).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }
}
