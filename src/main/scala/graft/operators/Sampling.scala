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

  /** 16-bit bucket of md5(key) — the native codegen expression
    * ([[graft.functions.Md5Bucket16Expr]]: one digest, no hex string).
    * Bit-identical to [[md5Bucket16Portable]], the nibble-arithmetic form
    * every DuckDB oracle replays digit by digit (spec-asserted). */
  def md5Bucket16(key: Column): Column =
    graft.functions.Md5Bucket16Expr(key)

  /** The cross-engine-portable column form of [[md5Bucket16]] (md5 hex +
    * string functions only) — kept as the executable specification of the
    * hash the oracles reproduce. */
  def md5Bucket16Portable(key: Column): Column = {
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

  /** Deterministic mixture sampling: per-row keep decision by md5 bucket
    * against a PER-ROW rate — the source-weighting step that rebalances a
    * corpus toward target proportions (e.g. upweight books, downsample
    * crawl). `rateCol` typically joins in from a small weights table keyed
    * by source. Map-side only: no shuffle, no RNG, stable under retries,
    * and nested across rates (a 0.25 sample is a subset of the 0.5 sample
    * for the same keys). */
  def mixtureSample(df: DataFrame, keyCol: Column, rateCol: Column): DataFrame =
    df.filter(md5Bucket16(keyCol.cast("string")) < (rateCol * 65536).cast("int"))

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
    * Cost note: the per-row shingle runs through [[shingledFlat]] (compiled
    * flatMap) rather than the window-based [[Dedup.shingleRows]] — the
    * window form would SHUFFLE the full corpus before the probe, which
    * loses at 100 TB where shuffle, not CPU, is the bottleneck. */
  def decontaminate(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 3): DataFrame = {
    val benchShingles = broadcast(
      shingled(bench, benchIdCol, benchTextCol, n).select(col("s")).distinct())
    val contaminated = shingledFlat(train, idCol, textCol, n)
      .join(benchShingles, Seq("s"))
      .select(col("id").as(idCol)).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  // no array_distinct: the probe + id distinct dedup anyway, and the per-doc
  // distinct is another interpreted O(shingles^2) HOF pass
  private def shingled(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    df.select(col(id).as("id"),
      explode(Dedup.shingles(Dedup.tokens(col(text)), n)).as("s"))

  /** Same rows as [[shingled]], but through a typed `flatMap`: the shingle
    * loop runs as ONE compiled JVM lambda ([[Dedup.shingleStringsOf]])
    * instead of the interpreted `transform`/`slice`/`concat_ws` HOF chain
    * (array HOFs never enter whole-stage codegen, every element evaluates
    * down the expression-tree interpreter). Measured: q58 4.5 s -> 1.1 s
    * warm at sf0.1 local[32]. Still a pure map-side op — no shuffle,
    * streams per-partition, column pruning unaffected (the select precedes
    * it). */
  private def shingledFlat(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val in = df.select(col(id).as("id"), col(text).cast("string").as("s"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      in.schema.fields(0),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    in.flatMap { row =>
      val docId = row.get(0)
      Dedup.shingleStringsOf(row.getString(1), n).iterator
        .map(s => org.apache.spark.sql.Row(docId, s))
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** [[decontaminate]] with a Bloom prefilter: the benchmark shingle set is
    * aggregated into a Bloom filter (Spark's `bloom_filter_agg`, one
    * distributed pass), the training side probes it MAP-SIDE with the native
    * `BloomFilterMightContain` predicate, and only probable hits reach the
    * exact shingle join — correctness stays exact because Bloom filters have
    * no false negatives (a row that fails the probe provably shares no
    * shingle) and false positives are eliminated by the exact join.
    *
    * Scale: the filter is ~`-ln(fpp)/ln(2)^2` bits per expected shingle
    * (~7.3 bits at the 3 % default) vs the hundreds of bits a broadcast hash
    * relation costs per entry, so a 10 M-shingle benchmark suite probes from
    * a ~9 MB plan literal instead of a multi-GB broadcast; at the default
    * false-positive rate 97 % of clean corpus shingles skip the join
    * entirely. Both sides hash with SQL `xxhash64` (seed 42), so build and
    * probe agree by construction. */
  def decontaminateBloom(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 3, expectedShingles: Long = 1000000L,
      fpp: Double = 0.03): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp $fpp outside (0, 1)")
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64, Literal => CLit}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    // persisted: scanned by the bloom build (an eager .head job) and again
    // by the exact verify join — benchmark suites are the small side
    val benchSh = shingled(bench, benchIdCol, benchTextCol, n)
      .select(col("s")).distinct().transform(ScaleToolkit.cached)
    val numBits = math.max(64L,
      math.ceil(-expectedShingles * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // bloom_filter_agg lives in the INTERNAL function registry (it exists
    // for the optimizer's runtime join filters), so build the aggregate
    // expression directly rather than through SQL resolution
    val bfRow = benchSh
      .agg(GraftColumnBridge.column(
        new BloomFilterAggregate(
          XxHash64(Seq(GraftColumnBridge.expression(col("s"))), 42L),
          CLit.create(expectedShingles, org.apache.spark.sql.types.LongType),
          CLit.create(numBits, org.apache.spark.sql.types.LongType))
          .toAggregateExpression()))
      .head()
    if (bfRow.isNullAt(0)) return train // empty benchmark: nothing to drop
    val bloom = bfRow.getAs[Array[Byte]](0)
    val probe = GraftColumnBridge.column(BloomFilterMightContain(
      CLit.create(bloom, org.apache.spark.sql.types.BinaryType),
      XxHash64(Seq(GraftColumnBridge.expression(col("s"))), 42L)))
    val contaminated = shingledFlat(train, idCol, textCol, n)
      .filter(probe)
      .join(broadcast(benchSh), Seq("s"))
      .select(col("id").as(idCol)).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Balanced shard export for training data: write `df` as parquet with
    * every output file holding at most `rowsPerShard` rows and rows routed
    * to files DETERMINISTICALLY (xxhash64 of `keyCol` mod the shard-task
    * count — a full 64-bit key space, so writer parallelism never caps at
    * the 65,536 distinct values an md5-bucket route would allow and the
    * modulo bias at large task counts is negligible), so re-running the
    * export reproduces byte-stable shard membership regardless of upstream
    * partitioning or AQE decisions.
    *
    * Scale shape: one hash exchange on the shard key, then each task
    * writes its shards sequentially with the engine's own
    * `maxRecordsPerFile` rotation (no per-file task, no driver loop). Task
    * count = ceil(expectedRows / rowsPerShard / filesPerTask) so a 100 TB
    * export fans out to thousands of writers; `expectedRows` is a hint,
    * not a correctness input — underestimating only makes files rotate
    * more often within a task. */
  def writeShards(df: DataFrame, keyCol: Column, outDir: String,
      rowsPerShard: Long, expectedRows: Long, filesPerTask: Int = 4): Unit = {
    require(rowsPerShard > 0 && expectedRows >= 0 && filesPerTask > 0,
      s"bad shard sizing: rowsPerShard=$rowsPerShard expectedRows=$expectedRows")
    val tasks = math.max(1L,
      expectedRows / (rowsPerShard * filesPerTask)).toInt
    df.withColumn("__shard_task", pmod(xxhash64(keyCol.cast("string")), lit(tasks)))
      .repartition(tasks, col("__shard_task"))
      .drop("__shard_task")
      .write.option("maxRecordsPerFile", rowsPerShard)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(outDir)
  }

  /** Approximate sequence packing for training-example assembly: documents
    * are hash-sharded deterministically (md5 bucket of the key, mod
    * `shards`), ordered by key within each shard, and assigned
    * `bin = floor(exclusive-prefix-token-sum / maxTokensPerBin)`. A bin may
    * overrun its token budget by at most one document — the standard
    * relaxation (t5-style packing-by-position) that keeps assignment fully
    * relational: one sort-based window per shard, no sequential driver
    * state, reproducible under retries.
    *
    * Scale shape: the only exchange is the shard hash partitioning; each
    * shard's window sorts and spills. Size `shards` to a few times the
    * cluster's core count so shard cumsums stay parallel — bin ids are
    * local to a shard, so shard count changes bin GROUPING, never
    * correctness of the token bound. Adds `shard`, `bin` columns. */
  def packSequences(df: DataFrame, keyCol: Column, tokenCountCol: Column,
      maxTokensPerBin: Long, shards: Int): DataFrame = {
    require(maxTokensPerBin > 0 && shards > 0,
      s"maxTokensPerBin $maxTokensPerBin / shards $shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", md5Bucket16(keyCol.cast("string")) % shards)
      .withColumn("__cum", coalesce(sum(tokenCountCol).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum div $maxTokensPerBin"))
      .drop("__cum")
  }

  /** Curriculum bucket assignment: k difficulty tiers by exact quantile
    * thresholds of `scoreCol` (e.g. token count for a short-to-long
    * curriculum, or an LM quality score) — bucket b contains rows above
    * exactly b of the k-1 thresholds, so tiers are equal-mass up to score
    * ties. Thresholds are ONE sort-based percentile aggregate collected to
    * the driver (k-1 doubles); assignment is per-row expressions over those
    * literals. The percentile aggregate holds one group — at 100 TB switch
    * `exact = false` for the t-digest sketch (same pattern as corpus
    * stats). Adds `bucket`. */
  def curriculumBuckets(df: DataFrame, scoreCol: String, k: Int,
      exact: Boolean = true): DataFrame = {
    require(k >= 2, s"need at least 2 buckets, got $k")
    val qs = (1 until k).map(i => i.toDouble / k)
    val fn = if (exact) "percentile" else "approx_percentile"
    val row = df
      .agg(org.apache.spark.sql.functions.expr(
        s"$fn(CAST($scoreCol AS DOUBLE), array(${qs.mkString(", ")}))"))
      .head()
    // all-null / empty input makes the percentile aggregate NULL — raise a
    // directed error instead of an NPE deep in getSeq
    if (row.isNullAt(0))
      throw new IllegalArgumentException(
        s"curriculumBuckets: no non-null '$scoreCol' values to derive quantile thresholds from")
    val thresholds = row.getSeq[Double](0)
    df.withColumn("bucket",
      thresholds.map(t => when(col(scoreCol).cast("double") > t, 1).otherwise(0))
        .reduce(_ + _))
  }

  /** DSIR importance weight (Xie et al. 2023, arXiv:2302.03169 §3): score
    * each raw document by the log-likelihood ratio between a TARGET
    * distribution (the domain you want more of) and the RAW distribution,
    * both estimated over hashed token buckets (Laplace-smoothed). Sampling
    * proportionally to these weights reshapes the corpus toward the target
    * domain — the principled version of source-mixture upweighting.
    *
    * Scale shape: both distributions are `buckets`-row aggregates with
    * map-side combine; totals derive from those same tiny tables (the
    * corpus is scanned once per side). The per-doc score joins per-doc
    * bucket counts to the broadcast `buckets`-row log-ratio table — no
    * corpus-sized shuffle beyond the (id, bucket) count agg, and the sum
    * is over counts*ratio (≤ `buckets` terms/doc), the form the oracle
    * reproduces exactly. Returns (id, n_toks, dsir). */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, buckets: Int = 64): DataFrame = {
    require(buckets > 0 && buckets <= 65536, s"buckets $buckets outside (0, 65536]")
    def bucketed(in: DataFrame, text: String): DataFrame = in
      .select(explode(Dedup.tokens(col(text).cast("string"))).as("w"))
      .filter(col("w") =!= "")
      .select((md5Bucket16(col("w")) % buckets).as("b"))
    // r19 note: a fanOut + persist of `db` was measured here and REJECTED —
    // min-of-N interleaved A/B read 0.87 -> 1.41 s at sf0.1 (the token-level
    // md5 bucket hash is too cheap to repay a repartition shuffle plus cache
    // materialization of the (id, bucket, count) frame)
    val db = df
      .select(col(idCol).as("id"),
        explode(Dedup.tokens(col(textCol).cast("string"))).as("w"))
      .filter(col("w") =!= "")
      .select(col("id"), (md5Bucket16(col("w")) % buckets).as("b"))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("c"))
    val cr = db.groupBy(col("b")).agg(sum(col("c")).as("cr"))
    val ct = bucketed(target, targetTextCol)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    // totals roll up from the bucket tables — no second corpus scan
    val nt = ct.agg(sum(col("ct")).as("nt"))
    val nr = cr.agg(sum(col("cr")).as("nr"))
    val lr = cr.join(ct, Seq("b"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + 1L).cast("double")
            / (col("nt") + buckets).cast("double"))
          - log((col("cr") + 1L).cast("double")
            / (col("nr") + buckets).cast("double"))).as("lr"))
    db.join(broadcast(lr), Seq("b"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_toks"),
        round(sum(col("c").cast("double") * col("lr")), 6).as("dsir"))
  }
}
