package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming deduplication for the training-data ingest path: a
  * continuously-arriving corpus deduped as it lands — exact (content hash)
  * and near-duplicate (MinHash band keys).
  *
  * Scale shape: `dropDuplicatesWithinWatermark` keeps a key's state only
  * until the watermark passes it, so state size tracks the DEDUP HORIZON
  * (watermark delay x arrival rate), not the stream's lifetime — plain
  * streaming `dropDuplicates` accumulates state forever, the streaming
  * scale-killer. A duplicate arriving after the horizon re-emits; pair with
  * a batch [[graft.operators.Dedup]] compaction downstream when
  * whole-corpus exactness is required.
  */
object StreamDedup {

  /** Dedup `df` by md5(textCol). Streaming frames use watermarked bounded
    * state; batch frames take the plain exact-dedup path, so stream ==
    * batch on bounded input. The output carries `content_hash`. */
  def dedupExact(df: DataFrame, textCol: String, tsCol: String,
      watermarkDelay: String): DataFrame = {
    val hashed = df.withColumn("content_hash", md5(col(textCol)))
    if (df.isStreaming)
      hashed.withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark("content_hash")
    else hashed.dropDuplicates("content_hash")
  }

  /** One row per (doc, band): the doc's MinHash band keys, computed per-row
    * (the array-HOF signature — no shuffle, so it streams). Columns:
    * idCol, tsCol, band, bucket. */
  def bandKeyRows(df: DataFrame, idCol: String, textCol: String, tsCol: String,
      numHashes: Int = 8, bands: Int = 4, shingleSize: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = Dedup.md5MinhashSignature(col(textCol), numHashes, shingleSize)
    df.select(col(idCol), col(tsCol), sig.as("__sig"))
      .select(col(idCol), col(tsCol),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            Dedup.md5BandKey(col("__sig"), b, rowsPerBand).as("bucket"))): _*))
          .as("bk"))
      .select(col(idCol), col(tsCol), col("bk.band").as("band"),
        col("bk.bucket").as("bucket"))
  }

  /** Near-dup dedup core: first-seen filter over MinHash band buckets.
    * Streaming: watermarked `dropDuplicatesWithinWatermark` per (band,
    * bucket) — state bounded by the dedup horizon, exactly like
    * [[dedupExact]]. Batch: the order-deterministic equivalent (first row
    * per bucket by `tsCol`, id as tie-break), so stream == batch when
    * arrival order follows event time.
    *
    * Returns the SURVIVING band rows; [[novelDocs]] completes the per-doc
    * decision (typically inside `foreachBatch`, where every band row of a
    * doc sits in the same micro-batch). */
  def dedupNearMinhash(df: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermarkDelay: String, numHashes: Int = 8,
      bands: Int = 4, shingleSize: Int = 3): DataFrame = {
    val banded = bandKeyRows(df, idCol, textCol, tsCol, numHashes, bands, shingleSize)
    if (df.isStreaming)
      banded.withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark("band", "bucket")
    else {
      val w = Window.partitionBy(col("band"), col("bucket"))
        .orderBy(col(tsCol), col(idCol))
      banded.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }

  /** Per-doc completion of [[dedupNearMinhash]]: a doc is novel iff EVERY
    * one of its band buckets was first-seen (any colliding band means a
    * same-bucket doc arrived earlier within the horizon — the LSH
    * candidate-duplicate signal). Run inside `foreachBatch` on the
    * streaming side (a micro-batch always carries a doc's full band set) or
    * directly on the batch side. Emitted docs are LSH-candidate-novel; for
    * threshold-exact semantics verify the flagged (non-novel) docs against
    * the kept corpus with [[graft.operators.Dedup.jaccardVerify]]. */
  def novelDocs(bandSurvivors: DataFrame, idCol: String, bands: Int = 4): DataFrame =
    bandSurvivors.groupBy(col(idCol))
      .agg(count(lit(1)).as("__nBands"))
      .filter(col("__nBands") === bands)
      .select(col(idCol))
}
