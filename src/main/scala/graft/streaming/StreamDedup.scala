package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for the training-data ingest path: a
  * continuously-arriving corpus deduped by content hash as it lands.
  *
  * Scale shape: `dropDuplicatesWithinWatermark` keeps a key's state only
  * until the watermark passes it, so state size tracks the DEDUP HORIZON
  * (watermark delay x arrival rate), not the stream's lifetime — plain
  * streaming `dropDuplicates` accumulates state forever, the streaming
  * scale-killer. A duplicate arriving after the horizon re-emits; pair with
  * a batch [[graft.operators.Dedup.exact]] compaction downstream when
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
}
