package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming re-expression of the reference's streaming surface.
  *
  * The reference streams *file-arrival events* (Pub/Sub OBJECT_FINALIZE
  * JSON), windows them into 1-minute batches for throughput, and relies on
  * skip-existing idempotence instead of stateful exactly-once
  * (weather_mv/loader_pipeline/streaming.py, SURVEY §2.8). Equivalent here:
  * any streaming DataFrame of `{bucket, name}` JSON bodies -> parse ->
  * pattern filter -> 1-minute windowed groups -> `foreachBatch` sink with an
  * anti-join dedup. Watermarking is added (the Spark-native late-data story
  * the reference lacks).
  */
object FileEvents {

  /** OBJECT_FINALIZE message schema (streaming.py:91-121). */
  val messageSchema: StructType = StructType(Seq(
    StructField("bucket", StringType),
    StructField("name", StringType)))

  /** ParsePaths (ST4): JSON body -> `gs://bucket/name` URI + glob filter
    * (fnmatch ~ SQL LIKE with `*`->`%`, `?`->`_`). Malformed bodies are
    * dropped (the reference logs-and-skips). */
  def parsePaths(messages: DataFrame, bodyCol: String, pattern: String): DataFrame = {
    val likePattern = pattern.replace("%", "\\%").replace("_", "\\_")
      .replace("*", "%").replace("?", "_")
    messages
      .withColumn("msg", from_json(col(bodyCol), messageSchema))
      .filter(col("msg.bucket").isNotNull && col("msg.name").isNotNull)
      .withColumn("uri", concat(lit("gs://"), col("msg.bucket"), lit("/"), col("msg.name")))
      .filter(col("uri").like(likePattern))
      .drop("msg")
  }

  /** ST1/ST2: 1-minute fixed windows on event time with a watermark; counts
    * per window — the streaming analog of Queries.q16. */
  def windowedCounts(stream: DataFrame, tsCol: String,
      windowLength: String = "1 minute", watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))

  /** Idempotent micro-batch ingest (the P8/P9 skip-existing pattern applied
    * per batch): append only keys not already in the sink. Exactly the
    * semantics the reference gets from its existence filters, expressed as a
    * per-batch anti-join. */
  def idempotentAppend(spark: SparkSession, batch: DataFrame, keyCol: String,
      sinkPath: String): Unit = {
    val fresh =
      if (sinkExists(spark, sinkPath)) {
        val existing = spark.read.parquet(sinkPath).select(col(keyCol)).distinct()
        batch.join(broadcast(existing), Seq(keyCol), "left_anti")
      } else batch
    fresh.write.mode("append").parquet(sinkPath)
  }

  /** ST6/ST8: start an idempotent micro-batch ingest of a stream into a
    * parquet sink — `foreachBatch` + anti-join dedup on `keyCol`, fired on a
    * processing-time trigger (the reference's
    * `Repeatedly(AfterProcessingTime(5))`, metrics.py:279-283). */
  def startIdempotentIngest(stream: DataFrame, keyCol: String, sinkPath: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        idempotentAppend(batch.sparkSession, batch.toDF(), keyCol, sinkPath)
      }
      .start()

  private def sinkExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
