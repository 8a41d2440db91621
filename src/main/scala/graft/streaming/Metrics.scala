package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline metrics (A7/A8, weather_mv/loader_pipeline/metrics.py): the
  * reference tracks element processing-time and data-latency distributions
  * (count/min/max/mean) and flushes them on a processing-time trigger.
  *
  * Spark-native form: `Dataset.observe` attaches the same aggregates to any
  * plan (batch or streaming) at zero extra passes — the metrics ride the
  * normal execution and surface via QueryExecutionListener /
  * StreamingQueryListener. */
object Metrics {

  /** Attach a processing-latency distribution observation to a frame that
    * carries an event-time column (ms epoch vs now = data latency,
    * metrics.py:127-188). */
  def observeLatency(df: DataFrame, tsCol: String, name: String = "graft_metrics"): DataFrame = {
    val latencyMs = (unix_micros(current_timestamp()) - unix_micros(col(tsCol).cast("timestamp"))) / 1000
    df.observe(name,
      count(lit(1)).as("element_count"),
      min(latencyMs).as("data_latency_ms_min"),
      max(latencyMs).as("data_latency_ms_max"),
      avg(latencyMs).as("data_latency_ms_mean"))
  }

  /** Windowed max+mean reduction over collected metric tuples (A8,
    * metrics.py:222-256) — for post-hoc analysis of a metrics table. */
  def windowedSummary(metrics: DataFrame, tsCol: String, valueCol: String,
      windowLength: String = "1 minute"): DataFrame =
    metrics.groupBy(window(col(tsCol), windowLength))
      .agg(max(col(valueCol)).as("max_value"), avg(col(valueCol)).as("mean_value"))
      .select(col("window.start").as("win_start"), col("max_value"), col("mean_value"))
}
