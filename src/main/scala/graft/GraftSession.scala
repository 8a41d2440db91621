package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so Verify / Bench / tests share one config.
  *
  * Settings that matter for oracle parity and local-mode throughput:
  *  - UTC session timezone (naive timestamps are UTC in the reference:
  *    weather_mv/loader_pipeline/util.py:115-120).
  *  - `nanosAsLong`: the driver-generated `events.parquet` carries
  *    TIMESTAMP(NANOS) which Spark cannot represent natively; we read it as
  *    a nanosecond epoch long and derive microsecond timestamps where needed.
  *  - shuffle partitions sized to the local core count, AQE on (coalesces
  *    post-shuffle partitions; at cluster scale it also handles skew joins).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", math.max(cores, 4)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply the graft runtime confs to an externally built session (the
    * driver's Verify/Bench sessions call this so contract files stay thin). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark
  }
}
