package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's "a table is a URI" model (xql has no catalog; a
  * session alias maps a name to a store, xql/src/xql/apply.py:225-242): every
  * loader takes the scale-factor directory and resolves `<dir>/<name>.parquet`.
  *
  * `events.ts` is TIMESTAMP(NANOS) in parquet. Spark's type system stops at
  * microseconds, so the session reads it as a long (`nanosAsLong`) and we
  * expose BOTH:
  *   - `ts_ns` — exact nanosecond epoch (use for ordering / equality against
  *     DuckDB's `epoch_ns(ts)`),
  *   - `ts`   — microsecond-truncated TimestampType (use for bucketing; any
  *     `date_trunc` coarser than microseconds is lossless vs the oracle).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(dir, name))
    name match {
      case "events" =>
        df.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table as a temp view (the `.set` alias catalog analog,
    * xql/src/xql/apply.py:367-386) so `spark.sql` works against plain names. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
