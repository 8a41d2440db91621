package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Download ledger (the reference's manifest, weather_dl/download_pipeline/
  * manifest.py): an append-only table of status transitions with stage
  * timestamps. BQManifest appends rows and derives current state by latest
  * timestamp (manifest.py:452-482); here the ledger is an append-only parquet
  * table (Delta-style semantics without the dependency) and the "current
  * state" view is a window dedup — exactly the §2.7 latest-row pattern.
  */
object Manifest {

  object Status {
    val Scheduled = "scheduled"
    val InProgress = "in-progress"
    val Success = "success"
    val Failure = "failure"
    val Skipped = "skipped"
  }
  object Stage {
    val Fetch = "fetch"
    val Download = "download"
    val Retrieve = "retrieve"
    val Upload = "upload"
  }

  final case class Record(
      configName: String,
      location: String,          // target URI — the ledger key
      user: String,
      status: String,
      stage: String,
      error: String,
      selectionJson: String,
      sizeBytes: Long,
      eventTimeUs: Long)         // microsecond epoch of the transition

  /** Append transitions (append-only, manifest.py:452-456). */
  def append(spark: SparkSession, path: String, records: Seq[Record]): Unit = {
    import spark.implicits._
    records.toDF().write.mode(SaveMode.Append).parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Current state per location: latest transition wins (ties broken by an
    * explicit terminal-state rank so a terminal state beats a concurrent
    * schedule — raw string ordering would sort 'failure' BELOW 'in-progress'
    * and mask a same-microsecond failure). */
  def currentState(ledger: DataFrame): DataFrame = {
    val terminalRank = when(
      col("status").isin(Status.Success, Status.Failure, Status.Skipped), 1).otherwise(0)
    val w = Window.partitionBy(col("location"))
      .orderBy(col("eventTimeUs").desc, terminalRank.desc, col("status").desc)
    ledger.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Locations whose latest state is a terminal success — the skip-existing
    * feed for Partitioner.skipExisting (P8). */
  def succeeded(ledger: DataFrame): DataFrame =
    currentState(ledger)
      .filter(col("status") === Status.Success)
      .select(col("location").as("target"))

  /** `transact` analog (manifest.py:231-398): run `body` for one partition,
    * appending in-progress then success/failure records with timings. */
  def transact[T](spark: SparkSession, path: String, configName: String,
      location: String, user: String, selectionJson: String)(body: => T): Either[Throwable, T] = {
    val t0 = System.currentTimeMillis() * 1000L
    append(spark, path, Seq(Record(configName, location, user,
      Status.InProgress, Stage.Fetch, "", selectionJson, 0L, t0)))
    try {
      val out = body
      append(spark, path, Seq(Record(configName, location, user,
        Status.Success, Stage.Upload, "", selectionJson, 0L,
        System.currentTimeMillis() * 1000L)))
      Right(out)
    } catch {
      case e: Throwable =>
        append(spark, path, Seq(Record(configName, location, user,
          Status.Failure, Stage.Fetch, String.valueOf(e.getMessage), selectionJson, 0L,
          System.currentTimeMillis() * 1000L)))
        Left(e)
    }
  }
}
