package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graft.StreamingBatch
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.sources.{DeltaTable, IcebergTable}

/** Delta and Iceberg tables as NATIVE Structured Streaming sources — the
  * [[TableFollow]] poll loop lifted into the engine's own micro-batch
  * machinery, so table increments compose with watermarks, stream-stream
  * joins, and stateful operators instead of living in a callback:
  *
  * {{{
  * spark.readStream
  *   .format("graft.streaming.DeltaStreamSource")   // or IcebergStreamSource
  *   .option("path", "/data/my_table")
  *   .option("mode", "files")                       // delta: files | cdf
  *   .load()                                        // iceberg: files | changelog
  * }}}
  *
  * Offsets ARE the table cursors (Delta version / Iceberg snapshot id),
  * checkpointed and recovered by Spark itself — restart continuity and
  * exactly-once sink pairing come from the engine, not hand-rolled
  * cursor files. `getOffset` is the same metadata-only probe the poll
  * loop uses (one log listing / one metadata-json read per trigger);
  * `getBatch` serves [[DeltaTable.readChanges]]/[[DeltaTable.readCdf]]/
  * [[IcebergTable.readAppended]]/[[IcebergTable.readChangelog]] over the
  * offset range — batches replay deterministically because table
  * versions are immutable.
  *
  * Initial batch semantics match [[TableFollow]]: `files` mode serves
  * the full snapshot at the first offset; the row-level modes (`cdf`,
  * `changelog`) start EMPTY at the current cursor — change feeds consume
  * changes, not history. */
private[streaming] abstract class TableSource(spark: SparkSession)
    extends Source {
  /** The cursor at `offset`-json granularity (LongOffset on the live
    * path, SerializedOffset after checkpoint recovery — both carry the
    * number in their json form). */
  protected def cursor(o: Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame =
    StreamingBatch.asStreaming(batch(start.map(cursor), cursor(end)))

  protected def batch(start: Option[Long], end: Long): DataFrame

  override def stop(): Unit = {}
}

/** `spark.readStream.format("graft.streaming.DeltaStreamSource")`.
  * Options: `path` (table root, required); `mode` = `files` (default —
  * whole newly-active files via readChanges, initial batch = the full
  * snapshot) or `cdf` (the row-level change feed via readCdf, initial
  * batch empty; requires `delta.enableChangeDataFeed`);
  * `ignoreChanges` (files mode) — a commit that REWRITES files
  * (dataChange removes) would re-serve every row of the rewritten files
  * and drop the deletes, so it is a directed error unless this opt-in is
  * set, matching delta-spark's own streaming contract. Use `cdf` mode
  * for row-level correctness over updating tables. */
class DeltaStreamSource extends StreamSourceProvider with DataSourceRegister {
  import DeltaStreamSource._

  override def shortName(): String = "graft-delta"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), schemaFor(ctx.sparkSession, tableOf(parameters),
      modeOf(parameters)))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = ctx.sparkSession
    val table = tableOf(parameters)
    val mode = modeOf(parameters)
    val ignoreChanges = parameters.get("ignoreChanges")
      .exists(_.equalsIgnoreCase("true"))
    val srcSchema = schemaFor(spark, table, mode)
    new TableSource(spark) {
      override def schema: StructType = srcSchema
      override def getOffset: Option[Offset] =
        try Some(LongOffset(DeltaTable.latestVersion(spark, table)))
        catch { case _: DeltaTable.UnsupportedDelta => None }
      override protected def batch(start: Option[Long],
          end: Long): DataFrame = (mode, start) match {
        case ("files", None) =>
          DeltaTable.read(spark, table, versionAsOf = Some(end))
        case ("files", Some(s)) =>
          // a rewrite in the range would re-serve unchanged rows and
          // drop deletes — directed unless the caller opted in
          // (delta-spark's own streaming contract)
          if (!ignoreChanges &&
            DeltaTable.rangeHasDataChangeRemoves(spark, table, s, end))
            throw new IllegalStateException(
              s"$table: versions ${s + 1}..$end remove data files — " +
                "files-mode streaming would re-serve rewritten rows. " +
                "Set option(\"ignoreChanges\", \"true\") to accept " +
                "duplicates, or use option(\"mode\", \"cdf\") for " +
                "row-level changes")
          DeltaTable.readChanges(spark, table, s, Some(end))
        case ("cdf", s) =>
          // None = the empty baseline feed at `end` (history never serves)
          DeltaTable.readCdf(spark, table, s.getOrElse(end) + 1, Some(end))
      }
    }
  }
}

private object DeltaStreamSource {
  def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", parameters.getOrElse("table",
      throw new IllegalArgumentException(
        "graft-delta stream needs option(\"path\", <table root>)")))

  def modeOf(parameters: Map[String, String]): String =
    parameters.getOrElse("mode", "files") match {
      case m @ ("files" | "cdf") => m
      case other => throw new IllegalArgumentException(
        s"graft-delta stream mode '$other' (files/cdf only)")
    }

  def schemaFor(spark: SparkSession, table: String,
      mode: String): StructType = {
    // metadata-only: the log's schemaString IS a StructType json — no
    // snapshot assembly at stream-construction time
    val base = org.apache.spark.sql.types.DataType
      .fromJson(DeltaTable.snapshotInfo(spark, table)._2)
      .asInstanceOf[StructType]
    if (mode == "files") base
    else StructType(base.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType),
      StructField("_commit_timestamp", TimestampType)))
  }
}

/** `spark.readStream.format("graft.streaming.IcebergStreamSource")`.
  * Options: `path` (table root, required); `mode` = `files` (default —
  * newly-active files via readAppended, initial batch = the full
  * snapshot) or `changelog` (row-level net insert/delete rows via
  * readChangelog, initial batch empty); `ignoreChanges` (files mode) —
  * a non-append snapshot in the range (overwrite/delete/replace) would
  * re-serve rewritten files' rows, so it is a directed error unless the
  * opt-in is set; use `changelog` mode for row-level correctness. */
class IcebergStreamSource extends StreamSourceProvider with DataSourceRegister {
  import IcebergStreamSource._

  override def shortName(): String = "graft-iceberg"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), schemaFor(ctx.sparkSession, tableOf(parameters),
      modeOf(parameters)))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = ctx.sparkSession
    val table = tableOf(parameters)
    val mode = modeOf(parameters)
    val ignoreChanges = parameters.get("ignoreChanges")
      .exists(_.equalsIgnoreCase("true"))
    val srcSchema = schemaFor(spark, table, mode)
    new TableSource(spark) {
      override def schema: StructType = srcSchema
      override def getOffset: Option[Offset] =
        IcebergTable.currentSnapshotId(spark, table).map(LongOffset(_))
      override protected def batch(start: Option[Long],
          end: Long): DataFrame = (mode, start) match {
        case ("files", None) =>
          IcebergTable.read(spark, table, Some(end))
        case ("files", Some(s)) =>
          val ops = IcebergTable.rangeOperations(spark, table, s, end)
          // an ABSENT summary.operation is treated as unsafe too — a
          // snapshot of unknown kind must not silently pass the guard
          if (!ignoreChanges && ops.exists(_ != "append"))
            throw new IllegalStateException(
              s"$table: the range after snapshot $s contains " +
                s"non-append snapshots (${ops.distinct.mkString(", ")}) — " +
                "files-mode streaming would re-serve rewritten rows. Set " +
                "option(\"ignoreChanges\", \"true\") to accept " +
                "duplicates, or use option(\"mode\", \"changelog\")")
          IcebergTable.readAppended(spark, table, s, Some(end))
        case ("changelog", s) =>
          // None = the empty baseline changelog at `end`
          IcebergTable.readChangelog(spark, table, s.getOrElse(end), Some(end))
      }
    }
  }
}

private object IcebergStreamSource {
  def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", parameters.getOrElse("table",
      throw new IllegalArgumentException(
        "graft-iceberg stream needs option(\"path\", <table root>)")))

  def modeOf(parameters: Map[String, String]): String =
    parameters.getOrElse("mode", "files") match {
      case m @ ("files" | "changelog") => m
      case other => throw new IllegalArgumentException(
        s"graft-iceberg stream mode '$other' (files/changelog only)")
    }

  def schemaFor(spark: SparkSession, table: String,
      mode: String): StructType = {
    // metadata-json only — no manifest replay at stream construction
    val base = IcebergTable.tableSchema(spark, table)
    if (mode == "files") base
    else StructType(base.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_snapshot_id", LongType)))
  }
}
