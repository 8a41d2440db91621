package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{DeltaTable, IcebergTable}

/** Incremental table consumption — the "process only the new shards"
  * loop every scheduled training-data pipeline runs between passes,
  * wired over [[DeltaTable.readChanges]] / [[IcebergTable.readAppended]]
  * in the foreachBatch shape: each poll reads the table's cursor (a
  * Delta version / an Iceberg snapshot id), serves exactly the rows of
  * files that became active since the last processed cursor, hands them
  * to the caller with the new cursor, and COMMITS the cursor to a
  * checkpoint file only after the caller returns — crash-restart resumes
  * from the last committed cursor, so an increment is never skipped
  * (at-least-once, the foreachBatch contract; pair with an idempotent
  * sink keyed by cursor for exactly-once).
  *
  * Cursor probes are metadata-only (one log listing / one metadata-json
  * read); a tick with no table change costs zero data IO and never calls
  * `process`. The checkpoint commit is tmp+rename — a torn write can't
  * produce a half-cursor. File-granular like every file-based
  * incremental consumer: a compaction rewrite re-surfaces its rows
  * (document upstream or dedup by key downstream). */
object TableFollow {
  final case class FollowError(msg: String) extends RuntimeException(msg)

  /** One increment: rows + the cursor they advance to. */
  final case class Increment(rows: DataFrame, cursor: Long)

  // --------------------------------------------------------- cursor store

  private def readCursor(conf: Configuration, path: String): Option[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val s = graft.sources.FsText.read(fs, p).trim
      s.toLongOption.orElse(throw FollowError(
        s"$path: checkpoint holds '$s', not a cursor"))
    }
  }

  private def writeCursor(conf: Configuration, path: String, v: Long): Unit = {
    val p = new Path(path)
    // ATOMIC overwrite — a delete-then-rename pair has a crash window with
    // NO cursor on disk, which would re-serve the full table as a baseline
    try graft.sources.TableCommit.overwriteText(
      p.getFileSystem(conf), conf, p, v.toString)
    catch {
      case e: java.io.IOException =>
        throw FollowError(s"could not commit cursor $v to $path: $e")
    }
  }

  // -------------------------------------------------------------- pollers

  /** One Delta poll against an explicit cursor (None = never consumed:
    * the full current snapshot is the first increment). None out = no
    * change since `cursor`. */
  def pollDelta(spark: SparkSession, table: String,
      cursor: Option[Long]): Option[Increment] = {
    val latest = DeltaTable.latestVersion(spark, table)
    cursor match {
      case None => Some(Increment(DeltaTable.read(spark, table), latest))
      case Some(v) if latest > v =>
        Some(Increment(DeltaTable.readChanges(spark, table, v, Some(latest)),
          latest))
      case Some(v) if latest < v => throw FollowError(
        s"$table: cursor $v is ahead of the log's latest $latest — " +
          "wrong table or a reset log")
      case _ => None
    }
  }

  /** One Delta poll serving the row-level CHANGE FEED instead of whole
    * new files: the increment is `readCdf(cursor + 1, latest)` — inserts,
    * deletes, and update pre/post images with their commit versions. A
    * None cursor starts at the NEXT commit (change feeds consume changes,
    * not history; seed the cursor explicitly to replay from a version). */
  def pollDeltaCdf(spark: SparkSession, table: String,
      cursor: Option[Long]): Option[Increment] = {
    val latest = DeltaTable.latestVersion(spark, table)
    cursor match {
      case Some(v) if latest < v => throw FollowError(
        s"$table: cursor $v is ahead of the log's latest $latest — " +
          "wrong table or a reset log")
      case Some(v) if latest == v => None // no change: zero-IO tick
      case Some(v) => Some(Increment(
        DeltaTable.readCdf(spark, table, v + 1, Some(latest)), latest))
      case None => // baseline tick: an EMPTY typed feed establishes the
        // cursor at `latest` so only post-subscription changes ever serve
        Some(Increment(
          DeltaTable.readCdf(spark, table, latest + 1, Some(latest)),
          latest))
    }
  }

  /** One Iceberg poll; the cursor is a snapshot id. */
  def pollIceberg(spark: SparkSession, table: String,
      cursor: Option[Long]): Option[Increment] = {
    val current = IcebergTable.currentSnapshotId(spark, table)
    (cursor, current) match {
      case (_, None) => None // never-written table: nothing to serve yet
      case (None, Some(cur)) =>
        Some(Increment(IcebergTable.read(spark, table), cur))
      case (Some(v), Some(cur)) if cur != v =>
        Some(Increment(
          IcebergTable.readAppended(spark, table, v, Some(cur)), cur))
      case _ => None
    }
  }

  /** One Iceberg poll serving the row-level CHANGELOG instead of whole
    * appended files — parity with [[pollDeltaCdf]] for merge-on-read
    * tables where a DV/delete churn would otherwise re-serve entire
    * files. A None cursor starts at the NEXT snapshot (changelogs consume
    * changes, not history): the baseline tick serves an empty typed
    * frame that establishes the cursor at the current snapshot. */
  def pollIcebergChangelog(spark: SparkSession, table: String,
      cursor: Option[Long]): Option[Increment] = {
    val current = IcebergTable.currentSnapshotId(spark, table)
    (cursor, current) match {
      case (_, None) => None // never-written table: nothing to serve yet
      case (None, Some(cur)) => Some(Increment(
        IcebergTable.readChangelog(spark, table, cur, Some(cur)), cur))
      case (Some(v), Some(cur)) if cur != v => Some(Increment(
        IcebergTable.readChangelog(spark, table, v, Some(cur)), cur))
      case _ => None
    }
  }

  // ------------------------------------------------- checkpointed follow

  /** Poll once with a durable cursor: load the checkpoint, serve the
    * increment (if any) to `process(rows, cursor)`, then commit. Returns
    * the increment's cursor, or None when nothing changed. */
  def followDeltaOnce(spark: SparkSession, table: String,
      checkpoint: String)(process: (DataFrame, Long) => Unit): Option[Long] =
    followOnce(spark, checkpoint, c => pollDelta(spark, table, c))(process)

  /** [[followDeltaOnce]] serving the row-level change feed. */
  def followDeltaCdfOnce(spark: SparkSession, table: String,
      checkpoint: String)(process: (DataFrame, Long) => Unit): Option[Long] =
    followOnce(spark, checkpoint,
      c => pollDeltaCdf(spark, table, c))(process)

  /** [[followDeltaOnce]] for Iceberg (cursor = snapshot id). */
  def followIcebergOnce(spark: SparkSession, table: String,
      checkpoint: String)(process: (DataFrame, Long) => Unit): Option[Long] =
    followOnce(spark, checkpoint, c => pollIceberg(spark, table, c))(process)

  /** [[followIcebergOnce]] serving the row-level changelog. */
  def followIcebergChangelogOnce(spark: SparkSession, table: String,
      checkpoint: String)(process: (DataFrame, Long) => Unit): Option[Long] =
    followOnce(spark, checkpoint,
      c => pollIcebergChangelog(spark, table, c))(process)

  private def followOnce(spark: SparkSession, checkpoint: String,
      poll: Option[Long] => Option[Increment])(
      process: (DataFrame, Long) => Unit): Option[Long] = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val cursor = readCursor(conf, checkpoint)
    poll(cursor).map { inc =>
      process(inc.rows, inc.cursor)
      // commit AFTER the caller: a crash mid-process replays the increment
      writeCursor(conf, checkpoint, inc.cursor)
      inc.cursor
    }
  }

  /** Bounded polling loop (tests and scheduled jobs): up to `maxPolls`
    * ticks, `intervalMs` apart, stopping early after `idleStop`
    * consecutive empty ticks when it is positive. Returns the number of
    * increments processed. */
  def followDelta(spark: SparkSession, table: String, checkpoint: String,
      maxPolls: Int, intervalMs: Long = 0L, idleStop: Int = 0)(
      process: (DataFrame, Long) => Unit): Int =
    loop(maxPolls, intervalMs, idleStop)(
      () => followDeltaOnce(spark, table, checkpoint)(process))

  /** [[followDelta]] for Iceberg. */
  def followIceberg(spark: SparkSession, table: String, checkpoint: String,
      maxPolls: Int, intervalMs: Long = 0L, idleStop: Int = 0)(
      process: (DataFrame, Long) => Unit): Int =
    loop(maxPolls, intervalMs, idleStop)(
      () => followIcebergOnce(spark, table, checkpoint)(process))

  private def loop(maxPolls: Int, intervalMs: Long, idleStop: Int)(
      tick: () => Option[Long]): Int = {
    var processed = 0
    var idle = 0
    var i = 0
    while (i < maxPolls && (idleStop <= 0 || idle < idleStop)) {
      if (i > 0 && intervalMs > 0) Thread.sleep(intervalMs)
      if (tick().isDefined) { processed += 1; idle = 0 } else idle += 1
      i += 1
    }
    processed
  }
}
