package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming forecast de-accumulation — the stateful twin of
  * [[graft.operators.Mover.deaccumulate]] (eccodes' stepRange differencing
  * for accumulated products like total precipitation), for the ingest path
  * where forecast steps ARRIVE as a stream: each cell's step value is the
  * difference against the PREVIOUS batch's last accumulated value, so a
  * cycle that spans micro-batches still differences correctly.
  *
  * Scale notes: state is O(1) per key (the last accumulated value); per
  * batch each key sorts only its own new rows. Same reset rule as the
  * batch operator: a decrease marks a new accumulation cycle and yields
  * the raw value. Assumes per-key batches arrive in step order across
  * micro-batches (forecast products are published that way); within a
  * batch, rows sort by `ts_us`.
  */
object Deaccumulate {

  final case class Obs(key: Long, ts_us: Long, value: Double)
  final case class LastValue(value: Double)
  final case class Step(key: Long, ts_us: Long, value: Double, step_value: Double)

  def assignStreaming(obs: Dataset[Obs]): Dataset[Step] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[LastValue, Step](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Obs], state: GroupState[LastValue]) =>
          var prev: Option[Double] = state.getOption.map(_.value)
          val out = it.toSeq.sortBy(_.ts_us).map { o =>
            val step = prev match {
              case Some(p) if o.value >= p => o.value - p
              case _ => o.value // first observation, or counter reset
            }
            prev = Some(o.value)
            Step(key, o.ts_us, o.value, step)
          }
          prev.foreach(p => state.update(LastValue(p)))
          out.iterator
      }
  }
}
