package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.Row

/** Task-side ranged-read stream lifecycle, shared by every distributed
  * scientific-format reader: open through the session's [[TaskConf]], close
  * on iterator exhaustion AND on task completion (so limit()/head()/failing
  * consumers never leak the handle). */
object RangedIO {

  def rows(path: String, tconf: TaskConf)(
      body: FSDataInputStream => Iterator[Row]): Iterator[Row] = {
    val p = new Path(path)
    val fs = p.getFileSystem(tconf.value)
    val in = fs.open(p)
    var closed = false
    def closeOnce(): Unit =
      if (!closed) { closed = true; try in.close() catch { case _: Throwable => () } }
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
    val iter = body(in)
    new Iterator[Row] {
      def hasNext: Boolean = { val h = iter.hasNext; if (!h) closeOnce(); h }
      def next(): Row = iter.next()
    }
  }

  /** Group CONSECUTIVE elements sharing a key into runs — the shape a
    * file-major task list has inside one partition, so each run opens its
    * file once through [[rows]]. Plan tuples only; never buffers data. */
  def contiguousRuns[T, K](it: Iterator[T])(key: T => K): Iterator[(K, Seq[T])] =
    new Iterator[(K, Seq[T])] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): (K, Seq[T]) = {
        val k = key(buf.head)
        val run = Seq.newBuilder[T]
        while (buf.hasNext && key(buf.head) == k) run += buf.next()
        (k, run.result())
      }
    }
}
