package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for the session's effective Hadoop configuration.
  *
  * Task-side code that rebuilds a bare `new Configuration()` silently drops
  * everything configured through `spark.hadoopConfiguration` — object-store
  * credentials, `fs.defaultFS`, endpoints — so a job that authenticates fine
  * on the driver fails (or resolves paths differently) in executors. Every
  * distributed reader/writer here ships one of these instead.
  */
final class TaskConf(entries: Array[(String, String)]) extends Serializable {
  @transient lazy val value: Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

object TaskConf {
  /** Snapshot the EFFECTIVE properties (defaults + overrides) driver-side. */
  def apply(conf: Configuration): TaskConf =
    new TaskConf(conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray)
}
