package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The splitter (`weather-sp`): demux one dataset into many outputs keyed by
  * dimension values.
  *
  * The reference iterates GRIB messages and routes each to a file named by a
  * format template of its attributes (file_splitters.py:159-313,
  * file_name_utils.py:27-113). In Spark the partitioned write IS the
  * splitter: `df.write.partitionBy(dims)` routes every row to its
  * `dim=value/` directory in one distributed pass — same demux semantics,
  * no per-message loop, scales with input splits rather than message count.
  */
object Splitter {

  /** Enumerate the distinct split-key tuples (GribSplitterV2's
    * `grib_get ... | uniq` enumeration, file_splitters.py:215-260). */
  def enumerate(df: DataFrame, dims: Seq[String]): DataFrame =
    df.select(dims.map(col): _*).distinct()

  /** Output-path templating (OutFileInfo, file_name_utils.py:27-113):
    * `template` uses `{dim}` placeholders, e.g.
    * `"out/{shortName}/{level}.grib"`. Returns df + `output_path` column. */
  def withOutputPaths(df: DataFrame, template: String): DataFrame = {
    val pattern = """\{([A-Za-z_][A-Za-z0-9_]*)\}""".r
    val parts = pattern.split(template)                   // literal segments
    val dims = pattern.findAllMatchIn(template).map(_.group(1)).toSeq
    val pieces = parts.zipAll(dims, "", "").flatMap { case (l, d) =>
      Seq(Some(lit(l)), if (d.nonEmpty) Some(col(d).cast("string")) else None).flatten
    }
    df.withColumn("output_path", concat(pieces: _*))
  }

  /** Skip-existing (P12, file_splitters.py:131-156): drop rows whose target
    * path is already present in `existing` (a one-column `output_path`
    * listing). Broadcast anti-join — the listing is tiny vs the data. */
  def skipExisting(pending: DataFrame, existing: DataFrame): DataFrame =
    pending.join(broadcast(existing), Seq("output_path"), "left_anti")

  /** The split itself (R7/R8): one partitioned write. `force=false` keeps
    * the idempotent-rerun semantics of the reference (existing partitions
    * are not rewritten). */
  def split(df: DataFrame, dims: Seq[String], outRoot: String, force: Boolean = false): Unit =
    df.write
      .partitionBy(dims: _*)
      .mode(if (force) SaveMode.Overwrite else SaveMode.Ignore)
      .parquet(outRoot)
}
