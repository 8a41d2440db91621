package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ConfigParsers

/** The downloader's request-space partitioner (`weather-dl`).
  *
  * Reference flow (SURVEY §3.3): configs -> cartesian fan-out over
  * `partition_keys` -> skip-existing filter -> license subsection round-robin
  * -> grouped serial fetch. The request space is small (thousands of
  * partitions even for 100 TB of downloads), so expansion happens on the
  * driver (as in the reference, partition.py:164-207) and becomes a DataFrame
  * for the distributed stages (anti-join dedup, grouped execution).
  */
object Partitioner {

  /** A download config (config.py:23-77), selection values already
    * MARS-expanded (ConfigParsers.parseMarsSyntax). */
  final case class DlConfig(
      name: String,
      client: String = "fake",
      selection: Map[String, Seq[String]] = Map.empty,
      partitionKeys: Seq[String] = Nil,
      targetPath: String = "",
      subsections: Seq[String] = Seq("default"))

  /** Cartesian fan-out (prepare_partition_index + prepare_partitions_from_index,
    * partition.py:164-207): one row per element of the cross product of the
    * partition keys' value lists, each carrying its singleton selection. */
  def fanout(spark: SparkSession, cfg: DlConfig): DataFrame = {
    import spark.implicits._
    val keyVals: Seq[Seq[String]] = cfg.partitionKeys.map(k => cfg.selection(k))
    val tuples = keyVals.foldLeft(Seq(Seq.empty[String])) { (acc, vals) =>
      for (t <- acc; v <- vals) yield t :+ v
    }
    val rows = tuples.zipWithIndex.map { case (t, i) =>
      (cfg.name, i.toLong, t, formatTarget(cfg.targetPath, t, cfg.partitionKeys))
    }
    rows.toDF("config_name", "partition_idx", "key_values", "target")
      .select($"config_name", $"partition_idx",
        posexplode($"key_values").as(Seq("key_pos", "key_value")),
        $"target")
      .withColumn("key_name",
        element_at(typedLit(cfg.partitionKeys), col("key_pos") + 1))
      .groupBy($"config_name", $"partition_idx", $"target")
      .pivot("key_name", cfg.partitionKeys)
      .agg(first($"key_value"))
      .orderBy($"partition_idx")
  }

  /** `target_path.format(*values)` analog (file_name_utils-style templating):
    * `{0}`/`{1}` positional, `{key}` named (when `keys` given), bare `{}`
    * sequential. */
  def formatTarget(template: String, values: Seq[String], keys: Seq[String] = Nil): String = {
    var out = template
    values.zipWithIndex.foreach { case (v, i) => out = out.replace(s"{$i}", v) }
    keys.zip(values).foreach { case (k, v) => out = out.replace(s"{$k}", v) }
    values.foreach { v => out = out.replaceFirst("""\{\}""", java.util.regex.Matcher.quoteReplacement(v)) }
    out
  }

  /** Skip-existing (P8, partition.py:149-161): anti-join the fan-out against
    * the listing of already-downloaded targets. */
  def skipExisting(partitions: DataFrame, existingTargets: DataFrame): DataFrame =
    partitions.join(broadcast(existingTargets), Seq("target"), "left_anti")

  /** License-subsection round-robin (R6, partition.py:66-114): deterministic
    * `idx % n` assignment; the balancing invariant (counts differ by at most
    * one) is what partition_test.py:323 asserts. */
  def assignSubsections(partitions: DataFrame, subsections: Seq[String]): DataFrame = {
    val n = subsections.size
    partitions
      .withColumn("slot", (col("partition_idx") % n).cast("int"))
      .withColumn("subsection", element_at(typedLit(subsections), col("slot") + 1))
  }

  /** Fair scheduling (O4, cycle_iters round-robin across configs,
    * partition.py:254-282): interleave configs by their within-config rank. */
  def fairOrder(partitions: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("config_name")).orderBy(col("partition_idx"))
    partitions
      .withColumn("rank_in_config", row_number().over(w))
      .orderBy(col("rank_in_config"), col("config_name"), col("partition_idx"))
  }

  /** Group partitions by (subsection, request slot) so each license runs its
    * requests serially (A9, pipeline.py:100-131): `repartition` by the group
    * key + in-partition processing preserves the reference's concurrency
    * cap — `numRequests` concurrent streams per subsection. */
  def groupForExecution(partitions: DataFrame, numRequests: Int): DataFrame = {
    val grouped = partitions
      .withColumn("request_slot", (col("partition_idx") % numRequests).cast("int"))
    grouped.repartition(col("subsection"), col("request_slot"))
  }
}
