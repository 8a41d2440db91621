package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{AvroOcf, TfRecord}
import graft.sources.TfRecord.FeatureSpec

/** Throughput evidence for the r12 row-container sources (the PERF_NOTES
  * discipline: 100 TB claims are measured, not asserted).
  *
  *  - TFRecord: distributed export of N shards, then the two read paths —
  *    raw record walk and typed tf.Example extraction (CRC verified on
  *    every record either way).
  *  - Avro OCF: ONE large deflate file, read whole vs block-aligned range
  *    splits — the splittable-read claim measured for equality and time.
  *
  * Usage: runMain graft.cli.ContainerStress [workRoot] [shards] [rowsPerShard]
  */
object ContainerStress {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val root = if (args.length > 0) args(0) else "/tmp/graft-container"
    val shards = if (args.length > 1) args(1).toInt else 16
    val rowsPerShard = if (args.length > 2) args(2).toInt else 25000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("container-stress").getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = shards.toLong * rowsPerShard
    // ~1 KB of per-row hex entropy: repetitive text would let deflate
    // collapse the avro file and dodge the split-read measurement
    val df = spark.range(n).select(
      $"id",
      concat((0 until 8).map(i =>
        sha2(concat($"id".cast("string"), lit(s"-$i")), 512)): _*).as("text"),
      ($"id" % 997).cast("float").as("score"),
      array($"id", $"id" * 2, $"id" * 3).as("tags"))

    // ---- TFRecord
    val tfDir = s"$root/tfrecord"
    val tfSpec = Seq(FeatureSpec("id", "int64"), FeatureSpec("text", "string"),
      FeatureSpec("score", "float"), FeatureSpec("tags", "int64", scalar = false))
    val (_, wTf) = time(TfRecord.writeShards(df.repartition(shards), tfDir, tfSpec))
    val bytesTf = new java.io.File(tfDir).listFiles().map(_.length()).sum
    val (cRaw, tRaw) = time(TfRecord.records(spark, s"$tfDir/shard-*.tfrecord").count())
    val (agg, tTyped) = time(
      TfRecord.examples(spark, s"$tfDir/shard-*.tfrecord", tfSpec)
        .agg(sum($"id"), sum($"score"), sum($"tags"(2))).head())
    println(f"[stress] tfrecord: ${bytesTf / 1e6}%.0f MB / $n rows over " +
      f"$shards shards — write $wTf%.2f s, raw walk $tRaw%.2f s " +
      f"(${bytesTf / 1e6 / tRaw}%.0f MB/s), typed extract $tTyped%.2f s " +
      f"(${bytesTf / 1e6 / tTyped}%.0f MB/s); rows $cRaw, " +
      s"idSum ${agg.getLong(0)}")

    // ---- Avro: one big deflate file, whole vs range-split reads
    val avroDir = s"$root/avro"
    val schema =
      """{"type": "record", "name": "Doc", "fields": [
           {"name": "id", "type": "long"},
           {"name": "text", "type": "string"},
           {"name": "score", "type": "float"},
           {"name": "tags", "type": {"type": "array", "items": "long"}}
         ]}"""
    // one partition -> ONE file: the splittable-read subject
    val (_, wAv) = time(AvroOcf.writeShards(
      df.repartition(1), avroDir, schema, codec = "deflate"))
    val avFile = s"$avroDir/shard-00000.avro"
    val bytesAv = new java.io.File(avFile).length()
    val (cWhole, tWhole) = time(
      AvroOcf.read(spark, avFile, maxSplitBytes = Long.MaxValue).count())
    val splitDf = AvroOcf.read(spark, avFile, maxSplitBytes = 8L << 20)
    val parts = splitDf.rdd.getNumPartitions
    val (aggAv, tSplit) = time(splitDf.agg(sum($"id"), count(lit(1))).head())
    println(f"[stress] avro: ${bytesAv / 1e6}%.0f MB deflate, one file — " +
      f"write $wAv%.2f s, whole-file read $tWhole%.2f s, " +
      f"$parts-way split read $tSplit%.2f s " +
      f"(${bytesAv / 1e6 / tSplit}%.0f MB/s compressed); " +
      s"rows whole=$cWhole split=${aggAv.getLong(1)}, " +
      s"idSum ${aggAv.getLong(0)} (expect ${n * (n - 1) / 2})")

    spark.stop()
  }
}
