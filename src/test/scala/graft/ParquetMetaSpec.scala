package graft

import org.apache.spark.sql.functions._

import graft.sources.ParquetMeta

/** Parquet footer introspection: row-group accounting at footer cost. */
class ParquetMetaSpec extends SparkSpec {
  import spark.implicits._

  test("readMeta accounts every row across files and row groups") {
    val dir = java.nio.file.Files.createTempDirectory("pqmeta").toString
    spark.range(10000).selectExpr("id", "concat('v', id) AS v")
      .repartition(3).write.mode("overwrite").parquet(s"$dir/t")
    val meta = ParquetMeta.readMeta(spark, s"$dir/t/*.parquet")
    // success markers are skipped, every data file appears
    val files = meta.select($"file").distinct().count()
    assert(files == 3, s"expected 3 data files, got $files")
    // rows across all row groups == table rows; bytes are positive
    val agg = meta.agg(sum($"rows"), min($"compressed_bytes"),
      min($"uncompressed_bytes"), max($"n_columns")).head()
    assert(agg.getLong(0) == 10000)
    assert(agg.getLong(1) > 0 && agg.getLong(2) > 0)
    assert(agg.getInt(3) == 2)
    assert(meta.head().getAs[String]("created_by") != null)
    // the graded tables read the same way — one footer probe per file
    val orders = ParquetMeta.readMeta(spark, s"$sfDir/orders.parquet")
    val total = orders.agg(sum($"rows")).head().getLong(0)
    assert(total == spark.read.parquet(s"$sfDir/orders.parquet").count())
  }
}
