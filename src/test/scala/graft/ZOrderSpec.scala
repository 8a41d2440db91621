package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

import graft.operators.ZOrder
import graft.sources.{DeltaTable, DeltaWriter, IcebergTable, IcebergWriter}

/** Z-order clustering and its payoff: after OPTIMIZE ZORDER /
  * rewriteDataFiles(zorderBy), stats-based file skipping prunes on EVERY
  * clustered column — the multi-dimensional layout a linear sort cannot
  * give. Each arm asserts the result set is unchanged by the rewrite and
  * that pruning on the NON-leading dimension actually shrinks the scan. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("zorder").toString

  // a 64x64 grid: a and b are INDEPENDENT dimensions, so any linear
  // layout that clusters a scatters b unless the z-curve interleaves
  private def grid() = spark.range(0, 4096).select(
    ($"id" % 64).as("a"), ($"id" / 64).cast("long").as("b"),
    concat(lit("r"), $"id").as("text"))

  test("zColumn: interleaved ranks preserve both dimensions' locality") {
    val df = grid()
    val z = df.withColumn("__z", ZOrder.zColumn(df, Seq("a", "b")))
    // the z value of (0,0) is minimal; quadrant ordering holds: every
    // point of the low-low quadrant sorts below every high-high point
    val rows = z.select($"a", $"b", $"__z").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val lowLow = for (a <- 0L until 32L; b <- 0L until 32L)
      yield rows((a, b))
    val highHigh = for (a <- 32L until 64L; b <- 32L until 64L)
      yield rows((a, b))
    assert(lowLow.max < highHigh.min,
      "low-low quadrant must sort entirely below high-high")
    // nulls rank lowest, never throw
    val withNull = Seq((Some(1L), 2L), (None, 3L)).toDF("a", "b")
    val zn = withNull.withColumn("__z",
      ZOrder.zColumn(withNull, Seq("a", "b"))).collect()
    assert(zn.forall(!_.isNullAt(2)))
    // directed: unknown column, non-orderable type, too many columns
    intercept[IllegalArgumentException](ZOrder.zColumn(df, Seq("nope")))
    intercept[IllegalArgumentException](ZOrder.zColumn(df, Seq("text")))
    intercept[IllegalArgumentException](
      ZOrder.zColumn(df, Seq("a", "b", "a", "b", "a")))
    // 4 columns: bit positions reach 31 — the z value must stay
    // non-negative (long arithmetic, no int sign-bit wrap) and keep the
    // quadrant property on the leading pair
    val df4 = spark.range(0, 4096).select(
      ($"id" % 8).as("a"), (($"id" / 8) % 8).as("b"),
      (($"id" / 64) % 8).as("c"), ($"id" / 512).cast("long").as("d"))
    val z4 = df4.withColumn("__z", ZOrder.zColumn(df4, Seq("a", "b", "c", "d")))
      .select($"d", $"__z").collect()
    assert(z4.forall(_.getLong(1) >= 0L), "no sign-bit overflow")
    val loD = z4.filter(_.getLong(0) < 4).map(_.getLong(1))
    val hiD = z4.filter(_.getLong(0) >= 4).map(_.getLong(1))
    assert(loD.min < hiD.min && loD.max < hiD.max,
      "the 4th column's high bit still orders the curve")
  }

  test("delta: OPTIMIZE ZORDER makes skipping work on both columns") {
    val table = tmp()
    // 8 appends sliced by a — pre-optimize, b-bounds span everything
    for (k <- 0 until 8)
      DeltaWriter.writeAppend(spark,
        grid().filter($"a" >= k * 8 && $"a" < (k + 1) * 8).coalesce(1),
        table)
    val bFilter = Seq[Filter](GreaterThanOrEqual("b", 48L))
    val before = DeltaTable.readWhere(spark, table, bFilter)
    val total = DeltaTable.read(spark, table).inputFiles.length
    assert(before.inputFiles.length == total,
      "pre-zorder, every a-sliced file spans all of b — nothing prunes")
    val expect = before.select($"text").as[String].collect().sorted.toSeq

    DeltaWriter.compact(spark, table, targetFileBytes = 8L << 10,
      zorderBy = Seq("a", "b"))
    val fullAfter = DeltaTable.read(spark, table)
    assert(fullAfter.count() == 4096, "a clustering rewrite keeps the rows")
    val after = DeltaTable.readWhere(spark, table, bFilter)
    assert(after.inputFiles.length < fullAfter.inputFiles.length,
      s"b-pruning after zorder: ${after.inputFiles.length} of " +
        s"${fullAfter.inputFiles.length}")
    assert(after.select($"text").as[String].collect().sorted.toSeq == expect)
    // the a dimension still prunes too — z beats a plain b-sort
    val aAfter = DeltaTable.readWhere(spark, table,
      Seq(LessThan("a", 8L)))
    assert(aAfter.inputFiles.length < fullAfter.inputFiles.length)
    assert(aAfter.count() == 512)
    // z-order on a partition column is directed
    val pt = tmp()
    DeltaWriter.writeAppend(spark, grid().withColumn("p", $"a" % 2),
      pt, partitionBy = Seq("p"))
    val e = intercept[Exception](
      DeltaWriter.compact(spark, pt, zorderBy = Seq("p")))
    assert(e.getMessage.contains("partition column"), e.getMessage)
  }

  test("cluster: a real __z column survives the rewrite intact") {
    // the helper column must dodge existing names (case-insensitively):
    // withColumn would otherwise REPLACE the user's __z and the trailing
    // drop would erase its data from every rewritten file
    val df = spark.range(0, 256).select(
      ($"id" % 16).as("a"), ($"id" / 16).cast("long").as("b"),
      ($"id" * 7).as("__z"), ($"id" * 11).as("__Z_"))
    val out = ZOrder.cluster(df, Seq("a", "b"), 4)
    assert(out.schema.fieldNames.toSeq == Seq("a", "b", "__z", "__Z_"),
      s"schema must be unchanged, got ${out.schema.fieldNames.toSeq}")
    val got = out.select($"a", $"b", $"__z", $"__Z_").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val want = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == want, "every __z/__Z_ value must survive clustering")
  }

  test("iceberg: rewriteDataFiles(zorderBy) twin") {
    val table = tmp()
    for (k <- 0 until 8)
      IcebergWriter.writeAppend(spark,
        grid().filter($"a" >= k * 8 && $"a" < (k + 1) * 8).coalesce(1),
        table)
    val bFilter = Seq[Filter](GreaterThanOrEqual("b", 48L))
    val before = IcebergTable.readWhere(spark, table, bFilter)
    assert(before.inputFiles.length ==
      IcebergTable.read(spark, table).inputFiles.length)
    val expect = before.select($"text").as[String].collect().sorted.toSeq

    IcebergWriter.rewriteDataFiles(spark, table,
      targetFileBytes = 8L << 10, zorderBy = Seq("a", "b"))
    val fullAfter = IcebergTable.read(spark, table)
    assert(fullAfter.count() == 4096)
    val after = IcebergTable.readWhere(spark, table, bFilter)
    assert(after.inputFiles.length < fullAfter.inputFiles.length,
      s"${after.inputFiles.length} of ${fullAfter.inputFiles.length}")
    assert(after.select($"text").as[String].collect().sorted.toSeq == expect)
    val aAfter = IcebergTable.readWhere(spark, table,
      Seq(LessThan("a", 8L)))
    assert(aAfter.inputFiles.length < fullAfter.inputFiles.length &&
      aAfter.count() == 512)
  }
}
