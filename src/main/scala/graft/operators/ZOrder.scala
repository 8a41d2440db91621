package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-ORDER clustering: interleave the bits of per-column QUANTILE ranks
  * so multi-column locality survives a linear file layout — the reason
  * `OPTIMIZE ... ZORDER BY (a, b)` makes min/max file skipping effective
  * on BOTH `a` and `b` (a plain sort gives tight bounds on the leading
  * column only; the z-curve gives every file a bounded sub-rectangle of
  * the (a, b) domain).
  *
  * Spark-first mechanics, all distributed:
  *  - each column's rank comes from `approxQuantile` boundaries (a
  *    driver-side array of ≤255 doubles from a distributed sketch) —
  *    QUANTILE ranks, not min/max scaling, so skew cannot collapse the
  *    curve into a handful of buckets;
  *  - the per-row bucket is an `aggregate` fold over the boundary array
  *    (codegen'd expression, no UDF);
  *  - bit interleave is shift/mask arithmetic on the bucket columns;
  *  - the final layout is ONE range shuffle (`repartitionByRange`) +
  *    in-partition sort on the z value — the shuffle any clustering
  *    rewrite inherently pays, and nothing else.
  */
object ZOrder {
  private val Buckets = 256 // 8 bits per column

  /** Columns the rank sketch supports: orderable numerics + temporals
    * (cast to double for the quantile sketch). */
  private def rankable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
      DoubleType | DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  private def asDouble(name: String, dt: DataType): Column = dt match {
    case DateType => col(name).cast("int").cast("double")
    case TimestampType | TimestampNTZType =>
      col(name).cast("long").cast("double")
    case _ => col(name).cast("double")
  }

  /** The z value for `cols` over `df`'s distribution. Runs one
    * `approxQuantile` sketch per column (distributed; the driver holds
    * ≤255 doubles each). Null ranks as bucket 0 (nulls cluster
    * together, like a null-first sort). */
  def zColumn(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty && cols.size <= 4,
      s"z-order takes 1..4 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size,
      s"z-order columns must be distinct, got ${cols.mkString(", ")}")
    cols.foreach { c =>
      val f = df.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"z-order column '$c' is not " +
          s"in the schema ${df.schema.simpleString}"))
      if (!rankable(f.dataType)) throw new IllegalArgumentException(
        s"z-order column '$c' has type ${f.dataType.simpleString} — " +
          "orderable numeric/date/timestamp columns only")
    }
    val probs = (1 until Buckets).map(_.toDouble / Buckets).toArray
    // ONE distributed sketch pass for every column (approxQuantile's
    // multi-column form; it ignores nulls itself)
    val proj = df.select(cols.map(c =>
      asDouble(c, df.schema(c).dataType).as(c)): _*)
    val allBounds = proj.stat.approxQuantile(cols.toArray, probs, 0.01)
    val buckets: Seq[Column] = cols.zip(allBounds).map { case (c, raw) =>
      val bounds = raw.distinct.sorted
      if (bounds.isEmpty) lit(0L)
      else {
        val v = asDouble(c, df.schema(c).dataType)
        // rank = #boundaries <= v, a codegen'd fold — 0..Buckets-1;
        // LONG, so an interleaved bit can reach position 31 without
        // wrapping into the int sign bit
        val rank = aggregate(lit(bounds), lit(0),
          (acc, b) => acc + when(v >= b, 1).otherwise(0))
        when(col(c).isNull, lit(0L)).otherwise(rank.cast("long"))
      }
    }
    // interleave: bit i of column j lands at position i*ncols + j —
    // low-order bits of every column stay low-order in z
    val ncols = cols.size
    val terms = for (i <- 0 until 8; j <- 0 until ncols) yield
      shiftleft(shiftright(buckets(j), i).bitwiseAND(lit(1L)),
        i * ncols + j)
    terms.reduce(_ + _)
  }

  /** Rewrite `df` into `numFiles` z-clustered partitions: one range
    * shuffle on (`within` ++ z) + an in-partition sort. `within` keeps
    * table-partition columns leading so a dynamic-partition writer still
    * emits one file run per directory. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      within: Seq[String] = Nil): DataFrame =
    clusterExpr(df, cols, numFiles, within.map(col))

  /** [[cluster]] with EXPRESSION-valued grouping — what z-ordering
    * WITHIN non-identity partition transforms needs: the caller passes
    * the transform value expressions (bucket(N, col), truncate, the
    * temporal family) and rows cluster by z INSIDE each transform
    * value, so the dynamic-partition writer still emits one file run
    * per directory while every file gets tight multi-column bounds. */
  def clusterExpr(df: DataFrame, cols: Seq[String], numFiles: Int,
      within: Seq[Column]): DataFrame = {
    val z = zColumn(df, cols)
    // the helper must not shadow a REAL column: withColumn REPLACES an
    // existing name (case-insensitively under Spark's default resolver),
    // and the trailing drop would then silently erase that column's data
    // from every rewritten file
    val taken = df.schema.fieldNames.map(_.toLowerCase).toSet
    var zName = "__z"
    while (taken.contains(zName.toLowerCase)) zName += "_"
    val key = within :+ col(zName)
    df.withColumn(zName, z)
      .repartitionByRange(math.max(1, numFiles), key: _*)
      .sortWithinPartitions(key: _*)
      .drop(zName)
  }
}
