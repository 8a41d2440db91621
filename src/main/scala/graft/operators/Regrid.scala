package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-resolution resampling (the reference's `weather-mv regrid`,
  * weather_mv/loader_pipeline/regrid.py:73-165 — there a MetView call per
  * chunk; here the interpolation is expressed relationally so it distributes).
  *
  * Two schemes cover the reference's common uses:
  *  - conservative/mean downsampling: every source cell maps to exactly one
  *    coarser target cell -> groupBy(target cell) + avg. One shuffle, pure
  *    hash aggregation, linear at any scale.
  *  - bilinear upsampling: each target point takes the 4 surrounding source
  *    points weighted by distance -> explode each source point into the <=4
  *    target cells it contributes to, then groupBy(target) weighted sum.
  *    This is the join-free formulation: contribution explode + aggregate,
  *    so the shuffle is on the target key and no N-way join appears.
  */
object Regrid {

  /** Snap a coordinate to the floor of a `res`-degree grid (cell anchor). */
  def snap(c: Column, res: Double): Column =
    floor(c / res) * res

  /** Downsample to a coarser regular grid by conservative (mean) pooling.
    * `valueCols` are averaged; output one row per (time?, cell). */
  def conservative(df: DataFrame, latCol: String, lonCol: String,
      res: Double, valueCols: Seq[String], extraKeys: Seq[String] = Nil): DataFrame =
    conservativeXY(df, latCol, lonCol, res, res, valueCols, extraKeys)

  /** [[conservative]] with independent lat/lon resolutions (anisotropic
    * target grids, e.g. regrid_kwargs {"grid": [1, 0.25]}). */
  def conservativeXY(df: DataFrame, latCol: String, lonCol: String,
      latRes: Double, lonRes: Double, valueCols: Seq[String],
      extraKeys: Seq[String] = Nil): DataFrame = {
    val keys = extraKeys.map(col) ++ Seq(
      snap(col(latCol), latRes).as("lat_cell"),
      snap(col(lonCol), lonRes).as("lon_cell"))
    val aggs = count(lit(1)).as("n_samples") +: valueCols.map(v => avg(col(v)).as(v))
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Index of the NEAREST `res`-degree grid cell (vs [[snap]]'s floor
    * anchor). Integer, so joins on it are plain hash joins — never
    * fp-equality keys. */
  def nearestIndex(c: Column, res: Double): Column =
    round(c / res).cast("long")

  /** Nearest-neighbor regrid (regrid.py's common non-conservative mode):
    * each target point takes the values of its nearest source grid cell.
    * Shape: integer cell-index equi-join — broadcast-able when the target
    * grid is small, AQE-skew-safe otherwise; no range join, no crossJoin.
    * `source` must be unique per cell (pre-aggregate a long-format frame
    * with [[conservative]] at the source resolution first if not). */
  def nearest(source: DataFrame, targets: DataFrame, latCol: String,
      lonCol: String, latRes: Double, lonRes: Double): DataFrame = {
    val s = source
      .withColumn("__la_i", nearestIndex(col(latCol), latRes))
      .withColumn("__lo_i", nearestIndex(col(lonCol), lonRes))
      .drop(latCol, lonCol)
    val t = targets
      .withColumn("__la_i", nearestIndex(col(latCol), latRes))
      .withColumn("__lo_i", nearestIndex(col(lonCol), lonRes))
    t.join(s, Seq("__la_i", "__lo_i")).drop("__la_i", "__lo_i")
  }

  /** Bilinear interpolation weights of a target point (tLat, tLon) against a
    * source cell anchored at (sLat, sLon) with resolution `res`. */
  def bilinearWeight(tLat: Column, tLon: Column, sLat: Column, sLon: Column,
      res: Double): Column = {
    val wy = lit(1.0) - abs(tLat - sLat) / res
    val wx = lit(1.0) - abs(tLon - sLon) / res
    greatest(wy, lit(0.0)) * greatest(wx, lit(0.0))
  }

  /** Upsample: interpolate `valueCol` of a `res`-degree source grid onto the
    * target points carried by `targets` (cols: latCol, lonCol). Each target
    * point joins only its 4 surrounding source anchors (equi-join on the
    * snapped anchor key after exploding the 2x2 neighborhood) — a bounded
    * fan-out, not a range join, so Catalyst plans a plain hash join. */
  def bilinear(source: DataFrame, targets: DataFrame, latCol: String,
      lonCol: String, valueCol: String, res: Double): DataFrame = {
    val anchors = targets.withColumn("corner",
        explode(array((for (dy <- 0 to 1; dx <- 0 to 1) yield
          struct((snap(col(latCol), res) + dy * res).as("a_lat"),
            (snap(col(lonCol), res) + dx * res).as("a_lon"))): _*)))
      .select(col(latCol).as("t_lat"), col(lonCol).as("t_lon"),
        col("corner.a_lat"), col("corner.a_lon"))
    val src = source.select(col(latCol).as("a_lat"), col(lonCol).as("a_lon"),
      col(valueCol).as("v"))
    anchors.join(src, Seq("a_lat", "a_lon"))
      .withColumn("w", bilinearWeight(col("t_lat"), col("t_lon"),
        col("a_lat"), col("a_lon"), res))
      .groupBy(col("t_lat"), col("t_lon"))
      .agg((sum(col("w") * col("v")) / sum(col("w"))).as(valueCol))
  }
}
