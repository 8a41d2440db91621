package graft

import org.apache.spark.sql.functions._

import graft.functions.CrsTransform
import graft.sources.tiff.{TiffReader, TiffWriter => TW}

/** Golden tests for the GeoTIFF reader: fixture files from the pure-JVM
  * writer, strip decode (raw + deflate), the tiepoint/scale affine, and
  * both CRS paths (EPSG:4326 pass-through, UTM inverse reprojection). */
class TiffSpec extends SparkSpec {
  import spark.implicits._

  private val (w, h) = (6, 5)
  private def vals(f: (Int, Int) => Double): Seq[Double] =
    for (r <- 0 until h; c <- 0 until w) yield f(r, c)

  test("EPSG:4326 raster: model coords pass through as lon/lat, exact values") {
    val dir = java.nio.file.Files.createTempDirectory("tif4326").toString
    val p = s"$dir/t.tif"
    // 0.5-degree pixels anchored at (10E, 55N); value = 100*r + c
    TW.write(p, TW.Spec(w, h, 1, vals((r, c) => 100.0 * r + c),
      pixelScale = (0.5, 0.5), tiepointXY = (10.0, 55.0), epsg = 4326,
      rowsPerStrip = 2))
    val df = TiffReader.readLongFormat(spark, p)
    assert(df.columns.toSeq == Seq("latitude", "longitude", "band_1"))
    assert(df.count() == w * h)
    // pixel (r=1, c=2): center lon = 10 + 2.5*0.5, lat = 55 - 1.5*0.5
    val r = df.filter($"latitude" === 54.25 && $"longitude" === 11.25).head()
    assert(r.getAs[Double]("band_1") == 102.0)
    // corner pixel (0,0) at (10.25, 54.75)
    assert(df.filter($"latitude" === 54.75 && $"longitude" === 10.25)
      .head().getAs[Double]("band_1") == 0.0)
  }

  test("deflate-compressed strips decode identically") {
    val dir = java.nio.file.Files.createTempDirectory("tifz").toString
    val raw = s"$dir/raw.tif"
    val zip = s"$dir/zip.tif"
    val spec = TW.Spec(w, h, 1, vals((r, c) => r * 7.0 + c * 0.25),
      pixelScale = (1.0, 1.0), tiepointXY = (0.0, 10.0), epsg = 4326)
    TW.write(raw, spec)
    TW.write(zip, spec.copy(deflate = true))
    val a = TiffReader.readLongFormat(spark, raw)
      .orderBy($"latitude", $"longitude").collect()
    val b = TiffReader.readLongFormat(spark, zip)
      .orderBy($"latitude", $"longitude").collect()
    assert(a.sameElements(b))
  }

  test("UTM raster reprojects through the transverse-Mercator inverse") {
    // place the grid near 2E 41N in UTM zone 31: model coords from the
    // forward transform, so expected lat/lon are known
    val zone = 31
    val (e0, n0) = CrsTransform.lonLatToUtm(2.0, 41.0, zone)
    val dir = java.nio.file.Files.createTempDirectory("tifutm").toString
    val p = s"$dir/utm.tif"
    TW.write(p, TW.Spec(w, h, 1, vals((r, c) => r * 10.0 + c),
      pixelScale = (1000.0, 1000.0),  // 1 km pixels
      tiepointXY = (e0, n0), epsg = 32600 + zone))
    val df = TiffReader.readLongFormat(spark, p)
    assert(df.count() == w * h)
    // pixel (0,0) center = (e0 + 500, n0 - 500): invert and compare to the
    // double-precision forward anchor within the series' tolerance
    val (lonE, latE) = {
      // numeric inverse via the column expression on a 1-row frame
      val one = Seq((e0 + 500.0, n0 - 500.0)).toDF("e", "n")
      val (lo, la) = CrsTransform.utmToLonLat($"e", $"n", zone)
      val r = one.select(lo, la).head(); (r.getDouble(0), r.getDouble(1))
    }
    val got = df.filter($"band_1" === 0.0).head()
    assert(math.abs(got.getAs[Double]("latitude") - latE) < 1e-9)
    assert(math.abs(got.getAs[Double]("longitude") - lonE) < 1e-9)
    // and the raster is in the right neighborhood
    assert(math.abs(latE - 41.0) < 0.1 && math.abs(lonE - 2.0) < 0.1)
  }

  test("multi-band pixels become one column per band") {
    val dir = java.nio.file.Files.createTempDirectory("tifmb").toString
    val p = s"$dir/mb.tif"
    val interleaved = for (r <- 0 until h; c <- 0 until w; b <- 0 until 2)
      yield if (b == 0) r * 10.0 + c else 1000.0 + r * 10.0 + c
    TW.write(p, TW.Spec(w, h, 2, interleaved,
      pixelScale = (1.0, 1.0), tiepointXY = (0.0, 10.0), epsg = 4326))
    val df = TiffReader.readLongFormat(spark, p)
    assert(df.columns.toSeq == Seq("latitude", "longitude", "band_1", "band_2"))
    val r = df.filter($"band_1" === 23.0).head()
    assert(r.getAs[Double]("band_2") == 1023.0)
  }

  test("tif preprocess composes: reader -> band rename + time-from-metadata") {
    val dir = java.nio.file.Files.createTempDirectory("tifpre").toString
    val p = s"$dir/t.tif"
    TW.write(p, TW.Spec(w, h, 1, vals((r, c) => r + c * 0.5),
      pixelScale = (0.5, 0.5), tiepointXY = (10.0, 55.0), epsg = 4326))
    val out = graft.sources.FormatRegistry.open(spark, p)
      .withColumnRenamed("band_1", "dewpoint_temperature_2m")
      .withColumn("time", lit("2026-05-01 00:00:00").cast("timestamp_ntz"))
    assert(out.count() == w * h)
    val extracted = graft.operators.Mover.extractRows(out, s"file://$p",
      graft.operators.Mover.Options(importTime = Some("2026-05-01 06:00:00"),
        latRes = Some(0.25), lonRes = Some(0.25)))
    assert(extracted.columns.contains("dewpoint_temperature_2m"))
    assert(extracted.columns.contains("geo_polygon"))
    assert(extracted.count() == w * h)
  }

  test("non-TIFF bytes raise directed errors") {
    val e = intercept[IllegalArgumentException](
      graft.sources.tiff.Tiff.parseMeta("NOTATIFF0123456789".getBytes))
    assert(e.getMessage.contains("byte-order"))
  }
}
