package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CRS reprojection for the GeoTIFF preprocess path (S4,
  * weather_mv/loader_pipeline/sinks.py:149-227): the reference runs pyproj's
  * `Transformer.from_crs(crs_wkt, EPSG:4326)` over the (y, x) mesh; the
  * overwhelmingly common source CRS for weather/satellite TIFFs is UTM
  * (Transverse Mercator on WGS84), which has a closed-form inverse — so the
  * transform is pure column algebra (builtin trig, fully codegen'd, no geo
  * library, no shuffle).
  *
  * Series used: the standard UTM expansion (USGS Professional Paper 1395,
  * Snyder "Map Projections — A Working Manual", public domain), accurate to
  * well under 1e-6 degrees inside a zone.
  *
  * Divergence from the reference, by design: sinks.py:165-170 assigns
  * `lat[0, :]` / `lon[:, 0]` — it keeps only the first row/column of the
  * reprojected mesh, silently assuming the result stays rectilinear (only
  * approximately true near the central meridian). Here every point carries
  * its OWN reprojected latitude/longitude.
  */
object CrsTransform {

  // WGS84 ellipsoid
  val SemiMajorAxis = 6378137.0
  private val Flattening = 1.0 / 298.257223563
  private val E2 = Flattening * (2.0 - Flattening)  // first eccentricity^2
  private val EP2 = E2 / (1.0 - E2)                 // second eccentricity^2
  private val K0 = 0.9996                           // UTM scale at c. meridian

  /** Central meridian of a UTM zone, degrees. */
  def zoneCentralMeridianDeg(zone: Int): Double = zone * 6.0 - 183.0

  /** GDAL-style affine geotransform (c, a, b, f, d, e): pixel (row, col) ->
    * projected (x, y): x = c + a*col + b*row, y = f + d*col + e*row.
    * This is what rasterio applies between pixel indices and the projected
    * coordinates the reference's dataset already carries. */
  def affineXY(row: Column, colIdx: Column, gt: Seq[Double]): (Column, Column) = {
    require(gt.size == 6, "geotransform needs 6 coefficients (c, a, b, f, d, e)")
    val Seq(c, a, b, f, d, e) = gt
    (lit(c) + lit(a) * colIdx + lit(b) * row,
      lit(f) + lit(d) * colIdx + lit(e) * row)
  }

  /** Inverse transverse Mercator: UTM (easting, northing) -> (longitude,
    * latitude) in degrees, as column expressions. */
  def utmToLonLat(easting: Column, northing: Column, zone: Int,
      southern: Boolean = false): (Column, Column) = {
    require(zone >= 1 && zone <= 60, s"UTM zone $zone")
    val x = easting - lit(500000.0)
    val y = if (southern) northing - lit(10000000.0) else northing

    val m = y / lit(K0)
    val mu = m / lit(SemiMajorAxis *
      (1.0 - E2 / 4.0 - 3.0 * E2 * E2 / 64.0 - 5.0 * E2 * E2 * E2 / 256.0))
    val e1 = (1.0 - math.sqrt(1.0 - E2)) / (1.0 + math.sqrt(1.0 - E2))
    val phi1 = mu +
      lit(3.0 * e1 / 2.0 - 27.0 * math.pow(e1, 3) / 32.0) * sin(mu * 2.0) +
      lit(21.0 * e1 * e1 / 16.0 - 55.0 * math.pow(e1, 4) / 32.0) * sin(mu * 4.0) +
      lit(151.0 * math.pow(e1, 3) / 96.0) * sin(mu * 6.0) +
      lit(1097.0 * math.pow(e1, 4) / 512.0) * sin(mu * 8.0)

    val sinPhi1 = sin(phi1)
    val cosPhi1 = cos(phi1)
    val tanPhi1 = tan(phi1)
    val c1 = lit(EP2) * cosPhi1 * cosPhi1
    val t1 = tanPhi1 * tanPhi1
    val oneMinusE2Sin2 = lit(1.0) - lit(E2) * sinPhi1 * sinPhi1
    val n1 = lit(SemiMajorAxis) / sqrt(oneMinusE2Sin2)
    val r1 = lit(SemiMajorAxis * (1.0 - E2)) / pow(oneMinusE2Sin2, 1.5)
    val dd = x / (n1 * lit(K0))
    val d2 = dd * dd
    val d4 = d2 * d2
    val d6 = d4 * d2

    val latRad = phi1 - (n1 * tanPhi1 / r1) * (
      d2 / 2.0 -
        (lit(5.0) + lit(3.0) * t1 + lit(10.0) * c1 - lit(4.0) * c1 * c1 -
          lit(9.0 * EP2)) * d4 / 24.0 +
        (lit(61.0) + lit(90.0) * t1 + lit(298.0) * c1 + lit(45.0) * t1 * t1 -
          lit(252.0 * EP2) - lit(3.0) * c1 * c1) * d6 / 720.0)
    val lonRad = (dd -
      (lit(1.0) + lit(2.0) * t1 + c1) * dd * d2 / 6.0 +
      (lit(5.0) - lit(2.0) * c1 + lit(28.0) * t1 - lit(3.0) * c1 * c1 +
        lit(8.0 * EP2) + lit(24.0) * t1 * t1) * dd * d4 / 120.0) / cosPhi1

    (degrees(lonRad) + lit(zoneCentralMeridianDeg(zone)), degrees(latRad))
  }

  /** Forward transverse Mercator on plain doubles — the test anchor for the
    * column inverse (round-trip identity) and the fixture generator. */
  def lonLatToUtm(lonDeg: Double, latDeg: Double, zone: Int,
      southern: Boolean = false): (Double, Double) = {
    val lat = math.toRadians(latDeg)
    val dLon = math.toRadians(lonDeg - zoneCentralMeridianDeg(zone))
    val sinLat = math.sin(lat)
    val cosLat = math.cos(lat)
    val tanLat = math.tan(lat)
    val n = SemiMajorAxis / math.sqrt(1.0 - E2 * sinLat * sinLat)
    val t = tanLat * tanLat
    val c = EP2 * cosLat * cosLat
    val aa = dLon * cosLat
    val m = SemiMajorAxis * (
      (1.0 - E2 / 4.0 - 3.0 * E2 * E2 / 64.0 - 5.0 * E2 * E2 * E2 / 256.0) * lat -
        (3.0 * E2 / 8.0 + 3.0 * E2 * E2 / 32.0 + 45.0 * math.pow(E2, 3) / 1024.0) * math.sin(2.0 * lat) +
        (15.0 * E2 * E2 / 256.0 + 45.0 * math.pow(E2, 3) / 1024.0) * math.sin(4.0 * lat) -
        (35.0 * math.pow(E2, 3) / 3072.0) * math.sin(6.0 * lat))
    val easting = 500000.0 + K0 * n * (aa +
      (1.0 - t + c) * math.pow(aa, 3) / 6.0 +
      (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * EP2) * math.pow(aa, 5) / 120.0)
    val northingRaw = K0 * (m + n * tanLat * (
      aa * aa / 2.0 +
        (5.0 - t + 9.0 * c + 4.0 * c * c) * math.pow(aa, 4) / 24.0 +
        (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * EP2) * math.pow(aa, 6) / 720.0))
    (easting, if (southern) northingRaw + 10000000.0 else northingRaw)
  }

  /** Inverse geostationary navigation — the CF `geostationary` grid
    * mapping of GOES-R ABI (sweep axis "x") and Meteosat SEVIRI (sweep
    * axis "y") imagery: fixed-grid scan angles in RADIANS to geodetic
    * (longitude, latitude) columns. Formulas are the public GOES-R PUG
    * volume 3 §5.1.2.8 / CGMS LRIT-HRIT navigation equations: intersect
    * the view ray from the satellite (at `height` above the ellipsoid
    * over `lon0Deg`) with the ellipsoid, then convert geocentric to
    * geodetic latitude. Scan angles whose ray MISSES the globe (beyond
    * the limb — the corners of a full-disk image) yield NULL, matching
    * the off-disk fill of the products themselves. Pure column algebra:
    * codegen'd, no geo library, no shuffle. */
  def geostationaryToLonLat(xRad: Column, yRad: Column, lon0Deg: Double,
      height: Double, semiMajor: Double = SemiMajorAxis,
      semiMinor: Double = 6356752.31414245,
      sweepX: Boolean = true): (Column, Column) = {
    val h = height + semiMajor // distance from earth centre
    val ratio = (semiMajor / semiMinor) * (semiMajor / semiMinor)
    val cx = cos(xRad); val sx = sin(xRad)
    val cy = cos(yRad); val sy = sin(yRad)
    // quadratic in the slant range t: |P|^2 constrained to the ellipsoid
    val av =
      if (sweepX) sx * sx + cx * cx * (cy * cy + lit(ratio) * sy * sy)
      else cy * cy + lit(ratio) * sy * sy
    val bv = lit(-2.0 * h) * cx * cy
    val cv = lit(h * h - semiMajor * semiMajor)
    val disc = bv * bv - lit(4.0) * av * cv
    val t = (negate(bv) - sqrt(disc)) / (lit(2.0) * av)
    val px = lit(h) - t * cx * cy
    val (py, pz) =
      if (sweepX) (t * sx, t * cx * sy)
      else (t * sx * cy, t * sy)
    val lat = degrees(atan(lit(ratio) * pz / sqrt(px * px + py * py)))
    // wrap to (-180, 180]: satellites near the antimeridian (GOES-West at
    // 137W, Himawari at 140.7E) otherwise emit longitudes past +-180
    val lonRaw = lit(lon0Deg) + degrees(atan(py / px))
    val lon = lonRaw - lit(360.0) * floor((lonRaw + lit(180.0)) / 360.0)
    (when(disc >= 0, lon), when(disc >= 0, lat))
  }

  /** Forward geostationary on plain doubles — the test anchor for the
    * column inverse (round-trip identity) and the fixture generator.
    * Returns the (x, y) scan angles in radians. */
  def lonLatToGeostationary(lonDeg: Double, latDeg: Double, lon0Deg: Double,
      height: Double, semiMajor: Double = SemiMajorAxis,
      semiMinor: Double = 6356752.31414245,
      sweepX: Boolean = true): (Double, Double) = {
    val h = height + semiMajor
    val e2 = 1.0 - (semiMinor / semiMajor) * (semiMinor / semiMajor)
    val phiC = math.atan((semiMinor / semiMajor) * (semiMinor / semiMajor) *
      math.tan(math.toRadians(latDeg)))
    val rc = semiMinor / math.sqrt(1.0 - e2 * math.cos(phiC) * math.cos(phiC))
    val dLam = math.toRadians(lonDeg - lon0Deg)
    val pX = rc * math.cos(phiC) * math.cos(dLam)
    val pY = rc * math.cos(phiC) * math.sin(dLam)
    val pZ = rc * math.sin(phiC)
    val r = math.sqrt((h - pX) * (h - pX) + pY * pY + pZ * pZ)
    if (sweepX) (math.asin(pY / r), math.atan(pZ / (h - pX)))
    else (math.atan(pY / (h - pX)), math.asin(pZ / r))
  }

  /** The tif-preprocess composition (sinks.py:149-227) for a UTM-projected
    * frame: pixel/projected coords -> latitude/longitude columns, band
    * columns renamed to their long names, time coordinates attached from
    * metadata epoch-millis (sinks.py:199-203). `gt` None means `xCol`/`yCol`
    * already hold projected metres (rasterio applied the affine). */
  def preprocessTif(df: DataFrame, xCol: String, yCol: String, zone: Int,
      southern: Boolean = false,
      gt: Option[Seq[Double]] = None,
      bandLongNames: Map[String, String] = Map.empty,
      startTimeMs: Option[Long] = None,
      endTimeMs: Option[Long] = None): DataFrame = {
    val (px, py) = gt match {
      case Some(g) => affineXY(col(yCol), col(xCol), g)
      case None => (col(xCol), col(yCol))
    }
    val (lon, lat) = utmToLonLat(px, py, zone, southern)
    val projected = df
      .withColumn("latitude", lat)
      .withColumn("longitude", lon)
      .drop(xCol, yCol)
    val renamed = bandLongNames.foldLeft(projected) { case (acc, (from, to)) =>
      acc.withColumnRenamed(from, to)
    }
    val withTime = startTimeMs match {
      case Some(ms) => renamed.withColumn("time",
        (lit(ms) / 1000.0).cast("timestamp").cast("timestamp_ntz"))
      case None => renamed
    }
    endTimeMs match {
      case Some(ms) => withTime.withColumn("valid_time",
        (lit(ms) / 1000.0).cast("timestamp").cast("timestamp_ntz"))
      case None => withTime
    }
  }
}
