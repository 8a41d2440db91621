package graft.sources.tiff

import graft.sources.grib.GribProjection
import graft.sources.grib.GribProjection.{AlbersEqualArea, Equirectangular,
  LambertAzimuthalEqualArea, LambertConformal, Mercator, PolarStereographic,
  Sinusoidal, TransverseMercator}

/** Projected-CRS resolution for GeoTIFF rasters beyond UTM — Lambert
  * conformal conic, polar stereographic, and Mercator, reusing the
  * spherical AND ellipsoidal Snyder inverses already serving the GRIB
  * projected grids ([[graft.sources.grib.GribProjection]]). This completes
  * the reference's "any tif CRS" preprocessing (weather_mv/loader_pipeline/
  * sinks.py:158-171, which delegates to rasterio/pyproj): regional NWP
  * COGs (HRRR/NAM Lambert grids, NSIDC polar products, web-Mercator tiles)
  * resolve either by well-known EPSG code or from user-defined ProjCS
  * GeoKeys (GeoTIFF 1.1 §B.3: ProjCoordTransGeoKey + double parameters).
  *
  * The GRIB projections walk meters from the first grid point, so they
  * carry no false origin; a GeoTIFF's model space IS the projected plane
  * with its false easting/northing and (for LCC) the natural-origin
  * latitude offset. [[ModelTransform]] folds those in:
  * `inverse(x - FE, y - FN + yOrigin)`, where `yOrigin = forward(lat0)._2`
  * (`-rho0` for LCC; 0 for the pole/equator-origin projections).
  * Scale-at-origin (k0, UPS' 0.994 and LCC-1SP variants) folds in exactly
  * by scaling BOTH semi-axes by k0: eccentricity is a ratio, so every
  * radius the formulas produce scales linearly. */
object TiffProjection {

  // public geodetic figures (EPSG 7030 / 7019 / 7001)
  private val Wgs84A = 6378137.0
  private val Wgs84B = 6356752.314245179
  private val Grs80B = 6356752.314140356
  private val Airy1830A = 6377563.396
  private val Airy1830B = 6356256.909237285 // a (1 - 1/299.3249646)

  /** Model (projected) x/y meters -> (lat, lon) degrees. `lonShiftDeg` is
    * the central meridian for projections whose GRIB form has none
    * (Mercator); LCC/PS carry theirs inside the projection. */
  final case class ModelTransform(proj: GribProjection,
      falseEasting: Double, falseNorthing: Double,
      yOrigin: Double, lonShiftDeg: Double = 0.0) extends Serializable {
    def toLatLon(x: Double, y: Double): (Double, Double) = {
      val (lat, lon0) = proj.inverse(x - falseEasting, y - falseNorthing + yOrigin)
      val lon = lon0 + lonShiftDeg
      (lat, if (lon > 180) lon - 360 else if (lon < -180) lon + 360 else lon)
    }
  }

  private def lcc(sp1: Double, sp2: Double, lat0: Double, lon0: Double,
      fe: Double, fn: Double, a: Double, b: Double): ModelTransform = {
    val p = LambertConformal(sp1, sp2, lon0, a, b)
    ModelTransform(p, fe, fn, yOrigin = p.forward(lat0, lon0)._2)
  }

  private def ps(latTs: Double, lon0: Double, fe: Double, fn: Double,
      a: Double, b: Double, k0: Double = 1.0): ModelTransform =
    ModelTransform(
      PolarStereographic(latTs, lon0, south = latTs < 0, a * k0, b * k0),
      fe, fn, yOrigin = 0.0)

  private def mercator(latTs: Double, lon0: Double, fe: Double, fn: Double,
      a: Double, b: Double, k0: Double = 1.0): ModelTransform =
    ModelTransform(Mercator(latTs, a * k0, b * k0), fe, fn,
      yOrigin = 0.0, lonShiftDeg = lon0)

  private def tm(lat0: Double, lon0: Double, fe: Double, fn: Double,
      a: Double, b: Double, k0: Double): ModelTransform = {
    val p = TransverseMercator(lon0, a * k0, b * k0)
    ModelTransform(p, fe, fn, yOrigin = p.forward(lat0, lon0)._2)
  }

  private def laea(lat0: Double, lon0: Double, fe: Double, fn: Double,
      a: Double, b: Double): ModelTransform =
    // the azimuthal origin IS the projection centre: forward(lat0, lon0)
    // is (0, 0) by construction, so only the false origin folds in
    ModelTransform(LambertAzimuthalEqualArea(lat0, lon0, a, b),
      fe, fn, yOrigin = 0.0)

  private def albers(sp1: Double, sp2: Double, lat0: Double, lon0: Double,
      fe: Double, fn: Double, a: Double, b: Double): ModelTransform = {
    val p = AlbersEqualArea(sp1, sp2, lon0, a, b)
    ModelTransform(p, fe, fn, yOrigin = p.forward(lat0, lon0)._2)
  }

  /** Well-known projected EPSG codes (parameters from the public EPSG
    * registry), or None for codes this table doesn't carry (the caller
    * falls through to user-defined GeoKeys, then to a directed error). */
  private def byEpsg(epsg: Int): Option[ModelTransform] = epsg match {
    // Web Mercator: spherical formulas on the WGS84 semi-major axis
    case 3857 => Some(mercator(0, 0, 0, 0, Wgs84A, Double.NaN))
    // World Mercator (WGS84 ellipsoid)
    case 3395 => Some(mercator(0, 0, 0, 0, Wgs84A, Wgs84B))
    // Antarctic Polar Stereographic (true scale 71S)
    case 3031 => Some(ps(-71, 0, 0, 0, Wgs84A, Wgs84B))
    // NSIDC Sea Ice Polar Stereographic South (70S)
    case 3976 => Some(ps(-70, 0, 0, 0, Wgs84A, Wgs84B))
    // NSIDC Sea Ice Polar Stereographic North (70N, central meridian 45W)
    case 3413 => Some(ps(70, -45, 0, 0, Wgs84A, Wgs84B))
    // Universal Polar Stereographic: k0 = 0.994 at the pole, FE=FN=2000 km
    case 32661 => Some(ps(90, 0, 2000000, 2000000, Wgs84A, Wgs84B, k0 = 0.994))
    case 32761 => Some(ps(-90, 0, 2000000, 2000000, Wgs84A, Wgs84B, k0 = 0.994))
    // RGF93 / Lambert-93 (France's national grid, GRS80)
    case 2154 => Some(lcc(49, 44, 46.5, 3, 700000, 6600000, Wgs84A, Grs80B))
    // NAD83 / Canada Atlas Lambert (GRS80)
    case 3978 => Some(lcc(49, 77, 49, -95, 0, 0, Wgs84A, Grs80B))
    // OSGB36 / British National Grid (Airy 1830)
    case 27700 => Some(tm(49, -2, 400000, -100000,
      Airy1830A, Airy1830B, k0 = 0.9996012717))
    // ETRS89-extended / LAEA Europe (the EFAS/CLC/Copernicus grid, GRS80)
    case 3035 => Some(laea(52, 10, 4321000, 3210000, Wgs84A, Grs80B))
    // NAD83 / Conus Albers (the USGS national-products grid, GRS80)
    case 5070 => Some(albers(29.5, 45.5, 23, -96, 0, 0, Wgs84A, Grs80B))
    // GDA94 / Australian Albers (GRS80)
    case 3577 => Some(albers(-18, -36, 0, 132, 0, 0, Wgs84A, Grs80B))
    // ETRS89 / UTM zones 28N-38N (25828-25838) and NAD83 / UTM zones
    // 1N-23N (26901-26923), both on GRS80; the WGS84 zones (326xx/327xx)
    // keep their existing codegen'd column path in TiffReader
    case z if z >= 25828 && z <= 25838 =>
      Some(tm(0, (z - 25800) * 6 - 183, 500000, 0,
        Wgs84A, Grs80B, k0 = 0.9996))
    case z if z >= 26901 && z <= 26923 =>
      Some(tm(0, (z - 26900) * 6 - 183, 500000, 0,
        Wgs84A, Grs80B, k0 = 0.9996))
    case _ => None
  }

  /** Resolve a projected CRS to a model->lat/lon transform, or throw a
    * directed [[Tiff.UnsupportedTiff]] naming what's missing. The caller
    * handles geographic and UTM model spaces before calling this. */
  def resolve(meta: Tiff.Meta): ModelTransform = {
    byEpsg(meta.epsg).getOrElse(fromGeoKeys(meta))
  }

  // GeoTIFF 1.1 projection-parameter GeoKeys (several writer conventions
  // per parameter; first present wins)
  private def fromGeoKeys(meta: Tiff.Meta): ModelTransform = {
    val dk = meta.geoDoubleKeys
    def d(keys: Int*): Option[Double] = keys.collectFirst {
      case k if dk.contains(k) => dk(k) }
    def d0(keys: Int*): Double = d(keys: _*).getOrElse(0.0)
    // resolve only when a supported transform needs it, so a missing
    // transform key reports ITS directed error, not the ellipsoid's
    lazy val (a, b) = ellipsoidOf(meta)
    val k0 = d(3092).getOrElse(1.0) // ProjScaleAtNatOriginGeoKey
    meta.geoShortKeys.get(3075) match { // ProjCoordTransGeoKey
      case Some(1) => // CT_TransverseMercator
        tm(d0(3081, 3089), d0(3080, 3088), d0(3082), d0(3083), a, b, k0)
      case Some(7) => // CT_Mercator: true scale at StdParallel1 OR k0
        mercator(d0(3078, 3081), d0(3080, 3088), d0(3082), d0(3083),
          a, b, k0)
      case Some(8) => // CT_LambertConfConic_2SP
        lcc(d(3078).getOrElse(throw Tiff.UnsupportedTiff(
            "LCC GeoKeys without ProjStdParallel1 (3078)")),
          d(3079).getOrElse(d0(3078)),
          d0(3085, 3081, 3089), d0(3084, 3080, 3088),
          d0(3086, 3082), d0(3087, 3083), a * k0, b * k0)
      case Some(9) => // CT_LambertConfConic_1SP (tangent; k0 scales axes)
        val lat0 = d(3081, 3089).getOrElse(throw Tiff.UnsupportedTiff(
          "LCC-1SP GeoKeys without ProjNatOriginLat (3081)"))
        lcc(lat0, lat0, lat0, d0(3080, 3088), d0(3082), d0(3083),
          a * k0, b * k0)
      case Some(17) => // CT_Equirectangular (plate carrée; sphere of a)
        ModelTransform(
          Equirectangular(d0(3078, 3081), d0(3080, 3088), a),
          d0(3082), d0(3083), yOrigin = 0.0)
      case Some(24) => // CT_Sinusoidal (the MODIS land grid)
        ModelTransform(Sinusoidal(d0(3080, 3088), a, b),
          d0(3082), d0(3083), yOrigin = 0.0)
      case Some(11) => // CT_AlbersEqualArea
        albers(d(3078).getOrElse(throw Tiff.UnsupportedTiff(
            "Albers GeoKeys without ProjStdParallel1 (3078)")),
          d(3079).getOrElse(d0(3078)),
          d0(3085, 3081, 3089), d0(3084, 3080, 3088),
          d0(3086, 3082), d0(3087, 3083), a, b)
      case Some(10) => // CT_LambertAzimEqualArea
        laea(d0(3089, 3081), d0(3088, 3080), d0(3086, 3082), d0(3087, 3083),
          a, b)
      case Some(15) => // CT_PolarStereographic
        val latTs = d(3081, 3078).getOrElse(throw Tiff.UnsupportedTiff(
          "polar-stereographic GeoKeys without ProjNatOriginLat (3081)"))
        ps(latTs, d0(3095, 3088, 3080), d0(3082), d0(3083), a, b, k0)
      case Some(other) => throw Tiff.UnsupportedTiff(
        s"coordinate transformation $other (ProjCoordTransGeoKey; supported: " +
          "1 transverse Mercator, 7 Mercator, 8/9 Lambert conformal, " +
          "10 Lambert azimuthal equal-area, 11 Albers equal-area, " +
          "15 polar stereographic, 17 equirectangular, 24 sinusoidal)")
      case None => throw Tiff.UnsupportedTiff(
        s"CRS EPSG:${meta.epsg} (supported: 4326 geographic, UTM " +
          "326xx/327xx/258xx/269xx, EPSG 3857/3395/3031/3976/3413/32661/" +
          "32761/2154/3035/3577/3978/5070/27700, or user-defined ProjCS " +
          "GeoKeys)")
    }
  }

  /** Semi-axes from GeoKeys: explicit axes (2057/2058), inverse flattening
    * (2059), or a well-known geographic CRS / datum / ellipsoid code. A
    * minor axis equal to the major declares a sphere (NaN -> the spherical
    * code path, bit-identical to e = 0). */
  private def ellipsoidOf(meta: Tiff.Meta): (Double, Double) = {
    val dk = meta.geoDoubleKeys
    val sk = meta.geoShortKeys
    dk.get(2057) match {
      case Some(a) =>
        val b = dk.get(2058).orElse(dk.get(2059).map(inv => a * (1 - 1 / inv)))
          .getOrElse(a)
        (a, if (b == a) Double.NaN else b)
      case None =>
        // GeographicTypeGeoKey (2048) / GeogEllipsoidGeoKey (2056)
        (sk.get(2048), sk.get(2056)) match {
          case (Some(4326), _) | (_, Some(7030)) => (Wgs84A, Wgs84B) // WGS84
          case (Some(4269 | 4258), _) | (_, Some(7019)) => (Wgs84A, Grs80B) // GRS80
          case _ => throw Tiff.UnsupportedTiff(
            "user-defined ProjCS without an ellipsoid (declare " +
              "GeogSemiMajorAxis/GeogSemiMinorAxis GeoKeys 2057/2058, or a " +
              "known GeographicType 2048: 4326/4269/4258)")
        }
    }
  }
}
