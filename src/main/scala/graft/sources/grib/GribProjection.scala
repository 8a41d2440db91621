package graft.sources.grib

/** Inverse map projections for GRIB2 projected grids — Lambert conformal
  * conic (template 3.30, the NCEP HRRR/NAM regional grids) and polar
  * stereographic (template 3.20). Spherical formulas from Snyder, "Map
  * Projections — A Working Manual" (USGS PP 1395, public; §15 and §21),
  * matching GRIB's spherical earth conventions. The grid walks projected
  * space from the FIRST point: forward-project (la1, lo1) once, then
  * inverse-project x0 + i*Dx, y0 + j*Dy per point. */
sealed trait GribProjection extends Serializable {
  /** Projected meters of the first grid point. */
  def forward(latDeg: Double, lonDeg: Double): (Double, Double)
  /** (lat, lon) degrees of projected meters. */
  def inverse(x: Double, y: Double): (Double, Double)
}

object GribProjection {

  val EarthRadius: Double = 6371229.0 // GRIB shape-of-earth 6 sphere

  /** Lambert conformal conic, secant (latin1/latin2) or tangent
    * (latin1 == latin2); lov = orientation meridian. */
  final case class LambertConformal(latin1: Double, latin2: Double,
      lov: Double, radius: Double = EarthRadius) extends GribProjection {
    private val phi1 = math.toRadians(latin1)
    private val phi2 = math.toRadians(latin2)
    private val lam0 = math.toRadians(lov)
    private val n =
      if (math.abs(latin1 - latin2) < 1e-9) math.sin(phi1)
      else math.log(math.cos(phi1) / math.cos(phi2)) /
        math.log(math.tan(math.Pi / 4 + phi2 / 2) / math.tan(math.Pi / 4 + phi1 / 2))
    private val f = math.cos(phi1) * math.pow(math.tan(math.Pi / 4 + phi1 / 2), n) / n

    private def rho(phi: Double): Double =
      radius * f / math.pow(math.tan(math.Pi / 4 + phi / 2), n)

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val r = rho(math.toRadians(latDeg))
      val theta = n * normalize(math.toRadians(lonDeg) - lam0)
      (r * math.sin(theta), -r * math.cos(theta)) // y measured from the apex
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val r = math.signum(n) * math.sqrt(x * x + y * y)
      val theta = math.atan2(math.signum(n) * x, math.signum(n) * -y)
      val phi = 2 * math.atan(math.pow(radius * f / r, 1 / n)) - math.Pi / 2
      (math.toDegrees(phi), math.toDegrees(normalize(lam0 + theta / n)))
    }
  }

  /** Polar stereographic; lad = the latitude of true scale (60N/60S in
    * operational grids), lov = orientation, `south` for the S-pole aspect. */
  final case class PolarStereographic(lad: Double, lov: Double,
      south: Boolean, radius: Double = EarthRadius) extends GribProjection {
    private val phiC = math.toRadians(lad)
    private val lam0 = math.toRadians(lov)
    // scale at true-scale latitude: k0 * 2R = R (1 + sin |phiC|)
    private val twoRk0 = radius * (1 + math.sin(math.abs(phiC)))

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val dLam = normalize(math.toRadians(lonDeg) - lam0)
      if (!south) {
        val r = twoRk0 * math.tan(math.Pi / 4 - phi / 2)
        (r * math.sin(dLam), -r * math.cos(dLam))
      } else {
        val r = twoRk0 * math.tan(math.Pi / 4 + phi / 2)
        (r * math.sin(dLam), r * math.cos(dLam))
      }
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val r = math.sqrt(x * x + y * y)
      if (!south) {
        val phi = math.Pi / 2 - 2 * math.atan(r / twoRk0)
        val lam = lam0 + math.atan2(x, -y)
        (math.toDegrees(phi), math.toDegrees(normalize(lam)))
      } else {
        val phi = 2 * math.atan(r / twoRk0) - math.Pi / 2
        val lam = lam0 + math.atan2(x, y)
        (math.toDegrees(phi), math.toDegrees(normalize(lam)))
      }
    }
  }

  /** Mercator (template 3.10) with true scale at `lad`. */
  final case class Mercator(lad: Double,
      radius: Double = EarthRadius) extends GribProjection {
    private val k = math.cos(math.toRadians(lad))

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      (radius * k * math.toRadians(lonDeg),
        radius * k * math.log(math.tan(math.Pi / 4 + phi / 2)))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val phi = 2 * math.atan(math.exp(y / (radius * k))) - math.Pi / 2
      (math.toDegrees(phi),
        math.toDegrees(normalize(x / (radius * k))))
    }
  }

  /** Rotated latitude/longitude (GRIB2 template 3.1, GRIB1 grid type 10 —
    * the COSMO / ICON-EU / HARMONIE regional-model grids). Unlike the
    * projected grids this is not a meters walk: grid points are REGULAR in
    * the rotated spherical frame, so "projected space" here is rotated
    * DEGREES — `forward` maps true (lat, lon) to (rotated lon, rotated lat)
    * and `inverse` maps rotated (lon, lat) back to true (lat, lon).
    *
    * The rotated frame is defined by the true-frame coordinates of its
    * SOUTH pole (the GRIB convention) plus an optional rotation `angle`
    * about the rotated polar axis. Composition (unit-sphere rotation
    * matrices): v_true = Rz(lonPole) * Ry(-(90 + latPole)) * Rz(-angle) *
    * v_rot, which reduces to the identity for the unrotated pole
    * (-90, 0, 0). Spherical trig per WMO GRIB2 code table 3.1 notes /
    * COSMO public documentation.
    */
  final case class RotatedLatLon(southPoleLat: Double, southPoleLon: Double,
      angle: Double = 0.0) extends GribProjection {
    private val theta = math.toRadians(90.0 + southPoleLat) // tilt from identity
    private val lamP = math.toRadians(southPoleLon)
    private val gamma = math.toRadians(angle)
    private val ct = math.cos(theta)
    private val st = math.sin(theta)

    /** True (lat, lon) degrees -> (rotated lon, rotated lat) degrees. */
    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = normalize(math.toRadians(lonDeg) - lamP)
      val x = math.cos(phi) * math.cos(lam)
      val y = math.cos(phi) * math.sin(lam)
      val z = math.sin(phi)
      // Ry(theta) tilts the true pole onto the rotated pole axis
      val x1 = x * ct + z * st
      val z1 = -x * st + z * ct
      val latR = math.toDegrees(math.asin(math.max(-1.0, math.min(1.0, z1))))
      val lonR = math.toDegrees(normalize(math.atan2(y, x1) + gamma))
      (lonR, latR)
    }

    /** Rotated (lon, lat) degrees -> true (lat, lon) degrees. */
    def inverse(lonR: Double, latR: Double): (Double, Double) = {
      val phi = math.toRadians(latR)
      val lam = normalize(math.toRadians(lonR) - gamma)
      val x = math.cos(phi) * math.cos(lam)
      val y = math.cos(phi) * math.sin(lam)
      val z = math.sin(phi)
      val x1 = x * ct - z * st
      val z1 = x * st + z * ct
      val lat = math.toDegrees(math.asin(math.max(-1.0, math.min(1.0, z1))))
      val lon = math.toDegrees(normalize(math.atan2(y, x1) + lamP))
      (lat, lon)
    }
  }

  private def normalize(lam: Double): Double = {
    var l = lam
    while (l > math.Pi) l -= 2 * math.Pi
    while (l < -math.Pi) l += 2 * math.Pi
    l
  }
}
