package graft.sources.grib

/** Inverse map projections for GRIB2 projected grids — Lambert conformal
  * conic (template 3.30, the NCEP HRRR/NAM regional grids), polar
  * stereographic (template 3.20), and Mercator (template 3.10). Spherical
  * AND ellipsoidal formulas from Snyder, "Map Projections — A Working
  * Manual" (USGS PP 1395, public; §7, §15, §21): regional NWP products
  * (HARMONIE, some ICON/COSMO exports) declare oblate shapes of earth
  * (code table 3.2 shapes 2/3/4/5/7/9), which eccodes handles via its
  * geoiterator — projecting them with a sphere would displace coordinates
  * by up to ~21 km. A projection is ellipsoidal when `minorAxis` differs
  * from `radius` (the semi-major axis); the spherical code path is kept
  * bit-identical for the e = 0 case. The grid walks projected space from
  * the FIRST point: forward-project (la1, lo1) once, then inverse-project
  * x0 + i*Dx, y0 + j*Dy per point. */
sealed trait GribProjection extends Serializable {
  /** Projected meters of the first grid point. */
  def forward(latDeg: Double, lonDeg: Double): (Double, Double)
  /** (lat, lon) degrees of projected meters. */
  def inverse(x: Double, y: Double): (Double, Double)
}

object GribProjection {

  val EarthRadius: Double = 6371229.0 // GRIB shape-of-earth 6 sphere

  /** Eccentricity from semi-axes; NaN minor means spherical. */
  private def eccOf(a: Double, b: Double): Double = {
    val bb = if (b.isNaN) a else b
    require(bb <= a && bb > 0, s"minor axis $bb exceeds major $a")
    math.sqrt(1.0 - (bb / a) * (bb / a))
  }

  /** Snyder 15-9 / 21-? "t" function: the isometric-colatitude factor
    * tan(pi/4 - phi/2) / [(1 - e sin phi)/(1 + e sin phi)]^(e/2).
    * For e = 0 this is plain tan(pi/4 - phi/2). */
  private def tsFun(phi: Double, e: Double): Double = {
    val esin = e * math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - esin) / (1 + esin), e / 2)
  }

  /** Snyder 14-15 "m": cos phi / sqrt(1 - e^2 sin^2 phi). */
  private def mFun(phi: Double, e: Double): Double = {
    val s = math.sin(phi)
    math.cos(phi) / math.sqrt(1 - e * e * s * s)
  }

  /** Invert tsFun: latitude from t (Snyder 7-9 fixed-point iteration;
    * converges in a handful of rounds for geodetic eccentricities). */
  private def phiFromTs(ts: Double, e: Double): Double = {
    var phi = math.Pi / 2 - 2 * math.atan(ts)
    var i = 0
    while (i < 12) {
      val esin = e * math.sin(phi)
      val next = math.Pi / 2 -
        2 * math.atan(ts * math.pow((1 - esin) / (1 + esin), e / 2))
      if (math.abs(next - phi) < 1e-13) { phi = next; i = 12 }
      else { phi = next; i += 1 }
    }
    phi
  }

  /** Snyder 3-12: the authalic-latitude q of a geodetic latitude —
    * shared by the equal-area projections (Albers, LAEA). */
  private def qFun(phi: Double, e: Double): Double = {
    val e2 = e * e
    val s = math.sin(phi)
    if (e == 0) 2 * s
    else (1 - e2) * (s / (1 - e2 * s * s) -
      (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
  }

  /** Invert [[qFun]]: the Snyder 3-16 fixed-point iteration from the
    * spherical seed (which IS the answer for e = 0). */
  private def phiFromQ(q: Double, e: Double): Double = {
    val e2 = e * e
    var p = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
    if (e == 0) return p
    var i = 0
    while (i < 12) {
      val s = math.sin(p)
      val om = 1 - e2 * s * s
      val next = p + (om * om / (2 * math.cos(p))) *
        (q / (1 - e2) - s / om +
          (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
      if (math.abs(next - p) < 1e-13) { p = next; i = 12 }
      else { p = next; i += 1 }
    }
    p
  }

  /** Snyder 3-21 meridional-arc coefficients (m0, m2, m4, m6) — shared
    * by transverse Mercator and ellipsoidal sinusoidal. */
  private def arcCoeffs(e2: Double): (Double, Double, Double, Double) = (
    1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256,
    3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024,
    15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024,
    35 * e2 * e2 * e2 / 3072)

  /** Snyder 3-26: footprint latitude from the rectifying latitude mu. */
  private def footprintLat(mu: Double, e2: Double): Double = {
    if (e2 == 0) return mu
    val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    mu + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
  }

  /** Lambert conformal conic, secant (latin1/latin2) or tangent
    * (latin1 == latin2); lov = orientation meridian. Ellipsoidal when
    * `minorAxis` < `radius` (Snyder §15). */
  final case class LambertConformal(latin1: Double, latin2: Double,
      lov: Double, radius: Double = EarthRadius,
      minorAxis: Double = Double.NaN) extends GribProjection {
    private val e = eccOf(radius, minorAxis)
    private val phi1 = math.toRadians(latin1)
    private val phi2 = math.toRadians(latin2)
    private val lam0 = math.toRadians(lov)
    private val n =
      if (e == 0) {
        if (math.abs(latin1 - latin2) < 1e-9) math.sin(phi1)
        else math.log(math.cos(phi1) / math.cos(phi2)) /
          math.log(math.tan(math.Pi / 4 + phi2 / 2) / math.tan(math.Pi / 4 + phi1 / 2))
      } else {
        if (math.abs(latin1 - latin2) < 1e-9) math.sin(phi1)
        else math.log(mFun(phi1, e) / mFun(phi2, e)) /
          math.log(tsFun(phi1, e) / tsFun(phi2, e))
      }
    // spherical F keeps the historical formulation (cos phi1 tan^n); the
    // ellipsoidal F is Snyder 15-10 on tsFun/mFun
    private val f =
      if (e == 0) math.cos(phi1) * math.pow(math.tan(math.Pi / 4 + phi1 / 2), n) / n
      else mFun(phi1, e) / (n * math.pow(tsFun(phi1, e), n))

    private def rho(phi: Double): Double =
      if (e == 0) radius * f / math.pow(math.tan(math.Pi / 4 + phi / 2), n)
      else radius * f * math.pow(tsFun(phi, e), n)

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val r = rho(math.toRadians(latDeg))
      val theta = n * normalize(math.toRadians(lonDeg) - lam0)
      (r * math.sin(theta), -r * math.cos(theta)) // y measured from the apex
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val r = math.signum(n) * math.sqrt(x * x + y * y)
      val theta = math.atan2(math.signum(n) * x, math.signum(n) * -y)
      val phi =
        if (e == 0) 2 * math.atan(math.pow(radius * f / r, 1 / n)) - math.Pi / 2
        else phiFromTs(math.pow(r / (radius * f), 1 / n), e)
      (math.toDegrees(phi), math.toDegrees(normalize(lam0 + theta / n)))
    }
  }

  /** Polar stereographic; lad = the latitude of true scale (60N/60S in
    * operational grids), lov = orientation, `south` for the S-pole aspect.
    * Ellipsoidal when `minorAxis` < `radius` (Snyder §21). */
  final case class PolarStereographic(lad: Double, lov: Double,
      south: Boolean, radius: Double = EarthRadius,
      minorAxis: Double = Double.NaN) extends GribProjection {
    private val e = eccOf(radius, minorAxis)
    private val phiC = math.toRadians(lad)
    private val lam0 = math.toRadians(lov)
    // scale at true-scale latitude: k0 * 2R = R (1 + sin |phiC|)
    private val twoRk0 = radius * (1 + math.sin(math.abs(phiC)))
    // ellipsoidal: rho = a * mC * ts(phi)/tsC (Snyder 21-34 with 14-15);
    // true scale AT the pole is the 0/0 limit — Snyder 21-33 closed form
    private val aMcOverTc =
      if (e == 0) 0.0
      else if (math.abs(math.abs(lad) - 90.0) < 1e-9)
        2 * radius / math.sqrt(
          math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
      else radius * mFun(math.abs(phiC), e) / tsFun(math.abs(phiC), e)

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val dLam = normalize(math.toRadians(lonDeg) - lam0)
      if (!south) {
        val r =
          if (e == 0) twoRk0 * math.tan(math.Pi / 4 - phi / 2)
          else aMcOverTc * tsFun(phi, e)
        (r * math.sin(dLam), -r * math.cos(dLam))
      } else {
        val r =
          if (e == 0) twoRk0 * math.tan(math.Pi / 4 + phi / 2)
          else aMcOverTc * tsFun(-phi, e) // mirror: S aspect on -phi
        (r * math.sin(dLam), r * math.cos(dLam))
      }
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val r = math.sqrt(x * x + y * y)
      if (!south) {
        val phi =
          if (e == 0) math.Pi / 2 - 2 * math.atan(r / twoRk0)
          else phiFromTs(r / aMcOverTc, e)
        val lam = lam0 + math.atan2(x, -y)
        (math.toDegrees(phi), math.toDegrees(normalize(lam)))
      } else {
        val phi =
          if (e == 0) 2 * math.atan(r / twoRk0) - math.Pi / 2
          else -phiFromTs(r / aMcOverTc, e)
        val lam = lam0 + math.atan2(x, y)
        (math.toDegrees(phi), math.toDegrees(normalize(lam)))
      }
    }
  }

  /** Mercator (template 3.10) with true scale at `lad`. Ellipsoidal when
    * `minorAxis` < `radius` (Snyder §7). */
  final case class Mercator(lad: Double,
      radius: Double = EarthRadius,
      minorAxis: Double = Double.NaN) extends GribProjection {
    private val e = eccOf(radius, minorAxis)
    private val k =
      if (e == 0) math.cos(math.toRadians(lad))
      else mFun(math.toRadians(lad), e) // true scale along lad: k0 = m(lad)

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val y =
        if (e == 0) radius * k * math.log(math.tan(math.Pi / 4 + phi / 2))
        else -radius * k * math.log(tsFun(phi, e)) // ln tan(pi/4+phi/2)*(..)
      (radius * k * math.toRadians(lonDeg), y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val phi =
        if (e == 0) 2 * math.atan(math.exp(y / (radius * k))) - math.Pi / 2
        else phiFromTs(math.exp(-y / (radius * k)), e)
      (math.toDegrees(phi),
        math.toDegrees(normalize(x / (radius * k))))
    }
  }

  /** Albers equal-area conic (Snyder §14) — the continental-statistics
    * projection (CONUS EPSG 5070, Australian 3577, Canadian 3573-family).
    * Spherical and ellipsoidal; the ellipsoidal inverse recovers latitude
    * from the authalic q via the Snyder 3-16 fixed-point iteration. Like
    * the other conics, `y` is measured from the APEX (no rho0 offset) so
    * GRIB-style walks need no origin; map callers fold rho(lat0) in as a
    * northing offset. */
  final case class AlbersEqualArea(latin1: Double, latin2: Double,
      lov: Double, radius: Double = EarthRadius,
      minorAxis: Double = Double.NaN) extends GribProjection {
    private val e = eccOf(radius, minorAxis)
    private val e2 = e * e
    private val phi1 = math.toRadians(latin1)
    private val phi2 = math.toRadians(latin2)
    private val lam0 = math.toRadians(lov)
    private val n =
      if (math.abs(latin1 - latin2) < 1e-9) math.sin(phi1)
      else if (e == 0) (math.sin(phi1) + math.sin(phi2)) / 2
      else (mFun(phi1, e) * mFun(phi1, e) - mFun(phi2, e) * mFun(phi2, e)) /
        (qFun(phi2, e) - qFun(phi1, e))
    private val cBig =
      if (e == 0) math.pow(math.cos(phi1), 2) + 2 * n * math.sin(phi1)
      else mFun(phi1, e) * mFun(phi1, e) + n * qFun(phi1, e)

    private def rho(q: Double): Double =
      radius * math.sqrt(cBig - n * q) / n

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val r = rho(qFun(math.toRadians(latDeg), e))
      val theta = n * normalize(math.toRadians(lonDeg) - lam0)
      (r * math.sin(theta), -r * math.cos(theta)) // y from the apex
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val r = math.signum(n) * math.sqrt(x * x + y * y)
      val theta = math.atan2(math.signum(n) * x, math.signum(n) * -y)
      val q = (cBig - (r * n / radius) * (r * n / radius)) / n
      val phi = phiFromQ(q, e)
      (math.toDegrees(phi), math.toDegrees(normalize(lam0 + theta / n)))
    }
  }

  /** Geostationary / space view (GRIB2 template 3.90, the CF
    * `geostationary` mapping — Meteosat SEVIRI full disks, GOES fixed
    * grids). Unlike the meter-walking projections this plane is SCAN
    * ANGLES in radians: `forward` maps geodetic (lat, lon) to (x, y) view
    * angles from the satellite (at `height` above the ellipsoid over
    * `lon0`), `inverse` intersects the view ray with the ellipsoid
    * (the GOES-R PUG / CGMS navigation equations) and converts geocentric
    * to geodetic latitude. `sweepX` selects the gimbal order (GOES "x",
    * Meteosat "y" — they agree on the scan axes and differ off-axis).
    * Rays beyond the limb return NaN coordinates. */
  /** Lambert azimuthal equal-area (GRIB2 template 3.140 — the EFAS/CEMS
    * EPSG:3035-style European grids). Spherical: Snyder 24-1/24-2 forward,
    * 20-14..20-18 inverse. Ellipsoidal: Snyder 24-19..24-26 with authalic
    * latitudes (3-11/3-12), inverse 24-27..24-34 + the 3-16 fixed-point
    * iteration; spherical path is the axes-equal limit. */
  final case class LambertAzimuthalEqualArea(standardParallel: Double,
      centralLon: Double, radius: Double = EarthRadius,
      minorAxis: Double = Double.NaN) extends GribProjection {
    private val e = eccOf(radius, minorAxis)
    private val e2 = e * e
    private val phi1 = math.toRadians(standardParallel)
    private val lam0 = math.toRadians(centralLon)
    private val qp = qFun(math.Pi / 2, e)
    private val beta1 = if (e == 0) phi1 else math.asin(qFun(phi1, e) / qp)
    private val rq = if (e == 0) radius else radius * math.sqrt(qp / 2)
    private val dBig =
      if (e == 0) 1.0
      else radius * mFun(phi1, e) / (rq * math.cos(beta1))
    private val sinB1 = math.sin(beta1)
    private val cosB1 = math.cos(beta1)
    private def clamp1(v: Double): Double = math.max(-1.0, math.min(1.0, v))

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val dLam = normalize(math.toRadians(lonDeg) - lam0)
      val beta = if (e == 0) phi else math.asin(clamp1(qFun(phi, e) / qp))
      val sinB = math.sin(beta)
      val cosB = math.cos(beta)
      val bBig = rq * math.sqrt(
        2 / (1 + sinB1 * sinB + cosB1 * cosB * math.cos(dLam)))
      (bBig * dBig * cosB * math.sin(dLam),
        (bBig / dBig) * (cosB1 * sinB - sinB1 * cosB * math.cos(dLam)))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val rho = math.hypot(x / dBig, dBig * y)
      if (rho < 1e-9)
        return (math.toDegrees(phi1), math.toDegrees(normalize(lam0)))
      val ce = 2 * math.asin(clamp1(rho / (2 * rq)))
      val sinCe = math.sin(ce)
      val cosCe = math.cos(ce)
      val sinBeta = cosCe * sinB1 + dBig * y * sinCe * cosB1 / rho
      val lam = lam0 + math.atan2(x * sinCe,
        dBig * rho * cosB1 * cosCe - dBig * dBig * y * sinB1 * sinCe)
      // q back from the authalic latitude, then the shared Snyder 3-16
      // (for e = 0, qp = 2 and the spherical seed asin(q/2) = asin(sinBeta)
      // IS the answer)
      val phi = phiFromQ(qp * clamp1(sinBeta), e)
      (math.toDegrees(phi), math.toDegrees(normalize(lam)))
    }
  }

  final case class Geostationary(lon0: Double, height: Double,
      sweepX: Boolean = false,
      radius: Double = EarthRadius,
      minorAxis: Double = Double.NaN) extends GribProjection {
    private val b = if (minorAxis.isNaN) radius else minorAxis
    private val h = height + radius
    private val ratio = (radius / b) * (radius / b)
    private val e2 = 1.0 - (b / radius) * (b / radius)
    private val lam0 = math.toRadians(lon0)

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phiC = math.atan(math.tan(math.toRadians(latDeg)) / ratio)
      val rc = b / math.sqrt(1.0 - e2 * math.cos(phiC) * math.cos(phiC))
      val dLam = normalize(math.toRadians(lonDeg) - lam0)
      val pX = rc * math.cos(phiC) * math.cos(dLam)
      val pY = rc * math.cos(phiC) * math.sin(dLam)
      val pZ = rc * math.sin(phiC)
      val r = math.sqrt((h - pX) * (h - pX) + pY * pY + pZ * pZ)
      if (sweepX) (math.asin(pY / r), math.atan(pZ / (h - pX)))
      else (math.atan(pY / (h - pX)), math.asin(pZ / r))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val cx = math.cos(x); val sx = math.sin(x)
      val cy = math.cos(y); val sy = math.sin(y)
      val av =
        if (sweepX) sx * sx + cx * cx * (cy * cy + ratio * sy * sy)
        else cy * cy + ratio * sy * sy
      val bv = -2.0 * h * cx * cy
      val cv = h * h - radius * radius
      val disc = bv * bv - 4.0 * av * cv
      if (disc < 0) return (Double.NaN, Double.NaN) // beyond the limb
      val t = (-bv - math.sqrt(disc)) / (2.0 * av)
      val pX = h - t * cx * cy
      val (pY, pZ) =
        if (sweepX) (t * sx, t * cx * sy)
        else (t * sx * cy, t * sy)
      (math.toDegrees(math.atan(ratio * pZ / math.sqrt(pX * pX + pY * pY))),
        math.toDegrees(normalize(lam0 + math.atan2(pY, pX))))
    }
  }

  /** Sinusoidal (Snyder §30) — the MODIS land-product tile grid (sphere
    * R = 6371007.181) and other equal-area EO grids. Spherical and
    * ellipsoidal (ellipsoidal y is the meridional arc; latitude recovers
    * through the same footprint series transverse Mercator uses). */
  final case class Sinusoidal(lon0: Double,
      radius: Double = EarthRadius,
      minorAxis: Double = Double.NaN) extends GribProjection {
    private val e2 = { val e = eccOf(radius, minorAxis); e * e }
    private val lam0 = math.toRadians(lon0)
    private val (m0, m2, m4, m6) = arcCoeffs(e2)

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val dLam = normalize(math.toRadians(lonDeg) - lam0)
      val s = math.sin(phi)
      val x = radius * dLam * math.cos(phi) / math.sqrt(1 - e2 * s * s)
      val y = radius * (m0 * phi - m2 * math.sin(2 * phi) +
        m4 * math.sin(4 * phi) - m6 * math.sin(6 * phi))
      (x, y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val phi = footprintLat(y / (radius * m0), e2)
      val s = math.sin(phi)
      val lam =
        if (math.abs(math.cos(phi)) < 1e-12) lam0 // the pole row
        else lam0 + x * math.sqrt(1 - e2 * s * s) / (radius * math.cos(phi))
      (math.toDegrees(phi), math.toDegrees(normalize(lam)))
    }
  }

  /** Equirectangular / plate carrée with true scale at `lat1` (Snyder §12)
    * — the "meters that are really degrees" grids (EPSG 32662/54001-style
    * exports). Linear both ways; spherical by definition (the EPSG method
    * uses the sphere of the declared ellipsoid's semi-major axis). */
  final case class Equirectangular(lat1: Double, lon0: Double,
      radius: Double = EarthRadius) extends GribProjection {
    private val k = math.cos(math.toRadians(lat1))
    private val lam0 = math.toRadians(lon0)
    def forward(latDeg: Double, lonDeg: Double): (Double, Double) =
      (radius * k * normalize(math.toRadians(lonDeg) - lam0),
        radius * math.toRadians(latDeg))
    def inverse(x: Double, y: Double): (Double, Double) =
      (math.toDegrees(y / radius),
        math.toDegrees(normalize(lam0 + x / (radius * k))))
  }

  /** Transverse Mercator (Snyder §8, the series forms) — the projection of
    * the UTM zones and the national grids built on them (OSGB, ETRS89/TM,
    * NZTM). `y` is measured from the EQUATOR (no M0 subtraction); callers
    * with a non-zero natural-origin latitude fold `k0·M(lat0)` in as a
    * false-northing offset, and scale-at-origin k0 folds in by scaling
    * BOTH semi-axes (every length the series produces is linear in `a` at
    * fixed eccentricity). Truncation: the standard 8-9..8-17 series,
    * accurate to sub-mm within a zone's ±3° and to ~1 mm at ±5°. */
  final case class TransverseMercator(lon0: Double,
      radius: Double = EarthRadius,
      minorAxis: Double = Double.NaN) extends GribProjection {
    private val e2 = { val e = eccOf(radius, minorAxis); e * e }
    private val ep2 = e2 / (1 - e2) // e'^2
    private val lam0 = math.toRadians(lon0)
    private val (m0, m2, m4, m6) = arcCoeffs(e2)
    private def arc(phi: Double): Double =
      radius * (m0 * phi - m2 * math.sin(2 * phi) + m4 * math.sin(4 * phi) -
        m6 * math.sin(6 * phi))

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val sin = math.sin(phi); val cos = math.cos(phi)
      val t = (sin / cos) * (sin / cos)
      val c = ep2 * cos * cos
      val bigA = normalize(math.toRadians(lonDeg) - lam0) * cos
      val nu = radius / math.sqrt(1 - e2 * sin * sin)
      val x = nu * (bigA + (1 - t + c) * math.pow(bigA, 3) / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(bigA, 5) / 120)
      val y = arc(phi) + nu * (sin / cos) * (bigA * bigA / 2 +
        (5 - t + 9 * c + 4 * c * c) * math.pow(bigA, 4) / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(bigA, 6) / 720)
      (x, y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val phi1 = footprintLat(y / (radius * m0), e2)
      val sin1 = math.sin(phi1); val cos1 = math.cos(phi1)
      val t1 = (sin1 / cos1) * (sin1 / cos1)
      val c1 = ep2 * cos1 * cos1
      val n1 = radius / math.sqrt(1 - e2 * sin1 * sin1)
      val r1 = radius * (1 - e2) / math.pow(1 - e2 * sin1 * sin1, 1.5)
      val dd = x / n1
      val phi = phi1 - (n1 * (sin1 / cos1) / r1) * (dd * dd / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(dd, 4) / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) *
          math.pow(dd, 6) / 720)
      val lam = lam0 + (dd - (1 + 2 * t1 + c1) * math.pow(dd, 3) / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) *
          math.pow(dd, 5) / 120) / cos1
      (math.toDegrees(phi), math.toDegrees(normalize(lam)))
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
