package graft.sources.grib

/** Gaussian grid latitudes (GRIB2 grid template 3.40 / GRIB1 grid type 4):
  * the 2N parallels of an N-resolution Gaussian grid sit at the roots of
  * the Legendre polynomial P_2N(sin lat) — the quadrature grid ECMWF's
  * models output natively (the reference reads it via cfgrib/eccodes).
  * Roots via Newton iteration on the P_n recurrence (standard
  * Gauss-Legendre node computation, e.g. Numerical Recipes §4.6 — public
  * algorithm). */
object GaussianGrid {

  /** The 2n Gaussian latitudes in degrees, north to south. Cached — N is
    * one of a handful of operational resolutions (N32..N1280). */
  def latitudes(n: Int): Array[Double] = cache.computeIfAbsent(n, compute)

  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()

  private val compute = new java.util.function.Function[Int, Array[Double]] {
    def apply(n: Int): Array[Double] = {
      val m = 2 * n // polynomial degree = number of parallels
      val roots = new Array[Double](m)
      var i = 0
      while (i < m / 2) {
        // initial guess (Tricomi), then Newton on (P_m, P'_m)
        var x = math.cos(math.Pi * (i + 0.75) / (m + 0.5))
        var delta = 1.0
        var iter = 0
        while (math.abs(delta) > 1e-15 && iter < 100) {
          val (p, dp) = legendre(m, x)
          delta = -p / dp
          x += delta
          iter += 1
        }
        roots(i) = x // positive root: northern hemisphere
        roots(m - 1 - i) = -x
        i += 1
      }
      roots.map(x => math.toDegrees(math.asin(x)))
    }
  }

  /** (P_n(x), P'_n(x)) via the three-term recurrence. */
  private def legendre(n: Int, x: Double): (Double, Double) = {
    var p0 = 1.0
    var p1 = x
    var k = 2
    while (k <= n) {
      val p2 = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
      p0 = p1
      p1 = p2
      k += 1
    }
    val dp = n * (x * p1 - p0) / (x * x - 1.0)
    (p1, dp)
  }

  /** Row latitudes for a grid whose first row is `la1`: the consecutive
    * run of `nj` Gaussian parallels starting at the one nearest `la1`
    * (GRIB encodes la1/la2 in millidegrees/microdegrees, so exact float
    * equality is never available). */
  def rowLatitudes(n: Int, la1: Double, nj: Int): Array[Double] = {
    val all = latitudes(n)
    var start = 0
    var best = Double.MaxValue
    var i = 0
    while (i < all.length) {
      val d = math.abs(all(i) - la1)
      if (d < best) { best = d; start = i }
      i += 1
    }
    require(start + nj <= all.length,
      s"Gaussian grid rows $start+$nj exceed the 2N=${all.length} parallels")
    java.util.Arrays.copyOfRange(all, start, start + nj)
  }
}
