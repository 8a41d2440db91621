package graft

/** Once-per-JVM memoized fixture synthesis for the oracle queries.
  *
  * Format queries read deterministic artifacts (GRIB/TIFF/zarr/WARC/...)
  * synthesized from the sf tables; building them INSIDE the query closure
  * taxed every bench rep with the write and mixed write cost into read
  * timings. Keying the build by (fixture key, sf dir) makes rep 1 pay the
  * synthesis once and reps 2..N (plus same-session re-runs) time the READ
  * path only. Different scale factors build distinct fixtures; the build
  * closure runs at most once per key per JVM (computeIfAbsent's mutual
  * exclusion), so concurrent callers cannot observe a half-written dir. */
object Fixtures {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** The memoized fixture DIRECTORY for (key, sfDir); `build` populates a
    * fresh temp dir on first use. */
  def dir(key: String, sfDir: String)(build: String => Unit): String =
    cache.computeIfAbsent((key, sfDir), { kv: (String, String) =>
      val d = java.nio.file.Files.createTempDirectory(kv._1).toString
      build(d)
      d
    })

  /** A memoized fixture FILE at `<dir>/<file>`; `build` receives the full
    * path and writes it on first use. */
  def path(key: String, sfDir: String, file: String)(
      build: String => Unit): String =
    dir(key, sfDir)(d => build(s"$d/$file")) + "/" + file
}
