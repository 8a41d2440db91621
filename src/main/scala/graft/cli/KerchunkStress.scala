package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.hdf5.{Hdf5Writer => HW}
import graft.sources.zarr.Kerchunk

/** Scale-shape evidence for the kerchunk virtualization path: a YEAR of
  * daily netCDF-4 files (each on its own CF time base, deflate+shuffle
  * chunked) indexed in parallel and concatenated into one virtual store,
  * then queried whole-archive and with a one-week predicate. What the
  * numbers must show for the 100 TB claim to hold:
  *  - the scan is one task per file and the driver holds only refs paths;
  *  - combine is a driver-side metadata pass, O(chunks) not O(bytes);
  *  - the combined refs json stays KBs/MBs;
  *  - a narrow time predicate plans ~window/year of the partitions.
  *
  * Usage: runMain graft.cli.KerchunkStress [workDir] [days]
  * (defaults /tmp/graft-kerchunk-stress, 365).
  */
object KerchunkStress {
  def main(args: Array[String]): Unit = {
    val work = if (args.length > 0) args(0) else "/tmp/graft-kerchunk-stress"
    val days = if (args.length > 1) args(1).toInt else 365
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("kerchunk-stress").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nt = 4; val nlat = 40; val nlon = 50
    val dir = s"$work/days"
    new java.io.File(dir).mkdirs()
    val t0 = System.nanoTime()
    val start = java.time.LocalDate.of(2025, 1, 1)
    for (d <- 0 until days) {
      val day = start.plusDays(d)
      val vals = (0 until nt * nlat * nlon).map(i =>
        ((d * 7919 + i * 13) % 4001).toDouble)
      HW.write(f"$dir/era_$day.nc", Seq(
        HW.VarSpec("time", Seq("time"), Seq(nt), (0 until nt).map(_ * 6.0),
          units = Some(s"hours since $day")),
        HW.VarSpec("lat", Seq("lat"), Seq(nlat),
          (0 until nlat).map(60.0 - _), dtype = "f8"),
        HW.VarSpec("lon", Seq("lon"), Seq(nlon),
          (0 until nlon).map(_ * 0.5), dtype = "f8"),
        HW.VarSpec("t2m", Seq("time", "lat", "lon"), Seq(nt, nlat, nlon),
          vals, dtype = "i2", chunks = Some(Seq(nt, nlat / 2, nlon / 2)),
          deflate = true, shuffle = true,
          scaleFactor = Some(0.1), addOffset = Some(200.0))))
    }
    val tWrite = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val refs = Kerchunk.scanAllSpark(spark, s"$dir/*.nc", outDir = s"$work/refs")
    val tScan = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val combined = Kerchunk.combine(
      spark.sparkContext.hadoopConfiguration, refs)
    val tCombine = (System.nanoTime() - t2) / 1e9
    val cPath = s"$work/combined.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(cPath),
      combined.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(f"[stress] fixtures: $days files written in $tWrite%.1f s; " +
      f"scanAllSpark $tScan%.2f s (${refs.size} refs); " +
      f"combine $tCombine%.2f s; refs json ${combined.length / 1024} KiB")

    def timed[A](what: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[stress] $what: ${(System.nanoTime() - s) / 1e9}%.2f s")
      r
    }
    val df = spark.read.format("zarr").load(cPath)
    println(s"[stress] combined partitions: ${df.rdd.getNumPartitions}")
    val full = timed("full-year mean")(
      df.agg(avg($"t2m")).head().getDouble(0))
    val week = df.filter(
      $"time" >= java.time.LocalDateTime.of(2025, 6, 1, 0, 0) &&
        $"time" < java.time.LocalDateTime.of(2025, 6, 8, 0, 0))
    println(s"[stress] one-week partitions: ${week.rdd.getNumPartitions}")
    val wk = timed("one-week mean")(week.agg(avg($"t2m")).head().getDouble(0))
    val rows = timed("full-year count")(df.count())
    println(f"[stress] year mean $full%.4f, week mean $wk%.4f, rows $rows")
    spark.stop()
  }
}
