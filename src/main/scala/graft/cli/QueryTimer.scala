package graft.cli

import org.apache.spark.sql.SparkSession

/** Per-stage wall-clock profiler for the heavy queries — the in-repo
  * adjudication tool for bench-floor questions: reproduces the driver
  * bench's conditions (same session tuning, sf0.001 codegen warm-up, cold
  * data at the target SF) and prints one line per timed step.
  *
  * Usage: runMain graft.cli.QueryTimer <sfDir> <queryName> [reps]
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "q31_minhash_near_dups"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // codegen warm-up, like Bench
    (1 to reps).foreach { r =>
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[timer] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
