package graft.cli

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query structural profiler for the optimization rounds: reproduces the
  * driver bench's conditions (same session tuning, sf0.001 codegen warm-up,
  * cold cache per rep, `count()` action) and reports, for each query, the
  * numbers the optimization guide says to look at FIRST (§1, §7.2): wall
  * seconds, Spark job count, stage count, task count, summed executor task
  * time, shuffle bytes written, and input bytes — plus the
  * `.explain("formatted")` text written to a directory so plan shapes
  * (Exchange count, join strategy, PushedFilters) can be diffed before/after.
  *
  * Reps > 1 run as bench-style INTERLEAVED full passes (pass 1 over every
  * query, then pass 2, ...) and each query reports its MIN wall — the same
  * ambient-noise defense Bench uses (this host shows random multi-second
  * stalls; a single rep can read 5-10x high).
  *
  * Usage: runMain graft.cli.QueryProfile <sfDir> <planOutDir|-> [namesCsv|all] [reps]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val planDir = if (args.length > 1) args(1) else "-"
    val namesArg = if (args.length > 2) args(2) else "all"
    val reps = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    val inventory = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    val selected =
      if (namesArg == "all") inventory
      else {
        val want = namesArg.split(",").toSet
        inventory.filter { case (n, _) => want.exists(n.startsWith) }
      }

    // task/stage/job counters (local mode: listener events are in-process)
    object L extends SparkListener {
      var jobs, stages, tasks = 0
      var taskTimeMs, shuffleWrite, input = 0L
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs += m.executorRunTime
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          input += m.inputMetrics.bytesRead
        }
      }
      def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; shuffleWrite = 0; input = 0 }
    }
    spark.sparkContext.addSparkListener(L)

    // warm-up like Bench: classloading + codegen on the smoke SF
    selected.foreach { case (name, fn) =>
      spark.sharedState.cacheManager.clearCache()
      try fn(spark, "/root/testdata/sf0.001").count() catch {
        case t: Throwable => System.err.println(s"[profile] warmup error $name: $t")
      }
    }

    final case class M(wall: Double, jobs: Int, stages: Int, tasks: Int,
      taskSec: Double, shufMB: Double, inMB: Double)
    def runOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dumpPlan: Boolean): Either[String, M] = {
      spark.sharedState.cacheManager.clearCache()
      try {
        // timer starts BEFORE fn(): queries with driver-side work inside the
        // builder (iterative loops, fixture reads, model collects) must be
        // charged for it, exactly as Bench.timeOnce does
        Thread.sleep(50)
        L.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50) // drain the async listener bus before reading counters
        if (dumpPlan && planDir != "-") {
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(planDir))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(planDir, s"$name.txt"), plan)
        }
        Right(M(wall, L.jobs, L.stages, L.tasks, L.taskTimeMs / 1e3,
          L.shuffleWrite / 1e6, L.input / 1e6))
      } catch {
        case t: Throwable => Left(
          s"${t.getClass.getName}: ${Option(t.getMessage).getOrElse("").take(120)}")
      }
    }
    // interleaved passes; report each query's MIN-wall rep
    val passes = (1 to reps).map { p =>
      selected.map { case (name, fn) => name -> runOnce(name, fn, p == 1) }.toMap
    }
    println(f"${"query"}%-34s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"taskSec"}%8s ${"shufMB"}%7s ${"inMB"}%7s")
    selected.foreach { case (name, _) =>
      val rs = passes.map(_(name))
      rs.collectFirst { case Left(e) => e } match {
        case Some(e) => println(s"$name ERROR: $e")
        case None =>
          val m = rs.collect { case Right(m) => m }.minBy(_.wall)
          println(f"$name%-34s ${m.wall}%7.3f ${m.jobs}%5d ${m.stages}%6d ${m.tasks}%6d ${m.taskSec}%8.2f ${m.shufMB}%7.1f ${m.inMB}%7.1f")
      }
    }
    spark.stop()
  }
}
