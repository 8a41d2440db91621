package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary measurement scratchpad (not committed)
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })

    def ccRun(d: String): (Long, Long, Double) = {
      spark.sharedState.cacheManager.clearCache()
      val docs = spark.read.parquet(s"$d/documents.parquet").select($"doc_id")
      val e1 = docs.filter($"doc_id" % 10 < 3)
        .select($"doc_id".as("id_a"), ($"doc_id" + 1).as("id_b"))
        .join(docs.select($"doc_id".as("id_b")), Seq("id_b"), "left_semi")
      val j0 = jobs.get
      val t0 = System.nanoTime
      val n = graft.operators.Dedup.connectedComponents(docs, "doc_id", e1)
        .select($"id".as("doc_id"), $"cluster").orderBy($"doc_id").count()
      (n, jobs.get - j0, (System.nanoTime - t0) / 1e9)
    }
    // warmup
    ccRun("/root/testdata/sf0.001")
    for (rep <- 1 to 4) {
      val (n, j, t) = ccRun("/root/testdata/sf0.1")
      println(f"cc q77-shape rep$rep rows=$n jobs=$j wall=$t%.3f s")
    }
    spark.stop()
  }
}
