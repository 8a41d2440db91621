package graft.cli

import org.apache.spark.sql.SparkSession

/** Dump one SparkEntry query's result as a single CSV (header row, driver
  * order) — the golden-file generator for queries that have no DuckDB
  * oracle (q62's image decode): regenerate with the same command the spec
  * documents, diff, and commit.
  *
  * Usage: runMain graft.cli.QueryDump <sfDir> <queryName> <outFile>
  */
object QueryDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name, outFile) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val rows = df.collect()
    // RFC 4180 quoting: values with a comma/quote/newline are wrapped and
    // internal quotes doubled, so free-text columns can't corrupt a golden
    def csv(v: String): String =
      if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + v.replace("\"", "\"\"") + "\""
      else v
    val sb = new StringBuilder(df.columns.map(csv).mkString(",")).append('\n')
    rows.foreach(r => sb.append(
      (0 until r.length).map(i => csv(String.valueOf(r.get(i)))).mkString(",")).append('\n'))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), sb.toString)
    println(s"[dump] $name: ${rows.length} rows -> $outFile")
    spark.stop()
  }
}
