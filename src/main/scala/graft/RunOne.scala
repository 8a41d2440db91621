package graft
import org.apache.spark.sql.SparkSession
object RunOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("runone").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0); val sf = args(1); val out = args(2)
    val df = SparkEntry.queries(name)(spark, sf)
    df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    println("SQL::" + SparkEntry.oracleSql.getOrElse(name, "<none>"))
    spark.stop()
  }
}
