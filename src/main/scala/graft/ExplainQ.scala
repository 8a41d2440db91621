package graft
import org.apache.spark.sql.SparkSession
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    df.count()
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
