package graft

import org.apache.spark.sql.functions._

import graft.functions.HaversineDistance
import graft.sources.Tables

class CatalystSpec extends SparkSpec {
  import spark.implicits._

  private def gridView(): Unit =
    Queries.grid(spark, sfDir).createOrReplaceTempView("cat_grid")

  test("GeoPredicateRule rewrites country predicate inside spark.sql") {
    gridView()
    val viaRule = spark.sql(
      "SELECT count(*) AS n FROM cat_grid WHERE country = 'australia'")
      .head().getLong(0)
    val manual = Queries.grid(spark, sfDir)
      .filter($"latitude".between(-44, -10) && $"longitude".between(113, 154))
      .count()
    assert(viaRule == manual && viaRule > 0)
  }

  test("GeoPredicateRule handles reversed operands and city names") {
    gridView()
    val n = spark.sql(
      "SELECT count(*) AS n FROM cat_grid WHERE 'united states' = country").head().getLong(0)
    assert(n > 0)
    // unknown name surfaces the reference-style error
    val e = intercept[Exception](
      spark.sql("SELECT * FROM cat_grid WHERE city = 'atlantis'").collect())
    assert(e.getMessage.contains("atlantis"))
  }

  test("GeoPredicateRule does NOT fire when a real city column exists") {
    Seq(("new york", 1), ("boston", 2)).toDF("city", "x").createOrReplaceTempView("cities")
    val got = spark.sql("SELECT x FROM cities WHERE city = 'new york'")
      .as[Int].collect().toSeq
    assert(got == Seq(1))
  }

  test("haversine_km: codegen expression matches known distances") {
    // London -> Paris is ~343.5 km
    val d = spark.range(1)
      .select(HaversineDistance(lit(51.5074), lit(-0.1278), lit(48.8566), lit(2.3522)).as("d"))
      .head().getDouble(0)
    assert(math.abs(d - 343.5) < 1.0, s"got $d")
    // zero distance to self; null propagates
    val z = spark.range(1).select(
      HaversineDistance(lit(10.0), lit(20.0), lit(10.0), lit(20.0)).as("z"),
      HaversineDistance(lit(null).cast("double"), lit(0.0), lit(0.0), lit(0.0)).as("n"))
      .head()
    assert(z.getDouble(0) == 0.0 && z.isNullAt(1))
  }

  test("haversine_km is callable from SQL via the injected function") {
    val d = spark.sql(
      "SELECT haversine_km(CAST(51.5074 AS DOUBLE), CAST(-0.1278 AS DOUBLE), " +
        "CAST(48.8566 AS DOUBLE), CAST(2.3522 AS DOUBLE)) AS d").head().getDouble(0)
    assert(math.abs(d - 343.5) < 1.0)
  }

  test("haversine stays inside whole-stage codegen") {
    val plan = Tables.events(spark, sfDir)
      .select(HaversineDistance(lit(0.0), lit(0.0), $"value", $"value").as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in the plan's short form; the
    // project containing haversine must carry it (a UDF would break the span)
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      plan.take(500))
  }
}
