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

  test("vec_dot: codegen and interpreted agree with the HOF form bit-for-bit") {
    import graft.functions.DotProduct
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (2L, Seq(0.1f, -0.2f, 0.3f), Seq(-0.4f, 0.5f, 0.6f)))
      .toDF("id", "a", "b")
    val hof = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val rows = df.select(DotProduct($"a", $"b").as("fast"), hof($"a", $"b").as("slow"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"codegen ${r.getDouble(0)} != HOF ${r.getDouble(1)}"))
    // interpreted path (eval) agrees: force it outside codegen via a filter
    // on a literal-computed value
    val ev = DotProduct(
      org.apache.spark.sql.functions.typedLit(Seq(1.0f, 2.0f)),
      org.apache.spark.sql.functions.typedLit(Seq(3.0f, 4.0f)))
    assert(spark.range(1).select(ev.as("d")).head().getDouble(0) == 11.0)
    // null semantics: null array, length mismatch, null element -> NULL
    val nulls = spark.sql(
      """SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)) AS a,
        |       vec_dot(array(1.0F), array(1.0F, 2.0F)) AS b,
        |       vec_dot(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 2.0F)) AS c,
        |       vec_dot(array(1, 2, 3), array(4, 5, 6)) AS ints""".stripMargin).head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
    assert(nulls.getDouble(3) == 32.0)
  }

  test("vec_dot stays inside whole-stage codegen") {
    import graft.functions.DotProduct
    val emb = Tables.embeddings(spark, sfDir)
    val plan = emb.select(DotProduct($"embedding", $"embedding").as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      plan.take(500))
  }

  test("md5_bucket16: native expression matches the portable nibble form everywhere") {
    import graft.operators.Sampling
    // the whole fixture text + ids, plus unicode and empty-string edges
    val docs = Tables.documents(spark, sfDir)
      .select($"text".as("k"))
      .union(Tables.documents(spark, sfDir).select($"doc_id".cast("string").as("k")))
      .union(Seq("", "héllo wörld ☂", "a\tb\nc", " spaces ").toDF("k"))
    val bad = docs.select(
        Sampling.md5Bucket16($"k").as("fast"),
        Sampling.md5Bucket16Portable($"k").as("portable"))
      .filter($"fast" =!= $"portable" || $"fast".isNull =!= $"portable".isNull)
      .count()
    assert(bad == 0, "native md5_bucket16 diverged from the oracle-portable form")
    // null in -> null out
    assert(spark.range(1)
      .select(Sampling.md5Bucket16(lit(null).cast("string")).as("b")).head().isNullAt(0))
    // stays inside whole-stage codegen
    val plan = docs.select(Sampling.md5Bucket16($"k").as("b"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      plan.take(500))
  }
}
