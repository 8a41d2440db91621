package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleToolkit
import graft.sources.Tables

class ScaleToolkitSpec extends SparkSpec {

  test("globalRank assigns contiguous 0-based ranks in key order, distributed") {
    import spark.implicits._
    import graft.operators.ScaleToolkit
    val keys = scala.util.Random.shuffle((0 until 5000).map(_ * 3L)).toDF("k")
      .repartition(16)
    // (AQE coalesces the tiny range shuffle here; at scale the range
    // partitioning spreads — the point is correctness of the derived ranks)
    val ranked = ScaleToolkit.globalRank(keys, "k", "rn")
    val rows = ranked.orderBy($"k").select($"k", $"rn").as[(Long, Long)].collect()
    rows.zipWithIndex.foreach { case ((k, rn), i) =>
      assert(rn == i && k == i * 3L, s"row $i: key $k rank $rn")
    }
  }

  test("TaskConf round-trips session Hadoop configuration overrides") {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("graft.test.credential", "sekrit")
    val shipped = graft.sources.TaskConf(conf)
    assert(shipped.value.get("graft.test.credential") == "sekrit")
    // serializable (the whole point: it rides into task closures)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(shipped)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.sources.TaskConf]
    assert(back.value.get("graft.test.credential") == "sekrit")
  }
  import spark.implicits._

  test("bucketed tables join without a shuffle") {
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity")
    val or = Tables.orders(spark, sfDir).select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    ScaleToolkit.writeBucketed(li, "l_orderkey", 8, "b_lineitem")
    ScaleToolkit.writeBucketed(or, "l_orderkey", 8, "b_orders")
    try {
      val joined = ScaleToolkit.bucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      // with matching bucket layouts, sort-merge join needs no Exchange
      joined.collect()
      assert(ScaleToolkit.shuffleCount(joined) == 0,
        joined.queryExecution.executedPlan.toString.take(800))
      // and it computes the same join as the unbucketed plan
      assert(joined.count() == li.join(or, Seq("l_orderkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("salted join matches the plain join on a skewed key") {
    // make a skewed frame: 90% of rows share one key
    val skewed = spark.range(5000)
      .select(when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 50).as("k"),
        $"id".as("payload"))
    val dim = spark.range(50).select($"id".as("k"), concat(lit("d"), $"id").as("name"))
    val plain = skewed.join(dim, Seq("k")).agg(count(lit(1)), sum($"payload")).head()
    val salted = ScaleToolkit.saltedJoin(skewed, dim, "k", salt = 8)
      .agg(count(lit(1)), sum($"payload")).head()
    assert(plain == salted)
  }

  test("salted left join keeps unmatched rows exactly once") {
    val left = Seq((1L, "a"), (99L, "zz")).toDF("k", "v")
    val dim = Seq((1L, "dim1")).toDF("k", "name")
    val out = ScaleToolkit.saltedJoin(left, dim, "k", salt = 4, joinType = "left")
      .orderBy($"k").collect()
    assert(out.length == 2)
    assert(out(1).isNullAt(2)) // 99 survives with null dim columns
  }
}
