package graft
/** Dev tool: dump physical plans of representative queries and grep for the
  * plan features the 100 TB design depends on (pushdown, broadcast, top-k). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val d = "/root/testdata/sf0.01"
    def plan(name: String): String = {
      val df = Queries.byName(name)(spark, d)
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    }
    val checks: Seq[(String, String => Boolean, String)] = Seq(
      ("q03_where_coords", p => p.contains("PushedFilters: [IsNotNull(l_shipdate)"), "filter pushdown to parquet"),
      ("q03_where_coords", p => !p.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey"), "column pruning (no full schema)"),
      ("q10_join_dims", p => p.contains("BroadcastHashJoin"), "broadcast joins for dims"),
      ("q02_select_limit", p => p.contains("TakeOrderedAndProject"), "top-k instead of full sort"),
      ("q26_ann_topk", p => p.contains("TakeOrderedAndProject"), "ANN top-k uses TakeOrdered"),
      ("q11_anti_join", p => p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), "broadcast anti join"),
      // AQE formatted mode doesn't render WholeStageCodegen markers; the
      // partial_* functions prove the map-side combine is in place
      ("q01_pricing_summary", p => p.contains("partial_sum"), "partial+final hash aggregation"))
    checks.foreach { case (q, f, desc) =>
      val p = plan(q)
      println(s"AUDIT ${if (f(p)) "PASS" else "FAIL"} $q: $desc")
      if (!f(p)) println(p.linesIterator.take(40).mkString("\n"))
    }
    // Plan lint over the WHOLE inventory: no unbounded cartesian products.
    // Intentional tiny cross joins (literal fan-outs, 1-row query vectors,
    // 4-row plane/centroid tables) plan as BroadcastNestedLoopJoin over a
    // broadcast side bounded by a constant — allowed. A CartesianProduct
    // node (both sides unbounded) would be a scale bug anywhere.
    Queries.everything.foreach { q =>
      val p = try plan(q.name) catch { case e: Throwable => s"ERROR ${e.getMessage}" }
      val cartesian = p.contains("CartesianProduct")
      println(s"LINT ${if (cartesian) "FAIL" else "ok"} ${q.name}" +
        (if (cartesian) " — CartesianProduct in plan" else ""))
    }
    // full dump for the two most scale-sensitive queries
    for (q <- Seq("q01_pricing_summary", "q31_minhash_near_dups"))
      println(s"==== $q ====\n" + plan(q).take(3000))
    spark.stop()
  }
}
