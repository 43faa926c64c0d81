package graft

import graft.operators.Relational

/** Plan-shape assertions: the properties that matter at 100 TB must
  * be visible in the physical plan, not assumed — filter/column
  * pushdown into the parquet scan, broadcast of dimension tables,
  * whole-stage codegen on the hot paths. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q2 pushes filters and prunes columns at the scan") {
    val plan = planOf("q2_revenue_filter")
    assert(plan.contains("PushedFilters: ["), "no pushed filters section")
    assert(plan.contains("l_discount"), "filter on l_discount not pushed")
    // projection pruning: the scan must not read unused money columns
    assert(!plan.contains("l_tax"), "scan reads l_tax which q2 never uses")
    assert(!plan.contains("l_returnflag"), "scan reads l_returnflag which q2 never uses")
  }

  test("q3 broadcasts the dimension tables") {
    val plan = planOf("q3_top_nations")
    assert(plan.contains("BroadcastHashJoin"), "dims not broadcast")
  }

  test("q1 aggregates map-side (partial) inside codegen stages") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    df.collect() // materialize THIS plan so AQE finalizes it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"))
    // '*(n)' prefixes mark whole-stage-codegen'd stages in the final plan
    assert(plan.contains("*("), "no codegen stage markers in final plan")
    assert(plan.contains("partial_sum"), "no map-side partial aggregation")
  }

  test("dedup pair-generation joins never broadcast the corpus side") {
    for (q <- Seq("dedup_ngram_jaccard", "dedup_minhash", "dedup_simhash",
                  "dedup_emb_lsh")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
        s"$q pair join is not a shuffle join:\n${plan.take(600)}")
    }
  }

  test("decontaminate broadcasts the benchmark-sized eval index") {
    // the training-corpus shingle stream must join map-side — only
    // the eval index (benchmark-sized) may be broadcast
    val plan = planOf("decontaminate")
    assert(plan.contains("BroadcastHashJoin"), "eval index not broadcast")
  }

  test("q12's global window only ever sees the daily pre-aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = SparkEntry.queries("q12_moving_avg")(spark, sf)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "q12 lost its moving-average window")
    // the un-partitioned window is only scale-safe over the bounded
    // per-day aggregate; raw rows below it would serialize the job
    windows.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        "q12's global window input is not the daily pre-aggregate")
    }
  }

  test("q13 anti join pushes the date filter into the orders scan") {
    val plan = planOf("q13_anti_semi")
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("o_orderdate"), "date filter not at the scan")
  }
}
