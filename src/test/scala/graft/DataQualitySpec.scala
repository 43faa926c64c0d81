package graft

import graft.operators.DataQuality
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def metricsMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("rowMetrics counts each violation predicate in one pass") {
    val df = Seq(
      (1L, Some("x"), 5.0),
      (2L, None, -1.0),
      (3L, None, 0.0),
      (4L, Some("y"), 2.0)
    ).toDF("id", "name", "v")
    val got = metricsMap(DataQuality.rowMetrics(df, Seq(
      "null_name" -> col("name").isNull,
      "nonpositive_v" -> (col("v") <= 0.0))))
    assert(got == Map("row_count" -> 4L, "null_name" -> 2L,
      "nonpositive_v" -> 2L))
    // single scan: exactly one aggregate subtree, no join/exchange of
    // data rows beyond the final partial->final agg pair
    val plan = DataQuality.rowMetrics(df, Seq("x" -> (col("v") > 0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
  }

  test("keyDuplicates counts rows beyond the first per key") {
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("id")
    assert(metricsMap(DataQuality.keyDuplicates(df, Seq("id")))("dup_keys") == 3L)
    val clean = Seq(1L, 2L, 3L).toDF("id")
    assert(metricsMap(DataQuality.keyDuplicates(clean, Seq("id")))("dup_keys") == 0L)
  }

  test("orphans counts child rows missing from the parent, nulls included") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    assert(metricsMap(
      DataQuality.orphans(child, "fk", parent, "pk"))("orphans") == 2L)
  }

  test("a clean table reports zeros for every violation metric") {
    val orders = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf)
    val got = metricsMap(DataQuality.suite(
      DataQuality.rowMetrics(orders, Seq(
        "null_custkey" -> col("o_custkey").isNull)),
      DataQuality.keyDuplicates(orders, Seq("o_orderkey"), "dup_orderkeys"),
      DataQuality.orphans(orders, "o_custkey", cust, "c_custkey")))
    assert(got("row_count") > 0)
    assert(got("null_custkey") == 0L)
    assert(got("dup_orderkeys") == 0L)
    assert(got("orphans") == 0L)
  }

  test("streaming dq monitor equals batch rowMetrics on a two-batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val checks = Seq(
      "nonpositive_v" -> (col("v") <= 0.0),
      "big_id" -> (col("id") > 100L))
    val q = graft.streaming.EventStream
      .streamingDqMetrics(input.toDS().toDF("id", "v"), checks)
      .writeStream.outputMode("complete")
      .format("memory").queryName("dq_stream_test").start()
    val b1 = Seq((1L, 5.0), (2L, -1.0), (200L, 0.0))
    val b2 = Seq((3L, 2.0), (300L, -4.0))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dq_stream_test").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = metricsMap(DataQuality.rowMetrics(
      (b1 ++ b2).toDF("id", "v"), checks))
    assert(streamed == batch)
    assert(streamed("row_count") == 5L && streamed("nonpositive_v") == 3L &&
      streamed("big_id") == 2L)
  }

  test("rowMetrics survives SQL-hostile metric names") {
    import spark.implicits._
    // names only ever surface as literals (positional internal
    // aliases + typed explode) — quotes, backticks, dots, commas must
    // neither break parsing nor alter an expression
    val hostile = Seq(
      "has ' quote" -> (col("v") > 0),
      "tick ` dot.comma, end" -> (col("v") < 0),
      "plain" -> col("v").isNull)
    val got = metricsMap(DataQuality.rowMetrics(
      Seq(Some(1.0), Some(-2.0), None).toDF("v"), hostile))
    assert(got == Map("row_count" -> 3L, "has ' quote" -> 1L,
      "tick ` dot.comma, end" -> 1L, "plain" -> 1L), got.toString)
  }

  test("dq_check fires every metric nonzero on the degraded feed") {
    val got = metricsMap(SparkEntry.queries("dq_check")(spark, sf))
    assert(got.keySet == Set("row_count", "null_priority",
      "price_below_floor", "status_domain_violations", "dup_orderkeys",
      "orphan_custkeys"))
    // the degradations are deterministic, so each check must trip
    assert(got.collect { case (k, v) if k != "row_count" => v }.forall(_ > 0),
      got.toString)
    assert(got("row_count") > got("dup_orderkeys"))
  }
}
