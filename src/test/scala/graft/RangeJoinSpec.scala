package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(probe: org.apache.spark.sql.DataFrame,
                    iv: org.apache.spark.sql.DataFrame) =
    probe.crossJoin(iv).filter($"p" >= $"s" && $"p" < $"e")

  test("binned join == naive inequality join, incl. multi-bin intervals") {
    val probe = Seq(-7L, -1L, 0L, 3L, 9L, 10L, 25L, 99L, 100L).toDF("p")
    val iv = Seq(
      (1L, 0L, 10L),    // exactly one bin at width 10
      (2L, 5L, 35L),    // spans 4 bins
      (3L, -10L, 1L),   // negative start
      (4L, 40L, 41L),   // no matching points
      (5L, 98L, 101L)   // boundary: 99 and 100 in, end exclusive
    ).toDF("iid", "s", "e")
    for (w <- Seq(1L, 3L, 10L, 1000L)) {
      val got = RangeJoin.joinRangeBinned(probe, "p", iv, "s", "e", w)
        .select("p", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = naive(probe, iv)
        .select("p", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.sorted.toSeq == want.sorted.toSeq, s"binWidth=$w")
      // exactly-once: a pair must not repeat when the interval spans bins
      assert(got.length == got.distinct.length, s"duplicates at binWidth=$w")
    }
  }

  test("start inclusive, end exclusive") {
    val probe = Seq(10L, 19L, 20L).toDF("p")
    val iv = Seq((1L, 10L, 20L)).toDF("iid", "s", "e")
    val got = RangeJoin.joinRangeBinned(probe, "p", iv, "s", "e", 7L)
      .select("p").as[Long].collect().sorted
    assert(got.toSeq == Seq(10L, 19L))
  }

  test("plan is an equi join on the bin — no nested-loop/cartesian") {
    val ev = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 1000000").as("s"), col("value"))
    // force a non-broadcastable interval side too: the equi-bin shape
    // must survive without the broadcast escape hatch
    val iv = spark.range(12).select(
      col("id").as("interval_id"),
      (col("id") * 259200L).as("start_s"),
      (col("id") * 259200L + 172800L).as("end_s"))
    val plan = RangeJoin
      .joinRangeBinned(ev, "s", iv, "start_s", "end_s", 172800L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("range_join_agg totals reconcile with a direct filter per interval") {
    val df = RangeJoin.rangeJoinAgg(spark, sf).collect()
    assert(df.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 1000000").as("s"))
    for (r <- df.take(3)) {
      val start = r.getAs[Long]("start_s")
      val direct = ev.filter($"s" >= start && $"s" < start + 172800L).count()
      assert(r.getAs[Long]("n_events") == direct)
    }
    // every event is inside at most one window here only when windows
    // don't overlap; these do not (2-day windows every 3 days), so the
    // per-window counts can't exceed the corpus
    assert(df.map(_.getAs[Long]("n_events")).sum <= ev.count())
  }

  test("inverted/degenerate intervals register in no bins") {
    // a corrupt end << start used to fan out into (start-end)/binWidth
    // DESCENDING bins before the residual filter discarded the rows —
    // here ~10^8 bins' worth, which must now never be generated
    val probe = Seq(5L, 50L, 500L).toDF("p")
    val iv = Seq(
      (1L, 0L, 100L),              // valid: covers 5 and 50
      (2L, 77L, 77L),              // empty [77, 77)
      (3L, 1000000000000L, 0L))    // inverted, 10^12 wide
      .toDF("interval_id", "s", "e")
    val got = RangeJoin.joinRangeBinned(probe, "p", iv, "s", "e", 10L)
      .select("p", "interval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((5L, 1L), (50L, 1L)), got.toString)
  }
}
