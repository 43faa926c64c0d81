package graft

import graft.operators.Timeseries

/** Semantic invariants of the funnel / retention analytics (the
  * oracle gate checks cross-engine equality; these check the
  * analytics MEAN what they claim).
  */
class FunnelSpec extends SparkSpec {

  test("funnel stages are strictly ordered and the stage count matches the nulls") {
    val rows = Timeseries.funnelSteps(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = Option(r.getAs[java.sql.Timestamp]("t_click"))
      val v = Option(r.getAs[java.sql.Timestamp]("t_view"))
      val p = Option(r.getAs[java.sql.Timestamp]("t_purchase"))
      val stages = r.getAs[Int]("stages_completed")
      // a later stage implies every earlier one
      assert(!(v.isDefined && c.isEmpty) && !(p.isDefined && v.isEmpty))
      for (cc <- c; vv <- v) assert(cc.before(vv))
      for (vv <- v; pp <- p) assert(vv.before(pp))
      assert(stages == Seq(c, v, p).count(_.isDefined))
    }
  }

  test("EWMA closed form equals the sequential recurrence") {
    val got = Timeseries.ewmaTrend(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("ewma")).toMap
    val byUser = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(got.keySet == byUser.keySet)
    byUser.foreach { case (u, rs) =>
      val xs = rs.sortBy(t => (t._2.getTime, t._3)).map(_._4)
      val e = xs.tail.foldLeft(xs.head)((acc, x) => 0.2 * x + (1.0 - 0.2) * acc)
      assert(math.abs(got(u) - e) < 1e-4, s"user $u: ${got(u)} vs recurrence $e")
    }
  }

  test("anomaly rows really are 3-sigma outliers of their user's distribution") {
    import org.apache.spark.sql.functions._
    val rows = Timeseries.eventsAnomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    val stats = Tables.events(spark, sf).groupBy("user_id")
      .agg(avg(col("value")).as("m"), stddev_pop(col("value")).as("sd"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (m, sd) = stats(r.getAs[Long]("user_id"))
      val z = (r.getAs[Double]("value") - m) / sd
      assert(math.abs(z) > 2.99, s"event ${r.getAs[Long]("event_id")}: z=$z")
    }
  }

  test("retention week-0 row equals the cohort size and offsets are non-negative") {
    import org.apache.spark.sql.functions._
    val rows = Timeseries.retentionCohorts(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("week_offset") >= 0))
    // every user is active in their own cohort week: summing the
    // week-0 rows over all cohorts must count every user once
    val week0 = rows.filter(_.getAs[Int]("week_offset") == 0)
      .map(_.getAs[Long]("n_users")).sum
    val users = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(week0 == users, s"week-0 total $week0 != $users users")
  }
}
