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
