package graft

import org.apache.spark.sql.functions._

/** events_gap_fill: calendar densification + forward fill. */
class GapFillSpec extends SparkSpec {

  test("spine covers each user's [first, last] day exactly once") {
    val got = SparkEntry.queries("events_gap_fill")(spark, sf)
    val perUser = got.groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("day")).as("nd"),
        min("day").as("d0"), max("day").as("d1"),
        (datediff(max(col("day")), min(col("day"))) + 1).as("span"))
    // dense: one row per calendar day, no dup days
    assert(perUser.filter(col("n") =!= col("span")).count() == 0)
    assert(perUser.filter(col("n") =!= col("nd")).count() == 0)
  }

  test("gaps carry the last observed total forward and are flagged") {
    val ev = Tables.events(spark, sf)
    val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(graft.Util.sum2(col("value")).as("want"))
    val got = SparkEntry.queries("events_gap_fill")(spark, sf)
    // non-gap rows equal the daily aggregate exactly
    val joined = got.join(daily, Seq("user_id", "day"), "left")
    assert(joined.filter(col("is_gap") && col("want").isNotNull).count() == 0)
    assert(joined.filter(!col("is_gap") &&
      (col("want").isNull || col("want") =!= col("total"))).count() == 0)
    // spot-check forward fill: a gap row's total equals the most
    // recent non-gap total before it
    val rows = got.filter(col("user_id") === got.select("user_id")
        .first().getLong(0))
      .orderBy("day").collect()
    var lastReal = Option.empty[Double]
    rows.foreach { r =>
      if (!r.getBoolean(3)) lastReal = Some(r.getDouble(2))
      else assert(lastReal.contains(r.getDouble(2)),
        s"gap day ${r.get(1)} not forward-filled")
    }
    assert(rows.nonEmpty && !rows.head.getBoolean(3),
      "first spine day must be a real observation")
  }
}
