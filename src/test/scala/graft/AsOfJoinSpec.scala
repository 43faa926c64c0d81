package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf picks the latest right row at or before each left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L),
      (2L, ts("2024-01-01 12:00:00"), 7L),
      (3L, ts("2024-01-01 09:00:00"), 8L)) // no prior click for user 8
      .toDF("event_id", "ts", "user_id")
    val right = Seq(
      (100L, ts("2024-01-01 09:30:00"), 7L),
      (101L, ts("2024-01-01 11:59:00"), 7L),
      (102L, ts("2024-01-01 10:30:00"), 8L)) // after left ts -> ignored
      .toDF("click_id", "ts", "user_id")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("click_id"))
      .select("event_id", "click_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got(1L) == Some(100L))
    assert(got(2L) == Some(101L))
    assert(got(3L) == None)
  }

  test("equal timestamps: right row is eligible (ts >= semantics)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 7L)).toDF("event_id", "ts", "user_id")
    val right = Seq((100L, ts("2024-01-01 10:00:00"), 7L)).toDF("click_id", "ts", "user_id")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("click_id")).collect()
    assert(got.head.getAs[Long]("click_id") == 100L)
  }
}
