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

  test("multi-payload tie-break orders by RAW right columns, not filled ones") {
    // two right rows share (key, ts); the total order sorts them by
    // (c1, c2) = (5, 9) < (6, 1), so the as-of pick is the LAST row
    // in that order: c1=6, c2=1. Before the single-select fix, c2's
    // window ordered by the already-filled c1 values — same pick
    // here, but the ordering input was wrong; this pins the contract
    // that each payload column resolves against the original union.
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 7L)).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (5L, 9L, ts("2024-01-01 09:00:00"), 7L),
      (6L, 1L, ts("2024-01-01 09:00:00"), 7L))
      .toDF("c1", "c2", "ts", "user_id")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("c1", "c2"))
      .select("c1", "c2").collect().head
    assert(got.getLong(0) == 6L && got.getLong(1) == 1L,
      s"picked (${got.getLong(0)}, ${got.getLong(1)}), expected the " +
        "(c1,c2)-max right row (6, 1)")
    // determinism across repartitionings: same pick under a different
    // input layout
    val got2 = AsOfJoin.asOf(left, right.repartition(7), "user_id", "ts",
        Seq("c1", "c2"))
      .select("c1", "c2").collect().head
    assert(got2.getLong(0) == 6L && got2.getLong(1) == 1L)
  }
}
