package graft

import graft.operators.Upsert

class UpsertSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("upsert applies inserts, updates and keeps untouched rows") {
    import spark.implicits._
    val current = Seq(
      ("a", "old-a", 1L), ("b", "old-b", 1L)).toDF("id", "payload", "v")
    val updates = Seq(
      ("b", "new-b", 2L), ("c", "new-c", 2L)).toDF("id", "payload", "v")
    val got = Upsert.upsert(current, updates, Seq("id"), "v")
      .orderBy("id").collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(got == List(("a", "old-a"), ("b", "new-b"), ("c", "new-c")))
  }

  test("updates win version ties (on_conflict_do_update semantics)") {
    import spark.implicits._
    val current = Seq(("a", "old", 5L)).toDF("id", "payload", "v")
    val updates = Seq(("a", "new", 5L)).toDF("id", "payload", "v")
    val got = Upsert.upsert(current, updates, Seq("id"), "v").collect()
    assert(got.length == 1 && got.head.getString(1) == "new")
  }

  test("upsert of the events table matches q5 last-write-wins") {
    val ev = Tables.events(spark, sf).withColumn("_v", col("ts").cast("long"))
    val merged = Upsert.upsert(ev.limit(0), ev, Seq("user_id"), "_v")
    // one row per user, and it is a max-ts row for that user
    assert(merged.count() == ev.select("user_id").distinct().count())
  }
}
