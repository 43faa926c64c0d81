package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** HLL sketch invariants: accuracy on both correction branches,
  * register mergeability (the property that makes the sketch useful
  * at scale — slices combine with MAX, keys never cross the wire),
  * and determinism.
  */
class SketchSpec extends SparkSpec {

  test("sketch estimate is within 5% of exact on every group, both branches") {
    // sf0.01: _all_events has 10k keys — past the 2.5m raw-branch
    // threshold for m=4096 (sf0.001's 1k keys all sit linear)
    val rows = Sketches.sketchDistinct(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 6) // 5 event types + _all_events
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("estimate")
      val err = math.abs(est - exact) / exact
      assert(err < 0.05, s"${r.getAs[String]("grp")}: est $est vs exact $exact (err $err)")
    }
    // the two correction regimes are BOTH exercised: event types sit in
    // the small-range linear-counting branch, _all_events (one key per
    // event row) clears the 2.5m threshold into the raw-HLL branch
    val all = rows.find(_.getAs[String]("grp") == "_all_events").get
    assert(all.getAs[Double]("raw_est") > 2.5 * Sketches.HllM,
      "_all_events should take the raw-estimate branch")
    val typed = rows.filter(_.getAs[String]("grp") != "_all_events")
    assert(typed.forall(_.getAs[Double]("raw_est") <= 2.5 * Sketches.HllM),
      "event types should take the linear-counting branch")
  }

  test("registers of two slices merge with MAX to the full-corpus registers") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val keyed = ev.select(col("event_type").as("grp"),
      col("user_id").cast("string").as("key"))
    val a = keyed.filter(col("key").substr(-1, 1).isin("0", "1", "2", "3", "4"))
    val b = keyed.except(a)
    val merged = Sketches.hllRegisters(a).unionAll(Sketches.hllRegisters(b))
      .groupBy(col("grp"), col("idx")).agg(max(col("m")).as("m"))
    val full = Sketches.hllRegisters(keyed)
    assert(merged.except(full).isEmpty && full.except(merged).isEmpty,
      "MAX-merged slice registers must equal full-corpus registers")
    // and therefore the estimates agree exactly
    val em = Sketches.hllEstimate(merged).select("grp", "estimate")
      .as[(String, Double)].collect().toMap
    val ef = Sketches.hllEstimate(full).select("grp", "estimate")
      .as[(String, Double)].collect().toMap
    assert(em == ef)
  }

  test("sketch output is deterministic across runs") {
    val a = Sketches.sketchDistinct(spark, sf).collect().map(_.toSeq)
    val b = Sketches.sketchDistinct(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
