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

  test("CMS never underestimates and tracks the exact top-50 closely") {
    // the testdata vocab is 31 tokens — collision-free in 4×1024
    val rows = Sketches.sketchHeavyHitters(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") == r.getAs[Long]("n_exact"),
        s"${r.getAs[String]("token")}: 31 tokens in 4096 counters must not collide")
    }
  }

  test("CMS in the collision regime: est >= exact, overestimate epsilon-bounded") {
    import spark.implicits._
    // 8000 distinct tokens >> w=1024 forces collisions in every row;
    // zipf-ish mass via doc_id repetition keeps heavy hitters distinct
    val docs = (0 until 2000).map { i =>
      val reps = 1 + (i % 40)
      (i.toLong, Seq.fill(reps)(s"tok${i % 8000} tok${(i * 7) % 8000}").mkString(" "))
    }.toDF("doc_id", "text")
    val rows = Sketches.sketchHeavyHitters(docs, 50).collect()
    assert(rows.length == 50)
    val totalMass = 2000 * 2 * 20.5 // Σ reps·2 tokens ≈ exact corpus mass
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("cms_est")
      assert(est >= exact, s"${r.getAs[String]("token")}: CMS $est < exact $exact")
      // CMS bound: overestimate ≤ e/w · N with prob 1−e^−d per query;
      // assert a loose deterministic multiple of it
      assert(est - exact <= (3 * math.E / Sketches.CmsW * totalMass).toLong + 1,
        s"${r.getAs[String]("token")}: overestimate ${est - exact} beyond bound")
    }
  }

  test("histogram quantile sketch is within one grid step of the exact rank statistic") {
    import spark.implicits._
    val rows = Sketches.sketchQuantiles(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 15) // 5 event types × 3 quantiles
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .selectExpr("event_type", "cast(value as double) v")
    val ranges = ev.groupBy("event_type")
      .agg(org.apache.spark.sql.functions.expr("max(v) - min(v)").as("r"))
      .as[(String, Double)].collect().toMap
    rows.foreach { r =>
      val step = ranges(r.getAs[String]("event_type")) / Sketches.QsB
      val diff = math.abs(r.getAs[Double]("q_est") - r.getAs[Double]("q_exact"))
      assert(diff <= step + 1e-9,
        s"${r.getAs[String]("event_type")} p=${r.getAs[Double]("p")}: |est-exact|=$diff > step $step")
    }
    // quantile estimates are monotone in p within a group
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, g) =>
      val byP = g.sortBy(_.getAs[Double]("p")).map(_.getAs[Double]("q_est"))
      assert(byP.sameElements(byP.sorted))
    }
  }

  test("bloom filter has no false negatives and flags the planted dups") {
    val rows = Sketches.sketchBloom(spark, sf).collect()
    assert(rows.length == 50) // the 50 planted batch docs
    rows.foreach { r =>
      if (r.getAs[Boolean]("in_corpus"))
        assert(r.getAs[Boolean]("bloom_hit"),
          s"doc ${r.getAs[Long]("doc_id")}: TRUE member missed — bloom must have no false negatives")
    }
    // the 25 exact plants are members; the 25 near plants (novel text) are not
    assert(rows.count(_.getAs[Boolean]("in_corpus")) == 25)
    // m=32768 bits, ~500·4 set bits ⇒ FP prob ≈ (1-e^-kn/m)^k ≈ 3e-5:
    // the 25 novel docs should essentially never false-positive
    val fp = rows.count(r => !r.getAs[Boolean]("in_corpus") && r.getAs[Boolean]("bloom_hit"))
    assert(fp <= 2, s"$fp false positives out of 25 novel docs")
  }

  test("bloom membership is monotone under corpus union (OR-merge semantics)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the filter is a distinct set-bit relation, so build(A∪B) =
    // build(A) ∪ build(B) by construction; observable consequence:
    // any probe that hits against a slice must still hit against the
    // union, and every doc hits its own slice's filter
    val docs = Tables.documents(spark, sf)
    val half = docs.filter(col("doc_id") % 2 === 0)
    val hitsHalf = Sketches.sketchBloom(half, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("bloom_hit")).toMap
    val hitsFull = Sketches.sketchBloom(docs, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("bloom_hit")).toMap
    docs.select("doc_id").as[Long].collect().foreach { id =>
      assert(hitsFull(id), s"doc $id must hit the full-corpus filter")
      if (hitsHalf(id)) assert(hitsFull(id))
      if (id % 2 == 0) assert(hitsHalf(id), s"doc $id missed by its own slice filter")
    }
  }

  test("sketch output is deterministic across runs") {
    val a = Sketches.sketchDistinct(spark, sf).collect().map(_.toSeq)
    val b = Sketches.sketchDistinct(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
