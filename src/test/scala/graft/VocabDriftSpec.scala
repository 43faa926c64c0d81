package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class VocabDriftSpec extends SparkSpec {

  test("identically-distributed sources have exactly zero divergence") {
    import spark.implicits._
    // same token multiset in both sources, scaled 2x on one side —
    // p == q makes every log argument pair equal INTEGERS, so the
    // divergence is zero BY CONSTRUCTION, not within tolerance
    val docs = Seq(
      ("a", "x y z x"), ("a", "x y"),
      ("b", "x y z x x y"), ("b", "x y z x x y")
    ).toDF("source", "text")
    val got = TextFunctions.vocabDrift(docs)
      .select(col("source"), col("jsd_vs_rest")).as[(String, Double)]
      .collect().toMap
    assert(got("a") == 0.0 && got("b") == 0.0)
  }

  test("disjoint vocabularies diverge by exactly ln 2") {
    import spark.implicits._
    val docs = Seq(("a", "x y z"), ("b", "p q r s")).toDF("source", "text")
    val got = TextFunctions.vocabDrift(docs)
      .select(col("source"), col("jsd_vs_rest"), col("exclusive_types"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(1) == 0.693147, r.toString) // round(ln 2, 6)
      assert(r.getLong(2) > 0)
    }
  }

  test("corpus report: bounds hold and type accounting ties out") {
    val rows = SparkEntry.queries("vocab_drift")(spark, sf).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val jsd = r.getAs[Double]("jsd_vs_rest")
      assert(jsd >= 0.0 && jsd <= 0.693148)
      assert(r.getAs[Long]("exclusive_types") <= r.getAs[Long]("n_types"))
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens"))
    }
  }
}
