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

  test("batch-vs-reference monitor: identical corpus scores exactly zero") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val ref = TextFunctions.vocabCounts(docs)
    val r = TextFunctions.vocabDriftAgainst(ref, docs).head()
    assert(r.getAs[Double]("jsd_vs_ref") == 0.0)
    assert(r.getAs[Long]("novel_types") == 0L)
    // and a fully-novel batch diverges by exactly ln 2
    val alien = Seq((1L, "qq1 qq2 qq3 qq1")).toDF("doc_id", "text")
    val a = TextFunctions.vocabDriftAgainst(ref, alien).head()
    assert(a.getAs[Double]("jsd_vs_ref") == 0.693147)
    assert(a.getAs[Long]("novel_types") == 3L)
  }

  test("streaming drift monitor: per-batch rows equal the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream
    val docs = Tables.documents(spark, sf)
    val ref = TextFunctions.vocabCounts(docs.filter(col("doc_id") % 2 === 0))
      .localCheckpoint()
    val arrivals = docs.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => EventStream.DocText(id, t) }
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val input = MemoryStream[EventStream.DocText]
    val q = EventStream.streamingVocabDrift(input.toDS(), ref) { df =>
      got ++= df.as[(Long, Long, Long, Double)].collect()
    }
    input.addData(b1.toSeq)
    q.processAllAvailable()
    input.addData(b2.toSeq)
    q.processAllAvailable()
    q.stop()
    def want(batch: Array[EventStream.DocText]) = {
      val r = TextFunctions.vocabDriftAgainst(ref,
        batch.toSeq.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    assert(got.toSeq == Seq(want(b1), want(b2)))
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
