package graft

import org.apache.spark.sql.functions._

class ContainmentSpec extends SparkSpec {

  private lazy val rows = SparkEntry.queries("dedup_containment")(spark, sf)
    .select(col("d1"), col("d2"), col("shared"), col("n1"), col("n2"),
      col("c_d1"), col("c_d2"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5), r.getDouble(6)))

  test("every planted prefix slice is fully contained in its original") {
    val byPair = rows.map(t => (t._1, t._2) -> t).toMap
    (0L until 25L).foreach { orig =>
      val t = byPair.get((orig, orig + 300000))
      assert(t.isDefined, s"plant of $orig missing")
      assert(t.get._7 == 1.0, s"plant of $orig not fully contained")
    }
  }

  test("containment catches subset pairs the Jaccard gate misses") {
    val missed = rows.filter { case (d1, d2, sh, n1, n2, _, c2) =>
      d2 == d1 + 300000 && c2 == 1.0 &&
        sh.toDouble / (n1 + n2 - sh) < 0.5
    }
    assert(missed.nonEmpty)
  }

  test("incremental batch-vs-corpus equals the one-shot's cross pairs") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
    // batch = prefix slices of corpus docs, ids above the corpus range
    val batch = docs.filter(col("doc_id") < 25)
      .select((col("doc_id") + 500000).as("doc_id"), col("lang"),
        org.apache.spark.sql.functions.array_join(
          org.apache.spark.sql.functions.slice(
            org.apache.spark.sql.functions.split(col("text"), "\\s+"),
            1, 30), " ").as("text"))
    val inc = Dedup.dedupContainmentIncremental(docs, batch)
      .collect()
      .map(r => (r.getLong(1), r.getLong(0)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    val oneShot = Dedup.dedupContainment(docs.unionByName(batch))
      .filter(col("d2") >= 500000 && col("d1") < 500000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(4), r.getLong(3),
          r.getDouble(6), r.getDouble(5)))).toMap
    assert(inc.nonEmpty)
    assert(inc == oneShot)
  }

  test("rows respect the gate, the ratios, and the bounds") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.nonEmpty)
    rows.foreach { case (d1, d2, sh, n1, n2, c1, c2) =>
      assert(d1 < d2)
      assert(sh >= 1 && sh <= math.min(n1, n2))
      assert(c1 == r6(sh.toDouble / n1) && c2 == r6(sh.toDouble / n2))
      assert(math.max(c1, c2) >= 0.8)
    }
  }
}
