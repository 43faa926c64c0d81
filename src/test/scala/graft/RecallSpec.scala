package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame

/** Recall of the approximate ANN paths against the brute-force
  * baseline at sf0.01 — the scale path must be quantified, not
  * assumed. The synthetic embeddings are isotropic (top-5 neighbors
  * ≈2.5σ above random-pair cosine), the hardest regime for ANN, and
  * the default geometries still measure ≈0.90; the floor leaves
  * margin for seed/data drift without letting recall quietly rot.
  */
class RecallSpec extends SparkSpec {
  private val sf01 = "/root/testdata/sf0.01"

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

  private lazy val exact = pairs(Similarity.annBruteforce(spark, sf01))

  test("multi-table LSH recall@5 vs brute force >= 0.8") {
    val recall = (pairs(Similarity.annLsh(spark, sf01)) & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"ann_lsh recall@5 = $recall")
  }

  test("IVF recall@5 vs brute force >= 0.8") {
    val recall = (pairs(Similarity.annIvf(spark, sf01)) & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"ann_ivf recall@5 = $recall")
  }

  test("LSH-blocked embedding dedup pair recall vs all-pairs >= 0.8") {
    // ground truth = exact all-pairs cosine at the same τ (O(n²),
    // recall-measurement only); the LSH blocking must retain ≥0.8 of
    // the true near-dup pairs (numpy sim + Spark both measure ≈0.93
    // for 16×4 on this isotropic corpus)
    def ppairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("v1"), r.getAs[Long]("v2"))).toSet
    val e = graft.Tables.embeddings(spark, sf01)
    val truth = ppairs(graft.operators.Dedup.embCosineAllPairs(e))
    val got = ppairs(graft.operators.Dedup.embLshDups(e))
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"dedup_emb_lsh pair recall = $recall")
    // LSH-blocked output is a SUBSET of the all-pairs truth by
    // construction (blocking can only lose pairs, never invent them)
    assert((got -- truth).isEmpty)
  }
}
