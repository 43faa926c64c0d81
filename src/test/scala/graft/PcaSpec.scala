package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  test("the trained basis is orthonormal and variance-ordered") {
    val (comps, _) = Similarity.pcaBasis(spark, sf)
    val dim = comps.head.length
    assert(comps.length == dim)
    for (i <- comps.indices; j <- i until comps.length) {
      val dot = comps(i).zip(comps(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<e$i,e$j> = $dot")
    }
  }

  test("projection variances match the eigen-order and sum to the trace") {
    import spark.implicits._
    val rows = SparkEntry.queries("emb_pca")(spark, sf)
      .select(col("component"), col("var_p"), col("cum_frac"))
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    // at sf0.001 the corpus IS the training sample (< 2048 vectors),
    // so projection variance must be non-increasing up to 6-dp noise
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 + 2e-6, s"component ${b._1} out of order")
    }
    assert(rows.last._3 == 1.0)
    assert(rows.map(_._3).sliding(2).forall { case Array(a, b) => b >= a })
    // trace preservation: total projection variance == total per-dim
    // variance of the corpus (rotation invariance), within rounding
    val vecs = Tables.embeddings(spark, sf)
      .select(col("embedding")).as[Array[Float]].collect()
    val dim = vecs.head.length
    val n = vecs.length
    val trace = (0 until dim).map { j =>
      val mean = vecs.map(_(j).toDouble).sum / n
      vecs.map(v => (v(j) - mean) * (v(j) - mean)).sum / n
    }.sum
    val total = rows.map(_._2).sum
    assert(math.abs(total - trace) < 1e-3, s"trace $trace vs $total")
  }

  test("whitened embeddings have identity covariance on the sample") {
    import spark.implicits._
    // sf0.001's corpus IS the training sample (< 2048 vectors), so
    // the whitened covariance must be the identity up to eps
    val w = Similarity.whitenEmbeddings(spark, sf)
      .select(col("whitened")).as[Array[Double]].collect()
    val n = w.length
    val dim = w.head.length
    val mean = Array.tabulate(dim)(j => w.map(_(j)).sum / n)
    for (i <- 0 until dim; j <- i until dim) {
      val cov = w.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov - want) < 1e-3, s"cov($i,$j) = $cov")
    }
  }

  test("the isotropic corpus shows a near-flat scree") {
    import spark.implicits._
    val vars = SparkEntry.queries("emb_pca")(spark, sf)
      .select(col("var_p")).as[Double].collect()
    assert(vars.max <= 5 * vars.min,
      s"scree spread ${vars.max}/${vars.min} — not isotropic?")
  }
}
