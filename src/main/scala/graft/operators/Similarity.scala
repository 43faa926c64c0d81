package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the embedding column
  * (SURVEY.md §2b). Brute-force cosine is the correctness baseline;
  * random-hyperplane LSH is the 100 TB path (bucketing turns the
  * O(n·q) scan into an equi-join on the code).
  */
object Similarity {

  /** Cosine similarity of two float arrays, computed in double with a
    * sequential left fold — the same expression tree the oracle uses,
    * so results are bit-reproducible across engines. Stays inside
    * whole-stage codegen (higher-order functions, no UDF). */
  def cosineD(a: Column, b: Column): Column = {
    def fold(f: (Column, Column) => Column) =
      aggregate(zip_with(a, b, (x, y) => f(x.cast("double"), y.cast("double"))),
        lit(0.0), (acc, x) => acc + x)
    val dot = fold((x, y) => x * y)
    val na = sqrt(fold((x, _) => x * x))
    val nb = sqrt(fold((_, y) => y * y))
    dot / (na * nb)
  }

  /** Pair scoring uses the native codegen'd [[CosineSimilarity]]
    * expression — one fused primitive loop per pair, inside
    * whole-stage codegen (the HOF formulation is CodegenFallback and
    * an order of magnitude slower). */
  private val cos = graft.functions.CosineSimilarity.cosineSim _

  /** Per-query top-k via [[graft.functions.TopK.TopKAggregator]] —
    * bounded buffers, map-side partial top-k, no per-group sort (the
    * window/row_number alternative sorts each query's whole candidate
    * list before discarding all but k). */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(col("query_id"), col("neighbor_id"), col("cos_sim"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => graft.functions.TopK.Scored(t._2, t._3))
      .agg(new graft.functions.TopK.TopKAggregator(k).toColumn)
      .flatMap { case (qid, arr) =>
        arr.iterator.zipWithIndex.map { case (sc, i) => (qid, sc.id, sc.score, i + 1) } }
      .toDF("query_id", "neighbor_id", "cos_sim", "rank")
      .orderBy(col("query_id"), col("rank"))
  }

  /** Brute-force top-k: broadcast the (small) query set, one pass
    * over the corpus, per-query top-k via bounded aggregation. */
  def annBruteforce(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("v"))
    val q = broadcast(Tables.embeddings(s, d).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val scored = e.join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cos(col("qv"), col("v")), 6).as("cos_sim"))
    topKPerQuery(scored, k)
  }

  // ---- IVF (inverted-file) ANN -----------------------------------------

  /** Spherical k-means on a driver-side sample — the coarse quantizer
    * for IVF. Deterministic: seeded by taking evenly-spaced sample
    * vectors as initial centroids. Centroids are unit-normalized so
    * assignment is argmax dot. */
  private[operators] def trainCentroids(sample: Array[Array[Float]],
                                        nlist: Int, iters: Int): Array[Array[Double]] = {
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val dim = sample.head.length
    val stride = math.max(1, sample.length / nlist)
    var cents = (0 until nlist)
      .map(i => normalize(sample(i * stride % sample.length).map(_.toDouble)))
      .toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        val b = nearestCentroid(cents, v)
        var j = 0
        while (j < dim) { sums(b)(j) += v(j); j += 1 }
        counts(b) += 1
      }
      cents = cents.indices.map { i =>
        if (counts(i) == 0) cents(i) else normalize(sums(i))
      }.toArray
    }
    cents
  }

  private[operators] def nearestCentroid(cents: Array[Array[Double]],
                                         v: Array[Float]): Int = {
    var best = 0; var bestDot = Double.MinValue
    var i = 0
    while (i < cents.length) {
      var dot = 0.0; var j = 0
      while (j < v.length) { dot += cents(i)(j) * v(j); j += 1 }
      if (dot > bestDot) { bestDot = dot; best = i }
      i += 1
    }
    best
  }

  private def topCentroids(cents: Array[Array[Double]], v: Array[Float],
                           nprobe: Int): Seq[Int] =
    cents.indices.map { i =>
      var dot = 0.0; var j = 0
      while (j < v.length) { dot += cents(i)(j) * v(j); j += 1 }
      (i, dot)
    }.sortBy(-_._2).take(nprobe).map(_._1)

  /** IVF ANN: corpus bucketed by nearest centroid (write-side
    * partitioning at scale), queries probe their `nprobe` nearest
    * buckets, candidates reranked by exact cosine. The quantizer is
    * trained on a bounded sample (standard IVF practice — sample size
    * is independent of corpus size, so the collect is O(1) at 100 TB). */
  def annIvf(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
             nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val sample = emb.orderBy("vec_id").limit(2048)
      .select("embedding").as[Array[Float]].collect()
    val cents = trainCentroids(sample, nlist, iters = 10)
    val bc = s.sparkContext.broadcast(cents)
    val bucketed = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, nearestCentroid(bc.value, v), v) }
      .toDF("neighbor_id", "bucket", "v")
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        topCentroids(bc.value, v, nprobe).iterator.map(b => (id, b, v)) }
      .toDF("query_id", "bucket", "qv")
    val cand = bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
    topKPerQuery(cand.select(col("query_id"), col("neighbor_id"),
      round(cos(col("qv"), col("v")), 6).as("cos_sim")), k)
  }

  private val NumPlanes = 8

  /** Deterministic random hyperplanes (seeded; 64-dim to match the
    * embedding column). */
  private lazy val planes: Seq[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(NumPlanes)(Array.fill(64)(rnd.nextGaussian()))
  }

  /** The hyperplanes as a DuckDB VALUES list `(pid, plane)` — doubles
    * are printed in shortest round-trip form, so the oracle hashes
    * with the exact same planes. */
  def planesSqlValues: String =
    planes.zipWithIndex.map { case (p, i) =>
      s"($i, [${p.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n        ")

  /** Sign-of-projection LSH code (NumPlanes bits) for a vector col. */
  def lshCode(v: Column): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      val dot = aggregate(zip_with(v, plane, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1), i)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed ANN: same-code candidates reranked by exact cosine.
    * Recall < 1 by construction; the bench compares it against the
    * brute-force baseline. At scale the corpus side is bucketed once
    * (write-side partitioning) and queries probe their bucket only. */
  def annLsh(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("v"))
      .withColumn("code", lshCode(col("v")))
    val q = broadcast(Tables.embeddings(s, d).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("code", lshCode(col("qv"))))
    val cand = e.join(q, Seq("code")).filter(col("neighbor_id") =!= col("query_id"))
    topKPerQuery(cand.select(col("query_id"), col("neighbor_id"),
      round(cos(col("qv"), col("v")), 6).as("cos_sim")), k)
  }
}
