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
  private[graft] def topKPerQuery(scored: DataFrame, k: Int,
                                  ordered: Boolean = true): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val top = scored.select(col("query_id"), col("neighbor_id"), col("cos_sim"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => graft.functions.TopK.Scored(t._2, t._3))
      .agg(new graft.functions.TopK.TopKAggregator(k).toColumn)
      .flatMap { case (qid, arr) =>
        arr.iterator.zipWithIndex.map { case (sc, i) => (qid, sc.id, sc.score, i + 1) } }
      .toDF("query_id", "neighbor_id", "cos_sim", "rank")
    // ordered=false for INTERIOR consumers (shortlists feeding a
    // rerank join, edge frames feeding loops/aggregations): the next
    // operator destroys order anyway, and behind a localCheckpoint
    // Catalyst cannot eliminate the sort — skipping it drops a range
    // exchange + the range-partitioner sampling job (guide §2.4).
    // Rank values are unaffected (the aggregator's array is sorted).
    if (ordered) top.orderBy(col("query_id"), col("rank")) else top
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

  /** ann_prefix: the DIMENSION-TRUNCATION ANN tier (Matryoshka/MRL
    * serving: rank on the first `prefixDims` dims, rerank the bounded
    * shortlist on full precision) — the compression axis ORTHOGONAL
    * to quantization: SQ8/PQ shrink per-dim precision, this drops
    * dims entirely (the "dimensions" knob modern embedding APIs
    * expose; MRL trains embeddings so prefixes carry most of the
    * signal). Shortlist = per-query top-`cand` by prefix cosine
    * (6 dp, id tie-break — the bruteforce determinism recipe applied
    * to the sliced arrays), rerank = exact full-dim cosine over cand
    * rows only. The ISOTROPIC synthetic corpus is this tier's WORST
    * case — a 32-of-64 prefix holds only half the variance (prefix/
    * full cosine correlation ≈ √(prefix/dims)) — so the default cand
    * is the measured knee at that geometry, like PqCand: cand
    * 200/300/400/500 → recall@5 0.86/0.92/0.96/0.98 at sf0.1 (400 is
    * the knee — +0.04 over 300 for 1.33× candidates, +0.02 more
    * costs another 1.25×); MRL-trained embeddings reach the same
    * recall with a fraction of the candidates. */
  private[graft] val PrefixDims = 32
  private[graft] val PrefixCand = 400

  /** Since r12 the exact tier ROUTES THROUGH the composed
    * [[annIvfPrefix]] at exhaustive nprobe (= nlist): the probe then
    * prunes nothing, so results are bit-identical to the flat
    * broadcast-≠ corpus scan ([[annPrefixFlat]], kept as the spec's
    * ground truth) — but the candidate join is a bucket EQUI-join,
    * retiring this tier's BroadcastNestedLoopJoin from the serving
    * path (the bucket-assignment map adds ~nlist·dim flops/vector,
    * noise next to the prefix scoring itself). */
  def annPrefix(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
                prefixDims: Int = PrefixDims,
                cand: Int = PrefixCand): DataFrame =
    annIvfPrefix(s, d, nQueries, k, nlist = IvfNlist, nprobe = IvfNlist,
      prefixDims = prefixDims, cand = cand)

  /** The flat broadcast-≠ corpus-scan form of the prefix tier — the
    * reference implementation [[annPrefix]] is spec'd bit-identical
    * to (SimilaritySpec); not a serving path. */
  private[graft] def annPrefixFlat(s: SparkSession, d: String,
                                   nQueries: Int = 10, k: Int = 5,
                                   prefixDims: Int = PrefixDims,
                                   cand: Int = PrefixCand): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("v"))
    val q = broadcast(Tables.embeddings(s, d).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val pre = e.join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cos(slice(col("qv"), 1, prefixDims),
          slice(col("v"), 1, prefixDims)), 6).as("cos_sim"))
    val top = topKPerQuery(pre, cand, ordered = false).select("query_id", "neighbor_id")
    pqRerank(top, Tables.embeddings(s, d).filter(col("vec_id") < nQueries),
      Tables.embeddings(s, d), k)
  }

  // ---- IVF (inverted-file) ANN -----------------------------------------

  /** Spherical k-means on a driver-side sample — the coarse quantizer
    * for IVF. Deterministic: seeded by taking evenly-spaced sample
    * vectors as initial centroids. Centroids are unit-normalized so
    * assignment is argmax dot. */
  private[graft] def trainCentroids(sample: Array[Array[Float]],
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

  private[graft] def nearestCentroid(cents: Array[Array[Double]],
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

  private[graft] def topCentroids(cents: Array[Array[Double]], v: Array[Float],
                           nprobe: Int): Seq[Int] =
    cents.indices.map { i =>
      var dot = 0.0; var j = 0
      while (j < v.length) { dot += cents(i)(j) * v(j); j += 1 }
      (i, dot)
    }.sortBy(-_._2).take(nprobe).map(_._1)

  /** Default IVF geometry: 32 lists, 16 probed. Like the LSH default,
    * sized by the measured recall@5 sweep on the isotropic synthetic
    * corpus (Scale10 ivf_sweep: nprobe 8/12/16/20 → recall
    * 0.78/0.84/0.94/0.96 at candidate fraction 0.25/0.38/0.50/0.63):
    * 16 is the knee — +0.10 recall over 12 for 1.33× candidates,
    * while 20 buys only +0.02 more for another 1.25×. The old default
    * of 12 sat 0.04 above RecallSpec's 0.8 floor — one data drift
    * from red; 16 holds a 0.14 margin. Clustered real data reaches
    * the same recall with far fewer probes. Parameters, not
    * constants. */
  private[graft] val IvfNlist = 32
  private[graft] val IvfNprobe = 16

  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, String), Array[Array[Double]]]

  /** Fingerprint of the embeddings files backing `d` (name, length,
    * mtime) — keys the centroid cache on the DATA, not just the path,
    * so a rewritten/regenerated dataset retrains instead of silently
    * reusing stale centroids within the same JVM. */
  private def dataFingerprint(s: SparkSession, d: String): String = {
    val path = new org.apache.hadoop.fs.Path(s"$d/embeddings.parquet")
    val fs = path.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(path)) "absent"
    else {
      val statuses =
        if (fs.getFileStatus(path).isDirectory) fs.listStatus(path)
        else Array(fs.getFileStatus(path))
      statuses.map(st =>
        s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .sorted.mkString(",")
    }
  }

  /** Train the IVF coarse quantizer from a bounded, deterministic
    * sample of the corpus (first 2048 vectors by id). Shared by the
    * query and its oracle so both see bit-identical centroids —
    * which also makes it cacheable: one training per (dir, nlist,
    * data-fingerprint) per JVM instead of one per query/oracle/spec
    * call, and a dataset rewrite invalidates the entry. */
  private[graft] def ivfCentroids(s: SparkSession, d: String,
                                  nlist: Int = IvfNlist): Array[Array[Double]] = {
    val key = (d, nlist, dataFingerprint(s, d))
    centroidCache.getOrElseUpdate(key, {
      // a rewritten dataset supersedes its old fingerprints — drop
      // them so a long-lived JVM holds one live entry per (dir, nlist)
      centroidCache.keySet
        .filter(k => k._1 == d && k._2 == nlist && k != key)
        .foreach(centroidCache.remove)
      import s.implicits._
      val sample = Tables.embeddings(s, d).orderBy("vec_id").limit(2048)
        .select("embedding").as[Array[Float]].collect()
      trainCentroids(sample, nlist, iters = 10)
    })
  }

  /** IVF ANN: corpus bucketed by nearest centroid (write-side
    * partitioning at scale), queries probe their `nprobe` nearest
    * buckets, candidates reranked by exact cosine. The quantizer is
    * trained on a bounded sample (standard IVF practice — sample size
    * is independent of corpus size, so the collect is O(1) at 100 TB). */
  def annIvf(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
             nlist: Int = IvfNlist, nprobe: Int = IvfNprobe): DataFrame = {
    val cand = annIvfCandidatesWithVecs(s, d, nQueries, nlist, nprobe)
    topKPerQuery(cand.select(col("query_id"), col("neighbor_id"),
      round(cos(col("qv"), col("v")), 6).as("cos_sim")), k)
  }

  /** (query_id, neighbor_id) candidates BEFORE the exact rerank —
    * exposed so the Scale10 nprobe sweep can measure candidate
    * fraction (probed corpus share) alongside recall and time. */
  def annIvfCandidates(s: SparkSession, d: String, nQueries: Int = 10,
                       nlist: Int = IvfNlist, nprobe: Int = IvfNprobe): DataFrame =
    annIvfCandidatesWithVecs(s, d, nQueries, nlist, nprobe)
      .select(col("query_id"), col("neighbor_id"))

  private def annIvfCandidatesWithVecs(s: SparkSession, d: String, nQueries: Int,
                                       nlist: Int, nprobe: Int): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val cents = ivfCentroids(s, d, nlist)
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
    bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
  }

  /** The full (query × corpus) pair product as a bucket EQUI-join at
    * EXHAUSTIVE nprobe: corpus rows keep their single assigned IVF
    * bucket, every query probes ALL nlist buckets, so each pair meets
    * exactly once — result-identical to a broadcast cross product but
    * it plans as a hash join, never a BroadcastNestedLoopJoin (the
    * annIvfPrefix r12 precedent, applied to the hybrid-search
    * semantic side in r14). Self pairs are KEPT (the hybrid fusion
    * ranks the query document itself). Returns
    * (query_id, neighbor_id, qv, v). */
  private[graft] def exhaustivePairsFor(s: SparkSession, d: String,
                                        queryIds: Seq[Long]): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val cents = ivfCentroids(s, d)
    val bc = s.sparkContext.broadcast(cents)
    val bucketed = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, nearestCentroid(bc.value, v), v) }
      .toDF("neighbor_id", "bucket", "v")
    val probes = emb.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        (0 until bc.value.length).iterator.map(b => (id, b, v)) }
      .toDF("query_id", "bucket", "qv")
    bucketed.join(broadcast(probes), Seq("bucket"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("v"))
  }

  /** Default LSH geometry: 16 tables × 4 hyperplane bits. Chosen by
    * measuring recall@5 vs brute force on the synthetic corpus, whose
    * embeddings are ISOTROPIC (top-5 neighbors sit at cos≈0.3, barely
    * 2.5σ above random pairs) — the hardest regime for LSH. Measured:
    * recall ≈ 0.90 at ~0.65 candidate fraction here; on genuinely
    * clustered embeddings the same geometry reaches the same recall at
    * a small fraction of the corpus. Both knobs are parameters. */
  private[graft] val LshBits = 4
  private[graft] val LshTables = 16

  /** A multi-table hyperplane-LSH geometry: `tables` hash tables of
    * `bits` sign bits each (2^bits buckets per table). */
  case class LshGeometry(tables: Int, bits: Int)

  /** Probability that ONE random hyperplane puts a pair at cosine τ on
    * the same side: p = 1 − θ/π (Goemans–Williamson / Charikar). */
  def pBit(tau: Double): Double =
    1.0 - math.acos(math.max(-1.0, math.min(1.0, tau))) / math.Pi

  /** Expected pair recall of a geometry at threshold τ: a pair at
    * exactly τ collides in one table w.p. p^bits, and in ≥1 of
    * `tables` independent tables w.p. 1 − (1 − p^bits)^tables. Pairs
    * above τ only do better, so this is the recall FLOOR the geometry
    * guarantees at its threshold. */
  def expectedRecall(tau: Double, g: LshGeometry): Double = {
    val p = pBit(tau)
    1.0 - math.pow(1.0 - math.pow(p, g.bits), g.tables)
  }

  /** The measured geometry ladder (SURVEY §6), finest buckets first.
    * Scale10 occupancy: 16×4 at τ=0.35 is candidate-quadratic by 10×
    * (128M→513M candidates, forced by the isotropic corpus's at-noise
    * threshold); 32×16 at τ=0.9 is output-bound (433× fewer
    * candidates). */
  private[graft] val GeometryLadder: Seq[LshGeometry] =
    Seq(LshGeometry(32, 16), LshGeometry(32, 8), LshGeometry(16, 4))

  /** Joint (bits, τ) choice, codified: the FINEST geometry on the
    * ladder whose analytic recall floor at τ clears `targetRecall`.
    * This is what keeps the candidate join output-bound wherever τ
    * allows it — the coarse 4-bit buckets (whose candidate volume is
    * measured quadratic) can only be selected when τ is so low that
    * finer buckets would lose the pairs, never silently at production
    * thresholds. Throws below τ≈0.33 (even 16×4 cannot hold 0.9 there)
    * — callers with a sub-noise threshold must pick a geometry
    * explicitly rather than get one that quietly misses pairs.
    * Validated: predicts 0.914 for 16×4@0.35 (measured 0.925) and
    * 0.939 for 32×16@0.9 (measured ≥0.94). */
  def geometryFor(tau: Double, targetRecall: Double = 0.9): LshGeometry =
    GeometryLadder.find(g => expectedRecall(tau, g) >= targetRecall)
      .getOrElse(throw new IllegalArgumentException(
        f"no LSH geometry holds recall >= $targetRecall at tau=$tau%.3f " +
          "(threshold below the geometry ladder's floor) — pass an " +
          "explicit (numTables, numBits) instead"))

  private val planeCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int), Array[Array[Array[Double]]]]

  /** Deterministic seeded hyperplanes, `numTables × numBits` planes of
    * 64 dims (one Gaussian stream, so any (tables, bits) pair is
    * reproducible in the oracle). */
  private[graft] def lshPlanes(numTables: Int = LshTables,
                               numBits: Int = LshBits): Array[Array[Array[Double]]] =
    planeCache.getOrElseUpdate((numTables, numBits), {
      val rnd = new scala.util.Random(7)
      Array.fill(numTables, numBits, 64)(rnd.nextGaussian())
    })

  /** The hyperplanes as a DuckDB VALUES list `(tid, pid, plane)` —
    * doubles are printed in shortest round-trip form, so the oracle
    * hashes with the exact same planes. */
  def planesSqlValues: String =
    (for {
      (tab, t) <- lshPlanes().zipWithIndex
      (p, i) <- tab.zipWithIndex
    } yield s"($t, $i, [${p.map(_.toString).mkString(", ")}]::DOUBLE[])")
      .mkString(",\n        ")

  /** (vec_id, tid, code) sign-of-projection codes for every table, in
    * one typed pass (tight primitive loops — the HOF formulation is
    * CodegenFallback and would re-evaluate per exploded element).
    * Shared with [[Dedup.embLshDups]], which uses the codes as a
    * DEDUP blocking key rather than an ANN probe. */
  private[graft] def lshCodes(df: DataFrame,
                       bc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val pls = bc.value
        Iterator.tabulate(pls.length) { t =>
          var code = 0
          var i = 0
          while (i < pls(t).length) {
            val p = pls(t)(i)
            var dot = 0.0
            var j = 0
            while (j < v.length) { dot += p(j) * v(j); j += 1 }
            if (dot >= 0) code |= (1 << i)
            i += 1
          }
          (id, t, code)
        }
      }.toDF("vec_id", "tid", "code")
  }

  /** [[lshCodes]] variant that carries the embedding alongside each
    * (vec_id, tid, code) row — lets [[Dedup.embLshDups]] score
    * collisions inside the bucket join instead of re-joining the
    * corpus per candidate. */
  private[graft] def lshCodesWithVec(df: DataFrame,
                       bc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val pls = bc.value
        Iterator.tabulate(pls.length) { t =>
          var code = 0
          var i = 0
          while (i < pls(t).length) {
            val p = pls(t)(i)
            var dot = 0.0
            var j = 0
            while (j < v.length) { dot += p(j) * v(j); j += 1 }
            if (dot >= 0) code |= (1 << i)
            i += 1
          }
          (id, t, code, v)
        }
      }.toDF("vec_id", "tid", "code", "embedding")
  }

  /** Multi-table LSH ANN: a pair is a candidate if it collides in ANY
    * table (union-of-tables recall amplification — the same banding
    * idea as MinHash LSH); candidates are deduped then reranked by
    * exact cosine. At scale the corpus codes are computed once per
    * table (write-side), the candidate join shuffles on (tid, code),
    * and only the deduped candidate set pays the rerank. */
  def annLsh(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
             numBits: Int = LshBits, numTables: Int = LshTables): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val bc = s.sparkContext.broadcast(lshPlanes(numTables, numBits))
    val corpus = lshCodes(emb, bc)
    val queries = lshCodes(emb.filter(col("vec_id") < nQueries), bc)
      .withColumnRenamed("vec_id", "query_id")
    val cand = corpus.join(broadcast(queries), Seq("tid", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val qv = broadcast(emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val scored = cand
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("v")),
        "neighbor_id")
      .join(qv, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cos(col("qv"), col("v")), 6).as("cos_sim"))
    topKPerQuery(scored, k)
  }

  /** Write the corpus partitioned by IVF bucket — the write-side
    * layout that turns a query's nprobe probe into PARTITION PRUNING:
    * the scan reads only the probed bucket directories and never
    * touches the rest of the corpus (ScaleTechniquesSpec asserts the
    * PartitionFilters). At 100 TB this is the difference between
    * scanning nprobe/nlist of the corpus and all of it. */
  def writeIvfPartitioned(s: SparkSession, d: String, dir: String,
                          nlist: Int = IvfNlist): Array[Array[Double]] = {
    val cents = ivfCentroids(s, d, nlist)
    writeIvfPartitionedOn(Tables.embeddings(s, d), cents, dir)
    cents
  }

  /** [[writeIvfPartitioned]] over an arbitrary `(vec_id, embedding)`
    * frame with pre-trained centroids — the form the scale probes use
    * to lay out a replicated corpus under the 1× quantizer (centroids
    * are a property of the data GEOMETRY, so the 1× training serves
    * the replicated corpus too). */
  def writeIvfPartitionedOn(emb: DataFrame, cents: Array[Array[Double]],
                            dir: String): Unit =
    ivfAssign(emb, cents)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

  /** Append a batch of arriving vectors to the standing
    * bucket-partitioned serving layout — the ANN corpus's daily
    * maintenance step (the serving-side analog of the dedup index
    * artifacts [[graft.operators.Dedup.dedupIncrementalStep]]): the
    * batch assigns against the SAME trained centroids and its rows
    * land inside the existing bucket directories, so tomorrow's
    * probes see today's vectors with no corpus rewrite and partition
    * pruning keeps working unchanged. Quantizer drift is a retrain-
    * and-rewrite decision (centroids are a property of the data
    * geometry — stable under arrivals drawn from it); spec'd:
    * append-then-serve ≡ serve over a one-shot layout of the union. */
  def appendIvfPartitioned(batch: DataFrame, cents: Array[Array[Double]],
                           dir: String): Unit =
    ivfAssign(batch, cents)
      .write.mode("append").partitionBy("bucket").parquet(dir)

  /** Periodic maintenance for the bucket-partitioned serving corpus:
    * each daily [[appendIvfPartitioned]] leaves one more small file
    * inside every touched bucket directory, and probe latency decays
    * with the per-bucket file count — re-collapse in place, KEEPING
    * the bucket partitioning so pruned probes keep pruning
    * (serve-identical, spec'd). */
  def compactIvfPartitioned(s: SparkSession, dir: String,
                            targetBytes: Long = 128L << 20)
      : graft.sources.Compact.CompactReport =
    graft.sources.Compact.compactInPlace(s, dir, targetBytes,
      partitionCols = Seq("bucket"),
      transform = df => minusTombstones(s, dir, df))

  // ---- deletion support (tombstones over the stored layouts) -------------

  private def tombstonePath(dir: String) = s"$dir/_tombstones"

  /** DELETE vectors from a bucket-partitioned serving layout — the
    * maintenance verb the append/compact/retrain loop lacked: a
    * delete never rewrites bucket files (they are immutable between
    * compactions); it appends the ids to a TOMBSTONE log stored
    * UNDER the layout (`_tombstones` — the underscore keeps it
    * invisible to every parquet scan of the layout itself). Serving
    * subtracts the log (a broadcast anti-join: the log is bounded by
    * deletions since the last compaction), and
    * [[compactIvfPartitioned]] FOLDS it into the periodic rewrite —
    * rows dropped physically, log cleared by the same directory swap
    * (the standard LSM tombstone discipline applied to a vector
    * index). Works unchanged for the float, SQ8, PQ and
    * attribute-carrying layouts (all key rows by `vec_id`). Ids are
    * NEVER reused in this engine (the corpus id discipline), so a
    * tombstone cannot shadow a later insert. */
  def deleteFromLayout(s: SparkSession, dir: String, ids: DataFrame): Unit =
    ids.select(col("vec_id")).distinct()
      .write.mode("append").parquet(tombstonePath(dir))

  /** Subtract `dir`'s tombstone log from a frame of layout rows —
    * a no-op (and no extra plan nodes) when no deletes exist. */
  private[graft] def minusTombstones(s: SparkSession, dir: String,
                                     rows: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(tombstonePath(dir))
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) rows
    else rows.join(broadcast(s.read.parquet(tombstonePath(dir))
        .select(col("vec_id")).distinct()),
      Seq("vec_id"), "left_anti")
  }

  // ---- IVF quantizer-drift monitoring ------------------------------------

  /** One monitoring snapshot of a bucket-partitioned serving layout:
    * corpus size, bucket-occupancy skew (max bucket count / mean —
    * 1.0 is perfectly balanced; skew degrades probe cost because a
    * probe of a hot bucket scans its whole partition), and the mean
    * cosine distance of each vector to its ASSIGNED centroid (rises
    * as arrivals drift away from the geometry the quantizer was
    * trained on). */
  case class IvfLayoutStats(nVectors: Long, nBuckets: Int,
                            occSkew: Double, meanAssignDist: Double)

  /** Compute [[IvfLayoutStats]] in one pass over the stored layout —
    * a few counters per bucket plus one distance sum, so the monitor
    * costs one pruned-free corpus scan and nothing else. Run at write
    * time for the baseline snapshot and per maintenance cycle for the
    * drift check ([[ivfDrifted]]). */
  def ivfLayoutStats(s: SparkSession, dir: String,
                     cents: Array[Array[Double]]): IvfLayoutStats = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    val perBucket = s.read.parquet(dir)
      .select(col("bucket"), col("embedding"))
      .as[(Int, Array[Float])]
      .map { case (b, v) =>
        val c = bc.value(b)
        var dot = 0.0; var j = 0
        while (j < v.length) { dot += c(j) * v(j); j += 1 }
        (b, 1L, 1.0 - dot) // centroids are unit-normalized
      }
      .toDF("bucket", "n", "dist")
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n"), sum(col("dist")).as("dist"))
      .collect()
    val n = perBucket.map(_.getAs[Long]("n")).sum
    val maxOcc = perBucket.map(_.getAs[Long]("n")).max.toDouble
    val meanOcc = n.toDouble / cents.length
    IvfLayoutStats(n, perBucket.length, maxOcc / meanOcc,
      perBucket.map(_.getAs[Double]("dist")).sum / n)
  }

  /** The retrain decision: drift is RELATIVE to the write-time
    * snapshot — occupancy skew grew past `skewTol`× the baseline, or
    * mean assignment distance grew past `distTol`× — so a corpus that
    * was born skewed doesn't page anyone, and a balanced corpus that
    * drifts does. */
  def ivfDrifted(current: IvfLayoutStats, baseline: IvfLayoutStats,
                 skewTol: Double = 1.5, distTol: Double = 1.2): Boolean =
    current.occSkew > baseline.occSkew * skewTol ||
      current.meanAssignDist > baseline.meanAssignDist * distTol

  /** The retrain-and-migrate rename discipline shared by every layout
    * retrain (IVF, IVF-PQ, SQ8, whitened): clear stale generations,
    * `write` the rebuilt layout at `dir + ".retraining"`, stage the
    * live one aside as `.old` (one pinned-reader grace generation),
    * swap the rebuilt one in. */
  private def swapInRetrained(s: SparkSession, dir: String)
                             (write: String => Unit): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def p(x: String) = new org.apache.hadoop.fs.Path(x)
    if (fs.exists(p(dir + ".old"))) fs.delete(p(dir + ".old"), true)
    if (fs.exists(p(dir + ".retraining"))) fs.delete(p(dir + ".retraining"), true)
    write(dir + ".retraining")
    require(fs.rename(p(dir), p(dir + ".old")), s"could not stage $dir aside")
    require(fs.rename(p(dir + ".retraining"), p(dir)),
      s"could not swap retrained $dir in")
  }

  /** Retrain-and-migrate: re-train the coarse quantizer on the
    * layout's CURRENT contents (bounded deterministic sample, like
    * the original training), re-assign every vector, and swap the
    * rewritten layout in under the same path (the
    * [[graft.sources.Compact.compactInPlace]] rename discipline, one
    * `.old` grace generation). Returns the new centroids — serving
    * must switch to them atomically with the layout (they define the
    * probe geometry). Exhaustive-probe results are unchanged by
    * construction (rerank is exact); pruned-probe recall is restored
    * to the trained-geometry regime (spec'd). */
  def retrainIvfPartitioned(s: SparkSession, dir: String,
                            nlist: Int = IvfNlist): Array[Array[Double]] = {
    import s.implicits._
    // tombstones fold through EVERY rewrite of the layout (the swap
    // would otherwise drop the log while keeping the dead rows —
    // resurrecting deleted vectors); training samples live rows only
    val live = minusTombstones(s, dir,
      s.read.parquet(dir).select(col("vec_id"), col("embedding")))
    val sample = live
      .orderBy("vec_id").limit(2048)
      .select("embedding").as[Array[Float]].collect()
    val cents = trainCentroids(sample, nlist, iters = 10)
    swapInRetrained(s, dir)(writeIvfPartitionedOn(live, cents, _))
    cents
  }

  private def ivfAssign(emb: DataFrame,
                        cents: Array[Array[Double]]): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, nearestCentroid(bc.value, v), v) }
      .toDF("vec_id", "bucket", "embedding")
  }

  /** ANN over the bucket-partitioned layout: per query, probe the
    * nprobe nearest centroid partitions (a pushed-down `bucket IN
    * (...)` filter) and rerank exactly — identical results to
    * [[annIvf]] by construction, but the corpus scan is pruned at the
    * source instead of filtered after a full read. */
  def annIvfPartitioned(s: SparkSession, dir: String, cents: Array[Array[Double]],
                        queries: DataFrame, k: Int = 5,
                        nprobe: Int = IvfNprobe): DataFrame =
    annIvfServeBatch(s, dir, cents,
      queries.select(col("vec_id").as("query_id"), col("embedding")),
      k, nprobe, excludeSelf = true)

  /** Serve ONE batch of queries against the stored bucket-partitioned
    * layout ([[writeIvfPartitioned]]): fan each query out to its
    * `nprobe` nearest centroids, collect the batch's probed bucket set
    * (bounded by nlist — driver-safe), and read the corpus with a
    * pushed-down `bucket IN (...)` so the scan touches ONLY the probed
    * partition directories — per-batch cost tracks probes, not corpus
    * size. This is the per-micro-batch body of the streaming serving
    * path ([[graft.streaming.EventStream.streamingAnnIvfTopK]]) and
    * the shared core of [[annIvfPartitioned]].
    *
    * `queries` must have `(query_id, embedding)`. `excludeSelf`
    * defaults to FALSE: in the serving form query ids are an
    * INDEPENDENT id space from corpus `vec_id`s, so a numeric
    * collision must not silently drop a corpus candidate; the batch
    * benchmark form (queries drawn from the corpus itself) opts in. */
  def annIvfServeBatch(s: SparkSession, dir: String, cents: Array[Array[Double]],
                       queries: DataFrame, k: Int = 5,
                       nprobe: Int = IvfNprobe,
                       excludeSelf: Boolean = false): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    val probes = queries
      .select(col("query_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        topCentroids(bc.value, v, nprobe).iterator.map(b => (id, b, v)) }
      .toDF("query_id", "bucket", "qv")
    val probedBuckets = probes.select("bucket").distinct()
      .as[Int].collect().sorted // bounded by nlist — driver-safe
    val corpus = minusTombstones(s, dir, s.read.parquet(dir)
      .filter(col("bucket").isin(probedBuckets.map(Integer.valueOf): _*)))
    val cand0 = corpus.join(broadcast(probes), Seq("bucket"))
    val cand = if (excludeSelf) cand0.filter(col("vec_id") =!= col("query_id"))
               else cand0
    topKPerQuery(cand.select(col("query_id"), col("vec_id").as("neighbor_id"),
      round(cos(col("qv"), col("embedding")), 6).as("cos_sim")), k)
  }

  // ---- Filtered ANN (attribute predicate + IVF in one serve) ------------

  /** Default probe width for FILTERED search: wider than the
    * unfiltered IvfNprobe=16 because a selective predicate thins every
    * probed bucket — the true filtered top-k sit at lower cosine than
    * the unfiltered top-k, so their buckets correlate less with the
    * query and per-bucket survivors are ~selectivity× fewer. Measured
    * knee on the isotropic corpus at the ~10% equal-label predicate
    * (Scale10 filtered sweep, recall@5 vs FILTERED brute force at
    * sf0.1): nprobe 16/20/24/28/32 → 0.84/0.90/0.98/1.00/1.00 — the
    * same nprobe=16 that holds 0.94 UNfiltered drops to 0.84 here
    * (the standard "filtered vector search recall collapse", probed
    * on purpose); 24 is the knee, +0.08 over 20 for 1.2× candidates
    * while 28 buys only +0.02 more. */
  private[graft] val FilteredNprobe = 24

  /** ann_ivf_filtered: attribute-predicate + ANN in ONE serve — the
    * production "filtered vector search" operator (tenant/language/
    * license filters over a vector corpus): per query, top-k by exact
    * cosine among ONLY the rows satisfying the predicate (here: label
    * equality with the query's own label, the metadata-match shape),
    * with candidates drawn from the query's `nprobe` nearest IVF
    * buckets. The predicate is applied INSIDE the bucket join (and at
    * the SCAN in the stored form — pushed down as `label IN
    * (batch labels)`), never as a post-filter on an unfiltered top-k
    * (post-filtering returns < k rows and loses recall
    * catastrophically at low selectivity). */
  def annIvfFiltered(s: SparkSession, d: String, nQueries: Int = 10,
                     k: Int = 5, nlist: Int = IvfNlist,
                     nprobe: Int = FilteredNprobe): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val cents = ivfCentroids(s, d, nlist)
    val bc = s.sparkContext.broadcast(cents)
    val bucketed = emb.select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)]
      .map { case (id, v, lb) => (id, nearestCentroid(bc.value, v), v, lb) }
      .toDF("neighbor_id", "bucket", "v", "label")
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)]
      .flatMap { case (id, v, lb) =>
        topCentroids(bc.value, v, nprobe).iterator.map(b => (id, b, v, lb)) }
      .toDF("query_id", "bucket", "qv", "qlabel")
    val cand = bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col("label") === col("qlabel") &&
        col("neighbor_id") =!= col("query_id"))
    topKPerQuery(cand.select(col("query_id"), col("neighbor_id"),
      round(cos(col("qv"), col("v")), 6).as("cos_sim")), k)
  }

  /** The FILTERED exact baseline — brute-force top-k among the rows
    * passing the predicate (equal label), an EQUI-join on the label
    * (no BNLJ: the predicate itself is the join key). The ground
    * truth filtered recall is measured against. */
  def annBruteforceFiltered(s: SparkSession, d: String, nQueries: Int = 10,
                            k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val e = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("v"), col("label"))
    val q = broadcast(emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel")))
    val scored = e.join(q, col("label") === col("qlabel") &&
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cos(col("qv"), col("v")), 6).as("cos_sim"))
    topKPerQuery(scored, k)
  }

  /** Write the corpus bucket-partitioned WITH its filter attributes —
    * the layout filtered serving scans: same bucket partitioning as
    * [[writeIvfPartitioned]], every non-embedding column carried so
    * predicates push down to the pruned scan. */
  def writeIvfFilteredPartitioned(s: SparkSession, d: String, dir: String,
                                  nlist: Int = IvfNlist): Array[Array[Double]] = {
    val cents = ivfCentroids(s, d, nlist)
    writeIvfFilteredPartitionedOn(Tables.embeddings(s, d), cents, dir)
    cents
  }

  /** [[writeIvfFilteredPartitioned]] over an arbitrary
    * `(vec_id, embedding, label)` frame with pre-trained centroids —
    * the form the scale probes lay replicated corpora out with. */
  def writeIvfFilteredPartitionedOn(emb: DataFrame,
                                    cents: Array[Array[Double]],
                                    dir: String): Unit = {
    val s = emb.sparkSession
    val bc = s.sparkContext.broadcast(cents)
    import s.implicits._
    emb.select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)]
      .map { case (id, v, lb) => (id, nearestCentroid(bc.value, v), v, lb) }
      .toDF("vec_id", "bucket", "embedding", "label")
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
  }

  /** Serve one query batch against the attribute-carrying layout:
    * probed-bucket partition pruning AND the batch's label set pushed
    * to the scan (`label IN (...)` lands in PushedFilters — row
    * groups without matching labels never decompress), then the exact
    * per-query label-equality filter inside the bucket join. Spec'd
    * equal to [[annIvfFiltered]] at the same geometry. `queries` must
    * have `(query_id, embedding, label)`. */
  def annIvfFilteredServeBatch(s: SparkSession, dir: String,
                               cents: Array[Array[Double]], queries: DataFrame,
                               k: Int = 5, nprobe: Int = FilteredNprobe,
                               excludeSelf: Boolean = false): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    val probes = queries
      .select(col("query_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)]
      .flatMap { case (id, v, lb) =>
        topCentroids(bc.value, v, nprobe).iterator.map(b => (id, b, v, lb)) }
      .toDF("query_id", "bucket", "qv", "qlabel")
    val probedBuckets = probes.select("bucket").distinct()
      .as[Int].collect().sorted // bounded by nlist — driver-safe
    val batchLabels = probes.select("qlabel").distinct()
      .as[Int].collect().sorted // bounded by the batch size — driver-safe
    val corpus = minusTombstones(s, dir, s.read.parquet(dir)
      .filter(col("bucket").isin(probedBuckets.map(Integer.valueOf): _*) &&
        col("label").isin(batchLabels.map(Integer.valueOf): _*)))
    val cand0 = corpus.join(broadcast(probes), Seq("bucket"))
      .filter(col("label") === col("qlabel"))
    val cand = if (excludeSelf) cand0.filter(col("vec_id") =!= col("query_id"))
               else cand0
    topKPerQuery(cand.select(col("query_id"), col("vec_id").as("neighbor_id"),
      round(cos(col("qv"), col("embedding")), 6).as("cos_sim")), k)
  }

  /** DuckDB oracle for ann_ivf_filtered — [[annIvfOracleSql]]'s
    * assign/probe CTEs with the label-equality predicate applied at
    * candidate generation (never post-top-k). */
  def annIvfFilteredOracleSql(s: SparkSession, d: String, nQueries: Int = 10,
                              k: Int = 5, nlist: Int = IvfNlist,
                              nprobe: Int = FilteredNprobe): String = {
    val cents = ivfCentroids(s, d, nlist)
    val centsSql = cents.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n        ")
    s"""
      WITH cents(cid, c) AS (VALUES
        $centsSql),
      scored AS (
        SELECT vec_id, cid,
          list_inner_product(CAST(embedding AS DOUBLE[]), c) AS dot
        FROM embeddings CROSS JOIN cents),
      assign AS (
        SELECT vec_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scored) WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scored WHERE vec_id < $nQueries) WHERE rn <= $nprobe),
      cnd AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM assign a
        JOIN probes p ON a.bucket = p.bucket AND a.vec_id <> p.query_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings ep ON ep.vec_id = p.query_id
        WHERE ea.label = ep.label),
      rer AS (
        SELECT c.query_id, c.neighbor_id,
          round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                       CAST(ne.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM cnd c
        JOIN embeddings qe ON qe.vec_id = c.query_id
        JOIN embeddings ne ON ne.vec_id = c.neighbor_id)
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
        FROM rer)
      WHERE rank <= $k ORDER BY query_id, rank"""
  }

  // ---- IVF × prefix (the composed Matryoshka serving tier) --------------

  /** ann_ivf_prefix: [[annPrefix]]'s dimension-truncation shortlist
    * composed INSIDE the IVF probe — the same composition
    * [[annIvfSq8]] / [[annIvfPq]] give their flat tiers, closing the
    * prefix tier's corpus-scan baseline: candidates come only from
    * each query's `nprobe` nearest centroid buckets (a bucket
    * equi-join — no broadcast-≠ BNLJ anywhere in the plan), are
    * shortlisted by prefix cosine over the first `prefixDims` dims
    * (6 dp + id tie-break, the [[annPrefix]] determinism recipe),
    * and the bounded shortlist is reranked at full dimension. At
    * exhaustive nprobe (= nlist) the probe stops pruning and the
    * result is bit-identical to the flat [[annPrefix]] (spec'd in
    * SimilaritySpec) — so the flat tier is exactly this operator's
    * degenerate point, and production serves the pruned form. */
  def annIvfPrefix(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
                   nlist: Int = IvfNlist, nprobe: Int = IvfNprobe,
                   prefixDims: Int = PrefixDims,
                   cand: Int = PrefixCand): DataFrame = {
    val c = annIvfCandidatesWithVecs(s, d, nQueries, nlist, nprobe)
    val pre = c.select(col("query_id"), col("neighbor_id"),
      round(cos(slice(col("qv"), 1, prefixDims),
        slice(col("v"), 1, prefixDims)), 6).as("cos_sim"))
    val top = topKPerQuery(pre, cand, ordered = false).select("query_id", "neighbor_id")
    pqRerank(top, Tables.embeddings(s, d).filter(col("vec_id") < nQueries),
      Tables.embeddings(s, d), k)
  }

  /** Serve one query batch against the stored bucket-partitioned IVF
    * layout ([[writeIvfPartitioned]]) with the prefix shortlist: the
    * [[annIvfServeBatch]] probed-bucket pruned scan (pushed-down
    * `bucket IN (...)`), prefix-cosine shortlist per query, full-dim
    * rerank against the SAME pruned layout rows — the layout stores
    * full-precision embeddings, so the prefix view is a free slice at
    * read and the rerank re-reads only probed partitions. Per-batch
    * cost tracks probes × shortlist, never corpus size. Spec'd equal
    * to [[annIvfPrefix]] at the same geometry. */
  def annIvfPrefixServeBatch(s: SparkSession, dir: String,
                             cents: Array[Array[Double]], queries: DataFrame,
                             k: Int = 5, nprobe: Int = IvfNprobe,
                             prefixDims: Int = PrefixDims,
                             cand: Int = PrefixCand,
                             excludeSelf: Boolean = false): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    val probes = queries
      .select(col("query_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        topCentroids(bc.value, v, nprobe).iterator.map(b => (id, b, v)) }
      .toDF("query_id", "bucket", "qv")
    val probedBuckets = probes.select("bucket").distinct()
      .as[Int].collect().sorted // bounded by nlist — driver-safe
    val corpus = minusTombstones(s, dir, s.read.parquet(dir)
      .filter(col("bucket").isin(probedBuckets.map(Integer.valueOf): _*)))
    val cand0 = corpus.join(broadcast(probes), Seq("bucket"))
    val candf = if (excludeSelf) cand0.filter(col("vec_id") =!= col("query_id"))
                else cand0
    val pre = candf.select(col("query_id"), col("vec_id").as("neighbor_id"),
      round(cos(slice(col("qv"), 1, prefixDims),
        slice(col("embedding"), 1, prefixDims)), 6).as("cos_sim"))
    val top = topKPerQuery(pre, cand, ordered = false).select("query_id", "neighbor_id")
    val qv = queries.select(col("query_id"), col("embedding").as("qv"))
    val nv = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("v"))
    topKPerQuery(top.join(broadcast(qv), Seq("query_id"))
      .join(nv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cos(col("qv"), col("v")), 6).as("cos_sim")), k)
  }

  /** DuckDB oracle for ann_ivf_prefix — the [[annIvfOracleSql]]
    * assign/probe CTEs (trained centroids as literals) with the
    * ann_prefix shortlist-then-rerank tail spliced between candidate
    * generation and the final rank. */
  def annIvfPrefixOracleSql(s: SparkSession, d: String, nQueries: Int = 10,
                            k: Int = 5, nlist: Int = IvfNlist,
                            nprobe: Int = IvfNprobe,
                            prefixDims: Int = PrefixDims,
                            cand: Int = PrefixCand): String = {
    val cents = ivfCentroids(s, d, nlist)
    val centsSql = cents.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n        ")
    s"""
      WITH cents(cid, c) AS (VALUES
        $centsSql),
      scored AS (
        SELECT vec_id, cid,
          list_inner_product(CAST(embedding AS DOUBLE[]), c) AS dot
        FROM embeddings CROSS JOIN cents),
      assign AS (
        SELECT vec_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scored) WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scored WHERE vec_id < $nQueries) WHERE rn <= $nprobe),
      cnd AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM assign a JOIN probes p
          ON a.bucket = p.bucket AND a.vec_id <> p.query_id),
      pre AS (
        SELECT c.query_id, c.neighbor_id,
          qe.embedding AS qvec, ne.embedding AS nvec,
          round(list_cosine_similarity(
            CAST(qe.embedding[1:$prefixDims] AS DOUBLE[]),
            CAST(ne.embedding[1:$prefixDims] AS DOUBLE[])), 6) AS pc
        FROM cnd c
        JOIN embeddings qe ON qe.vec_id = c.query_id
        JOIN embeddings ne ON ne.vec_id = c.neighbor_id),
      short AS (
        SELECT query_id, neighbor_id, qvec, nvec FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY pc DESC, neighbor_id) AS pr
          FROM pre)
        WHERE pr <= $cand),
      rer AS (
        SELECT query_id, neighbor_id,
          round(list_cosine_similarity(CAST(qvec AS DOUBLE[]),
                                       CAST(nvec AS DOUBLE[])), 6) AS cos_sim
        FROM short)
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
        FROM rer)
      WHERE rank <= $k ORDER BY query_id, rank"""
  }

  // ---- PQ (product quantization) ---------------------------------------

  /** Default PQ geometry over the 64-dim corpus: 8 subspaces × 16
    * centroids = 4 bits/subspace, 4 bytes/vector — 64× smaller than
    * float32, the compression tier past SQ8 (FAISS PQ). `PqCand` ADC
    * candidates feed the exact rerank; 300 (15% of the corpus) is the
    * measured knee on the isotropic data: cand 200/300/400 → recall@5
    * 0.84/0.92/0.92 at k=16, and k=32 (5-bit codes) reaches 0.88/0.94
    * at 200/300 — 16×300 holds a 0.12 margin over the RecallSpec 0.8
    * floor without the bigger codebook. Clustered real embeddings
    * need a far smaller candidate fraction. */
  private[graft] val PqM = 8
  private[graft] val PqK = 16
  private[graft] val PqCand = 300

  /** argmin_c of −2·dot(v,c) + c·c (≡ argmin ‖v−c‖²; v·v is constant
    * per vector), ties to the lowest cid — the exact scalar tree the
    * oracle evaluates, so assignments are bit-identical. */
  private[operators] def nearestL2(cents: Array[Array[Double]],
                                   v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      var dot = 0.0; var cc = 0.0; var j = 0
      while (j < v.length) {
        dot += cents(i)(j) * v(j); cc += cents(i)(j) * cents(i)(j); j += 1
      }
      val dist = -2.0 * dot + cc
      if (dist < bestD) { bestD = dist; best = i }
      i += 1
    }
    best
  }

  /** Plain (L2) k-means for one PQ subspace — deterministic stride
    * init from the sample, mean updates (NOT spherical: subvectors
    * carry magnitude information the reconstruction needs). */
  private[operators] def trainPqSubspace(sub: Array[Array[Double]], k: Int,
                                         iters: Int): Array[Array[Double]] = {
    val dim = sub.head.length
    val stride = math.max(1, sub.length / k)
    var cents = (0 until k).map(i => sub(i * stride % sub.length).clone).toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sub.foreach { v =>
        val b = nearestL2(cents, v)
        var j = 0
        while (j < dim) { sums(b)(j) += v(j); j += 1 }
        counts(b) += 1
      }
      cents = cents.indices.map { i =>
        if (counts(i) == 0) cents(i) else sums(i).map(_ / counts(i))
      }.toArray
    }
    cents
  }

  private val pqCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int, String), Array[Array[Array[Double]]]]

  /** Per-subspace PQ codebooks trained on the same bounded 2048-vector
    * sample as the IVF quantizer; cached per (dir, geometry,
    * data-fingerprint) so query, oracle, and specs share bit-identical
    * books. Shape: [m][k][subDim]. */
  private[graft] def pqCodebooks(s: SparkSession, d: String, m: Int = PqM,
                                 kS: Int = PqK): Array[Array[Array[Double]]] = {
    val key = (d, m, kS, dataFingerprint(s, d))
    pqCache.getOrElseUpdate(key, {
      pqCache.keySet
        .filter(k0 => k0._1 == d && k0._2 == m && k0._3 == kS && k0 != key)
        .foreach(pqCache.remove)
      import s.implicits._
      val sample = Tables.embeddings(s, d).orderBy("vec_id").limit(2048)
        .select("embedding").as[Array[Float]].collect()
      val dim = sample.head.length
      require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
      val sub = dim / m
      Array.tabulate(m) { mi =>
        trainPqSubspace(
          sample.map(v => Array.tabulate(sub)(j => v(mi * sub + j).toDouble)),
          kS, iters = 10)
      }
    })
  }

  /** Exact-integer ADC term: dot(q_m, c) snapped to the 1e-9 grid as
    * a long — `floor(x·1e9 + 0.5)` on BOTH engines (never round():
    * DuckDB rounds half away from zero, Java half up — they disagree
    * at negative .5 boundaries), so the per-candidate ADC score is an
    * exact BIGINT sum with no float accumulation anywhere. */
  private[operators] def lutNanos(cent: Array[Double], q: Array[Float],
                                  off: Int): Long = {
    var dot = 0.0; var j = 0
    while (j < cent.length) { dot += cent(j) * q(off + j); j += 1 }
    math.floor(dot * 1e9 + 0.5).toLong
  }

  /** ann_pq: flat product-quantization ANN (FAISS PQ with asymmetric
    * distance computation). The corpus is encoded once to m 4-bit
    * codes per vector (typed map, codebooks broadcast); each query
    * precomputes its m×k lookup table; candidate score =
    * Σ_m LUT[m][code_m] ≈ ⟨q, v⟩ as an EXACT integer in 1e-9 units;
    * the top `cand` ADC candidates rerank by exact cosine. At scale
    * the coded corpus is a 4-byte/vector stored layout (16× less
    * scan I/O than SQ8, 64× less than float32) and ADC is a per-row
    * table lookup — the standard billion-vector shape. */
  def annPq(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
            m: Int = PqM, kS: Int = PqK, cand: Int = PqCand): DataFrame =
    annPqOn(Tables.embeddings(s, d), pqCodebooks(s, d, m, kS),
      Tables.embeddings(s, d).filter(col("vec_id") < nQueries), k, cand)

  /** [[annPq]] against an explicit corpus/codebooks/query frame — the
    * Scale10 entry point (replicated corpora, reused books). */
  def annPqOn(emb: DataFrame, books: Array[Array[Array[Double]]],
              queryFrame: DataFrame, k: Int = 5,
              cand: Int = PqCand): DataFrame =
    pqRerank(pqAdcTopC(pqEncode(emb, books), books, queryFrame, cand),
      queryFrame, emb, k)

  /** Encode the corpus to its per-subspace codes (one typed map,
    * codebooks broadcast). */
  private def pqEncode(emb: DataFrame, books: Array[Array[Array[Double]]])
      : org.apache.spark.sql.Dataset[(Long, Array[Int])] = {
    val s = emb.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(books)
    emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val sub = v.length / bc.value.length
        (id, Array.tabulate(bc.value.length) { mi =>
          nearestL2(bc.value(mi),
            Array.tabulate(sub)(j => v(mi * sub + j).toDouble))
        })
      }
  }

  /** ADC over a coded corpus: per-query LUTs broadcast, candidate
    * score = exact BIGINT Σ_m LUT[m][code_m], bounded top-`cand`
    * (ties by id via the aggregator's ordering on the double image —
    * exact: nano sums stay far below 2^53). */
  private def pqAdcTopC(coded: org.apache.spark.sql.Dataset[(Long, Array[Int])],
                        books: Array[Array[Array[Double]]],
                        queryFrame: DataFrame, cand: Int): DataFrame = {
    val s = coded.sparkSession
    import s.implicits._
    val queries = queryFrame
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (qid, qv) =>
        val sub = qv.length / books.length
        (qid, Array.tabulate(books.length)(mi =>
          books(mi).map(c => lutNanos(c, qv, mi * sub))))
      }
    val bq = s.sparkContext.broadcast(queries)
    val adc = coded.flatMap { case (id, codes) =>
      bq.value.iterator.collect {
        case (qid, lut) if qid != id =>
          var sc = 0L; var mi = 0
          while (mi < codes.length) { sc += lut(mi)(codes(mi)); mi += 1 }
          (qid, id, sc)
      }
    }.toDF("query_id", "neighbor_id", "adc")
    topKPerQuery(adc.select(col("query_id"), col("neighbor_id"),
      col("adc").cast("double").as("cos_sim")), cand, ordered = false)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Exact-cosine rerank of the bounded shortlist against the
    * full-precision corpus. */
  private def pqRerank(top: DataFrame, queryFrame: DataFrame,
                       emb: DataFrame, k: Int): DataFrame = {
    val qv = queryFrame
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val nv = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("v"))
    topKPerQuery(top.join(broadcast(qv), Seq("query_id")).join(nv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cos(col("qv"), col("v")), 6).as("cos_sim")), k)
  }

  /** Persist the PQ-coded corpus: m codes per vector as an m-BYTE
    * binary column — 4 bytes/vector at the default 8×16 geometry
    * (64× under the float32 layout, 16× under SQ8): the scan a
    * billion-vector serving tier actually reads. */
  def writePq(emb: DataFrame, books: Array[Array[Array[Double]]],
              dir: String): Unit = {
    val s = emb.sparkSession
    import s.implicits._
    pqEncode(emb, books)
      .map { case (id, codes) => (id, codes.map(_.toByte)) }
      .toDF("vec_id", "codes")
      .write.mode("overwrite").parquet(dir)
  }

  /** Serve top-k from the STORED code layout: the corpus pass reads
    * m bytes/vector (no embeddings), ADC shortlists, and only the
    * bounded shortlist joins the full-precision table for the exact
    * rerank — result-identical to the inline [[annPqOn]] (spec'd in
    * SimilaritySpec). */
  def annPqStored(s: SparkSession, codesDir: String,
                  books: Array[Array[Array[Double]]],
                  queryFrame: DataFrame, emb: DataFrame, k: Int = 5,
                  cand: Int = PqCand): DataFrame = {
    import s.implicits._
    val coded = s.read.parquet(codesDir).as[(Long, Array[Byte])]
      .map { case (id, b) => (id, b.map(_.toInt)) }
    pqRerank(pqAdcTopC(coded, books, queryFrame, cand), queryFrame, emb, k)
  }

  private val pqResCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int, Int, String), Array[Array[Array[Double]]]]

  /** RESIDUAL PQ codebooks for the IVF×PQ composition: trained on the
    * sample's residuals v − c(bucket(v)) against the IVF coarse
    * quantizer — the FAISS IVF-PQ recipe (coarse centroid carries the
    * location, PQ encodes the remainder, so the codebooks spend their
    * 4 bits on a much smaller cell). Cached like the others. */
  private[graft] def pqResidualCodebooks(s: SparkSession, d: String,
                                         nlist: Int = IvfNlist, m: Int = PqM,
                                         kS: Int = PqK): Array[Array[Array[Double]]] = {
    val key = (d, nlist, m, kS, dataFingerprint(s, d))
    pqResCache.getOrElseUpdate(key, {
      pqResCache.keySet.filter(k0 => k0._1 == d && k0 != key)
        .foreach(pqResCache.remove)
      import s.implicits._
      val cents = ivfCentroids(s, d, nlist)
      val sample = Tables.embeddings(s, d).orderBy("vec_id").limit(2048)
        .select("embedding").as[Array[Float]].collect()
      val dim = sample.head.length
      require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
      val sub = dim / m
      val residuals = sample.map { v =>
        val c = cents(nearestCentroid(cents, v))
        Array.tabulate(dim)(j => v(j) - c(j))
      }
      Array.tabulate(m) { mi =>
        trainPqSubspace(
          residuals.map(r => java.util.Arrays.copyOfRange(r, mi * sub, (mi + 1) * sub)),
          kS, iters = 10)
      }
    })
  }

  /** ann_ivf_pq: the COMPOSED production vector index (FAISS IVF-PQ):
    * corpus bucketed by the IVF coarse quantizer AND encoded as m
    * 4-bit RESIDUAL codes; queries probe their nprobe buckets and
    * score candidates as base + residual-ADC — base =
    * ⟨q, c_bucket⟩ and each subspace term ⟨q_m, book_code⟩, ALL as
    * exact 1e-9-unit BIGINTs (so ⟨q,v⟩ ≈ base + Σ_m term with no
    * float accumulation anywhere); the bounded shortlist reranks by
    * exact cosine. At scale this is the bucket-partitioned 4-byte/
    * vector layout with partition-pruned probes — the standard
    * billion-vector serving index. */
  def annIvfPq(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
               nlist: Int = IvfNlist, nprobe: Int = IvfNprobe,
               m: Int = PqM, kS: Int = PqK, cand: Int = PqCand): DataFrame = {
    import s.implicits._
    val cents = ivfCentroids(s, d, nlist)
    val books = pqResidualCodebooks(s, d, nlist, m, kS)
    val bcC = s.sparkContext.broadcast(cents)
    val bcB = s.sparkContext.broadcast(books)
    val emb = Tables.embeddings(s, d)
    // (id, bucket, residual codes) — one typed encode pass
    val coded = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val cs = bcC.value; val bks = bcB.value
        val b = nearestCentroid(cs, v)
        val sub = v.length / bks.length
        val codes = Array.tabulate(bks.length) { mi =>
          nearestL2(bks(mi), Array.tabulate(sub)(j =>
            v(mi * sub + j) - cs(b)(mi * sub + j)))
        }
        (id, b, codes)
      }
    // per-query: probed buckets with base nanos + residual LUTs
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (qid, qv) =>
        val sub = qv.length / books.length
        val probed = topCentroids(cents, qv, nprobe).map { b =>
          var dot = 0.0; var j = 0
          while (j < qv.length) { dot += cents(b)(j) * qv(j); j += 1 }
          b -> math.floor(dot * 1e9 + 0.5).toLong
        }.toMap
        val lut = Array.tabulate(books.length)(mi =>
          books(mi).map(c => lutNanos(c, qv, mi * sub)))
        (qid, probed, lut)
      }
    val bq = s.sparkContext.broadcast(queries)
    val adc = coded.flatMap { case (id, b, codes) =>
      bq.value.iterator.collect {
        case (qid, probed, lut) if qid != id && probed.contains(b) =>
          var sc = probed(b); var mi = 0
          while (mi < codes.length) { sc += lut(mi)(codes(mi)); mi += 1 }
          (qid, id, sc)
      }
    }.toDF("query_id", "neighbor_id", "adc")
    val top = topKPerQuery(adc.select(col("query_id"), col("neighbor_id"),
      col("adc").cast("double").as("cos_sim")), cand, ordered = false)
      .select(col("query_id"), col("neighbor_id"))
    pqRerank(top, emb.filter(col("vec_id") < nQueries), emb, k)
  }

  /** Persist the composed IVF-PQ layout: bucket-PARTITIONED residual
    * codes, m bytes per vector — the billion-vector serving index on
    * disk (probes prune partitions; the scan inside a probed bucket
    * reads 4 bytes/vector at the default geometry). Returns the
    * (coarse centroids, residual codebooks) serving artifacts. */
  def writeIvfPqPartitioned(s: SparkSession, d: String, dir: String,
                            nlist: Int = IvfNlist, m: Int = PqM,
                            kS: Int = PqK)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val cents = ivfCentroids(s, d, nlist)
    val books = pqResidualCodebooks(s, d, nlist, m, kS)
    encodeIvfPq(Tables.embeddings(s, d), cents, books)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    (cents, books)
  }

  /** One encode pass: (vec_id, bucket, residual code bytes) for any
    * corpus frame — shared by the writer and the Scale10 probes. */
  private[graft] def encodeIvfPq(emb: DataFrame,
                                 cents: Array[Array[Double]],
                                 books: Array[Array[Array[Double]]]): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val bcC = s.sparkContext.broadcast(cents)
    val bcB = s.sparkContext.broadcast(books)
    emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val cs = bcC.value; val bks = bcB.value
        val b = nearestCentroid(cs, v)
        val sub = v.length / bks.length
        val codes = Array.tabulate(bks.length) { mi =>
          nearestL2(bks(mi), Array.tabulate(sub)(j =>
            v(mi * sub + j) - cs(b)(mi * sub + j))).toByte
        }
        (id, b, codes)
      }
      .toDF("vec_id", "bucket", "codes")
  }

  /** Serve against the stored IVF-PQ layout: probed buckets collected
    * (bounded by nlist), PARTITION-PRUNED scan of the code table,
    * exact-integer base+ADC, bounded shortlist, exact rerank against
    * the full-precision corpus — result-identical to the inline
    * [[annIvfPq]] (spec'd). */
  def annIvfPqStored(s: SparkSession, dir: String,
                     cents: Array[Array[Double]],
                     books: Array[Array[Array[Double]]],
                     queryFrame: DataFrame, emb: DataFrame, k: Int = 5,
                     nprobe: Int = IvfNprobe, cand: Int = PqCand,
                     excludeSelf: Boolean = true): DataFrame =
    annIvfPqServeBatch(s, dir, cents, books,
      queryFrame.select(col("vec_id").as("query_id"), col("embedding")),
      emb, k, nprobe, cand, excludeSelf)

  /** Serve ONE batch of `(query_id, embedding)` queries against the
    * stored IVF-PQ layout — the per-micro-batch body of
    * [[graft.streaming.EventStream.streamingAnnIvfPqTopK]] and the
    * core of [[annIvfPqStored]]. `excludeSelf` is OPT-IN: serving
    * query ids are an independent id space. */
  def annIvfPqServeBatch(s: SparkSession, dir: String,
                         cents: Array[Array[Double]],
                         books: Array[Array[Array[Double]]],
                         queryFrame: DataFrame, emb: DataFrame, k: Int = 5,
                         nprobe: Int = IvfNprobe, cand: Int = PqCand,
                         excludeSelf: Boolean = false): DataFrame = {
    import s.implicits._
    val queries = queryFrame
      .select(col("query_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (qid, qv) =>
        val sub = qv.length / books.length
        val probed = topCentroids(cents, qv, nprobe).map { b =>
          var dot = 0.0; var j = 0
          while (j < qv.length) { dot += cents(b)(j) * qv(j); j += 1 }
          b -> math.floor(dot * 1e9 + 0.5).toLong
        }.toMap
        (qid, probed, Array.tabulate(books.length)(mi =>
          books(mi).map(c => lutNanos(c, qv, mi * sub))))
      }
    val probedBuckets = queries.flatMap(_._2.keys).distinct.sorted
    val bq = s.sparkContext.broadcast(queries)
    val adc = minusTombstones(s, dir, s.read.parquet(dir)
      .filter(col("bucket").isin(probedBuckets.map(Integer.valueOf): _*)))
      .select(col("vec_id"), col("bucket"), col("codes"))
      .as[(Long, Int, Array[Byte])] // codes land as parquet BINARY
      .flatMap { case (id, b, codes) =>
        bq.value.iterator.collect {
          case (qid, probed, lut)
              if probed.contains(b) && !(excludeSelf && qid == id) =>
            var sc = probed(b); var mi = 0
            while (mi < codes.length) { sc += lut(mi)(codes(mi)); mi += 1 }
            (qid, id, sc)
        }
      }.toDF("query_id", "neighbor_id", "adc")
    val top = topKPerQuery(adc.select(col("query_id"), col("neighbor_id"),
      col("adc").cast("double").as("cos_sim")), cand, ordered = false)
      .select(col("query_id"), col("neighbor_id"))
    pqRerank(top,
      queryFrame.select(col("query_id").as("vec_id"), col("embedding")),
      emb, k)
  }

  // ---- IVF-PQ layout maintenance -----------------------------------------

  /** [[writeIvfPqPartitioned]] over an arbitrary `(vec_id, embedding)`
    * frame with pre-trained artifacts — the form the maintenance loop
    * and scale probes use (quantizer and codebooks are properties of
    * the data GEOMETRY, so 1×-trained artifacts serve a replicated or
    * split corpus too). */
  def writeIvfPqPartitionedOn(emb: DataFrame, cents: Array[Array[Double]],
                              books: Array[Array[Array[Double]]],
                              dir: String): Unit =
    encodeIvfPq(emb, cents, books)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

  /** Append a batch of arriving vectors to the stored IVF-PQ code
    * layout — the daily maintenance step of the compressed serving
    * tier, the [[appendIvfPartitioned]] twin: the batch encodes
    * against the SAME coarse centroids + residual codebooks and its
    * 4-byte/vector code rows land inside the existing bucket
    * directories, so tomorrow's probes see today's vectors with no
    * corpus rewrite and partition pruning keeps working unchanged.
    * Codebook drift is a retrain-and-migrate decision
    * ([[ivfPqDrifted]] → [[retrainIvfPqPartitioned]]). Spec'd:
    * append-then-serve ≡ serve over a one-shot layout of the union. */
  def appendIvfPqPartitioned(batch: DataFrame,
                             cents: Array[Array[Double]],
                             books: Array[Array[Array[Double]]],
                             dir: String): Unit =
    encodeIvfPq(batch, cents, books)
      .write.mode("append").partitionBy("bucket").parquet(dir)

  /** Periodic maintenance for the IVF-PQ code layout: each daily
    * append leaves one more small file per touched bucket directory —
    * re-collapse in place, KEEPING the bucket partitioning so pruned
    * probes keep pruning (serve-identical, spec'd). */
  def compactIvfPqPartitioned(s: SparkSession, dir: String,
                              targetBytes: Long = 128L << 20)
      : graft.sources.Compact.CompactReport =
    graft.sources.Compact.compactInPlace(s, dir, targetBytes,
      partitionCols = Seq("bucket"),
      transform = df => minusTombstones(s, dir, df))

  /** Monitoring snapshot of the stored code layout: corpus size,
    * bucket-occupancy skew (as [[IvfLayoutStats]]), and the mean
    * residual QUANTIZATION error ‖v − (c_bucket + decode(codes))‖² —
    * the quantization-quality analog of meanAssignDist. It rises when
    * arrivals drift away from the geometry the codebooks were trained
    * on, which degrades ADC ranking (the shortlist misses true
    * neighbors) long before results go visibly wrong — exactly the
    * signal that must page a retrain. */
  case class IvfPqLayoutStats(nVectors: Long, nBuckets: Int,
                              occSkew: Double, meanQuantErr: Double)

  /** Compute [[IvfPqLayoutStats]]: occupancy from one column-pruned
    * pass over the code layout; quantization error over a BOUNDED
    * deterministic sample joined to the full-precision corpus `emb` —
    * the layout stores only 4-byte codes, and serving already keeps
    * the full-precision table beside it for the exact rerank. The
    * sample is the `sampleN` smallest by xxhash64(vec_id) — a
    * deterministic uniform draw across the WHOLE id range, so newly
    * appended (high-id) vectors are represented and the error axis
    * can actually see drifting arrivals; sampling the lowest ids
    * (the quantizer-training convention) would freeze the sample at
    * the original corpus (r11 advice). Still one TakeOrdered — no
    * global sort materializes. Run at write time for the baseline
    * snapshot, per maintenance cycle for the drift check
    * ([[ivfPqDrifted]]). */
  def ivfPqLayoutStats(s: SparkSession, dir: String,
                       cents: Array[Array[Double]],
                       books: Array[Array[Array[Double]]],
                       emb: DataFrame,
                       sampleN: Int = 2048): IvfPqLayoutStats = {
    import s.implicits._
    val occ = s.read.parquet(dir).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("n"))
    val n = occ.sum
    val occSkew = occ.max.toDouble / (n.toDouble / cents.length)
    val bcC = s.sparkContext.broadcast(cents)
    val bcB = s.sparkContext.broadcast(books)
    val sample = s.read.parquet(dir)
      .select(col("vec_id"), col("bucket"), col("codes"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(sampleN)
    val errs = sample
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("bucket"), col("codes"), col("embedding"))
      .as[(Int, Array[Byte], Array[Float])]
      .map { case (b, codes, v) =>
        val cs = bcC.value; val bks = bcB.value
        val sub = v.length / bks.length
        var err = 0.0; var j = 0
        while (j < v.length) {
          val mi = j / sub
          val rec = cs(b)(j) + bks(mi)(codes(mi) & 0xff)(j - mi * sub)
          val dlt = v(j) - rec
          err += dlt * dlt; j += 1
        }
        (1L, err)
      }
      .toDF("one", "err")
      .agg(sum(col("one")).as("cnt"), sum(col("err")).as("err")).head()
    IvfPqLayoutStats(n, occ.length, occSkew,
      errs.getAs[Double]("err") / errs.getAs[Long]("cnt"))
  }

  /** The retrain decision for the compressed tier — drift RELATIVE to
    * the write-time snapshot, like [[ivfDrifted]]: occupancy skew past
    * `skewTol`× the baseline, or mean residual quantization error past
    * `errTol`×. A corpus born skewed doesn't page; a balanced corpus
    * whose arrivals outgrow the codebooks does. */
  def ivfPqDrifted(current: IvfPqLayoutStats, baseline: IvfPqLayoutStats,
                   skewTol: Double = 1.5, errTol: Double = 1.2): Boolean =
    current.occSkew > baseline.occSkew * skewTol ||
      current.meanQuantErr > baseline.meanQuantErr * errTol

  /** Retrain-and-migrate for the IVF-PQ layout: re-train the coarse
    * quantizer AND the residual codebooks on the layout's CURRENT
    * contents (bounded deterministic sample of the code layout's ids,
    * full precision from `emb` — the table serving reranks against),
    * re-encode every stored vector, and swap the rewritten layout in
    * under the same path (the [[retrainIvfPartitioned]] rename
    * discipline, one `.old` grace generation). Returns the new
    * (centroids, codebooks) — serving must switch to them atomically
    * with the layout. Spec'd: exhaustive-probe full-shortlist serving
    * is unchanged by the migration (rerank is exact), and the
    * retrained geometry absorbs the drift wave. */
  def retrainIvfPqPartitioned(s: SparkSession, dir: String, emb: DataFrame,
                              nlist: Int = IvfNlist, m: Int = PqM,
                              kS: Int = PqK)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    import s.implicits._
    // live rows only: the swap folds the tombstone log (see
    // retrainIvfPartitioned — a rewrite must never resurrect deletes)
    val full = emb.select(col("vec_id"), col("embedding"))
      .join(minusTombstones(s, dir,
        s.read.parquet(dir).select(col("vec_id"))), Seq("vec_id"))
    val sample = full.orderBy("vec_id").limit(2048)
      .select("embedding").as[Array[Float]].collect()
    val cents = trainCentroids(sample, nlist, iters = 10)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val residuals = sample.map { v =>
      val c = cents(nearestCentroid(cents, v))
      Array.tabulate(dim)(j => v(j) - c(j))
    }
    val books = Array.tabulate(m) { mi =>
      trainPqSubspace(
        residuals.map(r =>
          java.util.Arrays.copyOfRange(r, mi * sub, (mi + 1) * sub)),
        kS, iters = 10)
    }
    swapInRetrained(s, dir)(writeIvfPqPartitionedOn(full, cents, books, _))
    (cents, books)
  }

  /** DuckDB oracle for [[annIvfPq]]: coarse centroids AND residual
    * codebooks as literals; assignment, residual encoding, probing,
    * the exact-BIGINT base+ADC sum, shortlist, and rerank in SQL. */
  def annIvfPqOracleSql(s: SparkSession, d: String, nQueries: Int = 10,
                        k: Int = 5, nlist: Int = IvfNlist,
                        nprobe: Int = IvfNprobe, m: Int = PqM, kS: Int = PqK,
                        cand: Int = PqCand): String = {
    val cents = ivfCentroids(s, d, nlist)
    val books = pqResidualCodebooks(s, d, nlist, m, kS)
    val dim = cents(0).length
    val sub = dim / m
    val centsSql = cents.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n        ")
    val bookSql = (for (mi <- 0 until m; ci <- 0 until kS) yield
      s"($mi, $ci, [${books(mi)(ci).map(_.toString).mkString(", ")}]::DOUBLE[])")
      .mkString(",\n        ")
    s"""
      WITH cents(cid, c) AS (VALUES
        $centsSql),
      books(m, cid, bc) AS (VALUES
        $bookSql),
      cscore AS (
        SELECT vec_id, cid,
          list_inner_product(CAST(embedding AS DOUBLE[]), c) AS dot
        FROM embeddings CROSS JOIN cents),
      assign AS (
        SELECT vec_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM cscore) WHERE rn = 1),
      res AS (
        SELECT e.vec_id, a.bucket,
          list_transform(range(1, $dim + 1),
            i -> CAST(e.embedding[i] AS DOUBLE) - ct.c[i]) AS r
        FROM embeddings e
        JOIN assign a ON a.vec_id = e.vec_id
        JOIN cents ct ON ct.cid = a.bucket),
      rsub AS (
        SELECT vec_id, bucket, m, r[m * $sub + 1 : m * $sub + $sub] AS sv
        FROM res CROSS JOIN (SELECT unnest(range(0, $m)) AS m)),
      codes AS (
        SELECT vec_id, bucket, m, cid AS code FROM (
          SELECT v.vec_id, v.bucket, v.m, b.cid,
            row_number() OVER (PARTITION BY v.vec_id, v.m
              ORDER BY -2 * list_inner_product(v.sv, b.bc)
                       + list_inner_product(b.bc, b.bc), b.cid) AS rn
          FROM rsub v JOIN books b ON b.m = v.m) WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, cid AS bucket,
          CAST(floor(dot * 1000000000 + 0.5) AS BIGINT) AS base
        FROM (
          SELECT vec_id, cid, dot,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM cscore WHERE vec_id < $nQueries) WHERE rn <= $nprobe),
      qsub AS (
        SELECT vec_id AS query_id, m,
          CAST(embedding AS DOUBLE[])[m * $sub + 1 : m * $sub + $sub] AS sv
        FROM embeddings CROSS JOIN (SELECT unnest(range(0, $m)) AS m)
        WHERE vec_id < $nQueries),
      lut AS (
        SELECT q.query_id, q.m, b.cid,
          CAST(floor(list_inner_product(q.sv, b.bc) * 1000000000 + 0.5)
            AS BIGINT) AS nanos
        FROM qsub q JOIN books b ON b.m = q.m),
      adc AS (
        SELECT p.query_id, cd.vec_id AS neighbor_id,
          p.base + CAST(SUM(l.nanos) AS BIGINT) AS adc
        FROM probes p
        JOIN codes cd ON cd.bucket = p.bucket AND cd.vec_id <> p.query_id
        JOIN lut l ON l.query_id = p.query_id AND l.m = cd.m AND l.cid = cd.code
        GROUP BY 1, 2, p.base),
      topc AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY adc DESC, neighbor_id) AS rn
          FROM adc) WHERE rn <= $cand),
      rer AS (
        SELECT t.query_id, t.neighbor_id,
          round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                       CAST(ne.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM topc t
        JOIN embeddings qe ON qe.vec_id = t.query_id
        JOIN embeddings ne ON ne.vec_id = t.neighbor_id)
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
        FROM rer)
      WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** DuckDB oracle for [[annPq]]: codebooks as DOUBLE[] literals;
    * encoding (argmin −2·dot + c·c, ties to lowest cid), the per-query
    * LUT, the exact-BIGINT ADC sum, top-`cand` selection, and exact
    * rerank all re-expressed in SQL. Data-dependent → emitted by
    * oracleSqlFor. */
  def annPqOracleSql(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
                     m: Int = PqM, kS: Int = PqK, cand: Int = PqCand): String = {
    val books = pqCodebooks(s, d, m, kS)
    val dim = books.length * books(0)(0).length
    val sub = dim / m
    val bookSql = (for (mi <- 0 until m; ci <- 0 until kS) yield
      s"($mi, $ci, [${books(mi)(ci).map(_.toString).mkString(", ")}]::DOUBLE[])")
      .mkString(",\n        ")
    s"""
      WITH books(m, cid, c) AS (VALUES
        $bookSql),
      vsub AS (
        SELECT vec_id, m,
          CAST(embedding AS DOUBLE[])[m * $sub + 1 : m * $sub + $sub] AS sv
        FROM embeddings CROSS JOIN (SELECT unnest(range(0, $m)) AS m)),
      assigned AS (
        SELECT vec_id, m, cid AS code FROM (
          SELECT v.vec_id, v.m, b.cid,
            row_number() OVER (PARTITION BY v.vec_id, v.m
              ORDER BY -2 * list_inner_product(v.sv, b.c)
                       + list_inner_product(b.c, b.c), b.cid) AS rn
          FROM vsub v JOIN books b ON b.m = v.m) WHERE rn = 1),
      lut AS (
        SELECT v.vec_id AS query_id, v.m, b.cid,
          CAST(floor(list_inner_product(v.sv, b.c) * 1000000000 + 0.5)
            AS BIGINT) AS nanos
        FROM vsub v JOIN books b ON b.m = v.m
        WHERE v.vec_id < $nQueries),
      adc AS (
        SELECT l.query_id, a.vec_id AS neighbor_id,
          CAST(SUM(l.nanos) AS BIGINT) AS adc
        FROM assigned a JOIN lut l ON l.m = a.m AND l.cid = a.code
        WHERE a.vec_id <> l.query_id
        GROUP BY 1, 2),
      topc AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY adc DESC, neighbor_id) AS rn
          FROM adc) WHERE rn <= $cand),
      rer AS (
        SELECT t.query_id, t.neighbor_id,
          round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                       CAST(ne.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM topc t
        JOIN embeddings qe ON qe.vec_id = t.query_id
        JOIN embeddings ne ON ne.vec_id = t.neighbor_id)
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
        FROM rer)
      WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** DuckDB oracle for [[annIvf]]: the trained centroids are embedded
    * as DOUBLE[] literals (shortest round-trip printing — same recipe
    * as [[planesSqlValues]]), and assignment (argmax dot, lowest
    * centroid id on ties), nprobe probing (stable sort ⇒ dot DESC,
    * cid ASC), and exact rerank are re-expressed in SQL. Data-
    * dependent, so it's emitted by [[graft.SparkEntry.oracleSqlFor]]
    * at Verify time rather than from the static map. */
  def annIvfOracleSql(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
                      nlist: Int = IvfNlist, nprobe: Int = IvfNprobe): String = {
    val cents = ivfCentroids(s, d, nlist)
    val centsSql = cents.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n        ")
    s"""
      WITH cents(cid, c) AS (VALUES
        $centsSql),
      scored AS (
        SELECT vec_id, cid,
          list_inner_product(CAST(embedding AS DOUBLE[]), c) AS dot
        FROM embeddings CROSS JOIN cents),
      assign AS (
        SELECT vec_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scored) WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scored WHERE vec_id < $nQueries) WHERE rn <= $nprobe),
      cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM assign a JOIN probes p
          ON a.bucket = p.bucket AND a.vec_id <> p.query_id),
      rer AS (
        SELECT c.query_id, c.neighbor_id,
          round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                       CAST(ne.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM cand c
        JOIN embeddings qe ON qe.vec_id = c.query_id
        JOIN embeddings ne ON ne.vec_id = c.neighbor_id)
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
        FROM rer)
      WHERE rank <= $k ORDER BY query_id, rank"""
  }

  // ---- SQ8 (scalar int8 quantization) ----------------------------------

  /** Per-dimension [min,max] grid for scalar quantization, trained in
    * one distributed pass: posexplode + groupBy(dim) does its partial
    * aggregation map-side (≤ dim rows leave each task — the shuffle
    * is dim-sized regardless of corpus size), and only the dim-sized
    * result is collected (the ivfCentroids pattern). */
  def sq8Grid(emb: DataFrame): (Array[Double], Array[Double]) = {
    val stats = emb
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .orderBy(col("i"))
      .collect()
    (stats.map(_.getAs[Double]("mn")), stats.map(_.getAs[Double]("mx")))
  }

  /** Quantize a float vector to uint8 codes 0..255 — the STORED form:
    * 1 byte/dim, 4× less storage and scan I/O than float32. The grid
    * travels as literals (dim-sized), so this is a pure per-row
    * column expression. */
  def sq8Codes(v: Column, mns: Array[Double], mxs: Array[Double]): Column = {
    val mnA = typedlit(mns); val mxA = typedlit(mxs)
    transform(v, (x, i) => {
      val mn = element_at(mnA, i + 1); val mx = element_at(mxA, i + 1)
      // CLAMP to the grid: an out-of-grid coordinate (an append after
      // the grid was trained) saturates at the edge code — the
      // standard SQ behavior. Without the clamp the (q − 128).toByte
      // storage step WRAPS out-of-range codes into garbage; with it,
      // recall degrades gracefully and sq8LayoutStats' saturation
      // fraction sees exactly how much is clipping.
      when(mx > mn, least(lit(255), greatest(lit(0),
        round((x.cast("double") - mn) * lit(255.0) / (mx - mn))
          .cast("int"))))
        .otherwise(lit(0))
    })
  }

  /** Reconstruct the dequantized vector from stored codes. */
  def sq8Dequant(codes: Column, mns: Array[Double], mxs: Array[Double]): Column = {
    val mnA = typedlit(mns); val mxA = typedlit(mxs)
    transform(codes, (q, i) => {
      val mn = element_at(mnA, i + 1); val mx = element_at(mxA, i + 1)
      mn + q.cast("double") * (mx - mn) / lit(255.0)
    })
  }

  /** Write the corpus in the SQ8 code layout: (vec_id, 1 byte/dim
    * codes as signed bytes, offset −128) — the stored form behind the
    * 4× scan-I/O claim, measured against the float32 layout in
    * SimilaritySpec. [[readSq8Dequant]] restores dequantized double
    * vectors for scoring; round-trip parity with the inline
    * quantize-dequantize is spec'd. */
  def writeSq8(emb: DataFrame, dir: String,
               mns: Array[Double], mxs: Array[Double]): Unit = {
    val s = emb.sparkSession
    import s.implicits._
    emb.select(col("vec_id"), sq8Codes(col("embedding"), mns, mxs).as("codes"))
      .as[(Long, Array[Int])]
      .map { case (id, q) => (id, q.map(x => (x - 128).toByte)) }
      .toDF("vec_id", "codes")
      .write.mode("overwrite").parquet(dir)
  }

  def readSq8Dequant(s: SparkSession, dir: String,
                     mns: Array[Double], mxs: Array[Double]): DataFrame = {
    import s.implicits._
    s.read.parquet(dir).as[(Long, Array[Byte])]
      .map { case (id, b) => (id, b.map(x => x.toInt + 128)) }
      .toDF("vec_id", "codes")
      .select(col("vec_id"), sq8Dequant(col("codes"), mns, mxs).as("v"))
  }

  /** ann_sq8: brute-force top-k over the scalar-quantized corpus —
    * FAISS's SQ8 flat index re-expressed relationally. Same join
    * shape as [[annBruteforce]] (broadcast the query set, one corpus
    * pass, bounded per-query top-k), but the corpus the scan reads at
    * 100 TB is the 1-byte/dim code layout, a 4× I/O reduction; the
    * dequantize is a per-row column expression ahead of the join, so
    * each corpus vector reconstructs once, not once per query.
    * Scoring is symmetric (queries quantized too) so the DuckDB
    * oracle can replay it exactly; asymmetric scoring (full-precision
    * queries) is the FAISS default and only improves recall.
    * Recall@5 vs the exact baseline is measured in Bench/RecallSpec.
    * Grid min/max are order-independent aggregates, so the oracle
    * retrains them in SQL — no trained-artifact literal needed. */
  def annSq8(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5): DataFrame =
    annSq8(Tables.embeddings(s, d), nQueries, k)

  def annSq8(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val (mns, mxs) = sq8Grid(emb)
    def dq(c: Column): Column = sq8Dequant(sq8Codes(c, mns, mxs), mns, mxs)
    val e = emb.select(col("vec_id").as("neighbor_id"), dq(col("embedding")).as("v"))
    val q = broadcast(emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), dq(col("embedding")).as("qv")))
    val scored = e.join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cos(col("qv"), col("v")), 6).as("cos_sim"))
    topKPerQuery(scored, k)
  }

  // ---- IVF × SQ8 (the composed production index) -------------------------

  /** ann_ivf_sq8: the composed production index — FAISS's
    * IVF+SQ8 shape re-expressed relationally. The corpus lives
    * bucketed by IVF coarse centroid AND stored as 1-byte/dim SQ8
    * codes; a query probes its `nprobe` nearest buckets (at 100 TB a
    * partition-pruned scan — see [[writeIvfSq8Partitioned]]) and
    * reranks ASYMMETRICALLY: the query keeps full precision, only the
    * corpus side pays quantization error (the FAISS default — better
    * recall than the symmetric form at identical scan cost). Combined
    * effect: the probe scan reads nprobe/nlist of the corpus at 1/4
    * the bytes per vector — a ~8× I/O reduction at the default
    * geometry vs the flat float32 scan.
    *
    * Both trained artifacts are oracle-replayable: centroids travel
    * as SQL literals ([[annIvfOracleSql]]'s recipe) while the SQ8
    * grid retrains in SQL (order-independent min/max — [[annSq8]]'s
    * recipe); emitted by [[annIvfSq8OracleSql]] at Verify time. */
  def annIvfSq8(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
                nlist: Int = IvfNlist, nprobe: Int = IvfNprobe): DataFrame =
    annIvfSq8On(Tables.embeddings(s, d), ivfCentroids(s, d, nlist),
      nQueries, k, nprobe)

  /** [[annIvfSq8]] over an arbitrary embeddings frame with given
    * centroids — the entry the Scale10 probe drives with replicated
    * corpora (centroids are a property of the DATA geometry, so the
    * 1× trained quantizer serves the replicated corpus too). */
  def annIvfSq8On(emb: DataFrame, cents: Array[Array[Double]],
                  nQueries: Int = 10, k: Int = 5,
                  nprobe: Int = IvfNprobe): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val (mns, mxs) = sq8Grid(emb)
    val bc = s.sparkContext.broadcast(cents)
    // bucket assignment on the FULL-precision vector (write-side work
    // at scale), storage = SQ8 codes; the dequantize is one per-row
    // expression ahead of the join, so each corpus vector
    // reconstructs once, not once per probing query
    val bucketed = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, nearestCentroid(bc.value, v), v) }
      .toDF("neighbor_id", "bucket", "v0")
      .select(col("neighbor_id"), col("bucket"),
        sq8Dequant(sq8Codes(col("v0"), mns, mxs), mns, mxs).as("v"))
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

  /** Write the corpus in the composed layout: bucket-partitioned
    * directories ([[writeIvfPartitioned]]) of SQ8 code rows
    * ([[writeSq8]]) — the stored form where a probe is a partition-
    * pruned scan over 1-byte/dim codes. Returns the trained
    * (centroids, grid) artifacts the probe side needs. */
  def writeIvfSq8Partitioned(s: SparkSession, d: String, dir: String,
                             nlist: Int = IvfNlist)
      : (Array[Array[Double]], Array[Double], Array[Double]) = {
    val emb = Tables.embeddings(s, d)
    val cents = ivfCentroids(s, d, nlist)
    val (mns, mxs) = sq8Grid(emb)
    writeIvfSq8PartitionedOn(emb, cents, mns, mxs, dir)
    (cents, mns, mxs)
  }

  /** [[writeIvfSq8Partitioned]] over an arbitrary embeddings frame
    * with pre-trained artifacts — the retrain loop's rewrite form. */
  def writeIvfSq8PartitionedOn(emb: DataFrame, cents: Array[Array[Double]],
                               mns: Array[Double], mxs: Array[Double],
                               dir: String): Unit = {
    val s = emb.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, nearestCentroid(bc.value, v), v) }
      .toDF("vec_id", "bucket", "embedding")
      .select(col("vec_id"), col("bucket"),
        sq8Codes(col("embedding"), mns, mxs).as("q"))
      .as[(Long, Int, Array[Int])]
      .map { case (id, b, q) => (id, b, q.map(x => (x - 128).toByte)) }
      .toDF("vec_id", "bucket", "codes")
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
  }

  /** Append arrivals to the standing SQ8 layout under the STANDING
    * grid + quantizer (the appendIvfPartitioned contract — geometry
    * fixed between retrains): out-of-grid coordinates CLAMP to the
    * grid edge ([[sq8Codes]]'s saturation), recall degrades
    * gracefully, and [[sq8LayoutStats]]' saturation fraction measures
    * exactly how much clipped so [[sq8Drifted]] can page for a
    * retrain. */
  def appendIvfSq8Partitioned(batch: DataFrame,
                              cents: Array[Array[Double]],
                              mns: Array[Double], mxs: Array[Double],
                              dir: String): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    batch.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, nearestCentroid(bc.value, v), v) }
      .toDF("vec_id", "bucket", "embedding")
      .select(col("vec_id"), col("bucket"),
        sq8Codes(col("embedding"), mns, mxs).as("q"))
      .as[(Long, Int, Array[Int])]
      .map { case (id, b, q) => (id, b, q.map(x => (x - 128).toByte)) }
      .toDF("vec_id", "bucket", "codes")
      .write.mode("append").partitionBy("bucket").parquet(dir)
  }

  /** Monitoring snapshot of the SQ8 code layout — the quantization
    * tier's staleness signal (the IVF/IVF-PQ/whitened drift
    * discipline applied to the GRID): corpus size, bucket-occupancy
    * skew, and the SATURATION FRACTION — the share of stored code
    * entries at 0 or 255. At write time only each dimension's
    * half-step tails sit on the edge codes (tiny but nonzero, so the
    * relative tolerance is well-defined); arrivals whose coordinates
    * outgrew the trained [mn, mx] grid clamp there, so saturation is
    * a direct, codes-only readout of grid staleness (the dequantized
    * error it causes is unbounded — unlike in-grid error, which the
    * half-step bound caps). Two bounded passes: the bucket-count
    * aggregate and a shuffle-free mapPartitions code scan. */
  case class Sq8LayoutStats(nVectors: Long, nBuckets: Int,
                            occSkew: Double, satFrac: Double)

  def sq8LayoutStats(s: SparkSession, dir: String,
                     nlist: Int = IvfNlist): Sq8LayoutStats = {
    import s.implicits._
    val occ = s.read.parquet(dir).groupBy(col("bucket")).count().collect()
    if (occ.isEmpty) return Sq8LayoutStats(0L, 0, 0.0, 0.0) // drained index
    val n = occ.map(_.getAs[Long]("count")).sum
    val maxOcc = occ.map(_.getAs[Long]("count")).max.toDouble
    val sat = s.read.parquet(dir).select(col("codes")).as[Array[Byte]]
      .mapPartitions { it =>
        var tot = 0L; var satd = 0L
        it.foreach { cs =>
          var j = 0
          while (j < cs.length) {
            val q = cs(j).toInt + 128
            if (q == 0 || q == 255) satd += 1
            tot += 1; j += 1
          }
        }
        if (tot == 0) Iterator.empty else Iterator.single((tot, satd))
      }.collect()
    val tot = sat.map(_._1).sum
    Sq8LayoutStats(n, occ.length, maxOcc / (n.toDouble / nlist),
      sat.map(_._2).sum.toDouble / math.max(1L, tot))
  }

  /** The SQ8 retrain decision — drift RELATIVE to the write-time
    * snapshot: occupancy skew past `skewTol`×, or the saturation
    * fraction past `satTol`× (the grid-staleness axis: a ×3 drift
    * wave clips a quarter of its coordinates, orders of magnitude
    * above the write-time edge-tail baseline). */
  def sq8Drifted(current: Sq8LayoutStats, baseline: Sq8LayoutStats,
                 skewTol: Double = 1.5, satTol: Double = 3.0): Boolean =
    current.occSkew > baseline.occSkew * skewTol ||
      current.satFrac > baseline.satFrac * satTol

  /** Retrain-and-migrate for the SQ8 layout: re-derive the grid
    * (exact per-dim min/max — the write-time recipe) AND the coarse
    * quantizer from the layout's CURRENT live rows (full precision
    * from `emb`, the IVF-PQ pattern — codes alone cannot re-grid:
    * clipped entries lost their true magnitude), re-code every
    * stored vector, swap under the same path (one `.old` grace
    * generation), tombstones fold. Returns the new
    * (centroids, mns, mxs) — serving switches atomically with the
    * layout. Spec'd: the swapped-in layout is code-identical to a
    * fresh one-shot write under the new artifacts (dequantized
    * values legitimately move with the grid, so serve-invariance is
    * the wrong invariant — the whitened-retrain precedent). */
  def retrainIvfSq8Partitioned(s: SparkSession, dir: String,
                               emb: DataFrame, nlist: Int = IvfNlist)
      : (Array[Array[Double]], Array[Double], Array[Double]) = {
    import s.implicits._
    val full = emb.select(col("vec_id"), col("embedding"))
      .join(minusTombstones(s, dir,
        s.read.parquet(dir).select(col("vec_id"))), Seq("vec_id"))
    val sample = full.orderBy("vec_id").limit(2048)
      .select("embedding").as[Array[Float]].collect()
    val cents = trainCentroids(sample, nlist, iters = 10)
    val (mns, mxs) = sq8Grid(full)
    swapInRetrained(s, dir)(writeIvfSq8PartitionedOn(full, cents, mns, mxs, _))
    (cents, mns, mxs)
  }

  /** ANN over the composed layout: probe the nprobe nearest centroid
    * PARTITIONS (pushed-down `bucket IN (...)` — the scan never
    * touches unprobed directories, ScaleTechniquesSpec asserts the
    * PartitionFilters), dequantize the stored codes, rerank
    * asymmetrically. Result-identical to [[annIvfSq8]] by
    * construction (spec'd). */
  def annIvfSq8Partitioned(s: SparkSession, dir: String,
                           cents: Array[Array[Double]],
                           mns: Array[Double], mxs: Array[Double],
                           queries: DataFrame, k: Int = 5,
                           nprobe: Int = IvfNprobe): DataFrame =
    annIvfSq8ServeBatch(s, dir, cents, mns, mxs,
      queries.select(col("vec_id").as("query_id"), col("embedding")),
      k, nprobe, excludeSelf = true)

  /** Serve ONE batch of queries against the composed SQ8 stored-code
    * layout ([[writeIvfSq8Partitioned]]) — the [[annIvfServeBatch]]
    * shape over 1-byte/dim codes: probed buckets collected (bounded
    * by nlist), partition-pruned scan, per-row dequantize, asymmetric
    * rerank. The per-micro-batch body of
    * [[graft.streaming.EventStream.streamingAnnIvfSq8TopK]] and the
    * shared core of [[annIvfSq8Partitioned]]. `queries` must have
    * `(query_id, embedding)`; `excludeSelf` as in
    * [[annIvfServeBatch]] (serving ids are an independent space). */
  def annIvfSq8ServeBatch(s: SparkSession, dir: String,
                          cents: Array[Array[Double]],
                          mns: Array[Double], mxs: Array[Double],
                          queries: DataFrame, k: Int = 5,
                          nprobe: Int = IvfNprobe,
                          excludeSelf: Boolean = false): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    val probes = queries
      .select(col("query_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        topCentroids(bc.value, v, nprobe).iterator.map(b => (id, b, v)) }
      .toDF("query_id", "bucket", "qv")
    val probedBuckets = probes.select("bucket").distinct()
      .as[Int].collect().sorted // bounded by nlist — driver-safe
    val corpus = minusTombstones(s, dir, s.read.parquet(dir)
      .filter(col("bucket").isin(probedBuckets.map(Integer.valueOf): _*)))
      .select(col("vec_id"), col("bucket"), col("codes"))
      .as[(Long, Int, Array[Byte])] // codes land as parquet BINARY
      .map { case (id, b, codes) => (id, b, codes.map(x => x.toInt + 128)) }
      .toDF("vec_id", "bucket", "q")
      .select(col("vec_id"), col("bucket"),
        sq8Dequant(col("q"), mns, mxs).as("v"))
    val cand0 = corpus.join(broadcast(probes), Seq("bucket"))
    val cand = if (excludeSelf) cand0.filter(col("vec_id") =!= col("query_id"))
               else cand0
    topKPerQuery(cand.select(col("query_id"), col("vec_id").as("neighbor_id"),
      round(cos(col("qv"), col("v")), 6).as("cos_sim")), k)
  }

  /** DuckDB oracle for [[annIvfSq8]]: centroid literals + SQL-retrained
    * SQ8 grid + asymmetric rerank. Data-dependent (the centroids), so
    * emitted by [[graft.SparkEntry.oracleSqlFor]] at Verify time. */
  def annIvfSq8OracleSql(s: SparkSession, d: String, nQueries: Int = 10,
                         k: Int = 5, nlist: Int = IvfNlist,
                         nprobe: Int = IvfNprobe): String = {
    val cents = ivfCentroids(s, d, nlist)
    val centsSql = cents.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n        ")
    s"""
      WITH cents(cid, c) AS (VALUES
        $centsSql),
      idx AS (
        SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS i),
      stats AS (
        SELECT i, MIN(CAST(embedding[i] AS DOUBLE)) AS mn,
               MAX(CAST(embedding[i] AS DOUBLE)) AS mx
        FROM embeddings, idx GROUP BY i),
      grid AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM stats),
      dq AS (
        SELECT vec_id,
          list_transform(range(1, len(embedding) + 1),
            i -> CASE WHEN mxs[i] > mns[i]
                 THEN mns[i] + CAST(CAST(round((CAST(embedding[i] AS DOUBLE) - mns[i]) * 255.0
                        / (mxs[i] - mns[i])) AS INT) AS DOUBLE) * (mxs[i] - mns[i]) / 255.0
                 ELSE mns[i] END) AS v
        FROM embeddings, grid),
      scoredc AS (
        SELECT vec_id, cid,
          list_inner_product(CAST(embedding AS DOUBLE[]), c) AS dot
        FROM embeddings CROSS JOIN cents),
      assign AS (
        SELECT vec_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scoredc) WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scoredc WHERE vec_id < $nQueries) WHERE rn <= $nprobe),
      cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM assign a JOIN probes p
          ON a.bucket = p.bucket AND a.vec_id <> p.query_id),
      rer AS (
        SELECT c.query_id, c.neighbor_id,
          round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]), ne.v), 6) AS cos_sim
        FROM cand c
        JOIN embeddings qe ON qe.vec_id = c.query_id
        JOIN dq ne ON ne.vec_id = c.neighbor_id)
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
        FROM rer)
      WHERE rank <= $k ORDER BY query_id, rank"""
  }

  // ---- SemDeDup: semantic (embedding-cluster) deduplication ------------

  /** dedup_semantic: SemDeDup (Abbas et al. 2023) — k-means-cluster
    * the embedding space with the IVF coarse quantizer, then dedup
    * WITHIN each cluster: a vector is removed iff an earlier (lower
    * id) same-cluster vector sits within cosine ≥ τ (the repo's
    * keep-first rule; the paper's "keep one per semantic group" made
    * deterministic). This is the semantic complement of the LSH
    * near-dup family: hyperplane LSH blocks by random geometry,
    * SemDeDup blocks by LEARNED cluster structure, which is what
    * catches paraphrase-level redundancy at training-data scale.
    *
    * Scale shape: assignment is a broadcast-centroid typed map (one
    * linear pass); the within-cluster pairing is an equi-join on the
    * bucket key whose quadratic work stays IN-STAGE (pairs flow
    * straight into a map-side-combined max per vec — the shuffle
    * carries the n input rows, never the n²/nlist pair rows). At
    * 100 TB nlist scales with the corpus (cluster size held ~constant
    * — SemDeDup trains k ∝ N), making per-cluster work bounded; the
    * Scale10 probe measures exactly that regime. Cosine is the
    * native codegen'd expression, rounded 6 dp before the max/τ
    * compare (engine-identical). */
  def dedupSemantic(s: SparkSession, d: String): DataFrame =
    dedupSemantic(Tables.embeddings(s, d), ivfCentroids(s, d, SemNlist))

  private[graft] val SemNlist = 32
  private[graft] val SemTau   = 0.35

  def dedupSemantic(e: DataFrame, cents: Array[Array[Double]],
                    tau: Double = SemTau): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    def assigned(idCol: String, embCol: String) =
      e.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .map { case (id, v) => (id, nearestCentroid(bc.value, v), v) }
        .toDF(idCol, "bucket", embCol)
    assigned("v1", "e1")
      .join(assigned("v2", "e2").hint("shuffle_hash"), Seq("bucket"))
      .where(col("v1") < col("v2"))
      .select(col("v2").as("vec_id"), col("bucket"),
        round(graft.functions.CosineSimilarity.cosineSim(
          col("e1"), col("e2")), 6).as("cs"))
      .groupBy(col("vec_id"), col("bucket"))
      .agg(max(col("cs")).as("max_cos"))
      .filter(col("max_cos") >= tau)
      .orderBy(col("vec_id"))
  }

  // ---- SSL-prototype / D4 diversity selection --------------------------

  /** select_prototypes: prototypicality-based data selection (the
    * SSL-Prototypes metric of Sorscher et al. 2022 "Beyond neural
    * scaling laws", the second half of D4 after SemDeDup): cluster
    * the embedding space with the same k-means coarse quantizer,
    * score every vector by its cosine to its OWN cluster centroid
    * (high = prototypical/easy, low = hard/diverse), and keep the
    * LEAST prototypical half of every cluster — the pruning rule
    * that beats random subsampling when data is abundant. Emits the
    * full scored frame (vec_id, bucket, proto_cos, div_rank, keep)
    * so downstream picks its own keep fraction.
    *
    * Scale shape: assignment is the broadcast-centroid typed map;
    * the centroid join is a broadcast of nlist rows; the rank is a
    * window PARTITIONED BY cluster — bounded because nlist scales
    * with the corpus (cluster size ~constant, the SemDeDup
    * argument), never a global window. Cosine is the native
    * codegen'd expression rounded 6 dp with vec_id tie-break. */
  def selectPrototypes(s: SparkSession, d: String): DataFrame =
    selectPrototypes(Tables.embeddings(s, d), ivfCentroids(s, d, SemNlist))

  def selectPrototypes(e: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = e.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    val assigned = e.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, nearestCentroid(bc.value, v), v) }
      .toDF("vec_id", "bucket", "v")
    val centsDf = cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("bucket", "cent")
    val rankW = Window.partitionBy(col("bucket"))
      .orderBy(col("proto_cos").asc, col("vec_id").asc)
    val cntW = Window.partitionBy(col("bucket"))
    assigned.join(broadcast(centsDf), Seq("bucket"))
      .select(col("vec_id"), col("bucket"),
        round(graft.functions.CosineSimilarity.cosineSim(
          col("v"), col("cent")), 6).as("proto_cos"))
      .withColumn("div_rank", row_number().over(rankW))
      .withColumn("nb", count(lit(1)).over(cntW))
      .withColumn("keep",
        when(col("div_rank") <= expr("nb div 2"), lit(1)).otherwise(lit(0)))
      .select(col("vec_id"), col("bucket"), col("proto_cos"),
        col("div_rank"), col("keep"))
      .orderBy(col("vec_id"))
  }

  /** DuckDB oracle for [[selectPrototypes]]: centroid literals (the
    * [[annIvfOracleSql]] recipe), argmax-dot assignment, per-cluster
    * rank over the 6-dp cosine with vec_id tie-break. Data-dependent
    * → emitted by oracleSqlFor. */
  def selectPrototypesOracleSql(s: SparkSession, d: String,
                                nlist: Int = SemNlist): String = {
    val cents = ivfCentroids(s, d, nlist)
    val centsSql = cents.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n        ")
    s"""
      WITH cents(cid, c) AS (VALUES
        $centsSql),
      scored AS (
        SELECT vec_id, cid,
          list_inner_product(CAST(embedding AS DOUBLE[]), c) AS dot
        FROM embeddings CROSS JOIN cents),
      assign AS (
        SELECT vec_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scored) WHERE rn = 1),
      proto AS (
        SELECT a.vec_id, a.bucket,
          round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                       c.c), 6) AS proto_cos
        FROM assign a
        JOIN embeddings e ON e.vec_id = a.vec_id
        JOIN cents c ON c.cid = a.bucket),
      ranked AS (
        SELECT vec_id, bucket, proto_cos,
          CAST(row_number() OVER (PARTITION BY bucket
               ORDER BY proto_cos ASC, vec_id ASC) AS INT) AS div_rank,
          COUNT(*) OVER (PARTITION BY bucket) AS nb
        FROM proto)
      SELECT vec_id, bucket, proto_cos, div_rank,
        CAST(CASE WHEN div_rank <= nb // 2 THEN 1 ELSE 0 END AS INT) AS keep
      FROM ranked ORDER BY vec_id"""
  }

  // ---- select_kcenter: greedy k-center coreset -----------------------------

  /** Default coreset size for the in-query diagnostic form (each
    * round is one corpus pass — kept small for the oracle's unrolled
    * CTE replay; the operator takes any k). */
  private[graft] val KcenterK = 8

  /** Exact-integer cosine (e6 units) between two e6-snapped
    * coordinate arrays — object-level so Dataset closures calling it
    * capture nothing (the r13 Task-not-serializable rule). */
  private def cosE6Arrays(a: Array[Long], b: Array[Long]): Long = {
    var dot = 0L; var an = 0L; var bn = 0L; var j = 0
    while (j < a.length) {
      dot += a(j) * b(j); an += a(j) * a(j); bn += b(j) * b(j); j += 1 }
    cosE6(dot, an, bn)
  }

  /** select_kcenter — GREEDY K-CENTER coreset selection over the
    * embedding column (Gonzalez 1985 farthest-point traversal; the
    * DIVERSIFICATION stage of training-data selection — D4's
    * complement to [[selectPrototypes]]' per-cluster typicality:
    * prototypes keep what is REPRESENTATIVE, k-center keeps what is
    * SPREAD — together they bound both redundancy and coverage; the
    * greedy sweep is the classic 2-approximation of the k-center
    * objective). Seed = the least vec_id; each round picks the
    * vector whose MAXIMUM cosine to the already-chosen set is
    * MINIMUM (the farthest point under cosine distance, ties to the
    * least vec_id). Output (r, vec_id, maxcos_e6) — r the selection
    * round, maxcos_e6 the cover radius AT selection (monotone
    * non-decreasing from round 2 on, the standard coreset quality
    * readout; the seed row carries 1000000 = cos with itself, by
    * convention).
    *
    * Determinism: coordinates e6-snap to exact BIGINTs, every
    * pairwise score is the cos_e6 fixed scalar IEEE chain on exact
    * integers (bit-identical cross-engine), the per-round argmin is
    * an integer (maxcos, vec_id) minimum — the oracle replays the
    * rounds as unrolled chained CTEs ([[selectKcenterOracleSql]],
    * the graph_pagerank discipline).
    *
    * Scale shape: the snap pass runs once (localCheckpoint — eager,
    * and every round collects anyway); each round is ONE corpus-linear
    * pass against a broadcast ≤k·dim integer array plus a
    * TakeOrdered(1) — k passes total, no join, no shuffle beyond the
    * bounded take. At 100 TB the same loop runs on a uniform sample
    * (greedy k-center is 2-approx on the sample, and the cover-radius
    * readout tells you if the sample was too thin) — the loop shape
    * does not change. */
  def selectKcenter(s: SparkSession, d: String,
                    kSel: Int = KcenterK): DataFrame =
    selectKcenterOn(Tables.embeddings(s, d), kSel)

  /** Corpus-parameterized core of [[selectKcenter]]. */
  def selectKcenterOn(emb: DataFrame, kSel: Int): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    kcenterChosen(emb, kSel).map(t => (t._1, t._2, t._3))
      .toDF("r", "vec_id", "maxcos_e6")
  }

  /** The greedy sweep shared by [[selectKcenterOn]] and
    * [[selectKcenterAssignOn]]: (round, vec_id, maxcos-at-pick,
    * snapped code) per chosen center. */
  private def kcenterChosen(emb: DataFrame, kSel: Int)
      : Vector[(Int, Long, Long, Array[Long])] = {
    val s = emb.sparkSession
    import s.implicits._
    val base = graft.Util.fanOutIfAtLeast(
        emb.select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, graft.Util.snapE6(v)) }
      .toDF("vec_id", "c").as[(Long, Array[Long])]
      .localCheckpoint()
    val seed = base.orderBy(col("vec_id")).head()
    var chosen = Vector((1, seed._1, 1000000L, seed._2))
    for (r <- 2 to kSel) {
      val bcCodes = s.sparkContext.broadcast(chosen.map(_._4).toArray)
      val ids = chosen.map(_._2)
      val pick = base.filter(!col("vec_id").isInCollection(ids))
        .map { case (id, c) =>
          var best = Long.MinValue
          var i = 0
          while (i < bcCodes.value.length) {
            val cs = cosE6Arrays(c, bcCodes.value(i))
            if (cs > best) best = cs
            i += 1
          }
          (best, id, c)
        }
        .toDF("mc", "vec_id", "c")
        .orderBy(col("mc"), col("vec_id")).limit(1)
        .as[(Long, Long, Array[Long])].head()
      chosen = chosen :+ ((r, pick._2, pick._1, pick._3))
    }
    chosen
  }

  /** select_kcenter_assign — the VORONOI WEIGHTS of the k-center
    * coreset: every corpus vector assigned to its most-cosine-similar
    * chosen center (ties to the least center id), reported as
    * (center_id, n_members). This is what a training loop actually
    * consumes from a coreset — each center stands in for its cell,
    * weighted by the cell's mass (the sensitivity-sampling /
    * importance-weight readout); Σ n_members = corpus size
    * (spec'd). One broadcast typed pass + one bounded aggregate on
    * top of the [[selectKcenterOn]] sweep. */
  def selectKcenterAssign(s: SparkSession, d: String,
                          kSel: Int = KcenterK): DataFrame =
    selectKcenterAssignOn(Tables.embeddings(s, d), kSel)

  /** Corpus-parameterized core of [[selectKcenterAssign]]. */
  def selectKcenterAssignOn(emb: DataFrame, kSel: Int): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(
      kcenterChosen(emb, kSel).map(t => (t._2, t._4)).toArray)
    graft.Util.fanOutIfAtLeast(emb.select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .map { case (_, v) =>
        val c = graft.Util.snapE6(v)
        var bestCos = Long.MinValue; var bestId = Long.MaxValue
        var i = 0
        while (i < bc.value.length) {
          val (cid, cc) = bc.value(i)
          val cs = cosE6Arrays(c, cc)
          if (cs > bestCos || (cs == bestCos && cid < bestId)) {
            bestCos = cs; bestId = cid
          }
          i += 1
        }
        bestId
      }
      .toDF("center_id")
      .groupBy(col("center_id")).agg(count(lit(1)).as("n_members"))
      .orderBy(col("center_id"))
  }

  /** In-memory greedy k-center over a sorted point slice (seed = the
    * slice's least id — the [[selectKcenterOn]] semantics applied
    * locally). Object-level: Dataset closures calling it capture
    * nothing (the r13 rule). O(k²·n) — n is a SLICE, not the corpus. */
  private def greedyLocal(pts: Array[(Long, Array[Long])],
                          k: Int): Array[(Long, Array[Long])] = {
    if (pts.isEmpty) return Array.empty
    // Gonzalez running max: each round scores candidates against only
    // the NEWEST center and keeps a per-point max — O(k·n·dim), same
    // picks as recomputing all chosen each round (the max is the
    // max); pts are id-sorted, so the strict < keeps the least id on
    // ties (the selectKcenterOn tie-break)
    val chosen = scala.collection.mutable.ArrayBuffer(pts.head)
    val maxCos = Array.fill(pts.length)(Long.MinValue)
    val taken = new Array[Boolean](pts.length)
    taken(0) = true
    while (chosen.length < k && chosen.length < pts.length) {
      val newest = chosen.last._2
      var bestMc = Long.MaxValue; var bestIdx = -1
      var i = 0
      while (i < pts.length) {
        if (!taken(i)) {
          val cs = cosE6Arrays(pts(i)._2, newest)
          if (cs > maxCos(i)) maxCos(i) = cs
          if (maxCos(i) < bestMc) { bestMc = maxCos(i); bestIdx = i }
        }
        i += 1
      }
      taken(bestIdx) = true
      chosen += pts(bestIdx)
    }
    chosen.toArray
  }

  /** COMPOSABLE two-level k-center — the 100 TB form of
    * [[selectKcenterOn]] (whose k driver-coordinated corpus passes
    * are fine at k=8 but serialize the driver into the loop): the
    * corpus deterministically slices by vec_id mod `parts`, each
    * slice runs the greedy sweep LOCALLY to `kLocal` centers in one
    * distributed pass (the composable-coreset pattern — a slice is
    * sized to executor memory, which is what `parts` controls at
    * scale), and the ≤ parts·kLocal union (driver-bounded) runs the
    * same greedy to the final k. Guarantee: per-level greedy is the
    * Gonzalez 2-approximation and the union is a coreset, so the
    * final cover radius is within a small constant of the one-shot
    * sweep's (≤ 4·OPT analytically; measured ≈ 1× on the isotropic
    * corpus — spec'd against [[coverMaxcosE6]] with the 4× analytic
    * bound). Deterministic end to end: slices by id arithmetic,
    * in-slice order sorted, greedy id-tie-broken — spec'd
    * run-to-run identical. Output (r, vec_id) in final pick order. */
  def selectKcenterComposable(emb: DataFrame, kSel: Int = KcenterK,
                              parts: Int = 8,
                              kLocal: Int = 16): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val union = graft.Util.fanOutIfAtLeast(
        emb.select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, graft.Util.snapE6(v)) }
      .groupByKey(_._1 % parts)
      .flatMapGroups { (_, it) =>
        greedyLocal(it.toArray.sortBy(_._1), kLocal).iterator
      }
      .collect().sortBy(_._1) // ≤ parts·kLocal rows — driver-bounded
    greedyLocal(union, kSel).zipWithIndex
      .map { case ((id, _), i) => (i + 1, id) }
      .toSeq.toDF("r", "vec_id")
  }

  /** The cover quality of a chosen center set: MIN over the corpus of
    * (MAX cosine to any center) in e6 units — higher = tighter cover
    * (1e6 − value is the cover radius in cosine distance). One
    * corpus-linear pass against the broadcast centers. */
  def coverMaxcosE6(emb: DataFrame, centerIds: Seq[Long]): Long = {
    val s = emb.sparkSession
    import s.implicits._
    val coded = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, graft.Util.snapE6(v)) }
    val cents = coded.filter(c => centerIds.contains(c._1)).collect()
    val bc = s.sparkContext.broadcast(cents.map(_._2))
    coded.map { case (_, c) =>
        var mc = Long.MinValue
        var i = 0
        while (i < bc.value.length) {
          val cs = cosE6Arrays(c, bc.value(i))
          if (cs > mc) mc = cs
          i += 1
        }
        mc
      }
      .toDF("mc").agg(min(col("mc"))).head().getLong(0)
  }

  /** DuckDB oracle for [[selectKcenter]]: the greedy rounds unrolled
    * as chained CTEs — each round joins the corpus against the
    * accumulated chosen set (≤ k rows), takes the per-vector MAX
    * cos_e6, and picks the (mc, vec_id) minimum; the cos_e6 chain is
    * the classify_knn brute-force expression verbatim. Static (seed
    * and every pick derive from the data in-query — no artifact
    * literals). */
  private def kcenterCosSql(va: String, vb: String) =
    s"""CAST(floor(CAST(list_sum(list_transform(range(1, len($va.c) + 1),
               i -> $va.c[i] * $vb.c[i])) AS DOUBLE) /
          (sqrt(CAST($va.vn AS DOUBLE)) * sqrt(CAST($vb.vn AS DOUBLE)))
          * 1e6 + 0.5) AS BIGINT)"""

  /** The unrolled-greedy CTE chain shared by the two kcenter oracles
    * (ends at acc`k` = the chosen set with codes). */
  private def kcenterOracleBody(k: Int): String = {
    val rounds = (2 to k).map { i =>
      s"""mx$i AS (
        SELECT v.vec_id, MAX(${kcenterCosSql("v", "ch")}) AS mc
        FROM e v, acc${i - 1} ch
        WHERE v.vec_id NOT IN (SELECT vec_id FROM acc${i - 1})
        GROUP BY v.vec_id),
      pk$i AS (
        SELECT $i AS r, e.vec_id, mx$i.mc AS maxcos_e6, e.c, e.vn
        FROM mx$i JOIN e USING (vec_id)
        ORDER BY mx$i.mc, e.vec_id LIMIT 1),
      acc$i AS (SELECT * FROM acc${i - 1} UNION ALL SELECT * FROM pk$i)"""
    }.mkString(",\n      ")
    s"""
      WITH e AS (
        SELECT vec_id, c,
          CAST(list_sum(list_transform(c, x -> x * x)) AS BIGINT) AS vn
        FROM (SELECT vec_id,
                list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS c
              FROM embeddings)),
      acc1 AS (
        SELECT 1 AS r, vec_id, CAST(1000000 AS BIGINT) AS maxcos_e6, c, vn
        FROM e WHERE vec_id = (SELECT MIN(vec_id) FROM e)),
      $rounds"""
  }

  def selectKcenterOracleSql(k: Int = KcenterK): String =
    s"""${kcenterOracleBody(k)}
      SELECT r, vec_id, maxcos_e6 FROM acc$k ORDER BY r"""

  /** DuckDB oracle for [[selectKcenterAssign]]: the shared greedy
    * chain + a corpus × chosen argmax (cos desc, center_id asc) and
    * the cell-size aggregate. */
  def selectKcenterAssignOracleSql(k: Int = KcenterK): String =
    s"""${kcenterOracleBody(k)},
      asg AS (
        SELECT v.vec_id, ch.vec_id AS center_id,
          ${kcenterCosSql("v", "ch")} AS ce
        FROM e v, acc$k ch),
      best AS (
        SELECT vec_id, center_id,
          row_number() OVER (PARTITION BY vec_id
                             ORDER BY ce DESC, center_id) AS rn
        FROM asg)
      SELECT center_id, COUNT(*) AS n_members
      FROM best WHERE rn = 1 GROUP BY 1 ORDER BY 1"""

  /** DuckDB oracle for [[dedupSemantic]]: trained centroids as
    * DOUBLE[] literals (the [[annIvfOracleSql]] recipe), assignment
    * argmax-dot with lowest-cid ties, within-cluster keep-first max
    * cosine. Data-dependent → emitted by oracleSqlFor. */
  def dedupSemanticOracleSql(s: SparkSession, d: String,
                             nlist: Int = SemNlist,
                             tau: Double = SemTau): String = {
    val cents = ivfCentroids(s, d, nlist)
    val centsSql = cents.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n        ")
    s"""
      WITH cents(cid, c) AS (VALUES
        $centsSql),
      scored AS (
        SELECT vec_id, cid,
          list_inner_product(CAST(embedding AS DOUBLE[]), c) AS dot
        FROM embeddings CROSS JOIN cents),
      assign AS (
        SELECT vec_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scored) WHERE rn = 1),
      pairs AS (
        SELECT a2.vec_id AS v, a1.bucket,
          round(list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                       CAST(e2.embedding AS DOUBLE[])), 6) AS cs
        FROM assign a1
        JOIN assign a2 ON a2.bucket = a1.bucket AND a1.vec_id < a2.vec_id
        JOIN embeddings e1 ON e1.vec_id = a1.vec_id
        JOIN embeddings e2 ON e2.vec_id = a2.vec_id)
      SELECT v AS vec_id, bucket, max(cs) AS max_cos
      FROM pairs GROUP BY 1, 2 HAVING max(cs) >= $tau
      ORDER BY vec_id"""
  }

  // ---- knn_graph: corpus-wide k-NN graph ---------------------------------

  /** Trained-centroid VALUES CTE text shared by the knn_graph /
    * kmeans_report oracles (the [[annIvfOracleSql]] literal recipe). */
  private def centsCteSql(cents: Array[Array[Double]]): String = {
    val rows = cents.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n        ")
    s"""cents(cid, c) AS (VALUES
        $rows),
      scored AS (
        SELECT vec_id, cid,
          list_inner_product(CAST(embedding AS DOUBLE[]), c) AS dot
        FROM embeddings CROSS JOIN cents),
      assign AS (
        SELECT vec_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scored) WHERE rn = 1)"""
  }

  private[graft] val KnnK = 5

  /** knn_graph — the corpus-wide k-nearest-neighbor GRAPH (every
    * vector a source, not just a query batch): the shared primitive
    * under SemDeDup-style semantic dedup, SSL-prototype selection,
    * graph-based curation, and kNN-classifier data attribution.
    * EVERY vector probes its `nprobe` nearest IVF centroids and meets
    * candidates through the bucket EQUI-join (shuffle-hash — the
    * probe side is the corpus itself, nothing broadcasts); exact
    * cosine rerank, per-source bounded top-k via the TopK aggregator
    * (map-side partial — the shuffle after the join carries k·sources
    * rows, never the candidate set).
    *
    * 100 TB shape: candidate volume is n · nprobe · (n/nlist); with
    * nlist ∝ corpus (the SemDeDup scaling rule — constant bucket
    * occupancy) the per-vector candidate count is CONSTANT, so the
    * graph costs O(n) candidates at any corpus size. nprobe=16 is the
    * same measured recall knee as ann_ivf (the graph runs identical
    * probe mechanics; recall@5 reported per round in Bench's
    * knn_graph channel, floored at 0.8 by RecallSpec). */
  def knnGraph(s: SparkSession, d: String, k: Int = KnnK,
               nlist: Int = IvfNlist, nprobe: Int = IvfNprobe,
               ordered: Boolean = true): DataFrame =
    knnGraphOn(Tables.embeddings(s, d), ivfCentroids(s, d, nlist), k, nprobe,
      ordered)

  /** [[knnGraph]] over an explicit embedding frame + trained
    * centroids (the Scale10 probe entry point). `ordered=false` for
    * interior consumers (loops, CC, artifact writes) that destroy
    * order immediately — see [[topKPerQuery]]. */
  def knnGraphOn(emb: DataFrame, cents: Array[Array[Double]],
                 k: Int = KnnK, nprobe: Int = IvfNprobe,
                 ordered: Boolean = true): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    val bucketed = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, nearestCentroid(bc.value, v), v) }
      .toDF("neighbor_id", "bucket", "v")
    val probes = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        topCentroids(bc.value, v, nprobe).iterator.map(b => (id, b, v)) }
      .toDF("vec_id", "bucket", "qv")
    val scoredPairs = bucketed.hint("shuffle_hash")
      .join(probes, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("vec_id"))
      .select(col("vec_id").as("query_id"), col("neighbor_id"),
        round(cos(col("qv"), col("v")), 6).as("cos_sim"))
    val top = topKPerQuery(scoredPairs, k, ordered = false)
      .withColumnRenamed("query_id", "vec_id")
    if (ordered) top.orderBy(col("vec_id"), col("rank")) else top
  }

  /** DuckDB oracle for [[knnGraph]]: [[annIvfOracleSql]] with the
    * probe set widened to the whole corpus. Data-dependent → emitted
    * by oracleSqlFor. */
  def knnGraphOracleSql(s: SparkSession, d: String, k: Int = KnnK,
                        nlist: Int = IvfNlist,
                        nprobe: Int = IvfNprobe): String = {
    s"""
      WITH ${centsCteSql(ivfCentroids(s, d, nlist))},
      probes AS (
        SELECT vec_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scored) WHERE rn <= $nprobe),
      cand AS (
        SELECT p.vec_id, a.vec_id AS neighbor_id
        FROM assign a JOIN probes p
          ON a.bucket = p.bucket AND a.vec_id <> p.vec_id),
      rer AS (
        SELECT c.vec_id, c.neighbor_id,
          round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                       CAST(ne.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM cand c
        JOIN embeddings qe ON qe.vec_id = c.vec_id
        JOIN embeddings ne ON ne.vec_id = c.neighbor_id)
      SELECT vec_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
        FROM rer)
      WHERE rank <= $k ORDER BY vec_id, rank"""
  }

  // ---- kmeans_report: coarse-quantizer diagnostics -----------------------

  /** kmeans_report — the CLUSTERING-QUALITY report published before
    * trusting the IVF coarse quantizer at 100 TB (the
    * dedup_profile / lsh_calibration discipline applied to the vector
    * side): per bucket, member count, mean cosine-to-centroid (the
    * spherical-k-means objective — exact-decimal mean of 6-dp
    * cosines) and the WORST member's cosine (a low min flags a
    * bucket whose tail rerank quality suffers; a tiny n_vecs flags a
    * dead/starved centroid that wastes a probe). One assignment pass
    * (broadcast nlist·dim centroid map) + a 32-row broadcast join for
    * the centroid vectors + one partial-agg shuffle of nlist groups. */
  def kmeansReport(s: SparkSession, d: String,
                   nlist: Int = IvfNlist): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cents = ivfCentroids(s, d, nlist)
    val centsDf = {
      import s.implicits._
      cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
        .toDF("bucket", "cent")
    }
    val assigned = ivfAssign(Tables.embeddings(s, d), cents)
    assigned.join(broadcast(centsDf), Seq("bucket"))
      .select(col("bucket"),
        round(cos(col("embedding"), col("cent")), 6).as("c6"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("c6").cast(DecimalType(9, 6))).cast("double") /
          count(lit(1)), 6).as("mean_cos"),
        min(col("c6")).as("min_cos"))
      .orderBy(col("bucket"))
  }

  /** DuckDB oracle for [[kmeansReport]]: centroid literals, argmax-dot
    * assignment, the same 6-dp/DECIMAL/one-division mean. */
  def kmeansReportOracleSql(s: SparkSession, d: String,
                            nlist: Int = IvfNlist): String = {
    s"""
      WITH ${centsCteSql(ivfCentroids(s, d, nlist))},
      mem AS (
        SELECT a.bucket,
          round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                       c.c), 6) AS c6
        FROM assign a
        JOIN embeddings e ON e.vec_id = a.vec_id
        JOIN cents c ON c.cid = a.bucket)
      SELECT bucket, COUNT(*) AS n_vecs,
        round(CAST(SUM(CAST(c6 AS DECIMAL(9,6))) AS DOUBLE) / COUNT(*), 6)
          AS mean_cos,
        MIN(c6) AS min_cos
      FROM mem GROUP BY 1 ORDER BY bucket"""
  }

  // ---- mine_bitext: margin-based parallel-pair mining --------------------

  /** mine_bitext — margin-based bitext mining (Artetxe & Schwenk ACL
    * 2019; the CCMatrix/LASER curation op): given two embedding pools
    * (conceptually two languages in a shared space — here the
    * deterministic vec_id-parity halves), each source is paired with
    * its margin-best target, margin(x,y) = cos(x,y) / ((avgNN(x) +
    * avgNN(y)) / 2) where avgNN is the mean cosine of a side's
    * top-`k` cross-pool neighbors — the RATIO criterion that
    * normalizes away hubness (a raw cosine threshold over-mines dense
    * regions and under-mines sparse ones; the margin asks "is this
    * pair closer than either side's general neighborhood").
    *
    * Both kNN directions run the IVF bucket EQUI-join (the knnGraph
    * shape — probe side is a pool, nothing broadcasts, never a
    * cross-join); at 100 TB this is exactly CCMatrix's architecture
    * (FAISS IVF sharded over the corpus). Determinism: cosines 6 dp;
    * avgNN = exact DECIMAL(9,6) sum cast once to double over the
    * neighbor count; margin = one IEEE division of that fixed tree,
    * 6 dp; the per-source argmax ranks on the ROUNDED margin with
    * target-id tie-break. `mined` flags margin ≥ `tau` (pairs a
    * downstream aligner would accept). */
  private[graft] val MineK = 4
  private[graft] val MineTau = 1.05

  def mineBitext(s: SparkSession, d: String, k: Int = MineK,
                 nlist: Int = IvfNlist, nprobe: Int = IvfNprobe,
                 tau: Double = MineTau): DataFrame =
    mineBitextOn(Tables.embeddings(s, d), ivfCentroids(s, d, nlist),
      k, nprobe, tau)

  /** One direction of the cross-pool kNN: sources probe their nprobe
    * buckets, targets sit in their own bucket, candidates meet in the
    * bucket equi-join. Returns (query_id, neighbor_id, cos_sim, rank),
    * rank ≤ k. */
  private def crossPoolKnn(src: DataFrame, tgt: DataFrame,
                           cents: Array[Array[Double]],
                           k: Int, nprobe: Int): DataFrame = {
    val s = src.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    val bucketed = tgt.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, nearestCentroid(bc.value, v), v) }
      .toDF("neighbor_id", "bucket", "v")
    val probes = src.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        topCentroids(bc.value, v, nprobe).iterator.map(b => (id, b, v)) }
      .toDF("query_id", "bucket", "qv")
    val scoredPairs = bucketed.hint("shuffle_hash")
      .join(probes, Seq("bucket"))
      .select(col("query_id"), col("neighbor_id"),
        round(cos(col("qv"), col("v")), 6).as("cos_sim"))
    topKPerQuery(scoredPairs, k, ordered = false)
  }

  def mineBitextOn(emb: DataFrame, cents: Array[Array[Double]],
                   k: Int = MineK, nprobe: Int = IvfNprobe,
                   tau: Double = MineTau): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val srcPool = emb.filter(col("vec_id") % 2 === 0)
    val tgtPool = emb.filter(col("vec_id") % 2 === 1)
    // fwd feeds two branches (the per-source average and the margin
    // join), but checkpointing it measured 1.4× SLOWER in the full
    // bench (r17 min-aggregate A/B): the replayed subtree is
    // dominated by the scan-only typed code maps, the
    // checkpoint-loses class — left lazy deliberately
    val fwd = crossPoolKnn(srcPool, tgtPool, cents, k, nprobe)
      .select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"),
        col("cos_sim"))
    val bwd = crossPoolKnn(tgtPool, srcPool, cents, k, nprobe)
    def avgNN(knn: DataFrame, idCol: String) = knn
      .groupBy(col("query_id").as(idCol))
      .agg((sum(col("cos_sim").cast(DecimalType(9, 6))).cast("double") /
        count(lit(1))).as(s"avg_$idCol"))
    val avgF = avgNN(fwd.select(col("src_id").as("query_id"), col("cos_sim")),
      "src_id")
    val avgB = avgNN(bwd, "tgt_id")
    val margined = fwd
      .join(avgF, Seq("src_id"))
      .join(avgB, Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"), col("cos_sim"),
        round(col("cos_sim") / ((col("avg_src_id") + col("avg_tgt_id")) /
          lit(2.0)), 6).as("margin"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("margin").desc, col("tgt_id").asc)
    margined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("src_id"), col("tgt_id"), col("cos_sim"), col("margin"),
        when(col("margin") >= lit(tau), lit(1)).otherwise(lit(0)).as("mined"))
      .orderBy(col("src_id"))
  }

  /** DuckDB oracle for [[mineBitext]]: centroid literals, both
    * cross-pool kNN directions as candidate CTEs ranked (cos DESC, id)
    * to k, the same DECIMAL-sum/one-division average and margin tree,
    * per-source argmax on the rounded margin. Data-dependent →
    * emitted by oracleSqlFor. */
  def mineBitextOracleSql(s: SparkSession, d: String, k: Int = MineK,
                          nlist: Int = IvfNlist, nprobe: Int = IvfNprobe,
                          tau: Double = MineTau): String = {
    s"""
      WITH ${centsCteSql(ivfCentroids(s, d, nlist))},
      probes AS (
        SELECT vec_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scored) WHERE rn <= $nprobe),
      cand AS (
        SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
          round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                       CAST(ne.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM probes p
        JOIN assign a ON a.bucket = p.bucket
          AND a.vec_id % 2 <> p.vec_id % 2
        JOIN embeddings qe ON qe.vec_id = p.vec_id
        JOIN embeddings ne ON ne.vec_id = a.vec_id),
      knn AS (
        SELECT query_id, neighbor_id, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id) AS rn
          FROM cand) WHERE rn <= $k),
      avgs AS (
        SELECT query_id,
          CAST(SUM(CAST(cos_sim AS DECIMAL(9,6))) AS DOUBLE) / COUNT(*) AS av
        FROM knn GROUP BY 1),
      marg AS (
        SELECT f.query_id AS src_id, f.neighbor_id AS tgt_id, f.cos_sim,
          round(f.cos_sim / ((af.av + ab.av) / 2.0), 6) AS margin
        FROM knn f
        JOIN avgs af ON af.query_id = f.query_id
        JOIN avgs ab ON ab.query_id = f.neighbor_id
        WHERE f.query_id % 2 = 0)
      SELECT src_id, tgt_id, cos_sim, margin,
        CAST(CASE WHEN margin >= $tau THEN 1 ELSE 0 END AS INT) AS mined
      FROM (
        SELECT *, row_number() OVER (PARTITION BY src_id
          ORDER BY margin DESC, tgt_id) AS rn
        FROM marg) WHERE rn = 1
      ORDER BY src_id"""
  }

  // ---- graph_pagerank: centrality over the kNN graph ---------------------

  private[graft] val PrIters = 10
  /** Rank mass is carried in 1e-12 units as exact BIGINTs. */
  private[graft] val PrScale = 1000000000000L

  /** graph_pagerank — PageRank centrality over the corpus kNN graph
    * (the graph-based data-selection signal: central documents are
    * representative, peripheral ones are outliers/noise — the ranking
    * behind kNN-graph coreset selection and influence-style audits).
    * Damping d = 17/20 (0.85 exact), `iters` fixed power iterations.
    *
    * Determinism: rank mass lives in 1e-12 units as exact BIGINTs —
    * every step is integer arithmetic (share = pr div deg; update =
    * base + (17·Σshares) div 20, all positive so truncating div ==
    * floor in BOTH engines) — no float ever accumulates, so the
    * result is bit-identical everywhere; the published `pagerank`
    * double is ONE division per row at the end, 6 dp.
    *
    * 100 TB shape: the Pregel/GraphX loop — per iteration ONE
    * src-keyed equi-join (edges × node-sized rank frame) and ONE
    * partial-agg shuffle on dst; localCheckpoint truncates the
    * growing lineage each step (the loop forces actions itself, so
    * the lazily-returned-operator trap doesn't apply). Edge volume is
    * the knnGraph invariant (constant per-vector candidates when
    * nlist ∝ corpus), so each iteration is O(k·n). */
  def graphPagerank(s: SparkSession, d: String, k: Int = KnnK,
                    nlist: Int = IvfNlist, nprobe: Int = IvfNprobe,
                    iters: Int = PrIters): DataFrame = {
    val edges = knnGraph(s, d, k, nlist, nprobe, ordered = false)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    val nodes = Tables.embeddings(s, d).select(col("vec_id"))
    pagerankOn(edges, nodes, iters)
  }

  /** PageRank over explicit (src, dst) edges and a node frame; see
    * [[graphPagerank]] for the arithmetic contract. Nodes without
    * in-edges keep the teleport base; sources divide their mass over
    * their actual out-degree. */
  def pagerankOn(edges: DataFrame, nodes: DataFrame,
                 iters: Int = PrIters): DataFrame = {
    // nodes is consumed per iteration plus the count — pin it once
    // (it was a fresh scan per iteration before)
    val nd = nodes.localCheckpoint()
    val n = nd.count()
    val base = (3L * PrScale) / (20L * n)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesDeg = edges.join(deg, Seq("src")).localCheckpoint()
    var ranks = nd.select(col("vec_id"), lit(PrScale / n).as("pr"))
    for (i <- 1 to iters) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("vec_id", "src"), Seq("src"))
        .select(col("dst").as("vec_id"), expr("pr div deg").as("share"))
        .groupBy(col("vec_id")).agg(sum(col("share")).as("in_sum"))
      ranks = nd.join(contrib, Seq("vec_id"), "left")
        .select(col("vec_id"), (lit(base) +
          expr("(17 * coalesce(in_sum, CAST(0 AS BIGINT))) div 20")).as("pr"))
      // the rank chain is LINEAR (each iteration's frame is consumed
      // exactly once by the next), so no per-iteration checkpoint is
      // needed for recompute protection — one barrier every few
      // iterations just bounds plan depth/codegen size; ten barriers
      // serialized the whole loop into ten jobs (A/B'd at sf0.1)
      if (i % PrCkEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("vec_id"), col("pr").as("pr_e12"),
        round(col("pr").cast("double") / lit(1e12), 6).as("pagerank"))
      .orderBy(col("vec_id"))
  }

  /** Checkpoint cadence for the linear Pregel-style loops — lineage
    * hygiene only (correctness never depends on it). */
  private[graft] val PrCkEvery = 5

  // ---- graph_label_prop: semi-supervised label propagation ---------------

  /** Synchronous label-propagation rounds — enough for the label
    * frontier to cross the kNN graph's short paths (80% seeds + degree
    * k=5 label ~99% of the unlabeled carve in round 1; rounds 2-3
    * settle votes that round 1's new labels change). */
  private[graft] val LpRounds = 3

  /** graph_label_prop — SEMI-SUPERVISED LABEL PROPAGATION over the
    * corpus kNN graph (Zhu & Ghahramani 2002; the RAK label-spreading
    * family): seed labels from the curated carve (vec_id % 5 ≠ 0 —
    * the classify_* train split), then for `rounds` synchronous
    * iterations every UNLABELED node takes the majority label of its
    * out-neighbors' current labels (ties to the least label); seeds
    * are clamped. The curation use: spread a small set of trusted
    * domain/quality labels over the embedding-similarity structure to
    * pseudo-label the rest of the corpus — the graph counterpart of
    * [[graft.functions.Classify.classifyKnn]] (whose vote is one
    * round of exactly this, against train neighbors only; propagation
    * lets labels flow THROUGH unlabeled regions in later rounds).
    *
    * Determinism: votes are exact integer counts over deterministic
    * edges, argmax = (votes desc, label asc) — all-integer end to
    * end, no floats anywhere. Output (vec_id, label, votes) = the
    * final round's assignment for every unlabeled node that has a
    * labeled neighbor (coverage is monotone across rounds: labels are
    * never removed, so each round's assigned set contains the last).
    *
    * Scale shape: the per-round cost is one equi-join of the edge
    * list (k·n rows) against the current label frame plus a
    * two-level aggregate — the PageRank loop shape exactly, with
    * localCheckpoint pinning each round's frame (the pagerankOn
    * lineage discipline). Rounds are few and fixed; everything
    * shuffles on vec_id. */
  def graphLabelProp(s: SparkSession, d: String, k: Int = KnnK,
                     nlist: Int = IvfNlist, nprobe: Int = IvfNprobe,
                     rounds: Int = LpRounds): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val edges = knnGraph(s, d, k, nlist, nprobe, ordered = false)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    labelPropOn(edges,
      emb.filter(col("vec_id") % 5 =!= 0).select(col("vec_id"), col("label")),
      col("src") % 5 === 0, rounds)
  }

  /** Label propagation over explicit (src, dst) edges: `seeds` =
    * clamped (vec_id, label) rows, `unlabeledSrc` = the predicate
    * selecting edges whose SOURCE is an unlabeled node (votes are
    * only computed for those; every dst may contribute once labeled).
    * Returns the final round's (vec_id, label, votes). */
  def labelPropOn(edges: DataFrame, seeds: DataFrame,
                  unlabeledSrc: Column, rounds: Int): DataFrame = {
    // only unlabeled sources ever vote — filter once, pin the frame
    // (the per-round joins would otherwise re-derive the whole kNN
    // graph each iteration: the pagerankOn lineage rule)
    val e = edges.filter(unlabeledSrc).localCheckpoint()
    val sd = seeds.localCheckpoint() // re-unioned every round
    var labels: DataFrame = sd
    var assigned: DataFrame = null
    // the round chain is linear (each round's frames are consumed
    // once by the next), so the per-round checkpoints were pure
    // barriers — at the fixed 3 rounds the whole propagation now
    // plans as one job (see pagerankOn)
    for (_ <- 1 to rounds) {
      assigned = e
        .join(labels.withColumnRenamed("vec_id", "dst"), Seq("dst"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("votes"))
        // majority with least-label tie-break: min over (-votes, label)
        .groupBy(col("src"))
        .agg(min(struct((-col("votes")).as("nv"), col("label").as("label")))
          .as("m"))
        .select(col("src").as("vec_id"), col("m.label").as("label"),
          (-col("m.nv")).as("votes"))
      labels = sd.unionByName(assigned.select(col("vec_id"), col("label")))
    }
    assigned.orderBy(col("vec_id"))
  }

  /** DuckDB oracle for [[graphLabelProp]]: the knn_graph edge CTEs +
    * the rounds UNROLLED as chained aggregating CTEs (the PageRank
    * recipe — a recursive CTE cannot aggregate over its own
    * reference). Data-dependent (trained centroid literals) →
    * emitted by oracleSqlFor. */
  def graphLabelPropOracleSql(s: SparkSession, d: String, k: Int = KnnK,
                              nlist: Int = IvfNlist,
                              nprobe: Int = IvfNprobe,
                              rounds: Int = LpRounds): String = {
    val roundCtes = (1 to rounds).map { t =>
      s"""a$t AS (
        SELECT vec_id, label, votes FROM (
          SELECT vec_id, label, votes,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY votes DESC, label) AS rn
          FROM (
            SELECT e.src AS vec_id, l.label, count(*) AS votes
            FROM lpedges e JOIN lab${t - 1} l ON l.vec_id = e.dst
            GROUP BY e.src, l.label))
        WHERE rn = 1),
      lab$t AS (
        SELECT vec_id, label FROM seeds
        UNION ALL SELECT vec_id, label FROM a$t)"""
    }.mkString(",\n      ")
    s"""
      WITH ${centsCteSql(ivfCentroids(s, d, nlist))},
      probes AS (
        SELECT vec_id, cid AS bucket FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
          FROM scored) WHERE rn <= $nprobe),
      cand AS (
        SELECT p.vec_id, a.vec_id AS neighbor_id
        FROM assign a JOIN probes p
          ON a.bucket = p.bucket AND a.vec_id <> p.vec_id),
      rer AS (
        SELECT c.vec_id, c.neighbor_id,
          round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                       CAST(ne.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM cand c
        JOIN embeddings qe ON qe.vec_id = c.vec_id
        JOIN embeddings ne ON ne.vec_id = c.neighbor_id),
      lpedges AS (
        SELECT vec_id AS src, neighbor_id AS dst FROM (
          SELECT vec_id, neighbor_id,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM rer)
        WHERE rank <= $k AND vec_id % 5 = 0),
      seeds AS (
        SELECT vec_id, label FROM embeddings WHERE vec_id % 5 <> 0),
      lab0 AS (SELECT vec_id, label FROM seeds),
      $roundCtes
      SELECT vec_id, label, votes FROM a$rounds ORDER BY vec_id"""
  }

  // ---- maintained kNN-graph artifact --------------------------------------

  /** Rewrite granularity of the edges artifact: vec_id % GraphEb
    * hash-bucket directories, dynamically overwritten per append. */
  private[graft] val GraphEb = 64

  /** One (bucket, node, embedding) entry-medoid row per bucket —
    * min vec_id over `assigned` (vec_id, bucket, embedding) rows.
    * Shared by the write/append/forget maintenance of `entries/`. */
  private def entriesOf(assigned: DataFrame): DataFrame =
    assigned
      .join(assigned.groupBy(col("bucket")).agg(min(col("vec_id"))
        .as("vec_id")), Seq("bucket", "vec_id"), "left_semi")
      .select(col("bucket"), col("vec_id").as("node"), col("embedding"))

  /** Swap the (≤ nlist-row) `entries/` file in under the rename
    * discipline every other layout rewrite here uses — a bare
    * overwrite has a window where a concurrent serve lists a
    * half-deleted directory. The previous `.old` generation deletes
    * at the START of the next swap (pinned-reader grace). */
  private def writeEntries(s: SparkSession, dir: String,
                           df: DataFrame): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def p(x: String) = new org.apache.hadoop.fs.Path(x)
    if (fs.exists(p(s"$dir/entries.old")))
      fs.delete(p(s"$dir/entries.old"), true)
    if (fs.exists(p(s"$dir/entries.tmp")))
      fs.delete(p(s"$dir/entries.tmp"), true)
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/entries.tmp")
    if (fs.exists(p(s"$dir/entries")))
      require(fs.rename(p(s"$dir/entries"), p(s"$dir/entries.old")),
        s"could not stage $dir/entries aside")
    require(fs.rename(p(s"$dir/entries.tmp"), p(s"$dir/entries")),
      s"could not swap $dir/entries in")
  }

  /** One-time build of the MAINTAINED kNN-graph artifact at `dir` —
    * the graph family's daily-increment loop (the twelfth maintained
    * artifact, the band/span/chunk/IVF discipline applied to
    * knn_graph):
    *   - `nodes/`  (vec_id, embedding) partitioned by IVF bucket —
    *     the serving-layout shape: an arrival's candidates come from
    *     pruned bucket reads;
    *   - `probes/` (vec_id) partitioned by PROBED bucket — the
    *     REVERSE index: exactly the standing nodes whose top-k an
    *     arrival landing in bucket b can change;
    *   - `edges/`  (vec_id, neighbor_id, cos_sim, rank, n_bucket)
    *     partitioned by `_eb` = vec_id % GraphEb — the
    *     dynamic-overwrite rewrite granularity for affected nodes.
    *     n_bucket = the NEIGHBOR's assigned IVF bucket, carried so
    *     graph-walk serving can prune its vector fetch to the
    *     frontier's bucket partition VALUES (the `_eb` discipline
    *     applied to `nodes/` — without it every walk round re-scans
    *     the whole corpus for ≤ beam·deg vectors, a corpus-linear
    *     cost per served batch);
    *   - `entries/` (bucket, node, embedding) — ONE medoid
    *     (min vec_id) per bucket, ≤ nlist rows, precomputed here so
    *     serving never pays the per-call `nodes/` groupBy scan.
    * Centroids are FIXED across appends (the appendIvfPartitioned
    * contract; drift → retrain-and-rebuild, the IVF loops' verb). */
  def writeKnnGraph(emb: DataFrame, cents: Array[Array[Double]], dir: String,
                    k: Int = KnnK, nprobe: Int = IvfNprobe): Unit = {
    val s = emb.sparkSession
    import s.implicits._
    val assigned = ivfAssign(emb, cents)
    // cluster by the partition key BEFORE partitionBy or every task
    // writes a file into every directory it holds (the r10 lesson)
    assigned.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/nodes")
    writeEntries(s, dir, entriesOf(assigned))
    val bc = s.sparkContext.broadcast(cents)
    emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        topCentroids(bc.value, v, nprobe).iterator.map(b => (id, b)) }
      .toDF("vec_id", "probed").repartition(col("probed"))
      .write.mode("overwrite").partitionBy("probed").parquet(s"$dir/probes")
    knnGraphOn(emb, cents, k, nprobe, ordered = false)
      .join(assigned.select(col("vec_id").as("neighbor_id"),
        col("bucket").as("n_bucket")), Seq("neighbor_id"))
      .withColumn("_eb", (col("vec_id") % GraphEb).cast("int"))
      .repartition(col("_eb"))
      .write.mode("overwrite").partitionBy("_eb").parquet(s"$dir/edges")
  }

  def readKnnGraph(s: SparkSession, dir: String): DataFrame = {
    val edges = s.read.parquet(s"$dir/edges")
      .select(col("vec_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
    knnGraphTombstones(s, dir).fold(edges)(t => edges
        .join(broadcast(t), Seq("vec_id"), "left_anti")
        .join(broadcast(t.withColumnRenamed("vec_id", "neighbor_id")),
          Seq("neighbor_id"), "left_anti")
        .select(col("vec_id"), col("neighbor_id"), col("cos_sim"),
          col("rank")))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** BATCHED erasure for the graph artifact — the tombstone-
    * accumulate form of [[forgetFromKnnGraph]] (which pays three
    * compact-swap layout rewrites PER CALL — 8.1/32.2/59.4s at
    * 1×/10×/20×, §6): ids append to `$dir/_tombstones` (the
    * [[deleteFromLayout]] discipline), every serve/read SUBTRACTS
    * them (readKnnGraph drops rows citing a tombstoned endpoint —
    * survivors' top-k stay stale-short until the fold, the Lucene
    * deleted-docs semantics; graph-walk serving drops tombstoned
    * entries and expansion targets), and the next [[compactKnnGraph]]
    * folds the WHOLE accumulated batch through one forget surgery —
    * amortizing the rewrites over every erasure request in the
    * cycle. Spec'd: fold-at-compact ≡ sequential forgetFromKnnGraph
    * ≡ one-shot graph of the survivors (ErasureSpec). */
  def deleteFromKnnGraph(s: SparkSession, dir: String, ids: DataFrame): Unit =
    ids.select(col("vec_id")).distinct()
      .write.mode("append").parquet(s"$dir/_tombstones")

  /** The graph artifact's pending-erasure log, if any deletes are
    * outstanding — None means no extra plan nodes on any serve. */
  private[graft] def knnGraphTombstones(s: SparkSession,
                                        dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_tombstones")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else Some(s.read.parquet(p.toString).select(col("vec_id")).distinct())
  }

  /** Daily append to the maintained kNN graph — spec'd ≡ the one-shot
    * [[knnGraphOn]] of the union under the same centroids:
    *   1. the BATCH's edges come from pruned reads of the probed
    *      `nodes/` bucket partitions (∪ the batch itself);
    *   2. AFFECTED standing nodes (read pruned from the `probes/`
    *      partitions of the batch's ASSIGNED buckets) merge the new
    *      batch candidates into their stored top-k — exact, because
    *      topk(topk(A) ∪ B) = topk(A ∪ B);
    *   3. only the touched `_eb` edge partitions rewrite (dynamic
    *      overwrite, untouched rows of those partitions CARRIED — the
    *      ccIncrementalStep bucket-loss discipline; no partition can
    *      drain, since appends never shrink a node's top-k).
    * Per-day cost: pruned bucket/probe reads + batch-sized joins +
    * ONE column-pruned `nodes/` scan for the affected embeddings
    * (the strictly-flat alternative — carrying embeddings in
    * `probes/` — costs nprobe× storage; this loop takes the scan). */
  def knnGraphAppendStep(s: SparkSession, dir: String, batch: DataFrame,
                         cents: Array[Array[Double]], k: Int = KnnK,
                         nprobe: Int = IvfNprobe): Unit = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    val batchNodes = ivfAssign(batch, cents).localCheckpoint()
    val batchProbes = batch.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        topCentroids(bc.value, v, nprobe).iterator.map(b => (id, b, v)) }
      .toDF("vec_id", "bucket", "qv").localCheckpoint()
    val probedBuckets = batchProbes.select(col("bucket")).distinct()
      .as[Int].collect().toSeq
    val assignedBuckets = batchNodes.select(col("bucket")).distinct()
      .as[Int].collect().toSeq
    val nodesAll = s.read.parquet(s"$dir/nodes")
    // 1. batch edges: candidates from probed bucket partitions + batch
    val cand = nodesAll.filter(col("bucket").isin(probedBuckets: _*))
      .select(col("vec_id").as("neighbor_id"), col("bucket"),
        col("embedding").as("v"))
      .unionByName(batchNodes.select(col("vec_id").as("neighbor_id"),
        col("bucket"), col("embedding").as("v")))
    // neighbor→assigned-bucket mapping, PRUNED (cand already carries
    // each candidate's assigned bucket — no nodes/ scan)
    val nbCand = cand.select(col("neighbor_id"), col("bucket").as("n_bucket"))
      .distinct()
    val batchEdges = topKPerQuery(
      cand.hint("shuffle_hash").join(batchProbes, Seq("bucket"))
        .filter(col("neighbor_id") =!= col("vec_id"))
        .select(col("vec_id").as("query_id"), col("neighbor_id"),
          round(cos(col("qv"), col("v")), 6).as("cos_sim")), k,
      ordered = false)
      .withColumnRenamed("query_id", "vec_id")
      .join(nbCand, Seq("neighbor_id"))
    // 2. affected standing nodes (exclude replayed batch ids)
    val affProbes = s.read.parquet(s"$dir/probes")
      .filter(col("probed").isin(assignedBuckets: _*))
      .join(batchNodes.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("probed").as("bucket"))
      .localCheckpoint()
    val affIds = affProbes.select(col("vec_id")).distinct()
    val affVecs = nodesAll.select(col("vec_id"), col("embedding"))
      .join(affIds, Seq("vec_id"), "left_semi")
    val newCand = affProbes
      .join(affVecs, Seq("vec_id"))
      .join(batchNodes.select(col("vec_id").as("neighbor_id"),
        col("bucket"), col("embedding").as("v")), Seq("bucket"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        round(cos(col("embedding"), col("v")), 6).as("cos_sim"))
    // touched edge partitions: a bounded ≤ GraphEb-value collect (the
    // probed/assigned-bucket discipline — never collect the id sets)
    val touchedEb = affProbes
      .select((col("vec_id") % GraphEb).cast("int").as("eb"))
      .unionByName(batchNodes
        .select((col("vec_id") % GraphEb).cast("int").as("eb")))
      .distinct().as[Int].collect().toSeq
    val oldPart = s.read.parquet(s"$dir/edges")
      .filter(col("_eb").isin(touchedEb: _*))
    val merged = topKPerQuery(
      oldPart.join(affIds, Seq("vec_id"), "left_semi")
        .select(col("vec_id").as("query_id"), col("neighbor_id"),
          col("cos_sim"))
        .unionByName(newCand.withColumnRenamed("vec_id", "query_id")), k,
      ordered = false)
      .withColumnRenamed("query_id", "vec_id")
    // merged neighbors are old neighbors (bucket on the stored edge
    // rows) or batch nodes — both mappings pruned, no nodes/ scan
    val nbMerge = oldPart.select(col("neighbor_id"), col("n_bucket"))
      .unionByName(batchNodes.select(col("vec_id").as("neighbor_id"),
        col("bucket").as("n_bucket")))
      .distinct()
    val cols = Seq("vec_id", "neighbor_id", "cos_sim", "rank",
      "n_bucket").map(col)
    val out = oldPart.join(affIds, Seq("vec_id"), "left_anti")
      .select(cols: _*)
      .unionByName(merged.join(nbMerge, Seq("neighbor_id"))
        .select(cols: _*))
      .unionByName(batchEdges.select(cols: _*))
      .withColumn("_eb", (col("vec_id") % GraphEb).cast("int"))
      .localCheckpoint() // materialize BEFORE overwriting partitions we read
    out.repartition(col("_eb"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("_eb").parquet(s"$dir/edges")
    // 3. the batch joins the standing layouts
    batchNodes.write.mode("append").partitionBy("bucket")
      .parquet(s"$dir/nodes")
    batchProbes.select(col("vec_id"), col("bucket").as("probed"))
      .write.mode("append").partitionBy("probed").parquet(s"$dir/probes")
    // 4. entry medoids: min(stored, batch min) per bucket — bounded
    // ≤ nlist rows both sides, materialized before the swap
    val entryW = Window.partitionBy(col("bucket")).orderBy(col("node"))
    val newEntries = s.read.parquet(s"$dir/entries")
      .unionByName(entriesOf(batchNodes))
      .withColumn("_rn", row_number().over(entryW))
      .filter(col("_rn") === 1).drop("_rn")
      .localCheckpoint()
    writeEntries(s, dir, newEntries)
  }

  /** Small-file fold for the graph artifact's append-accumulating
    * layouts (`nodes/`, `probes/`) — `edges/` self-compacts (every
    * append REWRITES its touched `_eb` partitions whole). Identity
    * spec'd: the folded artifact reads and appends exactly like the
    * unfolded one. If [[deleteFromKnnGraph]] tombstones are pending,
    * the fold FIRST runs the forget surgery once for the whole
    * accumulated batch (refilling affected survivors) and clears the
    * log — every rewrite of a tombstoned layout must fold its
    * tombstones or a later reader would resurrect the deletes. */
  def compactKnnGraph(s: SparkSession, dir: String,
                      targetBytes: Long = 128L << 20)
      : (graft.sources.Compact.CompactReport,
         graft.sources.Compact.CompactReport) =
    knnGraphTombstones(s, dir) match {
      case Some(ts) =>
        // the fold's own compact-swaps already collapse nodes/ and
        // probes/ — a second identity rewrite would double the very
        // cost the batched-erasure form amortizes
        val reports = forgetFromKnnGraph(s, dir, ts.localCheckpoint())
        val p = new org.apache.hadoop.fs.Path(s"$dir/_tombstones")
        p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
        reports
      case None =>
        (graft.sources.Compact.compactInPlace(s, s"$dir/nodes", targetBytes,
           partitionCols = Seq("bucket")),
         graft.sources.Compact.compactInPlace(s, s"$dir/probes", targetBytes,
           partitionCols = Seq("probed")))
    }

  /** ERASE vectors from the maintained kNN-graph artifact — the graph
    * loop's right-to-be-forgotten verb ([[graft.operators.Dedup
    * .forgetFromClusterIndex]]'s obligation applied to edges: a
    * stored top-k row IS a reference to a vec id, so erasure must
    * both drop the forgotten nodes' own adjacency AND refill every
    * survivor whose top-k cited one):
    *   1. AFFECTED survivors — standing nodes with a stored edge
    *      citing a forgotten neighbor — recompute their top-k FROM
    *      SCRATCH over the surviving `nodes/` layout via their
    *      stored probe buckets (the append's exact merge cannot run
    *      in reverse: the (k+1)-th candidate was never stored, so
    *      removal pays one pruned candidate join per affected node —
    *      the knnGraphAppendStep candidate shape);
    *   2. `edges/` rewrites via the compact swap (forgotten and
    *      affected rows out, refilled rows in — the swap also folds
    *      any small files);
    *   3. `nodes/` and `probes/` drop the forgotten vec_ids
    *      (compact-swap anti-joins), AFTER the refill computed from
    *      them is materialized.
    * Spec'd ≡ the one-shot [[knnGraphOn]] of the surviving corpus
    * under the same centroids (ErasureSpec) — and the enumerating
    * erasure spec asserts no maintained artifact retains a forgotten
    * id.
    *
    * `k ≤ 0` (the default) derives the refill degree from the
    * artifact itself (max stored rank) — the artifact does not record
    * its k, and refilling at a DIFFERENT degree than it was written
    * with would break erasure ≡ one-shot (a pipeline state written at
    * a non-default degree must not depend on every forget caller
    * remembering it). */
  def forgetFromKnnGraph(s: SparkSession, dir: String, ids: DataFrame,
                         k: Int = -1)
      : (graft.sources.Compact.CompactReport,
         graft.sources.Compact.CompactReport) = {
    import s.implicits._
    val forget = ids.select(col("vec_id")).distinct().localCheckpoint()
    val edges = s.read.parquet(s"$dir/edges")
    // max over an empty edges layout (every node already erased)
    // aggregates to NULL — fall back to the default degree so a
    // second erasure wave stays a graceful no-op, not an NPE
    val kk = if (k > 0) k
             else Option(edges.agg(max(col("rank"))).head
               .getAs[Integer](0)).map(_.toInt).getOrElse(KnnK)
    val aff = edges
      .join(broadcast(forget), Seq("vec_id"), "left_anti")
      .join(broadcast(forget.withColumnRenamed("vec_id", "neighbor_id")),
        Seq("neighbor_id"), "left_semi")
      .select(col("vec_id")).distinct().localCheckpoint()
    val nodesSurv = s.read.parquet(s"$dir/nodes")
      .join(broadcast(forget), Seq("vec_id"), "left_anti")
    val affProbes = s.read.parquet(s"$dir/probes")
      .join(aff, Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("probed").as("bucket"))
      .localCheckpoint()
    val probedBuckets = affProbes.select(col("bucket")).distinct()
      .as[Int].collect().toSeq // bounded by nlist, never an id set
    val cand = nodesSurv.filter(col("bucket").isin(probedBuckets: _*))
      .select(col("vec_id").as("neighbor_id"), col("bucket"),
        col("embedding").as("v"))
    val affVecs = nodesSurv.select(col("vec_id"), col("embedding"))
      .join(affProbes.select(col("vec_id")).distinct(),
        Seq("vec_id"), "left_semi")
    val refilled = topKPerQuery(
      affProbes.join(affVecs, Seq("vec_id"))
        .join(cand.hint("shuffle_hash"), Seq("bucket"))
        .filter(col("neighbor_id") =!= col("vec_id"))
        .select(col("vec_id").as("query_id"), col("neighbor_id"),
          round(cos(col("embedding"), col("v")), 6).as("cos_sim")), kk,
      ordered = false)
      .withColumnRenamed("query_id", "vec_id")
      .join(cand.select(col("neighbor_id"), col("bucket").as("n_bucket"))
        .distinct(), Seq("neighbor_id"))
      .withColumn("_eb", (col("vec_id") % GraphEb).cast("int"))
      .select(col("vec_id"), col("neighbor_id"), col("cos_sim"),
        col("rank"), col("n_bucket"), col("_eb"))
      .localCheckpoint() // materialize before the layouts it read swap
    graft.sources.Compact.compactInPlace(s, s"$dir/edges",
      partitionCols = Seq("_eb"),
      transform = df => df
        .join(broadcast(forget), Seq("vec_id"), "left_anti")
        .join(aff, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("neighbor_id"), col("cos_sim"),
          col("rank"), col("n_bucket"), col("_eb"))
        .unionByName(refilled))
    val rn = graft.sources.Compact.compactInPlace(s, s"$dir/nodes",
      partitionCols = Seq("bucket"),
      transform = _.join(broadcast(forget), Seq("vec_id"), "left_anti"))
    val rp = graft.sources.Compact.compactInPlace(s, s"$dir/probes",
      partitionCols = Seq("probed"),
      transform = _.join(broadcast(forget), Seq("vec_id"), "left_anti"))
    // entry medoids: a forgotten node may BE a bucket's medoid —
    // recompute from the swapped (survivor-only) nodes/ layout. The
    // full forget already rewrites every layout, so one more pass
    // over nodes/ costs nothing extra in kind.
    writeEntries(s, dir, entriesOf(s.read.parquet(s"$dir/nodes")))
    (rn, rp)
  }

  // ---- knn_components: mutual-kNN connected components --------------------

  /** knn_components — connected components of the MUTUAL-kNN graph
    * (an undirected edge only where BOTH endpoints list each other in
    * their top-k): the standard density-robust cluster discovery over
    * an embedding corpus (one-directional kNN edges chain through
    * hubs and collapse everything into one blob — the hubness failure
    * knn_hubness measures; mutuality is the classic cure). Component
    * id = min member id; singletons (no mutual edge) map to
    * themselves via the left join.
    *
    * 100 TB shape: the knnGraph edge pass + ONE self equi-join on the
    * reversed key for mutuality + the verified CC machinery
    * (label propagation falling back to O(log²n) star-contraction —
    * connectedComponentsSafe, the dedup_clusters path). */
  def knnComponents(s: SparkSession, d: String, k: Int = KnnK,
                    nlist: Int = IvfNlist, nprobe: Int = IvfNprobe): DataFrame = {
    val e = knnGraph(s, d, k, nlist, nprobe, ordered = false)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .localCheckpoint()
    val mutual = e.as("a").join(e.hint("shuffle_hash").as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
      .select(col("a.src").as("d1"), col("a.dst").as("d2"))
      .filter(col("d1") < col("d2"))
    val labels = Dedup.connectedComponentsSafe(mutual)
    Tables.embeddings(s, d).select(col("vec_id"))
      .join(labels.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("component_id"))
      .orderBy(col("vec_id"))
  }

  /** DuckDB oracle for [[knnComponents]]: the knnGraph chain as the
    * edge subquery, mutuality by the reversed-key self-join,
    * recursive reachability with min-root labels (the ccOracleSql
    * discipline), singletons coalesced. Data-dependent → emitted by
    * oracleSqlFor. */
  def knnComponentsOracleSql(s: SparkSession, d: String, k: Int = KnnK,
                             nlist: Int = IvfNlist,
                             nprobe: Int = IvfNprobe): String = {
    val knnSql = knnGraphOracleSql(s, d, k, nlist, nprobe)
    s"""
      WITH RECURSIVE eall AS (
        SELECT vec_id AS src, neighbor_id AS dst FROM ($knnSql)),
      mut AS (
        SELECT a.src AS u, a.dst AS v
        FROM eall a JOIN eall b ON a.src = b.dst AND a.dst = b.src),
      reach(node, root) AS (
        SELECT u, u FROM mut
        UNION
        SELECT m.v, r.root FROM reach r JOIN mut m ON m.u = r.node),
      comp AS (SELECT node, MIN(root) AS component_id FROM reach GROUP BY 1)
      SELECT e.vec_id, COALESCE(c.component_id, e.vec_id) AS component_id
      FROM embeddings e LEFT JOIN comp c ON c.node = e.vec_id
      ORDER BY e.vec_id"""
  }

  // ---- graph_profile: component-size histogram of the mutual-kNN graph ----

  /** graph_profile — the CLUSTER-SIZE statistics of the mutual-kNN
    * components (dedup_profile's discipline applied to the embedding
    * graph — publish before acting on graph clusters): per component
    * size, how many components and vectors sit there; Σ n_vecs =
    * corpus and the size-1 row counts the antihub singletons. Pure
    * integer arithmetic on top of [[knnComponents]] — two partial-agg
    * shuffles of longs. */
  def graphProfile(s: SparkSession, d: String, k: Int = KnnK,
                   nlist: Int = IvfNlist, nprobe: Int = IvfNprobe): DataFrame =
    knnComponents(s, d, k, nlist, nprobe)
      .groupBy(col("component_id")).agg(count(lit(1)).as("component_size"))
      .groupBy(col("component_size"))
      .agg(count(lit(1)).as("n_components"))
      .select(col("component_size"),
        col("n_components"),
        (col("component_size") * col("n_components")).as("n_vecs"))
      .orderBy(col("component_size"))

  /** DuckDB oracle for [[graphProfile]]: the knnComponents chain +
    * the same two-level histogram. Data-dependent → oracleSqlFor. */
  def graphProfileOracleSql(s: SparkSession, d: String, k: Int = KnnK,
                            nlist: Int = IvfNlist,
                            nprobe: Int = IvfNprobe): String = {
    val compSql = knnComponentsOracleSql(s, d, k, nlist, nprobe)
    s"""
      WITH sizes AS (
        SELECT component_id, CAST(COUNT(*) AS BIGINT) AS component_size
        FROM ($compSql) GROUP BY 1)
      SELECT component_size,
        CAST(COUNT(*) AS BIGINT) AS n_components,
        CAST(component_size * COUNT(*) AS BIGINT) AS n_vecs
      FROM sizes GROUP BY 1 ORDER BY component_size"""
  }

  // ---- knn_hubness: in-degree histogram of the kNN graph ------------------

  /** knn_hubness — the HUBNESS audit of the kNN graph (the in-degree
    * histogram): in high dimensions a few vectors become "hubs" that
    * appear in many neighbor lists while antihubs appear in none —
    * the failure mode that skews kNN-graph dedup/selection and that
    * mine_bitext's margin criterion exists to correct. Per in-degree
    * value, the number of corpus vectors with that in-degree
    * (0-in-degree antihubs included via the left join). Pure integer
    * arithmetic — exact by construction.
    *
    * 100 TB shape: the knnGraph edge pass + one dst-keyed partial-agg
    * shuffle + one histogram agg over node-sized frames. */
  def knnHubness(s: SparkSession, d: String, k: Int = KnnK,
                 nlist: Int = IvfNlist, nprobe: Int = IvfNprobe): DataFrame = {
    val edges = knnGraph(s, d, k, nlist, nprobe, ordered = false)
      .select(col("neighbor_id"))
    val indeg = edges.groupBy(col("neighbor_id")).agg(count(lit(1)).as("deg"))
    Tables.embeddings(s, d).select(col("vec_id"))
      .join(indeg.withColumnRenamed("neighbor_id", "vec_id"), Seq("vec_id"),
        "left")
      .select(coalesce(col("deg"), lit(0L)).as("in_degree"))
      .groupBy(col("in_degree")).agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("in_degree"))
  }

  /** DuckDB oracle for [[knnHubness]]: the knnGraph chain as the edge
    * subquery + the same left-join histogram. Data-dependent →
    * emitted by oracleSqlFor. */
  def knnHubnessOracleSql(s: SparkSession, d: String, k: Int = KnnK,
                          nlist: Int = IvfNlist,
                          nprobe: Int = IvfNprobe): String = {
    val knnSql = knnGraphOracleSql(s, d, k, nlist, nprobe)
    s"""
      WITH edges AS (SELECT neighbor_id FROM ($knnSql)),
      indeg AS (
        SELECT neighbor_id AS vec_id, CAST(COUNT(*) AS BIGINT) AS deg
        FROM edges GROUP BY 1)
      SELECT COALESCE(i.deg, 0) AS in_degree, COUNT(*) AS n_vecs
      FROM embeddings e LEFT JOIN indeg i USING (vec_id)
      GROUP BY 1 ORDER BY in_degree"""
  }

  // ---- emb_pca: embedding-space variance report ---------------------------

  private val pcaCache =
    scala.collection.concurrent.TrieMap.empty[(String, String),
      (Array[Array[Double]], Array[Double])]

  /** Deterministic PCA basis for the corpus embedding space: sample =
    * the first 2048 vectors by id (the [[ivfCentroids]] discipline —
    * O(1) at any corpus size, shared bit-identically by the query and
    * its oracle via literals), mean-centered covariance on the
    * driver, cyclic Jacobi eigen-decomposition, components sorted by
    * eigenvalue descending and sign-normalized (largest-|coordinate|
    * positive). Returns (components, offsets) with offsets(c) =
    * ⟨sample mean, e_c⟩ so a projection is one dot minus a scalar. */
  private[graft] def pcaBasis(s: SparkSession, d: String)
      : (Array[Array[Double]], Array[Double]) = {
    val key = (d, dataFingerprint(s, d))
    pcaCache.getOrElseUpdate(key, {
      pcaCache.keySet.filter(k => k._1 == d && k != key)
        .foreach(pcaCache.remove)
      import s.implicits._
      val sample = Tables.embeddings(s, d).orderBy("vec_id").limit(2048)
        .select("embedding").as[Array[Float]].collect()
      pcaBasisOfSample(sample)
    })
  }

  /** The PCA basis computation on a given bounded sample — the pure
    * core of [[pcaBasis]], reused by the whitened tier's retrain
    * (which samples the layout's CURRENT contents, not the original
    * corpus). */
  private def pcaBasisOfSample(sample: Array[Array[Float]])
      : (Array[Array[Double]], Array[Double]) = {
      val n = sample.length
      val dim = sample.head.length
      val mean = new Array[Double](dim)
      sample.foreach { v =>
        var j = 0; while (j < dim) { mean(j) += v(j); j += 1 } }
      var j = 0; while (j < dim) { mean(j) /= n; j += 1 }
      val cov = Array.ofDim[Double](dim, dim)
      sample.foreach { v =>
        var i = 0
        while (i < dim) {
          val ci = v(i) - mean(i)
          var k = i
          while (k < dim) { cov(i)(k) += ci * (v(k) - mean(k)); k += 1 }
          i += 1
        }
      }
      var i = 0
      while (i < dim) {
        var k = i
        while (k < dim) {
          cov(i)(k) /= n; cov(k)(i) = cov(i)(k); k += 1 }
        i += 1
      }
      val (vals, vecs) = jacobiEigen(cov)
      val order = vals.indices.sortBy(c => (-vals(c), c))
      val comps = order.map { c =>
        val e = Array.tabulate(dim)(r => vecs(r)(c))
        val m = e.indices.maxBy(r => (math.abs(e(r)), -r))
        if (e(m) < 0) e.map(x => -x) else e
      }.toArray
      val offs = comps.map { e =>
        var dot = 0.0; var r = 0
        while (r < dim) { dot += mean(r) * e(r); r += 1 }
        dot
      }
      (comps, offs)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvector COLUMNS). Fixed sweep order → deterministic. */
  private def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone)
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0; var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 100 && off() > 1e-18) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1))
            }
            val c = 1.0 / math.sqrt(t * t + 1)
            val sN = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sN * akq
              a(k)(q) = sN * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sN * aqk
              a(q)(k) = sN * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sN * vkq
              v(k)(q) = sN * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** emb_pca — the embedding-space VARIANCE report (the scree table
    * published before committing compression tiers at 100 TB: how
    * many prefix/PCA dimensions hold the variance decides the
    * ann_prefix dims knob, SQ8/PQ budget splits, and whitening; on
    * this deliberately ISOTROPIC corpus the scree is near-flat —
    * exactly what the report should show). Per PCA component: the
    * corpus-wide projection mean/variance and the cumulative
    * explained-variance fraction.
    *
    * Determinism: the basis is trained ONCE on the driver from the
    * bounded id-ordered sample (bit-identical literals to the
    * oracle); the projection NEVER accumulates floats — each
    * per-term product e_j·v_j (one IEEE multiply on identical input
    * bits) snaps to the 1e-9 grid as a BIGINT and the dot is an
    * exact integer SUM (a raw float dot rounded after accumulation
    * was r12's one red row: accumulation order is
    * engine/version-dependent, and a single ulp flip at a 6-dp
    * boundary shifts the exact moments); pe6 = one floor-division
    * off the integer chain; moments are exact integer/decimal
    * aggregates (Spark DECIMAL(38,0), DuckDB HUGEINT — both exact,
    * so identical doubles after ONE division); the cumulative
    * fraction ratios exact 1e-9-unit BIGINTs.
    *
    * 100 TB shape: ONE linear projection pass (dim² flops/row, no
    * shuffle of vectors) into a dim-sized partial agg; the 64-row
    * result frame takes the blessed unpartitioned window. */
  def embPca(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val (comps, offs) = pcaBasis(s, d)
    val offE9 = offs.map(o => math.floor(o * 1e9 + 0.5).toLong)
    val bcC = s.sparkContext.broadcast(comps)
    val bcO = s.sparkContext.broadcast(offE9)
    val proj = graft.Util.fanOutIfAtLeast(
        Tables.embeddings(s, d).select(col("embedding")).as[Array[Float]],
        graft.Util.FanOutMinRows)
      .flatMap { v =>
        val cs = bcC.value; val os = bcO.value
        Iterator.tabulate(cs.length) { c =>
          val e = cs(c); var de9 = 0L; var j = 0
          while (j < v.length) {
            de9 += math.floor(e(j) * v(j) * 1e9 + 0.5).toLong; j += 1
          }
          de9 -= os(c)
          (c, math.floor((de9 + 500L).toDouble / 1000.0).toLong)
        }
      }.toDF("component", "pe6")
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 0))
    val m = proj.groupBy(col("component")).agg(
      count(lit(1)).as("n"),
      sum(col("pe6")).as("sp"),
      sum(dec(col("pe6")) * dec(col("pe6"))).as("sp2"))
    val num = dec(m("n")) * m("sp2") - dec(m("sp")) * dec(m("sp"))
    val stats = m.select(col("component"), col("n"),
      round(col("sp").cast("double") /
        (col("n").cast("double") * lit(1e6)), 6).as("mean_p"),
      round(num.cast("double") /
        (col("n").cast("double") * col("n") * lit(1e12)), 6).as("var_p"))
    val w = Window.orderBy(col("component"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("component"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    stats
      .withColumn("ve9", floor(col("var_p") * lit(1e9) + lit(0.5)))
      .withColumn("cum_frac", round(sum(col("ve9")).over(w).cast("double") /
        sum(col("ve9")).over(wAll).cast("double"), 6))
      .select(col("component"), col("n"), col("mean_p"), col("var_p"),
        col("cum_frac"))
      .orderBy(col("component"))
  }

  /** PCA-WHITENING transform over the corpus embeddings:
    * x → diag(1/√(λ_c + ε)) · Eᵀ(x − μ) — the standard retrieval
    * post-processing (whitening undoes anisotropy so cosine treats
    * every direction equally; on THIS isotropic corpus it is nearly
    * the identity rotation — exactly what the spec asserts via the
    * near-1 scales). Eigenvalues are the sample variances along the
    * [[pcaBasis]] components (same bounded driver sample, so the
    * transform is deterministic and broadcastable); the corpus pass
    * is ONE typed map, dim² flops per row, no shuffle. Returns
    * (vec_id, whitened: Array[Double]). */
  def whitenEmbeddings(s: SparkSession, d: String,
                       eps: Double = 1e-6): DataFrame = {
    import s.implicits._
    val (comps, offs) = pcaBasis(s, d)
    val (_, _, scales) = whitenParams(s, d, eps)
    val bcC = s.sparkContext.broadcast(comps)
    val bcO = s.sparkContext.broadcast(offs)
    val bcS = s.sparkContext.broadcast(scales)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val cs = bcC.value; val os = bcO.value; val sc = bcS.value
        val out = new Array[Double](cs.length)
        var c = 0
        while (c < cs.length) {
          val e = cs(c); var dot = 0.0; var j = 0
          while (j < v.length) { dot += e(j) * v(j); j += 1 }
          out(c) = (dot - os(c)) * sc(c)
          c += 1
        }
        (id, out)
      }
      .toDF("vec_id", "whitened")
  }

  // ---- whitened ANN serving tier (ann_ivf_white) ---------------------------

  private val whitenParamCache =
    scala.collection.concurrent.TrieMap.empty[(String, Double, String),
      (Array[Array[Double]], Array[Long], Array[Double])]

  /** The whitening transform in EXACT travel form — what the query
    * and its oracle share bit-identically: per component the basis
    * row e_c (Double.toString round-trip literals), the projection
    * offset snapped to a 1e-9-unit BIGINT, and the whitening scale
    * 1/√(λ_c + ε) as one double literal. Same bounded driver sample
    * as [[pcaBasis]]. */
  private[graft] def whitenParams(s: SparkSession, d: String,
                                  eps: Double = 1e-6)
      : (Array[Array[Double]], Array[Long], Array[Double]) = {
    val key = (d, eps, dataFingerprint(s, d))
    whitenParamCache.getOrElseUpdate(key, {
      whitenParamCache.keySet.filter(k => k._1 == d && k._2 == eps && k != key)
        .foreach(whitenParamCache.remove)
      import s.implicits._
      val sample = Tables.embeddings(s, d).orderBy("vec_id").limit(2048)
        .select("embedding").as[Array[Float]].collect()
      whitenParamsOfSample(sample, eps)
    })
  }

  /** [[whitenParams]] on a given bounded sample — the pure core the
    * retrain loop uses (it samples the layout's CURRENT live rows,
    * not the original corpus). */
  private def whitenParamsOfSample(sample: Array[Array[Float]],
                                   eps: Double = 1e-6)
      : (Array[Array[Double]], Array[Long], Array[Double]) = {
    val (comps, offs) = pcaBasisOfSample(sample)
    val scales = comps.zip(offs).map { case (e, off) =>
      var ss = 0.0
      sample.foreach { v =>
        var dot = 0.0; var j = 0
        while (j < v.length) { dot += e(j) * v(j); j += 1 }
        val p = dot - off
        ss += p * p
      }
      1.0 / math.sqrt(ss / sample.length + eps)
    }
    (comps, offs.map(o => math.floor(o * 1e9 + 0.5).toLong), scales)
  }

  /** Exact whitened code of one embedding: per component the
    * projection follows [[embPca]]'s integer chain (per-term 1e-9
    * snap → exact BIGINT sum → offset subtraction), then ONE
    * multiply by the scale literal and ONE floor-division land the
    * whitened coordinate on the 1e-6 grid as a BIGINT. Every step is
    * a fixed scalar IEEE op on identical inputs — bit-identical
    * cross-engine, no accumulated float anywhere. */
  private def whitenCode6(v: Array[Float], comps: Array[Array[Double]],
                          offE9: Array[Long], scales: Array[Double])
      : Array[Long] = {
    val out = new Array[Long](comps.length)
    var c = 0
    while (c < comps.length) {
      val e = comps(c); var de9 = 0L; var j = 0
      while (j < v.length) {
        de9 += math.floor(e(j) * v(j) * 1e9 + 0.5).toLong; j += 1
      }
      de9 -= offE9(c)
      out(c) = math.floor(de9.toDouble * scales(c) / 1000.0 + 0.5).toLong
      c += 1
    }
    out
  }

  private val whiteCentCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, String),
      Array[Array[Long]]]

  /** Whitened-space coarse quantizer: spherical k-means retrained on
    * the whitened sample codes (|w6| < 2²⁴ so the Float cast into the
    * shared trainer is lossless), each unit centroid then snapped to
    * 1e-9-unit BIGINTs — so bucket assignment and probe selection
    * are EXACT integer argmaxes in both engines (the float-IVF
    * oracles tolerate list_inner_product assignment structurally;
    * this tier removes even that sensitivity). */
  private[graft] def whiteCentroidsE9(s: SparkSession, d: String,
                                      nlist: Int = IvfNlist)
      : Array[Array[Long]] = {
    val key = (d, nlist, dataFingerprint(s, d))
    whiteCentCache.getOrElseUpdate(key, {
      whiteCentCache.keySet
        .filter(k => k._1 == d && k._2 == nlist && k != key)
        .foreach(whiteCentCache.remove)
      import s.implicits._
      val (comps, offE9, scales) = whitenParams(s, d)
      val sample = Tables.embeddings(s, d).orderBy("vec_id").limit(2048)
        .select("embedding").as[Array[Float]].collect()
      whiteCentroidsOfSample(sample, comps, offE9, scales, nlist)
    })
  }

  private def whiteCentroidsOfSample(sample: Array[Array[Float]],
                                     comps: Array[Array[Double]],
                                     offE9: Array[Long],
                                     scales: Array[Double],
                                     nlist: Int): Array[Array[Long]] = {
    val wsample = sample.map(v =>
      whitenCode6(v, comps, offE9, scales).map(_.toFloat))
    trainCentroids(wsample, nlist, iters = 10)
      .map(_.map(x => math.floor(x * 1e9 + 0.5).toLong))
  }

  /** Train the whole whitening + quantizer bundle from one bounded
    * sample — what [[retrainIvfWhitePartitioned]] runs against the
    * layout's current live rows. */
  def whitenModelOfSample(sample: Array[Array[Float]],
                          nlist: Int = IvfNlist,
                          eps: Double = 1e-6): WhitenModel = {
    val (c, o, sc) = whitenParamsOfSample(sample, eps)
    WhitenModel(c, o, sc, whiteCentroidsOfSample(sample, c, o, sc, nlist))
  }

  private def whiteDot(ce9: Array[Long], w6: Array[Long]): Long = {
    var acc = 0L; var j = 0
    while (j < w6.length) { acc += ce9(j) * w6(j); j += 1 }
    acc
  }

  /** (whitened code, squared norm) of one embedding — object-level so
    * executor closures call it through MODULE$ instead of lifting a
    * local def (which captures the non-serializable object). */
  private def whiteCodeNorm(v: Array[Float], comps: Array[Array[Double]],
                            offE9: Array[Long], scales: Array[Double])
      : (Array[Long], Long) = {
    val w = whitenCode6(v, comps, offE9, scales)
    var n2 = 0L; var j = 0
    while (j < w.length) { n2 += w(j) * w(j); j += 1 }
    (w, n2)
  }

  /** Exact-integer nearest whitened centroid (argmax dot, first-wins
    * tie-break = smallest cid — the oracle's ORDER BY dot DESC, wc). */
  private def nearestWhiteCentroid(cents: Array[Array[Long]],
                                   w: Array[Long]): Int = {
    var best = 0; var bestDot = Long.MinValue; var i = 0
    while (i < cents.length) {
      val dd = whiteDot(cents(i), w)
      if (dd > bestDot) { bestDot = dd; best = i }
      i += 1
    }
    best
  }

  /** Probe order in whitened space: exact integer dot, descending,
    * cid tie-break — mirrors the oracle's ORDER BY dot DESC, cid. */
  private def topWhiteCentroids(cents: Array[Array[Long]], w: Array[Long],
                                nprobe: Int): Seq[Int] =
    cents.indices.map(i => (i, whiteDot(cents(i), w)))
      .sortBy(t => (-t._2, t._1)).take(nprobe).map(_._1)


  /** Score whitened candidate pairs and cut the top-k: the exact
    * integer dot over (qw, w) codes, cos_e6 = floor(S/(√Q·√X)·1e6+½)
    * — shared by the in-query tier, the stored-layout serve, and the
    * brute-force ground truth (one chain, zero drift between them).
    * `cand` needs (query_id, neighbor_id, qw, w, qn2, xn2). The dot
    * runs in a typed map (one primitive loop per pair) — the
    * aggregate(zip_with(...)) HOF it replaced is CodegenFallback and
    * its per-candidate interpretation cost was the whitened serving
    * channel's whole 10×-corpus slowdown gap vs raw IVF (1.65× vs
    * 0.98× in StreamScale); every value is integer arithmetic plus
    * one fixed scalar IEEE chain, so results are bit-identical. */
  private def whiteTopK(cand: DataFrame, k: Int): DataFrame = {
    val s = cand.sparkSession
    import s.implicits._
    val scored = cand
      .filter(col("xn2") > 0 && col("qn2") > 0)
      .select(col("query_id"), col("neighbor_id"), col("qw"), col("w"),
        col("qn2"), col("xn2"))
      .as[(Long, Long, Array[Long], Array[Long], Long, Long)]
      .map { case (qid, nid, qw, w, qn2, xn2) =>
        var acc = 0L; var j = 0
        while (j < w.length) { acc += qw(j) * w(j); j += 1 }
        (qid, nid, math.floor(acc.toDouble /
          (math.sqrt(qn2.toDouble) * math.sqrt(xn2.toDouble))
          * 1e6 + 0.5))
      }.toDF("query_id", "neighbor_id", "cos_sim")
    topKPerQuery(scored, k)
      .select(col("query_id"), col("neighbor_id"),
        col("cos_sim").cast("long").as("cos_e6"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Default probe width for the WHITENED tier: wider than the raw
    * IvfNprobe=16 because whitening equalizes per-axis variance —
    * the space becomes MORE isotropic than the raw one, so bucket
    * membership correlates less with the true top-k and each probe
    * buys less recall (the FilteredNprobe situation from a different
    * cause). Measured knee at sf0.1 vs whitened brute force
    * (§6 white_sweep): nprobe 12/16/20/24 → 0.84/0.84/0.88/0.94 —
    * 16 sat 0.04 above the RecallSpec floor (one data drift from
    * red, the exact margin rule the raw tier's default was chosen
    * by); 24 restores the raw tier's 0.14 margin. */
  private[graft] val WhiteNprobe = 24

  /** ann_ivf_white — IVF ANN served over WHITENED vectors: the
    * production retrieval post-processing ([[whitenEmbeddings]])
    * finally composed with the serving shape. Whitening rescales
    * every principal axis to unit variance, so cosine stops
    * over-weighting high-variance directions — neighbors genuinely
    * DIFFER from the raw-cosine tiers (on this deliberately
    * isotropic corpus only mildly; on real anisotropic embeddings
    * this is the difference between retrieving by dominant-axis
    * noise and retrieving by meaning). Recall is therefore measured
    * against WHITENED brute force ([[annWhiteBruteforce]]), never
    * the raw ground truth.
    *
    * Determinism (the strongest recipe in the ANN family): whitened
    * codes are exact 1e-6-unit BIGINTs ([[whitenCode6]]); bucket
    * assignment/probing rank an exact integer dot (snapped 1e-9
    * centroids × integer codes); the serving score is an exact
    * integer dot and two exact integer norms combined by fixed
    * scalar IEEE ops (÷, √, ×1e6, floor) into `cos_e6` — every
    * value in the result is either an exact integer or one
    * deterministic function of exact integers. No accumulated
    * float exists anywhere in the chain.
    *
    * 100 TB shape: identical to [[annIvf]] — one coding pass
    * (dim² flops/row), bucket-pruned candidates, broadcast probes,
    * bounded TopK. The stored-layout form is the same
    * writeIvfPartitioned discipline over the coded frame. */
  def annIvfWhite(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
                  nlist: Int = IvfNlist, nprobe: Int = WhiteNprobe): DataFrame = {
    import s.implicits._
    val (comps, offE9, scales) = whitenParams(s, d)
    val cents = whiteCentroidsE9(s, d, nlist)
    val bc = s.sparkContext.broadcast((comps, offE9, scales, cents))
    val emb = Tables.embeddings(s, d)
    // dim² per-row coding fans out (the r10 single-row-group rule)
    val coded = graft.Util.fanOutIfAtLeast(
        emb.select(col("vec_id"), col("embedding"))
          .as[(Long, Array[Float])])
      .map { case (id, v) =>
        val (cs, os, sc, ce) = bc.value
        val (w, n2) = whiteCodeNorm(v, cs, os, sc)
        (id, nearestWhiteCentroid(ce, w), w, n2)
      }.toDF("neighbor_id", "bucket", "w", "xn2")
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val (cs, os, sc, ce) = bc.value
        val (w, n2) = whiteCodeNorm(v, cs, os, sc)
        topWhiteCentroids(ce, w, nprobe).iterator.map(b => (id, b, w, n2))
      }.toDF("query_id", "bucket", "qw", "qn2")
    whiteTopK(coded.join(broadcast(probes), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id")), k)
  }

  /** The whitening + whitened-quantizer bundle a serving node ships
    * (all exact-travel literals; one training per corpus). */
  case class WhitenModel(comps: Array[Array[Double]], offE9: Array[Long],
                         scales: Array[Double], centsE9: Array[Array[Long]])

  def whitenModel(s: SparkSession, d: String,
                  nlist: Int = IvfNlist): WhitenModel = {
    val (c, o, sc) = whitenParams(s, d)
    WhitenModel(c, o, sc, whiteCentroidsE9(s, d, nlist))
  }

  /** Write the whitened STORED serving layout: exact integer codes
    * (vec_id, w, n2) partitioned by the whitened-space bucket — the
    * writeIvfPartitioned discipline over [[whitenCode6]] codes. The
    * raw embeddings never ship: every serve scores on the codes
    * alone. The layout is vec_id-keyed and bucket-partitioned, so the
    * standard layout verbs work unchanged ([[deleteFromLayout]]
    * tombstones, [[compactIvfPartitioned]] folds them). */
  def writeIvfWhitePartitioned(s: SparkSession, d: String, dir: String,
                               nlist: Int = IvfNlist): Unit =
    writeIvfWhitePartitionedOn(Tables.embeddings(s, d),
      whitenModel(s, d, nlist), dir)

  /** [[writeIvfWhitePartitioned]] over an arbitrary embeddings frame
    * with a pre-trained model — the retrain loop's rewrite form. The
    * dim² coding pass fans out (single-row-group inputs otherwise
    * code the whole corpus in one task — the r10 rule). */
  def writeIvfWhitePartitionedOn(emb: DataFrame, m: WhitenModel,
                                 dir: String): Unit = {
    val s = emb.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(m)
    graft.Util.fanOutIfAtLeast(
        emb.select(col("vec_id"), col("embedding"))
          .as[(Long, Array[Float])])
      .map { case (id, v) =>
        val mm = bc.value
        val (w, n2) = whiteCodeNorm(v, mm.comps, mm.offE9, mm.scales)
        (id, w, n2, nearestWhiteCentroid(mm.centsE9, w))
      }.toDF("vec_id", "w", "n2", "bucket")
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
  }

  /** Append a batch of arriving vectors to the standing whitened
    * layout — codes under the SAME standing model (the
    * appendIvfPartitioned contract: geometry is fixed between
    * retrains; drift → [[whiteDrifted]] → [[retrainIvfWhitePartitioned]]). */
  def appendIvfWhitePartitioned(batch: DataFrame, m: WhitenModel,
                                dir: String): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(m)
    batch.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val mm = bc.value
        val (w, n2) = whiteCodeNorm(v, mm.comps, mm.offE9, mm.scales)
        (id, w, n2, nearestWhiteCentroid(mm.centsE9, w))
      }.toDF("vec_id", "w", "n2", "bucket")
      .write.mode("append").partitionBy("bucket").parquet(dir)
  }

  /** Serve a query batch over the stored whitened layout: queries
    * whiten + probe map-side, the scan reads ONLY the probed bucket
    * directories, scoring is [[annIvfWhite]]'s exact integer chain.
    * Serving contract mirrors [[annIvfServeBatch]]: query ids are an
    * independent id space (excludeSelf opt-in), tombstones
    * subtracted. `queries` must have (query_id, embedding). */
  def annIvfWhiteServeBatch(s: SparkSession, dir: String, m: WhitenModel,
                            queries: DataFrame, k: Int = 5,
                            nprobe: Int = WhiteNprobe,
                            excludeSelf: Boolean = false): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(m)
    val probes = queries.select(col("query_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val mm = bc.value
        val (w, n2) = whiteCodeNorm(v, mm.comps, mm.offE9, mm.scales)
        topWhiteCentroids(mm.centsE9, w, nprobe).iterator
          .map(b => (id, b, w, n2))
      }.toDF("query_id", "bucket", "qw", "qn2")
    val probedBuckets = probes.select("bucket").distinct()
      .as[Int].collect().sorted // bounded by nlist — driver-safe
    val corpus = minusTombstones(s, dir, s.read.parquet(dir)
      .filter(col("bucket").isin(probedBuckets.map(Integer.valueOf): _*)))
      .select(col("vec_id").as("neighbor_id"), col("w"),
        col("n2").as("xn2"), col("bucket"))
    val cand0 = corpus.join(broadcast(probes), Seq("bucket"))
    val cand = if (excludeSelf) cand0.filter(col("neighbor_id") =!= col("query_id"))
               else cand0
    whiteTopK(cand, k)
  }

  /** Monitoring snapshot of the whitened serving layout — the
    * staleness signal the whitened tier lacked (IVF and IVF-PQ have
    * had drift monitors + retrain loops since r11/r12; this tier's
    * basis was trained once with nothing alerting when embedding
    * drift degrades it): corpus size, bucket-occupancy skew (the IVF
    * signal), and the MAX per-component variance of the stored
    * whitened coordinates. Whitening scales every component to unit
    * variance AT TRAINING TIME (the scree is exact), so a healthy
    * layout sits at maxCompVar ≈ 1; arrivals whose geometry outgrew
    * the basis inflate the affected components' variance — the
    * whitening-specific drift axis, computable from the CODES alone
    * (no raw-embedding scan). Two bounded passes: the bucket-count
    * aggregate and a shuffle-free mapPartitions moment scan. */
  case class WhiteLayoutStats(nVectors: Long, nBuckets: Int,
                              occSkew: Double, maxCompVar: Double)

  def whiteLayoutStats(s: SparkSession, dir: String,
                       nlist: Int = IvfNlist): WhiteLayoutStats = {
    import s.implicits._
    val occ = s.read.parquet(dir).groupBy(col("bucket")).count().collect()
    if (occ.isEmpty) return WhiteLayoutStats(0L, 0, 0.0, 0.0) // drained
    val n = occ.map(_.getAs[Long]("count")).sum
    val maxOcc = occ.map(_.getAs[Long]("count")).max.toDouble
    val partials = s.read.parquet(dir).select(col("w"))
      .as[Array[Long]]
      .mapPartitions { it =>
        var cnt = 0L
        var sum: Array[Double] = null
        var sq: Array[Double] = null
        it.foreach { w =>
          if (sum == null) {
            sum = new Array[Double](w.length); sq = new Array[Double](w.length)
          }
          var j = 0
          while (j < w.length) {
            val x = w(j) / 1e6
            sum(j) += x; sq(j) += x * x; j += 1
          }
          cnt += 1
        }
        if (cnt == 0) Iterator.empty
        else Iterator.single((cnt, sum, sq))
      }.collect()
    val dim = partials.head._2.length
    val tot = partials.map(_._1).sum.toDouble
    val maxVar = (0 until dim).map { j =>
      val sm = partials.map(_._2(j)).sum
      val s2 = partials.map(_._3(j)).sum
      s2 / tot - (sm / tot) * (sm / tot)
    }.max
    WhiteLayoutStats(n, occ.length, maxOcc / (n.toDouble / nlist), maxVar)
  }

  /** The whitened tier's retrain decision — drift RELATIVE to the
    * write-time snapshot (the [[ivfDrifted]] discipline): occupancy
    * skew past `skewTol`× the baseline, or the max whitened-component
    * variance past `varTol`× (a basis that still whitens holds every
    * component near 1; a drift wave inflates its components ∝ the
    * squared scale factor, so the signal is loud). */
  def whiteDrifted(current: WhiteLayoutStats, baseline: WhiteLayoutStats,
                   skewTol: Double = 1.5, varTol: Double = 1.5): Boolean =
    current.occSkew > baseline.occSkew * skewTol ||
      current.maxCompVar > baseline.maxCompVar * varTol

  /** Retrain-and-migrate for the whitened layout: re-derive the PCA
    * basis, whitening scales AND whitened-space quantizer from a
    * bounded sample of the layout's CURRENT live rows (full precision
    * from `emb` — the codes store only 1e-6-grid integers), re-code
    * every stored vector, and swap the rewritten layout in under the
    * same path (the [[retrainIvfPartitioned]] rename discipline, one
    * `.old` grace generation). Tombstones fold: training and the
    * rewrite read live rows only. Returns the new [[WhitenModel]] —
    * serving must switch to it atomically with the layout (basis,
    * scales and centroids jointly define the geometry). */
  def retrainIvfWhitePartitioned(s: SparkSession, dir: String,
                                 emb: DataFrame,
                                 nlist: Int = IvfNlist): WhitenModel = {
    import s.implicits._
    val full = emb.select(col("vec_id"), col("embedding"))
      .join(minusTombstones(s, dir,
        s.read.parquet(dir).select(col("vec_id"))), Seq("vec_id"))
    val sample = full.orderBy("vec_id").limit(2048)
      .select("embedding").as[Array[Float]].collect()
    val m = whitenModelOfSample(sample, nlist)
    swapInRetrained(s, dir)(writeIvfWhitePartitionedOn(full, m, _))
    m
  }

  /** Whitened brute force — the ground truth [[annIvfWhite]]'s recall
    * is measured against (RecallSpec): the identical exact scoring
    * chain with the bucket restriction removed. */
  def annWhiteBruteforce(s: SparkSession, d: String, nQueries: Int = 10,
                         k: Int = 5): DataFrame = {
    import s.implicits._
    val (comps, offE9, scales) = whitenParams(s, d)
    val bc = s.sparkContext.broadcast((comps, offE9, scales))
    val emb = Tables.embeddings(s, d)
    // dim² per-row coding fans out (the r10 single-row-group rule)
    val corpus = graft.Util.fanOutIfAtLeast(
        emb.select(col("vec_id"), col("embedding"))
          .as[(Long, Array[Float])])
      .map { case (id, v) =>
        val (cs, os, sc) = bc.value
        val (w, n2) = whiteCodeNorm(v, cs, os, sc)
        (id, w, n2)
      }.toDF("neighbor_id", "w", "xn2")
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val (cs, os, sc) = bc.value
        val (w, n2) = whiteCodeNorm(v, cs, os, sc)
        (id, w, n2)
      }.toDF("query_id", "qw", "qn2")
    whiteTopK(corpus.join(broadcast(queries),
      col("neighbor_id") =!= col("query_id")), k)
  }

  /** DuckDB oracle for [[annIvfWhite]]: the whitening parameters and
    * snapped centroids as literals, the identical integer chain —
    * per-component exact projection, w6 codes, integer-argmax
    * assignment/probes, integer dot + norms, the same
    * floor(S/(√Q·√X)·1e6 + ½) score. Data-dependent → emitted by
    * oracleSqlFor. */
  def annIvfWhiteOracleSql(s: SparkSession, d: String, nQueries: Int = 10,
                           k: Int = 5, nlist: Int = IvfNlist,
                           nprobe: Int = WhiteNprobe): String = {
    val (comps, offE9, scales) = whitenParams(s, d)
    val dim = comps.head.length
    val compRows = comps.indices.map { c =>
      s"($c, [${comps(c).map(_.toString).mkString(", ")}]::DOUBLE[], " +
        s"${offE9(c)}, ${scales(c).toString})"
    }.mkString(",\n        ")
    val centRows = whiteCentroidsE9(s, d, nlist).zipWithIndex.map {
      case (ce9, i) => s"($i, [${ce9.mkString(", ")}]::BIGINT[])"
    }.mkString(",\n        ")
    s"""
      WITH comps(cid, e, offe9, scale) AS (VALUES
        $compRows),
      wcents(wc, ce9) AS (VALUES
        $centRows),
      white AS (
        SELECT vec_id, list(w6 ORDER BY cid) AS w
        FROM (
          SELECT emb.vec_id, c.cid,
            CAST(floor((CAST(list_sum(list_transform(range(1, $dim + 1),
                i -> CAST(floor(c.e[i] * CAST(emb.embedding[i] AS DOUBLE)
                                * 1e9 + 0.5) AS BIGINT))) AS BIGINT)
              - c.offe9) * c.scale / 1000.0 + 0.5) AS BIGINT) AS w6
          FROM embeddings emb CROSS JOIN comps c)
        GROUP BY 1),
      coded AS (
        SELECT vec_id, w,
          CAST(list_sum(list_transform(w, x -> x * x)) AS BIGINT) AS n2
        FROM white),
      cdot AS (
        SELECT v.vec_id, wc.wc,
          CAST(list_sum(list_transform(range(1, $dim + 1),
            i -> wc.ce9[i] * v.w[i])) AS BIGINT) AS dot
        FROM coded v CROSS JOIN wcents wc),
      assign AS (
        SELECT vec_id, wc AS bucket FROM (
          SELECT vec_id, wc,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY dot DESC, wc) AS rn
          FROM cdot) WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, wc AS bucket FROM (
          SELECT vec_id, wc,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY dot DESC, wc) AS rn
          FROM cdot WHERE vec_id < $nQueries) WHERE rn <= $nprobe),
      rer AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
          CAST(floor(CAST(list_sum(list_transform(range(1, $dim + 1),
                i -> q.w[i] * x.w[i])) AS DOUBLE)
            / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(x.n2 AS DOUBLE)))
            * 1e6 + 0.5) AS BIGINT) AS cos_e6
        FROM probes p
        JOIN assign a ON a.bucket = p.bucket AND a.vec_id <> p.query_id
        JOIN coded q ON q.vec_id = p.query_id
        JOIN coded x ON x.vec_id = a.vec_id
        WHERE q.n2 > 0 AND x.n2 > 0)
      SELECT query_id, neighbor_id, cos_e6, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_e6 DESC, neighbor_id) AS INT) AS rank
        FROM rer)
      WHERE rank <= $k ORDER BY query_id, rank"""
  }

  // ---- graph-walk ANN (ann_graph_walk) ------------------------------------

  /** Graph-walk defaults. Degree 8 (the stored edge out-degree the
    * walk navigates — denser than KnnK=5 because navigability, not
    * the answer set, is what the edges buy); beam 32; depth 3 —
    * measured on the isotropic corpus (§6 walk sweep). */
  private[graft] val GraphWalkDeg = 8
  private[graft] val GraphWalkBeam = 32
  private[graft] val GraphWalkDepth = 3

  /** Exact 1e-9-snapped per-term dot (the §5 no-accumulated-float
    * rule): Σ_j floor(a_j·b_j·1e9 + ½) as a BIGINT. */
  private def snapDot9(a: Array[Float], b: Array[Float]): Long = {
    var s = 0L; var j = 0
    while (j < a.length) {
      s += math.floor(a(j).toDouble * b(j) * 1e9 + 0.5).toLong; j += 1
    }
    s
  }

  /** cos_e6 from exact integer dot/norms — one fixed scalar IEEE
    * chain on identical int inputs (bit-identical cross-engine). */
  private def cosE6(s: Long, qn: Long, xn: Long): Long =
    math.floor(s.toDouble /
      (math.sqrt(qn.toDouble) * math.sqrt(xn.toDouble)) * 1e6 + 0.5).toLong

  /** ann_graph_walk — GRAPH-NAVIGATION ANN (the NSW/HNSW family,
    * completing the ANN story: quantization, dims, hashing, coarse
    * quantizer, whitening — and now graph walk): serve queries by
    * BEAM SEARCH over the corpus kNN graph instead of probing
    * quantizer buckets. Entry points are one deterministic medoid
    * per IVF bucket (min vec_id — bounded by nlist, spread by the
    * quantizer); each round the frontier expands through the stored
    * out-edges and keeps the best `beam` nodes; after `depth` fixed
    * rounds the top-k of the final frontier answers (monotone: the
    * frontier only ever improves, since S ⊆ S ∪ N(S) before the
    * cut). Self-exclusion applies at the FINAL cut only — the query
    * vector itself is the best possible navigation node.
    *
    * Determinism: scores are exact-integer cos_e6 (per-term 1e-9
    * snaps — [[snapDot9]]); entry assignment is an exact integer
    * argmax (per-term-snapped centroid dots, cid tie-break); ranks
    * break ties on node id. The walk is a FIXED number of rounds, so
    * the oracle UNROLLS it (the graph_pagerank discipline).
    *
    * 100 TB shape: the edges come from the maintained kNN-graph
    * artifact ([[writeKnnGraph]] — here built in-query so the oracle
    * can replay it); per round ONE broadcast join of the bounded
    * frontier (queries × beam rows) against the edge list and ONE
    * broadcast-frontier candidate scoring pass against the pruned
    * corpus — per-query work is O(beam · deg · depth) candidate
    * scores, independent of corpus size once the edges exist. The
    * serving twin over the stored artifact is
    * [[annGraphWalkServeBatch]]. */
  def annGraphWalk(s: SparkSession, d: String, nQueries: Int = 10,
                   k: Int = 5, deg: Int = GraphWalkDeg,
                   beam: Int = GraphWalkBeam, depth: Int = GraphWalkDepth,
                   nlist: Int = IvfNlist, nprobe: Int = IvfNprobe): DataFrame = {
    annGraphWalkFrom(Tables.embeddings(s, d), ivfCentroids(s, d, nlist),
      nQueries, k, deg, beam, depth, nprobe)
  }

  /** [[annGraphWalk]] over an arbitrary embeddings frame — the
    * Scale10 probe entry. */
  def annGraphWalkFrom(emb: DataFrame, cents: Array[Array[Double]],
                       nQueries: Int = 10, k: Int = 5,
                       deg: Int = GraphWalkDeg, beam: Int = GraphWalkBeam,
                       depth: Int = GraphWalkDepth,
                       nprobe: Int = IvfNprobe): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val edges = knnGraphOn(emb, cents, deg, nprobe, ordered = false)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .localCheckpoint()
    val bcC = s.sparkContext.broadcast(cents)
    // one deterministic entry medoid per bucket: exact-integer
    // centroid argmax (per-term snaps), min id per bucket
    val entries = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val cs = bcC.value
        var best = 0; var bestDot = Long.MinValue; var i = 0
        while (i < cs.length) {
          val e = cs(i); var dd = 0L; var j = 0
          while (j < v.length) {
            dd += math.floor(e(j) * v(j) * 1e9 + 0.5).toLong; j += 1
          }
          if (dd > bestDot) { bestDot = dd; best = i }
          i += 1
        }
        (best, id)
      }.toDF("bucket", "vec_id")
      .groupBy(col("bucket")).agg(min(col("vec_id")).as("node"))
      .select(col("node")).as[Long].collect().sorted // bounded by nlist
    annGraphWalkOn(emb, edges, entries,
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")),
      k, beam, depth, excludeSelf = true)
  }

  /** Serve a query batch by graph walk over the STORED kNN-graph
    * artifact ([[writeKnnGraph]]/[[knnGraphAppendStep]]): entry
    * medoids come from the precomputed `entries/` file (≤ nlist rows
    * WITH embeddings — no per-call `nodes/` scan), per-round edge
    * reads are pruned to the frontier's `_eb` partition values, and
    * the per-round VECTOR fetch is pruned to the candidates'
    * `n_bucket` partition values carried on the stored edges (the
    * same bounded-partition-VALUES discipline applied to `nodes/` —
    * before r14 this fetch was an unpruned corpus scan per round, the
    * one corpus-linear cost in the serve path). Pending
    * [[deleteFromKnnGraph]] tombstones are subtracted from entries
    * and expansions. The [[annIvfServeBatch]] serving contract:
    * query ids are an independent space, excludeSelf opt-in. Walk
    * degree is whatever the artifact stored (its k). */
  def annGraphWalkServeBatch(s: SparkSession, dir: String,
                             queries: DataFrame, k: Int = 5,
                             beam: Int = GraphWalkBeam,
                             depth: Int = GraphWalkDepth,
                             excludeSelf: Boolean = false): DataFrame = {
    import s.implicits._
    val ts = knnGraphTombstones(s, dir)
    val entryVecs0 = s.read.parquet(s"$dir/entries")
      .select(col("node"), col("embedding"))
    val entryVecs = ts.fold(entryVecs0)(t =>
      entryVecs0.join(broadcast(t.withColumnRenamed("vec_id", "node")),
        Seq("node"), "left_anti"))
    val nodes = s.read.parquet(s"$dir/nodes")
    // per-round edge fetch PRUNED to the frontier's `_eb` partitions
    // (the bounded-partition-VALUES discipline: ≤ GraphEb ints per
    // round, never an id set) — the scan cost tracks the touched
    // adjacency partitions, not the stored graph; at toy GraphEb a
    // small frontier touches most of the 64 values (the append
    // saturation analysis), production scales GraphEb with the corpus
    val expand = (frontier: DataFrame) => {
      val ebs = frontier
        .select((col("node") % GraphEb).cast("int").as("eb"))
        .distinct().as[Int].collect().toSeq
      val out = s.read.parquet(s"$dir/edges")
        .filter(col("_eb").isin(ebs: _*))
        .select(col("vec_id").as("src"), col("neighbor_id").as("dst"),
          col("n_bucket"))
      ts.fold(out)(t =>
          out.join(broadcast(t.withColumnRenamed("vec_id", "dst")),
            Seq("dst"), "left_anti"))
        .join(broadcast(frontier.select(col("query_id"),
          col("node").as("src"))), Seq("src"))
        .select(col("query_id"), col("dst").as("node"), col("n_bucket"))
    }
    // vector fetch PRUNED to the candidates' assigned-bucket
    // partitions (≤ nlist ints per round — the point of n_bucket)
    val fetch = (cand: DataFrame) => {
      val bks = cand.select(col("n_bucket")).distinct()
        .as[Int].collect().toSeq
      nodes.filter(col("bucket").isin(bks: _*))
        .select(col("vec_id").as("node"), col("embedding"))
        .join(broadcast(cand.select(col("node"))), Seq("node"), "left_semi")
    }
    annGraphWalkOn(fetch, expand, entryVecs,
      queries.select(col("query_id"), col("embedding")),
      k, beam, depth, excludeSelf)
  }

  /** Default expansion: one broadcast-frontier join against an
    * in-memory edge frame (the in-query form — the edges were just
    * built and checkpointed, nothing to prune). */
  private def expandAll(edges: DataFrame)(frontier: DataFrame): DataFrame =
    edges.join(broadcast(frontier.select(col("query_id"),
        col("node").as("src"))), Seq("src"))
      .select(col("query_id"), col("dst").as("node"))

  /** The walk over an in-memory corpus + edge frame — the in-query
    * form: vectors fetch by one broadcast semi-join against the whole
    * corpus frame (nothing stored to prune). */
  private[graft] def annGraphWalkOn(emb: DataFrame, edges: DataFrame,
                                    entries: Seq[Long], queries: DataFrame,
                                    k: Int, beam: Int, depth: Int,
                                    excludeSelf: Boolean): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val fetch = (cand: DataFrame) => {
      val nodes = cand.select(col("node")).distinct()
      emb.join(broadcast(nodes), emb("vec_id") === nodes("node"))
        .select(col("vec_id").as("node"), col("embedding"))
    }
    annGraphWalkOn(fetch, expandAll(edges)(_),
      fetch(entries.toDF("node")), queries, k, beam, depth, excludeSelf)
  }

  /** The walk core with pluggable frontier expansion AND vector
    * fetch (the serving twin prunes its stored-edge reads by the
    * frontier's `_eb` partition values and its `nodes/` vector reads
    * by the candidates' `n_bucket` partition values; the in-query
    * form joins its in-memory frames directly). `expand` maps a
    * (query_id, node) frontier to (query_id, node[, n_bucket])
    * out-neighbor rows; `fetch` maps a distinct (node[, n_bucket])
    * candidate frame to (node, embedding); `entryVecs` is the
    * bounded (node, embedding) entry-medoid frame (≤ nlist rows). */
  private[graft] def annGraphWalkOn(fetch: DataFrame => DataFrame,
                                    expand: DataFrame => DataFrame,
                                    entryVecs: DataFrame, queries: DataFrame,
                                    k: Int, beam: Int, depth: Int,
                                    excludeSelf: Boolean): DataFrame = {
    val s = queries.sparkSession
    import s.implicits._
    // bounded query set rides a broadcast map (qid → vector)
    val qMap = queries.select(col("query_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    val bcQ = s.sparkContext.broadcast(qMap)
    // (query_id, node) + a bounded (node, embedding) frame → scores
    def score(cand: DataFrame, vecs: DataFrame): DataFrame =
      cand.join(broadcast(vecs), Seq("node"))
        .select(col("query_id"), col("node"), col("embedding"))
        .as[(Long, Long, Array[Float])]
        .map { case (qid, node, v) =>
          val q = bcQ.value(qid)
          (qid, node, cosE6(snapDot9(q, v), snapDot9(q, q), snapDot9(v, v)))
        }.toDF("query_id", "node", "cos_e6")
    // initial frontier assembled on the driver: queries × entry
    // medoids are both bounded (never a crossJoin plan)
    val eIds = entryVecs.select(col("node")).as[Long].collect().sorted
    val init = for (q <- qMap.keys.toSeq.sorted; e <- eIds) yield (q, e)
    var frontier = score(init.toDF("query_id", "node"), entryVecs)
      .localCheckpoint()
    for (_ <- 1 to depth) {
      val neigh = expand(frontier.select(col("query_id"), col("node")))
        .distinct()
        .join(broadcast(frontier.select(col("query_id"), col("node"))),
          Seq("query_id", "node"), "left_anti")
      val vecs = fetch(neigh.drop("query_id").distinct())
      val cand = frontier
        .unionByName(score(neigh.select(col("query_id"), col("node")),
          vecs))
      frontier = topKPerQuery(cand
          .select(col("query_id"), col("node").as("neighbor_id"),
            col("cos_e6").cast("double").as("cos_sim")), beam,
        ordered = false)
        .select(col("query_id"), col("neighbor_id").as("node"),
          col("cos_sim").cast("long").as("cos_e6"))
        .localCheckpoint()
    }
    val fin = if (excludeSelf) frontier.filter(col("node") =!= col("query_id"))
              else frontier
    topKPerQuery(fin
        .select(col("query_id"), col("node").as("neighbor_id"),
          col("cos_e6").cast("double").as("cos_sim")), k)
      .select(col("query_id"), col("neighbor_id"),
        col("cos_sim").cast("long").as("cos_e6"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB oracle for [[annGraphWalk]]: the knnGraph chain (at walk
    * degree) as the edge subquery, exact-integer entry assignment,
    * and the beam search UNROLLED `depth` rounds (fixed rounds — the
    * graph_pagerank discipline), each = expand through edges ∪ keep
    * the ranked beam. Data-dependent → emitted by oracleSqlFor. */
  def annGraphWalkOracleSql(s: SparkSession, d: String, nQueries: Int = 10,
                            k: Int = 5, deg: Int = GraphWalkDeg,
                            beam: Int = GraphWalkBeam,
                            depth: Int = GraphWalkDepth,
                            nlist: Int = IvfNlist,
                            nprobe: Int = IvfNprobe): String = {
    val cents = ivfCentroids(s, d, nlist)
    val dim = cents.head.length
    val centsSql = cents.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n        ")
    val knnSql = knnGraphOracleSql(s, d, deg, nlist, nprobe)
    def snapSum(a: String, b: String) =
      s"""CAST(list_sum(list_transform(range(1, $dim + 1),
          i -> CAST(floor($a[i] * $b[i] * 1e9 + 0.5) AS BIGINT))) AS BIGINT)"""
    val rounds = (1 to depth).map { r =>
      s"""c$r AS (
        SELECT query_id, node FROM s${r - 1}
        UNION
        SELECT f.query_id, e.dst AS node
        FROM s${r - 1} f JOIN edges e ON e.src = f.node),
      s$r AS (
        SELECT query_id, node, cos_e6 FROM (
          SELECT sc.query_id, sc.node, sc.cos_e6,
            row_number() OVER (PARTITION BY sc.query_id
              ORDER BY sc.cos_e6 DESC, sc.node) AS rn
          FROM (SELECT c.query_id, c.node,
                  CAST(floor(CAST(${snapSum("q.de", "x.de")} AS DOUBLE)
                    / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(xn.n2 AS DOUBLE)))
                    * 1e6 + 0.5) AS BIGINT) AS cos_e6
                FROM c$r c
                JOIN dembs q ON q.vec_id = c.query_id
                JOIN dembs x ON x.vec_id = c.node
                JOIN norms qn ON qn.vec_id = c.query_id
                JOIN norms xn ON xn.vec_id = c.node) sc)
        WHERE rn <= $beam)"""
    }.mkString(",\n      ")
    s"""
      WITH wcents(cid, c) AS (VALUES
        $centsSql),
      edges AS (
        SELECT vec_id AS src, neighbor_id AS dst FROM ($knnSql)),
      dembs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings),
      norms AS (
        SELECT vec_id, ${snapSum("de", "de")} AS n2 FROM dembs),
      cdotE AS (
        SELECT e.vec_id, w.cid, ${snapSum("w.c", "e.de")} AS dot
        FROM dembs e CROSS JOIN wcents w),
      entries AS (
        SELECT MIN(vec_id) AS node FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY dot DESC, cid) AS rn
          FROM cdotE) WHERE rn = 1 GROUP BY cid),
      s0 AS (
        SELECT q.vec_id AS query_id, en.node,
          CAST(0 AS BIGINT) AS cos_e6
        FROM (SELECT vec_id FROM embeddings WHERE vec_id < $nQueries) q
        CROSS JOIN entries en),
      $rounds
      SELECT query_id, neighbor_id, cos_e6, rank FROM (
        SELECT query_id, node AS neighbor_id, cos_e6,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos_e6 DESC, node) AS INT) AS rank
        FROM s$depth WHERE node <> query_id)
      WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** DuckDB oracle for [[embPca]]: component literals + 1e-9-unit
    * BIGINT offsets, the identical per-term-snap → exact-integer-sum
    * → one-floor-division pe6 chain (NO float accumulation — r12's
    * red row was `list_inner_product` here, whose accumulation order
    * is engine-environment-sensitive), HUGEINT moments (sp*sp routed
    * through HUGEINT — BIGINT² overflows), the same single divisions
    * and the exact ve9 cumulative ratio. Final rounded DOUBLEs are
    * normalized with `+ 0`: DuckDB's round() preserves IEEE -0.0
    * (the mean-centered projections are ≈0 and sp is often a small
    * negative integer) while Spark's BigDecimal-based round() cannot
    * represent it — numerically equal, bit-different, and the
    * driver's hash is bit-sensitive (r13's one red row).
    * `-0.0 + 0.0 = +0.0`; every other value is unchanged.
    * Data-dependent → emitted by oracleSqlFor. */
  def embPcaOracleSql(s: SparkSession, d: String): String = {
    val (comps, offs) = pcaBasis(s, d)
    val dim = comps.head.length
    val rows = comps.zip(offs).zipWithIndex.map { case ((e, off), c) =>
      s"($c, [${e.map(_.toString).mkString(", ")}]::DOUBLE[], " +
        s"${math.floor(off * 1e9 + 0.5).toLong})"
    }.mkString(",\n        ")
    s"""
      WITH comps(cid, e, offe9) AS (VALUES
        $rows),
      proj AS (
        SELECT c.cid,
          CAST(floor((CAST(list_sum(list_transform(range(1, $dim + 1),
              i -> CAST(floor(c.e[i] * CAST(embedding[i] AS DOUBLE) * 1e9
                              + 0.5) AS BIGINT))) AS BIGINT)
            - c.offe9 + 500) / 1000.0) AS BIGINT) AS pe6
        FROM embeddings CROSS JOIN comps c),
      ag AS (
        SELECT cid, COUNT(*) AS n, SUM(pe6) AS sp, SUM(pe6 * pe6) AS sp2
        FROM proj GROUP BY 1),
      v AS (
        SELECT cid, n,
          round(CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6) + 0
            AS mean_p,
          round(CAST(n * sp2 - CAST(sp AS HUGEINT) * sp AS DOUBLE) /
            (CAST(n AS DOUBLE) * n * 1e12), 6) + 0 AS var_p
        FROM ag),
      e9 AS (
        SELECT *, CAST(floor(var_p * 1e9 + 0.5) AS BIGINT) AS ve9 FROM v)
      SELECT cid AS component, n, mean_p, var_p,
        round(CAST(SUM(ve9) OVER (ORDER BY cid
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
          CAST(SUM(ve9) OVER () AS DOUBLE), 6) + 0 AS cum_frac
      FROM e9 ORDER BY component"""
  }

  private[graft] val PprSeeds = 5L

  /** graph_ppr — PERSONALIZED PageRank from a seed set (teleport mass
    * restricted to the seeds): the kNN-graph data-ATTRIBUTION signal
    * — which corpus vectors sit in the seeds' neighborhood-of-
    * neighborhoods (influence/contamination audits, seed-expanded
    * curation). Same exact-integer recipe as [[graphPagerank]] — the
    * teleport term is simply zero off the seed set — so the result
    * is bit-identical cross-engine; nodes unreachable from the seeds
    * hold rank EXACTLY 0 (spec'd). Seeds: vec_id < PprSeeds. */
  def graphPpr(s: SparkSession, d: String, k: Int = KnnK,
               nlist: Int = IvfNlist, nprobe: Int = IvfNprobe,
               iters: Int = PrIters): DataFrame = {
    val edges = knnGraph(s, d, k, nlist, nprobe, ordered = false)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    val nodes = Tables.embeddings(s, d).select(col("vec_id"))
    personalizedPagerankOn(edges, nodes,
      nodes.filter(col("vec_id") < PprSeeds), iters)
  }

  /** [[pagerankOn]] with teleport mass restricted to `seeds` (a
    * vec_id frame): r0 = SCALE/|S| on seeds else 0; per-iteration
    * base likewise. All-integer arithmetic, same determinism
    * contract. */
  def personalizedPagerankOn(edges: DataFrame, nodes: DataFrame,
                             seeds: DataFrame,
                             iters: Int = PrIters): DataFrame = {
    val nS = seeds.count()
    val base = (3L * PrScale) / (20L * nS)
    val r0 = PrScale / nS
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesDeg = edges.join(deg, Seq("src")).localCheckpoint()
    val seeded = nodes.join(
        seeds.select(col("vec_id")).withColumn("is_seed", lit(1)),
        Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("is_seed"), lit(0)).as("is_seed"))
      .localCheckpoint()
    var ranks = seeded.select(col("vec_id"),
      when(col("is_seed") === 1, lit(r0)).otherwise(lit(0L)).as("pr"))
    for (i <- 1 to iters) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("vec_id", "src"), Seq("src"))
        .select(col("dst").as("vec_id"), expr("pr div deg").as("share"))
        .groupBy(col("vec_id")).agg(sum(col("share")).as("in_sum"))
      ranks = seeded.join(contrib, Seq("vec_id"), "left")
        .select(col("vec_id"),
          (when(col("is_seed") === 1, lit(base)).otherwise(lit(0L)) +
            expr("(17 * coalesce(in_sum, CAST(0 AS BIGINT))) div 20"))
            .as("pr"))
      // linear chain — periodic checkpoint only (see pagerankOn)
      if (i % PrCkEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("vec_id"), col("pr").as("pr_e12"),
        round(col("pr").cast("double") / lit(1e12), 6).as("ppr"))
      .orderBy(col("vec_id"))
  }

  /** DuckDB oracle for [[graphPpr]]: the pagerank chain with the
    * teleport CASE restricted to the seed predicate. Data-dependent →
    * emitted by oracleSqlFor. */
  def graphPprOracleSql(s: SparkSession, d: String, k: Int = KnnK,
                        nlist: Int = IvfNlist, nprobe: Int = IvfNprobe,
                        iters: Int = PrIters): String = {
    val nS = Tables.embeddings(s, d)
      .filter(col("vec_id") < PprSeeds).count()
    val base = (3L * PrScale) / (20L * nS)
    val r0 = PrScale / nS
    val knnSql = knnGraphOracleSql(s, d, k, nlist, nprobe)
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (
        SELECT nd.vec_id,
          CAST(CASE WHEN nd.vec_id < $PprSeeds THEN $base ELSE 0 END
               + (17 * COALESCE(cs.s, 0)) // 20 AS BIGINT) AS pr
        FROM nodes nd LEFT JOIN (
          SELECT ed.dst AS vec_id, SUM(p.pr // ed.deg) AS s
          FROM edges_deg ed JOIN r${i - 1} p ON p.vec_id = ed.src
          GROUP BY 1) cs ON cs.vec_id = nd.vec_id)"""
    }.mkString(",\n")
    s"""
      WITH edges AS (
        SELECT vec_id AS src, neighbor_id AS dst FROM ($knnSql)),
      edges_deg AS (
        SELECT e.src, e.dst, g.deg
        FROM edges e JOIN (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
          FROM edges GROUP BY 1) g USING (src)),
      nodes AS (SELECT vec_id FROM embeddings),
      r0 AS (
        SELECT vec_id,
          CAST(CASE WHEN vec_id < $PprSeeds THEN $r0 ELSE 0 END AS BIGINT)
            AS pr
        FROM nodes),
      $iterCtes
      SELECT vec_id, pr AS pr_e12,
        round(CAST(pr AS DOUBLE) / 1e12, 6) AS ppr
      FROM r$iters ORDER BY vec_id"""
  }

  /** DuckDB oracle for [[graphPagerank]]: the knnGraph oracle chain as
    * the edge subquery, then `iters` UNROLLED aggregating CTEs (a
    * recursive CTE can't aggregate over its own reference) replaying
    * the identical integer arithmetic — DuckDB `//` is floor division
    * and every operand is positive, and SUM(BIGINT)'s HUGEINT is cast
    * back per step. Data-dependent (centroid literals + corpus count)
    * → emitted by oracleSqlFor. */
  def graphPagerankOracleSql(s: SparkSession, d: String, k: Int = KnnK,
                             nlist: Int = IvfNlist, nprobe: Int = IvfNprobe,
                             iters: Int = PrIters): String = {
    val n = Tables.embeddings(s, d).count()
    val base = (3L * PrScale) / (20L * n)
    val r0 = PrScale / n
    val knnSql = knnGraphOracleSql(s, d, k, nlist, nprobe)
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (
        SELECT nd.vec_id,
          CAST($base + (17 * COALESCE(cs.s, 0)) // 20 AS BIGINT) AS pr
        FROM nodes nd LEFT JOIN (
          SELECT ed.dst AS vec_id, SUM(p.pr // ed.deg) AS s
          FROM edges_deg ed JOIN r${i - 1} p ON p.vec_id = ed.src
          GROUP BY 1) cs ON cs.vec_id = nd.vec_id)"""
    }.mkString(",\n")
    s"""
      WITH edges AS (
        SELECT vec_id AS src, neighbor_id AS dst FROM ($knnSql)),
      edges_deg AS (
        SELECT e.src, e.dst, g.deg
        FROM edges e JOIN (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
          FROM edges GROUP BY 1) g USING (src)),
      nodes AS (SELECT vec_id FROM embeddings),
      r0 AS (SELECT vec_id, CAST($r0 AS BIGINT) AS pr FROM nodes),
      $iterCtes
      SELECT vec_id, pr AS pr_e12,
        round(CAST(pr AS DOUBLE) / 1e12, 6) AS pagerank
      FROM r$iters ORDER BY vec_id"""
  }
}
