package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {

  test("operator output equals an exact-integer driver replay of its edges") {
    import spark.implicits._
    val edges = Similarity.knnGraph(spark, sf)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .as[(Long, Long)].collect()
    val nodes = Tables.embeddings(spark, sf)
      .select(col("vec_id")).as[Long].collect().sorted
    val n = nodes.length.toLong
    val base = (3L * Similarity.PrScale) / (20L * n)
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    var pr = nodes.map(_ -> Similarity.PrScale / n).toMap
    for (_ <- 1 to Similarity.PrIters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => pr(s) / deg(s) }.sum
      }
      pr = nodes.map(v => v -> (base + (17L * in.getOrElse(v, 0L)) / 20L)).toMap
    }
    val got = SparkEntry.queries("graph_pagerank")(spark, sf)
      .select(col("vec_id"), col("pr_e12")).as[(Long, Long)].collect().toMap
    assert(got.keySet == pr.keySet)
    pr.foreach { case (v, r) => assert(got(v) == r, s"vec $v") }
  }

  test("rank mass is conserved up to integer floor losses") {
    val total = SparkEntry.queries("graph_pagerank")(spark, sf)
      .agg(sum(col("pr_e12"))).head().getLong(0)
    assert(total <= Similarity.PrScale)
    assert(total >= (Similarity.PrScale * 9) / 10)
  }

  test("personalized pagerank matches an exact-integer driver replay") {
    import spark.implicits._
    val edges = Similarity.knnGraph(spark, sf)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .as[(Long, Long)].collect()
    val nodes = Tables.embeddings(spark, sf)
      .select(col("vec_id")).as[Long].collect().sorted
    val seeds = nodes.filter(_ < Similarity.PprSeeds).toSet
    val nS = seeds.size.toLong
    val base = (3L * Similarity.PrScale) / (20L * nS)
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    var pr = nodes.map(v =>
      v -> (if (seeds(v)) Similarity.PrScale / nS else 0L)).toMap
    for (_ <- 1 to Similarity.PrIters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => pr(s) / deg(s) }.sum
      }
      pr = nodes.map(v => v ->
        ((if (seeds(v)) base else 0L) +
          (17L * in.getOrElse(v, 0L)) / 20L)).toMap
    }
    val got = SparkEntry.queries("graph_ppr")(spark, sf)
      .select(col("vec_id"), col("pr_e12")).as[(Long, Long)].collect().toMap
    assert(got == pr)
    // attribution shape: seeds dominate, and mass concentrates near
    // them — unreachable nodes hold EXACTLY zero
    assert(seeds.forall(s => got(s) > 0))
    assert(got.values.sum <= Similarity.PrScale)
  }

  test("the hubness histogram conserves vectors and edges") {
    import spark.implicits._
    val hist = SparkEntry.queries("knn_hubness")(spark, sf)
      .select(col("in_degree"), col("n_vecs")).as[(Long, Long)].collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    val nEdges = Similarity.knnGraph(spark, sf).count()
    assert(hist.map(_._2).sum == nVecs)
    assert(hist.map(t => t._1 * t._2).sum == nEdges)
    assert(hist.map(_._1).distinct.length == hist.length)
  }

  test("mutual-kNN components match a driver union-find of the mutual edges") {
    import spark.implicits._
    val edges = Similarity.knnGraph(spark, sf)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
      .as[(Long, Long)].collect().toSet
    val mutual = edges.filter { case (u, v) => u < v && edges.contains((v, u)) }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    mutual.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val nodes = Tables.embeddings(spark, sf)
      .select(col("vec_id")).as[Long].collect()
    val want = nodes.map(v => v -> find(v)).toMap
    val got = SparkEntry.queries("knn_components")(spark, sf)
      .select(col("vec_id"), col("component_id")).as[(Long, Long)]
      .collect().toMap
    assert(got == want)
    // the graph genuinely clusters: at least one non-trivial component
    assert(mutual.nonEmpty)
    assert(got.exists { case (v, c) => v != c })
  }

  test("the component-size profile conserves vectors and matches components") {
    import spark.implicits._
    val hist = SparkEntry.queries("graph_profile")(spark, sf)
      .select(col("component_size"), col("n_components"), col("n_vecs"))
      .as[(Long, Long, Long)].collect()
    val comps = SparkEntry.queries("knn_components")(spark, sf)
      .select(col("component_id")).as[Long].collect()
      .groupBy(identity).map(_._2.length.toLong)
    assert(hist.map(_._3).sum == comps.sum) // every vector accounted
    hist.foreach { case (sz, nc, nv) =>
      assert(nv == sz * nc)
      assert(comps.count(_ == sz).toLong == nc, s"size $sz")
    }
  }

  test("two kNN-graph append days equal the one-shot graph of the union") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.ivfCentroids(spark, sf)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-test-knngraph"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val day0 = emb.filter(col("vec_id") % 3 === 0)
    val day1 = emb.filter(col("vec_id") % 3 === 1)
    val day2 = emb.filter(col("vec_id") % 3 === 2)
    Similarity.writeKnnGraph(day0, cents, dir)
    Similarity.knnGraphAppendStep(spark, dir, day1, cents)
    Similarity.knnGraphAppendStep(spark, dir, day2, cents)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().sorted.toSeq
    val got = rows(Similarity.readKnnGraph(spark, dir))
    val want = rows(Similarity.knnGraphOn(emb, cents))
    assert(got.nonEmpty)
    assert(got == want)
    // compaction folds the append-accumulated nodes/probes files and
    // changes nothing the artifact serves
    val (rn, rp) = Similarity.compactKnnGraph(spark, dir)
    assert(rn.filesOut <= rn.filesIn && rp.filesOut <= rp.filesIn)
    assert(rows(Similarity.readKnnGraph(spark, dir)) == want)
  }

  test("label propagation: majority, least-label ties, multi-hop rounds") {
    import spark.implicits._
    // seeds: 1 -> label 10, 2 -> label 20, 6 -> label 20
    val seeds = Seq((1L, 10), (2L, 20), (6L, 20)).toDF("vec_id", "label")
    val edges = Seq(
      (3L, 1L), (3L, 2L),           // tie (1 vote each) -> least label 10
      (5L, 1L), (5L, 2L), (5L, 6L), // majority 20:2 over 10:1
      (4L, 3L)                      // only path to labels runs THROUGH 3:
    ).toDF("src", "dst")            // round 1 leaves 4 unlabeled, round 2 labels it
    val out = Similarity.labelPropOn(edges, seeds, col("src") >= 3, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq((3L, 10, 1L), (4L, 10, 1L), (5L, 20, 2L)))
    // coverage is monotone: one round only reaches 3 and 5
    val r1 = Similarity.labelPropOn(edges, seeds, col("src") >= 3, 1)
      .collect().map(_.getLong(0)).toSet
    assert(r1 === Set(3L, 5L))
  }

  test("graph_label_prop covers the unlabeled carve against the corpus graph") {
    val out = SparkEntry.queries("graph_label_prop")(spark, sf)
    val unl = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 5 === 0).count()
    // 80% seeds + degree-5 edges: essentially every unlabeled node has
    // a labeled neighbor in round 1 (coverage pinned loosely)
    assert(out.count() >= (unl * 9) / 10)
    // every propagated label is a real class
    import spark.implicits._
    val classes = Tables.embeddings(spark, sf)
      .select("label").distinct().as[Int].collect().toSet
    assert(out.select("label").distinct().as[Int].collect().toSet
      .subsetOf(classes))
  }

  test("a star hub outranks its spokes on a crafted graph") {
    import spark.implicits._
    val nodes = (0L to 5L).toDF("vec_id")
    // spokes 1..5 all point at the dangling hub 0 (pure star — no
    // back edge, so no 2-cycle parity oscillation inside 10 iters)
    val edges = (1L to 5L).map(i => (i, 0L)).toDF("src", "dst")
    val pr = Similarity.pagerankOn(edges, nodes)
      .select(col("vec_id"), col("pr_e12")).as[(Long, Long)].collect().toMap
    assert(pr(0L) == pr.values.max)
    assert(pr(0L) > pr(1L))
    assert((1L to 5L).map(pr).toSet.size == 1) // symmetric spokes tie
  }
}
