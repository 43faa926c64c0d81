package graft

import org.apache.spark.sql.functions._

/** Every SparkEntry query runs at sf0.001, returns rows, and keeps
  * its oracle column names (the driver hash-compares by sorted column
  * name — a drifted alias breaks the gate before values are even
  * looked at). */
class QueriesSpec extends SparkSpec {

  test("every query has an oracle — data-dependent ones via oracleSqlFor") {
    // ann_ivf's oracle embeds its trained centroids and bpe_segment's
    // its trained merges as SQL literals, so they are emitted by
    // oracleSqlFor at Verify time rather than from the static map.
    // Net: the dumped oracle_sql.json covers EVERY query.
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet ==
      Set("ann_ivf", "ann_ivf_sq8", "ann_pq", "ann_ivf_pq",
        "ann_ivf_prefix", "ann_ivf_filtered", "ann_ivf_white",
        "ann_graph_walk", "dedup_semantic",
        "select_prototypes", "knn_graph", "kmeans_report", "mine_bitext",
        "tokenizer_fertility", "tokenizer_coverage", "graph_pagerank",
        "emb_pca", "knn_hubness", "knn_components", "graph_profile",
        "graph_ppr", "graph_label_prop",
        "bpe_segment", "bpe_token_count",
        "unigram_segment", "unigram_token_count",
        "wordpiece_segment", "wordpiece_token_count"))
    assert(SparkEntry.queries.keySet --
      SparkEntry.oracleSqlFor(spark, sf).keySet == Set.empty[String])
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q1 groups by returnflag x linestatus") {
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("count_order")).sum > 5000)
  }

  test("q5 upsert keeps exactly one row per user") {
    val df = SparkEntry.queries("q5_upsert_latest")(spark, sf)
    assert(df.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }

  test("q9 potential score is rank-ordered") {
    val scores = SparkEntry.queries("q9_potential_score")(spark, sf)
      .collect().map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
