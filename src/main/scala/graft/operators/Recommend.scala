package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Collaborative-filtering recommender tier — the maintained-model
  * form of `recommend_collab` (the reference's phase-3
  * "recommendation engine", VISUALIZATION_PLAN.md:70).
  *
  * The model is PURE COUNT ALGEBRA (the NB-model property, on
  * interactions instead of tokens): `pairs/` = (i, j, c) shared-user
  * co-occurrence counts over i < j, `items/` = (item, n)
  * distinct-user interaction counts. Cosines, ranks and the top-k
  * cut are DERIVED views (never stored), so maintenance verbs are
  * exact BIGINT adds/subtracts and the maintained artifact is spec'd
  * EQUAL to fresh training — the cut-irreversibility that forces
  * [[Similarity.forgetFromKnnGraph]] into refill surgery never
  * arises because the full (support-sparse, catalog-bounded) pair
  * table is the artifact.
  *
  * Maintenance contract: interactions arrive and leave as WHOLE
  * USERS (append = a day's new users, forget = the
  * right-to-be-forgotten user's full interaction set, passed by the
  * caller — the [[graft.functions.Classify.forgetFromNbModel]]
  * shape). Per-user deltas of an existing user would need that
  * user's stored history to pair against, which is exactly the
  * corpus-sized sidecar the aggregate exists to avoid.
  *
  * Scale shape: pair generation is the shared-user equi-join (cost
  * Σ_u d_u² — the classic item-CF bound), the model is bounded by
  * catalog² co-occurrence support (not the corpus), and serving is
  * one join of a user's history against the model + a per-user
  * window — corpus-size-independent once trained.
  */
object Recommend {

  /** Engagement interactions: distinct (user_id, item), item = the
    * `props.k` id (the q8 extraction). */
  def interactions(events: DataFrame): DataFrame =
    events.filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .distinct()

  /** (i, j, c) shared-user pair counts over i < j — exact BIGINTs
    * from the per-user equi-join. */
  private def pairCounts(inter: DataFrame): DataFrame =
    inter.as("a")
      .join(inter.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("i"), col("b.item").as("j"))
      .agg(count(lit(1)).as("c"))

  /** (item, n) distinct-user counts. */
  private def itemCounts(inter: DataFrame): DataFrame =
    inter.groupBy(col("item")).agg(count(lit(1)).as("n"))

  /** Ranked top-k recommendations from the two count frames — the
    * ONE scoring body shared by the in-query `recommend_collab` and
    * the stored-model serve (no drift possible): symmetrize the
    * i<j pairs, cosine = c/√(n_i·n_j) through one IEEE expression
    * snapped e6 (the ann cos_e6 recipe), rank (cos desc, rec_item)
    * per item, cut at k. */
  private[graft] def topKFromCounts(pairs: DataFrame, items: DataFrame,
                                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("i")).orderBy(col("cos_e6").desc, col("j"))
    scoredSym(pairs, items)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("i").as("item"), col("rank"), col("j").as("rec_item"),
        col("c").as("shared_users"), col("cos_e6"))
      .orderBy(col("item"), col("rank"))
  }

  /** The symmetrized, cosine-scored pair frame (i, j, c, cos_e6) —
    * the rank-free core [[topKFromCounts]] windows over and
    * [[recommendForUsers]] votes with (no per-item window on the
    * serve path: the vote aggregates ALL of a history item's
    * neighbors, so a rank cut there would be both wasted work and a
    * recall hole). */
  private def scoredSym(pairs: DataFrame, items: DataFrame): DataFrame =
    pairs.select(col("i"), col("j"), col("c"))
      .union(pairs.select(col("j").as("i"), col("i").as("j"), col("c")))
      .join(broadcast(items.select(col("item").as("i"), col("n").as("ni"))),
        Seq("i"))
      .join(broadcast(items.select(col("item").as("j"), col("n").as("nj"))),
        Seq("j"))
      .withColumn("cos_e6",
        floor(col("c").cast("double") /
          (sqrt(col("ni").cast("double")) * sqrt(col("nj").cast("double"))) *
          lit(1e6) + lit(0.5)).cast("long"))

  /** In-query form over an interaction frame (Relational
    * .recommendCollab wraps this over the events table). */
  def recommendTopK(inter: DataFrame, k: Int = 10): DataFrame =
    topKFromCounts(pairCounts(inter), itemCounts(inter), k)

  // ---- maintained CF-model artifact --------------------------------------

  /** Train and persist the model: `pairs/` + `items/`. */
  def writeCfModel(inter: DataFrame, dir: String): Unit = {
    pairCounts(inter).write.mode("overwrite").parquet(s"$dir/pairs")
    itemCounts(inter).write.mode("overwrite").parquet(s"$dir/items")
  }

  /** Item-item top-k served from the stored model — bit-identical to
    * the in-query form of the same interactions (one scoring body;
    * spec'd). */
  def recommendTopKFromModel(s: SparkSession, dir: String,
                             k: Int = 10): DataFrame =
    topKFromCounts(s.read.parquet(s"$dir/pairs"),
      s.read.parquet(s"$dir/items"), k)

  /** PER-USER recommendations from the stored model: each history
    * item votes its neighbors with its cosine, votes sum per
    * candidate (exact BIGINT e6 sums), items the user already
    * touched are excluded, top-n per user by (score desc, item).
    * `history` = (user_id, item) rows — typically today's serving
    * batch, corpus-size-independent. */
  def recommendForUsers(s: SparkSession, dir: String, history: DataFrame,
                        n: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sims = scoredSym(s.read.parquet(s"$dir/pairs"),
        s.read.parquet(s"$dir/items"))
      .select(col("i").as("item"), col("j").as("rec_item"), col("cos_e6"))
    val votes = history.select(col("user_id"), col("item"))
      .join(sims, Seq("item"))
      .groupBy(col("user_id"), col("rec_item"))
      .agg(sum(col("cos_e6")).as("score_e6"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("score_e6").desc, col("rec_item"))
    votes
      .join(history.select(col("user_id"),
          col("item").as("rec_item")).distinct(),
        Seq("user_id", "rec_item"), "left_anti")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("user_id"), col("rank"), col("rec_item"), col("score_e6"))
      .orderBy(col("user_id"), col("rank"))
  }

  /** Incremental training: fold a batch of NEW USERS' interactions
    * into the model. EXACT — equals fresh training of the
    * concatenated interactions (count algebra; spec'd equal),
    * PROVIDED the batch's users are new: an existing user's new
    * items would need their stored history to pair against (see the
    * object doc). */
  def appendToCfModel(batchInter: DataFrame, dir: String): Unit = {
    val s = batchInter.sparkSession
    val pairs = s.read.parquet(s"$dir/pairs")
      .unionByName(pairCounts(batchInter))
      .groupBy(col("i"), col("j")).agg(sum(col("c")).as("c"))
    val items = s.read.parquet(s"$dir/items")
      .unionByName(itemCounts(batchInter))
      .groupBy(col("item")).agg(sum(col("n")).as("n"))
    graft.functions.Classify.swapRewrite(s, dir) { tmp =>
      pairs.write.parquet(s"$tmp/pairs")
      items.write.parquet(s"$tmp/items")
    }
  }

  /** Erasure: subtract the victim users' interactions (passed whole
    * by the caller — the forgetFromNbModel shape). Pair rows whose
    * count reaches zero disappear, items with no remaining users
    * disappear, and the result EQUALS a fresh training of the
    * surviving users (spec'd in ErasureSpec). */
  def forgetFromCfModel(victimInter: DataFrame, dir: String): Unit = {
    val s = victimInter.sparkSession
    val pairs = s.read.parquet(s"$dir/pairs")
      .unionByName(pairCounts(victimInter).withColumn("c", -col("c")))
      .groupBy(col("i"), col("j")).agg(sum(col("c")).as("c"))
      .filter(col("c") > 0)
    val items = s.read.parquet(s"$dir/items")
      .unionByName(itemCounts(victimInter).withColumn("n", -col("n")))
      .groupBy(col("item")).agg(sum(col("n")).as("n"))
      .filter(col("n") > 0)
    graft.functions.Classify.swapRewrite(s, dir) { tmp =>
      pairs.write.parquet(s"$tmp/pairs")
      items.write.parquet(s"$tmp/items")
    }
  }
}
