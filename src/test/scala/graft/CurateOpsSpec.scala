package graft

import org.apache.spark.sql.functions._
import graft.operators.Curate

/** split_stratified and sample_mixture: exact-quota semantics,
  * determinism across partitionings, and the contracts that separate
  * them from the hash-bucket split. */
class CurateOpsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val langSizes = docs.groupBy("lang").count().collect()
    .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("decontaminate_excise cuts the planted eval quote, keeps the framing") {
    val out = Curate.decontaminateExcise(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    // output covers exactly the train side: naturals + plants
    val nTrain = docs.filter(col("doc_id") % 50 =!= 0).count() +
      docs.filter(col("doc_id") % 50 === 0 && col("doc_id") < 150).count()
    assert(out.size.toLong == nTrain)
    val planted = out.keys.filter(_ >= 200000L).toSeq.sorted
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val r = out(id)
      assert(r.getAs[Int]("n_intervals") == 1, s"$id intervals")
      val removed = r.getAs[Int]("chars_removed")
      assert(removed >= 80 && removed <= 88, s"$id removed $removed")
      assert(r.getAs[String]("excised_text").contains("~"))
    }
    // an untouched doc keeps its text verbatim
    val clean = out.values.filter(_.getAs[Int]("n_intervals") == 0)
    assert(clean.nonEmpty)
    val texts = docs.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    clean.take(10).foreach { r =>
      assert(r.getAs[String]("excised_text") == texts(r.getLong(0)))
    }
  }

  test("decontaminate_excise shuffle form equals the broadcast form") {
    val docsAll = Tables.documents(spark, sf)
    val eval = docsAll.filter(col("doc_id") % 50 === 0)
    val train = docsAll.filter(col("doc_id") % 50 =!= 0)
    val b = Curate.decontaminateExcise(train, eval, broadcastEval = true)
      .collect().map(_.toSeq)
    val sh = Curate.decontaminateExcise(train, eval, broadcastEval = false)
      .collect().map(_.toSeq)
    assert(b.toSeq == sh.toSeq)
  }

  test("split_stratified hits exact floor quotas per stratum") {
    val split = Curate.splitStratified(docs)
    // partition: every doc assigned exactly once
    assert(split.count() == docs.count())
    val byLang = split.groupBy("lang", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    langSizes.foreach { case (lang, n) =>
      val train = byLang.getOrElse((lang, "train"), 0L)
      val v = byLang.getOrElse((lang, "val"), 0L)
      val test = byLang.getOrElse((lang, "test"), 0L)
      assert(train == math.floor(n * 0.8).toLong, s"$lang train")
      assert(train + v == math.floor(n * 0.9).toLong, s"$lang val")
      assert(train + v + test == n, s"$lang total")
    }
  }

  test("split_stratified is deterministic across repartitionings") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(rows(Curate.splitStratified(docs.repartition(7))) ==
      rows(Curate.splitStratified(docs)))
  }

  test("sample_mixture takes min(quota, stratum) per language, deterministically") {
    val quotas = Curate.mixQuotas(Curate.DefaultMixWeights, Curate.DefaultMixBudget)
    val got = Curate.sampleMixture(docs, Curate.DefaultMixWeights,
      Curate.DefaultMixBudget)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    quotas.foreach { case (lang, q) =>
      val expect = math.min(q, langSizes.getOrElse(lang, 0L))
      assert(byLang.getOrElse(lang, 0L) == expect, s"$lang quota")
    }
    // no language outside the mix leaks in
    assert(byLang.keySet.subsetOf(quotas.keySet))
    // the sample is a stable subset: same ids on every run/partitioning
    val again = Curate.sampleMixture(docs.repartition(5),
      Curate.DefaultMixWeights, Curate.DefaultMixBudget)
    assert(got.collect().map(_.getLong(0)).toSeq ==
      again.collect().map(_.getLong(0)).toSeq)
  }

  test("training-shard export: lossless, budget-bounded, manifest-exact") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val budget = 500L
    val manifest = Curate.writeTrainingShards(docs, dir, budget)
    val back = spark.read.json(s"$dir/shards")
    // lossless round trip: every doc comes back with its text intact
    val orig = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val got = back.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == orig)
    // budget: docs are never split, so a shard holds < budget + its
    // last doc's tokens; with maxDoc the corpus max that bounds every
    // shard strictly
    val maxDoc = back.agg(max(col("n_tokens"))).head().getLong(0)
    val over = manifest.filter(col("n_tokens") >= lit(budget) + lit(maxDoc))
    assert(over.count() == 0)
    // every shard except each lang's last is FULL (>= budget - maxDoc
    // would be weak; the prefix-sum guarantees the next doc overflows)
    val lastPerLang = manifest.groupBy("lang")
      .agg(max(col("shard_id")).as("last"))
    val notLast = manifest.join(lastPerLang, Seq("lang"))
      .filter(col("shard_id") =!= col("last"))
    assert(notLast.filter(col("n_tokens") < lit(budget) - lit(maxDoc))
      .count() == 0)
    // manifest matches a recount from the shards on disk
    val recount = back.groupBy(col("lang"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .collect().map(_.toSeq).toSet
    assert(manifest.collect().map(_.toSeq).toSet == recount)
  }

  test("sample_weighted matches a driver-side A-ES reference draw") {
    val k = 50
    val got = Curate.sampleWeighted(
      docs.select(col("doc_id"), col("lang"), col("n_chars")), "n_chars", k)
    val ids = got.collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(ids.length == k && ids.distinct.length == k)
    // reference: same md5-derived uniform and key formula, computed
    // independently on the driver
    def refKey(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"wsample:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h * 2 + 1).toDouble / 9007199254740992.0
      val l9 = BigDecimal(math.log(u))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      BigDecimal(-l9 / w).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val all = docs.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = all.map { case (id, w) => (refKey(id, w), id) }
      .sorted.take(k).map(_._2).toSeq
    assert(ids == want)
    // determinism across partitionings
    val again = Curate.sampleWeighted(
      docs.repartition(13).select(col("doc_id"), col("lang"), col("n_chars")),
      "n_chars", k).collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(again == ids)
    // weight-sensitivity: the draw is NOT the unweighted one
    val unweighted = Curate.sampleWeighted(
      docs.select(col("doc_id"), col("lang"), lit(1L).as("w")), "w", k)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(unweighted != ids)
  }

  test("sample_temperature flattens the language mix with exact-integer quotas") {
    val budget = 250L
    val got = Curate.sampleTemperature(docs, budget).collect()
    val natural = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver reference: exact-integer quota arithmetic replayed
    val sInt = natural.map { case (l, n) =>
      l -> math.floor(math.sqrt(n.toDouble) * 1e9 + 0.5).toLong }
    val w = sInt.values.sum
    val wantQuota = sInt.map { case (l, si) =>
      l -> (budget * si / w) } // positive longs: / == floor-div
    val gotQuota = got.map(r =>
      r.getAs[String]("lang") -> r.getAs[Int]("quota").toLong).toMap
    assert(gotQuota == wantQuota, s"$gotQuota vs $wantQuota")
    // each language contributes exactly its quota (all quotas bind on
    // this corpus), total within budget
    val perLang = got.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.length.toLong).toMap
    perLang.foreach { case (l, n) =>
      assert(n == math.min(wantQuota(l), natural(l)), s"$l drew $n") }
    assert(perLang.values.sum <= budget)
    // α=0.5 FLATTENS: the head language's sampled share is strictly
    // below its natural share, the smallest language's share above
    val head = natural.maxBy(_._2)._1
    val tail = natural.minBy(_._2)._1
    assert(perLang(head).toDouble / perLang.values.sum <
      natural(head).toDouble / natural.values.sum, "head not flattened")
    assert(perLang(tail).toDouble / perLang.values.sum >
      natural(tail).toDouble / natural.values.sum, "tail not boosted")
    // deterministic across partitionings
    val again = Curate.sampleTemperature(docs.repartition(13), budget)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(again == got.map(_.getAs[Long]("doc_id")).sorted.toSeq)
  }

  test("sample_weighted drops non-positive weights instead of misdrawing them") {
    import spark.implicits._
    // w=0 gave key=+Inf (silently never drawn) and w<0 a negative key
    // that sorted FIRST (always drawn) — both now excluded explicitly
    val rows = Seq((1L, 10L), (2L, 0L), (3L, -5L), (4L, 7L), (5L, 3L))
      .toDF("doc_id", "w")
    val ids = Curate.sampleWeighted(rows, "w", k = 5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(1L, 4L, 5L), ids.toString)
  }

  // ---- mixture-execution trio (r12) --------------------------------------

  test("mixture_plan epochs match a driver-side recompute") {
    val plan = Curate.mixturePlan(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4))).toMap
    val toks = docs.select(col("lang"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")
          .as("t"))
      .groupBy("lang").agg(sum("t").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = Curate.DefaultTargetPpm.toMap
    assert(plan.keySet == targets.keySet)
    plan.foreach { case (lang, (nDocs, nTokens, ppm, epochs)) =>
      assert(nDocs == langSizes(lang))
      assert(nTokens == toks(lang))
      assert(ppm.toLong == targets(lang))
      assert(epochs == targets(lang) * Curate.DefaultMixTokenBudget / nTokens,
        s"$lang epochs")
    }
  }

  test("upsample_epochs copies match the plan's integer bernoulli exactly") {
    val plan = Curate.mixturePlan(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val copies = Curate.upsampleEpochs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // copies are dense 1..n per doc
    val byDoc = copies.groupBy(_._1)
    byDoc.foreach { case (id, cs) =>
      assert(cs.map(_._3).sorted.toSeq == (1 to cs.length).toSeq, s"doc $id")
    }
    // per-doc count equals the deterministic formula
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.select("doc_id", "lang").collect().foreach { r =>
      val id = r.getLong(0); val lang = r.getString(1)
      val hex = md.digest(s"epoch:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val hv = java.lang.Long.parseLong(hex, 16)
      val e = plan(lang)
      val expected = e / 1000000 + (if (hv % 1000000 < e % 1000000) 1 else 0)
      assert(byDoc.get(id).map(_.length).getOrElse(0) == expected.toInt,
        s"doc $id copies")
    }
    // and the realized token mass lands near the target shares: each
    // language's share of upsampled tokens within 3 points of target
    val up = Curate.upsampleEpochs(spark, sf)
      .join(docs.select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")
          .as("t")), "doc_id")
      .groupBy("lang").agg(sum("t").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = up.values.sum.toDouble
    Curate.DefaultTargetPpm.foreach { case (lang, ppm) =>
      val share = up(lang) / total
      assert(math.abs(share - ppm / 1e6) < 0.03, s"$lang share $share")
    }
  }

  test("shuffle_interleave keeps every prefix proportionally mixed") {
    val rows = Curate.shuffleInterleave(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == docs.count())
    val n = rows.length
    // at every 20% prefix, each language holds its share of that
    // prefix within a few docs (the property a plain global shuffle
    // only gives in expectation; this order guarantees it)
    Seq(0.2, 0.4, 0.6, 0.8).foreach { p =>
      val prefix = rows.take((n * p).toInt).groupBy(_._2)
        .view.mapValues(_.length).toMap
      langSizes.foreach { case (lang, total) =>
        val expected = total * p
        val got = prefix.getOrElse(lang, 0)
        assert(math.abs(got - expected) <= 3,
          s"prefix $p lang $lang: $got vs $expected")
      }
    }
    // deterministic across repartitionings
    val again = Curate.shuffleInterleave(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(again.toSeq == rows.toSeq)
  }

  test("dsir importance weights separate the target domain; artifact round-trips") {
    // the natural corpus is a uniform shared-vocabulary soup (langid
    // blindness note) — DSIR's mechanism must be proven on a crafted
    // pool with genuinely distinct domain distributions
    import spark.implicits._
    val tech = (0L until 20L).map(i =>
      (i, "tech", s"gpu cuda tensor shader gpu kernel cuda warp $i"))
    val food = (100L until 120L).map(i =>
      (i, "food", s"bread cheese olive basil bread oven cheese dough $i"))
    val pool = (tech ++ food).toDF("doc_id", "lang", "text")
    val feats = Curate.dsirDocFeats(pool, Curate.DsirBuckets)
    val lam = Curate.dsirLambda(feats, col("lang") === "tech")
    val scored = Curate.dsirScore(feats, lam).collect()
      .map(r => r.getLong(0) -> r.getDecimal(3).doubleValue()).toMap
    // every target-domain doc outweighs every off-domain doc, with
    // the signs the log-ratio predicts (target grams enriched vs the
    // pool -> positive; off-domain grams at the smoothing floor of
    // the target model -> negative)
    val techW = tech.map(t => scored(t._1))
    val foodW = food.map(t => scored(t._1))
    assert(techW.min > foodW.max)
    assert(techW.min > 0 && foodW.max < 0)
    // top-k selection keeps exactly the target-domain docs
    val top = Curate.dsirSelect(pool, col("lang") === "tech",
      Curate.DsirBuckets, 20).collect()
    assert(top.map(_.getLong(0)).toSet == tech.map(_._1).toSet)
    // n_grams accounting: unigrams + bigrams of the 9-token docs
    assert(top.forall(_.getAs[Long]("n_grams") == 9 + 8))
    // the λ artifact round-trips through parquet bit-exactly
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    Curate.writeDsirLambda(lam, s"$dir/lam")
    val re = Curate.dsirScore(feats, Curate.readDsirLambda(spark, s"$dir/lam"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(3)).toMap
    val orig = Curate.dsirScore(feats, lam)
      .collect().map(r => r.getLong(0) -> r.getDecimal(3)).toMap
    assert(re == orig)
  }
  test("mixture_reweight: DoReMi step — boosts follow excess, weights and ppm consistent") {
    val rows = Curate.mixtureReweight(spark, sf).collect()
    assert(rows.length >= 2)
    // boost is monotone in excess (exp is), weights renormalize to 1
    // within 6-dp rounding, and the smoothed ppm sums to ~1e6
    val sorted = rows.sortBy(_.getAs[Double]("excess"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("boost") <= b.getAs[Double]("boost"))
    }
    val wSum = rows.map(_.getAs[Double]("w")).sum
    assert(math.abs(wSum - 1.0) < 1e-5, s"weights sum to $wSum")
    val ppmSum = rows.map(_.getAs[Long]("target_ppm")).sum
    assert(math.abs(ppmSum - 1000000L) <= rows.length,
      s"ppm sums to $ppmSum")
    // uniform smoothing floors every source at c/k of the budget
    val k = rows.length
    rows.foreach { r =>
      assert(r.getAs[Long]("target_ppm") >= (500000L / k) - 1,
        s"${r.getAs[String]("lang")} fell through the smoothing floor")
    }
    // the update genuinely moved mass: some source differs from its
    // corpus share by more than rounding
    assert(rows.exists(r => math.abs(r.getAs[Double]("w") -
      r.getAs[Double]("share")) > 1e-4))
  }
}
