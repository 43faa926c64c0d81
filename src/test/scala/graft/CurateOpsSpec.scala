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
}
