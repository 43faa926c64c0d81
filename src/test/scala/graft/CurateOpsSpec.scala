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
}
