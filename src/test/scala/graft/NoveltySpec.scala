package graft

import graft.operators.Curate
import org.apache.spark.sql.functions._

class NoveltySpec extends SparkSpec {

  test("copied, half-novel, and fully-novel eval docs score exactly") {
    import spark.implicits._
    val train = Seq((1L, "en", "a b c d e f")).toDF("doc_id", "lang", "text")
    val eval = Seq(
      (10L, "en", "a b c d e f"),     // exact copy: 4 shingles, all seen
      (11L, "en", "a b c x y z"),     // 1 of 4 shingles seen
      (12L, "en", "p q r s t u")      // fully novel
    ).toDF("doc_id", "lang", "text")
    val got = Curate.ngramNovelty(train, eval, 3)
      .select(col("doc_id"), col("n_ngrams"), col("n_seen"), col("novel_frac"))
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(10L) == ((10L, 4L, 4L, 0.0)))
    assert(got(11L) == ((11L, 4L, 1L, 0.75)))
    assert(got(12L) == ((12L, 4L, 0L, 1.0)))
  }

  test("the broadcast-eval serve form equals the shuffle form") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val trainSh = Dedup.shingles(docs.filter(col("doc_id") % 5 =!= 0), 3)
      .select(col("shingle")).distinct()
    val evalSh = Dedup.shingles(docs.filter(col("doc_id") % 5 === 0), 3)
      .select(col("doc_id"), col("shingle"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val serve = rows(Curate.ngramNoveltyServe(trainSh, evalSh))
    assert(serve.nonEmpty)
    assert(serve == rows(Curate.ngramNoveltySh(trainSh, evalSh)))
  }

  test("corpus novelty rows replay their ratio and stay in bounds") {
    import spark.implicits._
    val rows = SparkEntry.queries("text_ngram_novelty")(spark, sf)
      .select(col("doc_id"), col("n_ngrams"), col("n_seen"), col("novel_frac"))
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (id, n, k, f) =>
      assert(n >= 1 && k >= 0 && k <= n, s"doc $id")
      assert(f == r6((n - k).toDouble / n.toDouble), s"doc $id")
      assert(id % 5 == 0) // only the eval split is scored
    }
  }
}
