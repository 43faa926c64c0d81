package graft

import graft.functions.TokenizerStats
import org.apache.spark.sql.functions._

class TokenizerStatsSpec extends SparkSpec {

  test("fertility totals tie out to the per-doc token-count queries") {
    val fert = TokenizerStats.tokenizerFertility(spark, sf).collect()
      .map(r => r.getAs[String]("tokenizer") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens")))).toMap
    assert(fert.keySet == Set("bpe", "unigram", "wordpiece"))

    def totals(q: String, tokCol: String): (Long, Long) = {
      val t = SparkEntry.queries(q)(spark, sf)
        .agg(sum(col("words")), sum(col(tokCol))).head()
      (t.getLong(0), t.getLong(1))
    }
    assert(fert("bpe") == totals("bpe_token_count", "bpe_tokens"))
    assert(fert("unigram") == totals("unigram_token_count", "uni_tokens"))
    assert(fert("wordpiece") == totals("wordpiece_token_count", "wp_tokens"))
  }

  test("fertilityOn/coverageOn (the day-gate forms) reproduce the query rows") {
    import graft.functions.{Bpe, TokenizerStats}
    val docs = Tables.documents(spark, sf)
    val merges = Bpe.trainedMerges(spark, sf, Bpe.SegMerges)
    val alphabet = TokenizerStats.trainedAlphabet(spark, sf).toSet
    val fOn = TokenizerStats.fertilityOn(docs, "bpe",
      w => Bpe.encode(w, merges).length).collect().head.toSeq
    val fQuery = TokenizerStats.tokenizerFertility(spark, sf)
      .filter(col("tokenizer") === "bpe").collect().head.toSeq
    assert(fOn == fQuery)
    val cOn = TokenizerStats.coverageOn(docs, "bpe",
      w => if (w.forall(alphabet.contains)) Some(Bpe.encode(w, merges).length)
           else None,
      probes = TokenizerStats.OovProbes).collect().head.toSeq
    val cQuery = TokenizerStats.tokenizerCoverage(spark, sf)
      .filter(col("tokenizer") === "bpe").collect().head.toSeq
    assert(cOn == cQuery)
  }

  test("coverage flags the injected OOV probes and only them as uncovered") {
    val rows = TokenizerStats.tokenizerCoverage(spark, sf).collect()
      .map(r => r.getAs[String]("tokenizer") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_covered"),
          r.getAs[Long]("n_oov"), r.getAs[Long]("n_whole"),
          r.getAs[Int]("max_pieces")))).toMap
    assert(rows.keySet == Set("bpe", "unigram", "wordpiece"))
    // the corpus alphabet lacks x/z, so all four injected probes are
    // OOV for every tokenizer; every natural corpus word is covered
    rows.foreach { case (tok, (w, c, o, whole, maxP)) =>
      assert(o == TokenizerStats.OovProbes.length, s"$tok oov=$o")
      assert(c == w - o, tok)
      assert(whole <= c && maxP >= 1, tok)
    }
    // all three see the same probe vocabulary
    assert(rows.values.map(_._1).toSet.size == 1)
  }

  test("fertility ratios replay from the totals and sit in sane ranges") {
    TokenizerStats.tokenizerFertility(spark, sf).collect().foreach { r =>
      val (w, c, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_tokens"))
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("tokens_per_word") == r6(t.toDouble / w.toDouble))
      assert(r.getAs[Double]("chars_per_token") == r6(c.toDouble / t.toDouble))
      // every word is >= 1 token; no token is shorter than a char
      assert(t >= w && c >= t)
    }
  }
}
