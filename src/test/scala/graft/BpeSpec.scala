package graft

import graft.functions.Bpe

/** The distributed BPE trainer must agree with an independent
  * single-process reference implementation of the same algorithm
  * (greedy most-frequent adjacent pair, lexicographic tie-break,
  * non-overlapping left-to-right merge application). */
class BpeSpec extends SparkSpec {

  /** Reference trainer over an in-memory word-count map. */
  private def referenceMerges(vocab: Map[String, Long],
                              numMerges: Int): Seq[(String, String)] = {
    var words = vocab.toSeq.map { case (w, c) => (Bpe.toSymbols(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long].withDefaultValue(0L)
      words.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) += c)
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (Bpe.applyMerge(syms, best), c) }
      }
      round += 1
    }
    merges.toSeq
  }

  test("trained merges equal the reference implementation on the corpus") {
    val docs = Tables.documents(spark, sf)
    val vocabDf = Bpe.wordVocab(docs)
    val vocab = vocabDf.collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("count")).toMap
    assert(vocab.nonEmpty)
    val k = 12
    // production path (driver-side incremental trainer)
    val got = Bpe.trainMerges(vocabDf, k)
    val expected = referenceMerges(vocab, k)
    assert(got == expected, s"got $got\nexpected $expected")
    // merges are deterministic across repartitionings
    val again = Bpe.trainMerges(vocabDf.repartition(7), k)
    assert(again == got)
    // the distributed out-of-core fallback trains the SAME merges
    val dist = Bpe.trainMergesDistributed(vocabDf, k)
    assert(dist == expected, s"distributed $dist\nexpected $expected")
  }

  test("incremental local trainer handles overlap/retraction edge cases") {
    // overlapping pair occurrences ("aaaa"), merges that create new
    // pairs of merged symbols, and exhaustion before numMerges — the
    // cases where incremental count maintenance can silently drift
    // from the full-recount reference
    val vocab = Map("aaaa" -> 5L, "aab" -> 3L, "abab" -> 2L, "b" -> 7L)
    for (k <- Seq(1, 3, 8, 50)) {
      val got = Bpe.trainMergesLocal(vocab.toSeq, k)
      assert(got == referenceMerges(vocab, k), s"k=$k")
    }
    // vocab order must not matter
    assert(Bpe.trainMergesLocal(vocab.toSeq.reverse, 8) ==
      Bpe.trainMergesLocal(vocab.toSeq, 8))
  }

  test("trained merges tokenize: frequent words collapse to fewer symbols") {
    val merges = Bpe.trainMerges(spark, sf, numMerges = 30)
    assert(merges.length == 30)
    // the corpus's most frequent word should end up fully merged or
    // nearly so — far fewer symbols than characters
    val top = Bpe.wordVocab(Tables.documents(spark, sf))
      .orderBy(org.apache.spark.sql.functions.col("count").desc)
      .limit(1).collect().head.getAs[String]("word")
    val encoded = Bpe.encode(top, merges)
    assert(encoded.length < top.length,
      s"'$top' did not compress: $encoded")
    // round-trip: concatenating symbols (minus the EOW marker)
    // reconstructs the word
    assert(encoded.mkString.stripSuffix("</w>") == top)
  }
}
