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

  /** Scala mirror of the bpe_segment ORACLE's recursion step:
    * iterated leftmost replace-FIRST of ' a b ' → ' ab ' on the
    * space-delimited symbol string, one merge at a time in training
    * order. The oracle's correctness rests on this equaling
    * Bpe.encode's greedy left-to-right pass. */
  private def oracleEncode(word: String,
                           merges: Seq[(String, String)]): Seq[String] = {
    var s = " " + Bpe.toSymbols(word).mkString(" ") + " "
    merges.foreach { case (a, b) =>
      val pat = s" $a $b "
      val rep = s" $a$b "
      var i = s.indexOf(pat)
      while (i >= 0) {
        s = s.substring(0, i) + rep + s.substring(i + pat.length)
        i = s.indexOf(pat)
      }
    }
    s.trim.split(" ").toSeq
  }

  test("oracle replay (iterated leftmost replace-first) equals Bpe.encode") {
    // the adversarial shapes: odd/even runs of one symbol (where a
    // replace-ALL chain diverges because consumed delimiters hide the
    // next overlapping occurrence), merges whose output feeds later
    // merges, and a merge pair that is a suffix of another symbol
    val merges1 = Seq(("a", "a"), ("aa", "aa"), ("aa", "a"))
    for (w <- Seq("a", "aa", "aaa", "aaaa", "aaaaa", "aaaaaaaa", "baaab"))
      assert(oracleEncode(w, merges1) == Bpe.encode(w, merges1), s"word $w")
    val merges2 = Seq(("x", "a"), ("a", "b"), ("xa", "b"), ("b", "xa"))
    for (w <- Seq("xab", "xaxab", "abxa", "xaab", "bxaxa"))
      assert(oracleEncode(w, merges2) == Bpe.encode(w, merges2), s"word $w")
    // randomized sweep over a 3-letter alphabet (dense in run/overlap
    // collisions) with REAL trained merges for the same vocab
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(300)(
      (0 until (1 + rnd.nextInt(10))).map(_ => "ab c"(rnd.nextInt(4))).mkString
        .replace(" ", "")).filter(_.nonEmpty)
    val vocab = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val trained = Bpe.trainMergesLocal(vocab.toSeq, 25)
    words.foreach { w =>
      assert(oracleEncode(w, trained) == Bpe.encode(w, trained),
        s"word $w merges $trained")
    }
  }

  test("bpe_segment query matches a driver-side re-encode of its words") {
    val df = SparkEntry.queries("bpe_segment")(spark, sf)
    val merges = Bpe.trainedMerges(spark, sf, Bpe.SegMerges)
    val rows = df.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val w = r.getAs[String]("word")
      val toks = Bpe.encode(w, merges)
      assert(r.getAs[String]("tokens") == toks.mkString(" "), s"word $w")
      assert(r.getAs[Int]("n_tokens") == toks.length, s"word $w")
      assert(toks.mkString.stripSuffix("</w>") == w, s"round-trip $w")
    }
  }

  test("bpe_token_count matches a driver-side recount under the same merges") {
    import org.apache.spark.sql.functions.{col, explode, lower, split}
    val merges = Bpe.trainedMerges(spark, sf, Bpe.SegMerges)
    val got = SparkEntry.queries("bpe_token_count")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bpe_tokens"), r.getAs[Long]("words"))).toMap
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val re = "^[a-z0-9]+$".r
    docs.foreach { case (id, text) =>
      val ws = text.toLowerCase.split("\\s+").filter(w =>
        w.nonEmpty && re.findFirstIn(w).isDefined)
      if (ws.isEmpty) assert(!got.contains(id), s"doc $id should be absent")
      else {
        val (bt, n) = got(id)
        assert(n == ws.length, s"doc $id word count")
        assert(bt == ws.map(w => Bpe.encode(w, merges).length.toLong).sum,
          s"doc $id token count")
      }
    }
  }

  test("merge artifact round-trips through parquet in training order") {
    val merges = graft.functions.Bpe.trainMerges(spark, sf, 20)
    val dir = java.nio.file.Files.createTempDirectory("bpemerges")
      .toString + "/merges"
    graft.functions.Bpe.writeMerges(spark, merges, dir)
    assert(graft.functions.Bpe.readMerges(spark, dir) == merges)
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
