package graft

import graft.functions.{Bpe, Wordpiece}

/** WordPiece tokenizer: the incremental trainer is equality-spec'd
  * against a full-recount naive reference, MaxMatch encoding against
  * its defining greedy property, and the artifact round-trips
  * bit-identically. */
class WordpieceSpec extends SparkSpec {

  private lazy val vocab =
    Bpe.wordVocab(Tables.documents(spark, sf)).cache()

  private lazy val localVocab: Seq[(String, Long)] = vocab
    .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    .filter(_._1.matches(Wordpiece.WordRe))

  private lazy val pieces = Wordpiece.trainWordpiece(vocab)

  test("incremental trainer equals the naive full-recount reference") {
    val naive = Wordpiece.trainWordpieceNaive(localVocab)
    assert(pieces == naive,
      s"incremental ${pieces.size} pieces != naive ${naive.size}")
  }

  test("trained pieces: char coverage and merge budget") {
    val ps = pieces.toSet
    // every char of every replayable word survives — bare at word
    // start, ##-prefixed as continuation — so encode is total
    localVocab.map(_._1).foreach { w =>
      assert(ps.contains(w.take(1)), s"missing initial '${w.take(1)}'")
      w.drop(1).foreach(c =>
        assert(ps.contains("##" + c), s"missing continuation '##$c'"))
    }
    // alphabet + at most one new symbol per merge
    val alphabet = localVocab.map(_._1).flatMap { w =>
      w.take(1) +: w.drop(1).map("##" + _)
    }.toSet
    assert(pieces.size <= alphabet.size + Wordpiece.WpMerges)
    assert(alphabet.subsetOf(ps))
  }

  test("vocab truncation is observable, deterministic, and trains the top words") {
    // the no-silent-caps rule: past the driver budget, training uses
    // the top-limit words by (count DESC, word) and SAYS SO
    val limit = 25
    val r = Wordpiece.trainWordpieceWithReport(vocab, limit = limit)
    assert(r.truncated && r.trainedWords == limit &&
      r.vocabWords == localVocab.length.toLong)
    val expectedTop = localVocab
      .sortBy { case (w, c) => (-c, w) }.take(limit)
    assert(r.pieces == Wordpiece.trainWordpieceLocal(expectedTop))
    // under the budget: no truncation, full vocab trained
    val full = Wordpiece.trainWordpieceWithReport(vocab)
    assert(!full.truncated &&
      full.trainedWords == localVocab.length.toLong &&
      full.pieces == pieces)
  }

  test("encode is total over corpus words, concatenates back, and is greedy") {
    val ps = pieces.toSet
    localVocab.map(_._1).foreach { w =>
      val toks = Wordpiece.encode(w, ps)
        .getOrElse(fail(s"'$w' hit [UNK]"))
      assert(toks.map(_.stripPrefix("##")).mkString("") == w)
      assert(toks.tail.forall(_.startsWith("##")))
      assert(!toks.head.startsWith("##"))
      assert(toks.forall(ps.contains))
      // the greedy property: each piece is the LONGEST vocab match at
      // its position (independent re-scan)
      var pos = 0
      toks.foreach { t =>
        val longest = (w.length to (pos + 1) by -1).find { j =>
          ps.contains((if (pos == 0) "" else "##") + w.substring(pos, j))
        }.get
        assert(t.stripPrefix("##").length == longest - pos,
          s"'$w'@$pos: '$t' is not the longest match")
        pos = longest
      }
    }
  }

  test("encode returns None when a position has no piece (UNK)") {
    assert(Wordpiece.encode("q7", Set("q", "##x")).isEmpty)
    assert(Wordpiece.encode("ab", Set("##a", "##b")).isEmpty)
  }

  test("piece artifact round-trips bit-identically") {
    val dir = java.nio.file.Files
      .createTempDirectory("wp_pieces").toString + "/pieces"
    Wordpiece.writePieces(spark, pieces, dir)
    assert(Wordpiece.readPieces(spark, dir) == pieces)
  }

  test("frequent words become single pieces; the long tail still splits") {
    val ps = pieces.toSet
    val byCount = localVocab.sortBy { case (w, c) => (-c, w) }
    val top = byCount.take(5).map(_._1)
    val encoded = top.map(w => Wordpiece.encode(w, ps).get)
    assert(encoded.count(_.length == 1) >= 1,
      s"no frequent word earned a whole-word piece: $top -> $encoded")
    assert(localVocab.map(_._1).exists(w =>
      Wordpiece.encode(w, ps).get.length > 1),
      "every word became a single piece — merge budget degenerate")
  }
}
