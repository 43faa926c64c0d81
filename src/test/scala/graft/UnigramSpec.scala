package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bpe, Unigram}

/** Unigram-LM tokenizer: the distributed trainer is equality-spec'd
  * against an independent single-process reference, the Viterbi DP
  * against exhaustive enumeration, and the structural guarantees
  * (coverage, vocab budget, char floor) hold on the trained
  * artifact. */
class UnigramSpec extends SparkSpec {

  private lazy val vocab =
    Bpe.wordVocab(Tables.documents(spark, sf)).cache()

  private lazy val localVocab: Seq[(String, Long)] = vocab
    .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

  private lazy val pieces = Unigram.trainUnigram(vocab)

  test("distributed trainer equals the single-process reference") {
    val local = Unigram.trainUnigramLocal(localVocab)
    assert(pieces == local,
      s"distributed ${pieces.size} pieces != local ${local.size}")
  }

  test("trained pieces: char coverage, vocab budget, valid nanologs") {
    val ps = pieces.map(_._1).toSet
    // every char of every replayable word is a piece (coverage floor)
    val chars = localVocab.map(_._1).filter(_.matches("^[a-z0-9]+$"))
      .flatMap(_.map(_.toString)).toSet
    assert(chars.subsetOf(ps), s"missing chars: ${chars -- ps}")
    assert(pieces.size <= math.max(Unigram.UniVocabSize, chars.size))
    // nanologs are genuine log-probabilities: negative, and sum of
    // exp within a few ppm of 1 (grid rounding)
    assert(pieces.forall(_._2 < 0L))
    val psum = pieces.map(p => math.exp(p._2 / 1e9)).sum
    assert(math.abs(psum - 1.0) < 1e-6, s"prob mass $psum")
  }

  test("Viterbi DP equals exhaustive enumeration on every corpus word") {
    val nl = pieces.toMap
    localVocab.map(_._1).filter(_.matches("^[a-z0-9]+$")).foreach { w =>
      assert(Unigram.segment(w, nl) == Unigram.segmentEnum(w, nl),
        s"DP != enumeration for '$w'")
    }
    // and on adversarial synthetic runs (the tie-break stress shape)
    Seq("aaaa", "abab", "aabb", "zzzzzzzzz").foreach { w =>
      assert(Unigram.segment(w, nl) == Unigram.segmentEnum(w, nl),
        s"DP != enumeration for '$w'")
    }
  }

  test("segmentations concatenate back to the word; long words split") {
    val nl = pieces.toMap
    val words = localVocab.map(_._1).filter(_.matches("^[a-z0-9]+$"))
    words.foreach { w =>
      val toks = Unigram.segment(w, nl)
        .getOrElse(fail(s"'$w' not segmentable"))
      assert(toks.mkString("") == w)
      assert(toks.forall(_.nonEmpty))
    }
    // maxPieceLen forces 7+-char words into >= 2 pieces
    words.filter(_.length > Unigram.MaxPieceLen).foreach { w =>
      assert(Unigram.segment(w, nl).get.length >= 2)
    }
  }

  test("piece artifact round-trips through parquet bit-identically") {
    val dir = java.nio.file.Files.createTempDirectory("unipieces")
      .toString + "/pieces"
    Unigram.writePieces(spark, pieces, dir)
    assert(Unigram.readPieces(spark, dir) == pieces)
  }

  test("unigram_segment and unigram_token_count queries return coherent rows") {
    val seg = functions.Unigram.unigramSegment(spark, sf).collect()
    assert(seg.nonEmpty)
    seg.foreach { r =>
      assert(r.getAs[String]("tokens").split(" ").mkString("") ==
        r.getAs[String]("word"))
      assert(r.getAs[Int]("n_tokens") ==
        r.getAs[String]("tokens").split(" ").length)
    }
    val cnt = functions.Unigram.unigramTokenCount(spark, sf)
    // every doc has replayable words in this corpus -> every doc rows
    assert(cnt.count() == Tables.documents(spark, sf).count())
    // token counts are >= word counts (a word is >= 1 piece)
    assert(cnt.filter(col("uni_tokens") < col("words")).count() == 0)
  }
}
