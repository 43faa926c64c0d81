package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** tokenizer_fertility — the cross-tokenizer COMPRESSION report
  * (SURVEY.md §2b): tokens-per-word (fertility) and chars-per-token
  * for each of the three trained subword tokenizers (BPE, unigram-LM,
  * WordPiece) over the same corpus word stream. This is the table a
  * pipeline publishes before committing a tokenizer choice at 100 TB:
  * fertility drives the packing budget (sequences per document), the
  * compute bill (tokens ARE the training cost), and multilingual
  * fairness audits (a high-fertility language pays more compute per
  * word of content).
  *
  * Scale shape: ONE corpus tokenize pass collapses to the DISTINCT
  * vocabulary with occurrence counts (vocab-sized — the token-count
  * queries' discipline), each tokenizer encodes the vocab once in a
  * typed map, and the totals are Σ n_occ·f(word) over the tiny vocab
  * frame — the corpus is scanned once however many tokenizers are
  * compared. All counts exact BIGINTs; the two ratios are one double
  * division each, rounded 6 dp.
  */
object TokenizerStats {

  def tokenizerFertility(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .filter(col("word").rlike(Bpe.SegWordRe))
    // vocab-sized; localCheckpoint is safe here: the three trainers
    // below already force actions before this operator returns
    val vocab = words.groupBy(col("word"))
      .agg(count(lit(1)).as("n_occ"))
      .localCheckpoint()
    val distinctWords = vocab.select(col("word")).as[String]

    val merges = Bpe.trainedMerges(s, d, Bpe.SegMerges)
    val uniPieces = Unigram.trainedPieces(s, d, Unigram.UniVocabSize).toMap
    val wpPieces = Wordpiece.trainedPieces(s, d, Wordpiece.WpMerges).toSet
    val bpeWt = distinctWords
      .map(w => (w, Bpe.encode(w, merges).length))
      .toDF("word", "w_tokens")
    val uniWt = distinctWords
      .map(w => (w, Unigram.segment(w, uniPieces).map(_.length).getOrElse(0)))
      .toDF("word", "w_tokens")
    val wpWt = distinctWords
      .map(w => (w, Wordpiece.encode(w, wpPieces).map(_.length).getOrElse(1)))
      .toDF("word", "w_tokens")

    def report(name: String, wt: DataFrame): DataFrame =
      vocab.join(broadcast(wt), "word")
        .agg(sum(col("n_occ")).as("n_words"),
          sum(col("n_occ") * length(col("word"))).as("n_chars"),
          sum(col("n_occ") * col("w_tokens")).as("n_tokens"))
        .select(lit(name).as("tokenizer"),
          col("n_words"), col("n_chars"), col("n_tokens"),
          round(col("n_tokens").cast("double") /
            col("n_words").cast("double"), 6).as("tokens_per_word"),
          round(col("n_chars").cast("double") /
            col("n_tokens").cast("double"), 6).as("chars_per_token"))

    report("bpe", bpeWt)
      .unionByName(report("unigram", uniWt))
      .unionByName(report("wordpiece", wpWt))
      .orderBy(col("tokenizer"))
  }

  /** OOV probe words injected into the coverage report. The corpus
    * alphabet genuinely lacks 'x' and 'z' (24 of 26 letters appear),
    * so these exercise REAL out-of-vocabulary behavior: unigram has
    * no covering piece, WordPiece MaxMatch dead-ends (UNK), and BPE
    * keeps the unseen char as an untrained singleton symbol. */
  private[graft] val OovProbes = Seq("zebra", "taxi", "zz", "lynx")

  /** The trained character alphabet: distinct chars of the corpus
    * vocabulary words (bounded ≤ 36 — one tiny collect). */
  private[graft] def trainedAlphabet(s: SparkSession, d: String): Seq[Char] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .filter(col("word").rlike(Bpe.SegWordRe))
      .as[String].flatMap(w => w.map(_.toString)).distinct()
      .collect().sorted.map(_.head).toSeq
  }

  /** tokenizer_coverage — the OOV/ROBUSTNESS half of the tokenizer
    * report (tokenizer_fertility is the compression half): per
    * tokenizer, how much of the probe vocabulary (corpus words +
    * injected OOV probes) it can represent at all — covered words,
    * OOV words, whole-word (single-piece) words, and the worst
    * per-word piece count. A tokenizer is committed on BOTH tables:
    * fertility prices the compute, coverage prices the UNK rate.
    * "Covered" is segmentability for unigram (Viterbi path exists)
    * and WordPiece (MaxMatch completes); BPE never fails outright,
    * so its rule is char-level (every char in the trained alphabet).
    * All-integer outputs — exact by construction. One vocab-sized
    * typed map per tokenizer, no shuffle beyond the vocab collapse. */
  def tokenizerCoverage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .filter(col("word").rlike(Bpe.SegWordRe))
      .distinct().as[String]
    val probe = words.union(OovProbes.toDS()).distinct().localCheckpoint()
    val alphabet = trainedAlphabet(s, d).toSet
    val merges = Bpe.trainedMerges(s, d, Bpe.SegMerges)
    val uniPieces = Unigram.trainedPieces(s, d, Unigram.UniVocabSize).toMap
    val wpPieces = Wordpiece.trainedPieces(s, d, Wordpiece.WpMerges).toSet
    def report(name: String, f: String => Option[Int]): DataFrame =
      probe.map(w => f(w).getOrElse(-1)).toDF("nt")
        .agg(count(lit(1)).as("n_words"),
          sum(when(col("nt") >= 0, 1L).otherwise(0L)).as("n_covered"),
          sum(when(col("nt") < 0, 1L).otherwise(0L)).as("n_oov"),
          sum(when(col("nt") === 1, 1L).otherwise(0L)).as("n_whole"),
          max(when(col("nt") >= 0, col("nt"))).as("max_pieces"))
        .select(lit(name).as("tokenizer"), col("n_words"), col("n_covered"),
          col("n_oov"), col("n_whole"), col("max_pieces"))
    report("bpe", w =>
        if (w.forall(alphabet.contains)) Some(Bpe.encode(w, merges).length)
        else None)
      .unionByName(report("unigram",
        w => Unigram.segment(w, uniPieces).map(_.length)))
      .unionByName(report("wordpiece",
        w => Wordpiece.encode(w, wpPieces).map(_.length)))
      .orderBy(col("tokenizer"))
  }

  /** Fertility over an ARBITRARY docs frame for ONE supplied encoder
    * — the day-gate form ([[graft.Pipeline.curateAndPackDayStep]]
    * ships with exactly one tokenizer artifact and publishes this
    * table over the day's shipped text): same vocab-collapse
    * discipline and output row as [[tokenizerFertility]] (spec'd
    * equal to the query's row under the query's own encoder).
    * `encLen` must embed the tokenizer's own OOV fallback (the
    * query's: BPE always encodes, unigram 0, WordPiece 1). */
  def fertilityOn(docs: DataFrame, name: String,
                  encLen: String => Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val vocab = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .filter(col("word").rlike(Bpe.SegWordRe))
      .groupBy(col("word")).agg(count(lit(1)).as("n_occ"))
      .localCheckpoint()
    val wt = vocab.select(col("word")).as[String]
      .map(w => (w, encLen(w))).toDF("word", "w_tokens")
    vocab.join(broadcast(wt), "word")
      .agg(sum(col("n_occ")).as("n_words"),
        sum(col("n_occ") * length(col("word"))).as("n_chars"),
        sum(col("n_occ") * col("w_tokens")).as("n_tokens"))
      .select(lit(name).as("tokenizer"),
        col("n_words"), col("n_chars"), col("n_tokens"),
        round(col("n_tokens").cast("double") /
          col("n_words").cast("double"), 6).as("tokens_per_word"),
        round(col("n_chars").cast("double") /
          col("n_tokens").cast("double"), 6).as("chars_per_token"))
  }

  /** Coverage over an ARBITRARY docs frame for ONE supplied
    * segmentability rule (None = the word is OOV for this artifact) —
    * the day-gate twin of [[tokenizerCoverage]]; `probes` lets the
    * caller inject OOV probe words (the query does, the day gate
    * reports the shipped vocabulary's REAL UNK rate and injects
    * none). */
  def coverageOn(docs: DataFrame, name: String,
                 enc: String => Option[Int],
                 probes: Seq[String] = Nil): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val probe = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .filter(col("word").rlike(Bpe.SegWordRe))
      .distinct().as[String]
      .union(probes.toDS()).distinct()
    probe.map(w => enc(w).getOrElse(-1)).toDF("nt")
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("nt") >= 0, 1L).otherwise(0L)).as("n_covered"),
        sum(when(col("nt") < 0, 1L).otherwise(0L)).as("n_oov"),
        sum(when(col("nt") === 1, 1L).otherwise(0L)).as("n_whole"),
        max(when(col("nt") >= 0, col("nt"))).as("max_pieces"))
      .select(lit(name).as("tokenizer"), col("n_words"), col("n_covered"),
        col("n_oov"), col("n_whole"), col("max_pieces"))
  }

  /** DuckDB oracle for [[tokenizerCoverage]] — the three coverage
    * chains (injected VALUES + trained-artifact literals), one
    * WITH-subquery per row. Data-dependent → emitted by
    * oracleSqlFor. */
  def tokenizerCoverageOracleSql(s: SparkSession, d: String): String = {
    val alphabet = trainedAlphabet(s, d)
    def row(name: String, inner: String) =
      s"""SELECT '$name' AS tokenizer, n_words, n_covered,
        n_words - n_covered AS n_oov, n_whole, max_pieces
      FROM ($inner)"""
    s"""
      ${row("bpe", Bpe.coverageInnerSql(s, d, OovProbes, alphabet))}
      UNION ALL
      ${row("unigram", Unigram.coverageInnerSql(s, d, OovProbes))}
      UNION ALL
      ${row("wordpiece", Wordpiece.coverageInnerSql(s, d, OovProbes))}
      ORDER BY tokenizer"""
  }

  /** DuckDB oracle: each tokenizer's token-count oracle chain
    * aggregated to corpus totals, one WITH-bearing subquery per row
    * (CTE names collide across the three chains, so each lives in its
    * own FROM subquery). Data-dependent (trained merges/pieces as
    * literals) → emitted by oracleSqlFor. */
  def tokenizerFertilityOracleSql(s: SparkSession, d: String): String = {
    def row(name: String, inner: String) =
      s"""SELECT '$name' AS tokenizer, n_words, n_chars, n_tokens,
        round(CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
          AS tokens_per_word,
        round(CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
          AS chars_per_token
      FROM ($inner)"""
    s"""
      ${row("bpe", Bpe.fertilityInnerSql(s, d))}
      UNION ALL
      ${row("unigram", Unigram.fertilityInnerSql(s, d))}
      UNION ALL
      ${row("wordpiece", Wordpiece.fertilityInnerSql(s, d))}
      ORDER BY tokenizer"""
  }
}
