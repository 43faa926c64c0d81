package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — the actual
  * tokenizer-training step downstream of `vocab_topk`'s corpus
  * counts (Sennrich et al., "Neural Machine Translation of Rare
  * Words with Subword Units", ACL'16).
  *
  * Scale shape: classic BPE trains on the WORD VOCABULARY with
  * frequencies, not on raw tokens — so the corpus is reduced once to
  * `(word, count)` (one shuffle over the corpus; the vocab is then
  * millions of rows at 100 TB, not trillions), and each merge round
  * over the vocab is:
  *
  *   1. flatMap each word's symbol sequence to adjacent pairs,
  *      weighted by the word count (no shuffle),
  *   2. groupBy pair + sum — partial-aggregated shuffle over PAIR
  *      cardinality,
  *   3. argmax with a deterministic tie-break — ONE row to the
  *      driver,
  *   4. broadcast the winning pair, apply the merge per word (map,
  *      no shuffle).
  *
  * Rounds are `numMerges` (a config, typically 10k-100k); each is
  * one bounded shuffle, so the trainer is the same iterative shape
  * as connected components. Per-round frames are localCheckpoint'd
  * to keep lineage flat. Verified in BpeSpec against an independent
  * single-process reference implementation.
  */
object Bpe {

  /** End-of-word marker appended to each word's last symbol so
    * merges cannot cross word boundaries (standard BPE). */
  private val Eow = "</w>"

  private[graft] def toSymbols(word: String): Seq[String] = {
    val cs = word.map(_.toString)
    if (cs.isEmpty) Seq.empty
    else cs.init :+ (cs.last + Eow)
  }

  /** (word, count) vocabulary of the documents' whitespace tokens —
    * the one corpus-wide pass. */
  def wordVocab(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("text")).as[String]
      .flatMap(_.toLowerCase.split("\\s+").iterator.filter(_.nonEmpty))
      .groupByKey(identity).count()
      .toDF("word", "count")
  }

  /** Train `numMerges` merges over the given word vocabulary.
    * Returns the ordered merge list — the tokenizer artifact. Ties
    * on pair frequency break lexicographically, so training is
    * deterministic across partitionings and engines. */
  def trainMerges(vocab: DataFrame, numMerges: Int): Seq[(String, String)] = {
    val spark = vocab.sparkSession
    import spark.implicits._
    var words: Dataset[(Seq[String], Long)] = vocab
      .select(col("word"), col("count"))
      .as[(String, Long)]
      .map { case (w, c) => (toSymbols(w), c) }
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      // adjacent-pair counts weighted by word frequency
      val best = words.flatMap { case (syms, c) =>
          syms.iterator.zip(syms.iterator.drop(1)).map(p => (p, c)) }
        .groupByKey(_._1).agg(sum($"_2").as[Long])
        .toDF("pair", "cnt")
        .orderBy(col("cnt").desc, col("pair._1"), col("pair._2"))
        .limit(1) // argmax — one row to the driver
        .collect()
      if (best.isEmpty) done = true
      else {
        val p = best.head.getStruct(0)
        val pair = (p.getString(0), p.getString(1))
        merges += pair
        val bc = spark.sparkContext.broadcast(pair)
        words = words.map { case (syms, c) =>
          (applyMerge(syms, bc.value), c)
        }.localCheckpoint()
      }
      round += 1
    }
    merges.toSeq
  }

  /** One left-to-right merge pass: every non-overlapping occurrence
    * of the pair collapses into its concatenation. */
  private[graft] def applyMerge(syms: Seq[String],
                                pair: (String, String)): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Convenience: train directly from the documents table. */
  def trainMerges(s: SparkSession, d: String, numMerges: Int): Seq[(String, String)] =
    trainMerges(wordVocab(graft.Tables.documents(s, d)), numMerges)

  /** Segment a word with a trained merge list (applied in training
    * order — standard BPE inference, used by the spec to check the
    * merges actually tokenize). */
  def encode(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(toSymbols(word))((syms, m) => applyMerge(syms, m))
}
