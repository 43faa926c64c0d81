package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus curation capstone: the operators composed into the actual
  * training-data pipeline shape — exact-dedup to keepers, quality
  * filtering, language ID, per-language corpus accounting. Every
  * stage is one of the already-verified operators; this query checks
  * they compose (and stays hash-exact: double-valued scores are used
  * only as filters — identical IEEE trees on both engines — while
  * aggregates stay integral).
  */
object Curate {

  def curateCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Dedup.withPlants(Tables.documents(s, d))

    // 1. exact dedup: keep the min doc_id of every content group
    val keepers = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))

    // 2. per-doc stats (tokens / chars / punct / stopwords / quality)
    val t = filter(split(lower(col("text")), "\\s+"), x => length(x) > 0)
    val nTok = size(t)
    val nChars = length(col("text"))
    val nPunct = nChars - length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", ""))
    val nStop = size(filter(t, x => x.isInCollection(
      Seq("the", "a", "of", "and", "to", "in", "is", "on"))))
    val stats = docs.join(keepers, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"),
        nTok.as("n_tokens"), nChars.as("n_chars"),
        (nPunct.cast("double") / nChars).as("punct_ratio"),
        (nStop.cast("double") / nTok).as("stopword_ratio"))
      .withColumn("quality_score",
        when(col("n_tokens") < 5, 0.0).otherwise(
          lit(1.0) - col("punct_ratio") * 2.0 -
            abs(col("stopword_ratio") - 0.4)))

    // 3. quality gate + per-language accounting
    stats
      .filter(col("quality_score") > 0.2)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("total_tokens"),
           sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))
  }

  /** split_assign: deterministic train/val/test assignment — md5 of a
    * salted doc key → bucket 0-99 → 80/10/10. No RNG, no sampling: a
    * doc's split NEVER changes as the corpus grows or repartitions
    * (the property that keeps eval sets honest across pipeline runs),
    * and assignment is embarrassingly parallel. md5 is shared with
    * DuckDB, so the oracle checks the actual assignments. */
  def splitAssign(s: SparkSession, d: String): DataFrame = {
    val hex = md5(concat(lit("split:"), col("doc_id")))
    val bucket = (conv(substring(hex, 1, 8), 16, 10).cast("long") % 100).cast("int")
    Tables.documents(s, d)
      .select(col("doc_id"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))
  }
}
