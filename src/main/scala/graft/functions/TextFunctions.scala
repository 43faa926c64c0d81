package graft.functions

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines
  * (SURVEY.md §2b): token/quality stats, marker-based language ID,
  * rolling-hash fingerprints. All are pure column expressions
  * (codegen'd higher-order functions — no UDFs in the hot path).
  */
object TextFunctions {

  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** text_stats: token count, char/punct/stopword ratios and a
    * composite quality score (length-, punctuation- and stopword-
    * based — the usual pre-training heuerstic trio). */
  def textStats(s: SparkSession, d: String): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t)
    val nChars = length(col("text"))
    val nPunct = nChars - length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", ""))
    val nStop = size(filter(t, x => x.isInCollection(Stopwords)))
    // BPE-ish subword proxy: word tokens + standalone punctuation,
    // the usual cheap estimator for LLM token budgeting
    val nTokBpe = size(expr("regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        nTok.as("n_tokens"), nTokBpe.as("n_tokens_bpe"),
        nChars.as("n_chars"), nPunct.as("n_punct"),
        nStop.as("n_stopwords"),
        (nStop.cast("double") / nTok).as("stopword_ratio"),
        (nPunct.cast("double") / nChars).as("punct_ratio"),
        (nChars.cast("double") / nTok).as("avg_token_len"))
      .withColumn("quality_score",
        when(col("n_tokens") < 5, 0.0).otherwise(
          lit(1.0) - col("punct_ratio") * 2.0 -
            abs(col("stopword_ratio") - 0.4)))
      .orderBy(col("doc_id"))
  }

  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "fr" -> Seq("le", "les", "des", "est", "et"))

  /** text_langid: marker-word scoring heuristic. Deterministic
    * argmax with fixed precedence (en > de > es > fr > und). */
  def langId(s: SparkSession, d: String): DataFrame = {
    val t = tokens(col("text"))
    val hits = Markers.map { case (lang, ws) =>
      lang -> size(filter(t, x => x.isInCollection(ws)))
    }
    val Seq(en, de, es, fr) = hits.map(_._2)
    val pred = when(en === 0 && de === 0 && es === 0 && fr === 0, "und")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        en.as("hits_en"), de.as("hits_de"), es.as("hits_es"), fr.as("hits_fr"),
        pred.as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** text_fingerprint: rolling character-8-gram sketch — min/max/
    * distinct-count over shingle hashes (winnowing-lite). Hash is md5
    * (shared with DuckDB), so the fingerprints themselves are
    * oracle-checked, not just row counts. */
  def fingerprint(s: SparkSession, d: String): DataFrame = {
    val n = 8
    val grams = transform(
      sequence(lit(1), greatest(length(col("text")) - (n - 1), lit(1))),
      i => md5(col("text").substr(i, lit(n))))
    Tables.documents(s, d)
      .select(col("doc_id"),
        array_min(grams).as("fp_min"),
        array_max(grams).as("fp_max"),
        size(array_distinct(grams)).as("n_distinct_shingles"))
      .orderBy(col("doc_id"))
  }
}
