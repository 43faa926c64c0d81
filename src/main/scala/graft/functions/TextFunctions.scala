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
  def textStats(s: SparkSession, d: String): DataFrame =
    textStats(Tables.documents(s, d))

  def textStats(docs: org.apache.spark.sql.DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t)
    val nChars = length(col("text"))
    val nPunct = nChars - length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", ""))
    val nStop = size(filter(t, x => x.isInCollection(Stopwords)))
    // BPE-ish subword proxy: word tokens + standalone punctuation,
    // the usual cheap estimator for LLM token budgeting
    val nTokBpe = size(expr("regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
    docs
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

  /** text_repetition: C4/Gopher-style intra-document repetition
    * signals — duplicate word-2/3-gram fractions, the top token's
    * mass fraction, and a composite `repetitive` flag (the filters
    * that drop boilerplate/SEO-spam docs before training). One typed
    * pass per doc: the top-token count as a column HOF would be
    * quadratic per row (count of each distinct token), while the JVM
    * pass is linear with two hash maps. Ratios round to 6 dp on both
    * engines; the flag compares the ROUNDED values so the boolean is
    * boundary-safe cross-engine. */
  def textRepetition(s: SparkSession, d: String): DataFrame =
    textRepetition(Tables.documents(s, d))

  def textRepetition(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val raw = docs
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val n = toks.length
        def dupRatio(k: Int): Double = {
          val total = math.max(n - k + 1, 0)
          if (total <= 0) 0.0
          else {
            val seen = new java.util.HashSet[String]()
            var i = 0
            while (i + k <= n) {
              seen.add(toks.slice(i, i + k).mkString(" "))
              i += 1
            }
            (total - seen.size).toDouble / total
          }
        }
        val top = if (n == 0) 0.0 else {
          val counts = scala.collection.mutable.HashMap.empty[String, Int]
          toks.foreach(t => counts.update(t, counts.getOrElse(t, 0) + 1))
          counts.values.max.toDouble / n
        }
        (id, n, dupRatio(2), dupRatio(3), top)
      }
      .toDF("doc_id", "n_tokens", "r2", "r3", "rt")
    raw.select(col("doc_id"), col("n_tokens"),
        round(col("r2"), 6).as("dup_2gram_ratio"),
        round(col("r3"), 6).as("dup_3gram_ratio"),
        round(col("rt"), 6).as("top_tok_ratio"))
      .withColumn("repetitive",
        col("dup_3gram_ratio") > 0.2 || col("top_tok_ratio") > 0.2)
      .orderBy(col("doc_id"))
  }

  /** Shared by Spark and the oracle: PII-ish patterns restricted to
    * the regex subset where Java (backtracking) and RE2 (DuckDB,
    * leftmost-longest) agree — greedy character classes, no ambiguous
    * alternation. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  /** text_redact: C4-style PII scrubbing — email and IPv4 redaction
    * with per-doc match counts. The corpus is synthetic, so PII is
    * PLANTED deterministically inside the query (doc_id % 10 == 0
    * docs gain an email + IP suffix derived from doc_id) exactly as
    * the oracle plants it — the redaction itself is therefore
    * hash-verified cross-engine, not just on no-op text. Emails are
    * redacted first, IPs counted/redacted on the email-redacted text
    * (fixed stage order keeps both engines identical). */
  def textRedact(s: SparkSession, d: String): DataFrame = {
    val planted = when(col("doc_id") % 10 === 0,
      concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com from 192.168."),
        (col("doc_id") % 256).cast("string"), lit(".1")))
      .otherwise(col("text"))
    val afterEmail = regexp_replace(planted, EmailPattern, "<EMAIL>")
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_count(planted, lit(EmailPattern)).cast("int").as("n_emails"),
        regexp_count(afterEmail, lit(Ipv4Pattern)).cast("int").as("n_ips"),
        regexp_replace(afterEmail, Ipv4Pattern, "<IP>").as("redacted"))
      .orderBy(col("doc_id"))
  }

  // ---- text_normalize ----------------------------------------------------

  /** Fixed mojibake-repair table: the UTF-8 byte pairs/triples of a
    * codepoint misread as cp1252 (classic double-encoded UTF-8) for
    * characters web corpora actually trip on — é è ï, em dash, right
    * single quote. Deliberately a FIXED literal table (the
    * [[textRedact]] discipline): each entry replays as a
    * chr()-literal replace() in the DuckDB oracle, so the repair is
    * hash-verified cross-engine rather than trusted. */
  val MojibakeRepairs: Seq[(String, String)] = Seq(
    "Ã©" -> "é", // Ã©  -> é
    "Ã¨" -> "è", // Ã¨  -> è
    "Ã¯" -> "ï", // Ã¯  -> ï
    "â€”" -> "—", // â€” -> em dash
    "â€™" -> "’") // â€™ -> right single quote

  /** C0 controls minus \t \n \r, plus DEL — the strip class. */
  private def isStrippedControl(c: Char): Boolean =
    c <= '\u0008' || c == '\u000b' || c == '\u000c' ||
      (c >= '\u000e' && c <= '\u001f') || c == '\u007f'

  /** Unicode/encoding normalization — the CCNet/C4 cleaning stage
    * that runs AHEAD of dedup (mojibake and NFD variants would
    * otherwise split exact duplicates into distinct hashes): fixed-
    * table double-encoded-UTF-8 repair, control strip (keeping
    * \t \n \r), NFC composition, with per-doc repair counts. One
    * typed linear pass (NFC needs the JVM normalizer; counts are
    * substring arithmetic), embarrassingly parallel; the fan-out is
    * input-size-gated like the other cheap per-row stages. Lengths
    * are CODEPOINT counts (DuckDB length() semantics — identical to
    * UTF-16 length for BMP text). */
  def normalizeText(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    graft.Util.fanOutIfAtLeast(
        docs.select(col("doc_id"), col("text")).as[(Long, String)])
      .map { case (id, raw) =>
        // counts on the RAW text, each pattern independently (the
        // patterns cannot overlap or create each other)
        val nMoji = MojibakeRepairs.map { case (bad, _) =>
          (raw.length - raw.replace(bad, "").length) / bad.length }.sum
        val repaired = MojibakeRepairs.foldLeft(raw) {
          case (t, (bad, good)) => t.replace(bad, good) }
        val sb = new java.lang.StringBuilder(repaired.length)
        var nCtrl = 0
        repaired.foreach { c =>
          if (isStrippedControl(c)) nCtrl += 1 else sb.append(c) }
        val norm = java.text.Normalizer.normalize(
          sb.toString, java.text.Normalizer.Form.NFC)
        (id, norm,
          raw.codePointCount(0, raw.length),
          norm.codePointCount(0, norm.length),
          nMoji, nCtrl, if (norm != raw) 1 else 0)
      }
      .toDF("doc_id", "norm_text", "n_chars_raw", "n_chars_norm",
        "n_mojibake", "n_controls", "changed")
  }

  /** text_normalize query: [[normalizeText]] over a deterministically
    * DEGRADED corpus (the dq_check discipline — the oracle must check
    * real repair arithmetic, not no-op ASCII): docs ≡0 (mod 7) gain a
    * mojibake suffix (" cafÃ© â€” naÃ¯ve"), docs ≡0 (mod 11) a
    * control-char + NFD-decomposed suffix (BEL e ́ x US → "éx").
    * Emits md5(normalized) rather than the text itself to keep the
    * compare payload small. */
  def textNormalize(s: SparkSession, d: String): DataFrame = {
    // NOTE the trailing "it's" mojibake: its third char is U+2122
    // (the cp1252 misreading of UTF-8 byte 0x99), i.e. real
    // right-single-quote mojibake \u2014 included so the gate exercises
    // that repair entry (r11 advice: it was unverified before).
    val moji = " caf\u00c3\u00a9 \u00e2\u20ac\u201d na\u00c3\u00afve" +
      " it\u00e2\u20ac\u2122s"
    val ctrl = "\u0007e\u0301x\u001f"
    val degraded = Tables.documents(s, d)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(moji)))
          .otherwise(col("text")).as("text"))
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(ctrl)))
          .otherwise(col("text")).as("text"))
    normalizeText(degraded)
      .select(col("doc_id"),
        md5(col("norm_text").cast("binary")).as("norm_md5"),
        col("n_chars_raw"), col("n_chars_norm"),
        col("n_mojibake"), col("n_controls"), col("changed"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[textNormalize]]: same degradation via chr()
    * literals, nested replace() repair chain in the SAME order as
    * [[MojibakeRepairs]], RE2 control strip, nfc_normalize. */
  val textNormalizeOracle: String = raw"""
    WITH degraded AS (
      SELECT doc_id,
        CASE WHEN doc_id % 11 = 0
          THEN base || chr(7) || 'e' || chr(769) || 'x' || chr(31)
          ELSE base END AS text
      FROM (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0
            THEN text || ' caf' || chr(195) || chr(169) || ' ' ||
                 chr(226) || chr(8364) || chr(8221) || ' na' ||
                 chr(195) || chr(175) || 've it' ||
                 chr(226) || chr(8364) || chr(8482) || 's'
            ELSE text END AS base
        FROM documents)),
    norm AS (
      SELECT doc_id, text,
        nfc_normalize(regexp_replace(
          replace(replace(replace(replace(replace(text,
            chr(195)||chr(169), chr(233)),
            chr(195)||chr(168), chr(232)),
            chr(195)||chr(175), chr(239)),
            chr(226)||chr(8364)||chr(8221), chr(8212)),
            chr(226)||chr(8364)||chr(8482), chr(8217)),
          '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')) AS norm,
        CAST(
          (length(text) - length(replace(text, chr(195)||chr(169), ''))) // 2
        + (length(text) - length(replace(text, chr(195)||chr(168), ''))) // 2
        + (length(text) - length(replace(text, chr(195)||chr(175), ''))) // 2
        + (length(text) - length(replace(text, chr(226)||chr(8364)||chr(8221), ''))) // 3
        + (length(text) - length(replace(text, chr(226)||chr(8364)||chr(8482), ''))) // 3
          AS INT) AS n_mojibake,
        CAST(length(text) - length(regexp_replace(text,
          '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')) AS INT) AS n_controls
      FROM degraded)
    SELECT doc_id, md5(norm) AS norm_md5,
      CAST(length(text) AS INT) AS n_chars_raw,
      CAST(length(norm) AS INT) AS n_chars_norm,
      n_mojibake, n_controls,
      CAST(CASE WHEN norm <> text THEN 1 ELSE 0 END AS INT) AS changed
    FROM norm ORDER BY doc_id"""

  /** text_entropy: per-doc CHARACTER-BIGRAM entropy — the
    * Gopher-family repetitiveness gate beside [[textRepetition]]'s
    * n-gram fractions (low entropy = keyboard mashing, repeated
    * padding, template boilerplate; the signal is orthogonal to
    * word-level repetition because it sees INTRA-word structure):
    * H = −Σ_b p_b ln p_b over the doc's adjacent character pairs.
    *
    * Determinism recipe (the ngram_lm transcendental discipline):
    * H·total = Σ cnt·(ln total − ln cnt), both logs snapped to the
    * 1e-9 grid and differenced as exact DECIMAL(13,9), each term an
    * exact DECIMAL(9,0)×DECIMAL(13,9) product, ONE double division
    * by total at the end, 6 dp. Scale shape: a typed ~len(text)
    * flatMap per doc (the dedup_spans scan, fanned out) + two
    * partial-agg shuffles of (id, 2-char, long) rows. Docs shorter
    * than 2 chars have no bigrams and emit no row (both engines). */
  def textEntropy(s: SparkSession, d: String): DataFrame =
    textEntropy(Tables.documents(s, d))

  def textEntropy(docs: org.apache.spark.sql.DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val s = docs.sparkSession
    import s.implicits._
    val bg = graft.Util.fanOut(
        docs.select(col("doc_id"), col("text")).as[(Long, String)])
      .flatMap { case (id, t) =>
        (0 until t.length - 1).iterator.map(i => (id, t.substring(i, i + 2))) }
      .toDF("doc_id", "bg")
    // per-doc total as a window over the counted frame, not a
    // second aggregate joined back: the self-join shape recomputed
    // the whole char-bigram explode for the totals branch (lineage
    // replay — no ReuseExchange here), the window reuses the one
    // counted frame and adds a doc_id-partitioned pass
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
    val cnts = bg.groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("cnt"))
    cnts.withColumn("total", sum(col("cnt")).over(byDoc))
      .select(col("doc_id"), col("total"),
        (col("cnt").cast(DecimalType(9, 0)) *
          (round(log(col("total")), 9).cast(DecimalType(13, 9)) -
            round(log(col("cnt")), 9).cast(DecimalType(13, 9)))).as("term"))
      .groupBy(col("doc_id"))
      .agg(max(col("total")).as("n_bigrams"),
        round(sum(col("term")).cast("double") / max(col("total")), 6)
          .as("entropy"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[textEntropy]] — same grid/decimal chain. */
  val textEntropyOracle: String = """
    WITH bg AS (
      SELECT doc_id, substr(text, i, 2) AS bg
      FROM (SELECT doc_id, text, unnest(range(1, length(text))) AS i
            FROM documents)),
    c AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
    t AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS total
          FROM c GROUP BY 1),
    terms AS (
      SELECT c.doc_id, t.total,
        CAST(c.cnt AS DECIMAL(9,0)) *
          (CAST(round(ln(t.total), 9) AS DECIMAL(13,9)) -
           CAST(round(ln(c.cnt), 9) AS DECIMAL(13,9))) AS term
      FROM c JOIN t USING (doc_id))
    SELECT doc_id, MAX(total) AS n_bigrams,
      round(CAST(SUM(term) AS DOUBLE) / MAX(total), 6) AS entropy
    FROM terms GROUP BY doc_id ORDER BY doc_id"""

  /** text_scripts: per-doc SCRIPT composition — the writing-system
    * signal CCNet/C4-class pipelines gate on beside language ID
    * (mixed-script documents are a classic spam/injection tell, and
    * per-script routing picks tokenizers): counts of Latin, digit,
    * CJK (U+4E00-9FFF), Cyrillic (U+0400-04FF) and whitespace
    * codepoints via length-difference arithmetic (regexp_replace of
    * the class, codegen'd — BMP-only classes so Java UTF-16 length ==
    * DuckDB codepoint length), the remainder as `n_other`, and the
    * dominant script by a FIXED-ORDER argmax CASE (identical
    * expression tree both engines; \s is avoided — Java and RE2
    * disagree on vertical tab — in favor of the explicit
    * [ \t\n\r]). The corpus is ASCII, so the query DEGRADES it
    * deterministically (the text_normalize discipline): zh docs gain
    * a CJK suffix and docs ≡0 (mod 13) a Cyrillic one — the oracle
    * then checks real multi-script counting, not all-zeros. */
  def textScripts(s: SparkSession, d: String): DataFrame = {
    val cjkSuffix = " 数据管道处理"
    val cyrSuffix = " данные"
    val degraded = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        when(col("lang") === "zh", concat(col("text"), lit(cjkSuffix)))
          .otherwise(col("text")).as("text"))
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(cyrSuffix)))
          .otherwise(col("text")).as("text"))
    def cnt(re: String) =
      (length(col("text")) -
        length(regexp_replace(col("text"), re, ""))).cast("int")
    degraded
      .select(col("doc_id"),
        length(col("text")).cast("int").as("n_chars"),
        cnt("[A-Za-z]").as("n_latin"),
        cnt("[0-9]").as("n_digit"),
        cnt("[\\u4e00-\\u9fff]").as("n_cjk"),
        cnt("[\\u0400-\\u04ff]").as("n_cyrillic"),
        cnt("[ \\t\\n\\r]").as("n_space"))
      .withColumn("n_other",
        (col("n_chars") - col("n_latin") - col("n_digit") - col("n_cjk") -
          col("n_cyrillic") - col("n_space")).cast("int"))
      .withColumn("main_script", {
        val m = greatest(col("n_latin"), col("n_cjk"), col("n_cyrillic"),
          col("n_digit"))
        when(col("n_latin") === m, "latin")
          .when(col("n_cjk") === m, "cjk")
          .when(col("n_cyrillic") === m, "cyrillic")
          .otherwise("digit")
      })
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[textScripts]]: same chr()-literal injection,
    * same length-difference counts (RE2 `\x{...}` classes), same
    * fixed-order argmax. */
  val textScriptsOracle: String = raw"""
    WITH degraded AS (
      SELECT doc_id,
        CASE WHEN doc_id % 13 = 0
          THEN base || ' ' || chr(1076) || chr(1072) || chr(1085) ||
               chr(1085) || chr(1099) || chr(1077)
          ELSE base END AS text
      FROM (
        SELECT doc_id,
          CASE WHEN lang = 'zh'
            THEN text || ' ' || chr(25968) || chr(25454) || chr(31649) ||
                 chr(36947) || chr(22788) || chr(29702)
            ELSE text END AS base
        FROM documents)),
    counts AS (
      SELECT doc_id,
        CAST(length(text) AS INT) AS n_chars,
        CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS INT) AS n_latin,
        CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INT) AS n_digit,
        CAST(length(text) - length(regexp_replace(text, '[\x{4E00}-\x{9FFF}]', '', 'g')) AS INT) AS n_cjk,
        CAST(length(text) - length(regexp_replace(text, '[\x{0400}-\x{04FF}]', '', 'g')) AS INT) AS n_cyrillic,
        CAST(length(text) - length(regexp_replace(text, '[ ' || chr(9) || chr(10) || chr(13) || ']', '', 'g')) AS INT) AS n_space
      FROM degraded)
    SELECT doc_id, n_chars, n_latin, n_digit, n_cjk, n_cyrillic, n_space,
      CAST(n_chars - n_latin - n_digit - n_cjk - n_cyrillic - n_space AS INT)
        AS n_other,
      CASE WHEN n_latin = greatest(n_latin, n_cjk, n_cyrillic, n_digit)
             THEN 'latin'
           WHEN n_cjk = greatest(n_latin, n_cjk, n_cyrillic, n_digit)
             THEN 'cjk'
           WHEN n_cyrillic = greatest(n_latin, n_cjk, n_cyrillic, n_digit)
             THEN 'cyrillic'
           ELSE 'digit' END AS main_script
    FROM counts ORDER BY doc_id"""

  /** vocab_topk: corpus-wide token counts, top-k by frequency — the
    * input to tokenizer/vocabulary training. Plain explode(split) —
    * split() is a codegen'd expression, NOT a CodegenFallback HOF, so
    * the Generate stays cheap — then one partial-aggregated groupBy
    * and a TakeOrderedAndProject head (only k rows reach the driver
    * regardless of vocabulary size). Ties broken by token for
    * determinism. */
  def vocabTopK(s: SparkSession, d: String, k: Int = 200): DataFrame =
    tokenCounts(Tables.documents(s, d))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Corpus-wide (token, count) aggregate — the one code path behind
    * both [[vocabTopK]] (its oracle-gated top-k head) and
    * [[graft.functions.Bpe.wordVocab]] (the BPE trainer's input), so
    * the two stay semantically identical by construction rather than
    * by parallel implementations. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))

  /** text_keywords: per-doc characteristic terms — top-k tokens by
    * tf/df ratio (the rank-equivalent of tf-idf for a fixed corpus:
    * tf·idf ordering ≡ tf/df ordering, and the ratio needs no
    * logarithm, so the score is a single correctly-rounded IEEE
    * division that both engines reproduce bit-identically — the
    * libm-free way to keep a scored ranking hash-exact).
    *
    * Scale shape: token rows come from one typed pass (the
    * HOF-under-Generate trap again); tf is a partial-aggregated
    * groupBy; df is vocab-sized and BROADCAST to the tf side; the
    * top-k window partitions by doc_id — no global window, no
    * driver-side anything. */
  def textKeywords(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val tokRows = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        t.toLowerCase.split("\\s+").iterator.filter(_.nonEmpty).map(id -> _) }
      .toDF("doc_id", "token")
    val tf = tokRows.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // tf already holds one row per (doc, token) — df falls out of it
    // without a second corpus scan or a distinct shuffle
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    tf.join(broadcast(docFreq), "token")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"),
        col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** ngram_lm_score: bigram language-model quality scoring — the
    * CCNet/KenLM-style perplexity filter (Wenzek et al. 2020): train
    * MLE bigram counts on the corpus, score each document by its mean
    * negative bigram log-likelihood and perplexity. High-ppl docs are
    * the out-of-distribution/garbage candidates a pre-training
    * pipeline drops. Reference has no LM scoring; this extends the
    * quality-filter family (text_stats, text_repetition).
    *
    * Scale shape: ONE posexplode of the corpus; bigrams come from a
    * lead() window partitioned by doc_id (millions of small
    * partitions — no skew), NOT transform()+explode (a HOF under a
    * codegen'd Generate re-evaluates per output element). Model
    * (bigram→count) and context (w1→count) are map-side-combinable
    * aggregates of that same exploded frame; the doc side is
    * pre-aggregated to (doc_id, bigram, k) before the model join, so
    * the shuffle carries distinct doc-bigrams, not occurrences. Both
    * joins shuffle on the bigram/w1 key — at 100 TB the model is too
    * big to broadcast and this is the standard co-partitioned shape.
    *
    * Determinism: every doc bigram is in the model by construction
    * (the corpus trains on itself), so MLE needs no smoothing and
    * p > 0. p = cnt/ctx is one IEEE division; ln(p) rounds to the
    * 1e-9 grid and sums in exact decimal (Util recipe, weighted by
    * the exact integer k); the mean is a single double division
    * rounded to 6 dp, and ppl = exp() of that ALREADY-ROUNDED value
    * (identical input bits in both engines), rounded to 6 dp. */
  /** Per-document bigram occurrences, pre-aggregated to
    * (doc_id, w1, bigram, k) — ONE corpus pass: posexplode + a lead()
    * window partitioned by doc_id (millions of small partitions), and
    * the count collapses inside the same stage (the window exchange
    * already clusters by doc_id). */
  def docBigrams(docs: DataFrame): DataFrame =
    docBigramsFromToks(docTokenStream(docs))

  /** The posexploded (doc_id, pos, w1) token-occurrence stream — ONE
    * fanned-out corpus tokenize. Chains that need BOTH the bigram
    * and the token-count view of the same corpus (the quality
    * distillation) checkpoint this once and derive both — previously
    * two independent tokenize passes. The explode runs in the scan
    * stage — fanOut spreads a single-split input across cores first,
    * or one task tokenizes the whole corpus. */
  private[functions] def docTokenStream(docs: DataFrame): DataFrame =
    graft.Util.fanOut(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w1")))

  /** [[docBigrams]] body over a precomputed token stream. */
  private[functions] def docBigramsFromToks(toks: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks
      .withColumn("w2", lead(col("w1"), 1).over(byPos))
      .where(col("w2").isNotNull)
      .select(col("doc_id"), col("w1"),
        concat_ws(" ", col("w1"), col("w2")).as("bigram"))
      .groupBy(col("doc_id"), col("w1"), col("bigram"))
      .agg(count(lit(1)).as("k"))
  }

  /** Train the MLE bigram model: (bigram→cnt, w1→ctx) from the
    * doc-bigram frame. At 100 TB this is the KenLM-style artifact you
    * WRITE ONCE (parquet, partitioned by a bigram hash) and reuse for
    * every scoring run — `ngramLmScoreWith` then needs a single
    * corpus pass. Both are second-level aggregates over distinct
    * doc-bigrams, not token occurrences. */
  def ngramLmModel(docBg: DataFrame): (DataFrame, DataFrame) = (
    docBg.groupBy(col("bigram")).agg(sum(col("k")).as("cnt")),
    docBg.groupBy(col("w1")).agg(sum(col("k")).as("ctx")))

  /** Score docs against a trained model: shuffle join on the bigram
    * key (the model is corpus-vocabulary-sized — too big to
    * broadcast at scale), broadcast-able ctx (unigram-vocab-sized),
    * then one exact-decimal per-doc aggregate. */
  def ngramLmScoreWith(docBg: DataFrame, model: DataFrame,
                       ctx: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // DECIMAL(13,9) × DECIMAL(9,0) → DECIMAL(23,9): exact in both
    // engines (|ln p| < 1e4 even at 1e13 corpus bigrams; k per
    // doc-bigram < 1e9)
    val lp = round(log(col("cnt").cast("double") / col("ctx")), 9)
      .cast(DecimalType(13, 9))
    docBg
      .join(model, "bigram")
      .join(ctx, "w1")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k").cast(DecimalType(9, 0)) * lp).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-(col("slp").cast("double") / col("n_bigrams")), 6)
          .as("avg_neg_logp"))
      .withColumn("ppl", round(exp(col("avg_neg_logp")), 6))
      .orderBy(col("doc_id"))
  }

  /** Score docs against a model trained on a SEPARATE (reference)
    * corpus — the quality-gate form: unlike the self-trained
    * [[ngramLmScoreWith]] (every bigram in-model by construction),
    * scored docs here carry UNSEEN bigrams, handled by add-α
    * smoothing: p = (cnt + α) / (ctx + α·vocab). An unseen bigram in
    * an unseen context scores ≈ 1/vocab — the floor that makes
    * gibberish stand out instead of hiding behind the self-training
    * leak (a novel bigram in a RARE context gets p ≈ 1 from MLE;
    * measured: planted-uniform docs scored BELOW natural text under
    * self-training, and ~70× above it under this scorer on a Zipf
    * corpus — the Scale10 zipf_lm_gate probe). Same join shape as the
    * self-trained scorer: shuffle on bigram, broadcastable ctx, one
    * per-doc aggregate. Probe-grade (plain double logs), not
    * oracle-gated — the cross-engine recipe lives in the MLE form. */
  def ngramLmScoreHeldOut(docBg: DataFrame, model: DataFrame,
                          ctx: DataFrame, vocab: Long,
                          alpha: Double = 0.1): DataFrame = {
    docBg
      .join(model, Seq("bigram"), "left")
      .join(ctx, Seq("w1"), "left")
      .withColumn("p",
        (coalesce(col("cnt"), lit(0L)) + lit(alpha)) /
          (coalesce(col("ctx"), lit(0L)) + lit(alpha * vocab)))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k") * -log(col("p"))).as("snlp"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("snlp") / col("n_bigrams")).as("avg_neg_logp"))
      .withColumn("ppl", exp(col("avg_neg_logp")))
      .orderBy(col("doc_id"))
  }

  /** ngram_lm_heldout — the ORACLE-GATED exact-decimal form of the
    * held-out gate: model/ctx trained on the TRAIN carve (doc_id %
    * 50 ≠ 0, the decontaminate split), every doc scored with add-α
    * smoothing at α = 0.25 — binary-exact, so (cnt + 0.25) and
    * (ctx + 0.25·V) are exactly representable doubles in both
    * engines and p is ONE IEEE division; from there the
    * [[ngramLmScoreWith]] recipe verbatim (ln to the 1e-9 grid,
    * DECIMAL(13,9)×DECIMAL(9,0) exact sum, one double division,
    * 6 dp, exp on the already-rounded value). V = distinct TRAIN
    * tokens (one bounded driver scalar, the bm25 nDocs precedent). */
  def ngramLmHeldOut(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    // ONE bigram-window pass for model, ctx and the scoring side
    // (previously three: each replayed the tokenize + lead window +
    // pre-agg — a shuffle-bearing subtree, which is exactly the
    // class where an eager checkpoint wins; the train carve is a
    // whole-doc filter, which commutes with the per-doc window).
    // The vocab count stays a LAZY separate explode: it is a
    // scan-only subtree, and materializing the token stream for it
    // measured SLOWER than recomputing it (A/B'd at sf0.1 — the
    // checkpoint barrier serializes what 32 cores overlap).
    val bgAll = docBigrams(docs).localCheckpoint()
    val trainBg = bgAll.filter(col("doc_id") % 50 =!= 0)
    val (model, ctx) = ngramLmModel(trainBg)
    val vocab = train.select(explode(tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).head.getLong(0)
    ngramLmScoreHeldOutExact(bgAll, model, ctx, vocab)
  }

  /** Exact-decimal core of [[ngramLmHeldOut]] (α fixed at 0.25; the
    * probe-grade [[ngramLmScoreHeldOut]] keeps the free-α form). */
  def ngramLmScoreHeldOutExact(docBg: DataFrame, model: DataFrame,
                               ctx: DataFrame, vocab: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val num = coalesce(col("cnt"), lit(0L)).cast("double") + lit(0.25)
    // 0.25·V is exact for any realistic vocab (quarter-grid < 2^51)
    val den = coalesce(col("ctx"), lit(0L)).cast("double") + lit(0.25 * vocab)
    val lp = round(log(num / den), 9).cast(DecimalType(13, 9))
    docBg
      .join(model, Seq("bigram"), "left")
      .join(ctx, Seq("w1"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k").cast(DecimalType(9, 0)) * lp).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-(col("slp").cast("double") / col("n_bigrams")), 6)
          .as("avg_neg_logp"))
      .withColumn("ppl", round(exp(col("avg_neg_logp")), 6))
      .orderBy(col("doc_id"))
  }

  /** corpus_card — the per-language CORPUS DATASHEET (Gebru et al.
    * "Datasheets for Datasets"; the data card every released
    * pretraining corpus ships): one row per language with the counts
    * a consumer reads before training — documents, token volume,
    * vocabulary size, exact-duplicate documents (docs whose
    * lowercased text md5 occurs more than once WITHIN the language —
    * the residual-dup rate a release note must disclose), and mean
    * document length. Every value is an exact integer except
    * mean_tokens (one IEEE division of exact integers, 6 dp — the
    * bm25 recipe).
    *
    * Scale shape: one tokenize pass feeding two partial aggs
    * (per-lang totals; (lang, token) distinct for vocab) + one
    * md5-keyed dup agg — all map-side combinable, output is
    * languages-sized. */
  def corpusCard(s: SparkSession, d: String): DataFrame =
    corpusCardOn(Tables.documents(s, d))

  /** Corpus-parameterized core of [[corpusCard]]. */
  def corpusCardOn(docs: DataFrame): DataFrame = {
    val base = docs.select(col("lang"), col("doc_id"), col("text"))
    val tok = graft.Util.fanOutIfAtLeast(base)
      .select(col("lang"), col("doc_id"),
        explode(tokens(col("text"))).as("token"))
    val totals = base.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val tokTotals = tok.groupBy(col("lang"))
      .agg(count(lit(1)).as("total_tokens"))
    val vocab = tok.select(col("lang"), col("token")).distinct()
      .groupBy(col("lang")).agg(count(lit(1)).as("vocab"))
    val dups = base
      .select(col("lang"), md5(lower(col("text"))).as("h"))
      .groupBy(col("lang"), col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .groupBy(col("lang")).agg(sum(col("c")).as("dup_docs"))
    totals
      .join(tokTotals, Seq("lang"), "left")
      .join(vocab, Seq("lang"), "left")
      .join(dups, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("total_tokens"), lit(0L)).as("total_tokens"),
        coalesce(col("vocab"), lit(0L)).as("vocab"),
        coalesce(col("dup_docs"), lit(0L)).as("dup_docs"),
        round(coalesce(col("total_tokens"), lit(0L)).cast("double") /
          col("n_docs"), 6).as("mean_tokens"))
      .orderBy(col("lang"))
  }

  /** mask_spans — T5-STYLE SPAN-CORRUPTION MASK GENERATION (Raffel
    * et al. 2020 §3.1.4; the training-OBJECTIVE stage of a pretrain
    * pipeline: after curation and packing, each sequence needs its
    * corruption mask, and generating masks in the data pipeline —
    * rather than in the training loop — makes them REPRODUCIBLE,
    * auditable, and shardable like any other column): for every
    * document, deterministic mask spans over its token positions —
    * position p starts a span iff md5(doc_id:p) ≡ 0 (mod 20) (≈5% of
    * positions; span length 3, clipped at the doc end ⇒ ≈15% token
    * corruption, the T5 default), overlapping/adjacent spans MERGE
    * (the island rule — T5 merges adjacent corruptions into one
    * sentinel). Output one row per merged span: (doc_id, span_start,
    * span_len), 0-based token positions.
    *
    * Determinism: the mask depends ONLY on (doc_id, token count) —
    * md5 is the library's cross-engine hash (the minhash digit-sum
    * recipe reconstructs the identical 32-bit value in SQL), so the
    * same shard always gets the same mask on any engine, any day.
    *
    * Scale shape: one tokenize pass (the count is the only text
    * dependence) + a per-doc typed flatMap emitting merged spans
    * directly — no shuffle at all before the output sort. */
  def maskSpans(s: SparkSession, d: String): DataFrame =
    maskSpansOn(Tables.documents(s, d))

  /** Corpus-parameterized form of [[maskSpans]]. */
  def maskSpansOn(docs: DataFrame): DataFrame =
    maskSpansFromCounts(
      // ungated fanOut: one md5 per token position is the heavy
      // rolling-hash tier (the r11 two-tier rule), not token counting
      graft.Util.fanOut(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"), size(tokens(col("text"))).cast("long")
          .as("n_tokens")))

  /** [[maskSpansOn]] over a PRECOMPUTED (doc_id, n_tokens) frame —
    * the mask depends on nothing else, so a caller that already
    * counted tokens (pack_masked shares one tokenize with the
    * packer) skips the text scan entirely. */
  def maskSpansFromCounts(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    graft.Util.fanOut(counts.select(col("doc_id"), col("n_tokens")))
      .as[(Long, Long)]
      .flatMap { case (id, n) => maskSpansOf(id, n.toInt) }
      .toDF("doc_id", "span_start", "span_len")
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** Merged mask spans of one document — object-level so the Dataset
    * closure captures nothing (the r13 serialization rule). Exposed
    * private[graft] as the spec's replay hook. */
  private[graft] def maskSpansOf(docId: Long,
                                 n: Int): Iterator[(Long, Long, Long)] = {
    if (n <= 0) return Iterator.empty
    val covered = new Array[Boolean](n)
    var p = 0
    while (p < n) {
      if (graft.operators.Dedup.posMaskHash(docId, p) % 20 == 0) {
        var i = p; val e = math.min(p + 2, n - 1)
        while (i <= e) { covered(i) = true; i += 1 }
      }
      p += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var i = 0
    while (i < n) {
      if (covered(i)) {
        var j = i
        while (j + 1 < n && covered(j + 1)) j += 1
        out += ((docId, i.toLong, (j - i + 1).toLong))
        i = j + 1
      } else i += 1
    }
    out.iterator
  }

  /** decontaminate_minkprob — the MIN-K% PROB membership audit (Shi
    * et al. 2023, "Detecting Pretraining Data from Large Language
    * Models"): score every document by the mean negative
    * log-probability of its 20% LEAST-LIKELY bigram occurrences under
    * the held-out-trained smoothed LM. The contamination direction of
    * the decontaminate family's exact n-gram matching: a document the
    * model has effectively memorized has NO surprising tail (its
    * min-k% mean sits low), while genuinely novel text keeps a heavy
    * tail of unlikely transitions — so an anomalously LOW score on a
    * benchmark document is membership evidence the exact-match
    * scanners can't see (paraphrased or reformatted contamination
    * shifts every shingle but not the tail statistics). Averaging
    * only the bottom tail rather than all tokens (plain perplexity)
    * is the paper's point: memorization shows up in the minimum,
    * not the mean.
    *
    * Determinism: per-bigram lp is the held-out add-α recipe verbatim
    * (one IEEE division, ln to the 1e-9 grid, DECIMAL(13,9)); the
    * bottom-20% cut orders occurrences by (lp, bigram) inside each
    * doc — the bigram tie-break fixes the cumulative walk, and
    * because partial takes only ever split a single (doc, bigram)
    * group, every selected occurrence at the boundary carries the
    * SAME lp, so the selected sum is tie-order-independent by
    * construction as well; m = ceil(n/5) in integer arithmetic
    * ((n+4) div 5 — positive operands, truncating div == floor both
    * engines), the take·lp products sum in exact DECIMAL, one double
    * division at the end, 6 dp (strictly positive — no signed-zero
    * wrap needed: lp < 0 always, since cnt ≤ ctx and V ≥ 2).
    *
    * Scale shape: the held-out scoring joins (bigram-keyed shuffle,
    * broadcastable ctx) plus one per-doc window pair (cumulative sum
    * + partition total — millions of SMALL partitions, the docBigrams
    * shape, never a global window) and one final per-doc aggregate. */
  def minkProb(s: SparkSession, d: String): DataFrame =
    minkProbOn(Tables.documents(s, d))

  /** Corpus-parameterized form of [[minkProb]] (train carve stays
    * doc_id % 50 ≠ 0). */
  def minkProbOn(docs: DataFrame): DataFrame = {
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    // one checkpointed bigram pass feeds model/ctx/scoring (three
    // shuffle-bearing replays before — the ngramLmHeldOut share);
    // vocab stays a lazy scan-only explode (the A/B'd rule)
    val bgAll = docBigrams(docs).localCheckpoint()
    val trainBg = bgAll.filter(col("doc_id") % 50 =!= 0)
    val (model, ctx) = ngramLmModel(trainBg)
    val vocab = train.select(explode(tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).head.getLong(0)
    minkProbExact(bgAll, model, ctx, vocab)
  }

  /** Exact-decimal core of [[minkProb]] (α fixed at 0.25, k% at 20%). */
  def minkProbExact(docBg: DataFrame, model: DataFrame,
                    ctx: DataFrame, vocab: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val num = coalesce(col("cnt"), lit(0L)).cast("double") + lit(0.25)
    val den = coalesce(col("ctx"), lit(0L)).cast("double") + lit(0.25 * vocab)
    val lp = round(log(num / den), 9).cast(DecimalType(13, 9))
    val scored = docBg
      .join(model, Seq("bigram"), "left")
      .join(ctx, Seq("w1"), "left")
      .select(col("doc_id"), col("bigram"), col("k"), lp.as("lp"))
    val wAll = Window.partitionBy(col("doc_id"))
    val wOrd = Window.partitionBy(col("doc_id"))
      .orderBy(col("lp"), col("bigram"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("n_bigrams", sum(col("k")).over(wAll))
      .withColumn("cum", sum(col("k")).over(wOrd))
      .withColumn("m", expr("(n_bigrams + 4) div 5"))
      .withColumn("take",
        least(col("k"), greatest(lit(0L), col("m") - (col("cum") - col("k")))))
      .filter(col("take") > 0)
      .groupBy(col("doc_id"))
      .agg(max(col("n_bigrams")).as("n_bigrams"),
        max(col("m")).as("n_sel"),
        sum(col("take").cast(DecimalType(9, 0)) * col("lp")).as("ssel"))
      .select(col("doc_id"), col("n_bigrams"), col("n_sel"),
        round(-(col("ssel").cast("double") / col("n_sel")), 6)
          .as("mink_neg_logp"))
      .orderBy(col("doc_id"))
  }

  /** ngram_lm_interp — the JELINEK-MERCER interpolated gate, the
    * third standard smoothing next to MLE ([[ngramLmScoreWith]]) and
    * add-α ([[ngramLmHeldOut]]): p = λ₂·p_bigram + λ₁·p_unigram +
    * λ₀·(1/V) at fixed (0.7, 0.25, 0.05). Backing off through the
    * unigram lets a NOVEL BIGRAM of two COMMON words score near its
    * unigram mass instead of crashing to the add-α floor — the
    * distinction that separates "unusual phrasing" from true
    * gibberish (whose unigrams are unseen too, leaving only the
    * uniform floor). Trained on the %50 carve like the held-out gate.
    *
    * Determinism: each λ-term is literal × (one IEEE division of
    * exact-integer-derived doubles), summed LEFT-ASSOCIATIVELY in an
    * identical expression tree on both engines (p ≥ 0.05/V > 0
    * always); from ln on, the [[ngramLmScoreWith]] recipe verbatim.
    * Scale shape: the heldout joins plus one more broadcastable
    * unigram-vocab join; train totals are two bounded driver scalars
    * (the bm25 nDocs precedent). */
  def ngramLmInterp(s: SparkSession, d: String): DataFrame = {
    // deliberately LAZY throughout: the bgAll checkpoint that wins
    // for the sibling scorers measured 1.3× SLOWER here in the r17
    // min-aggregate A/B (this chain's extra uni join keeps the
    // lazy replays overlapped; the barrier serializes them)
    val docs = Tables.documents(s, d)
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val (model, ctx) = ngramLmModel(docBigrams(train))
    val uni = train.select(explode(tokens(col("text"))).as("w2"))
      .groupBy(col("w2")).agg(count(lit(1)).as("ucnt"))
    val stats = train.select(explode(tokens(col("text"))).as("t"))
      .agg(count(lit(1)).as("n"), countDistinct(col("t")).as("v")).head()
    ngramLmInterpExact(docBigrams(docs), model, ctx, uni,
      stats.getAs[Long]("n"), stats.getAs[Long]("v"))
  }

  /** Exact-decimal core of [[ngramLmInterp]] (λ fixed at
    * 0.7/0.25/0.05 — parsed to identical doubles by both engines). */
  def ngramLmInterpExact(docBg: DataFrame, model: DataFrame,
                         ctx: DataFrame, uni: DataFrame,
                         totalTokens: Long, vocab: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val pBi = when(coalesce(col("ctx"), lit(0L)) > 0,
        lit(0.7) * (coalesce(col("cnt"), lit(0L)).cast("double") /
          col("ctx").cast("double")))
      .otherwise(lit(0.0))
    val pUni = lit(0.25) * (coalesce(col("ucnt"), lit(0L)).cast("double") /
      lit(totalTokens.toDouble))
    val pFloor = lit(0.05) / lit(vocab.toDouble)
    val lp = round(log(pBi + pUni + pFloor), 9).cast(DecimalType(13, 9))
    docBg
      .withColumn("w2", element_at(split(col("bigram"), " "), 2))
      .join(model, Seq("bigram"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(uni, Seq("w2"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k").cast(DecimalType(9, 0)) * lp).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-(col("slp").cast("double") / col("n_bigrams")), 6)
          .as("avg_neg_logp"))
      .withColumn("ppl", round(exp(col("avg_neg_logp")), 6))
      .orderBy(col("doc_id"))
  }

  /** ngram_lm_kn — interpolated KNESER-NEY, the fourth and
    * production-standard smoothing tier (the KenLM default) next to
    * MLE ([[ngramLmScoreWith]]), add-α ([[ngramLmHeldOut]]) and
    * Jelinek-Mercer ([[ngramLmInterp]]): absolute discount D = 0.75
    * moved from seen bigrams onto a CONTINUATION back-off —
    * p(w|u) = max(c(u,w) − D, 0)/c(u·)
    *        + D·N1+(u·)/c(u·) · p_cont(w),
    * p_cont(w) = (N1+(·w) + 1)/(T + V)  (add-1 on the continuation
    * counts keeps unseen words strictly positive; T = train bigram
    * types, V = train vocab). What KN adds over JM: the back-off
    * weighs how many DISTINCT contexts a word completes, not its raw
    * frequency — "francisco" is frequent but follows only "san", so
    * a novel "the francisco" is penalized where JM's unigram back-off
    * would reward it. Trained on the %50 carve like the other gates.
    *
    * Determinism: D = 0.75 and the +1 keep every operand on an exact
    * binary grid (quarter-grid counts < 2^51), so each branch is a
    * FIXED expression tree of IEEE ops on identical inputs (two
    * divisions, one multiply, one max — the quality_distill
    * principle: only data-dependent ACCUMULATION needs the decimal
    * recipe); ln onward is the [[ngramLmScoreWith]] recipe verbatim.
    * Scale shape: the heldout joins (shuffle on bigram, broadcastable
    * w1/w2 side tables) + two bounded driver scalars (bm25 nDocs
    * precedent). */
  def ngramLmKn(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    // one checkpointed bigram pass feeds model/cstat/cont/
    // bigramTypes and the scoring side (five shuffle-bearing
    // replays before — the ngramLmHeldOut share); vocab stays a
    // lazy scan-only explode (the A/B'd rule)
    val bgAll = docBigrams(docs).localCheckpoint()
    val trainBg = bgAll.filter(col("doc_id") % 50 =!= 0)
    val model = trainBg.groupBy(col("bigram")).agg(sum(col("k")).as("cnt"))
    val cstat = trainBg.groupBy(col("w1"))
      .agg(sum(col("k")).as("ctx"), countDistinct(col("bigram")).as("n1fwd"))
    val cont = trainBg
      .select(element_at(split(col("bigram"), " "), 2).as("w2"), col("w1"))
      .distinct()
      .groupBy(col("w2")).agg(count(lit(1)).as("cont"))
    val bigramTypes = model.count()
    val vocab = train.select(explode(tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).head.getLong(0)
    ngramLmKnExact(bgAll, model, cstat, cont, bigramTypes, vocab)
  }

  /** Exact-decimal core of [[ngramLmKn]] (D fixed at 0.75). */
  def ngramLmKnExact(docBg: DataFrame, model: DataFrame, cstat: DataFrame,
                     cont: DataFrame, bigramTypes: Long,
                     vocab: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val pcont = (coalesce(col("cont"), lit(0L)).cast("double") + lit(1.0)) /
      lit((bigramTypes + vocab).toDouble)
    val ctxd = col("ctx").cast("double")
    val p = when(coalesce(col("ctx"), lit(0L)) > 0,
        greatest(coalesce(col("cnt"), lit(0L)).cast("double") - lit(0.75),
            lit(0.0)) / ctxd +
          ((lit(0.75) * col("n1fwd").cast("double")) / ctxd) * pcont)
      .otherwise(pcont)
    val lp = round(log(p), 9).cast(DecimalType(13, 9))
    docBg
      .withColumn("w2", element_at(split(col("bigram"), " "), 2))
      .join(model, Seq("bigram"), "left")
      .join(cstat, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k").cast(DecimalType(9, 0)) * lp).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-(col("slp").cast("double") / col("n_bigrams")), 6)
          .as("avg_neg_logp"))
      .withColumn("ppl", round(exp(col("avg_neg_logp")), 6))
      .orderBy(col("doc_id"))
  }

  def ngramLmScore(s: SparkSession, d: String): DataFrame =
    ngramLmScore(Tables.documents(s, d))

  /** Self-trained composition (the oracle-gated query): trains on the
    * input corpus and scores it. The doc-bigram frame feeds THREE
    * plan branches (model, ctx, the scoring join), so it is eagerly
    * checkpointed once — lineage would replay the corpus
    * tokenize + lead window per branch (measured: the r17 plan
    * showed the documents scan 6×; the ≥3-branch rule). The
    * production path still materializes `ngramLmModel` as a parquet
    * artifact (see its Scaladoc) — the checkpoint is the in-query
    * form's answer, the artifact split the cross-run one. */
  def ngramLmScore(docs: DataFrame): DataFrame =
    ngramLmScoreOnBg(docBigrams(docs).localCheckpoint())

  /** [[ngramLmScore]] body over a precomputed doc-bigram frame. */
  private[functions] def ngramLmScoreOnBg(docBg: DataFrame): DataFrame = {
    val (model, ctx) = ngramLmModel(docBg)
    ngramLmScoreWith(docBg, model, ctx)
  }

  /** collocations — corpus-level collocation mining: top-k adjacent
    * token pairs by pointwise mutual information,
    * PMI = ln(N·c_ab / (c_a·c_b)) over the corpus bigram stream
    * (c_a / c_b = first- / second-position unigram counts, the
    * standard bigram-PMI margins), with a minimum pair count so rare
    * accidents don't dominate — the collocation extractor of the
    * classic NLP pipeline (Church & Hanks 1990).
    *
    * Determinism: the PMI argument is a ratio of two exact BIGINT
    * products (each < 2^53 here — beyond that, the margins' decimal
    * recipe applies), ONE IEEE division, ln, round 6 dp; ranking on
    * the ROUNDED value with bigram tie-break, so the top-k cut is
    * engine-identical. Scale shape: one tokenize pass (fanned out,
    * per-doc lead window), three partial-agg reductions off ONE
    * checkpointed bigram frame, margins joined back (broadcast at a
    * bounded vocabulary; shuffle on the key otherwise), TakeOrdered
    * top-k — never a global rank window. */
  def collocations(s: SparkSession, d: String,
                   minCount: Long = 5, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = graft.Util.fanOut(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "w1")))
      .withColumn("w2", lead(col("w1"), 1).over(byPos))
      .where(col("w2").isNotNull)
      .select(col("w1"), col("w2"))
      .localCheckpoint()
    val n = bg.count()
    val ab = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
    val ua = bg.groupBy(col("w1")).agg(count(lit(1)).as("n_a"))
    val ub = bg.groupBy(col("w2")).agg(count(lit(1)).as("n_b"))
    ab.filter(col("n_ab") >= minCount)
      .join(broadcast(ua), "w1").join(broadcast(ub), "w2")
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"),
        col("n_ab"), col("n_a"), col("n_b"),
        round(log((lit(n) * col("n_ab")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(k)
  }

  /** select_learnability — LEARNABILITY-based data selection (the
    * RHO-loss family: Mindermann et al. ICML'22 prioritize points
    * that are "learnable, worth learning, and not yet learnt"; RHO-1
    * (2024) applies the same excess-loss signal token-level): score
    * each doc by EXCESS loss — the self-trained current-model
    * surprise ([[ngramLmScore]]'s MLE avg_neg_logp) minus the
    * held-out REFERENCE model's surprise ([[ngramLmHeldOut]]'s
    * smoothed avg_neg_logp). High delta = the current model finds
    * the doc hard but the reference does not — learnable, worth
    * training on; near-zero/negative = already learnt (or noise the
    * reference also rejects). Output per doc: both scores, delta,
    * the FIXED score bin (floor(delta·10) — never rank deciles: a
    * global rank is a single-partition window at scale), and
    * keep = delta > 0.
    *
    * Determinism: both inputs are already 6-dp doubles from verified
    * recipes; delta is one subtraction of identical bit inputs
    * re-rounded 6 dp; bin/keep are integers off the rounded value
    * with explicit floor. Scale shape: the two LM chains (at 100 TB
    * both models are write-once ngramLmModel artifacts — the scoring
    * is then two broadcast-joined passes) + ONE doc_id equi-join. */
  def selectLearnability(s: SparkSession, d: String): DataFrame = {
    // BOTH LM chains score the same corpus: materialize the shared
    // doc-bigram frame ONCE and feed the two scoring cores — calling
    // ngramLmScore + ngramLmHeldOut would each checkpoint an
    // identical docBigrams frame (two materializations of the same
    // pass, measured 1.17× in the r17 min-aggregate A/B)
    val docs = Tables.documents(s, d)
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val bgAll = docBigrams(docs).localCheckpoint()
    val (hModel, hCtx) = ngramLmModel(bgAll.filter(col("doc_id") % 50 =!= 0))
    val vocab = train.select(explode(tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).head.getLong(0)
    val self = ngramLmScoreOnBg(bgAll)
      .select(col("doc_id"), col("avg_neg_logp").as("self_nll"))
    val ref = ngramLmScoreHeldOutExact(bgAll, hModel, hCtx, vocab)
      .select(col("doc_id"), col("avg_neg_logp").as("ref_nll"))
    self.join(ref, "doc_id")
      .withColumn("delta", round(col("self_nll") - col("ref_nll"), 6))
      .withColumn("bin", floor(col("delta") * 10).cast("int"))
      .withColumn("keep",
        when(col("delta") > 0, 1).otherwise(0).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** ccnet_buckets — CCNet's head/middle/tail perplexity
    * partitioning (Wenzek et al., "CCNet: Extracting High Quality
    * Monolingual Datasets from Web Crawl Data", LREC 2020): the
    * corpus splits at its perplexity tertiles, head = the cleanest
    * third — the bucketing that feeds CCNet's keep-head-and-middle
    * default. Thresholds are exact tertile ELEMENTS — the ppl at
    * sorted-(ppl, doc_id) positions ceil(n/3) and ceil(2n/3) —
    * never an interpolated quantile (engines disagree on
    * interpolation; they cannot disagree on a specific element of a
    * 6-dp-rounded sort). Ties AT a threshold value land in the lower
    * bucket on both engines (plain value comparison).
    *
    * Scale shape: scoring is [[ngramLmScore]]'s one-pass recipe (at
    * 100 TB the model is the write-once ngramLmModel artifact); the
    * tertile elements are selected DISTRIBUTEDLY — ppl sits on the
    * 6-dp grid, so `groupBy(ppl).count()` is a bounded-cardinality
    * histogram (the grid caps its size regardless of corpus rows; a
    * corpus-proportional TakeOrdered here was r12's flagged
    * scale-killer: one task heaping n/3 rows, plus a k.toInt
    * overflow past ~6.4B rows), the cumulative count walks that
    * bounded frame (the sketch_quantiles exact-rank channel — an
    * unpartitioned window over an agg frame whose size the value
    * grid bounds), and the k-th smallest element is the least ppl
    * with cum ≥ k; bucketing is one comparison per row. */
  def ccnetBuckets(s: SparkSession, d: String): DataFrame =
    ccnetBuckets(Tables.documents(s, d))

  def ccnetBuckets(docs: DataFrame): DataFrame =
    ccnetBucketsScored(ngramLmScore(docs))

  /** [[ccnetBuckets]] body over a precomputed LM score frame — split
    * out so the quality chain can feed it from a shared tokenize
    * pass. */
  private[functions] def ccnetBucketsScored(lmScored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = lmScored
      .select(col("doc_id"), col("ppl")).localCheckpoint()
    val n = scored.count()
    val wc = Window.orderBy(col("ppl"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = scored.groupBy(col("ppl")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wc))
      .localCheckpoint()
    def kth(k: Long): Double = cum.filter(col("cum") >= k)
      .agg(min(col("ppl"))).collect().head.getDouble(0)
    val t1 = kth((n + 2) / 3)
    val t2 = kth((2 * n + 2) / 3)
    scored.select(col("doc_id"), col("ppl"),
      when(col("ppl") <= t1, "head")
        .when(col("ppl") <= t2, "middle")
        .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** quality_distill — train a quality model IN the engine: OLS
    * regression of the expensive bigram-LM score ([[ngramLmScore]])
    * on two cheap per-doc features (avg token length, stopword ratio) —
    * the distillation pattern real pipelines use to replace a
    * costly filter with a linear proxy scored in one cheap pass at
    * 100 TB. Closed-form fit: the nine feature/target moments are
    * EXACT decimal aggregates (features snapped to the 1e-9 grid,
    * target already on the 6-dp grid; products exact in
    * DECIMAL(13,9)² — no summation-order ambiguity), each cast ONCE
    * to double; coefficients come from the 3×3 Cramer cofactor
    * expansion written as an IDENTICAL scalar expression tree in
    * both engines (fixed-size double arithmetic on identical inputs
    * is bit-deterministic — only data-dependent accumulation needs
    * the decimal recipe). Output: one row
    * (n_docs, intercept, b_len, b_stop, r2), all rounded 6 dp.
    *
    * Scale shape: one corpus pass for features, the LM score's own
    * passes for the target (at scale the LM model is the write-once
    * artifact — ngramLmModel), one inner join on doc_id, ONE
    * 10-value aggregate. Training cost is the moment aggregation;
    * the solve is O(1) on 10 scalars. */
  /** quality_calibration: the calibration CURVE between the cheap
    * heuristic gate ([[textStats]] quality_score) and the expensive
    * LM gate ([[ngramLmScore]] avg neg-logp) — what a pipeline
    * publishes before trusting the cheap filter at 100 TB (the
    * histogram twin of [[qualityDistill]]'s regression): per FIXED
    * score bin (floor(score·10) — fixed bins, not rank deciles: a
    * global rank is a single-partition window at scale, a binned
    * histogram is one map + partial agg), doc count and the mean of
    * both scores. Means follow the exact-decimal recipe (9-dp snap →
    * exact DECIMAL sum → one division → 6 dp); floor() is explicit
    * (the CAST-rounds-vs-truncates trap). */
  def qualityCalibration(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val stats = textStats(s, d).select(col("doc_id"), col("quality_score"))
    val lm = ngramLmScore(s, d).select(col("doc_id"), col("avg_neg_logp"))
    stats.join(lm, "doc_id")
      .withColumn("bin", floor(col("quality_score") * 10).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(round(col("quality_score"), 9).cast(DecimalType(13, 9)))
          .cast("double") / count(lit(1)), 6).as("mean_quality"),
        round(sum(col("avg_neg_logp").cast(DecimalType(13, 9)))
          .cast("double") / count(lit(1)), 6).as("mean_nll"))
      .orderBy(col("bin"))
  }

  def qualityDistill(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // features must VARY on this corpus: the synthetic soup has zero
    // punctuation, so punct_ratio is identically 0 (a singular moment
    // matrix — ANSI divide-by-zero found it); avg token length and
    // stopword ratio both vary per doc
    val feats = textStats(Tables.documents(s, d))
      .select(col("doc_id"),
        round(col("avg_token_len"), 9).cast(DecimalType(13, 9)).as("x1"),
        round(col("stopword_ratio"), 9).cast(DecimalType(13, 9)).as("x2"))
    val target = ngramLmScore(s, d)
      .select(col("doc_id"), col("avg_neg_logp").cast(DecimalType(13, 9)).as("y"))
    val m = feats.join(target, "doc_id").agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x1")).cast("double").as("s1"),
      sum(col("x2")).cast("double").as("s2"),
      sum(col("x1") * col("x1")).cast("double").as("s11"),
      sum(col("x1") * col("x2")).cast("double").as("s12"),
      sum(col("x2") * col("x2")).cast("double").as("s22"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x1") * col("y")).cast("double").as("s1y"),
      sum(col("x2") * col("y")).cast("double").as("s2y"),
      sum(col("y") * col("y")).cast("double").as("syy"),
      count(lit(1)).as("n_docs"))
    val (n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy) =
      (col("n"), col("s1"), col("s2"), col("s11"), col("s12"), col("s22"),
        col("sy"), col("s1y"), col("s2y"), col("syy"))
    // 3x3 Cramer cofactor expansions — the EXACT same parenthesized
    // tree as the oracle SQL (bit-identical double evaluation)
    val dd = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val d0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val d1 = n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val d2 = n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    m.select(col("n_docs"),
      round(d0 / dd, 6).as("intercept"),
      round(d1 / dd, 6).as("b_len"),
      round(d2 / dd, 6).as("b_stop"),
      round(lit(1.0) - (syy - (d0 * sy + d1 * s1y + d2 * s2y) / dd) /
        (syy - sy * sy / n), 6).as("r2"))
  }

  /** Persist the distilled quality model ([[qualityDistill]]'s 1-row
    * coefficient frame) — the write-once artifact of the
    * distillation loop. */
  def writeQualityModel(s: SparkSession, d: String, dir: String): Unit =
    qualityDistill(s, d).coalesce(1).write.mode("overwrite").parquet(dir)

  /** Score docs with a stored distilled model — the POINT of the
    * distillation: one cheap column-expression pass (two ratios, two
    * multiplies) where the LM filter pays bigram explodes and model
    * joins. The coefficient row is a bounded driver artifact (the
    * centroid pattern). Spec'd by the OLS invariants: residuals of
    * the training corpus sum to ~0 and the residual-recomputed R²
    * matches the fit's. */
  def scoreWithQualityModel(docs: DataFrame, modelDir: String): DataFrame = {
    val s = docs.sparkSession
    val m = s.read.parquet(modelDir).head()
    val (b0, bLen, bStop) = (m.getAs[Double]("intercept"),
      m.getAs[Double]("b_len"), m.getAs[Double]("b_stop"))
    textStats(docs)
      .select(col("doc_id"), col("avg_token_len"), col("stopword_ratio"))
      .withColumn("pred_neg_logp",
        lit(b0) + lit(bLen) * col("avg_token_len") +
          lit(bStop) * col("stopword_ratio"))
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

  /** vocab_drift — per-source Jensen-Shannon divergence of the token
    * distribution against the REST of the corpus: the drift report a
    * pipeline publishes before mixing sources (or day-over-day before
    * appending a crawl snapshot) — a source whose JSD jumps has
    * changed character and re-opens the mixture weights. Also per
    * source: token/type counts and the types EXCLUSIVE to the source.
    *
    * Determinism (the textEntropy discipline — transcendentals only
    * ever on exact INTEGERS): with c = in-source count, e = rest
    * count, Ns/Nr the side totals, the JSD term logs are
    * ln(2·c·Nr) − ln(c·Nr + e·Ns) and ln(2·e·Ns) − ln(same) — every
    * argument an exact BIGINT (< 2^53 through sf0.1; a 100 TB run
    * promotes the products to DECIMAL, the regress_trend move), each
    * log snapped to the 1e-9 grid and differenced as exact
    * DECIMAL(13,9), weighted by exact DECIMAL counts, summed
    * exactly; each side then pays ONE double division (by 2·Ns resp.
    * 2·Nr), the two sides add as one fixed tree, 6 dp.
    *
    * Scale shape: ONE tokenize pass → (source, token) partial-agg
    * counts; the rest-side count is total − in-source (no second
    * scan); side totals ride an unpartitioned window over the
    * source-count frame (5 rows — the sample_temperature pattern,
    * never a 1-row crossJoin). */
  def vocabDrift(s: SparkSession, d: String): DataFrame =
    vocabDrift(Tables.documents(s, d))

  def vocabDrift(docs: org.apache.spark.sql.DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import org.apache.spark.sql.expressions.Window
    val s = docs.sparkSession
    import s.implicits._
    val dec13 = (c: Column) => c.cast(DecimalType(13, 0))
    val ln9 = (c: Column) => round(log(c), 9).cast(DecimalType(13, 9))
    val st = docs
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
    val tt = st.groupBy(col("token")).agg(sum(col("c")).as("ct"))
    val ns = st.groupBy(col("source")).agg(sum(col("c")).as("n_src"))
      .withColumn("n_rest",
        sum(col("n_src")).over(Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          - col("n_src"))
    // the grid must cover tokens ABSENT from a source (c = 0, e > 0):
    // their rest-side mass is where drift lives. #sources is bounded
    // (the nlist-collect discipline), so explode beats a 5-row
    // crossJoin that would plan as a BroadcastNestedLoopJoin.
    val sources = ns.select(col("source")).as[String].collect().sorted
    val grid = tt.withColumn("source",
      explode(array(sources.map(lit(_)): _*)))
    val j = grid.join(st, Seq("source", "token"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .join(ns, "source")
      .withColumn("e", col("ct") - col("c"))
      .withColumn("m", col("c") * col("n_rest") + col("e") * col("n_src"))
    val zero = lit(0).cast(DecimalType(27, 9))
    val terms = j.select(col("source"), col("c"), col("e"),
      when(col("c") > 0,
        dec13(col("c")) *
          (ln9(col("c") * col("n_rest") * lit(2L)) - ln9(col("m"))))
        .otherwise(zero).as("term_p"),
      when(col("e") > 0,
        dec13(col("e")) *
          (ln9(col("e") * col("n_src") * lit(2L)) - ln9(col("m"))))
        .otherwise(zero).as("term_q"))
    terms.groupBy(col("source"))
      .agg(sum(when(col("c") > 0, 1L).otherwise(0L)).as("n_types"),
        sum(when(col("c") > 0 && col("e") === 0, 1L).otherwise(0L))
          .as("exclusive_types"),
        sum(col("term_p")).as("sp"), sum(col("term_q")).as("sq"))
      .join(ns, "source")
      .select(col("source"), col("n_src").as("n_tokens"), col("n_types"),
        col("exclusive_types"),
        round(col("sp").cast("double") /
            (col("n_src") * lit(2L)).cast("double") +
          col("sq").cast("double") /
            (col("n_rest") * lit(2L)).cast("double"), 6).as("jsd_vs_rest"))
      .orderBy(col("source"))
  }

  /** (token, c) counts of a doc frame — the stored REFERENCE artifact
    * [[vocabDriftAgainst]] monitors against (write once per reference
    * corpus, read per batch). */
  def vocabCounts(docs: org.apache.spark.sql.DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))

  /** Batch-vs-REFERENCE drift (the monitor form of [[vocabDrift]]):
    * one row — the JSD between an arriving batch's token distribution
    * and a stored reference vocabulary, plus batch token/type counts
    * and reference-novel types. Same integer-log determinism as
    * vocabDrift (identical distributions score EXACTLY 0). The grid
    * is the FULL OUTER join of batch and reference counts (either
    * side's exclusive mass is where drift lives); side totals are two
    * bounded driver scalars (the ccnet_buckets discipline), never a
    * vocab-wide unpartitioned window. The ingest-stream twin is
    * [[graft.streaming.EventStream.streamingVocabDrift]]. */
  def vocabDriftAgainst(refCounts: DataFrame,
                        batchDocs: org.apache.spark.sql.DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec13 = (c: Column) => c.cast(DecimalType(13, 0))
    val ln9 = (c: Column) => round(log(c), 9).cast(DecimalType(13, 9))
    val j = vocabCounts(batchDocs).withColumnRenamed("c", "cb")
      .join(refCounts.select(col("token"), col("c").as("cr")),
        Seq("token"), "full_outer")
      .select(coalesce(col("cb"), lit(0L)).as("cb"),
        coalesce(col("cr"), lit(0L)).as("cr"))
      .localCheckpoint()
    val tot = j.agg(sum(col("cb")), sum(col("cr"))).head()
    val (ns, nr) = (tot.getLong(0), tot.getLong(1))
    val zero = lit(0).cast(DecimalType(27, 9))
    val m = col("cb") * lit(nr) + col("cr") * lit(ns)
    j.select(col("cb"), col("cr"),
        when(col("cb") > 0,
          dec13(col("cb")) * (ln9(col("cb") * lit(nr) * lit(2L)) - ln9(m)))
          .otherwise(zero).as("term_p"),
        when(col("cr") > 0,
          dec13(col("cr")) * (ln9(col("cr") * lit(ns) * lit(2L)) - ln9(m)))
          .otherwise(zero).as("term_q"))
      .agg(sum(when(col("cb") > 0, 1L).otherwise(0L)).as("n_types"),
        sum(when(col("cb") > 0 && col("cr") === 0, 1L).otherwise(0L))
          .as("novel_types"),
        sum(col("term_p")).as("sp"), sum(col("term_q")).as("sq"))
      .select(lit(ns).as("n_tokens"), col("n_types"), col("novel_types"),
        round(col("sp").cast("double") / lit(2.0 * ns) +
          col("sq").cast("double") / lit(2.0 * nr), 6).as("jsd_vs_ref"))
  }

  /** Query form of [[vocabDriftAgainst]]: the odd-id half of the
    * corpus monitored against the even-id half as the stored
    * reference — one oracle-gated row exercising the full-outer grid
    * and the driver-scalar totals. */
  def vocabDriftRef(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    vocabDriftAgainst(vocabCounts(docs.filter(col("doc_id") % 2 === 0)),
      docs.filter(col("doc_id") % 2 =!= 0))
  }

  /** DuckDB oracle for [[vocabDriftRef]] — same chains; the 1-row
    * totals CROSS JOIN is fine single-node oracle-side. */
  val vocabDriftRefOracle: String = """
    WITH tok AS (
      SELECT doc_id,
        unnest(list_filter(string_split_regex(lower(text), '\s+'),
               x -> length(x) > 0)) AS token
      FROM documents),
    bc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cb
           FROM tok WHERE doc_id % 2 <> 0 GROUP BY 1),
    rc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cr
           FROM tok WHERE doc_id % 2 = 0 GROUP BY 1),
    g AS (
      SELECT COALESCE(b.cb, 0) AS cb, COALESCE(r.cr, 0) AS cr
      FROM bc b FULL OUTER JOIN rc r USING (token)),
    t AS (SELECT CAST(SUM(cb) AS BIGINT) AS ns,
                 CAST(SUM(cr) AS BIGINT) AS nr FROM g),
    terms AS (
      SELECT cb, cr, ns, nr,
        CASE WHEN cb > 0 THEN
          CAST(cb AS DECIMAL(13,0)) *
            (CAST(round(ln(cb * nr * 2), 9) AS DECIMAL(13,9)) -
             CAST(round(ln(cb * nr + cr * ns), 9) AS DECIMAL(13,9)))
        ELSE CAST(0 AS DECIMAL(27,9)) END AS term_p,
        CASE WHEN cr > 0 THEN
          CAST(cr AS DECIMAL(13,0)) *
            (CAST(round(ln(cr * ns * 2), 9) AS DECIMAL(13,9)) -
             CAST(round(ln(cb * nr + cr * ns), 9) AS DECIMAL(13,9)))
        ELSE CAST(0 AS DECIMAL(27,9)) END AS term_q
      FROM g CROSS JOIN t)
    SELECT MAX(ns) AS n_tokens,
      CAST(SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_types,
      CAST(SUM(CASE WHEN cb > 0 AND cr = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS novel_types,
      round(CAST(SUM(term_p) AS DOUBLE) / (2.0 * MAX(ns)) +
            CAST(SUM(term_q) AS DOUBLE) / (2.0 * MAX(nr)), 6) AS jsd_vs_ref
    FROM terms"""

  /** DuckDB oracle for [[vocabDrift]] — the same integer-log/decimal
    * chain; the side totals ride the same unpartitioned window. */
  val vocabDriftOracle: String = """
    WITH tok AS (
      SELECT source,
        unnest(list_filter(string_split_regex(lower(text), '\s+'),
               x -> length(x) > 0)) AS token
      FROM documents),
    st AS (SELECT source, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    tt AS (SELECT token, CAST(SUM(c) AS BIGINT) AS ct FROM st GROUP BY 1),
    ns AS (
      SELECT source, n_src,
        CAST(SUM(n_src) OVER () AS BIGINT) - n_src AS n_rest
      FROM (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src
            FROM st GROUP BY 1)),
    j AS (
      SELECT a.source, COALESCE(s.c, 0) AS c,
        t.ct - COALESCE(s.c, 0) AS e, a.n_src, a.n_rest,
        COALESCE(s.c, 0) * a.n_rest +
          (t.ct - COALESCE(s.c, 0)) * a.n_src AS m
      FROM tt t CROSS JOIN ns a
      LEFT JOIN st s ON s.source = a.source AND s.token = t.token),
    terms AS (
      SELECT source, c, e,
        CASE WHEN c > 0 THEN
          CAST(c AS DECIMAL(13,0)) *
            (CAST(round(ln(c * n_rest * 2), 9) AS DECIMAL(13,9)) -
             CAST(round(ln(m), 9) AS DECIMAL(13,9)))
        ELSE CAST(0 AS DECIMAL(27,9)) END AS term_p,
        CASE WHEN e > 0 THEN
          CAST(e AS DECIMAL(13,0)) *
            (CAST(round(ln(e * n_src * 2), 9) AS DECIMAL(13,9)) -
             CAST(round(ln(m), 9) AS DECIMAL(13,9)))
        ELSE CAST(0 AS DECIMAL(27,9)) END AS term_q
      FROM j)
    SELECT t.source, a.n_src AS n_tokens,
      CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_types,
      CAST(SUM(CASE WHEN c > 0 AND e = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS exclusive_types,
      round(CAST(SUM(term_p) AS DOUBLE) / CAST(a.n_src * 2 AS DOUBLE) +
            CAST(SUM(term_q) AS DOUBLE) / CAST(a.n_rest * 2 AS DOUBLE), 6)
        AS jsd_vs_rest
    FROM terms t JOIN ns a USING (source)
    GROUP BY t.source, a.n_src, a.n_rest
    ORDER BY t.source"""
}
