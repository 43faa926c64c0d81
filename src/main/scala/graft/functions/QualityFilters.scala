package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two canonical PUBLISHED pre-training quality-filter rule sets,
  * as oracle-gated per-document report queries:
  *
  *   - gopher_rules — Gopher's document-quality heuristics (Rae et
  *     al., "Scaling Language Models: ... Gopher", 2021, App. A1.1):
  *     word-count bounds, mean-word-length band, symbol-to-word
  *     ratio, alphabetic-word fraction, stop-word presence, and the
  *     two line-shape rules (bullet-start / ellipsis-end fractions).
  *   - c4_filters — C4's line+page cleaning (Raffel et al., "Exploring
  *     the Limits of Transfer Learning with a Unified Text-to-Text
  *     Transformer", 2020 §2.2): keep lines ending in terminal
  *     punctuation with ≥3 words and no "javascript" token; drop
  *     pages with < 5 surviving sentences, a curly brace, or
  *     "lorem ipsum".
  *
  * Both use the corpus "line" convention of [[graft.operators.Dedup]]
  * (10-token groups of the lowered whitespace tokens — the synthetic
  * corpus has no newlines) and inject a handful of crafted documents
  * at NEGATIVE doc_ids on BOTH engines (the text_normalize degraded-
  * injection discipline): the natural token soup exercises few rules,
  * the injects make every rule fire at least once, so the oracle
  * verifies real rule arithmetic rather than constant flags.
  *
  * Determinism: every rule is an INTEGER comparison (mean word length
  * in [3,10] ⇔ 3·words ≤ chars ≤ 10·chars-bound etc.) — no ratio is
  * ever materialized as a double, so the oracle is exact by
  * construction.
  *
  * Scale shape: one typed map per document (gated fan-out), no
  * shuffle at all — the flags land next to the doc and downstream
  * gates filter on them (the [[graft.Pipeline]] cheap-gate family).
  */
object QualityFilters {

  private[graft] val GopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Crafted docs that make each Gopher rule discriminate (ids < 0 so
    * they can never collide with corpus ids). */
  private[graft] val GopherInjects: Seq[(Long, String)] = Seq(
    -1L -> Seq.fill(10)("- a b c d e f g h i").mkString(" "),
    -2L -> Seq.fill(10)("auto models generate long token streams over wide contexts now...")
      .mkString(" "),
    -3L -> Seq.fill(60)("x#").mkString(" "),
    -4L -> "tiny doc only five words",
    -5L -> Seq.fill(60)("12345").mkString(" "),
    -6L -> Seq.fill(6)("the quick brown fox jumps over that lazy dog with")
      .mkString(" "))

  /** Crafted docs for the C4 rules: five proper "sentences" pass; a
    * javascript token, lorem ipsum, a brace, a 4-sentence page, two
    * punctuation-less lines, and a 2-word trailing line each trip
    * exactly the intended rule. */
  private[graft] val C4Injects: Seq[(Long, String)] = Seq(
    -1L -> Seq.fill(5)("alpha beta gamma delta epsilon zeta eta theta iota kappa.")
      .mkString(" "),
    -2L -> (Seq.fill(4)("alpha beta gamma delta epsilon zeta eta theta iota kappa.")
      .mkString(" ") + " alpha beta gamma delta epsilon zeta eta theta javascript kappa."),
    -3L -> (Seq.fill(5)("alpha beta gamma delta epsilon zeta eta theta iota kappa.")
      .mkString(" ") + " lorem ipsum dolor sit amet consectetur adipiscing elit sed do."),
    -4L -> (Seq.fill(5)("alpha beta gamma delta epsilon zeta eta theta iota kappa.")
      .mkString(" ") + " var x equals open {brace} close semicolon end of block."),
    -5L -> Seq.fill(4)("alpha beta gamma delta epsilon zeta eta theta iota kappa.")
      .mkString(" "),
    -6L -> (Seq.fill(5)("alpha beta gamma delta epsilon zeta eta theta iota kappa.")
      .mkString(" ") + " " +
      Seq.fill(2)("alpha beta gamma delta epsilon zeta eta theta iota kappa")
        .mkString(" ")),
    -7L -> (Seq.fill(4)("alpha beta gamma delta epsilon zeta eta theta iota kappa.")
      .mkString(" ") + " ended now."))

  private def toks(text: String): Array[String] =
    text.toLowerCase.split("[ \t\n\r]+").filter(_.nonEmpty)

  private def lines(ts: Array[String]): Iterator[Array[String]] =
    ts.grouped(10)

  private def injected(docs: DataFrame,
                       injects: Seq[(Long, String)]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("text"))
      .unionByName(injects.toDF("doc_id", "text"))
  }

  // ---- gopher_rules -------------------------------------------------------

  def gopherRules(s: SparkSession, d: String): DataFrame =
    gopherRules(injected(graft.Tables.documents(s, d), GopherInjects))

  def gopherRules(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    graft.Util.fanOutIfAtLeast(
        docs.select(col("doc_id"), col("text")).as[(Long, String)])
      .map { case (id, text) =>
        val ts = lines(toks(text)).map(_.toSeq).toSeq
        val words = ts.iterator.map(_.length).sum
        val wordChars = ts.iterator.flatten.map(_.length).sum
        val lower = text.toLowerCase
        val nHash = lower.count(_ == '#')
        val nEll = (lower.length - lower.replace("...", "").length) / 3
        val nSym = nHash + nEll
        val nAlpha = ts.iterator.flatten
          .count(_.exists(c => c >= 'a' && c <= 'z'))
        val tokenSet = ts.iterator.flatten.toSet
        val nStop = GopherStops.count(tokenSet.contains)
        val nLines = ts.length
        val joined = ts.map(_.mkString(" "))
        val nBullet = joined.count(_.startsWith("- "))
        val nEllLine = joined.count(_.endsWith("..."))
        def b(x: Boolean) = if (x) 1 else 0
        val fWords = b(words >= 50 && words <= 100000)
        val fMean = b(3L * words <= wordChars && wordChars <= 10L * words)
        val fSym = b(10L * nSym < words)
        val fAlpha = b(5L * nAlpha >= 4L * words)
        val fStop = b(nStop >= 2)
        val fBullet = b(10L * nBullet <= 9L * nLines)
        val fEll = b(10L * nEllLine <= 3L * nLines)
        val passes =
          fWords * fMean * fSym * fAlpha * fStop * fBullet * fEll
        (id, words, wordChars, nSym, nAlpha, nStop, nLines, nBullet,
          nEllLine, fWords, fMean, fSym, fAlpha, fStop, fBullet, fEll,
          passes)
      }
      .toDF("doc_id", "n_words", "n_word_chars", "n_sym", "n_alpha_words",
        "n_stop", "n_lines", "n_bullet", "n_ellipsis", "f_words",
        "f_mean_len", "f_sym", "f_alpha", "f_stop", "f_bullet",
        "f_ellipsis", "passes")
      .orderBy(col("doc_id"))
  }

  private def injectValues(injects: Seq[(Long, String)]): String =
    injects.map { case (id, t) =>
      s"($id, '${t.replace("'", "''")}')"
    }.mkString(",\n        ")

  val gopherRulesOracle: String = {
    val stops = GopherStops.map(w => s"'$w'").mkString(", ")
    raw"""
      WITH src AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT * FROM (VALUES
        ${injectValues(GopherInjects)}) v(doc_id, text)),
      t AS (
        SELECT doc_id, lower(text) AS lo,
          list_filter(string_split_regex(lower(text), '[ \t\n\r]+'),
                      x -> length(x) > 0) AS toks
        FROM src),
      lf AS (
        SELECT doc_id,
          array_to_string(toks[(j*10+1):(j*10+10)], ' ') AS line
        FROM (SELECT doc_id, toks,
                unnest(range(0, (len(toks) + 9) // 10)) AS j
              FROM t)),
      ln AS (
        SELECT doc_id, CAST(COUNT(*) AS INT) AS n_lines,
          CAST(SUM(CASE WHEN substr(line, 1, 2) = '- '
                        THEN 1 ELSE 0 END) AS INT) AS n_bullet,
          CAST(SUM(CASE WHEN length(line) >= 3 AND
                        substr(line, length(line) - 2, 3) = '...'
                        THEN 1 ELSE 0 END) AS INT) AS n_ellipsis
        FROM lf GROUP BY doc_id),
      agg AS (
        SELECT t.doc_id,
          CAST(len(toks) AS INT) AS n_words,
          CAST(list_sum(list_transform(toks, x -> length(x))) AS INT)
            AS n_word_chars,
          CAST(length(lo) - length(replace(lo, '#', ''))
             + (length(lo) - length(replace(lo, '...', ''))) // 3
            AS INT) AS n_sym,
          CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
            AS INT) AS n_alpha_words,
          CAST(len(list_filter([$stops],
            w -> list_contains(toks, w))) AS INT) AS n_stop,
          ln.n_lines, ln.n_bullet, ln.n_ellipsis
        FROM t JOIN ln ON t.doc_id = ln.doc_id)
      SELECT doc_id, n_words, n_word_chars, n_sym, n_alpha_words, n_stop,
        n_lines, n_bullet, n_ellipsis,
        CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
             THEN 1 ELSE 0 END AS INT) AS f_words,
        CAST(CASE WHEN 3 * n_words <= n_word_chars
              AND n_word_chars <= 10 * n_words
             THEN 1 ELSE 0 END AS INT) AS f_mean_len,
        CAST(CASE WHEN 10 * n_sym < n_words
             THEN 1 ELSE 0 END AS INT) AS f_sym,
        CAST(CASE WHEN 5 * n_alpha_words >= 4 * n_words
             THEN 1 ELSE 0 END AS INT) AS f_alpha,
        CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS INT) AS f_stop,
        CAST(CASE WHEN 10 * n_bullet <= 9 * n_lines
             THEN 1 ELSE 0 END AS INT) AS f_bullet,
        CAST(CASE WHEN 10 * n_ellipsis <= 3 * n_lines
             THEN 1 ELSE 0 END AS INT) AS f_ellipsis,
        CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
              AND 3 * n_words <= n_word_chars
              AND n_word_chars <= 10 * n_words
              AND 10 * n_sym < n_words
              AND 5 * n_alpha_words >= 4 * n_words
              AND n_stop >= 2
              AND 10 * n_bullet <= 9 * n_lines
              AND 10 * n_ellipsis <= 3 * n_lines
             THEN 1 ELSE 0 END AS INT) AS passes
      FROM agg ORDER BY doc_id"""
  }

  // ---- c4_filters ---------------------------------------------------------

  private val Terminal = Set('.', '!', '?', '"', '\'')

  def c4Filters(s: SparkSession, d: String): DataFrame =
    c4Filters(injected(graft.Tables.documents(s, d), C4Injects))

  /** Per-line drop reasons use a fixed precedence (javascript >
    * missing terminal punctuation > too short) so each dropped line
    * lands in exactly one bucket on both engines. */
  def c4Filters(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    graft.Util.fanOutIfAtLeast(
        docs.select(col("doc_id"), col("text")).as[(Long, String)])
      .map { case (id, text) =>
        val lower = text.toLowerCase
        val ls = lines(toks(text)).map(_.toSeq).toSeq
        var kept = List.empty[String]
        var dJs = 0; var dPunct = 0; var dShort = 0
        ls.foreach { g =>
          val line = g.mkString(" ")
          if (g.contains("javascript")) dJs += 1
          else if (line.isEmpty || !Terminal.contains(line.last)) dPunct += 1
          else if (g.length < 3) dShort += 1
          else kept = line :: kept
        }
        val keptLines = kept.reverse
        val hasLorem = lower.contains("lorem ipsum")
        val hasBrace = lower.contains("{")
        def b(x: Boolean) = if (x) 1 else 0
        val pageKept =
          b(!hasLorem && !hasBrace && keptLines.length >= 5)
        (id, ls.length, keptLines.length, dJs, dPunct, dShort,
          b(hasLorem), b(hasBrace), pageKept,
          keptLines.mkString("\n"))
      }
      .toDF("doc_id", "n_lines", "kept_lines", "drop_js", "drop_punct",
        "drop_short", "has_lorem", "has_brace", "page_kept", "kept_text")
      .select(col("doc_id"), col("n_lines"), col("kept_lines"),
        col("drop_js"), col("drop_punct"), col("drop_short"),
        col("has_lorem"), col("has_brace"), col("page_kept"),
        md5(col("kept_text").cast("binary")).as("kept_md5"))
      .orderBy(col("doc_id"))
  }

  val c4FiltersOracle: String = raw"""
      WITH src AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT * FROM (VALUES
        ${injectValues(C4Injects)}) v(doc_id, text)),
      t AS (
        SELECT doc_id, lower(text) AS lo,
          list_filter(string_split_regex(lower(text), '[ \t\n\r]+'),
                      x -> length(x) > 0) AS toks
        FROM src),
      lf AS (
        SELECT doc_id, j,
          toks[(j*10+1):(j*10+10)] AS g,
          array_to_string(toks[(j*10+1):(j*10+10)], ' ') AS line
        FROM (SELECT doc_id, toks,
                unnest(range(0, (len(toks) + 9) // 10)) AS j
              FROM t)),
      cls AS (
        SELECT doc_id, j, line,
          CASE
            WHEN list_contains(g, 'javascript') THEN 'js'
            WHEN length(line) = 0 OR substr(line, length(line), 1)
              NOT IN ('.', '!', '?', '"', '''') THEN 'punct'
            WHEN len(g) < 3 THEN 'short'
            ELSE 'keep' END AS verdict
        FROM lf),
      ln AS (
        SELECT doc_id,
          CAST(COUNT(*) AS INT) AS n_lines,
          CAST(SUM(CASE WHEN verdict = 'keep' THEN 1 ELSE 0 END) AS INT)
            AS kept_lines,
          CAST(SUM(CASE WHEN verdict = 'js' THEN 1 ELSE 0 END) AS INT)
            AS drop_js,
          CAST(SUM(CASE WHEN verdict = 'punct' THEN 1 ELSE 0 END) AS INT)
            AS drop_punct,
          CAST(SUM(CASE WHEN verdict = 'short' THEN 1 ELSE 0 END) AS INT)
            AS drop_short,
          md5(coalesce(string_agg(CASE WHEN verdict = 'keep' THEN line END,
            chr(10) ORDER BY j), '')) AS kept_md5
        FROM cls GROUP BY doc_id)
      SELECT t.doc_id, ln.n_lines, ln.kept_lines, ln.drop_js,
        ln.drop_punct, ln.drop_short,
        CAST(CASE WHEN strpos(lo, 'lorem ipsum') > 0
             THEN 1 ELSE 0 END AS INT) AS has_lorem,
        CAST(CASE WHEN strpos(lo, '{') > 0
             THEN 1 ELSE 0 END AS INT) AS has_brace,
        CAST(CASE WHEN strpos(lo, 'lorem ipsum') = 0
              AND strpos(lo, '{') = 0 AND ln.kept_lines >= 5
             THEN 1 ELSE 0 END AS INT) AS page_kept,
        ln.kept_md5
      FROM t JOIN ln ON t.doc_id = ln.doc_id
      ORDER BY t.doc_id"""
}
