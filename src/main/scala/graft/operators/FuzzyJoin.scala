package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) join — entity resolution across two name
  * columns without an all-pairs comparison. Blocking uses DELETION
  * NEIGHBORHOODS (the FastSS scheme, Bocek et al. 2007): each string
  * emits itself plus every variant reachable by deleting up to
  * `maxDist` characters; two strings within Levenshtein distance d
  * always share a depth-d variant, so an equi-join on the variant key
  * has EXACT recall — no candidate is missed, unlike prefix or length
  * blocking (this corpus' names share 8 four-char prefixes, which
  * would degenerate to ~n²/8 pairs). Variants fan out ×(len+1) per
  * deletion level but are near-unique strings, so join groups stay
  * tiny and the shuffle is output-bound. Candidates are verified with
  * the real `levenshtein` before emission.
  *
  * Scale shape: names are deduplicated FIRST (the name space is
  * orders of magnitude smaller than the row space at 100 TB), the
  * variant equi-join runs on the distinct-name frames, and row-level
  * id mapping is a cheap hash join back on the exact name.
  */
object FuzzyJoin {

  /** Depth-≤d deletion variants of `s` (includes `s` itself). */
  private[operators] def deletionVariants(s: String, d: Int): Set[String] = {
    var frontier = Set(s)
    var all = Set(s)
    for (_ <- 1 to d) {
      frontier = frontier.flatMap(v =>
        (0 until v.length).map(i => v.substring(0, i) + v.substring(i + 1)))
      all ++= frontier
    }
    all
  }

  /** (name, variant) pairs for one side's DISTINCT names. Typed
    * flatMap, not a column HOF: an exploded `transform(...)` lambda
    * re-evaluates per output element under codegen'd Generate. */
  private def variantPairs(df: DataFrame, nameCol: String, maxDist: Int,
                           outName: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(nameCol).cast("string")).distinct().as[String]
      .flatMap(n => deletionVariants(n, maxDist).toSeq.map(v => (n, v)))
      .toDF(outName, "_variant")
  }

  /** Name-level fuzzy equi-join: all (leftName, rightName, dist)
    * pairs over the two frames' distinct name sets with
    * levenshtein <= maxDist. Exact (recall-lossless) for any maxDist
    * by the FastSS property; variant fan-out is O(len^maxDist), so
    * keep maxDist at 1-2. `dist` is BIGINT for cross-engine parity. */
  def editJoin(left: DataFrame, leftName: String,
               right: DataFrame, rightName: String,
               maxDist: Int = 1): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val lv = variantPairs(left, leftName, maxDist, leftName)
    val rv = variantPairs(right, rightName, maxDist, rightName)
    lv.join(rv, Seq("_variant"))
      .select(leftName, rightName).distinct()
      .withColumn("dist",
        levenshtein(col(leftName), col(rightName)).cast("bigint"))
      .filter(col("dist") <= maxDist)
  }

  /** fuzzy_match_names query: resolve a deterministically-corrupted
    * probe catalog (keys ≡0 mod 3; 5th character overwritten with
    * 'x') against the part-name catalog at edit distance 1, counting
    * how many part rows each resolved name covers. The corruption is
    * plain SUBSTR surgery, so the DuckDB oracle rebuilds the probe set
    * and replays the join naively over the (tiny) distinct name
    * spaces. */
  def fuzzyMatchNames(s: SparkSession, d: String): DataFrame = {
    val part = Tables.part(s, d)
    val probes = part.filter(col("p_partkey") % 3 === 0)
      .select(concat(substring(col("p_name"), 1, 4), lit("x"),
        expr("substring(p_name, 6)")).as("probe_name"))
    val matches = editJoin(probes, "probe_name", part.select("p_name"), "p_name", 1)
    val counts = part.groupBy("p_name").agg(count(lit(1)).as("n_parts"))
    matches.join(counts, Seq("p_name"))
      .select("probe_name", "p_name", "dist", "n_parts")
      .orderBy("probe_name", "p_name")
  }

  val fuzzyMatchNamesOracle: String = """
    WITH probes AS (
      SELECT DISTINCT substr(p_name, 1, 4) || 'x' || substr(p_name, 6) AS probe_name
      FROM part WHERE p_partkey % 3 = 0),
    names AS (SELECT DISTINCT p_name FROM part),
    matches AS (
      SELECT probe_name, p_name,
        CAST(levenshtein(probe_name, p_name) AS BIGINT) AS dist
      FROM probes, names
      WHERE levenshtein(probe_name, p_name) <= 1),
    counts AS (SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY 1)
    SELECT m.probe_name, m.p_name, m.dist, c.n_parts
    FROM matches m JOIN counts c ON m.p_name = c.p_name
    ORDER BY m.probe_name, m.p_name"""
}
