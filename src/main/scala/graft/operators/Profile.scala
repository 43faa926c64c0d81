package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data profiling — per-column statistics in ONE corpus pass
  * (SURVEY.md §2b adjunct: the first thing a pipeline runs against a
  * new 100 TB drop is a profile, not a query). Emits long-format rows
  * `(column_name, n_rows, n_null, n_distinct, min_d, max_d)` for a
  * fixed numeric/temporal column set; timestamps profile as epoch
  * MICROSECONDS (exact integers, < 2^53 — no truncation ambiguity)
  * so every profiled column shares one (double) value domain.
  *
  * Scale shape: a single aggregate over one scan — Spark plans the
  * multiple `count(DISTINCT ...)` via Expand (input × #distinct-aggs,
  * all map-side partial-aggregated before one shuffle of partial
  * states); the stack() unpivot runs on the 1-row result, costing
  * nothing. At 100 TB the alternative — one scan per column — is
  * #columns× the I/O; this shape is why the profiler is one operator
  * and not a loop of queries. For approximate profiles at extreme
  * column counts, [[Sketches.sketchDistinct]]'s HLL replaces the
  * exact distinct per column; the exact form is the oracle-gated
  * one. */
object Profile {

  private val NumericCols = Seq("l_quantity", "l_extendedprice",
    "l_discount", "l_tax")
  private val TsCols = Seq("l_shipdate")

  private def valueOf(c: String): Column =
    // parquet TIMESTAMP reads as NTZ; session TZ is UTC, so the
    // NTZ→instant cast matches DuckDB's epoch_us on the naive value
    if (TsCols.contains(c)) unix_micros(col(c).cast("timestamp")).cast("double")
    else col(c).cast("double")

  /** profile_columns — profile lineitem's measure and date columns. */
  def profileColumns(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val cols = NumericCols ++ TsCols
    val aggs = cols.flatMap { c =>
      val v = valueOf(c)
      Seq(count(v).as(s"n_$c"),
        count_distinct(v).as(s"d_$c"),
        min(v).as(s"mn_$c"),
        max(v).as(s"mx_$c"))
    }
    val total = li.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', n_rows, n_rows - n_$c, d_$c, mn_$c, mx_$c"
    }.mkString(", ")
    total.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_rows, n_null, n_distinct, min_d, max_d)")
      .orderBy(col("column_name"))
  }

  /** Approximate profile — the extreme-column/cardinality form: the
    * exact multi-count_distinct (Expand ×(aggs+1) of the input) is
    * replaced by the verified mergeable HLL pipeline
    * ([[Sketches.hllRegisters]]) over a (column, value) stream — one
    * explode fan-out, register state 4 KB per column whatever the
    * cardinality, ~1-2% error (spec'd < 5% against the exact
    * profile). At 100 TB this is how a 500-column drop gets profiled
    * in one job: per-column HLL states merge across executors/days
    * where exact distincts would shuffle the value space. Returns the
    * exact profile columns plus `n_distinct_est`. */
  def profileColumnsApprox(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val cols = NumericCols ++ TsCols
    val keyed = li.select(explode(array(cols.map { c =>
        struct(lit(c).as("g"), valueOf(c).cast("string").as("k")) }: _*))
        .as("kv"))
      .select(col("kv.g"), col("kv.k"))
      .filter(col("k").isNotNull)
    val est = Sketches.hllEstimate(Sketches.hllRegisters(keyed))
      .select(col("grp").as("column_name"),
        col("estimate").as("n_distinct_est"))
    profileColumns(s, d).join(est, "column_name")
      .orderBy(col("column_name"))
  }

  /** DuckDB oracle: one SELECT per column UNION ALL'd — value-equal
    * to the one-pass Spark plan (exact min/max/distinct on doubles;
    * timestamps via epoch_us, matching Spark's unix_micros under
    * UTC). */
  def profileOracleSql: String = {
    def one(c: String, isTs: Boolean): String = {
      val v = if (isTs) s"CAST(epoch_us($c) AS DOUBLE)" else s"CAST($c AS DOUBLE)"
      s"""SELECT '$c' AS column_name,
        CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(*) - count($v) AS BIGINT) AS n_null,
        CAST(count(DISTINCT $v) AS BIGINT) AS n_distinct,
        min($v) AS min_d, max($v) AS max_d FROM lineitem"""
    }
    (NumericCols.map(one(_, isTs = false)) ++ TsCols.map(one(_, isTs = true)))
      .mkString("", "\n      UNION ALL\n      ", "\n      ORDER BY column_name")
  }
}
