package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ-style gate a
  * production ingest runs before publishing a snapshot): completeness,
  * key uniqueness, value-domain and range checks, and referential
  * integrity, each reported as a (metric, value) row where value is
  * the VIOLATION count — a clean table reads as all-zeros next to its
  * row_count.
  *
  * Scale shape: every row-predicate metric folds into ONE aggregate
  * pass over the table (a single scan whatever the number of checks —
  * map-side partial aggregation, no shuffle of data rows, one
  * stack-unpivot of the 1-row result). Key uniqueness is one
  * count-distinct shuffle; each referential check is one anti join
  * that broadcasts when the parent is a dim. Nothing here is ever
  * quadratic and nothing collects more than the metric scalars.
  */
object DataQuality {

  /** All row-level predicate metrics in one scan: each (name, pred)
    * counts rows where pred holds. Emits (metric, value) rows,
    * value = BIGINT count. */
  def rowMetrics(df: DataFrame, metrics: Seq[(String, Column)]): DataFrame = {
    require(metrics.nonEmpty, "need at least one metric")
    // metric names surface ONLY as literals: internal aggregate
    // aliases are positional (_m0.._mk) and the unpivot is a typed
    // explode, so a name carrying quotes/backticks/dots can neither
    // break parsing nor alter an expression
    val aggs = count(lit(1)).as("_m0") +: metrics.zipWithIndex.map {
      case ((_, pred), i) => count(when(pred, 1)).as(s"_m${i + 1}") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val names = "row_count" +: metrics.map(_._1)
    one.select(explode(array(names.zipWithIndex.map { case (n, i) =>
        struct(lit(n).as("metric"), col(s"_m$i").as("value")) }: _*)).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
  }

  /** Duplicate-key count: rows beyond the first per distinct key. */
  def keyDuplicates(df: DataFrame, keys: Seq[String],
                    metric: String = "dup_keys"): DataFrame =
    df.agg((count(lit(1)) - count_distinct(struct(keys.map(col): _*)))
        .as("value"))
      .select(lit(metric).as("metric"), col("value"))

  /** Referential-integrity violations: child rows whose `fk` misses
    * every parent `pk` (null fks count as orphans — an unresolvable
    * reference either way). */
  def orphans(child: DataFrame, fk: String, parent: DataFrame, pk: String,
              metric: String = "orphans"): DataFrame = {
    val cnt = child.select(col(fk))
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("value"))
    cnt.select(lit(metric).as("metric"), col("value"))
  }

  /** Union the metric frames into one sorted report. */
  def suite(frames: DataFrame*): DataFrame =
    frames.reduce(_.unionByName(_)).orderBy("metric")

  /** dq_check query: the suite run against a deterministically
    * DEGRADED orders feed (so every metric fires a nonzero count and
    * the oracle checks real violation arithmetic, not just zeros):
    * keys ≡0 (mod 101) are double-loaded (dup keys), priorities on
    * keys ≡0 (mod 53) are nulled (completeness), and the customer dim
    * lost keys ≡2 (mod 5) (orphaned fks). Domain and range checks run
    * against a tightened contract ('O'/'F' only, price > 2000). */
  def dqCheck(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val k = col("o_orderkey")
    val degraded = orders
      .withColumn("o_orderpriority",
        when(k % 53 === 0, lit(null)).otherwise(col("o_orderpriority")))
      .unionByName(orders.filter(k % 101 === 0))
    val dim = Tables.customer(s, d).filter(col("c_custkey") % 5 =!= 2)
    suite(
      rowMetrics(degraded, Seq(
        "null_priority" -> col("o_orderpriority").isNull,
        "price_below_floor" -> (col("o_totalprice") <= 2000.0),
        "status_domain_violations" -> !col("o_orderstatus").isin("O", "F"))),
      keyDuplicates(degraded, Seq("o_orderkey"), "dup_orderkeys"),
      orphans(degraded, "o_custkey", dim, "c_custkey", "orphan_custkeys"))
  }

  val dqCheckOracle: String = """
    WITH degraded AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        CASE WHEN o_orderkey % 53 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority
      FROM orders
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 101 = 0),
    dim AS (SELECT c_custkey FROM customer WHERE c_custkey % 5 <> 2)
    SELECT metric, value FROM (
      SELECT 'row_count' AS metric, COUNT(*) AS value FROM degraded
      UNION ALL
      SELECT 'null_priority', COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END) FROM degraded
      UNION ALL
      SELECT 'price_below_floor', COUNT(CASE WHEN o_totalprice <= 2000.0 THEN 1 END) FROM degraded
      UNION ALL
      SELECT 'status_domain_violations', COUNT(CASE WHEN o_orderstatus NOT IN ('O','F') THEN 1 END) FROM degraded
      UNION ALL
      SELECT 'dup_orderkeys', COUNT(*) - COUNT(DISTINCT o_orderkey) FROM degraded
      UNION ALL
      SELECT 'orphan_custkeys', COUNT(*) FROM degraded g
        WHERE NOT EXISTS (SELECT 1 FROM dim WHERE dim.c_custkey = g.o_custkey)
    ) ORDER BY metric"""
}
