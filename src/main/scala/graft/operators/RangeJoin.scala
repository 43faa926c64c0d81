package graft.operators

import graft.{Tables, Util}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) join — match point rows to [start, end) interval
  * rows with NO equi key. Spark plans a raw inequality join as a
  * BroadcastNestedLoopJoin (O(|probe| × |intervals|)); the scalable
  * form quantizes time into fixed-width bins and equi-joins on the
  * bin: each interval registers in every bin it overlaps (bounded
  * fan-out of ceil(len/width)+1), each point hashes to exactly one
  * bin, and the residual predicate inside the join re-checks exact
  * containment. One shuffle on the bin key, output-linear — the
  * standard bin-bucketing technique (cf. interval joins in stream
  * processors and genomics range-join literature).
  */
object RangeJoin {

  /** Equi-bin interval join on integer axes. `probe(pointCol)` joins
    * `intervals` rows where `startCol <= point < endCol`. `binWidth`
    * trades interval replication (long intervals / narrow bins) for
    * join selectivity (short intervals / wide bins); pick it near the
    * typical interval length so fan-out stays ~2. Each matching
    * (point, interval) pair emits exactly ONCE: a point lives in one
    * bin, and an interval appears at most once per bin.
    * All columns of both frames are preserved. */
  def joinRangeBinned(probe: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // guard degenerate/inverted intervals (end <= start): they match
    // no point under [start, end) anyway, but sequence(start, stop)
    // with stop < start generates a DESCENDING bin list — a corrupt
    // end << start would fan out into (start-end)/binWidth bins
    // before the residual filter discards every row
    val iv = intervals.filter(col(endCol) > col(startCol))
      .withColumn("_bin",
        explode(sequence(
          floorDiv(col(startCol), binWidth),
          floorDiv(col(endCol) - 1, binWidth))))
    val pr = probe.withColumn("_bin", floorDiv(col(pointCol), binWidth))
    pr.join(iv, Seq("_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bin")
  }

  private def floorDiv(c: org.apache.spark.sql.Column, w: Long) =
    // integer floor-division that stays correct for negative axes
    // (Spark's `div` truncates toward zero)
    floor(c.cast("double") / w).cast("bigint")

  /** range_join_agg query: per-campaign-window event rollup. Twelve
    * 2-day windows every 3 days from the corpus' first day are joined
    * to `events` on bare ts-containment (no user/type equi key) and
    * aggregated — the "attribute activity to overlapping campaign
    * flights" shape. Windows derive from min(ts) day-truncated, so the
    * DuckDB oracle reconstructs them exactly; seconds stay integer and
    * the value sum follows the exact-decimal recipe. */
  def rangeJoinAgg(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 1000000").as("s"), col("value"))
    // one collected scalar (bounded artifact): the corpus' first day
    val minS = ev.agg(min(col("s"))).head.getLong(0)
    val day0 = math.floorDiv(minS, 86400L) * 86400L
    val intervals = s.range(12).select(
      col("id").as("interval_id"),
      (lit(day0) + col("id") * 259200L).as("start_s"),
      (lit(day0) + col("id") * 259200L + 172800L).as("end_s"))
    joinRangeBinned(ev, "s", intervals, "start_s", "end_s", binWidth = 172800L)
      .groupBy("interval_id", "start_s")
      .agg(count(lit(1)).as("n_events"), Util.sum2(col("value")).as("sum_value"))
      .orderBy("interval_id")
  }

  val rangeJoinAggOracle: String = """
    WITH e AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s, value FROM events),
    d0 AS (SELECT (MIN(s) // 86400) * 86400 AS day0 FROM e),
    iv AS (
      SELECT k AS interval_id,
        day0 + k * 259200 AS start_s,
        day0 + k * 259200 + 172800 AS end_s
      FROM d0, (SELECT unnest(range(0, 12)) AS k))
    SELECT iv.interval_id, iv.start_s, COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM iv JOIN e ON e.s >= iv.start_s AND e.s < iv.end_s
    GROUP BY 1, 2
    ORDER BY 1"""
}
