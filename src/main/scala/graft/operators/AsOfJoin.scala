package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — for each left event, the latest right
  * event with `right.ts <= left.ts` on the same key. Spark has no
  * native ASOF operator; the scalable composition is the classic
  * union + keyed window scan:
  *
  *   1. tag both sides, union them (no join at all),
  *   2. one window partitioned by key ordered by (ts, side),
  *   3. `last(right_value, ignoreNulls)` over the running frame,
  *   4. keep left rows.
  *
  * One shuffle on the key, linear in input size — strictly better at
  * scale than the range-join formulation (which explodes) and
  * equivalent to DuckDB's ASOF JOIN semantics (ties on ts: the right
  * side sorts before the left, so an equal-timestamp right row IS
  * eligible).
  */
object AsOfJoin {

  /** Generic as-of: left/right share `key` and `ts`; `payload` names
    * right-side columns (absent on the left) that every left row
    * gains from its as-of match.
    *
    * Determinism: the payload columns join the window ordering as a
    * final tie-break, so when several right rows share (key, ts) each
    * column's pick is stable across runs and partitionings instead of
    * hinging on shuffle arrival order. Note each payload column is
    * independently last-NON-NULL over that total order: when the
    * latest right row holds a null in one payload column, that column
    * falls back to an earlier row — single-payload joins (like q19)
    * always get one row's value, but multi-payload rows with nulls
    * can mix rows. Pack payloads into one struct column if an
    * all-or-nothing tuple is required. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String]): DataFrame = {
    val union = left.withColumn("_side", lit(1))
      .unionByName(right.withColumn("_side", lit(0)), allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts) +: col("_side") +: payload.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // every payload window resolves in ONE select against the original
    // union, so each column's tie-break ordering sees the raw right-
    // side values (a sequential fold would rewrite c1 before c2's
    // window resolves and order c2 by the already-filled c1)
    val others = union.columns.filterNot(payload.contains).map(col).toSeq
    val filled = payload.map(c =>
      last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w).as(c))
    union.select(others ++ filled: _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** q19: for each purchase event, the latest prior (or simultaneous)
    * click by the same user — the "what did the user last browse
    * before buying" enrichment (engine-side analog of the reference's
    * per-entity enrichment joins, ref main.py:322-374). */
  def q19AsOf(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"), col("user_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts"), col("user_id"))
    asOf(purchases, clicks, key = "user_id", ts = "ts", payload = Seq("click_id"))
      .select(col("event_id"), col("user_id"), col("ts"), col("click_id"))
      .orderBy(col("event_id"))
  }
}
