package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot diff / CDC extraction — given two versions of a keyed
  * table, emit the change rows (insert / delete / update) that turn
  * the old snapshot into the new one, and the inverse `applyCdc` that
  * replays such a diff. This is the table-maintenance primitive behind
  * incremental downstream refresh: a 100 TB daily snapshot pair diffs
  * into a few-GB change set once, and every consumer processes the
  * delta instead of re-reading both snapshots.
  *
  * Shape at scale: ONE full-outer shuffle join on the key columns —
  * no window functions, no skew surface beyond the key itself (keys
  * are unique per side, so the join is 1:1 and cannot explode). On
  * bucketed-by-key layouts both shuffles vanish. Value comparison is
  * null-safe (`<=>`), so a null-to-value transition is an update, not
  * a silently-equal pair.
  */
object Cdc {

  /** Diff two snapshots sharing unique key `keys`: rows only in `newDf`
    * → `insert`, only in `oldDf` → `delete`, in both with any
    * `compareCols` differing (null-safe) → `update`. Output columns:
    * keys, `change_type`, then `old_<c>` / `new_<c>` per compare
    * column (null on the absent side for inserts/deletes). Unchanged
    * rows are NOT emitted — the diff is the minimal change set. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("_old", lit(1))
      .toDF(keys ++ compareCols.map("old_" + _) ++ Seq("_old"): _*)
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("_new", lit(1))
      .toDF(keys ++ compareCols.map("new_" + _) ++ Seq("_new"): _*)
    val joined = o.join(n, keys, "full_outer")
    val changed: Column = compareCols
      .map(c => !(col("old_" + c) <=> col("new_" + c)))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("change_type",
        when(col("_old").isNull, lit("insert"))
          .when(col("_new").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) ++ Seq(col("change_type")) ++
        compareCols.map(c => col("old_" + c)) ++
        compareCols.map(c => col("new_" + c)): _*)
  }

  /** Replay a `snapshotDiff` change set onto the old snapshot:
    * delete/update keys drop out, insert/update rows come in with
    * their new values. `applyCdc(old, snapshotDiff(old, new)) == new`
    * (row-set equality on keys ++ compareCols) — spec'd in CdcSpec.
    * One broadcast-or-shuffle anti join + a union of the (small) diff:
    * cost tracks |old| + |diff|, never |old| × anything. */
  def applyCdc(oldDf: DataFrame, diff: DataFrame, keys: Seq[String],
               compareCols: Seq[String]): DataFrame = {
    val touched = diff.filter(col("change_type").isin("delete", "update"))
      .select(keys.map(col): _*)
    val kept = oldDf.select((keys ++ compareCols).map(col): _*)
      .join(touched, keys, "left_anti")
    val incoming = diff.filter(col("change_type").isin("insert", "update"))
      .select(keys.map(col) ++
        compareCols.map(c => col("new_" + c).as(c)): _*)
    kept.unionByName(incoming)
  }

  /** snapshot_diff query: diff a degraded yesterday-snapshot of
    * `orders` against today's. The degradation is deterministic and
    * SQL-replicable so the DuckDB oracle reconstructs both sides:
    * yesterday lacks keys ≡3 (mod 10) (today's inserts), carries a
    * flat 100.0 price on keys ≡0 (mod 7) (today's updates), and today
    * lacks keys ≡7 (mod 13) (deletes). */
  def snapshotDiffQuery(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val k = col("o_orderkey")
    val oldSnap = orders.filter(k % 10 =!= 3)
      .withColumn("o_totalprice",
        when(k % 7 === 0, lit(100.0)).otherwise(col("o_totalprice")))
    val newSnap = orders.filter(k % 13 =!= 7)
    snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"), Seq("o_totalprice"))
      .orderBy("o_orderkey")
  }

  val snapshotDiffOracle: String = """
    WITH oldsnap AS (
      SELECT o_orderkey,
        CASE WHEN o_orderkey % 7 = 0 THEN CAST(100.0 AS DOUBLE)
             ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 10 <> 3),
    newsnap AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 13 <> 7)
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      CASE WHEN o.o_orderkey IS NULL THEN 'insert'
           WHEN n.o_orderkey IS NULL THEN 'delete'
           ELSE 'update' END AS change_type,
      o.o_totalprice AS old_o_totalprice,
      n.o_totalprice AS new_o_totalprice
    FROM oldsnap o FULL JOIN newsnap n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    ORDER BY o_orderkey"""
}
