package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generic SCD-1 merge — the engine-side equivalent of the
  * reference's `pg_insert ... on_conflict_do_update`
  * (ref main.py:451-457): apply a batch of updates to a snapshot,
  * last write per key wins.
  *
  * Scale: one shuffle on the key (the window partition). With the
  * snapshot bucketed/partitioned by key on disk, Catalyst elides the
  * exchange on the snapshot side entirely.
  */
object Upsert {

  /** Last-write-wins merge of `updates` into `current`.
    *
    * @param keys       identity columns
    * @param versionCol ordering column (e.g. an updated_at timestamp);
    *                   highest version per key is kept, updates win
    *                   ties against current rows.
    */
  def upsert(current: DataFrame, updates: DataFrame,
             keys: Seq[String], versionCol: String): DataFrame = {
    val tagged = current.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }

  // ---- SCD-2: type-2 slowly-changing-dimension history -------------------

  /** Build an SCD-2 history from a change-event stream: per `key`,
    * events ordered by (`ts`, `tie`) collapse into runs of equal
    * `attr`, each run becoming one validity interval
    * [valid_from, valid_to) with `version` (per-key ordinal) and
    * `is_current` (open interval). The `tie` column (a unique event
    * id) makes same-timestamp ordering deterministic and is kept in
    * the output as the interval's opening event.
    *
    * Scale shape: one shuffle on the key (both windows and the
    * run-collapse share the same partitioning, so Catalyst plans a
    * single exchange); per-key partitions are small (a dimension
    * key's change count), so there is no skew and no global sort. */
  def scd2Build(events: DataFrame, key: String, attr: String,
                ts: String, tie: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    events
      .select(col(key), col(attr), col(ts), col(tie))
      .withColumn("_prev", lag(col(attr), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(attr))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key), col(attr), col(tie), col("valid_from"),
        col("valid_to"), col("version"), col("is_current"))
  }

  /** Apply a batch of change events to an existing SCD-2 history —
    * the incremental (daily-merge) form: untouched keys PASS THROUGH
    * without window work; each affected key's history is rebuilt by
    * replaying its stored change points (each interval's opening
    * event) together with the batch, through the same
    * [[scd2Build]] collapse — so current-version extensions,
    * new-version opens, and cross-batch run merges (a batch whose
    * first event repeats the key's current attr) all come out
    * exactly as a one-shot build over the union (spec'd on a by-date
    * split).
    *
    * IN-ORDER semantics: like every merge-style SCD-2 (and the
    * SCD-1 [[upsert]]), batches must partition event time in order
    * per key. A LATE event that lands inside an already-collapsed
    * run can need events the history no longer stores (run-interior
    * duplicates); handling that is event-log replay — rebuild the
    * affected keys from the retained raw event log (exactly
    * [[scd2Build]] over `log.join(affectedKeys, semi)`), not a
    * history-only merge. */
  def scd2Apply(hist: DataFrame, batch: DataFrame, key: String, attr: String,
                ts: String, tie: String): DataFrame = {
    val affected = batch.select(col(key)).distinct()
    val untouched = hist.join(affected, Seq(key), "left_anti")
    val replay = hist.join(affected, Seq(key), "left_semi")
      .select(col(key), col(attr), col("valid_from").as(ts), col(tie))
      .unionByName(batch.select(col(key), col(attr), col(ts), col(tie)))
    untouched.unionByName(scd2Build(replay, key, attr, ts, tie))
  }

  /** scd2_history — the oracle-gated query: each customer's order
    * PRIORITY over time as an SCD-2 dimension (orders are the change
    * events; o_orderkey breaks same-day ties). */
  def scd2History(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    scd2Build(graft.Tables.orders(s, d),
      "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
      .orderBy(col("o_custkey"), col("version"))

  /** Point-in-time lookup against an SCD-2 history: each probe
    * (key, probeTs) gets the version whose [valid_from, valid_to)
    * contains it (open current version = null valid_to). A key's
    * intervals PARTITION time from its first change, so the match is
    * unique; probes before the first interval drop (inner join). One
    * equi-shuffle on the key with an in-join interval filter — per-key
    * interval lists are version-count-sized, so no range-binning is
    * needed (the keyed analog of [[graft.operators.RangeJoin]]; the
    * keyless form is where binning earns its keep). */
  def scd2Lookup(history: DataFrame, probes: DataFrame, key: String,
                 probeTs: String): DataFrame =
    probes.join(history, Seq(key))
      .filter(col(probeTs) >= col("valid_from") &&
        (col("valid_to").isNull || col(probeTs) < col("valid_to")))

  /** scd2_lookup query: what was each customer's priority version 15
    * days after each order — the as-of dimension join every fact table
    * enrichment needs (the batch analog of a dimension-versioned
    * join). */
  def scd2LookupQuery(s: org.apache.spark.sql.SparkSession,
                      d: String): DataFrame = {
    val orders = graft.Tables.orders(s, d)
    val hist = scd2Build(orders, "o_custkey", "o_orderpriority",
      "o_orderdate", "o_orderkey").drop("o_orderkey", "is_current")
    val probes = orders.select(col("o_orderkey"), col("o_custkey"),
      (col("o_orderdate") + expr("INTERVAL 15 DAYS")).as("probe_ts"))
    scd2Lookup(hist, probes, "o_custkey", "probe_ts")
      .select(col("o_orderkey"), col("o_custkey"), col("probe_ts"),
        col("o_orderpriority").as("priority_at"), col("version"))
      .orderBy(col("o_orderkey"))
  }

  val scd2LookupOracle: String = """
    WITH ch AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
        lag(o_orderpriority) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders),
    seg AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM ch WHERE prev IS NULL OR prev <> o_orderpriority),
    hist AS (
      SELECT o_custkey, o_orderpriority,
        o_orderdate AS valid_from,
        lead(o_orderdate) OVER w AS valid_to,
        CAST(row_number() OVER w AS INT) AS version
      FROM seg
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
    probes AS (
      SELECT o_orderkey, o_custkey,
        o_orderdate + INTERVAL 15 DAY AS probe_ts
      FROM orders)
    SELECT p.o_orderkey, p.o_custkey, p.probe_ts,
      h.o_orderpriority AS priority_at, h.version
    FROM probes p JOIN hist h ON p.o_custkey = h.o_custkey
    WHERE p.probe_ts >= h.valid_from
      AND (h.valid_to IS NULL OR p.probe_ts < h.valid_to)
    ORDER BY p.o_orderkey"""
}
