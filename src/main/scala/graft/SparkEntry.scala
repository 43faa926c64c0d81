package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Relational, Timeseries}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every `queries` key has a matching `oracleSql` entry (DuckDB SQL on
  * the same parquet tables) unless the operator is not
  * SQL-expressible, in which case the driver records a rows-only
  * check. Column names/aliases are kept identical on both sides; all
  * double aggregates follow the exact-decimal recipe in [[Util]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> Relational.q1PricingSummary _,
    "q2_revenue_filter"  -> Relational.q2RevenueFilter _,
    "q3_top_nations"     -> Relational.q3TopNations _,
    "q4_candidate_pool"  -> Relational.q4CandidatePool _,
    "q5_upsert_latest"   -> Relational.q5UpsertLatest _,
    "q6_daily_health"    -> Timeseries.q6DailyHealth _,
    "q7_discount_roi"    -> Relational.q7DiscountRoi _,
    "q8_price_corr"      -> Relational.q8PriceCorr _,
    "q9_potential_score" -> Relational.q9PotentialScore _,
    "q10_name_normalize" -> Relational.q10NameNormalize _,
    "q11_sessionize"     -> Timeseries.q11Sessionize _,
    "q12_moving_avg"     -> Timeseries.q12MovingAvg _,
    "q13_anti_semi"      -> Relational.q13AntiSemi _,
    "q14_rollup"         -> Relational.q14Rollup _,
    "q15_latest_sample"  -> Timeseries.q15LatestSample _,
    "q16_json_flatten"   -> Relational.q16JsonFlatten _,
    "q17_recommend"      -> Relational.q17Recommend _,
    "q18_stream_tumbling" -> Timeseries.q18StreamTumbling _,
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q2_revenue_filter" -> """
      SELECT
        CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    "q3_top_nations" -> """
      SELECT r_name, n_name,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY revenue DESC, n_name""",

    "q4_candidate_pool" -> """
      WITH top_spenders AS (
        SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey
        ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,2))) DESC, o_custkey LIMIT 50),
      most_active AS (
        SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3)
      SELECT DISTINCT custkey
      FROM (SELECT * FROM top_spenders UNION ALL SELECT * FROM most_active)
      ORDER BY custkey""",

    "q5_upsert_latest" -> """
      SELECT user_id, ts AS last_ts, event_type AS last_type,
        CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
      ORDER BY user_id""",

    "q6_daily_health" -> """
      SELECT CAST(ts AS DATE) AS day,
        COUNT(*) AS n_events,
        COUNT(DISTINCT user_id) AS n_users,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1 ORDER BY day""",

    "q7_discount_roi" -> """
      WITH g AS (
        SELECT l_returnflag,
          CAST(SUM(CASE WHEN l_discount >= 0.05 THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_disc,
          COUNT(CASE WHEN l_discount >= 0.05 THEN 1 END) AS n_disc,
          CAST(SUM(CASE WHEN l_discount < 0.05 THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_full,
          COUNT(CASE WHEN l_discount < 0.05 THEN 1 END) AS n_full
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n_disc, n_full,
        qty_disc / n_disc AS avg_disc_qty,
        qty_full / n_full AS avg_full_qty,
        (qty_disc / n_disc) / (qty_full / n_full) AS uplift
      FROM g ORDER BY l_returnflag""",

    "q8_price_corr" -> """
      WITH e AS (
        SELECT event_type, value,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
        FROM events),
      g AS (
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(SUM(k) AS DOUBLE) AS sy,
          CAST(SUM(CAST(value * value AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
          CAST(SUM(k * k) AS DOUBLE) AS syy,
          CAST(SUM(CAST(value * k AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM e GROUP BY event_type)
      SELECT event_type, n,
        (n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_vk
      FROM g ORDER BY event_type""",

    "q9_potential_score" -> """
      SELECT p_partkey, p_name, p_brand,
        (1000.0 - p_retailprice) * 2.0 / (p_size + 10.0) AS score
      FROM part WHERE p_size <= 40
      ORDER BY score DESC, p_partkey LIMIT 20""",

    "q10_name_normalize" -> """
      SELECT p_partkey, p_name,
        regexp_replace(regexp_replace(lower(trim(p_name)), '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g') AS norm_name
      FROM part ORDER BY p_partkey""",

    "q11_sessionize" -> """
      WITH e AS (
        SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS s
        FROM events),
      m AS (
        SELECT user_id,
          CASE WHEN lag(s) OVER w IS NULL OR s - lag(s) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, SUM(new_sess) AS n_sessions, COUNT(*) AS n_events
      FROM m GROUP BY user_id ORDER BY user_id""",

    "q12_moving_avg" -> """
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        FROM orders GROUP BY 1)
      SELECT day, CAST(rev_dec AS DOUBLE) AS revenue,
        CAST(SUM(rev_dec) OVER w AS DOUBLE) / COUNT(*) OVER w AS ma7
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY day""",

    "q13_anti_semi" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      ORDER BY c_custkey""",

    "q14_rollup" -> """
      SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        COUNT(*) AS n_cust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY region, nation""",

    "q15_latest_sample" -> """
      SELECT event_id, ts, user_id, event_type,
        CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
      FROM events ORDER BY ts DESC, event_id DESC LIMIT 100""",

    "q16_json_flatten" -> """
      SELECT event_id,
        CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS INT) AS k_val,
        CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS INT) % 10 AS k_bucket
      FROM events ORDER BY event_id""",

    "q17_recommend" -> """
      WITH toks AS (
        SELECT DISTINCT p_partkey, tok FROM (
          SELECT p_partkey, unnest(string_split(p_name, ' ')) AS tok FROM part)
        WHERE length(tok) > 0)
      SELECT a.p_partkey AS p1, b.p_partkey AS p2, COUNT(*) AS shared_tokens
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.p_partkey <> b.p_partkey
      WHERE a.p_partkey <= 20
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
      ORDER BY shared_tokens DESC, p1, p2 LIMIT 100""",

    "q18_stream_tumbling" -> """
      SELECT date_trunc('hour', ts) AS window_start, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2 ORDER BY window_start, event_type""",
  )
}
