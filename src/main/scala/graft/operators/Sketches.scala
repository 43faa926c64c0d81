package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators. At 100 TB exact COUNT(DISTINCT) is a
  * full shuffle of every distinct key; a HyperLogLog register set is
  * 4 KB per group, merges with MAX, and answers within ~1.6%
  * (b=12 → σ ≈ 1.04/√4096). Spark's own approx_count_distinct is the
  * production shortcut, but its HLL++ register layout is engine-
  * internal — this implementation derives every register from the
  * shared md5 hash (the [[Dedup.md5Hash60]] recipe), so the whole
  * sketch — registers, harmonic sum, estimate — is reproduced bit-
  * for-bit by the DuckDB oracle (Flajolet et al. 2007 formulas).
  *
  * Exactness trick: the harmonic-mean denominator Σ 2^(−M_j) is kept
  * as an exact BIGINT in units of 2^(−49) (register term
  * 2^(49−M_j) ≤ 2^48, total ≤ 4096·2^49 < 2^63), so no float
  * accumulation happens anywhere — both engines do ONE final
  * int→double cast and division. rho comes from the top-12/low-48
  * bit split of the 60-bit md5 value.
  */
object Sketches {
  val HllB = 12
  val HllM: Int = 1 << HllB // 4096 registers

  /** sketch_distinct: per-group HLL distinct-count estimate with the
    * exact count alongside (the oracle checks BOTH — the sketch
    * mechanics and its accuracy are graded, not assumed). Groups:
    * distinct user_id per event_type (n≈1.5k → the linear-counting
    * small-range branch) plus one '_all_events' row over event_id
    * (n≈60k+ → the raw-estimate branch); one pipeline exercises both
    * correction regimes. One typed linear pass computes (register,
    * rho); registers reduce with MAX (map-side combinable — at most
    * m rows per group leave each task, whatever the data volume). */
  /** The HLL register set for (grp, key) rows: (grp, idx, m) with m =
    * MAX(rho). This is the mergeable sketch state — registers of two
    * corpus slices combine with a further groupBy-MAX (spec'd), which
    * is what makes the sketch shippable across executors/days at
    * 100 TB: 4 KB per group crosses the wire, never the keys. */
  /** (register index, rho) of one key: top-12/low-48 split of the
    * 60-bit md5 value; rho = leading zeros in the 48-bit window + 1
    * (w=0 → 49). Shared by the batch registers and the streaming
    * per-group state ([[graft.streaming.EventStream]]). */
  def hllIdxRho(k: String): (Int, Int) = {
    val h = Dedup.md5Hash60(k)
    val idx = (h >>> 48).toInt // top 12 of the 60-bit value
    val w = h & ((1L << 48) - 1)
    val hb = 64 - java.lang.Long.numberOfLeadingZeros(w) // 0 for w=0
    (idx, 49 - hb)
  }

  /** Estimate from a local register array — the same arithmetic as
    * [[hllEstimate]] (exact-BIGINT harmonic sum, linear-counting
    * branch), for streaming state read-out; equality with the
    * DataFrame form is spec'd. */
  def hllEstimateLocal(regs: Array[Int]): Double = {
    var s = 0L; var vZero = 0; var i = 0
    while (i < HllM) {
      val r = regs(i)
      if (r == 0) { vZero += 1; s += 1L << 49 } else s += 1L << (49 - r)
      i += 1
    }
    val raw = HllAlpha * math.pow(2.0, 73) / s.toDouble
    val est = if (raw <= 2.5 * HllM && vZero > 0)
      HllM.toDouble * math.log(HllM.toDouble / vZero)
    else raw
    BigDecimal(est).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  def hllRegisters(keyed: DataFrame): DataFrame = {
    val s = keyed.sparkSession
    import s.implicits._
    keyed.as[(String, String)]
      .map { case (g, k) =>
        val (idx, rho) = hllIdxRho(k)
        (g, idx, rho)
      }
      .toDF("grp", "idx", "rho")
      .groupBy(col("grp"), col("idx")).agg(max(col("rho")).as("m"))
  }

  /** Estimate from a register set: exact-BIGINT harmonic sum, one
    * cast, one division, branch to linear counting below 2.5m. */
  def hllEstimate(regs: DataFrame): DataFrame =
    regs.groupBy(col("grp"))
      .agg(count(lit(1)).as("present"),
        sum(expr("CAST(pow(2, 49 - m) AS BIGINT)")).as("s_present"))
      .withColumn("v_zero", lit(HllM.toLong) - col("present"))
      .withColumn("s", col("s_present") + col("v_zero") * lit(1L << 49))
      .withColumn("raw_est",
        lit(HllAlpha) * lit(math.pow(2.0, 73)) / col("s").cast("double"))
      .withColumn("estimate",
        round(when(col("raw_est") <= lit(2.5 * HllM) && col("v_zero") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v_zero")))
          .otherwise(col("raw_est")), 6))

  // alpha_4096 from the same literal arithmetic the oracle runs
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllM)

  def sketchDistinct(s: SparkSession, d: String): DataFrame =
    sketchDistinct(Tables.events(s, d))

  def sketchDistinct(ev: DataFrame): DataFrame = {
    val keyed = ev.select(col("event_type").as("grp"),
        col("user_id").cast("string").as("key"))
      .unionAll(ev.select(lit("_all_events").as("grp"),
        col("event_id").cast("string").as("key")))
    val per = hllEstimate(hllRegisters(keyed))
    val exact = keyed.groupBy(col("grp"))
      .agg(countDistinct(col("key")).as("n_exact"))
    per.join(exact, "grp")
      .select(col("grp"), col("n_exact"), col("present").as("n_registers"),
        col("v_zero"), col("s"), round(col("raw_est"), 6).as("raw_est"),
        col("estimate"))
      .orderBy(col("grp"))
  }

  val CmsD = 4
  val CmsW = 1024

  private def cmsBucket(token: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("cms"), col("j"), lit(":"), token)), 1, 8), 16, 10)
      .cast("long") % CmsW

  /** JVM form of the column bucket — identical value (md5Hash32 IS
    * the first-8-hex-digits fold); used by the streaming counter
    * state ([[graft.streaming.EventStream.streamingCmsCounters]]),
    * equality with the batch counters spec'd. */
  def cmsBucketLocal(j: Int, token: String): Long =
    Dedup.md5Hash32(s"cms$j:$token") % CmsW

  /** The CMS counter table of a (token, n) frame — the mergeable
    * sketch state (counters ADD across slices/batches). */
  def cmsCounters(tc: DataFrame): DataFrame = {
    val js = typedlit((0 until CmsD).toArray)
    tc.select(explode(js).as("j"), col("token"), col("n"))
      .withColumn("b", cmsBucket(col("token")))
      .groupBy(col("j"), col("b")).agg(sum(col("n")).as("c"))
  }

  /** sketch_heavyhitters: Count-Min Sketch (Cormode & Muthukrishnan
    * 2005) over the token frequencies, read back for the exact top-50
    * tokens so the oracle checks estimate vs truth side by side. The
    * sketch state is d×w = 4×1024 counters that ADD across corpus
    * slices/executors/days (same merge story as [[hllRegisters]]);
    * est(t) = min_j counter[j][h_j(t)] ≥ true count, with the
    * overestimate bounded by collisions. Hashes are md5 with a
    * per-row salt, so both engines compute identical buckets (the
    * split_assign 8-hex-digit fold recipe) and the whole counter
    * table — not just row counts — is hash-verified. All arithmetic
    * is integer: nothing to round anywhere. */
  def sketchHeavyHitters(s: SparkSession, d: String): DataFrame =
    sketchHeavyHitters(Tables.documents(s, d), 50)

  def sketchHeavyHitters(docs: DataFrame, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tc = graft.functions.TextFunctions.tokenCounts(docs)
    val js = typedlit((0 until CmsD).toArray)
    val buck = tc.select(explode(js).as("j"), col("token"), col("n"))
      .withColumn("b", cmsBucket(col("token")))
    val counters = cmsCounters(tc)
    // exact top-k via TakeOrderedAndProject (no single-partition
    // window over the vocabulary); rank re-derived on the k-row frame
    val cand = tc.orderBy(col("n").desc, col("token")).limit(topK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("token"))))
    cand.join(buck.drop("n"), "token")
      .join(counters, Seq("j", "b"))
      .groupBy(col("rank"), col("token"), col("n"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("rank"), col("token"), col("n").as("n_exact"), col("cms_est"))
      .orderBy(col("rank"))
  }

  val sketchHeavyHittersOracleSql: String = """
      WITH tok AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                      x -> length(x) > 0)) AS token
        FROM documents),
      tc AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1),
      j(j) AS (VALUES (0), (1), (2), (3)),
      buck AS (
        SELECT j, token, n,
          CAST(list_sum(list_transform(range(1, 9),
            kk -> CAST((strpos('0123456789abcdef', hx[kk:kk]) - 1)
                 * CAST(16 ** (8 - kk) AS BIGINT) AS BIGINT))) AS BIGINT) % 1024 AS b
        FROM (SELECT j, token, n, md5('cms' || j || ':' || token) AS hx
              FROM tc CROSS JOIN j)),
      counters AS (SELECT j, b, CAST(SUM(n) AS BIGINT) AS c FROM buck GROUP BY 1, 2),
      cand AS (
        SELECT token, n, rank FROM (
          SELECT token, n,
            CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS rank
          FROM tc)
        WHERE rank <= 50)
      SELECT cd.rank, cd.token, cd.n AS n_exact, MIN(ct.c) AS cms_est
      FROM cand cd
      JOIN buck bk ON bk.token = cd.token
      JOIN counters ct ON ct.j = bk.j AND ct.b = bk.b
      GROUP BY 1, 2, 3
      ORDER BY rank"""

  val BloomM = 32768 // bits
  val BloomK = 4 // hash functions

  private[graft] def bloomPos(h: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("bloom"), col("j"), lit(":"), h)), 1, 8), 16, 10)
      .cast("long") % BloomM

  /** sketch_bloom: membership sketch — the fourth family (HLL =
    * distinct, CMS = frequency, histogram = quantiles, Bloom =
    * membership). A Bloom filter over the standing corpus's content
    * hashes (m=32768 bits, k=4 md5-salted hashes) probed by an
    * arriving batch — the approximate fast-path in front of
    * [[Dedup.dedupIncremental]]: at 100 TB the filter is m/8 bytes
    * per corpus shard, OR-mergeable across shards, broadcastable to
    * every executor, and the exact (expensive) membership join only
    * runs for batch rows the filter flags. NO false negatives by
    * construction (spec'd: every true duplicate hits); false
    * positives are the tunable m/k trade. The exact membership
    * verdict is emitted alongside so the oracle checks filter
    * mechanics AND truth; the filter itself is the distinct
    * set-bit-position relation — engine-checked bit for bit. */
  def sketchBloom(s: SparkSession, d: String): DataFrame = {
    val all = Dedup.withPlants(Tables.documents(s, d))
    sketchBloom(all.filter(col("doc_id") < 100000),
      all.filter(col("doc_id") >= 100000))
  }

  def sketchBloom(corpus: DataFrame, batch: DataFrame): DataFrame = {
    val js = typedlit((0 until BloomK).toArray)
    val ch = corpus.select(md5(col("text")).as("h")).distinct()
    val bits = ch.select(explode(js).as("j"), col("h"))
      .select(bloomPos(col("h")).as("pos")).distinct()
    val bh = batch.select(col("doc_id"), md5(col("text")).as("h"))
    val hits = bh.select(col("doc_id"), explode(js).as("j"), col("h"))
      .select(col("doc_id"), bloomPos(col("h")).as("pos"))
      .join(bits, Seq("pos"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nhit"))
    bh.join(ch.withColumnRenamed("h", "ch"), col("h") === col("ch"), "left_outer")
      .select(col("doc_id"), col("ch").isNotNull.as("in_corpus"))
      .join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("in_corpus"),
        (coalesce(col("nhit"), lit(0L)) === BloomK).as("bloom_hit"))
      .orderBy(col("doc_id"))
  }

  val sketchBloomOracleSql: String = """
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50),
      corpus AS (
        SELECT DISTINCT md5(text) AS h FROM docs WHERE doc_id < 100000),
      j(j) AS (VALUES (0), (1), (2), (3)),
      bits AS (
        SELECT DISTINCT
          CAST(list_sum(list_transform(range(1, 9),
            kk -> CAST((strpos('0123456789abcdef', hx[kk:kk]) - 1)
                 * CAST(16 ** (8 - kk) AS BIGINT) AS BIGINT))) AS BIGINT) % 32768 AS pos
        FROM (SELECT md5('bloom' || j || ':' || h) AS hx FROM corpus CROSS JOIN j)),
      batch AS (
        SELECT doc_id, md5(text) AS h FROM docs WHERE doc_id >= 100000),
      probes AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(range(1, 9),
            kk -> CAST((strpos('0123456789abcdef', hx[kk:kk]) - 1)
                 * CAST(16 ** (8 - kk) AS BIGINT) AS BIGINT))) AS BIGINT) % 32768 AS pos
        FROM (SELECT doc_id, md5('bloom' || j || ':' || h) AS hx
              FROM batch CROSS JOIN j)),
      hits AS (
        SELECT doc_id, COUNT(*) AS nhit
        FROM probes JOIN bits USING (pos) GROUP BY 1)
      SELECT b.doc_id,
        b.h IN (SELECT h FROM corpus) AS in_corpus,
        COALESCE(ht.nhit, 0) = 4 AS bloom_hit
      FROM batch b LEFT JOIN hits ht USING (doc_id)
      ORDER BY b.doc_id"""

  val QsB = 256 // histogram buckets

  /** sketch_quantiles: mergeable fixed-grid histogram quantiles over
    * events.value per event_type — the third sketch family (HLL =
    * distinct, CMS = frequency, histogram = quantiles). The grid is
    * [min,max] split into 256 buckets; bucket counters ADD across
    * corpus slices, and a quantile reads back as the upper edge of
    * the bucket where the cumulative count crosses ceil(p·n) — error
    * bounded by one grid step (spec'd against the exact rank
    * statistic, which is also emitted so the oracle checks sketch AND
    * truth). Everything is min/max/count/floor arithmetic on
    * identical expression trees: deterministic cross-engine with no
    * rounding anywhere except the 6-dp display round.
    *
    * At 100 TB: pass 1 is a per-group min/max (map-side combined),
    * pass 2 builds ≤256 counters per group; the exact rank statistic
    * here is for verification only — at scale you'd ship just the
    * counters. The window rank over value is per-group (event_type),
    * the same partitioning the data already shuffled for. */
  def sketchQuantiles(s: SparkSession, d: String): DataFrame =
    sketchQuantiles(Tables.events(s, d))

  def sketchQuantiles(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events.select(col("event_type"), col("event_id"),
      col("value").cast("double").as("v"))
    val stats = ev.groupBy(col("event_type"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(lit(1)).as("n"))
    val bucketed = ev.join(broadcast(stats), "event_type")
      .withColumn("b",
        when(col("mx") > col("mn"),
          least(floor((col("v") - col("mn")) * lit(QsB.toDouble) / (col("mx") - col("mn"))),
            lit((QsB - 1).toDouble)).cast("int"))
          .otherwise(lit(0)))
    val counters = bucketed.groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("c"))
    val ps = typedlit(Array(0.5, 0.9, 0.99))
    val targets = stats.select(col("event_type"), col("mn"), col("mx"), col("n"),
        explode(ps).as("p"))
      .withColumn("target", ceil(col("p") * col("n").cast("double")))
    // sketch read-out: first bucket whose cumulative count reaches the target
    val cum = counters.withColumn("cumc",
      sum(col("c")).over(Window.partitionBy(col("event_type")).orderBy(col("b"))))
    val est = broadcast(targets).join(cum, "event_type")
      .filter(col("cumc") >= col("target"))
      .groupBy(col("event_type"), col("p"), col("mn"), col("mx"), col("n"))
      .agg(min(col("b")).as("qb"))
      .withColumn("q_est",
        round(col("mn") + (col("qb") + 1).cast("double") * (col("mx") - col("mn"))
          / lit(QsB.toDouble), 6))
    // exact rank statistic (verification channel): value at rank ceil(p·n)
    val ranked = ev.withColumn("rn",
      row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("v"), col("event_id"))))
    val exact = broadcast(targets.select(col("event_type"), col("p"), col("target")))
      .join(ranked.select(col("event_type"), col("v"), col("rn")), Seq("event_type"))
      .filter(col("rn") === col("target"))
      .groupBy(col("event_type"), col("p"))
      .agg(round(min(col("v")), 6).as("q_exact"))
    est.join(broadcast(exact), Seq("event_type", "p"))
      .select(col("event_type"), col("p"), col("n"), col("qb"),
        col("q_est"), col("q_exact"))
      .orderBy(col("event_type"), col("p"))
  }

  val sketchQuantilesOracleSql: String = """
      WITH ev AS (
        SELECT event_type, event_id, CAST("value" AS DOUBLE) AS v FROM events),
      stats AS (
        SELECT event_type, MIN(v) AS mn, MAX(v) AS mx,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM ev GROUP BY 1),
      bucketed AS (
        SELECT e.event_type,
          CASE WHEN mx > mn
               THEN CAST(least(floor((v - mn) * 256.0 / (mx - mn)), 255.0) AS INT)
               ELSE 0 END AS b
        FROM ev e JOIN stats USING (event_type)),
      counters AS (
        SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS c
        FROM bucketed GROUP BY 1, 2),
      targets AS (
        SELECT event_type, mn, mx, n, p,
          CAST(ceil(p * CAST(n AS DOUBLE)) AS BIGINT) AS target
        FROM stats CROSS JOIN (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS p)),
      cum AS (
        SELECT event_type, b,
          CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY b) AS BIGINT) AS cumc
        FROM counters),
      est AS (
        SELECT t.event_type, t.p, t.mn, t.mx, t.n, MIN(cm.b) AS qb
        FROM targets t JOIN cum cm
          ON cm.event_type = t.event_type AND cm.cumc >= t.target
        GROUP BY 1, 2, 3, 4, 5),
      ranked AS (
        SELECT event_type, v,
          row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn
        FROM ev),
      exact AS (
        SELECT t.event_type, t.p, round(MIN(r.v), 6) AS q_exact
        FROM targets t JOIN ranked r
          ON r.event_type = t.event_type AND r.rn = t.target
        GROUP BY 1, 2)
      SELECT e.event_type, e.p, e.n, e.qb,
        round(e.mn + CAST(e.qb + 1 AS DOUBLE) * (e.mx - e.mn) / 256.0, 6) AS q_est,
        x.q_exact
      FROM est e JOIN exact x ON x.event_type = e.event_type AND x.p = e.p
      ORDER BY e.event_type, e.p"""

  /** The oracle replays the full sketch in SQL: 60-bit md5 via the
    * hex-digit fold (the dedup_spans recipe), idx/w via integer
    * div/mod by 2^48, rho via length(ltrim(bin(w),'0')). */
  val sketchDistinctOracleSql: String = """
      WITH keyed AS (
        SELECT event_type AS grp, CAST(user_id AS VARCHAR) AS key FROM events
        UNION ALL
        SELECT '_all_events', CAST(event_id AS VARCHAR) FROM events),
      h AS (
        SELECT grp,
          CAST(list_sum(list_transform(range(1, 16),
            kk -> CAST((strpos('0123456789abcdef', hx[kk:kk]) - 1)
                 * CAST(16 ** (15 - kk) AS BIGINT) AS BIGINT))) AS BIGINT) AS h
        FROM (SELECT grp, md5(key) AS hx FROM keyed)),
      r AS (
        SELECT grp,
          CAST(h // CAST(2 ** 48 AS BIGINT) AS INT) AS idx,
          49 - length(ltrim(bin(h % CAST(2 ** 48 AS BIGINT)), '0')) AS rho
        FROM h),
      regs AS (SELECT grp, idx, MAX(rho) AS m FROM r GROUP BY 1, 2),
      per AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS present,
          CAST(SUM(CAST(2 ** (49 - m) AS BIGINT)) AS BIGINT) AS s_present
        FROM regs GROUP BY grp),
      per2 AS (
        SELECT grp, present, 4096 - present AS v_zero,
          s_present + (4096 - present) * CAST(2 ** 49 AS BIGINT) AS s
        FROM per),
      exact AS (SELECT grp, COUNT(DISTINCT key) AS n_exact FROM keyed GROUP BY grp),
      est AS (
        SELECT grp, n_exact, present AS n_registers, v_zero, s,
          (0.7213 / (1 + 1.079 / 4096)) * (2 ** 73) / CAST(s AS DOUBLE) AS raw_est
        FROM per2 JOIN exact USING (grp))
      SELECT grp, n_exact, n_registers, v_zero, s,
        round(raw_est, 6) AS raw_est,
        round(CASE WHEN raw_est <= 10240.0 AND v_zero > 0
                   THEN 4096.0 * ln(4096.0 / v_zero)
                   ELSE raw_est END, 6) AS estimate
      FROM est ORDER BY grp"""
}
