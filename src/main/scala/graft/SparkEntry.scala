package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Dedup, Relational, Similarity, Timeseries}
import graft.functions.{Classify, TextFunctions}
import graft.sources.Multimodal

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
    "recommend_collab"   -> ((s, d) => Relational.recommendCollab(s, d)),
    "holt_winters"       -> ((s, d) => Timeseries.holtWinters(s, d)),
    "holt_winters_damped" -> ((s, d) => Timeseries.holtWintersDamped(s, d)),
    "holt_winters_mul"   -> ((s, d) => Timeseries.holtWintersMul(s, d)),
    "forecast_mul_eval"  -> ((s, d) => Timeseries.forecastMulEval(s, d)),
    "forecast_model_select" -> ((s, d) =>
      Timeseries.forecastModelSelect(s, d)),
    "recommend_capped"   -> ((s, d) => operators.Recommend.recommendCapped(s, d)),
    "recommend_markov"   -> ((s, d) => operators.Recommend.recommendMarkov(s, d)),
    "recommend_markov_sessions" -> ((s, d) =>
      operators.Recommend.recommendMarkovSessions(s, d)),
    "markov_stationary"  -> ((s, d) =>
      operators.Recommend.markovStationary(s, d)),
    "preference_pairs"   -> ((s, d) =>
      operators.Recommend.preferencePairs(s, d)),
    "recommend_coverage" -> ((s, d) =>
      operators.Recommend.recommendCoverage(s, d)),
    "recommend_cold_start" -> ((s, d) =>
      operators.Recommend.recommendColdStart(s, d)),
    "recommend_markov2"  -> ((s, d) =>
      operators.Recommend.recommendMarkov2(s, d)),
    "recommend_markov2_eval" -> ((s, d) =>
      operators.Recommend.recommendMarkov2Eval(s, d)),
    "recommend_markov_eval" -> ((s, d) =>
      operators.Recommend.recommendMarkovEval(s, d)),
    "recommend_hybrid"   -> ((s, d) => operators.Recommend.recommendHybrid(s, d)),
    "recommend_hybrid_wrrf" -> ((s, d) =>
      operators.Recommend.recommendHybridWeighted(s, d)),
    "recommend_hybrid_eval" -> ((s, d) =>
      operators.Recommend.recommendHybridEval(s, d)),
    "forecast_anomaly"   -> ((s, d) => Timeseries.forecastAnomaly(s, d)),
    "forecast_eval"      -> ((s, d) => Timeseries.forecastEval(s, d)),
    "forecast_damped_eval" -> ((s, d) =>
      Timeseries.forecastEval(s, d, damped = true)),
    "forecast_decompose" -> ((s, d) => Timeseries.forecastDecompose(s, d)),
    "forecast_intervals" -> ((s, d) => Timeseries.forecastIntervals(s, d)),
    "forecast_intervals_eval" -> ((s, d) =>
      Timeseries.forecastIntervalsEval(s, d)),
    "recommend_eval"     -> ((s, d) => operators.Recommend.recommendEval(s, d)),
    "q18_stream_tumbling" -> Timeseries.q18StreamTumbling _,
    "funnel_steps"        -> Timeseries.funnelSteps _,
    "retention_cohorts"   -> Timeseries.retentionCohorts _,
    "events_anomaly"      -> Timeseries.eventsAnomaly _,
    "ewma_trend"          -> ((s, d) => Timeseries.ewmaTrend(s, d)),
    "q19_asof"            -> operators.AsOfJoin.q19AsOf _,
    "q20_percentiles"     -> Timeseries.q20Percentiles _,
    "q21_pivot"           -> Timeseries.q21Pivot _,
    "q22_above_avg"       -> Relational.q22AboveAvg _,
    "dedup_exact"         -> Dedup.dedupExact _,
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_containment"   -> ((s, d) => Dedup.dedupContainment(s, d)),
    "dedup_minhash"       -> Dedup.minhashCandidates _,
    "dedup_incremental"   -> Dedup.dedupIncremental _,
    "dedup_clusters"      -> Dedup.dedupClusters _,
    "dedup_soft"          -> Dedup.dedupSoft _,
    "dedup_clusters_star" -> Dedup.dedupClustersStar _,
    "dedup_keep_best"     -> Dedup.dedupKeepBest _,
    "dedup_simhash"       -> ((s, d) => Dedup.simhashNearDups(s, d)),
    "hamming_topk"        -> ((s, d) => Dedup.hammingTopK(s, d)),
    "jaccard_topk"        -> Dedup.jaccardTopK _,
    "dedup_emb_cosine"    -> ((s, d) => Dedup.embCosineDups(s, d)),
    "dedup_emb_lsh"       -> ((s, d) => Dedup.embLshDups(s, d)),
    "dedup_emb_clusters"  -> Dedup.dedupEmbClusters _,
    "dedup_semantic"      -> Similarity.dedupSemantic _,
    "select_prototypes"   -> Similarity.selectPrototypes _,
    "dedup_emb_incremental" -> Dedup.dedupEmbIncremental _,
    "dedup_spans"         -> Dedup.dedupSpans _,
    "dedup_spans_excise"  -> Dedup.dedupSpansExcise _,
    "dedup_spans_maximal" -> Dedup.dedupSpansMaximal _,
    "dedup_spans_incremental" -> Dedup.dedupSpansIncremental _,
    "dedup_phash"         -> ((s, d) => Multimodal.phashDups(s, d)),
    "dedup_phash_incremental" -> ((s, d) => Multimodal.phashIncremental(s, d)),
    "dedup_phash_clusters" -> Multimodal.phashClusters _,
    "phash_topk"          -> Multimodal.phashTopK _,
    "ann_bruteforce"      -> ((s, d) => Similarity.annBruteforce(s, d)),
    "ann_lsh"             -> ((s, d) => Similarity.annLsh(s, d)),
    "ann_ivf"             -> ((s, d) => Similarity.annIvf(s, d)),
    "ann_sq8"             -> ((s, d) => Similarity.annSq8(s, d)),
    "ann_ivf_sq8"         -> ((s, d) => Similarity.annIvfSq8(s, d)),
    "ann_pq"              -> ((s, d) => Similarity.annPq(s, d)),
    "ann_ivf_pq"          -> ((s, d) => Similarity.annIvfPq(s, d)),
    "ann_prefix"          -> ((s, d) => Similarity.annPrefix(s, d)),
    "ann_ivf_prefix"      -> ((s, d) => Similarity.annIvfPrefix(s, d)),
    "ann_ivf_filtered"    -> ((s, d) => Similarity.annIvfFiltered(s, d)),
    "ann_ivf_white"       -> ((s, d) => Similarity.annIvfWhite(s, d)),
    "ann_graph_walk"      -> ((s, d) => Similarity.annGraphWalk(s, d)),
    "knn_graph"           -> ((s, d) => Similarity.knnGraph(s, d)),
    "kmeans_report"       -> ((s, d) => Similarity.kmeansReport(s, d)),
    "mine_bitext"         -> ((s, d) => Similarity.mineBitext(s, d)),
    "graph_pagerank"      -> ((s, d) => Similarity.graphPagerank(s, d)),
    "emb_pca"             -> ((s, d) => Similarity.embPca(s, d)),
    "knn_hubness"         -> ((s, d) => Similarity.knnHubness(s, d)),
    "knn_components"      -> ((s, d) => Similarity.knnComponents(s, d)),
    "graph_profile"       -> ((s, d) => Similarity.graphProfile(s, d)),
    "graph_ppr"           -> ((s, d) => Similarity.graphPpr(s, d)),
    "graph_label_prop"    -> ((s, d) => Similarity.graphLabelProp(s, d)),
    "tokenizer_fertility" -> functions.TokenizerStats.tokenizerFertility _,
    "tokenizer_coverage"  -> functions.TokenizerStats.tokenizerCoverage _,
    "sketch_distinct"     -> operators.Sketches.sketchDistinct _,
    "sketch_heavyhitters" -> ((s, d) => operators.Sketches.sketchHeavyHitters(s, d)),
    "sketch_quantiles"    -> operators.Sketches.sketchQuantiles _,
    "sketch_bloom"        -> operators.Sketches.sketchBloom _,
    "text_stats"          -> TextFunctions.textStats _,
    "corpus_card"         -> TextFunctions.corpusCard _,
    "text_langid"         -> TextFunctions.langId _,
    "classify_nb"         -> Classify.classifyNb _,
    "classify_nb_eval"    -> Classify.classifyNbEval _,
    "classify_nb_f1"      -> Classify.classifyNbF1 _,
    "quality_nb"          -> Classify.qualityNb _,
    "quality_nb_eval"     -> Classify.qualityNbEval _,
    "classify_centroid"   -> Classify.classifyCentroid _,
    "classify_knn"        -> ((s, d) => Classify.classifyKnn(s, d)),
    "select_uncertain"    -> ((s, d) => Classify.selectUncertain(s, d)),
    "mine_hard_negatives" -> ((s, d) => Classify.mineHardNegatives(s, d)),
    "select_kcenter"      -> ((s, d) => Similarity.selectKcenter(s, d)),
    "select_kcenter_assign" -> ((s, d) => Similarity.selectKcenterAssign(s, d)),
    "mask_spans"          -> TextFunctions.maskSpans _,
    "text_fingerprint"    -> TextFunctions.fingerprint _,
    "text_keywords"       -> ((s, d) => TextFunctions.textKeywords(s, d)),
    "text_repetition"     -> TextFunctions.textRepetition _,
    "vocab_topk"          -> ((s, d) => TextFunctions.vocabTopK(s, d)),
    "ngram_lm_score"      -> TextFunctions.ngramLmScore _,
    "select_learnability" -> TextFunctions.selectLearnability _,
    "mixture_reweight"    -> ((s, d) => operators.Curate.mixtureReweight(s, d)),
    "ccnet_buckets"       -> TextFunctions.ccnetBuckets _,
    "collocations"        -> ((s, d) => TextFunctions.collocations(s, d)),
    "ngram_lm_heldout"    -> TextFunctions.ngramLmHeldOut _,
    "ngram_lm_interp"     -> TextFunctions.ngramLmInterp _,
    "ngram_lm_kn"         -> TextFunctions.ngramLmKn _,
    "bpe_segment"         -> ((s, d) => functions.Bpe.bpeSegment(s, d)),
    "bpe_token_count"     -> ((s, d) => functions.Bpe.bpeTokenCount(s, d)),
    "unigram_segment"     -> ((s, d) => functions.Unigram.unigramSegment(s, d)),
    "unigram_token_count" -> ((s, d) => functions.Unigram.unigramTokenCount(s, d)),
    "wordpiece_segment"   -> ((s, d) => functions.Wordpiece.wordpieceSegment(s, d)),
    "wordpiece_token_count" -> ((s, d) => functions.Wordpiece.wordpieceTokenCount(s, d)),
    "text_redact"         -> TextFunctions.textRedact _,
    "split_assign"        -> operators.Curate.splitAssign _,
    "split_stratified"    -> operators.Curate.splitStratified _,
    "sample_mixture"      -> operators.Curate.sampleMixture _,
    "decontaminate"       -> ((s, d) => operators.Curate.decontaminate(s, d)),
    "decontaminate_shuffle" -> ((s, d) => operators.Curate.decontaminateShuffle(s, d)),
    "text_ngram_novelty"  -> ((s, d) => operators.Curate.textNgramNovelty(s, d)),
    "decontaminate_excise" -> ((s, d) => operators.Curate.decontaminateExcise(s, d)),
    "decontaminate_bloom" -> ((s, d) => operators.Curate.decontaminateBloom(s, d)),
    "decontaminate_minkprob" -> TextFunctions.minkProb _,
    "pack_sequences"      -> ((s, d) => operators.Curate.packSequences(s, d)),
    "pack_segments"       -> ((s, d) => operators.Curate.packSegments(s, d)),
    "pack_bestfit"        -> ((s, d) => operators.Curate.packBestfit(s, d)),
    "pack_masked"         -> ((s, d) => operators.Curate.packMasked(s, d)),
    "multimodal_meta"     -> Multimodal.features _,
    "multimodal_frames"   -> ((s, d) => Multimodal.frameSample(s, d)),
    "multimodal_audio"    -> ((s, d) => Multimodal.audioFeatures(s, d)),
    "curate_corpus"       -> operators.Curate.curateCorpus _,
    "curate_neardup"      -> operators.Curate.curateNearDup _,
    "bm25_topk"           -> ((s, d) => operators.Search.bm25TopK(s, d)),
    "search_hybrid_rrf"   -> ((s, d) => operators.Search.hybridRrf(s, d)),
    "search_hybrid_wrrf"  -> ((s, d) => operators.Search.hybridRrfWeighted(s, d)),
    "phrase_search"       -> ((s, d) => operators.Search.phraseSearch(s, d)),
    "scd2_history"        -> operators.Upsert.scd2History _,
    "profile_columns"     -> operators.Profile.profileColumns _,
    "chunk_overlap"       -> ((s, d) => operators.Curate.chunkOverlap(s, d)),
    "contrastive_triplets" -> ((s, d) => operators.Curate.contrastiveTriplets(s, d)),
    "feature_lags"        -> Timeseries.featureLags _,
    "regress_trend"       -> Timeseries.regressTrend _,
    "quality_distill"     -> TextFunctions.qualityDistill _,
    "snapshot_diff"       -> operators.Cdc.snapshotDiffQuery _,
    "range_join_agg"      -> operators.RangeJoin.rangeJoinAgg _,
    "fuzzy_match_names"   -> operators.FuzzyJoin.fuzzyMatchNames _,
    "dq_check"            -> operators.DataQuality.dqCheck _,
    "sample_weighted"     -> operators.Curate.sampleWeighted _,
    "multimodal_scenecut" -> ((s, d) => Multimodal.sceneCuts(s, d)),
    "scd2_lookup"         -> operators.Upsert.scd2LookupQuery _,
    "events_gap_fill"     -> Timeseries.eventsGapFill _,
    "text_normalize"      -> TextFunctions.textNormalize _,
    "text_scripts"        -> TextFunctions.textScripts _,
    "text_entropy"        -> ((s, d) => TextFunctions.textEntropy(s, d)),
    "vocab_drift"         -> ((s, d) => TextFunctions.vocabDrift(s, d)),
    "vocab_drift_ref"     -> ((s, d) => TextFunctions.vocabDriftRef(s, d)),
    "gopher_rules"        -> functions.QualityFilters.gopherRules _,
    "c4_filters"          -> functions.QualityFilters.c4Filters _,
    "sample_temperature"  -> operators.Curate.sampleTemperature _,
    "dsir_select"         -> ((s, d) => operators.Curate.dsirSelect(s, d)),
    "dedup_profile"       -> Dedup.dedupProfile _,
    "lsh_calibration"     -> Dedup.lshCalibration _,
    "lsh_plan"            -> Dedup.lshPlan _,
    "quality_calibration" -> TextFunctions.qualityCalibration _,
    "mixture_plan"        -> ((s, d) => operators.Curate.mixturePlan(s, d)),
    "upsample_epochs"     -> ((s, d) => operators.Curate.upsampleEpochs(s, d)),
    "shuffle_interleave"  -> operators.Curate.shuffleInterleave _,
    "dedup_lines"         -> Dedup.dedupLines _,
    "dedup_winnow"        -> ((s, d) => Dedup.dedupWinnow(s, d)),
    "dedup_chunks"        -> Dedup.dedupChunks _,
    "dedup_chunks_excise" -> Dedup.dedupChunksExcise _,
  )

  /** The Holt-Winters recursive-CTE chain (daily counts -> seeded
    * state -> one recursion step per day -> final-state forecasts)
    * shared by the holt_winters and forecast_anomaly oracles — one
    * replay of the recurrence, two readouts. */
  private val holtWintersCtes: String = holtWintersCtesOver(0)

  /** Damped-trend variant of the chain (φ = 9/10, Gardner) — backs
    * holt_winters_damped. */
  private lazy val holtWintersDampedCtes: String =
    hwCtesBody(0, damped = true)

  /** The same chain with the last `holdout` days per series HELD OUT
    * of training (seq keeps the full actuals; tr is what seeds and
    * steps the recurrence) — forecast_eval backtests fc against the
    * held-out seq rows. holdout = 0 degenerates tr to seq. */
  private def holtWintersCtesOver(holdout: Int): String =
    hwCtesBody(holdout, damped = false)

  /** The residual-band CTE block shared VERBATIM by the
    * forecast_intervals and forecast_intervals_eval oracles (one band
    * selection — a rank-formula tweak cannot desynchronize the two
    * interval readouts): |residual| per fitted row, exact
    * 95th-percentile ELEMENT at rank (95n+99)//100 over (|resid|, r)
    * per series. Appended after a hw-bearing recurrence chain. */
  private val intervalBandCtes: String = """,
      fit AS (
        SELECT event_type, r, ABS(y * 1000000 - fitted) AS aresid
        FROM hw WHERE r >= 8),
      nn AS (SELECT event_type, COUNT(*) AS nr FROM fit GROUP BY 1),
      rk AS (
        SELECT f.event_type, f.aresid,
          row_number() OVER (PARTITION BY f.event_type
            ORDER BY f.aresid, f.r) AS rn,
          nn.nr
        FROM fit f JOIN nn USING (event_type)),
      band AS (
        SELECT event_type, CAST(aresid AS BIGINT) AS band_e6
        FROM rk WHERE rn = (95 * nr + 99) // 100)"""

  /** The shared HW recurrence body. EVERY state expression is
    * computed in the inner subquery, where only the OLD-state
    * columns (h.l, h.b, h.s) and fresh lateral aliases are in scope
    * — no alias may shadow a state column, so correctness never
    * rides on DuckDB's name-resolution preference between a lateral
    * alias and a same-named subquery column. `damped` threads the
    * trend through φ·b = floorDiv(9b, 10) at every use and replaces
    * the linear h·b forecast with the iterated geometric damp
    * (chained lateral aliases d1..d7 — exact signed floor
    * divisions, identical to [[graft.operators.Timeseries
    * .hwForecastDamped]]). */
  private def hwCtesBody(holdout: Int, damped: Boolean): String =
    "\n      WITH RECURSIVE" + hwCtesList(holdout, damped, "")

  /** The recurrence CTE LIST (no WITH keyword) with every CTE name
    * prefixed by `p` — lets forecast_model_select place the
    * additive, damped and multiplicative chains side by side in ONE
    * recursive with-list without name collisions (the
    * select_learnability composition lesson). `p` = "" reproduces
    * the classic body byte-for-byte. */
  private def hwCtesList(holdout: Int, damped: Boolean,
                         p: String): String = {
    // the exactly-divisible floor-division form: (a - pmod(a,d)) // d
    // (operands go negative through the trend — truncating division
    // would diverge from Math.floorDiv)
    def fd(a: String, d: Int) = s"(($a) - ((($a) % $d + $d) % $d)) // $d"
    val phb = if (damped) fd("9*h.b", 10) else "h.b"
    val fcCtes =
      if (!damped) s"""
      ${p}fc AS (
        SELECT event_type, n + h AS r, CAST(0 AS BIGINT) AS y,
          l + h * b + s[CAST((n + h - 1) % 7 + 1 AS INT)] AS fitted
        FROM ${p}fin, (SELECT unnest(range(1, 8)) AS h))"""
      else {
        val ds = (1 to 7).map { k =>
          val prev = if (k == 1) "b" else s"d${k - 1}"
          s"${fd(s"9*$prev", 10)} AS d$k"
        }.mkString(",\n          ")
        val cases = (1 to 7).map { hh =>
          s"WHEN $hh THEN ${(1 to hh).map(i => s"d$i").mkString(" + ")}"
        }.mkString(" ")
        s"""
      ${p}fin2 AS (
        SELECT event_type, n, l, s,
          $ds
        FROM ${p}fin),
      ${p}fc AS (
        SELECT event_type, n + h AS r, CAST(0 AS BIGINT) AS y,
          l + (CASE CAST(h AS INT) $cases END)
            + s[CAST((n + h - 1) % 7 + 1 AS INT)] AS fitted
        FROM ${p}fin2, (SELECT unnest(range(1, 8)) AS h))"""
      }
    s""" ${p}daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
      ${p}seq AS (
        SELECT event_type, y,
          CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
            AS BIGINT) AS r,
          CAST(count(*) OVER (PARTITION BY event_type) - $holdout
            AS BIGINT) AS n
        FROM ${p}daily),
      ${p}tr AS (SELECT * FROM ${p}seq WHERE r <= n),
      ${p}init AS (
        SELECT event_type, n,
          SUM(CASE WHEN r <= 7 THEN y * 1000000 ELSE 0 END) AS sum1,
          SUM(CASE WHEN r > 7 AND r <= 14 THEN y * 1000000 ELSE 0 END) AS sum2,
          list(y * 1000000 ORDER BY r) FILTER (WHERE r <= 7) AS ys
        FROM ${p}tr WHERE n >= 14 GROUP BY event_type, n),
      ${p}st0 AS (
        SELECT event_type, n,
          CAST(sum1 // 7 AS BIGINT) AS l,
          CAST(((sum2 - sum1) - (((sum2 - sum1) % 49 + 49) % 49)) // 49
            AS BIGINT) AS b,
          list_transform(ys, v -> CAST(v - sum1 // 7 AS BIGINT)) AS s
        FROM ${p}init),
      ${p}hw AS (
        SELECT event_type, n, CAST(7 AS BIGINT) AS r, l, b, s,
          CAST(NULL AS BIGINT) AS y, CAST(NULL AS BIGINT) AS fitted
        FROM ${p}st0
        UNION ALL
        SELECT event_type, n, r,
          lnew AS l,
          bnew AS b,
          list_transform(range(1, 8), i -> CASE WHEN i = idx
            THEN snew ELSE s[i] END) AS s,
          y,
          fitted
        FROM (
          SELECT h.event_type, h.n, q.r, q.y, h.s,
            CAST((q.r - 1) % 7 + 1 AS INT) AS idx,
            h.s[CAST((q.r - 1) % 7 + 1 AS INT)] AS sold,
            $phb AS phb,
            h.l + phb + sold AS fitted,
            ${fd("(q.y * 1000000 - sold) + 4*(h.l + phb)", 5)} AS lnew,
            ${fd("(lnew - h.l) + 9*phb", 10)} AS bnew,
            ${fd("(q.y * 1000000 - lnew) + 4*sold", 5)} AS snew
          FROM ${p}hw h JOIN ${p}tr q
            ON q.event_type = h.event_type AND q.r = h.r + 1)),
      ${p}fin AS (
        SELECT event_type, n, max_by(l, r) AS l, max_by(b, r) AS b,
          max_by(s, r) AS s
        FROM ${p}hw GROUP BY event_type, n),$fcCtes"""
  }

  /** The MULTIPLICATIVE-seasonality HW recurrence body (the
    * [[hwCtesBody]] discipline on ratio state): the seasonal list
    * holds e6-unit RATIOS, deseasonalization is y·1e12 // s and the
    * fitted/forecast values are (l+b)·s floor-divided back by 1e6.
    * Divisions by a VARIABLE divisor (s, lnew, l₀) always have
    * non-negative numerators and positive divisors (the CASE guards
    * mirror [[graft.operators.Timeseries.hwMulStep]] exactly), so
    * plain `//` is floor there; constant-divisor divisions may see
    * negative numerators and use the exactly-divisible pmod form. */
  private def hwMulCtesBody(holdout: Int): String =
    "\n      WITH RECURSIVE" + hwMulCtesList(holdout, "")

  /** The multiplicative CTE LIST with prefixed names (the
    * [[hwCtesList]] composition affordance). */
  private def hwMulCtesList(holdout: Int, p: String): String = {
    def fd(a: String, d: Int) = s"(($a) - ((($a) % $d + $d) % $d)) // $d"
    s""" ${p}daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
      ${p}seq AS (
        SELECT event_type, y,
          CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
            AS BIGINT) AS r,
          CAST(count(*) OVER (PARTITION BY event_type) - $holdout
            AS BIGINT) AS n
        FROM ${p}daily),
      ${p}tr AS (SELECT * FROM ${p}seq WHERE r <= n),
      ${p}init AS (
        SELECT event_type, n,
          SUM(CASE WHEN r <= 7 THEN y * 1000000 ELSE 0 END) AS sum1,
          SUM(CASE WHEN r > 7 AND r <= 14 THEN y * 1000000 ELSE 0 END) AS sum2,
          list(y * 1000000 ORDER BY r) FILTER (WHERE r <= 7) AS ys
        FROM ${p}tr WHERE n >= 14 GROUP BY event_type, n),
      ${p}st0 AS (
        SELECT event_type, n,
          CAST(sum1 // 7 AS BIGINT) AS l,
          CAST(((sum2 - sum1) - (((sum2 - sum1) % 49 + 49) % 49)) // 49
            AS BIGINT) AS b,
          list_transform(ys, v -> CAST(CASE WHEN sum1 // 7 > 0
            THEN (v * 1000000) // (sum1 // 7)
            ELSE 1000000 END AS BIGINT)) AS s
        FROM ${p}init),
      ${p}hw AS (
        SELECT event_type, n, CAST(7 AS BIGINT) AS r, l, b, s,
          CAST(NULL AS BIGINT) AS y, CAST(NULL AS BIGINT) AS fitted
        FROM ${p}st0
        UNION ALL
        SELECT event_type, n, r,
          lnew AS l,
          bnew AS b,
          list_transform(range(1, 8), i -> CASE WHEN i = idx
            THEN snew ELSE s[i] END) AS s,
          y,
          fitted
        FROM (
          SELECT h.event_type, h.n, q.r, q.y, h.s,
            CAST((q.r - 1) % 7 + 1 AS INT) AS idx,
            h.s[CAST((q.r - 1) % 7 + 1 AS INT)] AS sold,
            CASE WHEN sold > 0 THEN sold ELSE 1000000 END AS seff,
            ${fd("(h.l + h.b) * seff", 1000000)} AS fitted,
            (q.y * 1000000 * 1000000) // seff AS dy,
            ${fd("dy + 4*(h.l + h.b)", 5)} AS lnew,
            ${fd("(lnew - h.l) + 9*h.b", 10)} AS bnew,
            CASE WHEN lnew > 0 THEN (q.y * 1000000 * 1000000) // lnew
              ELSE seff END AS robs,
            ${fd("robs + 4*seff", 5)} AS snew
          FROM ${p}hw h JOIN ${p}tr q
            ON q.event_type = h.event_type AND q.r = h.r + 1)),
      ${p}fin AS (
        SELECT event_type, n, max_by(l, r) AS l, max_by(b, r) AS b,
          max_by(s, r) AS s
        FROM ${p}hw GROUP BY event_type, n),
      ${p}fc AS (
        SELECT event_type, n + h AS r, CAST(0 AS BIGINT) AS y,
          ${fd("(l + h * b) * (CASE WHEN s[CAST((n + h - 1) % 7 + 1 AS INT)] > 0 THEN s[CAST((n + h - 1) % 7 + 1 AS INT)] ELSE 1000000 END)", 1000000)} AS fitted
        FROM ${p}fin, (SELECT unnest(range(1, 8)) AS h))"""
  }

  /** The recommend_hybrid oracle body with the CF-side rrf weight as
    * a SQL literal TEXT (the hybridRrfOracleSql wLex discipline --
    * "1" reproduces the unweighted gate byte-for-byte, "0.75" the
    * weighted one; the Markov term stays at weight 1). */
  private def recommendHybridOracleSql(wCf: String): String = raw"""
      WITH inter AS (
        SELECT DISTINCT user_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item
        FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM inter GROUP BY item),
      pairs AS (
        SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS c
        FROM inter a JOIN inter b
          ON a.user_id = b.user_id AND a.item < b.item
        GROUP BY 1, 2),
      sym AS (SELECT i, j, c FROM pairs
              UNION ALL SELECT j AS i, i AS j, c FROM pairs),
      scored AS (
        SELECT s.i AS item, s.j AS rec_item,
          CAST(floor(CAST(s.c AS DOUBLE) /
            (sqrt(CAST(ni.n AS DOUBLE)) * sqrt(CAST(nj.n AS DOUBLE))) * 1e6
            + 0.5) AS BIGINT) AS cos_e6
        FROM sym s JOIN cnt ni ON ni.item = s.i JOIN cnt nj ON nj.item = s.j),
      cf AS (
        SELECT item AS query_id, rec_item AS doc_id, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY item
            ORDER BY cos_e6 DESC, rec_item) AS INT) AS rank
          FROM scored) WHERE rank <= 10),
      mev AS (
        SELECT user_id, ts, event_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
          AND regexp_extract(props, '"k":\s*(-?\d+)', 1) <> ''),
      msq AS (
        SELECT item, lead(item) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS next_item
        FROM mev),
      mtr AS (
        SELECT item, next_item, CAST(count(*) AS BIGINT) AS c
        FROM msq WHERE next_item IS NOT NULL AND next_item <> item
        GROUP BY 1, 2),
      mk AS (
        SELECT item AS query_id, next_item AS doc_id, rank FROM (
          SELECT item, next_item, CAST(row_number() OVER (PARTITION BY item
            ORDER BY c DESC, next_item) AS INT) AS rank
          FROM mtr) WHERE rank <= 10),
      rrlists AS (
        SELECT query_id, doc_id,
          CAST(round(CAST($wCf AS DOUBLE) / CAST(60 + rank AS DOUBLE), 9)
               AS DECIMAL(13,9)) AS c
        FROM cf
        UNION ALL
        SELECT query_id, doc_id,
          CAST(round(CAST(1 AS DOUBLE) / CAST(60 + rank AS DOUBLE), 9)
               AS DECIMAL(13,9)) AS c
        FROM mk),
      fused AS (
        SELECT query_id, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS rrf
        FROM rrlists GROUP BY 1, 2)
      SELECT query_id AS item, doc_id AS rec_item, rrf, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY rrf DESC, doc_id) AS INT) AS rank
        FROM fused)
      WHERE rank <= 5 ORDER BY item, rank"""

  /** markov_stationary oracle: the weighted-pagerank power iteration
    * unrolled as chained aggregating CTEs (the graph_pagerank
    * discipline), with the node count as a SCALAR SUBQUERY so the
    * SQL stays static. Per-edge outflow = (pr // tc) * c — the
    * per-unit quotient first (overflow bound), all operands
    * non-negative so // is floor in both engines. */
  private def markovStationaryOracleSql(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""pr$i AS (
        SELECT nd.item,
          CAST((3 * 1000000000000 // (20 * (SELECT n FROM nn))) +
            (17 * COALESCE(cs.s, 0)) // 20 AS BIGINT) AS pr
        FROM nodes nd LEFT JOIN (
          SELECT t.next_item AS item, SUM((p.pr // o.tc) * t.c) AS s
          FROM trans t JOIN tot o ON o.item = t.item
          JOIN pr${i - 1} p ON p.item = t.item
          GROUP BY 1) cs ON cs.item = nd.item)"""
    }.mkString(",\n      ")
    raw"""
      WITH ev AS (
        SELECT user_id, ts, event_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
          AND regexp_extract(props, '"k":\s*(-?\d+)', 1) <> ''),
      sq AS (
        SELECT item, lead(item) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS next_item
        FROM ev),
      trans AS (
        SELECT item, next_item, CAST(count(*) AS BIGINT) AS c
        FROM sq WHERE next_item IS NOT NULL AND next_item <> item
        GROUP BY 1, 2),
      tot AS (SELECT item, CAST(SUM(c) AS BIGINT) AS tc FROM trans GROUP BY 1),
      nodes AS (SELECT DISTINCT item FROM (
        SELECT item FROM trans UNION ALL SELECT next_item FROM trans)),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
      pr0 AS (SELECT item,
        CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS pr
        FROM nodes),
      $iterCtes
      SELECT item, pr AS pr_e12,
        round(CAST(pr AS DOUBLE) / 1e12, 6) AS stationary
      FROM pr$iters ORDER BY item"""
  }

  /** Full oracle map for a concrete dataset: the static SQL plus the
    * data-dependent entries (ann_ivf embeds its trained centroids as
    * literals, so it can only be rendered once the data is known).
    * Verify dumps THIS map — the driver replays it in DuckDB.
    * `only` restricts WHICH oracles are rendered: data-dependent
    * entries train models to build their literals, so a single-query
    * dev dump (SPARK_GRAFT_ONLY) must not pay for the other 28. */
  def oracleSqlFor(s: SparkSession, d: String,
      only: Option[Set[String]] = None): Map[String, String] = {
    val dataDependent: Map[String, () => String] = Map(
      "ann_ivf" -> (() => Similarity.annIvfOracleSql(s, d)),
      "ann_ivf_sq8" -> (() => Similarity.annIvfSq8OracleSql(s, d)),
      "ann_pq" -> (() => Similarity.annPqOracleSql(s, d)),
      "ann_ivf_pq" -> (() => Similarity.annIvfPqOracleSql(s, d)),
      "ann_ivf_prefix" -> (() => Similarity.annIvfPrefixOracleSql(s, d)),
      "ann_ivf_filtered" -> (() => Similarity.annIvfFilteredOracleSql(s, d)),
      "ann_ivf_white" -> (() => Similarity.annIvfWhiteOracleSql(s, d)),
      "ann_graph_walk" -> (() => Similarity.annGraphWalkOracleSql(s, d)),
      "knn_graph" -> (() => Similarity.knnGraphOracleSql(s, d)),
      "kmeans_report" -> (() => Similarity.kmeansReportOracleSql(s, d)),
      "mine_bitext" -> (() => Similarity.mineBitextOracleSql(s, d)),
      "graph_pagerank" -> (() => Similarity.graphPagerankOracleSql(s, d)),
      "emb_pca" -> (() => Similarity.embPcaOracleSql(s, d)),
      "knn_hubness" -> (() => Similarity.knnHubnessOracleSql(s, d)),
      "knn_components" -> (() => Similarity.knnComponentsOracleSql(s, d)),
      "graph_profile" -> (() => Similarity.graphProfileOracleSql(s, d)),
      "graph_ppr" -> (() => Similarity.graphPprOracleSql(s, d)),
      "graph_label_prop" ->
        (() => Similarity.graphLabelPropOracleSql(s, d)),
      "tokenizer_fertility" ->
        (() => functions.TokenizerStats.tokenizerFertilityOracleSql(s, d)),
      "tokenizer_coverage" ->
        (() => functions.TokenizerStats.tokenizerCoverageOracleSql(s, d)),
      "dedup_semantic" -> (() => Similarity.dedupSemanticOracleSql(s, d)),
      "select_prototypes" ->
        (() => Similarity.selectPrototypesOracleSql(s, d)),
      "bpe_segment" -> (() => functions.Bpe.bpeSegmentOracleSql(s, d)),
      "bpe_token_count" -> (() => functions.Bpe.bpeTokenCountOracleSql(s, d)),
      "unigram_segment" ->
        (() => functions.Unigram.unigramSegmentOracleSql(s, d)),
      "unigram_token_count" ->
        (() => functions.Unigram.unigramTokenCountOracleSql(s, d)),
      "wordpiece_segment" ->
        (() => functions.Wordpiece.wordpieceSegmentOracleSql(s, d)),
      "wordpiece_token_count" ->
        (() => functions.Wordpiece.wordpieceTokenCountOracleSql(s, d)))
    val keep = (n: String) => only.forall(_(n))
    oracleSql.filter(kv => keep(kv._1)) ++
      dataDependent.collect { case (k, f) if keep(k) => k -> f() }
  }

  /** The ngram_lm_heldout oracle body — shared verbatim by the
    * ngram_lm_heldout entry and select_learnability's reference
    * subquery. */
  private def ngramLmHeldoutSql: String = raw"""
      WITH t AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> length(x) > 0) AS toks
        FROM documents),
      bgl AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])) AS bigram
        FROM t WHERE len(toks) >= 2),
      bgs AS (SELECT doc_id, bigram, string_split(bigram, ' ')[1] AS w1 FROM bgl),
      model AS (SELECT bigram, COUNT(*) AS cnt FROM bgs
                WHERE doc_id % 50 <> 0 GROUP BY 1),
      ctx AS (SELECT w1, COUNT(*) AS ctx FROM bgs
              WHERE doc_id % 50 <> 0 GROUP BY 1),
      voc AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM (
                SELECT unnest(toks) AS tok FROM t WHERE doc_id % 50 <> 0)),
      docbg AS (SELECT doc_id, w1, bigram, COUNT(*) AS k FROM bgs GROUP BY 1, 2, 3),
      scored AS (
        SELECT d.doc_id, d.k,
          CAST(round(ln((CAST(COALESCE(m.cnt, 0) AS DOUBLE) + 0.25) /
                        (CAST(COALESCE(c.ctx, 0) AS DOUBLE) + 0.25 * voc.v)),
                     9) AS DECIMAL(13,9)) AS lp
        FROM docbg d
        LEFT JOIN model m USING (bigram)
        LEFT JOIN ctx c USING (w1)
        CROSS JOIN voc),
      agg AS (
        SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
          SUM(CAST(k AS DECIMAL(9,0)) * lp) AS slp
        FROM scored GROUP BY doc_id),
      fin AS (
        SELECT doc_id, n_bigrams,
          round(-(CAST(slp AS DOUBLE) / n_bigrams), 6) AS avg_neg_logp
        FROM agg)
      SELECT doc_id, n_bigrams, avg_neg_logp,
        round(exp(avg_neg_logp), 6) AS ppl
      FROM fin ORDER BY doc_id"""

  /** Shared CTE chain for the bigram-LM per-doc score (`fin` =
    * (doc_id, n_bigrams, avg_neg_logp)) — used by ngram_lm_score and
    * as the regression target for quality_distill. */
  private def ngramLmCtes: String = raw"""t AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> length(x) > 0) AS toks
        FROM documents),
      bgl AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])) AS bigram
        FROM t WHERE len(toks) >= 2),
      bgs AS (SELECT doc_id, bigram, string_split(bigram, ' ')[1] AS w1 FROM bgl),
      model AS (SELECT bigram, COUNT(*) AS cnt FROM bgs GROUP BY 1),
      ctx AS (SELECT w1, COUNT(*) AS ctx FROM bgs GROUP BY 1),
      docbg AS (SELECT doc_id, w1, bigram, COUNT(*) AS k FROM bgs GROUP BY 1, 2, 3),
      scored AS (
        SELECT d.doc_id, d.k,
          CAST(round(ln(CAST(m.cnt AS DOUBLE) / c.ctx), 9) AS DECIMAL(13,9)) AS lp
        FROM docbg d JOIN model m USING (bigram) JOIN ctx c USING (w1)),
      agg AS (
        SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
          SUM(CAST(k AS DECIMAL(9,0)) * lp) AS slp
        FROM scored GROUP BY doc_id),
      fin AS (
        SELECT doc_id, n_bigrams,
          round(-(CAST(slp AS DOUBLE) / n_bigrams), 6) AS avg_neg_logp
        FROM agg)"""

  /** Shared CTE chain replaying the multinomial-NB classifier
    * (train on doc_id%5≠0, score the held-out carve) — used by
    * classify_nb and classify_nb_eval. Every ln argument is an
    * integer ≥ 1 (so round-half-up == half-away), snapped to the
    * 1e-9 grid and carried as an exact BIGINT in 1e-9 units via
    * floor(round(ln,9)·1e9 + 0.5) on the identical rounded double
    * (the Classify.lnE9 recipe — values ≪ 2^53, the ±ulp of the
    * ×1e9 sits far inside the +0.5 guard); products that could
    * exceed 2^63 go through HUGEINT and cast back. `pred` ends at
    * (doc_id, label, score_e9, r) with r = 1 the argmax row
    * (score desc, label asc). */
  private def nbCtes: String = raw"""d AS (
        SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '\s+'),
                                         x -> length(x) > 0) AS toks
        FROM documents),
      tr AS (SELECT lang AS label, unnest(toks) AS token FROM d
             WHERE doc_id % 5 <> 0),
      m AS (SELECT label, token, COUNT(*) AS cnt FROM tr GROUP BY 1, 2),
      mw AS (SELECT label, token, cnt,
               CAST(floor(round(ln(CAST(cnt + 1 AS DOUBLE)), 9) * 1e9 + 0.5)
                    AS BIGINT) AS w_e9
             FROM m),
      voc AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM m),
      ct AS (SELECT label, CAST(SUM(cnt) AS BIGINT) AS tot FROM m GROUP BY 1),
      cd AS (SELECT lang AS label, COUNT(*) AS n_docs FROM d
             WHERE doc_id % 5 <> 0 GROUP BY 1),
      ntr AS (SELECT COUNT(*) AS n FROM d WHERE doc_id % 5 <> 0),
      cs AS (SELECT ct.label,
               CAST(floor(round(ln(CAST(cd.n_docs AS DOUBLE)), 9) * 1e9 + 0.5)
                    AS BIGINT)
             - CAST(floor(round(ln(CAST(ntr.n AS DOUBLE)), 9) * 1e9 + 0.5)
                    AS BIGINT) AS prior_e9,
               - CAST(floor(round(ln(CAST(ct.tot + voc.v AS DOUBLE)), 9) * 1e9 + 0.5)
                    AS BIGINT) AS lp0_e9
             FROM ct JOIN cd USING (label), ntr, voc),
      te AS (SELECT doc_id, unnest(toks) AS token FROM d WHERE doc_id % 5 = 0),
      tc AS (SELECT doc_id, token, COUNT(*) AS k FROM te GROUP BY 1, 2),
      vt AS (SELECT DISTINCT token FROM m),
      ndv AS (SELECT tc.doc_id, CAST(SUM(tc.k) AS BIGINT) AS nd
              FROM tc JOIN vt USING (token) GROUP BY 1),
      adj AS (SELECT tc.doc_id, mw.label,
                CAST(SUM(CAST(tc.k AS HUGEINT) * mw.w_e9) AS BIGINT) AS adj_e9
              FROM tc JOIN mw USING (token) GROUP BY 1, 2),
      base AS (SELECT dd.doc_id, cs.label,
                 cs.prior_e9 + COALESCE(ndv.nd, 0) * cs.lp0_e9 AS base_e9
               FROM (SELECT doc_id FROM d WHERE doc_id % 5 = 0) dd
               LEFT JOIN ndv USING (doc_id) CROSS JOIN cs),
      sc AS (SELECT base.doc_id, base.label,
               base.base_e9 + COALESCE(adj.adj_e9, 0) AS score_e9
             FROM base LEFT JOIN adj
               ON adj.doc_id = base.doc_id AND adj.label = base.label),
      pred AS (SELECT doc_id, label, score_e9,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score_e9 DESC, label) AS r
               FROM sc)"""

  /** The quality_nb CTE body (self-trained LM chain → ppl tertile
    * labels `lab` → head-vs-tail NB training → per-(doc, class)
    * exact scores `qsc`) — shared by quality_nb and
    * quality_nb_eval. */
  private def qualityNbCtes: String = s"""$ngramLmCtes,
      sc2 AS (SELECT doc_id, round(exp(avg_neg_logp), 6) AS ppl FROM fin),
      stq AS (SELECT COUNT(*) AS n FROM sc2),
      rnq AS (SELECT doc_id, ppl,
                row_number() OVER (ORDER BY ppl, doc_id) AS r FROM sc2),
      th1 AS (SELECT ppl AS p1 FROM rnq, stq WHERE r = (n + 2) // 3),
      th2 AS (SELECT ppl AS p2 FROM rnq, stq WHERE r = (2 * n + 2) // 3),
      lab AS (SELECT sc2.doc_id,
                CASE WHEN sc2.ppl <= th1.p1 THEN 'head'
                     WHEN sc2.ppl <= th2.p2 THEN 'middle'
                     ELSE 'tail' END AS label
              FROM sc2, th1, th2),
      qtr AS (SELECT lab.label, unnest(t.toks) AS token
              FROM lab JOIN t USING (doc_id) WHERE lab.label <> 'middle'),
      qm AS (SELECT label, token, COUNT(*) AS cnt FROM qtr GROUP BY 1, 2),
      qmw AS (SELECT label, token,
                CAST(floor(round(ln(CAST(cnt + 1 AS DOUBLE)), 9) * 1e9 + 0.5)
                     AS BIGINT) AS w_e9
              FROM qm),
      qvoc AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM qm),
      qct AS (SELECT label, CAST(SUM(cnt) AS BIGINT) AS tot FROM qm GROUP BY 1),
      qcd AS (SELECT label, COUNT(*) AS n_docs FROM lab
              WHERE label <> 'middle' GROUP BY 1),
      qntr AS (SELECT COUNT(*) AS n FROM lab WHERE label <> 'middle'),
      qcs AS (SELECT qct.label,
                CAST(floor(round(ln(CAST(qcd.n_docs AS DOUBLE)), 9) * 1e9 + 0.5)
                     AS BIGINT)
              - CAST(floor(round(ln(CAST(qntr.n AS DOUBLE)), 9) * 1e9 + 0.5)
                     AS BIGINT) AS prior_e9,
                - CAST(floor(round(ln(CAST(qct.tot + qvoc.v AS DOUBLE)), 9) * 1e9 + 0.5)
                     AS BIGINT) AS lp0_e9
              FROM qct JOIN qcd USING (label), qntr, qvoc),
      qte AS (SELECT doc_id, unnest(toks) AS token FROM t),
      qtc AS (SELECT doc_id, token, COUNT(*) AS k FROM qte GROUP BY 1, 2),
      qvt AS (SELECT DISTINCT token FROM qm),
      qnd AS (SELECT qtc.doc_id, CAST(SUM(qtc.k) AS BIGINT) AS nd
              FROM qtc JOIN qvt USING (token) GROUP BY 1),
      qadj AS (SELECT qtc.doc_id, qmw.label,
                 CAST(SUM(CAST(qtc.k AS HUGEINT) * qmw.w_e9) AS BIGINT) AS adj_e9
               FROM qtc JOIN qmw USING (token) GROUP BY 1, 2),
      qbase AS (SELECT t.doc_id, qcs.label,
                  qcs.prior_e9 + COALESCE(qnd.nd, 0) * qcs.lp0_e9 AS base_e9
                FROM t LEFT JOIN qnd USING (doc_id) CROSS JOIN qcs),
      qsc AS (SELECT qbase.doc_id, qbase.label,
                qbase.base_e9 + COALESCE(qadj.adj_e9, 0) AS score_e9
              FROM qbase LEFT JOIN qadj
                ON qadj.doc_id = qbase.doc_id AND qadj.label = qbase.label)"""

  /** Shared CTE chain reconstructing the minhash LSH band buckets and
    * candidate pairs in pure SQL — used by dedup_minhash and as the
    * edge set for dedup_clusters' recursive connected components. */
  private def minhashCtes: String = s"""docs AS (
        SELECT doc_id, lang, text FROM documents
        UNION ALL SELECT doc_id + 100000, lang, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, lang, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50),
      tok AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> length(x) > 0) AS toks
        FROM docs),
      sh AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM tok WHERE len(toks) >= 3),
      h AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(range(1, 9),
            k -> (strpos('0123456789abcdef', md5(shingle)[k:k]) - 1)
                 * CAST(16 ** (8 - k) AS BIGINT))) AS BIGINT)
            % 2147483647 AS hv
        FROM sh),
      perms(pid, a, b) AS (VALUES
        ${operators.Dedup.permsSqlValues}),
      mins AS (
        SELECT doc_id, pid, MIN((a * hv + b) % 2147483647) AS m
        FROM h CROSS JOIN perms GROUP BY 1, 2),
      bands AS (
        SELECT doc_id, pid // 4 AS band,
          string_agg(CAST(m AS VARCHAR), '_' ORDER BY pid) AS sig
        FROM mins GROUP BY 1, 2),
      mh_pairs AS (
        SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id)"""

  /** Connected-components oracle (recursive reachability, component
    * id = min reachable node) — shared verbatim by dedup_clusters
    * (min-label propagation) and dedup_clusters_star (Kiveris
    * star-contraction): both must hash-match it exactly. */
  private def ccOracleSql: String = s"""
      WITH RECURSIVE $minhashCtes,
      edges AS (
        SELECT d1 AS u, d2 AS v FROM mh_pairs
        UNION ALL SELECT d2, d1 FROM mh_pairs),
      reach(node, root) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node)
      SELECT node AS doc_id, MIN(root) AS cluster_id
      FROM reach GROUP BY node ORDER BY doc_id"""

  private def decontaminateOracleSql: String = """
      WITH tok AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM tok WHERE len(toks) >= 3),
      ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 50 = 0),
      tr AS (SELECT doc_id AS train_id, shingle FROM sh WHERE doc_id % 50 <> 0)
      SELECT train_id, eval_id, COUNT(*) AS shared_ngrams
      FROM tr JOIN ev USING (shingle)
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
      ORDER BY train_id, eval_id"""

  /** Shared CTE chain reconstructing the multi-table hyperplane codes
    * and the cosine-verified near-dup pair set in pure SQL — used by
    * dedup_emb_lsh and as the edge set for dedup_emb_clusters'
    * recursive connected components (the same sharing pattern as
    * [[minhashCtes]]). */
  private def embLshCtes: String = s"""planes(tid, pid, p) AS (VALUES
        ${operators.Similarity.planesSqlValues}),
      codes AS (
        SELECT vec_id, tid,
          CAST(SUM(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), p) >= 0
                        THEN 1 << pid ELSE 0 END) AS INT) AS code
        FROM embeddings CROSS JOIN planes GROUP BY vec_id, tid),
      cand AS (
        SELECT DISTINCT x.vec_id AS v1, y.vec_id AS v2
        FROM codes x JOIN codes y
          ON x.tid = y.tid AND x.code = y.code AND x.vec_id < y.vec_id),
      rer AS (
        SELECT cand.v1, cand.v2,
          round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM cand
        JOIN embeddings a ON a.vec_id = cand.v1
        JOIN embeddings b ON b.vec_id = cand.v2),
      emb_pairs AS (SELECT v1, v2, cos_sim FROM rer WHERE cos_sim >= 0.35)"""

  /** Shared CTE chain reconstructing the image dHash signatures and
    * hamming-≤3 near-dup pairs in pure integer SQL — used by
    * dedup_phash and as the edge set for dedup_phash_clusters'
    * recursive connected components (the minhashCtes pattern). */
  private def phashCtes: String = """docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 96000, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 96000, substr(text, 1, length(text) - 1) || 'q'
          FROM documents WHERE doc_id >= 25 AND doc_id < 50),
      d AS (
        SELECT doc_id, text, length(text) AS L,
          CAST(doc_id % 16 + 4 AS INT) AS w,
          CAST(doc_id % 12 + 4 AS INT) AS h
        FROM docs),
      sig AS (
        SELECT doc_id,
          CAST(SUM(CASE WHEN
            unicode(text[CAST((((j // 10) * h // 6) * w + ((j % 10) + 1) * w // 11) % L AS INT) + 1
                         : CAST((((j // 10) * h // 6) * w + ((j % 10) + 1) * w // 11) % L AS INT) + 1])
            > unicode(text[CAST((((j // 10) * h // 6) * w + (j % 10) * w // 11) % L AS INT) + 1
                           : CAST((((j // 10) * h // 6) * w + (j % 10) * w // 11) % L AS INT) + 1])
            THEN CAST(2 ** j AS BIGINT) ELSE 0 END) AS BIGINT) AS phash
        FROM d CROSS JOIN range(0, 60) r(j) GROUP BY doc_id),
      chunks AS (
        SELECT doc_id, phash, ci, (phash >> CAST(ci * 15 AS INT)) & 32767 AS cv
        FROM sig CROSS JOIN range(0, 4) c(ci)),
      ph_pairs AS (
        SELECT d1, d2, CAST(bit_count(xor(sx, sy)) AS INT) AS hamming FROM (
          SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
            x.phash AS sx, y.phash AS sy
          FROM chunks x JOIN chunks y
            ON x.ci = y.ci AND x.cv = y.cv AND x.doc_id < y.doc_id)
        WHERE bit_count(xor(sx, sy)) <= 3)"""

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
      SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
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

    "funnel_steps" -> """
      WITH ev AS (SELECT user_id, event_type, ts FROM events),
      s1 AS (
        SELECT user_id,
          MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click
        FROM ev GROUP BY 1),
      s2 AS (
        SELECT e.user_id, s1.t_click,
          MIN(CASE WHEN e.event_type = 'view' AND e.ts > s1.t_click
              THEN e.ts END) AS t_view
        FROM ev e JOIN s1 USING (user_id) GROUP BY 1, 2),
      s3 AS (
        SELECT e.user_id, s2.t_click, s2.t_view,
          MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t_view
              THEN e.ts END) AS t_purchase
        FROM ev e JOIN s2 USING (user_id) GROUP BY 1, 2, 3)
      SELECT user_id, t_click, t_view, t_purchase,
        CAST(CASE WHEN t_click IS NULL THEN 0
                  WHEN t_view IS NULL THEN 1
                  WHEN t_purchase IS NULL THEN 2
                  ELSE 3 END AS INT) AS stages_completed
      FROM s3 ORDER BY user_id""",

    "retention_cohorts" -> """
      WITH cohort AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY 1)
      SELECT c.cohort_week,
        CAST(floor(date_diff('day', CAST(c.cohort_week AS DATE),
                             CAST(e.ts AS DATE)) / 7.0) AS INT) AS week_offset,
        COUNT(DISTINCT e.user_id) AS n_users
      FROM events e JOIN cohort c USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2""",

    // EWMA closed form: w_1=(1-a)^(n-1), w_i=a(1-a)^(n-i); terms
    // snapped to 1e-9 then decimal-summed (the transcendental recipe)
    "ewma_trend" -> """
      WITH r AS (
        SELECT user_id, "value",
          row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
          COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events),
      t AS (
        -- (1 - 0.2), NOT the literal 0.8: the Spark side computes
        -- 1.0-alpha, which is one ulp BELOW the parsed 0.8 — the
        -- oracle must run the same subtraction to get the same bits
        SELECT user_id, n,
          CAST(round(CASE WHEN rn = 1 THEN power(1 - 0.2, n - 1)
                          ELSE 0.2 * power(1 - 0.2, n - rn) END * "value", 9)
               AS DECIMAL(22,9)) AS term
        FROM r)
      SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_events,
        round(CAST(SUM(term) AS DOUBLE), 6) + 0 AS ewma
      FROM t GROUP BY user_id ORDER BY user_id""",

    // exact-decimal moments: S1 (2dp) and S2 (4dp) sums are exact;
    // variance/std/z derive from identical IEEE trees; the filter
    // compares the ROUNDED z (boundary-safe)
    "events_anomaly" -> """
      WITH stats AS (
        SELECT user_id, COUNT(*) AS n,
          CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s1,
          CAST(SUM(CAST("value" * "value" AS DECIMAL(18,4))) AS DOUBLE) AS s2
        FROM events GROUP BY 1),
      st2 AS (
        SELECT user_id, s1 / n AS mean,
          s2 / n - (s1 / n) * (s1 / n) AS variance
        FROM stats),
      st3 AS (
        SELECT user_id, mean, sqrt(variance) AS std
        FROM st2 WHERE variance > 0)
      SELECT e.user_id, e.event_id,
        CAST(CAST(e."value" AS DECIMAL(18,2)) AS DOUBLE) AS "value",
        round((e."value" - s.mean) / s.std, 6) + 0 AS z
      FROM events e JOIN st3 s USING (user_id)
      WHERE abs(round((e."value" - s.mean) / s.std, 6)) > 3
      ORDER BY e.user_id, e.event_id""",

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

    // item-item CF: shared-user equi-join pairs, exact BIGINT
    // co-occurrence counts, ONE IEEE cosine snapped e6 (the ann
    // cos_e6 shape), rank ties broken by rec_item
    "recommend_collab" -> raw"""
      WITH inter AS (
        SELECT DISTINCT user_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item
        FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM inter GROUP BY item),
      pairs AS (
        SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS c
        FROM inter a JOIN inter b
          ON a.user_id = b.user_id AND a.item < b.item
        GROUP BY 1, 2),
      sym AS (SELECT i, j, c FROM pairs
              UNION ALL SELECT j AS i, i AS j, c FROM pairs),
      scored AS (
        SELECT s.i AS item, s.j AS rec_item, s.c AS shared_users,
          CAST(floor(CAST(s.c AS DOUBLE) /
            (sqrt(CAST(ni.n AS DOUBLE)) * sqrt(CAST(nj.n AS DOUBLE))) * 1e6
            + 0.5) AS BIGINT) AS cos_e6
        FROM sym s JOIN cnt ni ON ni.item = s.i JOIN cnt nj ON nj.item = s.j),
      ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY item
          ORDER BY cos_e6 DESC, rec_item) AS INT) AS rank
        FROM scored)
      SELECT item, rank, rec_item, shared_users, cos_e6
      FROM ranked WHERE rank <= 10 ORDER BY item, rank""",

    // the capped ingestion form: per-user top-8 interactions in the
    // md5 order (hv asc, item asc — the digit-sum recipe on the same
    // "user:item" key recommend_eval's holdout uses), then the
    // identical CF chain — the d_u² skew guard, oracle-verified
    "recommend_capped" -> raw"""
      WITH inter0 AS (
        SELECT DISTINCT user_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item
        FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      hv AS (
        SELECT user_id, item,
          CAST(list_sum(list_transform(range(1, 9),
            k -> (strpos('0123456789abcdef',
                         md5(user_id || ':' || item)[k:k]) - 1)
                 * CAST(16 ** (8 - k) AS BIGINT))) AS BIGINT) AS hvv
        FROM inter0),
      inter AS (
        SELECT user_id, item FROM (
          SELECT user_id, item,
            row_number() OVER (PARTITION BY user_id
              ORDER BY hvv, item) AS rn
          FROM hv) WHERE rn <= 8),
      cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM inter GROUP BY item),
      pairs AS (
        SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS c
        FROM inter a JOIN inter b
          ON a.user_id = b.user_id AND a.item < b.item
        GROUP BY 1, 2),
      sym AS (SELECT i, j, c FROM pairs
              UNION ALL SELECT j AS i, i AS j, c FROM pairs),
      scored AS (
        SELECT s.i AS item, s.j AS rec_item, s.c AS shared_users,
          CAST(floor(CAST(s.c AS DOUBLE) /
            (sqrt(CAST(ni.n AS DOUBLE)) * sqrt(CAST(nj.n AS DOUBLE))) * 1e6
            + 0.5) AS BIGINT) AS cos_e6
        FROM sym s JOIN cnt ni ON ni.item = s.i JOIN cnt nj ON nj.item = s.j),
      ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY item
          ORDER BY cos_e6 DESC, rec_item) AS INT) AS rank
        FROM scored)
      SELECT item, rank, rec_item, shared_users, cos_e6
      FROM ranked WHERE rank <= 10 ORDER BY item, rank""",

    // first-order Markov next-item: consecutive engagement events per
    // user in (ts, event_id) order, self-loops dropped, top-5 next
    // per item by (count desc, next_item); prob = ONE IEEE division
    // of exact counts snapped e6
    "recommend_markov" -> raw"""
      WITH ev AS (
        SELECT user_id, ts, event_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
          AND regexp_extract(props, '"k":\s*(-?\d+)', 1) <> ''),
      sq AS (
        SELECT item,
          lead(item) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS next_item
        FROM ev),
      trans AS (
        SELECT item, next_item, CAST(count(*) AS BIGINT) AS c
        FROM sq WHERE next_item IS NOT NULL AND next_item <> item
        GROUP BY 1, 2),
      tot AS (SELECT item, CAST(SUM(c) AS BIGINT) AS tc FROM trans GROUP BY 1),
      ranked AS (
        SELECT t.item, t.next_item, t.c, o.tc,
          CAST(row_number() OVER (PARTITION BY t.item
            ORDER BY t.c DESC, t.next_item) AS INT) AS rank
        FROM trans t JOIN tot o USING (item))
      SELECT item, rank, next_item, c AS transitions,
        CAST(floor(CAST(c AS DOUBLE) / CAST(tc AS DOUBLE) * 1e6 + 0.5)
          AS BIGINT) AS prob_e6
      FROM ranked WHERE rank <= 5 ORDER BY item, rank""",

    // session-bounded Markov: the transition window partitions by
    // (user, calendar day) — the sequence family's skew guard — and
    // a transition requires gap <= 30 min to its successor; epoch_us
    // on the naive ts equals Spark's unix_micros under the UTC
    // session
    "recommend_markov_sessions" -> raw"""
      WITH ev AS (
        SELECT user_id, ts, event_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
          AND regexp_extract(props, '"k":\s*(-?\d+)', 1) <> ''),
      sq AS (
        SELECT item, ts,
          lead(item) OVER (PARTITION BY user_id, CAST(ts AS DATE)
            ORDER BY ts, event_id) AS next_item,
          lead(ts) OVER (PARTITION BY user_id, CAST(ts AS DATE)
            ORDER BY ts, event_id) AS next_ts
        FROM ev),
      trans AS (
        SELECT item, next_item, CAST(count(*) AS BIGINT) AS c
        FROM sq WHERE next_item IS NOT NULL AND next_item <> item
          AND epoch_us(next_ts) - epoch_us(ts) <= 1800000000
        GROUP BY 1, 2),
      tot AS (SELECT item, CAST(SUM(c) AS BIGINT) AS tc FROM trans GROUP BY 1),
      ranked AS (
        SELECT t.item, t.next_item, t.c, o.tc,
          CAST(row_number() OVER (PARTITION BY t.item
            ORDER BY t.c DESC, t.next_item) AS INT) AS rank
        FROM trans t JOIN tot o USING (item))
      SELECT item, rank, next_item, c AS transitions,
        CAST(floor(CAST(c AS DOUBLE) / CAST(tc AS DOUBLE) * 1e6 + 0.5)
          AS BIGINT) AS prob_e6
      FROM ranked WHERE rank <= 5 ORDER BY item, rank""",

    // stationary distribution of the browsing chain — weighted
    // pagerank over transitions, 10 unrolled iterations
    "markov_stationary" -> markovStationaryOracleSql(10),

    // cold-start content fallback: the 10 coldest catalog items by
    // total co-occurrence support (ties by item), each with its
    // exact cosine top-5 over CATALOG item embeddings (the
    // ann_bruteforce recipe)
    "recommend_cold_start" -> raw"""
      WITH inter AS (
        SELECT DISTINCT user_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item
        FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      pairs AS (
        SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS c
        FROM inter a JOIN inter b
          ON a.user_id = b.user_id AND a.item < b.item
        GROUP BY 1, 2),
      sym AS (SELECT i, j, c FROM pairs
              UNION ALL SELECT j AS i, i AS j, c FROM pairs),
      catalog AS (SELECT DISTINCT item FROM inter),
      warm AS (SELECT i AS item, CAST(SUM(c) AS BIGINT) AS w
               FROM sym GROUP BY 1),
      cold AS (
        SELECT c.item, CAST(COALESCE(w.w, 0) AS BIGINT) AS warmth
        FROM catalog c LEFT JOIN warm w ON w.item = c.item
        ORDER BY warmth, c.item LIMIT 10),
      q AS (SELECT c.item AS query_id, c.warmth, e.embedding AS qvec
            FROM cold c JOIN embeddings e ON e.vec_id = c.item),
      cand AS (SELECT e.vec_id AS neighbor_id, e.embedding AS nvec
               FROM embeddings e JOIN catalog ct ON ct.item = e.vec_id),
      scored AS (
        SELECT q.query_id, q.warmth, c.neighbor_id,
          round(list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
                                       CAST(c.nvec AS DOUBLE[])), 6)
            AS cos_sim
        FROM cand c CROSS JOIN q WHERE c.neighbor_id <> q.query_id)
      SELECT query_id AS item, warmth, rank, neighbor_id AS rec_item,
        cos_sim
      FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
        FROM scored)
      WHERE rank <= 5 ORDER BY item, rank""",

    // coverage/concentration audit of the CF top-10 lists: distinct
    // recommended items vs catalog (ppm) + the exact-integer gini of
    // recommendation frequency (f ranked asc, ties by item — equal-f
    // permutations leave the weighted sum unchanged)
    "recommend_coverage" -> raw"""
      WITH inter AS (
        SELECT DISTINCT user_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item
        FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM inter GROUP BY item),
      pairs AS (
        SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS c
        FROM inter a JOIN inter b
          ON a.user_id = b.user_id AND a.item < b.item
        GROUP BY 1, 2),
      sym AS (SELECT i, j, c FROM pairs
              UNION ALL SELECT j AS i, i AS j, c FROM pairs),
      scored AS (
        SELECT s.i AS item, s.j AS rec_item,
          CAST(floor(CAST(s.c AS DOUBLE) /
            (sqrt(CAST(ni.n AS DOUBLE)) * sqrt(CAST(nj.n AS DOUBLE))) * 1e6
            + 0.5) AS BIGINT) AS cos_e6
        FROM sym s JOIN cnt ni ON ni.item = s.i JOIN cnt nj ON nj.item = s.j),
      rk AS (
        SELECT rec_item FROM (
          SELECT item, rec_item, CAST(row_number() OVER (PARTITION BY item
            ORDER BY cos_e6 DESC, rec_item) AS INT) AS rank
          FROM scored) WHERE rank <= 10),
      freq AS (SELECT rec_item, CAST(COUNT(*) AS BIGINT) AS f
               FROM rk GROUP BY 1),
      ranked AS (
        SELECT f, CAST(row_number() OVER (ORDER BY f, rec_item)
          AS BIGINT) AS i
        FROM freq),
      ag AS (SELECT CAST(SUM(f) AS BIGINT) AS s,
               CAST(SUM(i * f) AS BIGINT) AS wf,
               CAST(COUNT(*) AS BIGINT) AS m
             FROM ranked),
      cat AS (SELECT CAST(COUNT(DISTINCT item) AS BIGINT) AS cn FROM inter)
      SELECT cat.cn AS catalog_items, ag.m AS recommended_items,
        CAST(ag.m * 1000000 // cat.cn AS BIGINT) AS coverage_ppm,
        CAST((2 * ag.wf - (ag.m + 1) * ag.s) * 1000000 // (ag.m * ag.s)
          AS BIGINT) AS gini_ppm
      FROM ag, cat""",

    // preference pairs: per user, cross-level item pairs (purchase >
    // click > view; level = max engagement) after the deterministic
    // md5-order per-user cap (the capInteractions guard — the
    // digit-sum hv recipe, ties by item, rn <= 8)
    "preference_pairs" -> raw"""
      WITH ev AS (
        SELECT user_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item,
          CASE event_type WHEN 'purchase' THEN 3 WHEN 'click' THEN 2
            ELSE 1 END AS level
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
          AND regexp_extract(props, '"k":\s*(-?\d+)', 1) <> ''),
      leveled AS (
        SELECT user_id, item, CAST(MAX(level) AS INT) AS level
        FROM ev GROUP BY 1, 2),
      hv AS (
        SELECT user_id, item, level,
          CAST(list_sum(list_transform(range(1, 9),
            k -> (strpos('0123456789abcdef',
                         md5(user_id || ':' || item)[k:k]) - 1)
                 * CAST(16 ** (8 - k) AS BIGINT))) AS BIGINT) AS hvv
        FROM leveled),
      capped AS (
        SELECT user_id, item, level FROM (
          SELECT user_id, item, level,
            row_number() OVER (PARTITION BY user_id
              ORDER BY hvv, item) AS rn
          FROM hv) WHERE rn <= 8)
      SELECT a.user_id, a.item AS chosen_item, a.level AS chosen_level,
        b.item AS rejected_item, b.level AS rejected_level,
        CAST(a.level - b.level AS INT) AS margin
      FROM capped a JOIN capped b
        ON a.user_id = b.user_id AND a.level > b.level
      ORDER BY a.user_id, chosen_item, rejected_item""",

    // SECOND-order Markov: ((prev2, prev1) -> next) counts via two
    // leads over the same per-user sequence window, next = prev1
    // self-loops dropped, top-5 per context pair, prob = within-
    // context share as one IEEE division snapped e6
    "recommend_markov2" -> raw"""
      WITH ev AS (
        SELECT user_id, ts, event_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
          AND regexp_extract(props, '"k":\s*(-?\d+)', 1) <> ''),
      sq AS (
        SELECT item,
          lead(item, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS p1,
          lead(item, 2) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS nx
        FROM ev),
      trans AS (
        SELECT item AS prev2_item, p1 AS prev1_item, nx AS next_item,
          CAST(count(*) AS BIGINT) AS c
        FROM sq WHERE nx IS NOT NULL AND nx <> p1
        GROUP BY 1, 2, 3),
      tot AS (SELECT prev2_item, prev1_item, CAST(SUM(c) AS BIGINT) AS tc
              FROM trans GROUP BY 1, 2),
      ranked AS (
        SELECT t.prev2_item, t.prev1_item, t.next_item, t.c, o.tc,
          CAST(row_number() OVER (PARTITION BY t.prev2_item, t.prev1_item
            ORDER BY t.c DESC, t.next_item) AS INT) AS rank
        FROM trans t JOIN tot o USING (prev2_item, prev1_item))
      SELECT prev2_item, prev1_item, rank, next_item, c AS transitions,
        CAST(floor(CAST(c AS DOUBLE) / CAST(tc AS DOUBLE) * 1e6 + 0.5)
          AS BIGINT) AS prob_e6
      FROM ranked WHERE rank <= 5
      ORDER BY prev2_item, prev1_item, rank""",

    // leave-LAST-out order-2 backtest WITH strict backoff: hold each
    // >=4-event user's final event, train both orders on the prefix,
    // serve through order 2 when the exact (prev2, prev1) context
    // was trained, else back off to order 1 from prev1
    "recommend_markov2_eval" -> raw"""
      WITH ev AS (
        SELECT user_id, ts, event_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item,
          row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rdesc,
          COUNT(*) OVER (PARTITION BY user_id) AS n_ev
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
          AND regexp_extract(props, '"k":\s*(-?\d+)', 1) <> ''),
      held AS (SELECT user_id, item AS held_item FROM ev
               WHERE rdesc = 1 AND n_ev >= 4),
      c1 AS (SELECT user_id, item AS ctx1_item FROM ev
             WHERE rdesc = 2 AND n_ev >= 4),
      c2 AS (SELECT user_id, item AS ctx2_item FROM ev
             WHERE rdesc = 3 AND n_ev >= 4),
      trev AS (SELECT user_id, ts, event_id, item FROM ev
               WHERE rdesc > 1 OR n_ev < 4),
      s2 AS (
        SELECT item,
          lead(item, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS p1,
          lead(item, 2) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS nx
        FROM trev),
      m2 AS (
        SELECT item AS prev2_item, p1 AS prev1_item, nx AS next_item,
          CAST(count(*) AS BIGINT) AS c
        FROM s2 WHERE nx IS NOT NULL AND nx <> p1
        GROUP BY 1, 2, 3),
      r2 AS (
        SELECT prev2_item, prev1_item, next_item,
          CAST(row_number() OVER (PARTITION BY prev2_item, prev1_item
            ORDER BY c DESC, next_item) AS INT) AS rank2
        FROM m2),
      cs AS (SELECT DISTINCT prev2_item, prev1_item FROM m2),
      s1 AS (
        SELECT item, lead(item) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS next_item
        FROM trev),
      m1 AS (
        SELECT item, next_item, CAST(count(*) AS BIGINT) AS c
        FROM s1 WHERE next_item IS NOT NULL AND next_item <> item
        GROUP BY 1, 2),
      r1 AS (
        SELECT item, next_item,
          CAST(row_number() OVER (PARTITION BY item
            ORDER BY c DESC, next_item) AS INT) AS rank1
        FROM m1)
      SELECT h.user_id, c2.ctx2_item, c1.ctx1_item, h.held_item,
        CAST(CASE WHEN cs.prev2_item IS NOT NULL THEN 2 ELSE 1 END
          AS INT) AS used_order,
        CAST(CASE WHEN cs.prev2_item IS NOT NULL THEN COALESCE(r2.rank2, 0)
             ELSE COALESCE(r1.rank1, 0) END AS INT) AS rank,
        (CASE WHEN cs.prev2_item IS NOT NULL THEN COALESCE(r2.rank2, 0)
              ELSE COALESCE(r1.rank1, 0) END) BETWEEN 1 AND 5 AS hit
      FROM held h JOIN c1 USING (user_id) JOIN c2 USING (user_id)
      LEFT JOIN cs ON cs.prev2_item = c2.ctx2_item
                  AND cs.prev1_item = c1.ctx1_item
      LEFT JOIN r2 ON r2.prev2_item = c2.ctx2_item
                  AND r2.prev1_item = c1.ctx1_item
                  AND r2.next_item = h.held_item
      LEFT JOIN r1 ON r1.item = c1.ctx1_item
                  AND r1.next_item = h.held_item
      ORDER BY h.user_id""",

    // hybrid RRF fusion of the CF and Markov rankings — the search
    // tier's exact rrf recipe (1/(60+rank) snapped 1e-9, decimal sum,
    // 6 dp, re-rank with candidate tie-break) on recommendation lists
    "recommend_hybrid" -> recommendHybridOracleSql("1"),

    // the WEIGHTED fusion gate: identical body with the CF term
    // down-weighted to the binary-exact literal 0.75
    "recommend_hybrid_wrrf" -> recommendHybridOracleSql("0.75"),

    // leave-LAST-out HYBRID backtest: hold each >=3-event user's
    // final event, train BOTH signals on the prefix, fuse the user's
    // depth-cut CF vote list and Markov next-item list via the exact
    // rrf recipe, and report the held item's rank in each list (0 =
    // absent) plus its fused rank and hit@5
    "recommend_hybrid_eval" -> raw"""
      WITH ev AS (
        SELECT user_id, ts, event_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item,
          row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rdesc,
          COUNT(*) OVER (PARTITION BY user_id) AS n_ev
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
          AND regexp_extract(props, '"k":\s*(-?\d+)', 1) <> ''),
      held AS (SELECT user_id, item AS held_item FROM ev
               WHERE rdesc = 1 AND n_ev >= 3),
      ctx AS (SELECT user_id, item AS ctx_item FROM ev
              WHERE rdesc = 2 AND n_ev >= 3),
      trev AS (SELECT user_id, ts, event_id, item FROM ev
               WHERE rdesc > 1 OR n_ev < 3),
      train AS (SELECT DISTINCT user_id, item FROM trev),
      cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS n
              FROM train GROUP BY item),
      pairs AS (
        SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS c
        FROM train a JOIN train b
          ON a.user_id = b.user_id AND a.item < b.item
        GROUP BY 1, 2),
      sym AS (SELECT i, j, c FROM pairs
              UNION ALL SELECT j AS i, i AS j, c FROM pairs),
      sims AS (
        SELECT s.i AS item, s.j AS rec_item,
          CAST(floor(CAST(s.c AS DOUBLE) /
            (sqrt(CAST(ni.n AS DOUBLE)) * sqrt(CAST(nj.n AS DOUBLE))) * 1e6
            + 0.5) AS BIGINT) AS cos_e6
        FROM sym s JOIN cnt ni ON ni.item = s.i JOIN cnt nj ON nj.item = s.j),
      votes AS (
        SELECT t.user_id, s.rec_item,
          CAST(SUM(s.cos_e6) AS BIGINT) AS score_e6
        FROM train t JOIN sims s ON s.item = t.item
        JOIN held h ON h.user_id = t.user_id
        GROUP BY 1, 2),
      cand AS (
        SELECT v.user_id, v.rec_item, v.score_e6 FROM votes v
        LEFT JOIN train t
          ON t.user_id = v.user_id AND t.item = v.rec_item
        WHERE t.user_id IS NULL),
      cfl AS (
        SELECT user_id AS query_id, rec_item AS doc_id, rank FROM (
          SELECT user_id, rec_item,
            CAST(row_number() OVER (PARTITION BY user_id
              ORDER BY score_e6 DESC, rec_item) AS INT) AS rank
          FROM cand) WHERE rank <= 10),
      msq AS (
        SELECT item, lead(item) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS next_item
        FROM trev),
      mtr AS (
        SELECT item, next_item, CAST(count(*) AS BIGINT) AS c
        FROM msq WHERE next_item IS NOT NULL AND next_item <> item
        GROUP BY 1, 2),
      mrk AS (
        SELECT item, next_item,
          CAST(row_number() OVER (PARTITION BY item
            ORDER BY c DESC, next_item) AS INT) AS rank
        FROM mtr),
      mkl AS (
        SELECT c.user_id AS query_id, m.next_item AS doc_id, m.rank
        FROM ctx c JOIN mrk m ON m.item = c.ctx_item
        WHERE m.rank <= 10),
      rrl AS (
        SELECT query_id, doc_id,
          CAST(round(CAST(1 AS DOUBLE) / CAST(60 + rank AS DOUBLE), 9)
               AS DECIMAL(13,9)) AS c
        FROM cfl
        UNION ALL
        SELECT query_id, doc_id,
          CAST(round(CAST(1 AS DOUBLE) / CAST(60 + rank AS DOUBLE), 9)
               AS DECIMAL(13,9)) AS c
        FROM mkl),
      fused AS (
        SELECT query_id, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS rrf
        FROM rrl GROUP BY 1, 2),
      frk AS (
        SELECT query_id, doc_id,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY rrf DESC, doc_id) AS INT) AS rank
        FROM fused)
      SELECT h.user_id, c.ctx_item, h.held_item,
        CAST(COALESCE(cf.rank, 0) AS INT) AS cf_rank,
        CAST(COALESCE(mk.rank, 0) AS INT) AS mk_rank,
        CAST(COALESCE(f.rank, 0) AS INT) AS rank,
        COALESCE(f.rank, 0) BETWEEN 1 AND 5 AS hit
      FROM held h JOIN ctx c USING (user_id)
      LEFT JOIN cfl cf
        ON cf.query_id = h.user_id AND cf.doc_id = h.held_item
      LEFT JOIN mkl mk
        ON mk.query_id = h.user_id AND mk.doc_id = h.held_item
      LEFT JOIN frk f
        ON f.query_id = h.user_id AND f.doc_id = h.held_item
      ORDER BY h.user_id""",

    // leave-LAST-out Markov backtest: hold each >=3-event user's
    // chronologically final event, retrain transitions on the prefix
    // (shorter users' full histories still train), rank the held
    // item among the context's trained candidates
    "recommend_markov_eval" -> raw"""
      WITH ev AS (
        SELECT user_id, ts, event_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item,
          row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rdesc,
          COUNT(*) OVER (PARTITION BY user_id) AS n_ev
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
          AND regexp_extract(props, '"k":\s*(-?\d+)', 1) <> ''),
      held AS (SELECT user_id, item AS held_item FROM ev
               WHERE rdesc = 1 AND n_ev >= 3),
      ctx AS (SELECT user_id, item AS ctx_item FROM ev
              WHERE rdesc = 2 AND n_ev >= 3),
      tr AS (
        SELECT item, lead(item) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS next_item
        FROM ev WHERE rdesc > 1 OR n_ev < 3),
      model AS (
        SELECT item, next_item, CAST(count(*) AS BIGINT) AS c
        FROM tr WHERE next_item IS NOT NULL AND next_item <> item
        GROUP BY 1, 2),
      ranked AS (
        SELECT item AS ctx_item, next_item AS held_item,
          CAST(row_number() OVER (PARTITION BY item
            ORDER BY c DESC, next_item) AS INT) AS rank
        FROM model)
      SELECT h.user_id, c.ctx_item, h.held_item,
        CAST(COALESCE(r.rank, 0) AS INT) AS rank,
        COALESCE(r.rank, 0) BETWEEN 1 AND 5 AS hit
      FROM held h JOIN ctx c USING (user_id)
      LEFT JOIN ranked r
        ON r.ctx_item = c.ctx_item AND r.held_item = h.held_item
      ORDER BY h.user_id""",

    // leave-last-out CF backtest: held item = max(item) per >=2-item
    // user, model retrained on the carve, held rank among unseen
    // candidates (0 = no co-occurrence path), hit = rank in top-5
    "recommend_eval" -> raw"""
      WITH inter AS (
        SELECT DISTINCT user_id,
          CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS item
        FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      hv AS (
        SELECT user_id, item,
          CAST(list_sum(list_transform(range(1, 9),
            k -> (strpos('0123456789abcdef',
                         md5(user_id || ':' || item)[k:k]) - 1)
                 * CAST(16 ** (8 - k) AS BIGINT))) AS BIGINT) AS hvv
        FROM inter),
      hvr AS (
        SELECT user_id, item,
          COUNT(*) OVER (PARTITION BY user_id) AS n_items,
          row_number() OVER (PARTITION BY user_id
            ORDER BY hvv DESC, item DESC) AS rn
        FROM hv),
      held AS (
        SELECT user_id, item AS held_item
        FROM hvr WHERE rn = 1 AND n_items >= 2),
      train AS (
        SELECT i.user_id, i.item FROM inter i
        LEFT JOIN held h ON h.user_id = i.user_id AND h.held_item = i.item
        WHERE h.user_id IS NULL),
      cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS n
              FROM train GROUP BY item),
      pairs AS (
        SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS c
        FROM train a JOIN train b
          ON a.user_id = b.user_id AND a.item < b.item
        GROUP BY 1, 2),
      sym AS (SELECT i, j, c FROM pairs
              UNION ALL SELECT j AS i, i AS j, c FROM pairs),
      sims AS (
        SELECT s.i AS item, s.j AS rec_item,
          CAST(floor(CAST(s.c AS DOUBLE) /
            (sqrt(CAST(ni.n AS DOUBLE)) * sqrt(CAST(nj.n AS DOUBLE))) * 1e6
            + 0.5) AS BIGINT) AS cos_e6
        FROM sym s JOIN cnt ni ON ni.item = s.i JOIN cnt nj ON nj.item = s.j),
      votes AS (
        SELECT t.user_id, s.rec_item,
          CAST(SUM(s.cos_e6) AS BIGINT) AS score_e6
        FROM train t JOIN sims s ON s.item = t.item
        GROUP BY 1, 2),
      cand AS (
        SELECT v.user_id, v.rec_item, v.score_e6 FROM votes v
        LEFT JOIN train t
          ON t.user_id = v.user_id AND t.item = v.rec_item
        WHERE t.user_id IS NULL),
      ranked AS (
        SELECT user_id, rec_item,
          CAST(row_number() OVER (PARTITION BY user_id
            ORDER BY score_e6 DESC, rec_item) AS INT) AS rank
        FROM cand)
      SELECT h.user_id, h.held_item,
        CAST(COALESCE(r.rank, 0) AS INT) AS rank,
        COALESCE(r.rank, 0) BETWEEN 1 AND 5 AS hit
      FROM held h LEFT JOIN ranked r
        ON r.user_id = h.user_id AND r.rec_item = h.held_item
      ORDER BY h.user_id""",

    // Holt-Winters: the integer recurrence replayed as a recursive
    // CTE carrying (l, b, seasonal LIST) state — one step per day per
    // series, lateral aliases sequence lnew→bnew→snew, floor division
    // via the exactly-divisible (a - pmod(a,d)) // d form (operands
    // go negative through the trend)
    "holt_winters" -> (holtWintersCtes + """
      SELECT event_type, CAST(r AS BIGINT) AS r, y,
        CAST(fitted AS BIGINT) AS fitted_e6
      FROM (SELECT event_type, r, y, fitted FROM hw WHERE r >= 8
            UNION ALL SELECT * FROM fc)
      ORDER BY event_type, r"""),

    // the damped-trend (φ = 9/10) variant: the same recurrence with
    // the trend floored through 9b//10 at every use and the
    // geometric-damp forecast (chained d1..d7 lateral aliases)
    "holt_winters_damped" -> (holtWintersDampedCtes + """
      SELECT event_type, CAST(r AS BIGINT) AS r, y,
        CAST(fitted AS BIGINT) AS fitted_e6
      FROM (SELECT event_type, r, y, fitted FROM hw WHERE r >= 8
            UNION ALL SELECT * FROM fc)
      ORDER BY event_type, r"""),

    // the multiplicative-seasonality variant: seasonal RATIOS in e6
    // units, deseasonalize by ratio division, refit by ratio
    // multiplication — same readout as holt_winters
    "holt_winters_mul" -> (hwMulCtesBody(0) + """
      SELECT event_type, CAST(r AS BIGINT) AS r, y,
        CAST(fitted AS BIGINT) AS fitted_e6
      FROM (SELECT event_type, r, y, fitted FROM hw WHERE r >= 8
            UNION ALL SELECT * FROM fc)
      ORDER BY event_type, r"""),

    // the multiplicative backtest: the forecast_eval readout over
    // the ratio recurrence — one body, fit and backtest cannot drift
    "forecast_mul_eval" -> (hwMulCtesBody(7) + """,
      ev AS (
        SELECT s.event_type, CAST(s.r - s.n AS BIGINT) AS h, s.y,
          CAST(f.fitted AS BIGINT) AS forecast_e6,
          ABS(s.y * 1000000 - f.fitted) AS ae
        FROM seq s JOIN fc f
          ON f.event_type = s.event_type AND f.r = s.r),
      maeh AS (
        SELECT h, CAST(SUM(ae) // COUNT(*) AS BIGINT) AS mae_e6
        FROM ev GROUP BY h)
      SELECT e.event_type, e.h, e.y, e.forecast_e6,
        CAST(e.ae AS BIGINT) AS ae_e6, m.mae_e6
      FROM ev e JOIN maeh m USING (h)
      ORDER BY e.event_type, e.h"""),

    // model selection over the seasonal family: all THREE recurrence
    // chains (additive a_, damped d_, multiplicative m_) side by
    // side in one recursive with-list via prefixed CTE names; per
    // series the total absolute holdout error per mode and the
    // arg-min pick (ties prefer the simpler model: additive, then
    // damped)
    "forecast_model_select" -> ("\n      WITH RECURSIVE" +
      hwCtesList(7, damped = false, "a_") + "," +
      hwCtesList(7, damped = true, "d_") + "," +
      hwMulCtesList(7, "m_") + """,
      aev AS (
        SELECT s.event_type, ABS(s.y * 1000000 - f.fitted) AS ae
        FROM a_seq s JOIN a_fc f
          ON f.event_type = s.event_type AND f.r = s.r),
      dev AS (
        SELECT s.event_type, ABS(s.y * 1000000 - f.fitted) AS ae
        FROM d_seq s JOIN d_fc f
          ON f.event_type = s.event_type AND f.r = s.r),
      mev AS (
        SELECT s.event_type, ABS(s.y * 1000000 - f.fitted) AS ae
        FROM m_seq s JOIN m_fc f
          ON f.event_type = s.event_type AND f.r = s.r),
      asum AS (SELECT event_type, CAST(SUM(ae) AS BIGINT) AS sae_add_e6
               FROM aev GROUP BY 1),
      dsum AS (SELECT event_type, CAST(SUM(ae) AS BIGINT) AS sae_damped_e6
               FROM dev GROUP BY 1),
      msum AS (SELECT event_type, CAST(SUM(ae) AS BIGINT) AS sae_mul_e6
               FROM mev GROUP BY 1)
      SELECT a.event_type, a.sae_add_e6, d.sae_damped_e6, m.sae_mul_e6,
        CASE WHEN a.sae_add_e6 <= d.sae_damped_e6
              AND a.sae_add_e6 <= m.sae_mul_e6 THEN 'additive'
             WHEN d.sae_damped_e6 <= m.sae_mul_e6 THEN 'damped'
             ELSE 'mul' END AS best
      FROM asum a JOIN dsum d USING (event_type)
      JOIN msum m USING (event_type)
      ORDER BY a.event_type"""),

    // the HW chain's residual monitor: resid and the mean-absolute
    // scale stay BIGINT end to end (non-negative sums, so // == div)
    "forecast_anomaly" -> (holtWintersCtes + """,
      fit AS (
        SELECT event_type, r, y, fitted, y * 1000000 - fitted AS resid
        FROM hw WHERE r >= 8),
      marr AS (
        SELECT event_type,
          CAST(SUM(ABS(resid)) // COUNT(*) AS BIGINT) AS mar
        FROM fit GROUP BY event_type)
      SELECT f.event_type, CAST(f.r AS BIGINT) AS r, f.y,
        CAST(f.fitted AS BIGINT) AS fitted_e6,
        CAST(f.resid AS BIGINT) AS resid_e6, m.mar AS mar_e6,
        ABS(f.resid) > 3 * m.mar AS is_anomaly
      FROM fit f JOIN marr m USING (event_type)
      ORDER BY f.event_type, f.r"""),

    // the decomposition readout: the hw rows already carry the
    // post-update state — level/trend direct, seasonal = the slot
    // the step just updated
    "forecast_decompose" -> (holtWintersCtes + """
      SELECT event_type, CAST(r AS BIGINT) AS r, y,
        CAST(l AS BIGINT) AS level_e6, CAST(b AS BIGINT) AS trend_e6,
        CAST(s[CAST((r - 1) % 7 + 1 AS INT)] AS BIGINT) AS seasonal_e6
      FROM hw WHERE r >= 8 ORDER BY event_type, r"""),

    // prediction intervals: each forecast row ± the series' exact
    // 95th-percentile |residual| ELEMENT (rank (95n+99)//100 over
    // (|resid|, r) — the ccnet element-not-interpolation discipline),
    // all BIGINT e6
    "forecast_intervals" -> (holtWintersCtes + intervalBandCtes + """
      SELECT f.event_type, CAST(f.r AS BIGINT) AS r,
        CAST(f.fitted AS BIGINT) AS fitted_e6,
        CAST(f.fitted - b.band_e6 AS BIGINT) AS lo_e6,
        CAST(f.fitted + b.band_e6 AS BIGINT) AS hi_e6
      FROM fc f JOIN band b USING (event_type)
      ORDER BY f.event_type, f.r"""),

    // the interval BACKTEST: bands from the TRAIN fit's residuals
    // only (the same exact-element selection), held-out actuals
    // checked against [lo, hi] — per-horizon coverage honesty
    "forecast_intervals_eval" -> (holtWintersCtesOver(7) + intervalBandCtes + """
      SELECT s.event_type, CAST(s.r - s.n AS BIGINT) AS h, s.y,
        CAST(f.fitted AS BIGINT) AS fitted_e6,
        CAST(f.fitted - b.band_e6 AS BIGINT) AS lo_e6,
        CAST(f.fitted + b.band_e6 AS BIGINT) AS hi_e6,
        s.y * 1000000 BETWEEN f.fitted - b.band_e6
          AND f.fitted + b.band_e6 AS covered
      FROM seq s JOIN fc f
        ON f.event_type = s.event_type AND f.r = s.r
      JOIN band b ON b.event_type = s.event_type
      ORDER BY s.event_type, h"""),

    // the backtest readout: the recurrence trains on seq MINUS the
    // 7-day holdout (tr), fc forecasts the held-out ranks, and the
    // full seq supplies the actuals — h = r − n, MAE per horizon an
    // exact floor division
    "forecast_eval" -> (holtWintersCtesOver(7) + """,
      ev AS (
        SELECT s.event_type, CAST(s.r - s.n AS BIGINT) AS h, s.y,
          CAST(f.fitted AS BIGINT) AS forecast_e6,
          ABS(s.y * 1000000 - f.fitted) AS ae
        FROM seq s JOIN fc f
          ON f.event_type = s.event_type AND f.r = s.r),
      maeh AS (
        SELECT h, CAST(SUM(ae) // COUNT(*) AS BIGINT) AS mae_e6
        FROM ev GROUP BY h)
      SELECT e.event_type, e.h, e.y, e.forecast_e6,
        CAST(e.ae AS BIGINT) AS ae_e6, m.mae_e6
      FROM ev e JOIN maeh m USING (h)
      ORDER BY e.event_type, e.h"""),

    // the damped backtest: the SAME holdout readout over the damped
    // recurrence body — fit mode and backtest mode cannot drift
    "forecast_damped_eval" -> (hwCtesBody(7, damped = true) + """,
      ev AS (
        SELECT s.event_type, CAST(s.r - s.n AS BIGINT) AS h, s.y,
          CAST(f.fitted AS BIGINT) AS forecast_e6,
          ABS(s.y * 1000000 - f.fitted) AS ae
        FROM seq s JOIN fc f
          ON f.event_type = s.event_type AND f.r = s.r),
      maeh AS (
        SELECT h, CAST(SUM(ae) // COUNT(*) AS BIGINT) AS mae_e6
        FROM ev GROUP BY h)
      SELECT e.event_type, e.h, e.y, e.forecast_e6,
        CAST(e.ae AS BIGINT) AS ae_e6, m.mae_e6
      FROM ev e JOIN maeh m USING (h)
      ORDER BY e.event_type, e.h"""),

    "q18_stream_tumbling" -> """
      SELECT date_trunc('hour', ts) AS window_start, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2 ORDER BY window_start, event_type""",


    "q22_above_avg" -> """
      SELECT p_partkey, p_brand, p_retailprice FROM part p
      WHERE p_retailprice > (
        SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM part p2 WHERE p2.p_brand = p.p_brand)
      ORDER BY p_partkey""",

    "curate_corpus" -> """
      WITH docs AS (
        SELECT doc_id, lang, text FROM documents
        UNION ALL SELECT doc_id + 100000, lang, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, lang, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50),
      keepers AS (
        SELECT MIN(doc_id) AS doc_id FROM docs GROUP BY md5(text)),
      t AS (
        SELECT d.doc_id, d.lang, d.text,
          list_filter(string_split_regex(lower(d.text), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM docs d JOIN keepers k ON d.doc_id = k.doc_id),
      stats AS (
        SELECT doc_id, lang,
          CAST(len(toks) AS INT) AS n_tokens,
          CAST(length(text) AS INT) AS n_chars,
          CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
            / length(text) AS punct_ratio,
          CAST(len(list_filter(toks,
            x -> x IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE)
            / len(toks) AS stopword_ratio
        FROM t),
      q AS (
        SELECT *, CASE WHEN n_tokens < 5 THEN 0.0
                       ELSE 1.0 - punct_ratio * 2.0 - abs(stopword_ratio - 0.4)
                  END AS quality_score
        FROM stats)
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM q WHERE quality_score > 0.2
      GROUP BY lang ORDER BY lang""",

    "q19_asof" -> """
      WITH p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'),
      c AS (SELECT event_id AS click_id, ts, user_id FROM events WHERE event_type = 'click')
      SELECT p.event_id, p.user_id, p.ts, c.click_id
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id""",

    "q20_percentiles" -> """
      SELECT event_type, COUNT(*) AS n,
        round(quantile_cont(value, 0.5), 6) AS p50,
        round(quantile_cont(value, 0.9), 6) AS p90,
        round(quantile_cont(value, 0.99), 6) AS p99
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q21_pivot" -> """
      SELECT CAST(ts AS DATE) AS day,
        COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
      FROM events GROUP BY 1 ORDER BY day""",

    "dedup_exact" -> """
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50)
      SELECT md5(text) AS content_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_id
      FROM docs GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY keeper_id""",

    "dedup_containment" -> """
      WITH docs AS (
        SELECT doc_id, lang, text FROM documents
        UNION ALL SELECT doc_id + 300000, lang,
          array_to_string(list_slice(string_split_regex(text, '\s+'), 1, 30),
                          ' ')
        FROM documents WHERE doc_id < 25),
      tok AS (
        SELECT doc_id, lang,
          list_filter(string_split_regex(lower(text), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM docs),
      sh AS (
        SELECT DISTINCT doc_id, lang,
          unnest(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM tok WHERE len(toks) >= 3),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      shared AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
                           AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT * FROM (
        SELECT d1, d2, shared, n1.n_sh AS n1, n2.n_sh AS n2,
          round(CAST(shared AS DOUBLE) / n1.n_sh, 6) AS c_d1,
          round(CAST(shared AS DOUBLE) / n2.n_sh, 6) AS c_d2
        FROM shared JOIN sizes n1 ON n1.doc_id = d1
                    JOIN sizes n2 ON n2.doc_id = d2)
      WHERE greatest(c_d1, c_d2) >= 0.8
      ORDER BY d1, d2""",

    "dedup_ngram_jaccard" -> """
      WITH docs AS (
        SELECT doc_id, lang, text FROM documents
        UNION ALL SELECT doc_id + 100000, lang, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, lang, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50),
      tok AS (
        SELECT doc_id, lang,
          list_filter(string_split_regex(lower(text), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM docs),
      sh AS (
        SELECT DISTINCT doc_id, lang,
          unnest(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM tok WHERE len(toks) >= 3),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      shared AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
                           AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT d1, d2, shared,
        CAST(shared AS DOUBLE) / (n1.n_sh + n2.n_sh - shared) AS jaccard
      FROM shared JOIN sizes n1 ON n1.doc_id = d1 JOIN sizes n2 ON n2.doc_id = d2
      WHERE CAST(shared AS DOUBLE) / (n1.n_sh + n2.n_sh - shared) >= 0.5
      ORDER BY d1, d2""",

    "dedup_minhash" -> s"""
      WITH $minhashCtes
      SELECT d1, d2 FROM mh_pairs ORDER BY d1, d2""",

    // Jaccard-space top-k lookup: the banded candidates (mh_pairs,
    // replayed) reranked by EXACT 3-shingle jaccard — one IEEE
    // division of exact integers (the q8 unrounded class), ranks on
    // identical doubles with doc_id tie-break
    "jaccard_topk" -> s"""
      WITH $minhashCtes,
      qc AS (SELECT d1 AS q_id, d2 AS doc_id FROM mh_pairs WHERE d1 < 50
             UNION ALL
             SELECT d2, d1 FROM mh_pairs WHERE d2 < 50),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      shr AS (SELECT qc.q_id, qc.doc_id, COUNT(*) AS shared
              FROM qc
              JOIN sh a ON a.doc_id = qc.q_id
              JOIN sh b ON b.doc_id = qc.doc_id AND b.shingle = a.shingle
              GROUP BY 1, 2),
      rk AS (SELECT shr.q_id, shr.doc_id, shr.shared,
               CAST(shr.shared AS DOUBLE)
                 / (n1.n_sh + n2.n_sh - shr.shared) AS jaccard,
               CAST(row_number() OVER (PARTITION BY shr.q_id ORDER BY
                 CAST(shr.shared AS DOUBLE)
                   / (n1.n_sh + n2.n_sh - shr.shared) DESC, shr.doc_id)
                 AS INT) AS rank
             FROM shr
             JOIN sizes n1 ON n1.doc_id = shr.q_id
             JOIN sizes n2 ON n2.doc_id = shr.doc_id)
      SELECT q_id, rank, doc_id, shared, jaccard
      FROM rk WHERE rank <= 5 ORDER BY q_id, rank""",

    // corpus ids are < 100000 and the planted "arriving batch" ids
    // are >= 100000, so the batch-vs-corpus join is exactly the
    // cross-boundary slice of the band collisions
    "dedup_incremental" -> s"""
      WITH $minhashCtes
      SELECT d1 AS corpus_id, d2 AS batch_id FROM mh_pairs
      WHERE d1 < 100000 AND d2 >= 100000
      ORDER BY corpus_id, batch_id""",

    // line-level corpus dedup: lines materialized in-query (10-token
    // groups + deterministic boilerplate plants), keyed by the
    // 60-bit md5 digit-sum, first (doc,idx) occurrence kept, rebuilt
    // text hash-verified; string_agg skips the NULLed removed lines
    "dedup_lines" -> raw"""
      WITH t AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> length(x) > 0) AS toks
        FROM documents),
      lf AS (
        SELECT doc_id, toks,
          unnest(range(0, (len(toks) + 9) // 10)) AS j
        FROM t),
      content AS (
        SELECT doc_id, CAST(j AS BIGINT) AS idx,
          array_to_string(toks[(j*10+1):(j*10+10)], ' ') AS line
        FROM lf),
      lines AS (
        SELECT * FROM content
        UNION ALL
        SELECT doc_id, CAST(1000000 AS BIGINT),
               'subscribe to our newsletter today'
        FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id, CAST(1000001 AS BIGINT),
               'follow us on social media now'
        FROM documents WHERE doc_id % 11 = 0),
      k AS (
        SELECT doc_id, idx, line,
          CAST(list_sum(list_transform(range(1, 16),
            kk -> CAST((strpos('0123456789abcdef', md5(line)[kk:kk]) - 1)
                 * CAST(16 ** (15 - kk) AS BIGINT) AS BIGINT))) AS BIGINT) AS h
        FROM lines),
      flag AS (
        -- keep-first = lexicographic (doc_id, idx) min per hash — the
        -- same rule the Spark side's min(struct(doc_id, idx)) applies
        -- (the packed doc_id*2e6+idx key this replaced silently broke
        -- past 2M lines/doc and overflowed on large doc_id spaces)
        SELECT doc_id, idx, line,
          (COUNT(*) OVER (PARTITION BY h) = 1 OR
           row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) = 1)
            AS kept
        FROM k)
      SELECT doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_lines,
        CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
        md5(COALESCE(string_agg(CASE WHEN kept THEN line END, chr(10)
                                ORDER BY idx), '')) AS out_md5
      FROM flag GROUP BY doc_id ORDER BY doc_id""",

    // winnowing (MOSS): 24-char k-gram 60-bit hashes, window-8
    // rightmost-min selection (MIN then MAX(off) among the min),
    // distinct (doc, h) fingerprints, pair join on the hash
    "dedup_winnow" -> """
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50),
      w AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS off, md5(text[i:i+23]) AS hh
        FROM (SELECT doc_id, text, unnest(range(1, length(text) - 22)) AS i
              FROM docs WHERE length(text) >= 24)),
      k AS (
        SELECT doc_id, off,
          CAST(list_sum(list_transform(range(1, 16),
            kk -> CAST((strpos('0123456789abcdef', hh[kk:kk]) - 1)
                 * CAST(16 ** (15 - kk) AS BIGINT) AS BIGINT))) AS BIGINT) AS h
        FROM w),
      st AS (SELECT doc_id, COUNT(*) AS nh FROM k GROUP BY 1),
      memb AS (
        SELECT k.doc_id, CAST(u.p AS BIGINT) AS p, k.off, k.h
        FROM k JOIN st USING (doc_id),
             unnest(range(greatest(k.off - 7, 0),
                          least(k.off, st.nh - 8) + 1)) AS u(p)
        WHERE st.nh >= 8
        UNION ALL
        SELECT k.doc_id, 0, k.off, k.h
        FROM k JOIN st USING (doc_id) WHERE st.nh < 8),
      sel AS (SELECT doc_id, p, MIN(h) AS mh FROM memb GROUP BY 1, 2),
      fp AS (
        SELECT DISTINCT m.doc_id, m.h
        FROM memb m JOIN sel s
          ON m.doc_id = s.doc_id AND m.p = s.p AND m.h = s.mh),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      SELECT doc_a, doc_b, n_shared FROM pairs
      ORDER BY doc_a, doc_b""",

    "dedup_spans" -> """
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50),
      w AS (
        SELECT doc_id,
          unnest(list_transform(range(1, length(text) - 30),
            i -> md5(text[i:i+31]))) AS h
        FROM docs WHERE length(text) >= 32),
      k AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(range(1, 16),
            kk -> CAST((strpos('0123456789abcdef', h[kk:kk]) - 1)
                 * CAST(16 ** (15 - kk) AS BIGINT) AS BIGINT))) AS BIGINT)
            AS span_hash
        FROM w)
      SELECT span_hash,
        COUNT(DISTINCT doc_id) AS n_docs,
        COUNT(*) AS n_occurrences,
        MIN(doc_id) AS keeper_id
      FROM k GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
      ORDER BY span_hash""",

    // content-defined chunking: a cut after every 16-char window
    // whose 60-bit hash ≡ 0 (mod 64); chunk hash = same hash60 of the
    // chunk slice; duplicate chunks joined back at full decomposition
    // detail. hash60 is the dedup_spans digit-sum pattern, applied
    // once to pick cuts and once to key chunks
    "dedup_chunks" -> """
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50),
      wpos AS (
        SELECT doc_id, text, unnest(range(1, length(text) - 14)) AS i
        FROM docs WHERE length(text) >= 16),
      cuts AS (
        SELECT doc_id, i + 15 AS e
        FROM wpos
        WHERE CAST(list_sum(list_transform(range(1, 16),
            kk -> CAST((strpos('0123456789abcdef', md5(text[i:i+15])[kk:kk]) - 1)
                 * CAST(16 ** (15 - kk) AS BIGINT) AS BIGINT))) AS BIGINT)
              % 64 = 0),
      ends AS (
        SELECT doc_id, e FROM cuts
        UNION SELECT doc_id, length(text) AS e FROM docs),
      ch AS (
        SELECT doc_id, e,
          COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS st0,
          row_number() OVER (PARTITION BY doc_id ORDER BY e) - 1 AS chunk_idx
        FROM ends),
      chunks AS (
        SELECT c.doc_id,
          CAST(c.chunk_idx AS INT) AS chunk_idx,
          CAST(c.st0 AS INT) AS chunk_start,
          CAST(c.e - c.st0 AS INT) AS chunk_len,
          CAST(list_sum(list_transform(range(1, 16),
            kk -> CAST((strpos('0123456789abcdef',
                   md5(d.text[c.st0 + 1 : c.e])[kk:kk]) - 1)
                 * CAST(16 ** (15 - kk) AS BIGINT) AS BIGINT))) AS BIGINT)
            AS chunk_hash
        FROM ch c JOIN docs d USING (doc_id)),
      dups AS (
        SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs
        FROM chunks GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2)
      SELECT c.doc_id, c.chunk_idx, c.chunk_start, c.chunk_len,
        c.chunk_hash, u.n_docs
      FROM chunks c JOIN dups u USING (chunk_hash)
      ORDER BY c.doc_id, c.chunk_idx""",

    // chunk-granular excision: same decomposition as dedup_chunks,
    // keeper = first (doc_id, chunk_idx) per hash via window rank,
    // per-doc reassembly of kept slices with '~' seams
    "dedup_chunks_excise" -> """
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50),
      wpos AS (
        SELECT doc_id, text, unnest(range(1, length(text) - 14)) AS i
        FROM docs WHERE length(text) >= 16),
      cuts AS (
        SELECT doc_id, i + 15 AS e
        FROM wpos
        WHERE CAST(list_sum(list_transform(range(1, 16),
            kk -> CAST((strpos('0123456789abcdef', md5(text[i:i+15])[kk:kk]) - 1)
                 * CAST(16 ** (15 - kk) AS BIGINT) AS BIGINT))) AS BIGINT)
              % 64 = 0),
      ends AS (
        SELECT doc_id, e FROM cuts
        UNION SELECT doc_id, length(text) AS e FROM docs),
      ch AS (
        SELECT doc_id, e,
          COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS st0,
          row_number() OVER (PARTITION BY doc_id ORDER BY e) - 1 AS chunk_idx
        FROM ends),
      chunks AS (
        SELECT c.doc_id,
          CAST(c.chunk_idx AS INT) AS chunk_idx,
          CAST(c.st0 AS INT) AS chunk_start,
          CAST(c.e - c.st0 AS INT) AS chunk_len,
          CAST(list_sum(list_transform(range(1, 16),
            kk -> CAST((strpos('0123456789abcdef',
                   md5(d.text[c.st0 + 1 : c.e])[kk:kk]) - 1)
                 * CAST(16 ** (15 - kk) AS BIGINT) AS BIGINT))) AS BIGINT)
            AS chunk_hash
        FROM ch c JOIN docs d USING (doc_id)),
      marked AS (
        SELECT *, (row_number() OVER (PARTITION BY chunk_hash
                    ORDER BY doc_id, chunk_idx) = 1) AS kept
        FROM chunks)
      SELECT m.doc_id,
        CAST(COUNT(*) AS INT) AS n_chunks,
        CAST(COUNT(CASE WHEN NOT kept THEN 1 END) AS INT) AS n_excised,
        string_agg(CASE WHEN kept
                     THEN substr(d.text, chunk_start + 1, chunk_len)
                     ELSE '~' END, '' ORDER BY chunk_idx) AS excised_text
      FROM marked m JOIN docs d USING (doc_id)
      GROUP BY m.doc_id
      ORDER BY m.doc_id""",

    // same 60-bit window hashes as dedup_spans, WITH offsets; islands
    // coalesce overlapping/adjacent repeated windows (ends are
    // offset+32, monotone, so lag(off) decides breaks); the surgery
    // joins kept pieces with '~' — pieces via substr (never slicing,
    // which misbehaves on empty ranges), tail piece at ord=2^31-1
    "dedup_spans_excise" -> """
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50),
      w AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS off, md5(text[i:i+31]) AS h
        FROM (SELECT doc_id, text, unnest(range(1, length(text) - 30)) AS i
              FROM docs WHERE length(text) >= 32)),
      k AS (
        SELECT doc_id, off,
          CAST(list_sum(list_transform(range(1, 16),
            kk -> CAST((strpos('0123456789abcdef', h[kk:kk]) - 1)
                 * CAST(16 ** (15 - kk) AS BIGINT) AS BIGINT))) AS BIGINT)
            AS span_hash
        FROM w),
      rep AS (
        SELECT span_hash FROM k
        GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2),
      hit AS (SELECT doc_id, off FROM k JOIN rep USING (span_hash)),
      fl AS (
        SELECT doc_id, off,
          CASE WHEN lag(off) OVER win IS NULL
                 OR off > lag(off) OVER win + 32 THEN 1 ELSE 0 END AS brk
        FROM hit WINDOW win AS (PARTITION BY doc_id ORDER BY off)),
      isl AS (
        SELECT doc_id, off,
          SUM(brk) OVER (PARTITION BY doc_id ORDER BY off) AS grp
        FROM fl),
      iv AS (
        SELECT doc_id, grp, MIN(off) AS s, MAX(off) + 32 AS e
        FROM isl GROUP BY 1, 2),
      pc AS (
        SELECT doc_id, s, e,
          COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS pe
        FROM iv),
      parts AS (
        SELECT p.doc_id, p.s AS ord, substr(d.text, CAST(p.pe + 1 AS INT),
          CAST(p.s - p.pe AS INT)) AS piece
        FROM pc p JOIN docs d USING (doc_id)
        UNION ALL
        SELECT t.doc_id, 2147483647 AS ord,
          substr(d.text, CAST(t.le + 1 AS INT)) AS piece
        FROM (SELECT doc_id, MAX(e) AS le FROM iv GROUP BY 1) t
        JOIN docs d USING (doc_id)),
      agg AS (
        SELECT doc_id, string_agg(piece, '~' ORDER BY ord) AS excised_text
        FROM parts GROUP BY doc_id),
      rem AS (
        SELECT doc_id, CAST(COUNT(*) AS INT) AS n_intervals,
          CAST(SUM(e - s) AS INT) AS chars_removed
        FROM iv GROUP BY 1)
      SELECT d.doc_id,
        COALESCE(rem.n_intervals, 0) AS n_intervals,
        COALESCE(rem.chars_removed, 0) AS chars_removed,
        COALESCE(agg.excised_text, d.text) AS excised_text
      FROM docs d
      LEFT JOIN rem USING (doc_id)
      LEFT JOIN agg USING (doc_id)
      ORDER BY d.doc_id""",

    // batch-vs-corpus slice of the window-hash space: the corpus side
    // reduces to a (span_hash, min keeper) index, the batch's window
    // stream joins it — one row per corpus-known hash seen in the batch
    "dedup_spans_incremental" -> """
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50),
      w AS (
        SELECT doc_id, md5(text[i:i+31]) AS h
        FROM (SELECT doc_id, text, unnest(range(1, length(text) - 30)) AS i
              FROM docs WHERE length(text) >= 32)),
      k AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(range(1, 16),
            kk -> CAST((strpos('0123456789abcdef', h[kk:kk]) - 1)
                 * CAST(16 ** (15 - kk) AS BIGINT) AS BIGINT))) AS BIGINT)
            AS span_hash
        FROM w),
      cidx AS (
        SELECT span_hash, MIN(doc_id) AS keeper_id
        FROM k WHERE doc_id < 100000 GROUP BY span_hash)
      SELECT span_hash, keeper_id,
        COUNT(DISTINCT b.doc_id) AS n_batch_docs,
        COUNT(*) AS n_batch_occurrences
      FROM (SELECT * FROM k WHERE doc_id >= 100000) b
      JOIN cidx USING (span_hash)
      GROUP BY span_hash, keeper_id
      ORDER BY span_hash""",

    // seed-and-extend replayed in SQL: window matches per doc pair lie
    // on a constant alignment diagonal (o1 - o2); islands of
    // CONSECUTIVE o1 per (d1, d2, diag) — gap 1, not the excise
    // query's spanLen — are exactly the maximal shared substrings
    "dedup_spans_maximal" -> """
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50),
      w AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS off, md5(text[i:i+31]) AS h
        FROM (SELECT doc_id, text, unnest(range(1, length(text) - 30)) AS i
              FROM docs WHERE length(text) >= 32)),
      k AS (
        SELECT doc_id, off,
          CAST(list_sum(list_transform(range(1, 16),
            kk -> CAST((strpos('0123456789abcdef', h[kk:kk]) - 1)
                 * CAST(16 ** (15 - kk) AS BIGINT) AS BIGINT))) AS BIGINT)
            AS span_hash
        FROM w),
      m AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, a.off AS o1,
          a.off - b.off AS diag
        FROM k a JOIN k b
          ON a.span_hash = b.span_hash AND a.doc_id < b.doc_id),
      fl AS (
        SELECT d1, d2, o1, diag,
          CASE WHEN lag(o1) OVER win IS NULL
                 OR o1 <> lag(o1) OVER win + 1 THEN 1 ELSE 0 END AS brk
        FROM m WINDOW win AS (PARTITION BY d1, d2, diag ORDER BY o1)),
      isl AS (
        SELECT d1, d2, o1, diag,
          SUM(brk) OVER (PARTITION BY d1, d2, diag ORDER BY o1) AS grp
        FROM fl)
      SELECT d1, d2, MIN(o1) AS off1,
        CAST(MIN(o1) - diag AS INT) AS off2,
        CAST(MAX(o1) - MIN(o1) + 32 AS INT) AS match_len
      FROM isl GROUP BY d1, d2, diag, grp
      ORDER BY d1, d2, off1, off2""",

    "curate_neardup" -> s"""
      WITH RECURSIVE $minhashCtes,
      edges AS (
        SELECT d1 AS u, d2 AS v FROM mh_pairs
        UNION ALL SELECT d2, d1 FROM mh_pairs),
      reach(node, root) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node),
      losers AS (
        SELECT node AS doc_id FROM (
          SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node)
        WHERE node <> cluster_id),
      t AS (
        SELECT d.doc_id, d.lang, d.text,
          list_filter(string_split_regex(lower(d.text), '\\s+'),
                      x -> length(x) > 0) AS toks2
        FROM docs d WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)),
      stats AS (
        SELECT doc_id, lang,
          CAST(len(toks2) AS INT) AS n_tokens,
          CAST(length(text) AS INT) AS n_chars,
          CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
            / length(text) AS punct_ratio,
          CAST(len(list_filter(toks2,
            x -> x IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE)
            / len(toks2) AS stopword_ratio
        FROM t),
      q AS (
        SELECT *, CASE WHEN n_tokens < 5 THEN 0.0
                       ELSE 1.0 - punct_ratio * 2.0 - abs(stopword_ratio - 0.4)
                  END AS quality_score
        FROM stats)
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM q WHERE quality_score > 0.2
      GROUP BY lang ORDER BY lang""",

    // keeper by quality (argmax quality_score, ties min id) over the
    // same CC clusters — the production keeper policy
    "dedup_keep_best" -> s"""
      WITH RECURSIVE $minhashCtes,
      edges AS (
        SELECT d1 AS u, d2 AS v FROM mh_pairs
        UNION ALL SELECT d2, d1 FROM mh_pairs),
      reach(node, root) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node),
      cc AS (SELECT node AS doc_id, MIN(root) AS cluster_id
             FROM reach GROUP BY node),
      m AS (
        SELECT t.doc_id,
          CAST(len(t.toks) AS INT) AS n_tokens,
          CAST(length(d.text) AS INT) AS n_chars,
          CAST(length(d.text) - length(regexp_replace(d.text, '[^a-zA-Z0-9\\s]', '', 'g')) AS INT) AS n_punct,
          CAST(len(list_filter(t.toks,
            x -> x IN ('the','a','of','and','to','in','is','on'))) AS INT) AS n_stop
        FROM tok t JOIN docs d USING (doc_id)),
      q AS (
        SELECT doc_id,
          CASE WHEN n_tokens < 5 THEN 0.0
               ELSE 1.0 - (CAST(n_punct AS DOUBLE) / n_chars) * 2.0
                    - abs(CAST(n_stop AS DOUBLE) / n_tokens - 0.4) END AS quality_score
        FROM m),
      ranked AS (
        SELECT cc.cluster_id, cc.doc_id, q.quality_score,
          row_number() OVER (PARTITION BY cc.cluster_id
            ORDER BY q.quality_score DESC, cc.doc_id) AS rn
        FROM cc JOIN q USING (doc_id))
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
        MAX(CASE WHEN rn = 1 THEN doc_id END) AS keeper_id,
        MAX(CASE WHEN rn = 1 THEN quality_score END) AS keeper_quality
      FROM ranked GROUP BY cluster_id ORDER BY cluster_id""",

    "dedup_clusters" -> ccOracleSql,

    // soft dedup: the cc chain + cluster sizes + a left join back to
    // the planted corpus; w_ppm = exact integer floor-division
    "dedup_soft" -> s"""
      WITH RECURSIVE $minhashCtes,
      edges AS (
        SELECT d1 AS u, d2 AS v FROM mh_pairs
        UNION ALL SELECT d2, d1 FROM mh_pairs),
      reach(node, root) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node),
      cc AS (SELECT node AS doc_id, MIN(root) AS cluster_id
             FROM reach GROUP BY node),
      sizes AS (SELECT cluster_id, COUNT(*) AS csize FROM cc GROUP BY 1)
      SELECT dd.doc_id,
        COALESCE(cc.cluster_id, dd.doc_id) AS cluster_id,
        COALESCE(sizes.csize, 1) AS csize,
        1000000 // COALESCE(sizes.csize, 1) AS w_ppm
      FROM (SELECT doc_id FROM docs) dd
      LEFT JOIN cc USING (doc_id)
      LEFT JOIN sizes ON sizes.cluster_id = cc.cluster_id
      ORDER BY dd.doc_id""",
    // the star-contraction algorithm must produce the exact same
    // component labels — one oracle, two implementations under test
    "dedup_clusters_star" -> ccOracleSql,

    "dedup_simhash" -> """
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50),
      tokmult AS (
        SELECT doc_id,
          unnest(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> length(x) > 0)) AS tok
        FROM docs),
      th AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(range(1, 16),
            k -> CAST((strpos('0123456789abcdef', md5(tok)[k:k]) - 1)
                 * CAST(16 ** (15 - k) AS BIGINT) AS BIGINT))) AS BIGINT) AS hv
        FROM tokmult),
      bits AS (
        SELECT doc_id, j,
          SUM(CASE WHEN (hv >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM th CROSS JOIN range(0, 60) r(j) GROUP BY 1, 2),
      sig AS (
        SELECT doc_id,
          CAST(SUM(CASE WHEN s > 0 THEN CAST(2 ** j AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY 1),
      chunks AS (
        SELECT doc_id, simhash, ci, (simhash >> CAST(ci * 15 AS INT)) & 32767 AS cv
        FROM sig CROSS JOIN range(0, 4) c(ci)),
      pairs AS (
        SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
          x.simhash AS sx, y.simhash AS sy
        FROM chunks x JOIN chunks y
          ON x.ci = y.ci AND x.cv = y.cv AND x.doc_id < y.doc_id)
      SELECT d1, d2, CAST(bit_count(xor(sx, sy)) AS INT) AS hamming
      FROM pairs WHERE bit_count(xor(sx, sy)) <= 3
      ORDER BY d1, d2""",

    // Hamming-ball top-k over the same simhash reconstruction: the
    // oracle brute-forces every (query, corpus) pair — the banding
    // guarantee (no false negatives within the budget) makes the
    // Spark side's equi-join candidates identical inside the radius
    "hamming_topk" -> """
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25
        UNION ALL SELECT doc_id + 100000, text || ' zz qq' FROM documents
          WHERE doc_id >= 25 AND doc_id < 50),
      tokmult AS (
        SELECT doc_id,
          unnest(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> length(x) > 0)) AS tok
        FROM docs),
      th AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(range(1, 16),
            k -> CAST((strpos('0123456789abcdef', md5(tok)[k:k]) - 1)
                 * CAST(16 ** (15 - k) AS BIGINT) AS BIGINT))) AS BIGINT) AS hv
        FROM tokmult),
      bits AS (
        SELECT doc_id, j,
          SUM(CASE WHEN (hv >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM th CROSS JOIN range(0, 60) r(j) GROUP BY 1, 2),
      sig AS (
        SELECT doc_id,
          CAST(SUM(CASE WHEN s > 0 THEN CAST(2 ** j AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY 1),
      q AS (SELECT doc_id AS q_id, simhash AS qs FROM sig WHERE doc_id < 50),
      pr AS (SELECT q.q_id, s.doc_id,
               CAST(bit_count(xor(q.qs, s.simhash)) AS INT) AS hamming
             FROM q JOIN sig s ON s.doc_id <> q.q_id),
      rk AS (SELECT q_id, doc_id, hamming,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY hamming, doc_id) AS INT) AS rank
             FROM pr WHERE hamming <= 3)
      SELECT q_id, rank, doc_id, hamming FROM rk WHERE rank <= 5
      ORDER BY q_id, rank""",

    // the decoded plane (pixel (x,y) = text byte (y*w+x) mod L — the
    // multimodal_meta recipe), 11×6 nearest-neighbor downscale and
    // horizontal-gradient bits are all integer arithmetic; banding
    // replayed as the 4×15 pigeonhole (same exact final pair set as
    // the Spark side's C(6,3) — banding geometries are result-equal)
    "dedup_phash" -> s"""
      WITH $phashCtes
      SELECT d1, d2, hamming FROM ph_pairs ORDER BY d1, d2""",

    // image hamming top-k: the sig CTE's integer dHash replay +
    // brute-force xor/bit_count inside the radius (banding is exact
    // within the ball, so the oracle needs no banding at all)
    "phash_topk" -> s"""
      WITH $phashCtes,
      q AS (SELECT doc_id AS q_id, phash AS qp FROM sig WHERE doc_id < 50),
      pr AS (SELECT q.q_id, s.doc_id,
               CAST(bit_count(xor(q.qp, s.phash)) AS INT) AS hamming
             FROM q JOIN sig s ON s.doc_id <> q.q_id),
      rk AS (SELECT q_id, doc_id, hamming,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY hamming, doc_id) AS INT) AS rank
             FROM pr WHERE hamming <= 3)
      SELECT q_id, rank, doc_id, hamming FROM rk WHERE rank <= 5
      ORDER BY q_id, rank""",

    // batch-vs-corpus slice of the same banded hamming space: plants
    // (ids >= 96000) are the arriving batch, originals the corpus —
    // ph_pairs orients d1 < d2, so the cross-set pairs are exactly the
    // rows straddling the boundary
    "dedup_phash_incremental" -> s"""
      WITH $phashCtes
      SELECT d1 AS corpus_id, d2 AS batch_id, hamming FROM ph_pairs
      WHERE d1 < 96000 AND d2 >= 96000
      ORDER BY corpus_id, batch_id""",

    // the image analog of dedup_clusters: recursive reachability over
    // the ph_pairs edge set, component id = min reachable doc_id
    "dedup_phash_clusters" -> s"""
      WITH RECURSIVE $phashCtes,
      edges AS (
        SELECT d1 AS u, d2 AS v FROM ph_pairs
        UNION ALL SELECT d2, d1 FROM ph_pairs),
      reach(node, root) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node)
      SELECT node AS doc_id, MIN(root) AS cluster_id
      FROM reach GROUP BY node ORDER BY doc_id""",

    "dedup_emb_cosine" -> """
      SELECT a.vec_id AS v1, b.vec_id AS v2,
        round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
      ORDER BY v1, v2""",

    // same planes/codes CTE as ann_lsh, used as a DEDUP blocking key:
    // candidate = collision in ANY table, verified by exact cosine
    "dedup_emb_lsh" -> s"""
      WITH $embLshCtes
      SELECT v1, v2, cos_sim FROM emb_pairs ORDER BY v1, v2""",

    // batch-vs-corpus slice of the same LSH code space: x restricted
    // to the 80% corpus split, y to the 20% batch (vec_id % 5)
    "dedup_emb_incremental" -> s"""
      WITH planes(tid, pid, p) AS (VALUES
        ${operators.Similarity.planesSqlValues}),
      codes AS (
        SELECT vec_id, tid,
          CAST(SUM(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), p) >= 0
                        THEN 1 << pid ELSE 0 END) AS INT) AS code
        FROM embeddings CROSS JOIN planes GROUP BY vec_id, tid),
      cand AS (
        SELECT DISTINCT x.vec_id AS corpus_id, y.vec_id AS batch_id
        FROM codes x JOIN codes y ON x.tid = y.tid AND x.code = y.code
        WHERE x.vec_id % 5 <> 4 AND y.vec_id % 5 = 4),
      rer AS (
        SELECT cand.corpus_id, cand.batch_id,
          round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM cand
        JOIN embeddings a ON a.vec_id = cand.corpus_id
        JOIN embeddings b ON b.vec_id = cand.batch_id)
      SELECT corpus_id, batch_id, cos_sim FROM rer WHERE cos_sim >= 0.35
      ORDER BY corpus_id, batch_id""",

    // the embedding analog of dedup_clusters: recursive reachability
    // over the emb_pairs edge set, component id = min reachable vec_id
    "dedup_emb_clusters" -> s"""
      WITH RECURSIVE $embLshCtes,
      edges AS (
        SELECT v1 AS u, v2 AS v FROM emb_pairs
        UNION ALL SELECT v2, v1 FROM emb_pairs),
      reach(node, root) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node)
      SELECT node AS vec_id, MIN(root) AS cluster_id
      FROM reach GROUP BY node ORDER BY vec_id""",

    "ann_bruteforce" -> """
      WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
                 FROM embeddings WHERE vec_id < 10),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
          round(list_cosine_similarity(CAST(qvec AS DOUBLE[]),
                                       CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> query_id)
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
        FROM scored)
      WHERE rank <= 5 ORDER BY query_id, rank""",

    // prefix (Matryoshka) tier: shortlist by cosine over the first 32
    // dims (same rounded-6dp + id tie-break recipe on sliced arrays),
    // exact full-dim rerank of the bounded shortlist
    "ann_prefix" -> """
      WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
                 FROM embeddings WHERE vec_id < 10),
      pre AS (
        SELECT query_id, e.vec_id AS neighbor_id, e.embedding AS nvec, qvec,
          round(list_cosine_similarity(CAST(qvec[1:32] AS DOUBLE[]),
                CAST(e.embedding[1:32] AS DOUBLE[])), 6) AS pc
        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> query_id),
      short AS (
        SELECT query_id, neighbor_id, nvec, qvec FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY pc DESC, neighbor_id) AS pr
          FROM pre)
        WHERE pr <= 400),
      scored AS (
        SELECT query_id, neighbor_id,
          round(list_cosine_similarity(CAST(qvec AS DOUBLE[]),
                                       CAST(nvec AS DOUBLE[])), 6) AS cos_sim
        FROM short)
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
        FROM scored)
      WHERE rank <= 5 ORDER BY query_id, rank""",

    // SQ8: per-dim min/max grid retrained in SQL (order-independent
    // exact aggregates), symmetric quantize→dequantize→cosine replay
    "ann_sq8" -> """
      WITH idx AS (
        SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS i),
      stats AS (
        SELECT i, MIN(CAST(embedding[i] AS DOUBLE)) AS mn,
               MAX(CAST(embedding[i] AS DOUBLE)) AS mx
        FROM embeddings, idx GROUP BY i),
      grid AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM stats),
      dq AS (
        SELECT vec_id,
          list_transform(range(1, len(embedding) + 1),
            i -> CASE WHEN mxs[i] > mns[i]
                 THEN mns[i] + CAST(CAST(round((CAST(embedding[i] AS DOUBLE) - mns[i]) * 255.0
                        / (mxs[i] - mns[i])) AS INT) AS DOUBLE) * (mxs[i] - mns[i]) / 255.0
                 ELSE mns[i] END) AS v
        FROM embeddings, grid),
      q AS (SELECT vec_id AS query_id, v AS qv FROM dq WHERE vec_id < 10),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
          round(list_cosine_similarity(qv, e.v), 6) AS cos_sim
        FROM dq e CROSS JOIN q WHERE e.vec_id <> query_id)
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
        FROM scored)
      WHERE rank <= 5 ORDER BY query_id, rank""",

    "text_stats" -> """
      WITH t AS (
        SELECT doc_id, lang, text,
          list_filter(string_split_regex(lower(text), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM documents),
      m AS (
        SELECT doc_id, lang,
          CAST(len(toks) AS INT) AS n_tokens,
          CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]', 0)) AS INT) AS n_tokens_bpe,
          CAST(length(text) AS INT) AS n_chars,
          CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')) AS INT) AS n_punct,
          CAST(len(list_filter(toks,
            x -> x IN ('the','a','of','and','to','in','is','on'))) AS INT) AS n_stopwords
        FROM t),
      r AS (
        SELECT *, CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
          CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
          CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len
        FROM m)
      SELECT doc_id, lang, n_tokens, n_tokens_bpe, n_chars, n_punct, n_stopwords,
        stopword_ratio, punct_ratio, avg_token_len,
        CASE WHEN n_tokens < 5 THEN 0.0
             ELSE 1.0 - punct_ratio * 2.0 - abs(stopword_ratio - 0.4) END AS quality_score
      FROM r ORDER BY doc_id""",

    "text_langid" -> """
      WITH t AS (
        SELECT doc_id, lang,
          list_filter(string_split_regex(lower(text), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM documents),
      h AS (
        SELECT doc_id, lang AS labeled_lang,
          CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS INT) AS hits_en,
          CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS INT) AS hits_de,
          CAST(len(list_filter(toks, x -> x IN ('el','la','los','que','es'))) AS INT) AS hits_es,
          CAST(len(list_filter(toks, x -> x IN ('le','les','des','est','et'))) AS INT) AS hits_fr
        FROM t)
      SELECT doc_id, labeled_lang, hits_en, hits_de, hits_es, hits_fr,
        CASE WHEN hits_en = 0 AND hits_de = 0 AND hits_es = 0 AND hits_fr = 0 THEN 'und'
             WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
             WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
             WHEN hits_es >= hits_fr THEN 'es'
             ELSE 'fr' END AS pred_lang
      FROM h ORDER BY doc_id""",

    // trained multinomial-NB language gate: the shared CTE chain
    // replays train (doc_id%5≠0) → exact-nanolog model → held-out
    // scoring → per-doc argmax; scores are exact BIGINTs in 1e-9
    // units, so the hash compare is integer-exact end to end
    "classify_nb" -> s"""
      WITH $nbCtes
      SELECT doc_id, label AS pred, CAST(score_e9 AS BIGINT) AS score_e9
      FROM pred WHERE r = 1 ORDER BY doc_id""",

    // confusion matrix of the same chain on the held-out carve
    "classify_nb_eval" -> s"""
      WITH $nbCtes
      SELECT d.lang AS label, p.label AS pred, COUNT(*) AS n
      FROM pred p JOIN d USING (doc_id)
      WHERE p.r = 1
      GROUP BY 1, 2 ORDER BY 1, 2""",

    // per-class precision/recall/F1 of the same chain: every metric
    // a rational of exact integers with ONE IEEE division (F1
    // collapses to 2·tp/(pred_n + true_n)), rounded 6 dp; all ≥ 0 so
    // no signed-zero wrap; never-predicted class pins precision 0
    "classify_nb_f1" -> s"""
      WITH $nbCtes,
      j AS (SELECT p.doc_id, p.label AS pred, d.lang AS label
            FROM pred p JOIN d USING (doc_id) WHERE p.r = 1),
      tn AS (SELECT label, COUNT(*) AS true_n,
               CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp
             FROM j GROUP BY 1),
      pn AS (SELECT pred AS label, COUNT(*) AS pred_n FROM j GROUP BY 1)
      SELECT tn.label, tn.tp,
        COALESCE(pn.pred_n, 0) AS pred_n, tn.true_n,
        CASE WHEN COALESCE(pn.pred_n, 0) > 0
             THEN round(CAST(tn.tp AS DOUBLE) / pn.pred_n, 6)
             ELSE CAST(0 AS DOUBLE) END AS prec,
        round(CAST(tn.tp AS DOUBLE) / tn.true_n, 6) AS rec,
        round(CAST(2 * tn.tp AS DOUBLE)
              / (COALESCE(pn.pred_n, 0) + tn.true_n), 6) AS f1
      FROM tn LEFT JOIN pn USING (label) ORDER BY tn.label""",

    // uncertainty sampling: margin = top1 − top2 NB score — a
    // difference of two exact BIGINT e9 scores (no rounding
    // anywhere); the 20 smallest margins win the labeling budget,
    // doc_id tie-break makes the cut deterministic
    "select_uncertain" -> s"""
      WITH $nbCtes,
      top2 AS (SELECT doc_id,
                 MAX(CASE WHEN r = 1 THEN label END) AS pred,
                 MAX(CASE WHEN r = 1 THEN score_e9 END) AS s1,
                 MAX(CASE WHEN r = 2 THEN score_e9 END) AS s2
               FROM pred WHERE r <= 2 GROUP BY doc_id)
      SELECT doc_id, pred, s1 - s2 AS margin_e9
      FROM top2 ORDER BY margin_e9, doc_id LIMIT 20""",

    // hard-negative mining: the classify_knn brute-force cos_e6
    // chain with the cross-label filter inside the pair set and a
    // rank cut instead of the vote
    "mine_hard_negatives" -> """
      WITH e AS (SELECT vec_id, label,
                   list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS c
                 FROM embeddings),
      qs AS (SELECT vec_id, label AS qlabel, c,
               CAST(list_sum(list_transform(c, x -> x * x)) AS BIGINT) AS qn
             FROM e WHERE vec_id % 10 = 0),
      ts AS (SELECT vec_id, label, c,
               CAST(list_sum(list_transform(c, x -> x * x)) AS BIGINT) AS vn
             FROM e),
      pr AS (SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id, t.label,
               CAST(floor(CAST(list_sum(list_transform(range(1, len(q.c) + 1),
                      k -> q.c[k] * t.c[k])) AS DOUBLE) /
                 (sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(t.vn AS DOUBLE)))
                 * 1e6 + 0.5) AS BIGINT) AS cos_e6
             FROM qs q JOIN ts t ON t.label <> q.qlabel),
      rk AS (SELECT query_id, neighbor_id, label, cos_e6,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_e6 DESC, neighbor_id)
                    AS INT) AS rank
             FROM pr)
      SELECT query_id, rank, neighbor_id, label, cos_e6
      FROM rk WHERE rank <= 5 ORDER BY query_id, rank""",

    // greedy k-center: rounds unrolled as chained CTEs (static —
    // every pick derives from the data in-query, no artifact)
    "select_kcenter" -> Similarity.selectKcenterOracleSql(),
    "select_kcenter_assign" -> Similarity.selectKcenterAssignOracleSql(),

    // T5 span-corruption masks: the mask depends only on
    // (doc_id, token count) — starts where the 32-bit md5 prefix of
    // "doc:pos" (the minhash digit-sum recipe) ≡ 0 mod 20, covered
    // positions merge into islands via the pos − row_number group key
    "mask_spans" -> raw"""
      WITH t AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> length(x) > 0) AS toks
        FROM documents),
      pos AS (SELECT doc_id, len(toks) AS n,
                unnest(range(0, len(toks))) AS p
              FROM t WHERE len(toks) > 0),
      h AS (SELECT doc_id, n, p,
              CAST(list_sum(list_transform(range(1, 9),
                k -> (strpos('0123456789abcdef',
                             md5(doc_id || ':' || p)[k:k]) - 1)
                     * CAST(16 ** (8 - k) AS BIGINT))) AS BIGINT) AS hv
            FROM pos),
      starts AS (SELECT doc_id, n, p FROM h WHERE hv % 20 = 0),
      covered AS (SELECT DISTINCT doc_id, p + i AS cp
                  FROM starts, (SELECT unnest([0, 1, 2]) AS i) off
                  WHERE p + i < n),
      isl AS (SELECT doc_id, cp,
                cp - row_number() OVER (PARTITION BY doc_id
                                        ORDER BY cp) AS grp
              FROM covered)
      SELECT doc_id, CAST(MIN(cp) AS BIGINT) AS span_start,
        CAST(COUNT(*) AS BIGINT) AS span_len
      FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""",

    // CCNet-distillation quality filter: the self-trained LM chain
    // labels the corpus by ppl tertile (the ccnet_buckets recipe),
    // the NB chain trains on head-vs-tail token counts (same
    // floor-snapped nanolog BIGINTs as classify_nb), and the final
    // log-odds is a DIFFERENCE of two exact integer scores — exact
    // end to end, keep = strictly positive
    "quality_nb" -> s"""
      WITH $qualityNbCtes
      SELECT doc_id,
        CAST(MAX(CASE WHEN label = 'head' THEN score_e9 END)
           - MAX(CASE WHEN label = 'tail' THEN score_e9 END) AS BIGINT)
          AS logodds_e9,
        (MAX(CASE WHEN label = 'head' THEN score_e9 END)
         > MAX(CASE WHEN label = 'tail' THEN score_e9 END)) AS keep
      FROM qsc GROUP BY doc_id ORDER BY doc_id""",

    // distillation fidelity: how the distilled keep verdict lands on
    // the LM tertiles themselves — the CCNet paper's own sanity
    // readout (head should mostly keep, tail mostly drop)
    "quality_nb_eval" -> s"""
      WITH $qualityNbCtes,
      kp AS (SELECT doc_id,
               (MAX(CASE WHEN label = 'head' THEN score_e9 END)
                > MAX(CASE WHEN label = 'tail' THEN score_e9 END)) AS keep
             FROM qsc GROUP BY doc_id)
      SELECT lab.label AS bucket, kp.keep, COUNT(*) AS n
      FROM kp JOIN lab USING (doc_id)
      GROUP BY 1, 2 ORDER BY 1, 2""",

    // Rocchio nearest-centroid over embeddings: coordinates snap to
    // 1e-6-unit BIGINTs, class SUMS replace means (cosine is
    // scale-invariant), the score is the ann_ivf_white cos_e6 scalar
    // chain on exact integers — the model retrains in SQL
    // (order-independent BIGINT sums, no artifact literal)
    "classify_centroid" -> """
      WITH e AS (SELECT vec_id, label,
                   list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS c
                 FROM embeddings),
      tr AS (SELECT label, unnest(c) AS cj, unnest(range(1, len(c) + 1)) AS j
             FROM e WHERE vec_id % 5 <> 0),
      ce AS (SELECT label, j, CAST(SUM(cj) AS BIGINT) AS s FROM tr GROUP BY 1, 2),
      cn AS (SELECT label, CAST(SUM(CAST(s AS HUGEINT) * s) AS BIGINT) AS sn
             FROM ce GROUP BY 1),
      te AS (SELECT vec_id, unnest(c) AS qj, unnest(range(1, len(c) + 1)) AS j
             FROM e WHERE vec_id % 5 = 0),
      qn AS (SELECT vec_id, CAST(SUM(CAST(qj AS HUGEINT) * qj) AS BIGINT) AS qn
             FROM te GROUP BY 1),
      dots AS (SELECT te.vec_id, ce.label,
                 CAST(SUM(CAST(te.qj AS HUGEINT) * ce.s) AS BIGINT) AS dot
               FROM te JOIN ce USING (j) GROUP BY 1, 2),
      scoredc AS (SELECT d.vec_id, d.label,
                   CAST(floor(CAST(d.dot AS DOUBLE) /
                     (sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(cn.sn AS DOUBLE)))
                     * 1e6 + 0.5) AS BIGINT) AS cos_e6
                 FROM dots d JOIN qn q USING (vec_id) JOIN cn USING (label)),
      p AS (SELECT vec_id, label, cos_e6,
              row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cos_e6 DESC, label) AS r
            FROM scoredc)
      SELECT vec_id, label AS pred, cos_e6 FROM p WHERE r = 1
      ORDER BY vec_id""",

    // kNN vote: the oracle brute-forces every (test, train) pair —
    // the Spark side's exhaustive-probe bucket join is result-
    // identical (each pair meets exactly once; centroids only shape
    // the join), so no artifact literal is needed
    "classify_knn" -> """
      WITH e AS (SELECT vec_id, label,
                   list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS c
                 FROM embeddings),
      qs AS (SELECT vec_id, c,
               CAST(list_sum(list_transform(c, x -> x * x)) AS BIGINT) AS qn
             FROM e WHERE vec_id % 5 = 0),
      ts AS (SELECT vec_id, label, c,
               CAST(list_sum(list_transform(c, x -> x * x)) AS BIGINT) AS vn
             FROM e WHERE vec_id % 5 <> 0),
      pr AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id, t.label,
               CAST(floor(CAST(list_sum(list_transform(range(1, len(q.c) + 1),
                      k -> q.c[k] * t.c[k])) AS DOUBLE) /
                 (sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(t.vn AS DOUBLE)))
                 * 1e6 + 0.5) AS BIGINT) AS cos_e6
             FROM qs q, ts t),
      rk AS (SELECT q_id, n_id, label, cos_e6,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cos_e6 DESC, n_id) AS r
             FROM pr),
      votes AS (SELECT q_id, label, COUNT(*) AS votes
                FROM rk WHERE r <= 5 GROUP BY 1, 2),
      p AS (SELECT q_id, label, votes,
              row_number() OVER (PARTITION BY q_id
                                 ORDER BY votes DESC, label) AS rr
            FROM votes)
      SELECT q_id AS vec_id, label AS pred, votes FROM p WHERE rr = 1
      ORDER BY vec_id""",

    "ann_lsh" -> s"""
      WITH planes(tid, pid, p) AS (VALUES
        ${operators.Similarity.planesSqlValues}),
      codes AS (
        SELECT vec_id, tid,
          CAST(SUM(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), p) >= 0
                        THEN 1 << pid ELSE 0 END) AS INT) AS code
        FROM embeddings CROSS JOIN planes GROUP BY vec_id, tid),
      q AS (SELECT vec_id AS query_id, tid, code FROM codes WHERE vec_id < 10),
      cand AS (
        SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
        FROM codes c JOIN q
          ON c.tid = q.tid AND c.code = q.code AND c.vec_id <> q.query_id),
      rer AS (
        SELECT cd.query_id, cd.neighbor_id,
          round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                       CAST(ne.embedding AS DOUBLE[])), 6) AS cos_sim
        FROM cand cd
        JOIN embeddings qe ON qe.vec_id = cd.query_id
        JOIN embeddings ne ON ne.vec_id = cd.neighbor_id)
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
        FROM rer)
      WHERE rank <= 5 ORDER BY query_id, rank""",

    "text_repetition" -> """
      WITH t AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                    x -> length(x) > 0) AS toks
        FROM documents),
      g2 AS (
        SELECT doc_id, len(toks) AS n_tokens,
          len(list_transform(range(1, len(toks)),
            i -> toks[i] || ' ' || toks[i+1])) AS n2,
          len(list_distinct(list_transform(range(1, len(toks)),
            i -> toks[i] || ' ' || toks[i+1]))) AS d2,
          len(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS n3,
          len(list_distinct(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS d3
        FROM t),
      topt AS (
        SELECT doc_id, MAX(c) AS mx FROM (
          SELECT doc_id, tok, COUNT(*) AS c
          FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
          GROUP BY 1, 2)
        GROUP BY 1),
      r AS (
        SELECT g2.doc_id, CAST(g2.n_tokens AS INT) AS n_tokens,
          round(CASE WHEN n2 > 0 THEN CAST(n2 - d2 AS DOUBLE) / n2 ELSE 0.0 END, 6)
            AS dup_2gram_ratio,
          round(CASE WHEN n3 > 0 THEN CAST(n3 - d3 AS DOUBLE) / n3 ELSE 0.0 END, 6)
            AS dup_3gram_ratio,
          round(CASE WHEN g2.n_tokens > 0 THEN CAST(topt.mx AS DOUBLE) / g2.n_tokens
                ELSE 0.0 END, 6) AS top_tok_ratio
        FROM g2 LEFT JOIN topt USING (doc_id))
      SELECT doc_id, n_tokens, dup_2gram_ratio, dup_3gram_ratio, top_tok_ratio,
        (dup_3gram_ratio > 0.2 OR top_tok_ratio > 0.2) AS repetitive
      FROM r ORDER BY doc_id""",

    "text_redact" -> """
      WITH p AS (
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 0
               THEN text || ' contact user' || doc_id || '@example.com from 192.168.'
                    || (doc_id % 256) || '.1'
               ELSE text END AS t
        FROM documents),
      e AS (
        SELECT doc_id, t,
          regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g') AS t2
        FROM p)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', 0)) AS INT) AS n_emails,
        CAST(len(regexp_extract_all(t2,
          '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', 0)) AS INT) AS n_ips,
        regexp_replace(t2, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g')
          AS redacted
      FROM e ORDER BY doc_id""",

    // tf/df ordering == tf-idf ordering for a fixed corpus; the score
    // is one IEEE division, bit-identical across engines (no log)
    "text_keywords" -> """
      WITH tok AS (
        SELECT doc_id,
          unnest(list_filter(string_split_regex(lower(text), '\s+'),
                 x -> length(x) > 0)) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      sc AS (
        SELECT t.doc_id, t.token, t.tf, df.df,
          CAST(t.tf AS DOUBLE) / df.df AS score
        FROM tf t JOIN df USING (token))
      SELECT doc_id, rank, token, tf, df, score FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, token) AS INT) AS rank
        FROM sc)
      WHERE rank <= 3 ORDER BY doc_id, rank""",

    "vocab_topk" -> """
      SELECT tok AS token, COUNT(*) AS n FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                      x -> length(x) > 0)) AS tok
        FROM documents)
      GROUP BY tok ORDER BY n DESC, token LIMIT 200""",

    // MLE bigram LM trained on the corpus itself: ln(cnt/ctx) rounded
    // to 1e-9, decimal-weighted-summed (exact), one double division,
    // 6 dp; ppl = exp of the already-rounded mean
    "ngram_lm_score" -> s"""
      WITH $ngramLmCtes
      SELECT doc_id, n_bigrams, avg_neg_logp,
        round(exp(avg_neg_logp), 6) AS ppl
      FROM fin ORDER BY doc_id""",

    // CCNet tertile buckets: thresholds are exact ELEMENTS of the
    // (ppl, doc_id) sort at ceil(n/3)/ceil(2n/3) (the oracle may use
    // row_number — DuckDB is single-node; the Spark side uses two
    // TakeOrdered probes, no global window); ties at a threshold land
    // in the lower bucket by value comparison
    "ccnet_buckets" -> s"""
      WITH $ngramLmCtes,
      sc AS (SELECT doc_id, round(exp(avg_neg_logp), 6) AS ppl FROM fin),
      st AS (SELECT COUNT(*) AS n FROM sc),
      rn AS (SELECT doc_id, ppl,
               row_number() OVER (ORDER BY ppl, doc_id) AS r
             FROM sc),
      th1 AS (SELECT ppl AS p1 FROM rn, st WHERE r = (n + 2) // 3),
      th2 AS (SELECT ppl AS p2 FROM rn, st WHERE r = (2 * n + 2) // 3)
      SELECT sc.doc_id, sc.ppl,
        CASE WHEN sc.ppl <= th1.p1 THEN 'head'
             WHEN sc.ppl <= th2.p2 THEN 'middle'
             ELSE 'tail' END AS bucket
      FROM sc, th1, th2 ORDER BY sc.doc_id""",

    // bigram PMI collocations: the argument is a ratio of exact
    // BIGINT products, one IEEE division, ln, 6 dp; top-k cut on the
    // rounded value with bigram tie-break
    "collocations" -> raw"""
      WITH t AS (
        SELECT list_filter(string_split_regex(lower(text), '\s+'),
                           x -> length(x) > 0) AS toks
        FROM documents),
      bg AS (
        SELECT toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT toks, unnest(range(1, len(toks))) AS i
              FROM t WHERE len(toks) >= 2)),
      st AS (SELECT COUNT(*) AS n FROM bg),
      ab AS (SELECT w1, w2, COUNT(*) AS n_ab FROM bg GROUP BY 1, 2),
      ua AS (SELECT w1, COUNT(*) AS n_a FROM bg GROUP BY 1),
      ub AS (SELECT w2, COUNT(*) AS n_b FROM bg GROUP BY 1)
      SELECT ab.w1 || ' ' || ab.w2 AS bigram, n_ab, n_a, n_b,
        round(ln(CAST(st.n * n_ab AS DOUBLE) /
                 CAST(n_a * n_b AS DOUBLE)), 6) + 0 AS pmi
      FROM ab JOIN ua USING (w1) JOIN ub USING (w2), st
      WHERE n_ab >= 5
      ORDER BY pmi DESC, bigram LIMIT 50""",

    // held-out gate: model trained on the TRAIN carve (doc_id%50≠0),
    // all docs scored with add-0.25 smoothing (0.25 and 0.25·V are
    // binary-exact; p is one IEEE division), then the same
    // ln→1e-9→decimal-sum→6dp→exp recipe
    "ngram_lm_heldout" -> ngramLmHeldoutSql,

    // Min-K% Prob membership audit: the held-out add-α lp chain
    // verbatim, then the bottom-20% occurrence cut — cumulative walk
    // ordered by (lp, bigram), m = ceil(n/5) via integer div, a
    // partial take at the boundary only ever splits ONE equal-lp
    // group; window cumsums CAST to BIGINT (SUM(BIGINT) → HUGEINT)
    "decontaminate_minkprob" -> raw"""
      WITH t AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> length(x) > 0) AS toks
        FROM documents),
      bgl AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])) AS bigram
        FROM t WHERE len(toks) >= 2),
      bgs AS (SELECT doc_id, bigram, string_split(bigram, ' ')[1] AS w1 FROM bgl),
      model AS (SELECT bigram, COUNT(*) AS cnt FROM bgs
                WHERE doc_id % 50 <> 0 GROUP BY 1),
      ctx AS (SELECT w1, COUNT(*) AS ctx FROM bgs
              WHERE doc_id % 50 <> 0 GROUP BY 1),
      voc AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM (
                SELECT unnest(toks) AS tok FROM t WHERE doc_id % 50 <> 0)),
      docbg AS (SELECT doc_id, w1, bigram, COUNT(*) AS k FROM bgs GROUP BY 1, 2, 3),
      scored AS (
        SELECT d.doc_id, d.bigram, d.k,
          CAST(round(ln((CAST(COALESCE(m.cnt, 0) AS DOUBLE) + 0.25) /
                        (CAST(COALESCE(c.ctx, 0) AS DOUBLE) + 0.25 * voc.v)),
                     9) AS DECIMAL(13,9)) AS lp
        FROM docbg d
        LEFT JOIN model m USING (bigram)
        LEFT JOIN ctx c USING (w1)
        CROSS JOIN voc),
      win AS (
        SELECT doc_id, k, lp,
          CAST(SUM(k) OVER (PARTITION BY doc_id) AS BIGINT) AS n_bigrams,
          CAST(SUM(k) OVER (PARTITION BY doc_id ORDER BY lp, bigram
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM scored),
      tk AS (
        SELECT doc_id, n_bigrams, (n_bigrams + 4) // 5 AS m,
          LEAST(k, GREATEST(0, (n_bigrams + 4) // 5 - (cum - k))) AS take, lp
        FROM win),
      agg AS (
        SELECT doc_id, MAX(n_bigrams) AS n_bigrams, MAX(m) AS n_sel,
          SUM(CAST(take AS DECIMAL(9,0)) * lp) AS ssel
        FROM tk WHERE take > 0 GROUP BY doc_id)
      SELECT doc_id, n_bigrams, n_sel,
        round(-(CAST(ssel AS DOUBLE) / n_sel), 6) AS mink_neg_logp
      FROM agg ORDER BY doc_id""",

    // learnability selection (RHO family): delta = self-MLE surprise
    // minus held-out-reference surprise — both chains reused verbatim
    // as FROM subqueries (CTE names collide otherwise), one
    // subtraction of identical 6-dp inputs re-rounded, explicit-floor
    // fixed bins, keep = delta > 0
    "select_learnability" -> s"""
      WITH selfs AS (
        SELECT doc_id, avg_neg_logp AS self_nll FROM (
          WITH $ngramLmCtes
          SELECT doc_id, avg_neg_logp FROM fin)),
      refs AS (
        SELECT doc_id, avg_neg_logp AS ref_nll FROM (
          $ngramLmHeldoutSql))
      SELECT selfs.doc_id, self_nll, ref_nll,
        round(self_nll - ref_nll, 6) + 0 AS delta,
        CAST(floor(round(self_nll - ref_nll, 6) * 10) AS INT) AS bin,
        CAST(CASE WHEN round(self_nll - ref_nll, 6) > 0
             THEN 1 ELSE 0 END AS INT) AS keep
      FROM selfs JOIN refs USING (doc_id) ORDER BY doc_id""",

    // DoReMi one-step domain reweighting: per-lang mean excess loss
    // (exact decimal sums of 6-dp deltas), exp-boost off the corpus
    // share, decimal-exact renormalization, c-smoothed ppm by
    // explicit floor — every Σ over sources rides DECIMAL (a float
    // sum is aggregation-order-dependent even at 5 rows)
    "mixture_reweight" -> s"""
      WITH selfs AS (
        SELECT doc_id, avg_neg_logp AS self_nll FROM (
          WITH $ngramLmCtes
          SELECT doc_id, avg_neg_logp FROM fin)),
      refs AS (
        SELECT doc_id, avg_neg_logp AS ref_nll FROM (
          $ngramLmHeldoutSql)),
      dl AS (
        SELECT selfs.doc_id, round(self_nll - ref_nll, 6) AS delta
        FROM selfs JOIN refs USING (doc_id)),
      ag AS (
        SELECT d.lang, COUNT(*) AS n_docs,
          round(CAST(SUM(CAST(dl.delta AS DECIMAL(13,6))) AS DOUBLE) /
            COUNT(*), 6) + 0 AS excess
        FROM dl JOIN documents d USING (doc_id) GROUP BY 1),
      st AS (
        SELECT lang, n_docs, excess,
          round(CAST(n_docs AS DOUBLE) /
            CAST(SUM(n_docs) OVER () AS DOUBLE), 6) AS share,
          round(exp(1.0 * excess), 6) AS boost
        FROM ag),
      uv AS (SELECT *, round(share * boost, 6) AS u FROM st),
      wv AS (
        SELECT *,
          round(u / CAST(SUM(CAST(u AS DECIMAL(13,6))) OVER ()
            AS DOUBLE), 6) AS w,
          COUNT(*) OVER () AS k
        FROM uv)
      SELECT lang, n_docs, excess, share, boost, w,
        CAST(floor((1.0 - 0.5) * w * 1e6 +
          0.5 * 1e6 / CAST(k AS DOUBLE) + 0.5) AS BIGINT) AS target_ppm
      FROM wv ORDER BY lang""",

    // Jelinek-Mercer interpolation: λ-terms are literal × one IEEE
    // division each, summed left-associatively in the same tree; ln
    // onward is the ngram_lm recipe verbatim
    "ngram_lm_interp" -> raw"""
      WITH t AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> length(x) > 0) AS toks
        FROM documents),
      bgl AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])) AS bigram
        FROM t WHERE len(toks) >= 2),
      bgs AS (SELECT doc_id, bigram, string_split(bigram, ' ')[1] AS w1 FROM bgl),
      model AS (SELECT bigram, COUNT(*) AS cnt FROM bgs
                WHERE doc_id % 50 <> 0 GROUP BY 1),
      ctx AS (SELECT w1, COUNT(*) AS ctx FROM bgs
              WHERE doc_id % 50 <> 0 GROUP BY 1),
      traintok AS (SELECT unnest(toks) AS tok FROM t WHERE doc_id % 50 <> 0),
      uni AS (SELECT tok AS w2, COUNT(*) AS ucnt FROM traintok GROUP BY 1),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM traintok),
      voc AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM traintok),
      docbg AS (SELECT doc_id, w1, bigram, COUNT(*) AS k FROM bgs GROUP BY 1, 2, 3),
      scored AS (
        SELECT d.doc_id, d.k,
          CAST(round(ln(
            (CASE WHEN COALESCE(c.ctx, 0) > 0
               THEN CAST(0.7 AS DOUBLE) *
                    (CAST(COALESCE(m.cnt, 0) AS DOUBLE) / CAST(c.ctx AS DOUBLE))
               ELSE CAST(0.0 AS DOUBLE) END)
            + CAST(0.25 AS DOUBLE) *
              (CAST(COALESCE(u.ucnt, 0) AS DOUBLE) / CAST(tot.n AS DOUBLE))
            + CAST(0.05 AS DOUBLE) / CAST(voc.v AS DOUBLE)), 9)
            AS DECIMAL(13,9)) AS lp
        FROM docbg d
        LEFT JOIN model m USING (bigram)
        LEFT JOIN ctx c USING (w1)
        LEFT JOIN uni u ON u.w2 = string_split(d.bigram, ' ')[2]
        CROSS JOIN tot CROSS JOIN voc),
      agg AS (
        SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
          SUM(CAST(k AS DECIMAL(9,0)) * lp) AS slp
        FROM scored GROUP BY doc_id),
      fin AS (
        SELECT doc_id, n_bigrams,
          round(-(CAST(slp AS DOUBLE) / n_bigrams), 6) AS avg_neg_logp
        FROM agg)
      SELECT doc_id, n_bigrams, avg_neg_logp,
        round(exp(avg_neg_logp), 6) AS ppl
      FROM fin ORDER BY doc_id""",

    // interpolated Kneser-Ney at D=0.75: every operand on an exact
    // binary grid (quarter-grid counts, +1 continuation), each branch
    // a fixed IEEE expression tree — two divisions, one multiply, one
    // greatest — identical on both engines; ln onward the recipe
    "ngram_lm_kn" -> raw"""
      WITH t AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> length(x) > 0) AS toks
        FROM documents),
      bgl AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])) AS bigram
        FROM t WHERE len(toks) >= 2),
      bgs AS (SELECT doc_id, bigram, string_split(bigram, ' ')[1] AS w1 FROM bgl),
      model AS (SELECT bigram, COUNT(*) AS cnt FROM bgs
                WHERE doc_id % 50 <> 0 GROUP BY 1),
      cstat AS (SELECT w1, COUNT(*) AS ctx, COUNT(DISTINCT bigram) AS n1fwd
                FROM bgs WHERE doc_id % 50 <> 0 GROUP BY 1),
      cont AS (SELECT string_split(bigram, ' ')[2] AS w2,
                      COUNT(DISTINCT w1) AS cont
               FROM bgs WHERE doc_id % 50 <> 0 GROUP BY 1),
      tv AS (SELECT CAST(
               (SELECT COUNT(*) FROM model) +
               (SELECT COUNT(DISTINCT tok) FROM
                  (SELECT unnest(toks) AS tok FROM t WHERE doc_id % 50 <> 0))
             AS BIGINT) AS tv),
      docbg AS (SELECT doc_id, w1, bigram, COUNT(*) AS k FROM bgs GROUP BY 1, 2, 3),
      scored AS (
        SELECT d.doc_id, d.k,
          CAST(round(ln(
            CASE WHEN COALESCE(c.ctx, 0) > 0 THEN
              greatest(CAST(COALESCE(m.cnt, 0) AS DOUBLE) - 0.75,
                       CAST(0.0 AS DOUBLE)) / CAST(c.ctx AS DOUBLE)
              + ((CAST(0.75 AS DOUBLE) * CAST(c.n1fwd AS DOUBLE)) /
                   CAST(c.ctx AS DOUBLE)) *
                ((CAST(COALESCE(cn.cont, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
                   CAST(tv.tv AS DOUBLE))
            ELSE (CAST(COALESCE(cn.cont, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
                   CAST(tv.tv AS DOUBLE) END), 9)
            AS DECIMAL(13,9)) AS lp
        FROM docbg d
        LEFT JOIN model m USING (bigram)
        LEFT JOIN cstat c USING (w1)
        LEFT JOIN cont cn ON cn.w2 = string_split(d.bigram, ' ')[2]
        CROSS JOIN tv),
      agg AS (
        SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
          SUM(CAST(k AS DECIMAL(9,0)) * lp) AS slp
        FROM scored GROUP BY doc_id),
      fin AS (
        SELECT doc_id, n_bigrams,
          round(-(CAST(slp AS DOUBLE) / n_bigrams), 6) AS avg_neg_logp
        FROM agg)
      SELECT doc_id, n_bigrams, avg_neg_logp,
        round(exp(avg_neg_logp), 6) AS ppl
      FROM fin ORDER BY doc_id""",

    "sketch_distinct" -> operators.Sketches.sketchDistinctOracleSql,
    "sketch_heavyhitters" -> operators.Sketches.sketchHeavyHittersOracleSql,
    "sketch_quantiles" -> operators.Sketches.sketchQuantilesOracleSql,
    "sketch_bloom" -> operators.Sketches.sketchBloomOracleSql,
    "multimodal_audio" -> sources.Multimodal.audioOracleSql,

    "decontaminate" -> decontaminateOracleSql,
    "text_ngram_novelty" -> """
      WITH tok AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM tok WHERE len(toks) >= 3),
      tr AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 5 <> 0),
      ev AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 5 = 0)
      SELECT e.doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_ngrams,
        CAST(SUM(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_seen,
        round(CAST(COUNT(*) - SUM(CASE WHEN t.shingle IS NOT NULL
                                       THEN 1 ELSE 0 END) AS DOUBLE)
              / COUNT(*), 6) AS novel_frac
      FROM ev e LEFT JOIN tr t USING (shingle)
      GROUP BY 1 ORDER BY doc_id""",

    // Bloom-filter decontamination: eval shingles → k=4 salted bit
    // positions (the sketch_bloom recipe on md5(shingle)); a train
    // shingle is flagged iff all 4 probes hit; docs held at ≥2
    // flagged DISTINCT shingles; exact verdict emitted alongside
    "decontaminate_bloom" -> raw"""
      WITH tok AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM tok WHERE len(toks) >= 3),
      ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
      tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0),
      j(j) AS (VALUES (0), (1), (2), (3)),
      bits AS (
        SELECT DISTINCT
          CAST(list_sum(list_transform(range(1, 9),
            kk -> CAST((strpos('0123456789abcdef', hx[kk:kk]) - 1)
                 * CAST(16 ** (8 - kk) AS BIGINT) AS BIGINT))) AS BIGINT)
            % 32768 AS pos
        FROM (SELECT md5('bloom' || j || ':' || md5(shingle)) AS hx
              FROM ev CROSS JOIN j)),
      probes AS (
        SELECT doc_id, shingle,
          CAST(list_sum(list_transform(range(1, 9),
            kk -> CAST((strpos('0123456789abcdef', hx[kk:kk]) - 1)
                 * CAST(16 ** (8 - kk) AS BIGINT) AS BIGINT))) AS BIGINT)
            % 32768 AS pos
        FROM (SELECT doc_id, shingle,
                md5('bloom' || j || ':' || md5(shingle)) AS hx
              FROM tr CROSS JOIN j)),
      flag AS (
        SELECT doc_id, COUNT(*) AS n_flagged FROM (
          SELECT doc_id, shingle FROM probes JOIN bits USING (pos)
          GROUP BY doc_id, shingle HAVING COUNT(*) = 4)
        GROUP BY doc_id),
      ex AS (
        SELECT doc_id, COUNT(*) AS n_shared FROM tr
        WHERE shingle IN (SELECT shingle FROM ev) GROUP BY doc_id),
      tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id)
      SELECT t.doc_id, t.n_shingles,
        COALESCE(f.n_flagged, 0) AS n_flagged,
        COALESCE(e.n_shared, 0) AS n_shared,
        COALESCE(f.n_flagged, 0) >= 2 AS flagged,
        COALESCE(e.n_shared, 0) >= 2 AS contaminated
      FROM tot t LEFT JOIN flag f USING (doc_id) LEFT JOIN ex e USING (doc_id)
      ORDER BY t.doc_id""",

    // minimal-removal decontamination: train-side 32-char windows
    // whose 60-bit hash exists in the EVAL window set are cut via the
    // dedup_spans_excise island surgery; contaminated train docs are
    // planted in-query (ids + 200000 quoting an 80-char eval prefix
    // inside clean framing)
    "decontaminate_excise" -> """
      WITH ev AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
      train AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
        UNION ALL
        SELECT doc_id + 200000, 'zzz ' || substr(text, 1, 80) || ' qqq'
        FROM documents WHERE doc_id % 50 = 0 AND doc_id < 150),
      wt AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS off, md5(text[i:i+31]) AS h
        FROM (SELECT doc_id, text, unnest(range(1, length(text) - 30)) AS i
              FROM train WHERE length(text) >= 32)),
      we AS (
        SELECT md5(text[i:i+31]) AS h
        FROM (SELECT text, unnest(range(1, length(text) - 30)) AS i
              FROM ev WHERE length(text) >= 32)),
      kt AS (
        SELECT doc_id, off,
          CAST(list_sum(list_transform(range(1, 16),
            kk -> CAST((strpos('0123456789abcdef', h[kk:kk]) - 1)
                 * CAST(16 ** (15 - kk) AS BIGINT) AS BIGINT))) AS BIGINT)
            AS span_hash
        FROM wt),
      ke AS (
        SELECT DISTINCT
          CAST(list_sum(list_transform(range(1, 16),
            kk -> CAST((strpos('0123456789abcdef', h[kk:kk]) - 1)
                 * CAST(16 ** (15 - kk) AS BIGINT) AS BIGINT))) AS BIGINT)
            AS span_hash
        FROM we),
      hit AS (SELECT doc_id, off FROM kt JOIN ke USING (span_hash)),
      fl AS (
        SELECT doc_id, off,
          CASE WHEN lag(off) OVER win IS NULL
                 OR off > lag(off) OVER win + 32 THEN 1 ELSE 0 END AS brk
        FROM hit WINDOW win AS (PARTITION BY doc_id ORDER BY off)),
      isl AS (
        SELECT doc_id, off,
          SUM(brk) OVER (PARTITION BY doc_id ORDER BY off) AS grp
        FROM fl),
      iv AS (
        SELECT doc_id, grp, MIN(off) AS s, MAX(off) + 32 AS e
        FROM isl GROUP BY 1, 2),
      pc AS (
        SELECT doc_id, s, e,
          COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS pe
        FROM iv),
      parts AS (
        SELECT p.doc_id, p.s AS ord, substr(d.text, CAST(p.pe + 1 AS INT),
          CAST(p.s - p.pe AS INT)) AS piece
        FROM pc p JOIN train d USING (doc_id)
        UNION ALL
        SELECT t.doc_id, 2147483647 AS ord,
          substr(d.text, CAST(t.le + 1 AS INT)) AS piece
        FROM (SELECT doc_id, MAX(e) AS le FROM iv GROUP BY 1) t
        JOIN train d USING (doc_id)),
      agg AS (
        SELECT doc_id, string_agg(piece, '~' ORDER BY ord) AS excised_text
        FROM parts GROUP BY doc_id),
      rem AS (
        SELECT doc_id, CAST(COUNT(*) AS INT) AS n_intervals,
          CAST(SUM(e - s) AS INT) AS chars_removed
        FROM iv GROUP BY 1)
      SELECT d.doc_id,
        COALESCE(rem.n_intervals, 0) AS n_intervals,
        COALESCE(rem.chars_removed, 0) AS chars_removed,
        COALESCE(agg.excised_text, d.text) AS excised_text
      FROM train d
      LEFT JOIN rem USING (doc_id)
      LEFT JOIN agg USING (doc_id)
      ORDER BY d.doc_id""",
    // the shuffle-join form is result-identical to the broadcast form
    // by construction — one oracle, two physical plans under test
    "decontaminate_shuffle" -> decontaminateOracleSql,

    "split_assign" -> """
      WITH b AS (
        SELECT doc_id,
          CAST(CAST(list_sum(list_transform(range(1, 9),
            k -> (strpos('0123456789abcdef', md5('split:' || doc_id)[k:k]) - 1)
                 * CAST(16 ** (8 - k) AS BIGINT))) AS BIGINT) % 100 AS INT) AS bucket
        FROM documents)
      SELECT doc_id, bucket,
        CASE WHEN bucket < 80 THEN 'train'
             WHEN bucket < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM b ORDER BY doc_id""",

    // rank-based stratified split: exact floor(n·cut) quotas per lang
    // (0.8 / 0.9 parse to identical doubles in both engines, and
    // n·cut is a single IEEE multiply — floor boundaries agree)
    "split_stratified" -> """
      WITH s AS (
        SELECT doc_id, lang,
          row_number() OVER (PARTITION BY lang
            ORDER BY md5('strat:' || doc_id), doc_id) AS rn,
          count(*) OVER (PARTITION BY lang) AS n
        FROM documents)
      SELECT doc_id, lang,
        CASE WHEN rn <= floor(n * 0.8) THEN 'train'
             WHEN rn <= floor(n * 0.9) THEN 'val'
             ELSE 'test' END AS split
      FROM s ORDER BY doc_id""",

    // quotas are driver-computed integers (Curate.mixQuotas) embedded
    // as literals on BOTH sides — no cross-engine float math
    "sample_mixture" -> s"""
      WITH s AS (
        SELECT doc_id, lang,
          row_number() OVER (PARTITION BY lang
            ORDER BY md5('mix:' || doc_id), doc_id) AS rn
        FROM documents)
      SELECT doc_id, lang FROM s
      WHERE rn <= CASE lang ${operators.Curate
        .mixQuotas(operators.Curate.DefaultMixWeights,
          operators.Curate.DefaultMixBudget).toSeq.sorted
        .map { case (k, q) => s"WHEN '$k' THEN $q" }.mkString(" ")}
        ELSE 0 END
      ORDER BY doc_id""",

    "pack_sequences" -> """
      WITH t AS (
        SELECT doc_id, lang,
          CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, lang, n_tokens,
          COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM t)
      SELECT lang, doc_id, CAST(n_tokens AS INT) AS n_tokens,
        CAST(cum_before // 512 AS BIGINT) AS bin_id,
        CAST(cum_before % 512 AS INT) AS bin_offset
      FROM c ORDER BY lang, doc_id""",

    // first-fit-decreasing replayed as a recursive CTE: items ordered
    // (n_tokens DESC, doc_id) per (lang, shard), bin loads carried as
    // a BIGINT list, fit = first index whose load + size fits (NULL ->
    // open a new bin); recursion depth bounded by shardSize = 100
    "pack_bestfit" -> """
      WITH RECURSIVE t AS (
        SELECT doc_id, lang, CAST(doc_id // 100 AS BIGINT) AS shard,
          CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                    x -> length(x) > 0)) AS INT) AS n_tokens
        FROM documents),
      items AS (
        SELECT lang, shard, doc_id, n_tokens,
          CAST(least(n_tokens, 512) AS BIGINT) AS sz,
          CAST(row_number() OVER (PARTITION BY lang, shard
            ORDER BY n_tokens DESC, doc_id) AS INT) AS rn
        FROM t WHERE n_tokens > 0),
      ffd AS (
        SELECT lang, shard, rn, doc_id, n_tokens, sz,
          CAST(0 AS INT) AS bin, CAST(0 AS INT) AS bin_offset,
          [sz] AS loads
        FROM items WHERE rn = 1
        UNION ALL
        SELECT lang, shard, rn, doc_id, n_tokens, sz,
          CAST(CASE WHEN fit IS NULL THEN len(loads0)
               ELSE fit - 1 END AS INT) AS bin,
          CAST(CASE WHEN fit IS NULL THEN 0
               ELSE loads0[fit] END AS INT) AS bin_offset,
          CASE WHEN fit IS NULL THEN list_append(loads0, sz)
               ELSE list_transform(range(1, len(loads0) + 1),
                 j -> CASE WHEN j = fit THEN loads0[j] + sz
                      ELSE loads0[j] END)
          END AS loads
        FROM (
          SELECT i.lang, i.shard, i.rn, i.doc_id, i.n_tokens, i.sz,
            f.loads AS loads0,
            list_filter(range(1, len(f.loads) + 1),
              j -> f.loads[j] + i.sz <= 512)[1] AS fit
          FROM ffd f JOIN items i
            ON i.lang = f.lang AND i.shard = f.shard AND i.rn = f.rn + 1))
      SELECT lang, shard, doc_id, n_tokens, CAST(sz AS INT) AS packed,
        bin, bin_offset
      FROM ffd ORDER BY lang, shard, bin, bin_offset""",

    // same prefix-sum CTE as pack_sequences, then one row per
    // (doc, window) segment via generate_series over the exact offsets
    "pack_segments" -> """
      WITH t AS (
        SELECT doc_id, lang,
          CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, lang, n_tokens,
          CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cum_before
        FROM t),
      seg AS (
        SELECT lang, doc_id, n_tokens, cum_before,
          unnest(range(cum_before // 512,
                       (cum_before + n_tokens - 1) // 512 + 1)) AS bin_id
        FROM c WHERE n_tokens > 0)
      SELECT lang, doc_id, CAST(n_tokens AS INT) AS n_tokens,
        CAST(bin_id - cum_before // 512 AS INT) AS seg_idx,
        bin_id,
        CAST(greatest(0, cum_before - bin_id * 512) AS INT) AS bin_offset,
        CAST(greatest(0, bin_id * 512 - cum_before) AS INT) AS seg_start,
        CAST(least(n_tokens, (bin_id + 1) * 512 - cum_before)
             - greatest(0, bin_id * 512 - cum_before) AS INT) AS seg_len
      FROM seg ORDER BY lang, doc_id, bin_id""",

    // per-language datasheet: exact integer counts + one division
    // (the Spark md5 of the lowercased text matches DuckDB's md5 —
    // both hash UTF-8 bytes)
    "corpus_card" -> raw"""
      WITH base AS (SELECT lang, doc_id, text FROM documents),
      tok AS (
        SELECT lang, doc_id,
          unnest(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> length(x) > 0)) AS token
        FROM base),
      totals AS (SELECT lang, COUNT(*) AS n_docs FROM base GROUP BY 1),
      tt AS (SELECT lang, COUNT(*) AS total_tokens FROM tok GROUP BY 1),
      voc AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS vocab FROM (
                SELECT DISTINCT lang, token FROM tok) GROUP BY 1),
      dups AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS dup_docs FROM (
                 SELECT lang, md5(lower(text)) AS h, COUNT(*) AS c
                 FROM base GROUP BY 1, 2) WHERE c > 1 GROUP BY 1)
      SELECT totals.lang, totals.n_docs,
        COALESCE(tt.total_tokens, 0) AS total_tokens,
        COALESCE(voc.vocab, 0) AS vocab,
        COALESCE(dups.dup_docs, 0) AS dup_docs,
        round(CAST(COALESCE(tt.total_tokens, 0) AS DOUBLE) / totals.n_docs,
              6) AS mean_tokens
      FROM totals
      LEFT JOIN tt USING (lang)
      LEFT JOIN voc USING (lang)
      LEFT JOIN dups USING (lang)
      ORDER BY totals.lang""",

    // masks in packed-window coordinates: the pack_segments prefix
    // chain and the mask_spans island chain composed on one shared
    // tokenize, intersected per (segment, span) with the affine
    // doc→window translation
    "pack_masked" -> raw"""
      WITH t0 AS (
        SELECT doc_id, lang,
          list_filter(string_split_regex(lower(text), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM documents),
      t AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens
            FROM t0),
      c AS (
        SELECT doc_id, lang, n_tokens,
          CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cum_before
        FROM t),
      seg AS (
        SELECT lang, doc_id, bin_id,
          CAST(greatest(0, cum_before - bin_id * 512) AS INT) AS bin_offset,
          CAST(greatest(0, bin_id * 512 - cum_before) AS BIGINT) AS seg_start,
          CAST(least(n_tokens, (bin_id + 1) * 512 - cum_before)
               - greatest(0, bin_id * 512 - cum_before) AS BIGINT) AS seg_len
        FROM (
          SELECT lang, doc_id, n_tokens, cum_before,
            unnest(range(cum_before // 512,
                         (cum_before + n_tokens - 1) // 512 + 1)) AS bin_id
          FROM c WHERE n_tokens > 0)),
      pos AS (SELECT doc_id, len(toks) AS n, unnest(range(0, len(toks))) AS p
              FROM t0 WHERE len(toks) > 0),
      h AS (SELECT doc_id, n, p,
              CAST(list_sum(list_transform(range(1, 9),
                k -> (strpos('0123456789abcdef',
                             md5(doc_id || ':' || p)[k:k]) - 1)
                     * CAST(16 ** (8 - k) AS BIGINT))) AS BIGINT) AS hv
            FROM pos),
      starts AS (SELECT doc_id, n, p FROM h WHERE hv % 20 = 0),
      covered AS (SELECT DISTINCT doc_id, p + i AS cp
                  FROM starts, (SELECT unnest([0, 1, 2]) AS i) off
                  WHERE p + i < n),
      isl AS (SELECT doc_id, cp,
                cp - row_number() OVER (PARTITION BY doc_id
                                        ORDER BY cp) AS grp
              FROM covered),
      spans AS (SELECT doc_id, CAST(MIN(cp) AS BIGINT) AS span_start,
                  CAST(COUNT(*) AS BIGINT) AS span_len
                FROM isl GROUP BY doc_id, grp),
      ix AS (
        SELECT seg.lang, seg.doc_id, seg.bin_id, seg.bin_offset,
          seg.seg_start,
          greatest(spans.span_start, seg.seg_start) AS lo,
          least(spans.span_start + spans.span_len,
                seg.seg_start + seg.seg_len) AS hi
        FROM seg JOIN spans USING (doc_id))
      SELECT lang, doc_id, bin_id,
        CAST(bin_offset + (lo - seg_start) AS INT) AS win_start,
        CAST(hi - lo AS INT) AS win_len
      FROM ix WHERE hi > lo
      ORDER BY lang, doc_id, bin_id, win_start""",

    "text_fingerprint" -> """
      WITH g AS (
        SELECT doc_id,
          list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                         i -> md5(text[i:i+7])) AS hs
        FROM documents)
      SELECT doc_id,
        list_aggregate(hs, 'min') AS fp_min,
        list_aggregate(hs, 'max') AS fp_max,
        CAST(len(list_distinct(hs)) AS INT) AS n_distinct_shingles
      FROM g ORDER BY doc_id""",

    // img_w/img_h/pixel_sum re-derive the ImageIO-decoded plane: BMP is
    // uncompressed, pixel (x,y) = byte (y*w+x) mod len of the payload.
    // thumb_* re-derives the REAL nearest-neighbor 2x downscale of that
    // decoded plane: thumb pixel (tx,ty) = source pixel
    // (tx*w//tw, ty*h//th) — the same integer arithmetic the Spark
    // resize runs on the decoded BufferedImage
    "multimodal_meta" -> """
      WITH d AS (
        SELECT doc_id, text, length(text) AS L,
          CAST(doc_id % 16 + 4 AS INT) AS w,
          CAST(doc_id % 12 + 4 AS INT) AS h
        FROM documents),
      t AS (
        SELECT *, greatest(1, w // 2) AS tw, greatest(1, h // 2) AS th
        FROM d)
      SELECT doc_id,
        CAST(L AS INT) AS n_bytes,
        CAST(list_sum(list_transform(range(1, L + 1),
          i -> unicode(text[i:i]))) % 100000 AS BIGINT) AS checksum,
        CAST((doc_id % 64 + 16) * 8 AS INT) AS width,
        CAST((doc_id % 48 + 12) * 8 AS INT) AS height,
        CAST((doc_id % 64 + 16) * 8 * (doc_id % 48 + 12) * 8 AS BIGINT) AS n_pixels,
        CAST(tw AS INT) AS thumb_w,
        CAST(th AS INT) AS thumb_h,
        CAST(list_sum(list_transform(range(0, tw * th),
          i -> unicode(text[CAST((((i // tw) * h // th) * w + (i % tw) * w // tw) % L AS INT) + 1
                            : CAST((((i // tw) * h // th) * w + (i % tw) * w // tw) % L AS INT) + 1])))
          % 100000 AS BIGINT) AS thumb_checksum,
        CAST(w AS INT) AS img_w,
        CAST(h AS INT) AS img_h,
        CAST(list_sum(list_transform(range(0, w * h),
          i -> unicode(text[CAST(i % L AS INT) + 1
                            : CAST(i % L AS INT) + 1])))
          % 100000 AS BIGINT) AS pixel_sum,
        'fake/raw' AS fmt
      FROM t ORDER BY doc_id""",

    // container layout: [n:int32][offset,len pairs] + n 198-byte
    // 8x6 BMP frames; frame i's decoded plane is the payload window
    // at byte i*32 (mod len) — all SQL-recomputable because BMP is
    // uncompressed and the index arithmetic is closed-form
    "multimodal_frames" -> """
      WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
      f AS (
        SELECT doc_id, CAST(fi AS INT) AS frame_idx, text, L,
          least(4, greatest(1, L // 32)) AS n
        FROM d CROSS JOIN range(0, 4) r(fi)
        WHERE fi < least(4, greatest(1, L // 32)))
      SELECT doc_id, frame_idx,
        CAST(4 + 8 * n + frame_idx * 198 AS INT) AS "offset",
        CAST(198 AS INT) AS frame_len,
        CAST(list_sum(list_transform(range(0, 48),
          j -> unicode(text[CAST((frame_idx * 32 + j) % L AS INT) + 1
                            : CAST((frame_idx * 32 + j) % L AS INT) + 1])))
          % 100000 AS BIGINT) AS frame_checksum
      FROM f ORDER BY doc_id, frame_idx""",

    "bm25_topk" -> operators.Search.bm25OracleSql(),
    "search_hybrid_rrf" -> operators.Search.hybridRrfOracleSql(),
    // weighted fusion: 0.75/1.0 are binary-exact, so the literal
    // parses to identical doubles in both engines
    "phrase_search" -> operators.Search.phraseSearchOracle,
    "search_hybrid_wrrf" -> operators.Search.hybridRrfOracleSql(
      wLex = "0.75", wSem = "1"),

    // SCD-2: run-collapse on (custkey, priority) ordered by
    // (date, orderkey), each run one validity interval
    "scd2_history" -> """
      WITH ch AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
          lag(o_orderpriority) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders),
      seg AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
        FROM ch WHERE prev IS NULL OR prev <> o_orderpriority)
      SELECT o_custkey, o_orderpriority, o_orderkey,
        o_orderdate AS valid_from,
        lead(o_orderdate) OVER w AS valid_to,
        CAST(row_number() OVER w AS INT) AS version,
        (lead(o_orderdate) OVER w IS NULL) AS is_current
      FROM seg
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, version""",

    "profile_columns" -> operators.Profile.profileOracleSql,

    // RAG chunking: starts are multiples of 24 below max(n-32+24, 1);
    // DuckDB list slices are 1-based inclusive
    "chunk_overlap" -> raw"""
      WITH tok AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> length(x) > 0) AS toks
        FROM documents),
      st AS (
        SELECT doc_id, toks, len(toks) AS n,
          unnest(range(0, greatest(len(toks) - 32 + 24, 1), 24)) AS s
        FROM tok)
      SELECT doc_id,
        CAST(s // 24 AS INT) AS chunk_idx,
        CAST(s AS INT) AS start_tok,
        CAST(least(s + 32, n) - s AS INT) AS n_tok,
        CAST(length(array_to_string(toks[s + 1 : least(s + 32, n)], ' '))
          AS INT) AS n_chars,
        md5(array_to_string(toks[s + 1 : least(s + 32, n)], ' ')) AS chunk_md5
      FROM st ORDER BY doc_id, chunk_idx""",

    "contrastive_triplets" -> s"""
      WITH $minhashCtes,
      pool AS (
        SELECT doc_id AS neg_cand FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 16),
      cand AS (
        SELECT p.d1, p.d2, n.neg_cand
        FROM mh_pairs p CROSS JOIN pool n
        WHERE n.neg_cand <> p.d1 AND n.neg_cand <> p.d2
          AND NOT EXISTS (
            SELECT 1 FROM mh_pairs q
            WHERE (q.d1 = p.d1 AND q.d2 = n.neg_cand)
               OR (q.d2 = p.d1 AND q.d1 = n.neg_cand))),
      ranked AS (
        SELECT d1, d2, neg_cand,
          row_number() OVER (PARTITION BY d1, d2
            ORDER BY md5(CAST(d1 AS VARCHAR) || '_'
                         || CAST(neg_cand AS VARCHAR)),
                     neg_cand) AS neg_rank
        FROM cand)
      SELECT d1 AS anchor, d2 AS positive, neg_cand AS negative,
        CAST(neg_rank AS INT) AS neg_rank
      FROM ranked WHERE neg_rank <= 2
      ORDER BY anchor, positive, neg_rank""",

    // calendar-aligned RANGE frames over the integer day number;
    // DuckDB window sums are HUGEINT -> cast BIGINT
    "feature_lags" -> """
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events
        FROM events GROUP BY 1, 2),
      d2 AS (SELECT *, datediff('day', DATE '1970-01-01', day) AS day_n
             FROM daily),
      f AS (
        SELECT user_id, day, n_events,
          CAST(COALESCE(sum(n_events) OVER (PARTITION BY user_id ORDER BY day_n
            RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS lag1,
          CAST(COALESCE(sum(n_events) OVER (PARTITION BY user_id ORDER BY day_n
            RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING), 0) AS BIGINT) AS lag7,
          CAST(sum(n_events) OVER w7 AS BIGINT) AS roll7_sum,
          CAST(count(*) OVER w7 AS BIGINT) AS roll7_days,
          CAST(sum(n_events) OVER w7 AS DOUBLE) / 7 AS roll7_mean,
          sum(n_events) OVER (PARTITION BY user_id ORDER BY day_n
            RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS next_n0
        FROM d2
        WINDOW w7 AS (PARTITION BY user_id ORDER BY day_n
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT user_id, day, n_events, lag1, lag7, roll7_sum, roll7_days,
        roll7_mean, CAST(next_n0 AS BIGINT) AS next_n
      FROM f WHERE next_n0 IS NOT NULL
      ORDER BY user_id, day""",

    // least-squares trend from exact integer moments; the int64-
    // overflowing products go through exact DECIMAL(18,0) like the
    // Spark side
    "regress_trend" -> """
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
        FROM events GROUP BY 1, 2),
      d2 AS (SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS x, y
             FROM daily),
      m AS (
        SELECT event_type,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          CAST(sum(x * x) AS BIGINT) AS sxx,
          CAST(sum(y * y) AS BIGINT) AS syy,
          CAST(sum(x * y) AS BIGINT) AS sxy
        FROM d2 GROUP BY 1),
      r AS (
        SELECT event_type, n,
          n * sxy - sx * sy AS nn,
          n * sxx - sx * sx AS dd,
          n * syy - sy * sy AS dy, sx, sy
        FROM m)
      SELECT event_type, n AS n_days,
        round(CAST(nn AS DOUBLE) / CAST(dd AS DOUBLE), 6) + 0 AS slope,
        round(CAST(CAST(sy AS DECIMAL(18,0)) * CAST(dd AS DECIMAL(18,0))
                   - CAST(nn AS DECIMAL(18,0)) * CAST(sx AS DECIMAL(18,0))
                   AS DOUBLE)
              / CAST(n * dd AS DOUBLE), 6) + 0 AS intercept,
        round(CAST(CAST(nn AS DECIMAL(18,0)) * CAST(nn AS DECIMAL(18,0))
                   AS DOUBLE)
              / CAST(CAST(dd AS DECIMAL(18,0)) * CAST(dy AS DECIMAL(18,0))
                     AS DOUBLE), 6) AS r2
      FROM r ORDER BY event_type""",

    // OLS distillation of the LM score onto cheap features: exact
    // decimal moments -> one double cast each -> the SAME Cramer
    // cofactor expression tree as the Spark side
    "quality_distill" -> s"""
      WITH $ngramLmCtes,
      feat AS (
        SELECT doc_id,
          CAST(round(CAST(length(text) AS DOUBLE) / len(toks), 9)
            AS DECIMAL(13,9)) AS x1,
          CAST(round(CAST(len(list_filter(toks,
                 x -> x IN ('the','a','of','and','to','in','is','on')))
               AS DOUBLE) / len(toks), 9) AS DECIMAL(13,9)) AS x2
        FROM documents JOIN t USING (doc_id)),
      j AS (
        SELECT f.x1, f.x2, CAST(l.avg_neg_logp AS DECIMAL(13,9)) AS y
        FROM feat f JOIN fin l USING (doc_id)),
      mom AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
          CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
          CAST(sum(x1*x1) AS DOUBLE) AS s11, CAST(sum(x1*x2) AS DOUBLE) AS s12,
          CAST(sum(x2*x2) AS DOUBLE) AS s22,
          CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(x1*y) AS DOUBLE) AS s1y,
          CAST(sum(x2*y) AS DOUBLE) AS s2y, CAST(sum(y*y) AS DOUBLE) AS syy,
          CAST(count(*) AS BIGINT) AS n_docs
        FROM j),
      det AS (
        SELECT *,
          n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
            s2 * (s1 * s12 - s11 * s2) AS dd,
          sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
            s2 * (s1y * s12 - s11 * s2y) AS d0,
          n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2) +
            s2 * (s1 * s2y - s1y * s2) AS d1,
          n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2) +
            sy * (s1 * s12 - s11 * s2) AS d2
        FROM mom)
      SELECT n_docs,
        round(d0 / dd, 6) + 0 AS intercept,
        round(d1 / dd, 6) + 0 AS b_len,
        round(d2 / dd, 6) + 0 AS b_stop,
        round(1.0 - (syy - (d0 * sy + d1 * s1y + d2 * s2y) / dd) /
          (syy - sy * sy / n), 6) + 0 AS r2
      FROM det""",

    "snapshot_diff" -> operators.Cdc.snapshotDiffOracle,
    "range_join_agg" -> operators.RangeJoin.rangeJoinAggOracle,
    "fuzzy_match_names" -> operators.FuzzyJoin.fuzzyMatchNamesOracle,
    "dq_check" -> operators.DataQuality.dqCheckOracle,
    "sample_weighted" -> operators.Curate.sampleWeightedOracle,
    "multimodal_scenecut" -> Multimodal.sceneCutsOracle,
    "scd2_lookup" -> operators.Upsert.scd2LookupOracle,
    "events_gap_fill" -> Timeseries.eventsGapFillOracle,
    "text_normalize" -> TextFunctions.textNormalizeOracle,
    "text_scripts" -> TextFunctions.textScriptsOracle,
    "text_entropy" -> TextFunctions.textEntropyOracle,
    "vocab_drift" -> TextFunctions.vocabDriftOracle,
    "vocab_drift_ref" -> TextFunctions.vocabDriftRefOracle,
    "gopher_rules" -> functions.QualityFilters.gopherRulesOracle,
    "c4_filters" -> functions.QualityFilters.c4FiltersOracle,
    "sample_temperature" -> operators.Curate.sampleTemperatureOracle,
    "dsir_select" -> operators.Curate.dsirSelectOracle,

    // duplication statistics: the ccOracleSql reachability with
    // singletons folded in (left join + coalesce to own id)
    "dedup_profile" -> s"""
      WITH RECURSIVE $minhashCtes,
      edges AS (
        SELECT d1 AS u, d2 AS v FROM mh_pairs
        UNION ALL SELECT d2, d1 FROM mh_pairs),
      reach(node, root) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node),
      cc AS (SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node),
      lab AS (
        SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster
        FROM docs d LEFT JOIN cc c ON c.node = d.doc_id),
      sizes AS (
        SELECT cluster, COUNT(*) AS cluster_size FROM lab GROUP BY cluster)
      SELECT cluster_size, COUNT(*) AS n_clusters,
        CAST(SUM(cluster_size) AS BIGINT) AS n_docs
      FROM sizes GROUP BY cluster_size ORDER BY cluster_size""",

    // LSH-geometry calibration: minhash-estimated similarity (exact
    // binary rational n_agree/64) vs exact shingle Jaccard, per
    // candidate pair — the `mins` CTE carries the raw signatures
    "lsh_calibration" -> s"""
      WITH $minhashCtes,
      agree AS (
        SELECT p.d1, p.d2, COUNT(*) AS n_agree
        FROM mh_pairs p
        JOIN mins m1 ON m1.doc_id = p.d1
        JOIN mins m2 ON m2.doc_id = p.d2 AND m2.pid = m1.pid
          AND m2.m = m1.m
        GROUP BY 1, 2),
      shr AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
        FROM sh a
        JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        JOIN mh_pairs p ON p.d1 = a.doc_id AND p.d2 = b.doc_id
        GROUP BY 1, 2),
      sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1)
      SELECT p.d1, p.d2, CAST(g.n_agree AS INT) AS n_agree,
        round(g.n_agree / 64.0, 6) AS est_sim,
        CAST(COALESCE(s.shared, 0) AS BIGINT) AS shared,
        round(CAST(COALESCE(s.shared, 0) AS DOUBLE) /
              (z1.n_sh + z2.n_sh - COALESCE(s.shared, 0)), 6) AS jaccard
      FROM mh_pairs p
      JOIN agree g ON g.d1 = p.d1 AND g.d2 = p.d2
      LEFT JOIN shr s ON s.d1 = p.d1 AND s.d2 = p.d2
      JOIN sz z1 ON z1.doc_id = p.d1
      JOIN sz z2 ON z2.doc_id = p.d2
      ORDER BY p.d1, p.d2""",

    // S-curve geometry planner: per power-of-two (bands, rows) split
    // of the 64-hash signature, the grid knee and the expected catch
    // over the corpus's verified pair Jaccards; p evaluates by the
    // SAME repeated-squaring multiplication tree as the Spark side
    "lsh_plan" -> {
      val geos = operators.Dedup.PlanGeometries.map { case (b, r) =>
        val knee = "(SELECT COALESCE(MIN(s), 1.0) FROM grid WHERE " +
          operators.Dedup.planCollideSql("s", b, r) + " >= 0.5)"
        s"""SELECT $b AS bands, $r AS rows_per_band,
        $knee AS knee_s,
        COUNT(*) AS n_pairs,
        round(CAST(SUM(CAST(round(${operators.Dedup.planCollideSql("j", b, r)},
          9) AS DECIMAL(13,9))) AS DOUBLE) / COUNT(*), 6) AS exp_catch
      FROM jac"""
      }.mkString("\n      UNION ALL\n      ")
      s"""
      WITH $minhashCtes,
      shr AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
        FROM sh a
        JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        JOIN mh_pairs p ON p.d1 = a.doc_id AND p.d2 = b.doc_id
        GROUP BY 1, 2),
      sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      jac AS (
        SELECT round(CAST(COALESCE(s.shared, 0) AS DOUBLE) /
               (z1.n_sh + z2.n_sh - COALESCE(s.shared, 0)), 6) AS j
        FROM mh_pairs p
        LEFT JOIN shr s ON s.d1 = p.d1 AND s.d2 = p.d2
        JOIN sz z1 ON z1.doc_id = p.d1
        JOIN sz z2 ON z2.doc_id = p.d2),
      grid AS (SELECT CAST(k AS DOUBLE) / 20 AS s FROM range(1, 20) t(k))
      $geos
      ORDER BY bands DESC"""
    },

    // cheap-vs-expensive gate calibration: fixed score bins (never a
    // global rank), exact-decimal means
    "quality_calibration" -> raw"""
      WITH $ngramLmCtes,
      stats AS (
        SELECT d.doc_id,
          CASE WHEN len(toks) < 5 THEN 0.0
               ELSE 1.0
                 - (CAST(length(text) - length(regexp_replace(text,
                      '[^a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
                    / length(text)) * 2.0
                 - abs(CAST(len(list_filter(toks,
                      x -> x IN ('the','a','of','and','to','in','is','on')))
                    AS DOUBLE) / len(toks) - 0.4)
          END AS quality_score
        FROM documents d JOIN t USING (doc_id)),
      j AS (
        SELECT s.quality_score, l.avg_neg_logp
        FROM stats s JOIN fin l USING (doc_id))
      SELECT CAST(floor(quality_score * 10) AS INT) AS bin,
        COUNT(*) AS n_docs,
        round(CAST(SUM(CAST(round(quality_score, 9) AS DECIMAL(13,9)))
          AS DOUBLE) / COUNT(*), 6) AS mean_quality,
        round(CAST(SUM(CAST(avg_neg_logp AS DECIMAL(13,9)))
          AS DOUBLE) / COUNT(*), 6) AS mean_nll
      FROM j GROUP BY 1 ORDER BY bin""",

    // mixture-execution trio: target weights are exact ppm literals,
    // every derived quantity (epochs ×1e6, copy counts, interleave
    // fractions) is pure BIGINT arithmetic — no float anywhere
    "mixture_plan" -> raw"""
      WITH t(lang, target_ppm) AS (VALUES
        ('de', 150000), ('en', 400000), ('es', 150000),
        ('fr', 150000), ('zh', 150000)),
      c AS (
        SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(len(list_filter(string_split_regex(lower(text), '\s+'),
            x -> length(x) > 0))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang)
      SELECT c.lang, n_docs, n_tokens,
        CAST(target_ppm AS INT) AS target_ppm,
        CAST(CAST(target_ppm AS BIGINT) * 100000 // n_tokens AS BIGINT)
          AS epochs_e6
      FROM c JOIN t ON c.lang = t.lang
      ORDER BY c.lang""",

    "upsample_epochs" -> raw"""
      WITH t(lang, target_ppm) AS (VALUES
        ('de', 150000), ('en', 400000), ('es', 150000),
        ('fr', 150000), ('zh', 150000)),
      c AS (
        SELECT lang,
          CAST(SUM(len(list_filter(string_split_regex(lower(text), '\s+'),
            x -> length(x) > 0))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang),
      plan AS (
        SELECT c.lang,
          CAST(CAST(target_ppm AS BIGINT) * 100000 // n_tokens AS BIGINT)
            AS epochs_e6
        FROM c JOIN t ON c.lang = t.lang),
      h AS (
        SELECT doc_id, d.lang, epochs_e6,
          CAST(list_sum(list_transform(range(1, 14),
            k -> (strpos('0123456789abcdef',
                    md5('epoch:' || doc_id)[k:k]) - 1)
                 * CAST(16 ** (13 - k) AS BIGINT))) AS BIGINT) AS hv
        FROM documents d JOIN plan ON d.lang = plan.lang),
      r AS (
        SELECT doc_id, lang,
          epochs_e6 // 1000000
            + CASE WHEN hv % 1000000 < epochs_e6 % 1000000
                   THEN 1 ELSE 0 END AS n_copies
        FROM h)
      SELECT doc_id, lang,
        CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy
      FROM r WHERE n_copies > 0
      ORDER BY doc_id, copy""",

    "shuffle_interleave" -> """
      WITH b AS (
        SELECT doc_id, lang,
          CAST(row_number() OVER (PARTITION BY lang
            ORDER BY md5('interleave:' || doc_id), doc_id) AS BIGINT) AS pos,
          COUNT(*) OVER (PARTITION BY lang) AS n_lang
        FROM documents)
      SELECT doc_id, lang, CAST(pos AS INT) AS pos,
        CAST(pos * 1000000 // n_lang AS BIGINT) AS frac_e6
      FROM b ORDER BY frac_e6, lang, pos""",
  )
}
