package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation capstone: the operators composed into the actual
  * training-data pipeline shape — exact-dedup to keepers, quality
  * filtering, language ID, per-language corpus accounting. Every
  * stage is one of the already-verified operators; this query checks
  * they compose (and stays hash-exact: double-valued scores are used
  * only as filters — identical IEEE trees on both engines — while
  * aggregates stay integral).
  */
object Curate {

  /** Per-doc stats → quality gate → per-language accounting of the
    * given (already deduped) docs — the shared tail of both capstones. */
  private def qualityAccounting(kept: DataFrame): DataFrame = {
    val t = filter(split(lower(col("text")), "\\s+"), x => length(x) > 0)
    val nTok = size(t)
    val nChars = length(col("text"))
    val nPunct = nChars - length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", ""))
    val nStop = size(filter(t, x => x.isInCollection(
      Seq("the", "a", "of", "and", "to", "in", "is", "on"))))
    val stats = kept
      .select(col("doc_id"), col("lang"),
        nTok.as("n_tokens"), nChars.as("n_chars"),
        (nPunct.cast("double") / nChars).as("punct_ratio"),
        (nStop.cast("double") / nTok).as("stopword_ratio"))
      .withColumn("quality_score",
        when(col("n_tokens") < 5, 0.0).otherwise(
          lit(1.0) - col("punct_ratio") * 2.0 -
            abs(col("stopword_ratio") - 0.4)))
    stats
      .filter(col("quality_score") > 0.2)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("total_tokens"),
           sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))
  }

  def curateCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Dedup.withPlants(Tables.documents(s, d))
    // exact dedup: keep the min doc_id of every content group
    val keepers = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    qualityAccounting(docs.join(keepers, Seq("doc_id"), "left_semi"))
  }

  /** curate_neardup: the stricter capstone — NEAR-duplicate removal.
    * minhash-LSH candidate pairs → connected components → drop every
    * doc that is in a cluster but is not its minimum (transitive
    * near-dups die even when they share no band with the keeper
    * directly), then the same quality gate + accounting. This is the
    * full production shape: banding, clustering, and curation
    * composed end-to-end, each stage an equi-join or aggregate. */
  def curateNearDup(s: SparkSession, d: String): DataFrame =
    curateNearDupOn(Dedup.withPlants(Tables.documents(s, d)))

  def curateNearDupOn(docs: DataFrame): DataFrame = {
    val clusters = Dedup.connectedComponentsSafe(Dedup.minhashCandidates(docs))
    val losers = clusters.filter(col("node") =!= col("cluster_id"))
      .select(col("node").as("doc_id"))
    qualityAccounting(docs.join(losers, Seq("doc_id"), "left_anti"))
  }

  /** pack_sequences: concat-and-chunk packing — the step that turns a
    * curated corpus into fixed-size training windows. Documents are
    * concatenated in (lang, doc_id) order and cut every `cap` tokens;
    * each doc gets its window id and offset.
    *
    * Scale shape — distributed prefix sum, NOT one window per
    * language (a `Window.partitionBy(lang)` over doc rows serializes
    * each language onto one task; at 100 TB with a handful of
    * languages that is the whole job on 5 cores):
    *   1. per-(lang, shard) token totals — one partial agg,
    *   2. shard-level running totals — a window over SHARD rows
    *      (thousands, not billions),
    *   3. broadcast the shard prefixes back, local cumsum within each
    *      (lang, shard) partition.
    * Integer arithmetic end-to-end, so the decomposition is exactly
    * equal to the naive single-window form (spec'd), and the oracle
    * is the naive form in DuckDB. */
  def packSequences(s: SparkSession, d: String, cap: Int = 512,
                    shardSize: Long = 100): DataFrame =
    packSequences(Tables.documents(s, d), cap, shardSize)

  /** (lang, doc_id, n_tokens, cum_before): the distributed prefix sum
    * shared by [[packSequences]] and [[packSegments]].
    *
    * `tokenCounts`: optional PRECOMPUTED per-doc budget (doc_id,
    * n_tokens) — e.g. real-tokenizer counts from
    * [[graft.functions.Bpe.docTokenCounts]] — replacing the default
    * whitespace count; docs absent from it pack as 0 tokens (they
    * emit no segments). */
  private def cumBefore(docsIn: DataFrame, shardSize: Long,
                        tokenCounts: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTok = size(graft.functions.TextFunctions.tokens(col("text")))
    val base = tokenCounts match {
      case Some(tc) => docsIn.join(
          tc.select(col("doc_id"), col("n_tokens").as("_tc")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("_tc"), lit(0L)).cast("long").as("n_tokens"))
      case None => graft.Util
        // tokenizing every doc is the scan-stage CPU here — spread a
        // single-split input across cores before counting; gated,
        // because at small inputs the repartition costs more than the
        // serialization it prevents (token counting is cheap per row)
        .fanOutIfAtLeast(docsIn.select(col("doc_id"), col("lang"), col("text")))
        .select(col("doc_id"), col("lang"), nTok.cast("long").as("n_tokens"))
    }
    val docs = base
      .withColumn("shard", expr(s"doc_id div $shardSize"))
    val shardTotals = docs.groupBy(col("lang"), col("shard"))
      .agg(sum(col("n_tokens")).as("shard_tokens"))
    val wShards = Window.partitionBy(col("lang")).orderBy(col("shard"))
    val shardPrefix = shardTotals
      .withColumn("shard_prefix",
        coalesce(sum(col("shard_tokens"))
          .over(wShards.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("shard"), col("shard_prefix"))
    val wLocal = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
    docs.join(broadcast(shardPrefix), Seq("lang", "shard"))
      .withColumn("cum_before",
        col("shard_prefix") +
          coalesce(sum(col("n_tokens"))
            .over(wLocal.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("cum_before"))
  }

  // bin_id stays BIGINT: at 100 TB (~2e13 tokens / cap 512) window
  // ids pass 4e10 and would overflow INT; offsets/lengths are < cap
  // and per-doc counts bounded, so those stay INT
  def packSequences(docsIn: DataFrame, cap: Int, shardSize: Long): DataFrame =
    cumBefore(docsIn, shardSize)
      .select(col("lang"), col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
        expr(s"cum_before div $cap").as("bin_id"),
        expr(s"CAST(cum_before % $cap AS INT)").as("bin_offset"))
      .orderBy(col("lang"), col("doc_id"))

  /** pack_segments: TRUE concat-and-chunk packing — where
    * [[packSequences]] assigns each doc the window its first token
    * lands in, this emits one row per (doc, window) SEGMENT: a doc
    * whose tokens span a window boundary is split, so every window
    * holds exactly `cap` tokens (except each language's tail). This is
    * the row set a training loader materializes.
    *
    * The fan-out is a bounded Generate over the already-computed exact
    * offsets: a doc covers windows cum_before/cap ..
    * (cum_before+n_tokens-1)/cap — ⌈n_tokens/cap⌉+1 rows at most, so
    * output is Θ(total_tokens / cap + n_docs) regardless of skew. The
    * sequence() is a plain codegen'd expression (NOT a lambda HOF —
    * those are CodegenFallback and pathological under Generate). */
  def packSegments(s: SparkSession, d: String, cap: Int = 512,
                   shardSize: Long = 100): DataFrame =
    packSegments(Tables.documents(s, d), cap, shardSize)

  def packSegments(docsIn: DataFrame, cap: Int, shardSize: Long): DataFrame =
    packSegments(docsIn, cap, shardSize, None)

  /** [[packSegments]] over an optional precomputed token budget (see
    * [[cumBefore]]) — the entry [[graft.Pipeline]] uses when a BPE
    * merge artifact supplies real-tokenizer counts. */
  def packSegments(docsIn: DataFrame, cap: Int, shardSize: Long,
                   tokenCounts: Option[DataFrame]): DataFrame =
    cumBefore(docsIn, shardSize, tokenCounts)
      .filter(col("n_tokens") > 0)
      .withColumn("bin_id", explode(sequence(
        expr(s"cum_before div $cap"),
        expr(s"(cum_before + n_tokens - 1) div $cap"))))
      .select(col("lang"), col("doc_id"),
        col("n_tokens").cast("int").as("n_tokens"),
        expr(s"CAST(bin_id - (cum_before div $cap) AS INT)").as("seg_idx"),
        col("bin_id"),
        expr(s"CAST(greatest(0L, cum_before - bin_id * $cap) AS INT)")
          .as("bin_offset"),
        expr(s"CAST(greatest(0L, bin_id * $cap - cum_before) AS INT)")
          .as("seg_start"),
        expr(s"CAST(least(n_tokens, (bin_id + 1) * $cap - cum_before) - " +
             s"greatest(0L, bin_id * $cap - cum_before) AS INT)").as("seg_len"))
      .orderBy(col("lang"), col("doc_id"), col("bin_id"))

  /** pack_masked: the span-corruption masks
    * ([[graft.functions.TextFunctions.maskSpans]]) TRANSLATED INTO
    * PACKED-WINDOW COORDINATES — the row set a trainer actually
    * consumes: [[packSegments]] decides where each doc's tokens land
    * (window id + offset), the masks say which doc positions corrupt,
    * and this intersects the two so every output row is (window,
    * in-window start, length) ready for the data loader, with doc
    * lineage kept for audits. A mask span crossing a window boundary
    * splits with the segment that carries it; total masked positions
    * are CONSERVED through packing (every masked token lands in
    * exactly one window — spec'd corpus-wide).
    *
    * Scale shape: one doc-keyed equi-join of two frames the
    * components already produce (segments: Θ(tokens/cap + docs)
    * rows; masks: sparse per doc) + per-row interval arithmetic —
    * nothing new shuffles beyond the doc-keyed join. */
  def packMasked(s: SparkSession, d: String, cap: Int = 512,
                 shardSize: Long = 100): DataFrame =
    packMaskedOn(Tables.documents(s, d), cap, shardSize)

  /** Corpus-parameterized core of [[packMasked]]. */
  def packMaskedOn(docs: DataFrame, cap: Int, shardSize: Long): DataFrame = {
    // ONE tokenize shared by packer and masker (both consume only
    // the per-doc count): the counts frame checkpoints eagerly so
    // the two lazy consumers read it instead of re-scanning text
    // (the ccnetBuckets localCheckpoint precedent)
    val counts = graft.Util.fanOutIfAtLeast(
        docs.select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("lang"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n_tokens"))
      .localCheckpoint()
    val segs = packSegments(docs, cap, shardSize,
        Some(counts.select(col("doc_id"), col("n_tokens"))))
      .select(col("lang"), col("doc_id"), col("bin_id"), col("bin_offset"),
        col("seg_start"), col("seg_len"))
    val masks = graft.functions.TextFunctions.maskSpansFromCounts(
      counts.select(col("doc_id"), col("n_tokens")))
    segs.join(masks, Seq("doc_id"))
      .withColumn("lo", greatest(col("span_start"), col("seg_start")))
      .withColumn("hi", least(col("span_start") + col("span_len"),
        col("seg_start") + col("seg_len")))
      .filter(col("hi") > col("lo"))
      .select(col("lang"), col("doc_id"), col("bin_id"),
        (col("bin_offset") + (col("lo") - col("seg_start")))
          .cast("int").as("win_start"),
        (col("hi") - col("lo")).cast("int").as("win_len"))
      .orderBy(col("lang"), col("doc_id"), col("bin_id"), col("win_start"))
  }

  /** pack_bestfit: FIRST-FIT-DECREASING bin packing within each
    * (lang, shard) — the third packing form, cutting the padding and
    * cross-document-attention waste the concat-and-chunk pair
    * ([[packSequences]]/[[packSegments]]) accepts: docs never split
    * across windows, so a training loader gets whole documents per
    * window at the cost of per-bin padding, and FFD (sort by token
    * count DESC, first bin that fits, open a new bin otherwise) is
    * the classic 11/9·OPT+1 heuristic that keeps that padding small.
    * Deterministic end to end: item order is (n_tokens DESC, doc_id),
    * bins are probed in creation order, a doc longer than `cap`
    * truncates to `cap` (packed < n_tokens marks it — the waste the
    * DQ gate can consume alongside per-bin padding).
    *
    * Scale shape: one token-count pass (fanned out), then ONE
    * groupByKey on (lang, shard) — each group is ≤ shardSize docs of
    * (id, count) pairs, so the per-group FFD is bounded driver-free
    * work and the whole operator is a single shuffle of (id, int)
    * rows. The oracle replays the FFD as a recursive CTE over the
    * bounded per-shard item sequence (bin loads carried as a list). */
  def packBestfit(s: SparkSession, d: String, cap: Int = 512,
                  shardSize: Long = 100): DataFrame =
    packBestfit(Tables.documents(s, d), cap, shardSize)

  def packBestfit(docsIn: DataFrame, cap: Int, shardSize: Long): DataFrame = {
    val s = docsIn.sparkSession
    import s.implicits._
    val nTok = size(graft.functions.TextFunctions.tokens(col("text")))
    val sized = graft.Util
      .fanOutIfAtLeast(docsIn.select(col("doc_id"), col("lang"), col("text")))
      .select(col("lang"), col("doc_id"), nTok.cast("int").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("shard", expr(s"doc_id div $shardSize"))
    sized.select(col("lang"), col("shard"), col("doc_id"), col("n_tokens"))
      .as[(String, Long, Long, Int)]
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (key: (String, Long),
                        it: Iterator[(String, Long, Long, Int)]) =>
        val (lang, shard) = key
        // ≤ shardSize (id, count) pairs per group — bounded memory
        val items = it.map(t => (t._3, t._4)).toArray
          .sortBy { case (id, n) => (-n, id) }
        val loads = scala.collection.mutable.ArrayBuffer.empty[Int]
        items.iterator.map { case (id, n) =>
          val sz = math.min(n, cap)
          val fit = loads.indexWhere(_ + sz <= cap)
          val (bin, off) =
            if (fit < 0) { loads += sz; (loads.length - 1, 0) }
            else { val o = loads(fit); loads(fit) += sz; (fit, o) }
          (lang, shard, id, n, sz, bin, off)
        }
      }
      .toDF("lang", "shard", "doc_id", "n_tokens", "packed", "bin",
        "bin_offset")
      .orderBy(col("lang"), col("shard"), col("bin"), col("bin_offset"))
  }

  /** decontaminate: benchmark-decontamination — find TRAINING docs
    * that share ≥ `minShared` word n-grams with an EVAL-set doc (the
    * GPT-3-style 13-gram overlap check, scaled to this corpus's short
    * synthetic docs as 3-grams/2 hits). The eval set here is carved
    * deterministically from the corpus (doc_id % 50 == 0) so the
    * check is self-contained and oracle-verifiable; in production the
    * eval side is the benchmark suite.
    *
    * Scale shape: the eval index is benchmark-sized (thousands of
    * docs, not billions) — it is BROADCAST, so the training-corpus
    * shingle stream joins map-side with no shuffle of the big side;
    * the only shuffle is the (train_id, eval_id) count aggregation,
    * whose cardinality is bounded by actual contamination. */
  def decontaminate(s: SparkSession, d: String, n: Int = 3,
                    minShared: Long = 2): DataFrame = {
    val docs = Tables.documents(s, d)
    decontaminate(docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0), n, minShared,
      broadcastEval = true)
  }

  /** The shuffle-form of [[decontaminate]]: identical result set, but
    * the contamination join shuffles on the shingle (shuffle_hash)
    * instead of broadcasting the eval index — the plan the pipeline
    * runs when the eval side is itself corpus-scale (a 20% holdout
    * can't be broadcast). Exposed as its own query key so the
    * shuffle-join path is oracle-verified, not just plan-spec'd; it
    * shares decontaminate's oracle because the two forms are
    * result-identical by construction. */
  def decontaminateShuffle(s: SparkSession, d: String, n: Int = 3,
                           minShared: Long = 2): DataFrame = {
    val docs = Tables.documents(s, d)
    decontaminate(docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0), n, minShared,
      broadcastEval = false)
  }

  /** General form: contamination pairs between any training frame and
    * any eval frame. `broadcastEval = true` is for the usual case of
    * a benchmark-sized eval set (map-side join, no shuffle of the
    * corpus shingles); pass false when the eval side is itself a
    * corpus-scale slice (e.g. a 20% holdout split) — the join then
    * shuffles on the shingle like the other inverted-index dedups,
    * instead of broadcasting an index that cannot fit. */
  def decontaminate(trainDocs: DataFrame, evalDocs: DataFrame,
                    n: Int, minShared: Long,
                    broadcastEval: Boolean): DataFrame = {
    val evalSh = Dedup.shingles(evalDocs, n)
      .select(col("doc_id").as("eval_id"), col("shingle"))
    val trainSh = Dedup.shingles(trainDocs, n)
      .select(col("doc_id").as("train_id"), col("shingle"))
    val joined =
      if (broadcastEval) trainSh.join(broadcast(evalSh), "shingle")
      else trainSh.join(evalSh.hint("shuffle_hash"), "shingle")
    joined
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
      .orderBy(col("train_id"), col("eval_id"))
  }

  /** Contamination pairs from PRE-SHINGLED `(train_id, shingle)` /
    * `(eval_id, shingle)` frames — the maintained-index form of
    * [[decontaminate]] the daily pipeline runs (today's docs against
    * a stored shingle artifact, in either direction): same
    * per-pair distinct-shared-shingle count, same threshold, a
    * shingle-keyed shuffle_hash join (the index cannot broadcast at
    * corpus scale). Frames must carry DISTINCT (id, shingle) rows —
    * [[graft.operators.Dedup.shingles]]'s per-doc contract. */
  def contaminationPairsSh(trainSh: DataFrame, evalSh: DataFrame,
                           minShared: Long): DataFrame =
    trainSh.join(evalSh.hint("shuffle_hash"), "shingle")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)

  /** decontaminate_bloom — Bloom-filter decontamination (the Dolma
    * posture: the eval set compresses to a BIT ARRAY, not an index):
    * eval shingles set k=4 md5-salted bits in an m-bit filter; every
    * training shingle probes the filter map-side, and a doc with ≥
    * `minHits` flagged DISTINCT shingles is held for review. At
    * 100 TB the filter is m/8 bytes — broadcast to every executor,
    * OR-mergeable across eval shards — and the corpus pays NO
    * shingle-keyed shuffle at all (the [[decontaminate]] join only
    * runs over the held docs, if exactness is needed). NO false
    * negatives by construction (an exact member sets all k bits —
    * flagged ⊇ contaminated, spec'd); false positives are the m/k
    * trade. The exact verdict is emitted alongside so the oracle
    * checks filter mechanics AND truth (the sketch_bloom
    * discipline). */
  def decontaminateBloom(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    decontaminateBloom(docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0))
  }

  def decontaminateBloom(trainDocs: DataFrame, evalDocs: DataFrame,
                         n: Int = 3, minHits: Long = 2): DataFrame = {
    import graft.operators.{Sketches => Sk}
    val js = typedlit((0 until Sk.BloomK).toArray)
    val evalSh = Dedup.shingles(evalDocs, n)
      .select(col("shingle")).distinct().localCheckpoint()
    val bits = evalSh.select(explode(js).as("j"), md5(col("shingle")).as("h"))
      .select(Sk.bloomPos(col("h")).as("pos")).distinct()
    val tSh = Dedup.shingles(trainDocs, n)
      .select(col("doc_id"), col("shingle")).localCheckpoint()
    val flagged = tSh
      .select(col("doc_id"), col("shingle"), explode(js).as("j"),
        md5(col("shingle")).as("h"))
      .select(col("doc_id"), col("shingle"), Sk.bloomPos(col("h")).as("pos"))
      .join(broadcast(bits), Seq("pos"))
      .groupBy(col("doc_id"), col("shingle"))
      .agg(count(lit(1)).as("nhit"))
      .filter(col("nhit") === Sk.BloomK)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_flagged"))
    val exact = tSh
      .join(broadcast(evalSh), Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    tSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      .join(flagged, Seq("doc_id"), "left_outer")
      .join(exact, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_flagged"), lit(0L)) >= minHits).as("flagged"),
        (coalesce(col("n_shared"), lit(0L)) >= minHits).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** decontaminate_excise — MINIMAL-REMOVAL decontamination: instead
    * of dropping every training doc that shares n-grams with the eval
    * set ([[decontaminate]], the curation default), cut ONLY the
    * contaminated character windows and keep the rest of the doc —
    * the surgery production pipelines reach for when whole-doc
    * removal would cost too much data (a long doc quoting one
    * benchmark question is 99% clean).
    *
    * Mechanics: train-side char windows ([[Dedup.spansWithOffsets]],
    * the dedup_spans decomposition) whose hash exists ANYWHERE in the
    * eval side's window set are hit; hits coalesce into islands and
    * excise through the [[Dedup.exciseHitWindows]] surgery — shared
    * with dedup_spans_excise, so the two cut semantics cannot drift.
    * Within-train duplication is deliberately NOT a hit criterion
    * (that is dedup's job, not decontamination's).
    *
    * Scale shape: the eval window-hash set is benchmark-sized →
    * broadcast left-semi join against the distributed train window
    * stream (no shuffle of the corpus); pass broadcastEval = false
    * for a corpus-scale holdout and the semi-join shuffles on the
    * hash instead. The surgery is per-doc linear. */
  def decontaminateExcise(trainDocs: DataFrame, evalDocs: DataFrame,
                          spanLen: Int = 32, marker: String = "~",
                          broadcastEval: Boolean = true): DataFrame = {
    val evalHashes = Dedup.spansWithOffsets(evalDocs, spanLen)
      .select(col("span_hash")).distinct()
    val trainSpans = Dedup.spansWithOffsets(trainDocs, spanLen)
    val hits = (if (broadcastEval)
        trainSpans.join(broadcast(evalHashes), Seq("span_hash"), "left_semi")
      else
        trainSpans.join(evalHashes.hint("shuffle_hash"),
          Seq("span_hash"), "left_semi"))
      .select(col("doc_id"), col("off"))
    Dedup.exciseHitWindows(trainDocs, hits, spanLen, marker)
  }

  /** The oracle-gated query form: eval docs are the `% 50 == 0`
    * slice (the [[decontaminate]] convention); contaminated training
    * docs are PLANTED in-query (ids + 200000 wrapping an 80-char eval
    * quote in clean framing) so the surgery has real work — the
    * natural token soup shares no exact 32-char window across docs. */
  def decontaminateExcise(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val eval = docs.filter(col("doc_id") % 50 === 0)
    val planted = eval.filter(col("doc_id") < 150)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(lit("zzz "), substring(col("text"), 1, 80), lit(" qqq"))
          .as("text"))
    val train = docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), col("text"))
      .unionByName(planted)
    decontaminateExcise(train, eval)
  }

  /** text_ngram_novelty — the per-doc MEMORIZATION/OVERLAP score
    * (Lee et al. 2022 §5, the GPT-3 appendix-C metric): for every
    * eval-split doc, the fraction of its DISTINCT word n-grams absent
    * from the train split. decontaminate GATES on absolute shared
    * counts between doc pairs; novelty SCORES each doc against the
    * train set as a whole — the number a memorization audit or a
    * generated-text novelty report publishes. Eval = the `% 5 == 0`
    * slice (a 20% holdout — corpus-scale, so nothing broadcasts).
    *
    * Scale shape: one DISTINCT over the train shingle stream, then a
    * shingle-keyed shuffle_hash equi-join (the decontaminateShuffle
    * plan — a 20%-of-corpus eval side can never broadcast) feeding a
    * per-doc partial agg. Counts exact BIGINTs; novel_frac is ONE
    * double division, 6 dp. */
  def textNgramNovelty(s: SparkSession, d: String, n: Int = 3): DataFrame = {
    val docs = Tables.documents(s, d)
    ngramNovelty(docs.filter(col("doc_id") % 5 =!= 0),
      docs.filter(col("doc_id") % 5 === 0), n)
  }

  /** General form: per-eval-doc novelty against any train frame. */
  def ngramNovelty(trainDocs: DataFrame, evalDocs: DataFrame,
                   n: Int): DataFrame =
    ngramNoveltySh(
      Dedup.shingles(trainDocs, n).select(col("shingle")).distinct(),
      Dedup.shingles(evalDocs, n).select(col("doc_id"), col("shingle")))

  /** Pre-shingled form — the maintained-artifact/streaming entry
    * point (a stored train shingle set scores every arriving batch
    * without re-shingling the corpus): `trainSh` carries DISTINCT
    * `shingle` rows, `evalSh` distinct `(doc_id, shingle)` rows
    * ([[graft.operators.Dedup.shingles]]'s per-doc contract). */
  def ngramNoveltySh(trainSh: DataFrame, evalSh: DataFrame): DataFrame =
    evalSh
      .join(trainSh.withColumn("seen", lit(1L)).hint("shuffle_hash"),
        Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("seen"), lit(0L))).as("n_seen"))
      .select(col("doc_id"), col("n_ngrams"), col("n_seen"),
        round((col("n_ngrams") - col("n_seen")).cast("double") /
          col("n_ngrams").cast("double"), 6).as("novel_frac"))
      .orderBy(col("doc_id"))

  /** SERVING form of [[ngramNoveltySh]] for small eval batches (the
    * streaming path): n_seen comes from an INNER join with the eval
    * side BROADCAST — the corpus shingle artifact then streams
    * MAP-SIDE with no shuffle at all (a left join can't broadcast its
    * left side, so the shuffle-free plan needs the totals/seen
    * split); totals come from the batch alone. Result-identical to
    * [[ngramNoveltySh]] (spec'd): both inputs carry DISTINCT rows, so
    * inner-join counts are exactly the seen counts. Per-batch cost is
    * ONE corpus-artifact scan; at 100 TB the scan itself is fronted
    * by the Bloom bit-set (decontaminate_bloom's machinery) or a
    * shingle-bucketed layout when batches are tiny. */
  def ngramNoveltyServe(trainSh: DataFrame, evalSh: DataFrame): DataFrame = {
    val totals = evalSh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"))
    val seen = trainSh.join(broadcast(evalSh), Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_seen"))
    totals.join(seen, Seq("doc_id"), "left")
      .withColumn("n_seen", coalesce(col("n_seen"), lit(0L)))
      .select(col("doc_id"), col("n_ngrams"), col("n_seen"),
        round((col("n_ngrams") - col("n_seen")).cast("double") /
          col("n_ngrams").cast("double"), 6).as("novel_frac"))
      .orderBy(col("doc_id"))
  }

  /** split_assign: deterministic train/val/test assignment — md5 of a
    * salted doc key → bucket 0-99 → 80/10/10. No RNG, no sampling: a
    * doc's split NEVER changes as the corpus grows or repartitions
    * (the property that keeps eval sets honest across pipeline runs),
    * and assignment is embarrassingly parallel. md5 is shared with
    * DuckDB, so the oracle checks the actual assignments. */
  def splitAssign(s: SparkSession, d: String): DataFrame =
    splitAssign(Tables.documents(s, d))

  def splitAssign(docs: DataFrame): DataFrame = {
    val hex = md5(concat(lit("split:"), col("doc_id")))
    val bucket = (conv(substring(hex, 1, 8), 16, 10).cast("long") % 100).cast("int")
    docs
      .select(col("doc_id"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))
  }

  /** split_stratified: train/val/test with EXACT per-stratum quotas —
    * every language contributes floor(n·0.8)/floor(n·0.9) cut points
    * of its own population, so small strata are never starved by
    * hash variance (the property data-mixing recipes need;
    * [[splitAssign]]'s per-doc hash bucket only hits the 80/10/10
    * ratios in expectation). Order within a stratum is the md5 of a
    * salted doc key — deterministic, RNG-free, engine-portable.
    *
    * Trade vs splitAssign (both kept, different contracts):
    * stratified assignment is RANK-based, so it pays one window sort
    * per stratum (a single lang-partitioned shuffle) and a doc's
    * split CAN change when the stratum grows; the hash split is
    * growth-stable and sort-free. Exactness or stability — choose per
    * use. */
  def splitStratified(s: SparkSession, d: String): DataFrame =
    splitStratified(Tables.documents(s, d))

  def splitStratified(docs: DataFrame, trainCut: Double = 0.8,
                      valCut: Double = 0.9): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(concat(lit("strat:"), col("doc_id"))), col("doc_id"))
    val cw = Window.partitionBy(col("lang"))
    docs.select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cw))
      .withColumn("split",
        when(col("rn") <= floor(col("n") * trainCut), "train")
          .when(col("rn") <= floor(col("n") * valCut), "val")
          .otherwise("test"))
      .select(col("doc_id"), col("lang"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** sample_mixture: deterministic weighted mixture sample — the
    * data-mixing step of a training run ("40% en, 20% zh, ..." of a
    * `budget`): each stratum contributes its floor(weight·budget)
    * quota, selected by salted-md5 rank (RNG-free, so the mix is
    * reproducible and engine-replayable; a stratum smaller than its
    * quota contributes everything it has). Quotas are computed
    * DRIVER-side and embedded as literals — no cross-engine float
    * math in the query. Scale shape: one lang-partitioned window
    * shuffle, same as [[splitStratified]]; languages not in the mix
    * are filtered before the sort. */
  def sampleMixture(s: SparkSession, d: String): DataFrame =
    sampleMixture(Tables.documents(s, d), DefaultMixWeights, DefaultMixBudget)

  /** Default mix over the corpus's five languages; budget 250 ≈ half
    * the sf0.01 corpus, so quotas bind (en capped) without starving
    * any stratum. */
  private[graft] val DefaultMixWeights = Map(
    "en" -> 0.40, "zh" -> 0.20, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.10)
  private[graft] val DefaultMixBudget = 250L

  private[graft] def mixQuotas(weights: Map[String, Double],
                               budget: Long): Map[String, Long] =
    weights.map { case (k, frac) => k -> math.floor(frac * budget).toLong }

  def sampleMixture(docs: DataFrame, weights: Map[String, Double],
                    budget: Long): DataFrame = {
    val quotas = mixQuotas(weights, budget)
    val quota = quotas.foldLeft(lit(0L)) { case (acc, (k, q)) =>
      when(col("lang") === k, lit(q)).otherwise(acc)
    }
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(concat(lit("mix:"), col("doc_id"))), col("doc_id"))
    docs.select(col("doc_id"), col("lang"))
      .filter(col("lang").isin(quotas.keys.toSeq: _*))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Literal target mixture for the plan/upsample pair — the
    * DoReMi-style OUTPUT weights a mixing run executes, in exact ppm
    * (parts per million, summing 1e6) so every derived quantity
    * stays integer. */
  private[graft] val DefaultTargetPpm = Seq(
    "de" -> 150000L, "en" -> 400000L, "es" -> 150000L,
    "fr" -> 150000L, "zh" -> 150000L)
  private[graft] val DefaultMixTokenBudget = 100000L

  /** mixture_plan: the data-mixing EPOCHS arithmetic — given target
    * mixture weights (ppm literals: what a DoReMi/manual mixing run
    * decides) and a total token budget, how many times must each
    * language's corpus repeat to fill its share?
    * epochs_l = target_l · budget / tokens_l — emitted ×1e6 as an
    * exact BIGINT (one integer floor-division; ppm × budget stays
    * far under 2^63). epochs_e6 > 1e6 means the language UPSAMPLES
    * (repeats across epochs — the low-resource case the mixture
    * exists to protect); < 1e6 means one pass covers it. One
    * aggregate scan + a 5-row broadcast join — nothing at corpus
    * scale beyond the token count. */
  def mixturePlan(s: SparkSession, d: String,
                  targets: Seq[(String, Long)] = DefaultTargetPpm,
                  budget: Long = DefaultMixTokenBudget): DataFrame =
    mixturePlan(Tables.documents(s, d), targets, budget)

  /** mixture_reweight — ONE step of DoReMi-style domain reweighting
    * (Xie et al. 2023: Group-DRO upweights domains with high EXCESS
    * loss against a reference model; the learned weights then feed
    * the mixture plan): per source language, the mean excess loss
    * comes from [[graft.functions.TextFunctions.selectLearnability]]
    * (self-model surprise − reference surprise), the multiplicative-
    * weights update boosts the source by exp(η·excess) off its
    * current corpus share, weights renormalize, and the final target
    * mixes with uniform smoothing — target_ppm =
    * floor((1−c)·w·1e6 + c·1e6/k + ½), DoReMi's c-smoothed output
    * that [[mixturePlan]]/[[sampleTemperature]] consume as targets.
    *
    * Determinism: per-source means are exact DECIMAL(13,6) sums of
    * already-6-dp deltas, ONE division, 6 dp; exp only ever on an
    * already-rounded value; share/boost/u each one IEEE op re-rounded
    * 6 dp; Z is an exact DECIMAL sum of the 6-dp u values (a plain
    * float Σ over sources is aggregation-order-dependent even at 5
    * rows), one division; the ppm lands by explicit floor. η=1 and
    * c=0.5 are binary-exact literals ((1 − 0.5) written as the
    * expression on both engines — the one-ulp literal trap).
    *
    * Scale shape: the two LM chains + one doc_id equi-join + ONE
    * language partial agg; everything after lives on the
    * sources-sized frame (unpartitioned windows over ≤ a-few-dozen
    * rows — the blessed tiny-agg-frame pattern, never a crossJoin
    * of the 1-row total). */
  def mixtureReweight(s: SparkSession, d: String, eta: Double = 1.0,
                      smooth: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val delta = graft.functions.TextFunctions.selectLearnability(s, d)
      .select(col("doc_id"), col("delta"))
    val src = delta.join(
      Tables.documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    src.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("delta").cast(DecimalType(13, 6))).cast("double") /
          count(lit(1)), 6).as("excess"))
      .withColumn("share",
        round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(wAll).cast("double"), 6))
      .withColumn("boost", round(exp(lit(eta) * col("excess")), 6))
      .withColumn("u", round(col("share") * col("boost"), 6))
      .withColumn("w",
        round(col("u") /
          sum(col("u").cast(DecimalType(13, 6))).over(wAll).cast("double"),
          6))
      .withColumn("target_ppm",
        floor((lit(1.0) - lit(smooth)) * col("w") * lit(1e6) +
          lit(smooth) * lit(1e6) /
            count(lit(1)).over(wAll).cast("double") + lit(0.5))
          .cast("long"))
      .select(col("lang"), col("n_docs"), col("excess"), col("share"),
        col("boost"), col("w"), col("target_ppm"))
      .orderBy(col("lang"))
  }

  def mixturePlan(docs: DataFrame, targets: Seq[(String, Long)],
                  budget: Long): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val t = targets.toDF("lang", "target_ppm")
    val counts = graft.Util
      .fanOutIfAtLeast(docs.select(col("doc_id"), col("lang"), col("text")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long")).as("n_tokens"))
    counts.join(broadcast(t), "lang")
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("target_ppm").cast("int").as("target_ppm"),
        expr(s"target_ppm * $budget div n_tokens").as("epochs_e6"))
      .orderBy(col("lang"))
  }

  /** upsample_epochs: EXECUTE the mixture plan — each doc repeats
    * floor(epochs) times plus one more with probability
    * frac(epochs), decided by a deterministic md5 uniform (RNG-free:
    * u_e6 = 13-nibble md5 fold mod 1e6 < epochs_e6 mod 1e6 — pure
    * integer compare, engine-identical). In expectation every
    * language contributes exactly its target token share; the output
    * is the (doc_id, copy) multiset a training loader consumes.
    * Scale shape: the plan is a 5-row broadcast; the explode is
    * sequence(1, n_copies) — fan-out bounded by the epochs, rows
    * never collect. */
  def upsampleEpochs(s: SparkSession, d: String,
                     targets: Seq[(String, Long)] = DefaultTargetPpm,
                     budget: Long = DefaultMixTokenBudget): DataFrame =
    upsampleEpochs(Tables.documents(s, d), targets, budget)

  def upsampleEpochs(docs: DataFrame, targets: Seq[(String, Long)],
                     budget: Long): DataFrame = {
    val plan = mixturePlan(docs, targets, budget)
      .select(col("lang"), col("epochs_e6"))
    val hv = conv(substring(md5(concat(lit("epoch:"), col("doc_id"))), 1, 13),
      16, 10).cast("long")
    docs.select(col("doc_id"), col("lang"))
      .join(broadcast(plan), "lang")
      .withColumn("n_copies",
        expr("epochs_e6 div 1000000") +
          when(hv % 1000000L < col("epochs_e6") % 1000000L, 1L)
            .otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
      .select(col("doc_id"), col("lang"), col("copy").cast("int").as("copy"))
      .orderBy(col("doc_id"), col("copy"))
  }

  /** shuffle_interleave: the deterministic TRAINING ORDER — a global
    * shuffle that keeps every language proportionally interleaved
    * (a plain global md5 shuffle leaves locally unbalanced runs; a
    * training loader reading the first 10% must already see the full
    * mixture). Each doc gets a salted-md5 position WITHIN its
    * language (pos), and the global order key is the language-
    * relative fraction frac_e6 = pos·1e6 div n_lang — sorting by
    * (frac_e6, lang, pos) interleaves languages proportionally at
    * every prefix (prefix of length k·1e-6 holds ≈k·share_l docs of
    * language l). All integers; the md5 hex order is identical in
    * both engines. Scale shape: one lang-keyed window shuffle + one
    * distributed range sort — NO global row_number (a global window
    * would single-partition at 100 TB; the order key columns ARE the
    * rank). */
  def shuffleInterleave(s: SparkSession, d: String): DataFrame =
    shuffleInterleave(Tables.documents(s, d))

  def shuffleInterleave(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(concat(lit("interleave:"), col("doc_id"))), col("doc_id"))
    val cw = Window.partitionBy(col("lang"))
    docs.select(col("doc_id"), col("lang"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("n_lang", count(lit(1)).over(cw))
      .select(col("doc_id"), col("lang"), col("pos").cast("int").as("pos"),
        expr("pos * 1000000 div n_lang").as("frac_e6"))
      .orderBy(col("frac_e6"), col("lang"), col("pos"))
  }

  /** sample_temperature: temperature-scaled multilingual mixture —
    * the mT5/XLM-R α-sampling step: language l samples ∝ n_l^α
    * (α = 1/T < 1 flattens the natural distribution so low-resource
    * languages aren't drowned by the head language). Unlike
    * [[sampleMixture]]'s hand-specified weights, quotas here derive
    * from the DATA, computed entirely in-plan on both engines.
    *
    * α is fixed at 0.5 deliberately: n^0.5 = sqrt(n), and IEEE-754
    * REQUIRES sqrt to be correctly rounded (general pow() is
    * libm-dependent — not portable cross-engine). The quota
    * arithmetic is then EXACT INTEGERS end to end: s_l =
    * floor(sqrt(n_l)·1e9 + 0.5) snaps the (bit-identical) sqrt to
    * 1e-9-grid units, W = Σ s_l is an exact BIGINT sum, and
    * quota_l = (budget · s_l) div W is one integer floor-division —
    * no float accumulation or division anywhere (the PQ-ADC recipe
    * applied to mixture math). Selection within a language is the
    * salted-md5 rank, RNG-free. Scale shape: one tiny lang-count agg
    * broadcast back + one lang-partitioned window — the sampleMixture
    * plan with a computed quota. */
  def sampleTemperature(s: SparkSession, d: String): DataFrame =
    sampleTemperature(Tables.documents(s, d), DefaultMixBudget)

  def sampleTemperature(docs: DataFrame, budget: Long): DataFrame = {
    val counts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_l"))
      .withColumn("s_int",
        floor(sqrt(col("n_l").cast("double")) * 1e9 + 0.5).cast("long"))
    // total over the LANGUAGE-count frame (a handful of rows): an
    // unpartitioned window sum, not a crossJoin of the 1-row total —
    // that plans as a BroadcastNestedLoopJoin and trips the audit
    val quotas = counts
      .withColumn("w_int", sum(col("s_int"))
        .over(Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("lang"),
        expr(s"CAST(($budget * s_int) div w_int AS INT)").as("quota"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(concat(lit("temp:"), col("doc_id"))), col("doc_id"))
    docs.select(col("doc_id"), col("lang"))
      .join(broadcast(quotas), Seq("lang"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("quota"))
      .select(col("doc_id"), col("lang"), col("quota"))
      .orderBy(col("doc_id"))
  }

  val sampleTemperatureOracle: String = """
    WITH c AS (
      SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY 1),
    s AS (
      SELECT lang, n_l,
        CAST(floor(sqrt(CAST(n_l AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)
          AS s_int
      FROM c),
    tot AS (SELECT CAST(SUM(s_int) AS BIGINT) AS w_int FROM s),
    q AS (
      SELECT lang, CAST((250 * s_int) // w_int AS INT) AS quota
      FROM s, tot),
    r AS (
      SELECT doc_id, lang,
        row_number() OVER (PARTITION BY lang
          ORDER BY md5('temp:' || doc_id), doc_id) AS rn
      FROM documents)
    SELECT r.doc_id, r.lang, q.quota
    FROM r JOIN q USING (lang)
    WHERE rn <= quota
    ORDER BY doc_id"""

  /** Export the (curated) docs as JSONL training shards — the final
    * step of the pipeline, what a training loader actually consumes:
    * `dir/shards/lang=../shard_id=../part-N.json` plus a
    * `(lang, shard_id, n_docs, n_tokens)` manifest parquet. Shard
    * assignment is the [[packSequences]] prefix-sum at shard
    * granularity (shard_id = token-cumsum div budget): docs never
    * split across shards, shards fill to `budget` (+ at most one
    * doc's overhang), assignment is deterministic and append-stable
    * in doc_id order. Scale shape: the same two-level prefix sum as
    * packing (shard totals → shard-prefix window → local cumsum — no
    * global window), one partitioned JSON write, one manifest agg.
    * Returns the manifest as read back from disk. */
  def writeTrainingShards(docs: DataFrame, dir: String,
                          budget: Long = 20000,
                          shardSize: Long = 100,
                          tokenCounts: Option[DataFrame] = None): DataFrame = {
    val s = docs.sparkSession
    val assigned = cumBefore(docs, shardSize, tokenCounts)
      .withColumn("shard_id", expr(s"cum_before div $budget"))
      .select(col("doc_id"), col("shard_id"), col("n_tokens"))
    val rows = docs.select(col("doc_id"), col("lang"), col("text"))
      .join(assigned, "doc_id")
    rows.select(col("doc_id"), col("n_tokens"), col("text"),
        col("lang"), col("shard_id"))
      .write.mode("overwrite").partitionBy("lang", "shard_id")
      .json(s"$dir/shards")
    // no coalesce(1): the manifest has one row per shard — corpus
    // tokens / budget rows, which grows with the corpus and must not
    // funnel through one task at 100 TB
    rows.groupBy(col("lang"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .write.mode("overwrite").parquet(s"$dir/manifest")
    s.read.parquet(s"$dir/manifest")
  }

  /** chunk_overlap — RAG-style overlapping token chunking: each doc
    * splits into `win`-token windows advancing by `stride` (default
    * 32/24 → 8-token overlap), the retrieval-indexing complement of
    * [[packSegments]]' training packing (packing fills windows across
    * doc boundaries; chunking stays within the doc and overlaps so
    * no query phrase straddles a boundary unseen). Start positions
    * are the multiples of `stride` below max(n − win + stride, 1),
    * so the tail is always covered and a short doc yields exactly
    * one chunk. One typed pass per doc (the HOF-under-Generate
    * trap); chunk CONTENT is hash-verified via md5 of the token-
    * joined text, not just counted. */
  def chunkOverlap(s: SparkSession, d: String, win: Int = 32,
                   stride: Int = 24): DataFrame =
    chunkOverlapOn(Tables.documents(s, d), win, stride)

  def chunkOverlapOn(docsIn: DataFrame, win: Int = 32,
                     stride: Int = 24): DataFrame = {
    val s = docsIn.sparkSession
    import s.implicits._
    graft.Util.fanOut(docsIn.select(col("doc_id"), col("text"))
        .as[(Long, String)])
      .flatMap { case (id, text) =>
        val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val n = toks.length
        val g = math.max(n - win + stride, 1)
        val nStarts = (g - 1) / stride + 1
        (0 until nStarts).iterator.map { i =>
          val st = i * stride
          val end = math.min(st + win, n)
          (id, i, st, end - st, toks.slice(st, end).mkString(" "))
        }
      }
      .toDF("doc_id", "chunk_idx", "start_tok", "n_tok", "chunk_text")
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_tok"), length(col("chunk_text")).as("n_chars"),
        md5(col("chunk_text")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** contrastive_triplets — (anchor, positive, negative) training
    * triplets for embedding/reranker training: positives are the
    * verified minhash near-dup pairs ([[Dedup.minhashCandidates]]),
    * negatives are drawn deterministically (salted-md5 rank, RNG-free
    * like every sampler here) from a FIXED small candidate pool —
    * pool membership is corpus-wide md5 order (so the pool is a
    * bounded broadcast, never an all-pairs join), and each pair
    * ranks the pool by md5(anchor ‖ candidate), skipping the
    * anchor's OWN near-dup partners (a known positive must never be
    * labeled negative — the standard false-negative filter). Scale
    * shape: pairs × 16-row broadcast pool, one window over ≤16 rows
    * per pair. */
  def contrastiveTriplets(s: SparkSession, d: String, poolSize: Int = 16,
                          kNeg: Int = 2): DataFrame = {
    val pairs = Dedup.minhashCandidates(s, d)
    val pool = broadcast(Tables.documents(s, d)
      .select(col("doc_id"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(poolSize)
      .select(col("doc_id").as("neg_cand")))
    val partners = pairs.select(col("d1").as("a"), col("d2").as("p"))
      .unionByName(pairs.select(col("d2").as("a"), col("d1").as("p")))
    val cand = pairs
      .join(pool, col("neg_cand") =!= col("d1") && col("neg_cand") =!= col("d2"))
      // pairs-sized exclusion side: hash beats sort-merge (no sort
      // pass, the CLAUDE.md exploded-join hint), and the join stays
      // co-partitioned at scale — never broadcast a pairs-sized frame
      .join(partners.hint("shuffle_hash"),
        col("a") === col("d1") && col("p") === col("neg_cand"), "left_anti")
    val w = Window.partitionBy(col("d1"), col("d2"))
      .orderBy(md5(concat(col("d1").cast("string"), lit("_"),
        col("neg_cand").cast("string"))), col("neg_cand"))
    cand.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= kNeg)
      .select(col("d1").as("anchor"), col("d2").as("positive"),
        col("neg_cand").as("negative"), col("neg_rank"))
      .orderBy(col("anchor"), col("positive"), col("neg_rank"))
  }

  /** sample_weighted: PER-ROW-weighted sampling without replacement
    * (Efraimidis-Spirakis A-ES) — the generalization of
    * [[sampleMixture]]'s per-stratum quotas to a continuous weight
    * (here n_chars: longer docs proportionally likelier, the
    * length-weighted mix a token-budget-driven run wants). Each row
    * gets key = -ln(u)/w with u a DETERMINISTIC md5-derived uniform;
    * the k smallest keys are exactly a weight-proportional
    * without-replacement draw (Efraimidis & Spirakis 2006), and the
    * whole draw is RNG-free/engine-replayable.
    *
    * Scale shape: key is a map-side expression; "k smallest" is
    * TakeOrdered (per-partition bounded heaps → driver merge of k×P
    * rows) — no global sort, no shuffle of the corpus. Determinism
    * recipe: u = (2h+1)/2^53 from the first 13 md5 nibbles (exact
    * doubles, one IEEE division), ln snapped to the 1e-9 grid (the
    * ngram_lm transcendental recipe), one IEEE division by the
    * integer weight, re-snapped; ranking breaks ties by id. */
  def sampleWeighted(docs: DataFrame, weightCol: String, k: Int,
                     salt: String = "wsample:"): DataFrame = {
    val hv = conv(substring(md5(concat(lit(salt), col("doc_id"))), 1, 13),
      16, 10).cast("long")
    val u = (hv * 2 + 1).cast("double") / lit(9007199254740992.0)
    val key = round(-round(log(u), 9) / col(weightCol).cast("double"), 9)
    // the A-ES key is only meaningful for w > 0: w=0 gives key=+Inf
    // (never sampled, silently) and w<0 a negative key that sorts
    // FIRST (always sampled) — drop non-positive weights explicitly,
    // the only sane semantics for a weight-proportional draw
    docs.filter(col(weightCol).cast("double") > 0)
      .withColumn("es_key", key)
      .orderBy(col("es_key"), col("doc_id"))
      .limit(k)
  }

  def sampleWeighted(s: SparkSession, d: String): DataFrame =
    sampleWeighted(Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars")), "n_chars", 200)

  val sampleWeightedOracle: String = """
    WITH h AS (
      SELECT doc_id, lang, n_chars,
        CAST(list_sum(list_transform(range(1, 14),
          k -> (strpos('0123456789abcdef', md5('wsample:' || doc_id)[k:k]) - 1)
               * CAST(16 ** (13 - k) AS BIGINT))) AS BIGINT) AS hv
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, lang, n_chars,
      round(-round(ln(CAST(hv * 2 + 1 AS DOUBLE) /
                      CAST(9007199254740992 AS DOUBLE)), 9)
            / n_chars, 9) AS es_key
    FROM h ORDER BY es_key, doc_id LIMIT 200"""

  // ---- DSIR: importance-resampling data selection ------------------
  // Xie et al., "Data Selection for Language Models via Importance
  // Resampling" (NeurIPS 2023): score every raw doc by how much more
  // likely its hashed n-gram features are under a TARGET domain's
  // bag-of-ngrams model than under the raw pool's, then keep the
  // top-weighted docs. The 100 TB shape: the λ table is m rows
  // (broadcastable — train once, reuse per scoring run via the
  // write/read artifact pair, the KenLM/Bpe artifact-split pattern);
  // feature extraction is one linear corpus pass; scoring is a
  // broadcast join + partial agg; selection is TakeOrdered (bounded
  // per-partition heaps), never a global window.

  private[graft] val DsirBuckets = 1024
  private[graft] val DsirTopK    = 100

  /** Per-doc hashed n-gram feature counts `(doc_id, lang, feat, k)`:
    * unigrams and bigrams of the whitespace token stream, md5-hashed
    * into `m` buckets (first-8-hex-digit fold — the cross-engine
    * [[graft.operators.Dedup.md5Hash32]] contract). One corpus pass:
    * posexplode + a lead() window partitioned by doc_id (millions of
    * small partitions), both gram arities emitted from the SAME
    * windowed row via a 2-element array explode — no second pass. */
  private[graft] def dsirDocFeats(docs: DataFrame, m: Int): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // the explode runs in the scan stage — spread a single-split
    // input across cores first (single-row-group parquet = one task)
    graft.Util.fanOut(docs.select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("lang"),
        posexplode(graft.functions.TextFunctions.tokens(col("text")))
          .as(Seq("pos", "w1")))
      .withColumn("w2", lead(col("w1"), 1).over(byPos))
      .select(col("doc_id"), col("lang"),
        explode(when(col("w2").isNotNull,
            array(col("w1"), concat_ws(" ", col("w1"), col("w2"))))
          .otherwise(array(col("w1")))).as("gram"))
      .withColumn("feat",
        conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % m)
      .groupBy(col("doc_id"), col("lang"), col("feat"))
      .agg(count(lit(1)).as("k"))
  }

  /** Train the DSIR importance table: per hashed feature bucket,
    * λ_f = ln p_target(f) − ln p_raw(f) under add-1-smoothed
    * bag-of-ngrams models (p = (cnt+1)/(N+m)). Exactly m rows — the
    * broadcastable artifact a production run trains ONCE on a target
    * sample + raw sample and reuses for every scoring pass.
    * Determinism: each p is one IEEE division of exact integers, ln
    * snaps to the 1e-9 grid, λ is an exact DECIMAL(13,9) difference
    * (the ngram_lm transcendental recipe). Totals are unpartitioned
    * window sums over the m-row agg frame (never a 1-row crossJoin —
    * that plans as a BroadcastNestedLoopJoin). */
  def dsirLambda(docFeats: DataFrame,
                 targetPred: org.apache.spark.sql.Column,
                 m: Int = DsirBuckets): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val raw = docFeats.groupBy(col("feat")).agg(sum(col("k")).as("rk"))
    val tgt = docFeats.where(targetPred)
      .groupBy(col("feat")).agg(sum(col("k")).as("tk"))
    raw.join(tgt, Seq("feat"), "left")
      .withColumn("tk", coalesce(col("tk"), lit(0L)))
      .withColumn("nr", sum(col("rk")).over(all))
      .withColumn("nt", sum(col("tk")).over(all))
      .select(col("feat"),
        (round(log((col("tk") + 1).cast("double") / (col("nt") + m)), 9)
           .cast(DecimalType(13, 9)) -
         round(log((col("rk") + 1).cast("double") / (col("nr") + m)), 9)
           .cast(DecimalType(13, 9))).as("lam"))
  }

  /** Persist / reload the λ table (parquet keeps the DECIMAL(13,9)
    * exactly) — the artifact split that makes scoring a single
    * corpus pass at scale. */
  def writeDsirLambda(lambdaDf: DataFrame, dir: String): Unit =
    lambdaDf.coalesce(1).write.mode("overwrite").parquet(dir)
  def readDsirLambda(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)

  /** Score docs against a trained λ table: per-doc importance
    * log-weight Σ_f k_f·λ_f as an EXACT decimal sum
    * (DECIMAL(9,0)×DECIMAL(13,9) products — engine-identical). */
  def dsirScore(docFeats: DataFrame, lambdaDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    docFeats
      .join(broadcast(lambdaDf), Seq("feat"))
      .groupBy(col("doc_id"))
      .agg(min(col("lang")).as("lang"),
        sum(col("k")).as("n_grams"),
        sum(col("k").cast(DecimalType(9, 0)) * col("lam")).as("slw"))
  }

  /** dsir_select: the composed one-shot query — train λ with the
    * target predicate, score the pool, keep the top-k by exact
    * decimal weight (doc_id tie-break), display 6 dp. The one-shot
    * form re-derives features per stage like ngram_lm_score; the
    * production path is dsirLambda→writeDsirLambda once, then
    * dsirScore per corpus pass. */
  def dsirSelect(docs: DataFrame,
                 targetPred: org.apache.spark.sql.Column,
                 m: Int = DsirBuckets, k: Int = DsirTopK): DataFrame = {
    // the feature frame feeds THREE plan branches (λ's raw agg, λ's
    // target agg, the scoring join) — eagerly checkpointed once, or
    // the md5 tokenize-and-hash corpus pass replays per branch (the
    // ≥3-branch rule; the production path's write/read λ artifact
    // already avoids this across runs)
    val feats = dsirDocFeats(docs, m).localCheckpoint()
    dsirScore(feats, dsirLambda(feats, targetPred, m))
      .orderBy(col("slw").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lang"), col("n_grams"),
        round(col("slw").cast("double"), 6).as("logw"))
      .orderBy(col("logw").desc, col("doc_id"))
  }

  def dsirSelect(s: SparkSession, d: String): DataFrame =
    dsirSelect(Tables.documents(s, d), col("lang") === "en")

  val dsirSelectOracle: String = raw"""
    WITH tok AS (
      SELECT doc_id, lang,
        list_filter(string_split_regex(lower(text), '\s+'),
                    x -> length(x) > 0) AS toks
      FROM documents),
    uni AS (SELECT doc_id, lang, unnest(toks) AS gram FROM tok),
    bi AS (
      SELECT doc_id, lang,
        unnest(list_transform(range(1, len(toks)),
          i -> toks[i] || ' ' || toks[i+1])) AS gram
      FROM tok WHERE len(toks) >= 2),
    g AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
    f AS (
      SELECT doc_id, lang,
        CAST(list_sum(list_transform(range(1, 9),
          k -> (strpos('0123456789abcdef', md5(gram)[k:k]) - 1)
               * CAST(16 ** (8 - k) AS BIGINT))) AS BIGINT) % 1024 AS feat
      FROM g),
    df AS (
      SELECT doc_id, lang, feat, COUNT(*) AS k FROM f GROUP BY 1, 2, 3),
    rawc AS (SELECT feat, CAST(SUM(k) AS BIGINT) AS rk FROM df GROUP BY 1),
    tgtc AS (SELECT feat, CAST(SUM(k) AS BIGINT) AS tk
             FROM df WHERE lang = 'en' GROUP BY 1),
    tot AS (
      SELECT CAST((SELECT SUM(rk) FROM rawc) AS BIGINT) AS nr,
             CAST((SELECT SUM(tk) FROM tgtc) AS BIGINT) AS nt),
    lam AS (
      SELECT r.feat,
        CAST(round(ln(CAST(COALESCE(t.tk, 0) + 1 AS DOUBLE)
                      / (tot.nt + 1024)), 9) AS DECIMAL(13,9)) -
        CAST(round(ln(CAST(r.rk + 1 AS DOUBLE)
                      / (tot.nr + 1024)), 9) AS DECIMAL(13,9)) AS lam
      FROM rawc r LEFT JOIN tgtc t USING (feat) CROSS JOIN tot),
    sc AS (
      SELECT d.doc_id, MIN(d.lang) AS lang,
        CAST(SUM(d.k) AS BIGINT) AS n_grams,
        SUM(CAST(d.k AS DECIMAL(9,0)) * l.lam) AS slw
      FROM df d JOIN lam l USING (feat)
      GROUP BY d.doc_id),
    top AS (
      SELECT doc_id, lang, n_grams, slw FROM sc
      ORDER BY slw DESC, doc_id LIMIT 100)
    SELECT doc_id, lang, n_grams,
      round(CAST(slw AS DOUBLE), 6) + 0 AS logw
    FROM top ORDER BY logw DESC, doc_id"""
}
