package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming jobs — the streaming form of the reference's
  * daily micro-batch cadence (ref main.py:432-482 batch loop;
  * runner.py scheduling). The batch/stream duality is deliberate:
  * `tumblingCounts` runs unchanged over a batch DataFrame (oracle-
  * checked as q18) or a readStream source.
  */
object EventStream {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Int)

  /** Per-user session accumulator (public: Spark's state encoder
    * codegen requires accessible constructors). */
  case class SessionState(start: Long, last: Long, n: Int)

  /** Schema for streaming reads of the events table; `ts` here is the
    * placeholder slot — its physical parquet type varies by generator
    * (TIMESTAMP(NANOS) → long via the legacy escape hatch, or
    * pyarrow's naive timestamp[us] → TIMESTAMP_NTZ), so `readEvents`
    * substitutes the actual type before opening the stream. */
  val eventsFileSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over a directory of events parquet files.
    * A file-source stream needs a declared schema, but the events
    * table's `ts` physical type varies (see graft.Tables.events) —
    * peek at the directory with a one-shot batch read, declare that
    * type, and normalize to plain TimestampType (session is UTC, so
    * the naive micros value maps to the same instant). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = scala.util.Try(spark.read.parquet(dir).schema("ts").dataType)
      .getOrElse(TimestampNTZType: DataType)
    tsType match {
      case LongType =>
        spark.readStream.schema(eventsFileSchema).parquet(dir)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case t =>
        val sch = StructType(eventsFileSchema.map(f =>
          if (f.name == "ts") f.copy(dataType = t) else f))
        spark.readStream.schema(sch).parquet(dir)
          .withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Tumbling-window counts with a watermark — works identically on
    * batch and streaming inputs. */
  def tumblingCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Stateful gap sessionization via flatMapGroupsWithState — the
    * streaming analog of the batch q11 window. Emits a session when
    * the gap exceeds `gapSeconds` (plus the open session on timeout).
    * State is per-user and bounded, so it scales horizontally with
    * key cardinality. */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var st = state.getOption.orNull
          for (e <- sorted) {
            val t = e.ts.getTime / 1000
            if (st == null) st = SessionState(t, t, 1)
            else if (t - st.last > gapSeconds) {
              out += SessionOut(userId,
                new java.sql.Timestamp(st.start * 1000),
                new java.sql.Timestamp(st.last * 1000), st.n)
              st = SessionState(t, t, 1)
            } else st = SessionState(st.start, t, st.n + 1)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Stream-stream interval join: purchases enriched with the clicks
    * of the same user in the preceding 30 minutes. Watermarks on both
    * sides bound the join state, so state size tracks the interval —
    * not the stream length — at any scale. Works identically on batch
    * inputs (spec checks stream/batch parity). */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
              col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
              col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "1 hour")
    purchases.join(clicks, expr(
      """user_id = c_user AND
         click_ts BETWEEN purchase_ts - INTERVAL 30 MINUTES AND purchase_ts"""),
      "inner")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
              col("click_id"), col("click_ts"))
  }

  /** Maintain an SCD-1 snapshot from a stream — the streaming analog
    * of the reference's batch loop (fetch batch → upsert into
    * Postgres, main.py:432-482): every micro-batch merges
    * last-write-wins into a versioned parquet snapshot
    * (`dir/v{batchId}`; the highest version is current — versioning
    * keeps the read/overwrite cycle atomic).
    */
  def upsertSink(updates: DataFrame, snapshotDir: String, keys: Seq[String],
                 versionCol: String): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val current = latestSnapshot(spark, snapshotDir)
          .getOrElse(batch.limit(0))
        graft.operators.Upsert.upsert(current, batch, keys, versionCol)
          .write.mode("overwrite").parquet(s"$snapshotDir/v$batchId")
        ()
      }
      .start()

  /** Highest-versioned snapshot under `dir`, if any. Listed through
    * the Hadoop FileSystem API, so the sink works against any
    * supported scheme (hdfs://, s3a://, file:/), not just the local
    * filesystem. */
  def latestSnapshot(spark: SparkSession, dir: String): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) None
    else {
      val versions = fs.listStatus(path)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
        .flatMap(st => scala.util.Try(st.getPath.getName.drop(1).toLong)
          .toOption.map(_ -> st.getPath))
      if (versions.isEmpty) None
      else Some(spark.read.parquet(versions.maxBy(_._1)._2.toString))
    }
  }

  case class DocIn(doc_id: Long, content_hash: String)

  /** Streaming exact dedup: first-seen filter keyed by content hash
    * via flatMapGroupsWithState — the streaming form of
    * Dedup.dedupExact. Emits (content_hash, keeper_id) once per novel
    * hash; later arrivals of the same content are silently dropped
    * (streams can't retract, so the keeper is the FIRST arrival —
    * min doc_id within its micro-batch group for determinism). State
    * is one long per distinct hash, partitioned by hash — scales
    * horizontally; production streams bound it with
    * [[streamingDedupTtl]] (event-time TTL eviction, dedup-within-
    * horizon) under the RocksDB state store provider. */
  def streamingDedup(docs: Dataset[DocIn]): Dataset[(String, Long)] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.content_hash)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: String, rows: Iterator[DocIn], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val keeper = rows.map(_.doc_id).min
            state.update(keeper)
            Iterator.single((hash, keeper))
          }
      }
  }

  case class DocText(doc_id: Long, text: String)

  /** Streaming CHUNK-granular dedup: each arriving doc decomposes
    * into its content-defined chunks
    * ([[graft.operators.Dedup.cdcChunksOf]] — the SAME per-doc
    * decomposition the batch operator uses, so the two cannot
    * drift), and novelty is tracked PER CHUNK hash: a chunk any
    * earlier doc already carried is dropped, a novel one emits
    * (chunk_hash, keeper_doc) — the streaming half of sub-doc
    * storage-granular dedup, where a chunk-store ingest ships only
    * novel chunks. State is one long per distinct chunk hash
    * (the [[streamingDedup]] bound — a TTL variant composes the
    * same way); the decompose is a stateless flatMap ahead of the
    * keyed state, so the shuffle moves (hash, doc) longs, never
    * text. Spec'd: a two-batch split equals the batch keeper view. */
  def streamingChunkDedup(docs: Dataset[DocText], w: Int = 16,
                          divisor: Int = 64): Dataset[(Long, Long)] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap(d => graft.operators.Dedup.cdcChunksOf(d.text, w, divisor)
        .map(c => (c._4, d.doc_id)))
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val keeper = rows.map(_._2).min
            state.update(keeper)
            Iterator.single((hash, keeper))
          }
      }
  }

  /** Streaming INCREMENTAL chunk dedup: the maintained chunk-index
    * artifact ([[graft.operators.Dedup.writeChunkIndex]]) consumed
    * the way [[streamingIncrementalDedup]] consumes the band index —
    * an arriving doc's chunks are first filtered against the STATIC
    * standing-corpus chunk hashes (stream-static left_outer + IS
    * NULL; stateless, so corpus membership costs ZERO streaming
    * state), and only corpus-novel chunks pay the keyed first-seen
    * state. Emits (chunk_hash, keeper_doc) once per chunk novel to
    * corpus AND stream. Parity spec'd in StreamingSpec: equals the
    * batch [[streamingChunkDedup]] view minus index-known hashes. */
  def streamingIncrementalChunkDedup(docs: Dataset[DocText],
                                     chunkIndex: DataFrame, w: Int = 16,
                                     divisor: Int = 64): Dataset[(Long, Long)] = {
    import docs.sparkSession.implicits._
    val novel = docs
      .flatMap(d => graft.operators.Dedup.cdcChunksOf(d.text, w, divisor)
        .map(c => (c._4, d.doc_id)))
      .toDF("chunk_hash", "doc_id")
      .join(chunkIndex.select(col("chunk_hash"),
          lit(1).as("_corpus_hit")).distinct(),
        Seq("chunk_hash"), "left_outer")
      .filter(col("_corpus_hit").isNull)
      .select(col("chunk_hash"), col("doc_id"))
      .as[(Long, Long)]
    novel.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val keeper = rows.map(_._2).min
            state.update(keeper)
            Iterator.single((hash, keeper))
          }
      }
  }

  /** Streaming LINE dedup: each arriving doc decomposes into its
    * lines ([[graft.operators.Dedup.linesOf]] — the SAME per-doc
    * lining the batch operator uses, so the two cannot drift), and
    * novelty is tracked PER LINE hash: a line any earlier doc already
    * carried is dropped, a novel one emits (line_hash, keeper_doc) —
    * the streaming half of C4-style boilerplate stripping, where the
    * ingest ships only corpus-novel lines. State is one long per
    * distinct line hash; the decompose is a stateless flatMap ahead
    * of the keyed state, so the shuffle moves (hash, doc) longs plus
    * nothing else. Spec'd: a two-batch split equals the batch
    * min-doc keeper view. */
  def streamingLineDedup(docs: Dataset[DocText]): Dataset[(Long, Long)] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap(d => graft.operators.Dedup.linesOf(d.doc_id, d.text)
        .map(l => (l._4, d.doc_id)))
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val keeper = rows.map(_._2).min
            state.update(keeper)
            Iterator.single((hash, keeper))
          }
      }
  }

  /** Streaming INCREMENTAL line dedup: the maintained line-index
    * artifact ([[graft.operators.Dedup.writeLineIndex]]) consumed the
    * way [[streamingIncrementalChunkDedup]] consumes the chunk index —
    * an arriving doc's lines are first filtered against the STATIC
    * standing-corpus line hashes (stream-static left_outer + IS NULL;
    * stateless, zero streaming state for corpus membership), and only
    * corpus-novel lines pay the keyed first-seen state. Emits
    * (line_hash, keeper_doc) once per line novel to corpus AND
    * stream. Parity spec'd in StreamingSpec. */
  def streamingIncrementalLineDedup(docs: Dataset[DocText],
                                    lineIndex: DataFrame): Dataset[(Long, Long)] = {
    import docs.sparkSession.implicits._
    val novel = docs
      .flatMap(d => graft.operators.Dedup.linesOf(d.doc_id, d.text)
        .map(l => (l._4, d.doc_id)))
      .toDF("line_hash", "doc_id")
      .join(lineIndex.select(col("line_hash"),
          lit(1).as("_corpus_hit")).distinct(),
        Seq("line_hash"), "left_outer")
      .filter(col("_corpus_hit").isNull)
      .select(col("line_hash"), col("doc_id"))
      .as[(Long, Long)]
    novel.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val keeper = rows.map(_._2).min
            state.update(keeper)
            Iterator.single((hash, keeper))
          }
      }
  }

  /** Streaming INCREMENTAL dedup: arrivals are dropped when their
    * content hash already exists in a STATIC standing-corpus index
    * (stream-static join — stateless, re-read per micro-batch, so at
    * scale the index lives bucketed/broadcastable by hash), then
    * first-seen-deduped within the stream itself. The streaming form
    * of [[graft.operators.Dedup.dedupIncremental]]'s exact tier:
    * corpus membership costs NO streaming state — only intra-stream
    * novelty pays the flatMapGroupsWithState state, which production
    * bounds with the TTL variant. The anti-join is expressed as
    * stream-static left_outer + IS NULL (the supported stream-static
    * join shapes; anti is not in the list). */
  def streamingIncrementalDedup(docs: Dataset[DocIn],
                                corpusHashes: DataFrame): Dataset[(String, Long)] = {
    import docs.sparkSession.implicits._
    val novel = docs.toDF()
      .join(corpusHashes.select(col("content_hash"),
          lit(1).as("_corpus_hit")),
        Seq("content_hash"), "left_outer")
      .filter(col("_corpus_hit").isNull)
      .select(col("doc_id"), col("content_hash"))
      .as[DocIn]
    streamingDedup(novel)
  }

  /** Streaming n-gram NOVELTY scoring: every arriving doc scored
    * against a STORED train shingle set (distinct `shingle` rows —
    * the daily pipeline's train_shingles artifact shape) via
    * foreachBatch, so each micro-batch runs the BATCH
    * [[graft.operators.Curate.ngramNoveltySh]] plan: a shingle-keyed
    * equi-join against the static artifact, per-doc partial agg.
    * Corpus membership costs ZERO streaming state (the
    * streamingIncrementalDedup discipline) and batch/stream parity
    * is structural — spec'd on a two-batch split. */
  def streamingNgramNovelty(docs: Dataset[DocText], trainShingles: DataFrame,
                            n: Int = 3)(writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[DocText], _: Long) =>
        val evalSh = graft.operators.Dedup.shingles(
            batch.toDF().withColumn("lang", lit("")), n)
          .select(col("doc_id"), col("shingle"))
        writeBatch(
          graft.operators.Curate.ngramNoveltyServe(trainShingles, evalSh))
      }
      .start()

  /** Streaming maintenance of the kNN-graph artifact
    * ([[graft.operators.Similarity.writeKnnGraph]]): each arriving
    * vector micro-batch runs the BATCH append step — pruned
    * probed-bucket edges for the batch, affected standing nodes
    * re-top-k'd, touched edge partitions dynamically overwritten —
    * so the standing graph costs ZERO streaming state and
    * stream-maintained ≡ batch-maintained is structural (two-batch
    * parity spec'd). The ingest path that keeps graph-based curation
    * (SemDeDup, prototypes, PageRank audits) current between full
    * rebuilds. */
  def streamingKnnGraphMaintain(vecs: Dataset[QueryVec], dir: String,
                                cents: Array[Array[Double]])
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryVec], _: Long) =>
        if (!batch.isEmpty)
          graft.operators.Similarity.knnGraphAppendStep(
            batch.sparkSession, dir,
            batch.toDF().withColumnRenamed("query_id", "vec_id"), cents)
      }
      .start()

  /** Streaming VOCABULARY-DRIFT monitor: each arriving micro-batch is
    * scored against a stored reference vocabulary
    * ([[graft.functions.TextFunctions.vocabCounts]] artifact) — one
    * (n_tokens, n_types, novel_types, jsd_vs_ref) row per batch, the
    * alert feed a pipeline hangs a drift threshold on (a crawl
    * snapshot whose JSD jumps re-opens mixture weights BEFORE it
    * ships). foreachBatch runs the batch operator
    * ([[graft.functions.TextFunctions.vocabDriftAgainst]]) — zero
    * streaming state, per-batch parity is structural (spec'd). */
  def streamingVocabDrift(docs: Dataset[DocText], refCounts: DataFrame)(
                          writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[DocText], _: Long) =>
        writeBatch(graft.functions.TextFunctions.vocabDriftAgainst(
          refCounts, batch.toDF()))
      }
      .start()

  case class DocInTs(doc_id: Long, content_hash: String, ts: java.sql.Timestamp)

  /** [[streamingDedup]] with BOUNDED state: dedup-within-horizon. Each
    * hash's state carries an event-time TTL `horizonMs` past its
    * newest arrival (sliding); when the watermark passes it, the state
    * is REMOVED, and total state is bounded by the distinct-hash
    * ARRIVAL RATE × horizon instead of the stream's lifetime
    * cardinality. A hash re-appearing after the horizon is emitted
    * again — the expiry is checked against the ARRIVAL's own event
    * time as well as the timeout, so the guarantee holds even on a
    * quiet stream whose watermark has not advanced past the TTL yet
    * (watermark timeouts only fire when other traffic moves the
    * clock). This is the semantics production dedup runs at 100
    * TB/day: state cannot grow without bound, and the horizon is the
    * declared dedup guarantee. StreamingSpec runs this under the
    * RocksDB state store provider and asserts eviction from the query
    * progress state-operator metrics. */
  def streamingDedupTtl(docs: Dataset[DocInTs], horizonMs: Long,
                        watermarkDelay: String = "10 minutes"): Dataset[(String, Long)] = {
    import docs.sparkSession.implicits._
    docs.withWatermark("ts", watermarkDelay)
      .as[DocInTs]
      .groupByKey(_.content_hash)
      // state = (keeper, lastSeenMs): lastSeen defines the sliding
      // expiry independently of the watermark-driven cleanup timeout
      .flatMapGroupsWithState[(Long, Long), (String, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (hash: String, rows: Iterator[DocInTs], state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // fold the batch in EVENT-TIME order so horizon
            // transitions INSIDE one micro-batch are honored: a row
            // landing past lastSeen+horizon starts a new window and
            // re-emits, even when in-horizon rows share the batch.
            // Window keeper = its first arrival ((ts, doc_id) order —
            // deterministic; equals min-doc_id for same-ts batches).
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
            var st = state.getOption.orNull
            sorted.foreach { r =>
              val t = r.ts.getTime
              if (st == null || t > st._2 + horizonMs) {
                out += ((hash, r.doc_id))
                st = (r.doc_id, t)
              } else {
                st = (st._1, math.max(st._2, t)) // late rows never rewind
              }
            }
            state.update(st)
            // cleanup timeout tracks the UPDATED lastSeen (never the
            // batch's own max — a fully-late batch must not shrink the
            // TTL); must also stay ahead of the watermark or the
            // update throws
            state.setTimeoutTimestamp(
              math.max(st._2, state.getCurrentWatermarkMs()) + horizonMs)
            out.iterator
          }
      }
  }

  case class BandRow(doc_id: Long, band: Int, sig: String)

  /** Streaming NEAR-dup candidate detection: the incremental form of
    * the batch minhash-LSH band join. Keyed by (band, sig) bucket,
    * the state holds the bucket's member doc ids; each arriving doc
    * emits a candidate pair against every earlier member, exactly
    * once (new members are paired with existing ones and with earlier
    * same-batch arrivals). Pairs may repeat ACROSS bands — exactly
    * like the batch join before its distinct — so downstream
    * consumers dedupe, and the spec compares distinct sets. State per
    * bucket is bounded by bucket occupancy, which is what LSH banding
    * bounds by construction — but it lives for the stream's lifetime;
    * production streams run [[streamingMinhashPairsTtl]], which also
    * bounds it in TIME (event-time horizon + watermark eviction). */
  def streamingMinhashPairs(bands: Dataset[BandRow]): Dataset[(Long, Long)] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(b => (b.band, b.sig))
      .flatMapGroupsWithState[Seq[Long], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, String), rows: Iterator[BandRow], state: GroupState[Seq[Long]]) =>
          val existing = state.getOption.getOrElse(Seq.empty)
          val seen = existing.toSet
          val incoming = rows.map(_.doc_id).toSeq.distinct.sorted
            .filterNot(seen.contains)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var members = existing
          incoming.foreach { id =>
            members.foreach { m =>
              out += (if (m < id) (m, id) else (id, m))
            }
            members = members :+ id
          }
          state.update(members)
          out.iterator
      }
  }

  case class BandRowTs(doc_id: Long, band: Int, sig: String,
                       ts: java.sql.Timestamp)

  /** [[streamingMinhashPairs]] with BOUNDED state: near-dup detection
    * within an event-time horizon. Each bucket's member list carries a
    * per-member lastSeen; an arriving doc pairs only against members
    * seen within `horizonMs` of its own event time (stale members are
    * evicted inline as the batch folds in event-time order), and the
    * whole bucket's state is REMOVED once the watermark passes its
    * newest member + horizon — so total state is bounded by the bucket
    * ARRIVAL RATE × horizon, not the stream's lifetime membership. A
    * doc re-arriving within the horizon refreshes its lastSeen without
    * re-pairing; one returning after eviction pairs anew (that IS the
    * horizon semantics — the same contract as [[streamingDedupTtl]]).
    * Lateness is bounded by the watermark delay, so a late arrival
    * pairs against members at most watermark-lag newer than itself.
    * With all arrivals inside one horizon this reduces exactly to the
    * unbounded form (parity spec'd); eviction is spec'd under RocksDB
    * via the state-operator metrics. */
  def streamingMinhashPairsTtl(bands: Dataset[BandRowTs], horizonMs: Long,
                               watermarkDelay: String = "10 minutes"): Dataset[(Long, Long)] = {
    import bands.sparkSession.implicits._
    bands.withWatermark("ts", watermarkDelay)
      .as[BandRowTs]
      .groupByKey(b => (b.band, b.sig))
      .flatMapGroupsWithState[Seq[(Long, Long)], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, String), rows: Iterator[BandRowTs], state: GroupState[Seq[(Long, Long)]]) =>
          if (state.hasTimedOut) {
            // timeout fires horizon past the newest member — every
            // member is stale by construction
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
            var members = state.getOption.getOrElse(Seq.empty)
            sorted.foreach { r =>
              val t = r.ts.getTime
              members = members.filter(_._2 >= t - horizonMs)
              val idx = members.indexWhere(_._1 == r.doc_id)
              if (idx >= 0) {
                val (id, seen) = members(idx)
                members = members.updated(idx, (id, math.max(seen, t)))
              } else {
                members.foreach { case (m, _) =>
                  out += (if (m < r.doc_id) (m, r.doc_id) else (r.doc_id, m))
                }
                members = members :+ ((r.doc_id, t))
              }
            }
            state.update(members)
            val newest = members.map(_._2).max
            // cleanup tracks the newest member and must stay ahead of
            // the watermark or the update throws
            state.setTimeoutTimestamp(
              math.max(newest, state.getCurrentWatermarkMs()) + horizonMs)
            out.iterator
          }
      }
  }

  case class EmbCodeRow(vec_id: Long, tid: Int, code: Int,
                        embedding: Array[Float])

  /** Multi-table LSH code rows for an embedding stream (or batch
    * frame) — the streaming front half of [[streamingEmbLshPairs]];
    * same planes/geometry as the batch `Dedup.embLshDups`, so stream
    * and batch bucket identically. */
  def embLshCodes(emb: DataFrame,
                  numBits: Int = graft.operators.Similarity.LshBits,
                  numTables: Int = graft.operators.Similarity.LshTables): Dataset[EmbCodeRow] = {
    import emb.sparkSession.implicits._
    val bc = emb.sparkSession.sparkContext.broadcast(
      graft.operators.Similarity.lshPlanes(numTables, numBits))
    graft.operators.Similarity.lshCodesWithVec(emb, bc).as[EmbCodeRow]
  }

  /** Streaming embedding near-dup pairs: the incremental form of the
    * batch `Dedup.embLshDups`. Keyed by (tid, code) bucket; the state
    * holds the bucket's member (id, vector)s; each arriving vector is
    * cosine-verified against every earlier member AT THE BUCKET —
    * candidates never leave the state operator — and a pair is
    * emitted once per bucket when it clears `tau` (pairs may repeat
    * ACROSS tables, exactly like the batch join before its distinct;
    * consumers dedupe, the parity spec compares distinct sets). State
    * per bucket is member count × vector bytes, bounded by bucket
    * occupancy — the same quantity the (bits, τ) geometry choice
    * bounds in batch; production streams run
    * [[streamingEmbLshPairsTtl]], which also bounds it in TIME
    * (event-time horizon + watermark eviction). */
  def streamingEmbLshPairs(codes: Dataset[EmbCodeRow],
                           tau: Double = 0.35): Dataset[(Long, Long, Double)] = {
    import codes.sparkSession.implicits._
    codes.groupByKey(c => (c.tid, c.code))
      .flatMapGroupsWithState[Seq[(Long, Array[Float])], (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Int), rows: Iterator[EmbCodeRow], state: GroupState[Seq[(Long, Array[Float])]]) =>
          val existing = state.getOption.getOrElse(Seq.empty)
          val seen = existing.map(_._1).toSet
          val incoming = rows.toSeq.filterNot(r => seen(r.vec_id))
            .groupBy(_.vec_id).map(_._2.head).toSeq.sortBy(_.vec_id)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var members = existing
          incoming.foreach { r =>
            members.foreach { case (mid, mv) =>
              val raw = graft.functions.CosineSimilarity
                .cosineScalar(mv, r.embedding)
              // NaN (zero-norm or length-mismatched vector) must drop
              // the pair exactly like the batch path's round+filter
              // does — BigDecimal(NaN) would kill the whole query
              if (!raw.isNaN) {
                val cos = BigDecimal(raw)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (cos >= tau)
                  out += (if (mid < r.vec_id) (mid, r.vec_id, cos)
                          else (r.vec_id, mid, cos))
              }
            }
            members = members :+ (r.vec_id -> r.embedding)
          }
          state.update(members)
          out.iterator
      }
  }

  case class HashKeyRow(doc_id: Long, sig: Long, ci: Int, cv: Long)

  /** Manku banding key rows for an image stream (or batch frame) —
    * the streaming front half of [[streamingPhashPairs]]: REAL decode
    * → dHash60 → the SAME compound chunk keys as the batch
    * `Dedup.bandedHammingCandidates` (via `Dedup.bandingKeys`, the
    * pure mirror ScalaCheck already proves the pigeonhole guarantee
    * on), so stream and batch bucket identically. */
  def phashKeyRows(docs: DataFrame, maxHamming: Int = 3,
                   numChunks: Int = 6): Dataset[HashKeyRow] = {
    import docs.sparkSession.implicits._
    graft.sources.Multimodal.phashSignatures(docs)
      .as[(Long, Long)]
      .flatMap { case (id, sig) =>
        graft.operators.Dedup.bandingKeys(sig, maxHamming, numChunks)
          .iterator.map { case (ci, cv) => HashKeyRow(id, sig, ci, cv) }
      }
  }

  /** Streaming image near-dup pairs: the incremental form of the
    * batch `Multimodal.phashDups`, completing the streaming near-dup
    * triple (minhash ✓ embedding ✓ image ✓). Keyed by (ci, cv)
    * compound chunk bucket; the state holds the bucket's member
    * (doc_id, signature)s; each arriving image is hamming-verified
    * against every earlier member AT THE BUCKET — the banding is
    * exact (a pair within the budget shares ≥1 bucket), so emitted
    * pairs may repeat across buckets exactly like the batch join
    * before its distinct (consumers dedupe; the parity spec compares
    * distinct sets). State per bucket is member count × 16 bytes —
    * bounded by bucket occupancy, the quantity the 2^30 key space
    * bounds by construction. */
  def streamingPhashPairs(keys: Dataset[HashKeyRow],
                          maxHamming: Int = 3): Dataset[(Long, Long, Int)] = {
    import keys.sparkSession.implicits._
    keys.groupByKey(k => (k.ci, k.cv))
      .flatMapGroupsWithState[Seq[(Long, Long)], (Long, Long, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[HashKeyRow], state: GroupState[Seq[(Long, Long)]]) =>
          val existing = state.getOption.getOrElse(Seq.empty)
          val seen = existing.map(_._1).toSet
          val incoming = rows.toSeq.filterNot(r => seen(r.doc_id))
            .groupBy(_.doc_id).map(_._2.head).toSeq.sortBy(_.doc_id)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          var members = existing
          incoming.foreach { r =>
            members.foreach { case (mid, msig) =>
              val hm = java.lang.Long.bitCount(msig ^ r.sig)
              if (hm <= maxHamming)
                out += (if (mid < r.doc_id) (mid, r.doc_id, hm)
                        else (r.doc_id, mid, hm))
            }
            members = members :+ ((r.doc_id, r.sig))
          }
          state.update(members)
          out.iterator
      }
  }

  case class HashKeyRowTs(doc_id: Long, sig: Long, ci: Int, cv: Long,
                          ts: java.sql.Timestamp)

  /** [[streamingPhashPairs]] with BOUNDED state — the image analog of
    * [[streamingMinhashPairsTtl]]: per-bucket members carry
    * (signature, lastSeen), arrivals hamming-verify only against
    * members within the event-time horizon (stale members evicted
    * inline), and the bucket's state is removed when the watermark
    * passes its newest member + horizon. State is bounded by bucket
    * arrival rate × horizon × 24 bytes instead of the stream's
    * lifetime bucket membership; with all arrivals inside one horizon
    * this reduces exactly to the unbounded form (parity spec'd). */
  def streamingPhashPairsTtl(keys: Dataset[HashKeyRowTs], horizonMs: Long,
                             maxHamming: Int = 3,
                             watermarkDelay: String = "10 minutes"): Dataset[(Long, Long, Int)] = {
    import keys.sparkSession.implicits._
    keys.withWatermark("ts", watermarkDelay)
      .as[HashKeyRowTs]
      .groupByKey(k => (k.ci, k.cv))
      .flatMapGroupsWithState[Seq[(Long, Long, Long)], (Long, Long, Int)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[HashKeyRowTs],
         state: GroupState[Seq[(Long, Long, Long)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
            var members = state.getOption.getOrElse(Seq.empty)
            sorted.foreach { r =>
              val t = r.ts.getTime
              members = members.filter(_._3 >= t - horizonMs)
              val idx = members.indexWhere(_._1 == r.doc_id)
              if (idx >= 0) {
                val (id, sig, seen) = members(idx)
                members = members.updated(idx, (id, sig, math.max(seen, t)))
              } else {
                members.foreach { case (mid, msig, _) =>
                  val hm = java.lang.Long.bitCount(msig ^ r.sig)
                  if (hm <= maxHamming)
                    out += (if (mid < r.doc_id) (mid, r.doc_id, hm)
                            else (r.doc_id, mid, hm))
                }
                members = members :+ ((r.doc_id, r.sig, t))
              }
            }
            state.update(members)
            val newest = members.map(_._3).max
            state.setTimeoutTimestamp(
              math.max(newest, state.getCurrentWatermarkMs()) + horizonMs)
            out.iterator
          }
      }
  }

  case class EmbCodeRowTs(vec_id: Long, tid: Int, code: Int,
                          embedding: Array[Float], ts: java.sql.Timestamp)

  /** [[streamingEmbLshPairs]] with BOUNDED state — the embedding
    * analog of [[streamingMinhashPairsTtl]]: per-bucket members carry
    * (vector, lastSeen), arrivals are cosine-verified only against
    * members within the event-time horizon (stale members evicted
    * inline), and the bucket's state is removed when the watermark
    * passes its newest member + horizon. State is bounded by bucket
    * arrival rate × horizon × vector bytes instead of the stream's
    * lifetime bucket membership. */
  def streamingEmbLshPairsTtl(codes: Dataset[EmbCodeRowTs], horizonMs: Long,
                              tau: Double = 0.35,
                              watermarkDelay: String = "10 minutes"): Dataset[(Long, Long, Double)] = {
    import codes.sparkSession.implicits._
    codes.withWatermark("ts", watermarkDelay)
      .as[EmbCodeRowTs]
      .groupByKey(c => (c.tid, c.code))
      .flatMapGroupsWithState[Seq[(Long, Array[Float], Long)], (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Int), rows: Iterator[EmbCodeRowTs],
         state: GroupState[Seq[(Long, Array[Float], Long)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.vec_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
            var members = state.getOption.getOrElse(Seq.empty)
            sorted.foreach { r =>
              val t = r.ts.getTime
              members = members.filter(_._3 >= t - horizonMs)
              val idx = members.indexWhere(_._1 == r.vec_id)
              if (idx >= 0) {
                val (id, v, seen) = members(idx)
                members = members.updated(idx, (id, v, math.max(seen, t)))
              } else {
                members.foreach { case (mid, mv, _) =>
                  val raw = graft.functions.CosineSimilarity
                    .cosineScalar(mv, r.embedding)
                  // NaN (zero-norm / length-mismatch) drops the pair,
                  // matching the batch path's round+filter
                  if (!raw.isNaN) {
                    val cos = BigDecimal(raw)
                      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                    if (cos >= tau)
                      out += (if (mid < r.vec_id) (mid, r.vec_id, cos)
                              else (r.vec_id, mid, cos))
                  }
                }
                members = members :+ ((r.vec_id, r.embedding, t))
              }
            }
            state.update(members)
            val newest = members.map(_._3).max
            state.setTimeoutTimestamp(
              math.max(newest, state.getCurrentWatermarkMs()) + horizonMs)
            out.iterator
          }
      }
  }

  /** Streaming HyperLogLog: per-group register state updated
    * incrementally via mapGroupsWithState — the streaming form of
    * [[graft.operators.Sketches.sketchDistinct]]. State per group is
    * the FIXED 4096-int register array (the keys never enter state —
    * the property that makes a distinct-count over an unbounded
    * stream feasible at all); each micro-batch emits the group's
    * refreshed estimate (Update mode). The registers a stream builds
    * are by construction the MAX-merge of its batches, so the final
    * streaming estimate equals the batch sketch over the union of all
    * arrivals — spec'd against [[graft.operators.Sketches
    * .hllRegisters]]/[[graft.operators.Sketches.hllEstimateLocal]]
    * on a two-batch split. */
  def streamingSketchDistinct(rows: Dataset[(String, String)]
                             ): Dataset[(String, Double)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .mapGroupsWithState[Array[Int], (String, Double)](
        GroupStateTimeout.NoTimeout) {
        (grp: String, it: Iterator[(String, String)], state: GroupState[Array[Int]]) =>
          val regs = state.getOption
            .getOrElse(new Array[Int](graft.operators.Sketches.HllM))
          it.foreach { case (_, k) =>
            val (idx, rho) = graft.operators.Sketches.hllIdxRho(k)
            if (rho > regs(idx)) regs(idx) = rho
          }
          state.update(regs)
          (grp, graft.operators.Sketches.hllEstimateLocal(regs))
      }
  }

  /** Per-user exact moment state for [[streamingAnomalyStats]]:
    * value lives on the 2-dp grid, so cents and cents² accumulate as
    * exact longs — 24 bytes per user, unbounded history for free. */
  case class MomentState(n: Long, s1c: Long, s2e4: Long)

  /** Streaming per-user anomaly model — the model half of
    * [[graft.operators.Timeseries.eventsAnomaly]] maintained
    * incrementally: mapGroupsWithState keyed by user, state = the
    * exact integer moments (n, Σcents, Σcents²); each batch emits
    * the user's refreshed (n, mean, variance, std) in Update mode.
    * The doubles are reconstructed through the SAME decimal→double
    * casts the batch aggregate performs (BigDecimal scale 2/4), so
    * after any arrival split the streaming stats are BIT-equal to
    * the batch [[graft.operators.Timeseries.anomalyStats]] — feed
    * them to `anomalyFlag` for identical flags (spec'd). Scoring
    * stays a batch read-out (the annIvfServeBatch pattern); the
    * stream maintains the model, which is the half that needs the
    * full history. */
  def streamingAnomalyStats(rows: Dataset[(Long, Double)]
                           ): Dataset[(Long, Long, Double, Double, Double)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .mapGroupsWithState[MomentState, (Long, Long, Double, Double, Double)](
        GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Double)], state: GroupState[MomentState]) =>
          var st = state.getOption.getOrElse(MomentState(0L, 0L, 0L))
          it.foreach { case (_, v) =>
            val c = math.round(v * 100)
            st = MomentState(st.n + 1, st.s1c + c, st.s2e4 + c * c)
          }
          state.update(st)
          val s1 = new java.math.BigDecimal(
            java.math.BigInteger.valueOf(st.s1c), 2).doubleValue()
          val s2 = new java.math.BigDecimal(
            java.math.BigInteger.valueOf(st.s2e4), 4).doubleValue()
          val mean = s1 / st.n
          val variance = s2 / st.n - mean * mean
          (user, st.n, mean, variance, math.sqrt(variance))
      }
  }

  /** Streaming data-quality monitor — the streaming form of
    * [[graft.operators.DataQuality.rowMetrics]]: cumulative
    * (metric, violation_count) maintained by the built-in streaming
    * aggregation (state = one row per metric, never per data row —
    * bounded whatever the stream volume; read in Complete/Update
    * mode). The SAME plan runs over a batch DataFrame and equals
    * rowMetrics' counts — the tumblingCounts batch/stream duality,
    * spec'd on a two-batch split. Referential checks don't fit a
    * stream-static anti join (unsupported shape); run
    * [[graft.operators.DataQuality.orphans]] inside foreachBatch as
    * a batch plan instead (the annIvfServeBatch pattern). */
  def streamingDqMetrics(rows: DataFrame,
                         metrics: Seq[(String, org.apache.spark.sql.Column)]
                        ): DataFrame = {
    val pairs = array(
      struct(lit("row_count").as("metric"), lit(1L).as("hit")) +:
        metrics.map { case (n, p) =>
          struct(lit(n).as("metric"),
            when(p, 1L).otherwise(0L).as("hit")) }: _*)
    rows.select(explode(pairs).as("mp"))
      .select(col("mp.metric").as("metric"), col("mp.hit").as("hit"))
      .groupBy("metric").agg(sum("hit").as("value"))
  }

  /** Streaming Count-Min counters: the CMS state (d×w = 4×1024 Long
    * counters) maintained incrementally — arrivals fan out to their
    * d buckets, each (j, b) key's counter ADDS the batch's hits
    * (mapGroupsWithState keyed by the bucket, state = one Long). The
    * state is FIXED at ≤ 4096 rows whatever the token volume — the
    * same never-store-the-keys property as
    * [[streamingSketchDistinct]]; final counters equal the batch
    * [[graft.operators.Sketches.cmsCounters]] over the union of all
    * arrivals (spec'd). Heavy-hitter read-out stays a batch lookup
    * against the counter table. */
  def streamingCmsCounters(toks: Dataset[String]): Dataset[(Int, Long, Long)] = {
    import toks.sparkSession.implicits._
    toks
      .flatMap(t => (0 until graft.operators.Sketches.CmsD)
        .map(j => (j, graft.operators.Sketches.cmsBucketLocal(j, t))))
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Int, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), it: Iterator[(Int, Long)], state: GroupState[Long]) =>
          val c = state.getOption.getOrElse(0L) + it.size
          state.update(c)
          (key._1, key._2, c)
      }
  }

  /** Streaming histogram-quantile counters: the
    * [[graft.operators.Sketches.sketchQuantiles]] bucket state
    * maintained incrementally against a FIXED grid (the per-group
    * [min,max] trained on a reference corpus — at scale the grid is
    * a write-once artifact exactly like the SQ8 grid; a streaming
    * operator cannot re-derive a global min/max anyway). Arrivals
    * bucket on the grid (values outside clamp to the edge bins),
    * each ((grp, b)) counter ADDS its batch hits — state ≤ 256 rows
    * per group whatever the volume. Quantile read-out stays the
    * batch cumulative walk over the counter table. */
  def streamingQuantileCounters(rows: Dataset[(String, Double)],
                                grid: Map[String, (Double, Double)]
                               ): Dataset[(String, Int, Long)] = {
    import rows.sparkSession.implicits._
    val b = graft.operators.Sketches.QsB
    rows
      .flatMap { case (g, v) =>
        grid.get(g).map { case (mn, mx) =>
          val raw = if (mx > mn) math.floor((v - mn) * b / (mx - mn)) else 0.0
          (g, math.max(0, math.min(b - 1, raw.toInt)))
        }
      }
      .groupByKey(identity)
      .mapGroupsWithState[Long, (String, Int, Long)](
        GroupStateTimeout.NoTimeout) {
        (key: (String, Int), it: Iterator[(String, Int)], state: GroupState[Long]) =>
          val c = state.getOption.getOrElse(0L) + it.size
          state.update(c)
          (key._1, key._2, c)
      }
  }

  // ---- streaming semantic search (stream-static IVF probe) ---------------

  case class QueryVec(query_id: Long, embedding: Array[Float])

  /** Streaming semantic search with exact per-query top-k: arriving
    * query vectors probe a STANDING bucket-partitioned IVF corpus
    * ([[graft.operators.Similarity.writeIvfPartitioned]]'s layout) —
    * the serving half of the ANN family
    * ([[graft.operators.Similarity.annIvf]] is the batch form).
    *
    * The probe join runs INSIDE `foreachBatch` (as a batch plan), not
    * as a stream-static join: the batch's probed bucket set (bounded
    * by nlist) is collected and the corpus is read with a pushed-down
    * `bucket IN (...)` — the scan touches only the probed partition
    * directories, so per-batch cost tracks nprobe×queries, NOT corpus
    * size ([[graft.operators.Similarity.annIvfServeBatch]] is the
    * shared body; a stream-static join cannot be pruned this way
    * because DPP does not run in streaming plans). Completely
    * STATE-FREE: a query's candidate set is complete within its
    * arrival micro-batch, so the per-batch bounded top-k
    * ([[graft.operators.Similarity]]'s TopK aggregator) IS the global
    * answer for that query — no watermark, no group state.
    *
    * `query_id` and corpus `vec_id` are UNRELATED id spaces;
    * self-exclusion is opt-in (`excludeSelf`) for benchmark runs that
    * replay corpus vectors as queries. Parity with the batch
    * [[graft.operators.Similarity.annIvf]] on a two-batch split is
    * spec'd in StreamingSpec. */
  def streamingAnnIvfTopK(queries: Dataset[QueryVec], ivfDir: String,
                          cents: Array[Array[Double]], k: Int = 5,
                          nprobe: Int = graft.operators.Similarity.IvfNprobe,
                          excludeSelf: Boolean = false)(
                          writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryVec], _: Long) =>
        val s = batch.sparkSession
        writeBatch(graft.operators.Similarity.annIvfServeBatch(
          s, ivfDir, cents, batch.toDF("query_id", "embedding"),
          k, nprobe, excludeSelf))
      }
      .start()

  /** [[streamingAnnIvfTopK]]'s GRAPH-NAVIGATION twin: each
    * micro-batch beam-walks the stored kNN-graph artifact
    * ([[graft.operators.Similarity.writeKnnGraph]]) instead of
    * probing quantizer buckets — the NSW/HNSW serving shape,
    * state-free per batch (entries/edges/vectors all come from the
    * artifact; the walk is O(beam·deg·depth) scores per query).
    * Same independent-id-space default as every serving twin. */
  def streamingGraphWalkTopK(queries: Dataset[QueryVec], graphDir: String,
                             k: Int = 5,
                             beam: Int = graft.operators.Similarity.GraphWalkBeam,
                             depth: Int = graft.operators.Similarity.GraphWalkDepth,
                             excludeSelf: Boolean = false)(
                             writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryVec], _: Long) =>
        val s = batch.sparkSession
        writeBatch(graft.operators.Similarity.annGraphWalkServeBatch(
          s, graphDir, batch.toDF("query_id", "embedding"),
          k, beam, depth, excludeSelf))
      }
      .start()

  /** [[streamingAnnIvfTopK]] over the composed IVF×SQ8 stored-code
    * layout ([[graft.operators.Similarity.writeIvfSq8Partitioned]]) —
    * the full production serving stack: state-free micro-batch probe,
    * partition-pruned scan, 1-byte/dim storage dequantized per row,
    * asymmetric rerank. Same per-batch-complete top-k argument, same
    * independent-id-space default. */
  def streamingAnnIvfSq8TopK(queries: Dataset[QueryVec], ivfSq8Dir: String,
                             cents: Array[Array[Double]],
                             mns: Array[Double], mxs: Array[Double],
                             k: Int = 5,
                             nprobe: Int = graft.operators.Similarity.IvfNprobe,
                             excludeSelf: Boolean = false)(
                             writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryVec], _: Long) =>
        val s = batch.sparkSession
        writeBatch(graft.operators.Similarity.annIvfSq8ServeBatch(
          s, ivfSq8Dir, cents, mns, mxs, batch.toDF("query_id", "embedding"),
          k, nprobe, excludeSelf))
      }
      .start()

  /** Streaming semantic search over the stored WHITENED layout
    * ([[graft.operators.Similarity.writeIvfWhitePartitioned]]) — the
    * state-free pruned-serving shape over exact-integer whitened
    * codes: queries whiten + probe map-side under the shipped
    * [[graft.operators.Similarity.WhitenModel]], the scan reads only
    * the probed bucket directories, scoring is the all-integer
    * cos_e6 chain. Two-batch parity with the batch annIvfWhite is
    * spec'd; on drift ([[graft.operators.Similarity.whiteDrifted]])
    * the serving node swaps model + layout together
    * (retrainIvfWhitePartitioned's contract). */
  def streamingAnnIvfWhiteTopK(queries: Dataset[QueryVec],
                               whiteDir: String,
                               m: graft.operators.Similarity.WhitenModel,
                               k: Int = 5,
                               nprobe: Int =
                                 graft.operators.Similarity.WhiteNprobe,
                               excludeSelf: Boolean = false)(
                               writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryVec], _: Long) =>
        val s = batch.sparkSession
        writeBatch(graft.operators.Similarity.annIvfWhiteServeBatch(
          s, whiteDir, m, batch.toDF("query_id", "embedding"),
          k, nprobe, excludeSelf))
      }
      .start()

  /** Streaming classification over the stored NB model
    * ([[graft.functions.Classify.writeNbModel]]) — the gate-at-ingest
    * shape: each arriving micro-batch of documents is scored against
    * the standing model artifact and routed by predicted class.
    * State-free (the model is the state, maintained out-of-band by
    * append/forget); per-doc answers are batch-independent, so
    * two-batch parity with the batch
    * [[graft.functions.Classify.classifyNbServeBatch]] is exact
    * (spec'd in StreamingSpec). */
  def streamingClassifyNb(docs: Dataset[DocText], nbDir: String)(
      writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[DocText], _: Long) =>
        val s = batch.sparkSession
        writeBatch(graft.functions.Classify.classifyNbServeBatch(
          s, nbDir, batch.toDF("doc_id", "text")))
      }
      .start()

  /** Streaming quality gate over the stored DISTILLED quality model
    * ([[graft.functions.Classify.writeQualityModel]]) — the CCNet
    * loop's production shape: the LM + tertile chain trained the
    * artifact once; every arriving micro-batch gates on one
    * token-count join against it. State-free; per-doc answers are
    * batch-independent, so two-batch parity with the batch
    * [[graft.functions.Classify.qualityNbServeBatch]] is exact
    * (spec'd in StreamingSpec). */
  def streamingQualityNb(docs: Dataset[DocText], qualityDir: String)(
      writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[DocText], _: Long) =>
        val s = batch.sparkSession
        writeBatch(graft.functions.Classify.qualityNbServeBatch(
          s, qualityDir, batch.toDF("doc_id", "text")))
      }
      .start()

  /** One recommendation request: a user id with their interaction
    * history snapshot (the items they've engaged). */
  case class RecRequest(user_id: Long, items: Seq[Long])

  /** A finalized daily count arriving on the stream (the daily
    * micro-batch cadence: one row per (series, day) once the day
    * closes). */
  case class DayCount(event_type: String, day: java.sql.Date, y: Long)

  /** A one-step-ahead fit emitted by the streaming forecaster. */
  case class HwFit(event_type: String, r: Long, y: Long, fitted_e6: Long)

  // NOT `private`: the state encoder's generated serializer calls
  // the accessors from Janino-compiled code, which cannot see a
  // Scala-private inner class ("no applicable constructor/method
  // found ... candidates are: public long trend()")
  case class HwStreamState(bufE6: Seq[Long], rank: Long, lvl: Long,
                           trend: Long, seaE6: Seq[Long], seeded: Boolean,
                           lastDay: Long)

  /** Streaming Holt-Winters — the [[graft.operators.Timeseries
    * .holtWintersOn]] recurrence as per-series stream state (9
    * BIGINTs once seeded, a ≤14-value buffer before): each arriving
    * closed day advances the state through the SHARED hwStep (one
    * step function, batch and stream cannot drift) and emits its
    * one-step-ahead fit; the first two seasons buffer, seed
    * (hwSeed), then replay rows 8..14 exactly like the batch form.
    * State is bounded per series by construction — no TTL needed.
    * Requires per-series arrival in day order across batches (the
    * r12 arrival-order invariant; within a batch rows are sorted).
    * Two-batch parity with the batch fitted rows is spec'd in
    * StreamingSpec. `damped` switches to the Gardner damped-trend
    * step; `mul` (r17) to the multiplicative-seasonality step — the
    * seasonal slots then hold e6-unit RATIOS, the same 9-BIGINT
    * shape, so the state encoder is identical across modes.
    *
    * UPGRADE NOTE: [[HwStreamState]] gained a `lastDay` field in r16,
    * which changed the flatMapGroupsWithState state-encoder schema —
    * Spark does not evolve state schemas, so a query restored from a
    * checkpoint written by the pre-r16 operator fails to deserialize
    * its state. Restart from a FRESH checkpoint path on upgrade (or
    * version the checkpoint directory per state-schema revision). */
  def streamingHoltWinters(days: Dataset[DayCount],
                           damped: Boolean = false,
                           mul: Boolean = false): Dataset[HwFit] = {
    require(!(damped && mul), "damped and mul modes are exclusive")
    import days.sparkSession.implicits._
    import graft.operators.Timeseries
    days.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (et: String, rows: Iterator[DayCount],
         state: GroupState[HwStreamState]) =>
          val arrived = rows.toArray.sortBy(_.day.getTime)
          var st = state.getOption
            .getOrElse(HwStreamState(Vector.empty, 7L, 0L, 0L, Nil, false,
              Long.MinValue))
          val out = Array.newBuilder[HwFit]
          arrived.foreach { dRow =>
            // guard the per-series day-order invariant ACROSS batches
            // (within a batch the sort handles it): a duplicate or
            // late-arriving day would otherwise be stepped as the
            // next rank, silently corrupting the state and every
            // subsequent fit — drop it instead (the closed-day
            // contract says it was already consumed)
            val epochDay = dRow.day.toLocalDate.toEpochDay
            if (epochDay <= st.lastDay) ()
            else {
            st = st.copy(lastDay = epochDay)
            val yy = dRow.y * 1000000L
            if (!st.seeded) {
              val buf = st.bufE6 :+ yy
              if (buf.size < 14) st = st.copy(bufE6 = buf)
              else {
                // seed, then replay rows 8..14 exactly like the
                // batch loop (they feed the trend init AND step)
                var hw = if (mul) Timeseries.hwMulSeed(buf.toIndexedSeq)
                         else Timeseries.hwSeed(buf.toIndexedSeq)
                var r = 8
                while (r <= 14) {
                  val (fitted, next) =
                    if (mul) Timeseries.hwMulStep(hw, r, buf(r - 1))
                    else if (damped) Timeseries.hwStepDamped(hw, r, buf(r - 1))
                    else Timeseries.hwStep(hw, r, buf(r - 1))
                  out += HwFit(et, r.toLong, buf(r - 1) / 1000000L, fitted)
                  hw = next
                  r += 1
                }
                st = HwStreamState(Vector.empty, 14L, hw.l, hw.b, hw.sea,
                  seeded = true, lastDay = epochDay)
              }
            } else {
              val r = st.rank + 1
              val prev = Timeseries.HwState(st.lvl, st.trend, st.seaE6)
              val (fitted, next) =
                if (mul) Timeseries.hwMulStep(prev, r.toInt, yy)
                else if (damped) Timeseries.hwStepDamped(prev, r.toInt, yy)
                else Timeseries.hwStep(prev, r.toInt, yy)
              out += HwFit(et, r, dRow.y, fitted)
              st = HwStreamState(Vector.empty, r, next.l, next.b, next.sea,
                seeded = true, lastDay = epochDay)
            }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming per-user recommendations over the stored CF model
    * ([[graft.operators.Recommend.writeCfModel]]) — the
    * recommendation engine's production serve: each arriving request
    * carries ITS OWN history snapshot (one row per request, the
    * serving-request contract — a user's history is request state,
    * not stream state), explodes to (user, item) votes and joins the
    * catalog²-bounded model. State-free; per-REQUEST answers are
    * batch-independent, so two-batch parity with the batch
    * [[graft.operators.Recommend.recommendForUsers]] is exact
    * (spec'd in StreamingSpec). */
  def streamingRecommend(reqs: Dataset[RecRequest], cfDir: String,
                         n: Int = 5)(writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    reqs.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[RecRequest], _: Long) =>
        val s = batch.sparkSession
        val history = batch.toDF("user_id", "items")
          .select(col("user_id"), explode(col("items")).as("item"))
        writeBatch(graft.operators.Recommend
          .recommendForUsers(s, cfDir, history, n))
      }
      .start()

  /** One next-item request: the user's current context item. */
  case class NextRequest(user_id: Long, item: Long)

  /** Streaming NEXT-ITEM serving over the stored Markov transition
    * model ([[graft.operators.Recommend.writeMarkovModel]]) — the
    * session-based recommender's production serve: each arriving
    * request carries its context item, the micro-batch prunes the
    * model to its context items and ranks. State-free; per-request
    * answers are batch-independent, so two-batch parity with the
    * batch [[graft.operators.Recommend.markovNextServeBatch]] is
    * exact (spec'd in StreamingSpec). */
  def streamingMarkovNext(reqs: Dataset[NextRequest], markovDir: String,
                          k: Int = 5)(writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    reqs.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[NextRequest], _: Long) =>
        val s = batch.sparkSession
        writeBatch(graft.operators.Recommend.markovNextServeBatch(
          s, markovDir, batch.toDF("user_id", "item"), k))
      }
      .start()

  /** One hybrid recommendation request: the user's interaction
    * history snapshot plus their current context item. */
  case class HybridRequest(user_id: Long, items: Seq[Long], ctx: Long)

  /** Streaming HYBRID serving over BOTH stored recommender models —
    * the fused production serve: each arriving request explodes its
    * history for the pruned CF vote list and carries its context
    * item for the pruned Markov list; the micro-batch fuses the two
    * via [[graft.operators.Recommend.recommendHybridServeBatch]].
    * State-free; per-request answers are batch-independent, so
    * two-batch parity with the batch serve is exact (spec'd in
    * StreamingSpec). */
  def streamingHybridRecommend(reqs: Dataset[HybridRequest], cfDir: String,
                               mkDir: String, k: Int = 5, depth: Int = 10)(
      writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    reqs.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[HybridRequest], _: Long) =>
        val s = batch.sparkSession
        val history = batch.toDF("user_id", "items", "ctx")
          .select(col("user_id"), explode(col("items")).as("item"))
        val ctx = batch.toDF("user_id", "items", "ctx")
          .select(col("user_id"), col("ctx").as("item"))
        writeBatch(graft.operators.Recommend.recommendHybridServeBatch(
          s, cfDir, mkDir, history, ctx, k, depth))
      }
      .start()

  /** Streaming Rocchio classification over the stored centroid model
    * ([[graft.functions.Classify.writeCentroidModel]]) — the
    * embedding-modality twin of [[streamingClassifyNb]]: each
    * arriving micro-batch of vectors is routed by its nearest class
    * centroid. State-free (the artifact is the state, maintained
    * out-of-band by the exact append/forget sum algebra); per-vector
    * answers are batch-independent, so two-batch parity with the
    * batch [[graft.functions.Classify.classifyCentroidServeBatch]]
    * is exact (spec'd in StreamingSpec). */
  def streamingClassifyCentroid(vecs: Dataset[QueryVec], centDir: String)(
      writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryVec], _: Long) =>
        val s = batch.sparkSession
        writeBatch(graft.functions.Classify.classifyCentroidServeBatch(
          s, centDir, batch.toDF("vec_id", "embedding")))
      }
      .start()

  /** Streaming k-NN classification over the stored LABELED layout
    * ([[graft.functions.Classify.writeIvfLabeled]]) — the
    * non-parametric twin: per micro-batch, the probed bucket set
    * prunes the layout scan, exact-integer cos_e6 candidates, k-NN
    * majority vote. State-free; per-query answers are
    * batch-independent, so two-batch parity with the batch
    * [[graft.functions.Classify.classifyKnnServeBatch]] is exact
    * (spec'd in StreamingSpec). */
  def streamingClassifyKnn(vecs: Dataset[QueryVec], layoutDir: String,
                           cents: Array[Array[Double]], k: Int = 5,
                           nprobe: Int = graft.functions.Classify.ClsNprobe)(
                           writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryVec], _: Long) =>
        val s = batch.sparkSession
        writeBatch(graft.functions.Classify.classifyKnnServeBatch(
          s, layoutDir, cents, batch.toDF("query_id", "embedding"),
          k, nprobe))
      }
      .start()

  /** Streaming semantic search over the stored IVF-PQ layout
    * ([[graft.operators.Similarity.writeIvfPqPartitioned]]) — the
    * same state-free pruned-serving shape as
    * [[streamingAnnIvfSq8TopK]], over 4-byte/vector residual codes:
    * per micro-batch, probed buckets prune the code-table partitions,
    * exact-integer base+ADC shortlists, and the bounded shortlist
    * reranks against the full-precision corpus. Two-batch parity with
    * the batch [[graft.operators.Similarity.annIvfPq]] is spec'd. */
  def streamingAnnIvfPqTopK(queries: Dataset[QueryVec], ivfPqDir: String,
                            cents: Array[Array[Double]],
                            books: Array[Array[Array[Double]]],
                            fullEmb: DataFrame, k: Int = 5,
                            nprobe: Int = graft.operators.Similarity.IvfNprobe,
                            cand: Int = graft.operators.Similarity.PqCand,
                            excludeSelf: Boolean = false)(
                            writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryVec], _: Long) =>
        val s = batch.sparkSession
        writeBatch(graft.operators.Similarity.annIvfPqServeBatch(
          s, ivfPqDir, cents, books, batch.toDF("query_id", "embedding"),
          fullEmb, k, nprobe, cand, excludeSelf))
      }
      .start()

  /** Streaming Matryoshka serving (NEW r12): the
    * [[streamingAnnIvfTopK]] shape over the prefix-shortlist
    * composition — per micro-batch, probed buckets prune the layout
    * scan, prefix-cosine shortlist, full-dim rerank against the same
    * pruned rows ([[graft.operators.Similarity.annIvfPrefixServeBatch]]
    * is the shared body). Two-batch parity with the batch
    * [[graft.operators.Similarity.annIvfPrefix]] spec'd. */
  def streamingAnnIvfPrefixTopK(queries: Dataset[QueryVec], ivfDir: String,
                                cents: Array[Array[Double]], k: Int = 5,
                                nprobe: Int = graft.operators.Similarity.IvfNprobe,
                                excludeSelf: Boolean = false)(
                                writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryVec], _: Long) =>
        val s = batch.sparkSession
        writeBatch(graft.operators.Similarity.annIvfPrefixServeBatch(
          s, ivfDir, cents, batch.toDF("query_id", "embedding"),
          k, nprobe, excludeSelf = excludeSelf))
      }
      .start()

  case class QueryVecLabeled(query_id: Long, embedding: Array[Float],
                             label: Int)

  /** Streaming hard-negative mining off the stored LABELED layout
    * ([[graft.functions.Classify.writeIvfLabeled]]) — the contrastive
    * trainer's feed: arriving anchors carry their label; per
    * micro-batch the probed bucket set prunes the scan, the
    * cross-label filter applies inside the candidate join, top-k by
    * (cos_e6 desc, id) per anchor. State-free; two-batch parity with
    * the batch [[graft.functions.Classify.mineHardNegativesServeBatch]]
    * is exact (spec'd in StreamingSpec). */
  def streamingMineHardNegatives(vecs: Dataset[QueryVecLabeled],
                                 layoutDir: String,
                                 cents: Array[Array[Double]], k: Int = 5,
                                 nprobe: Int = graft.functions.Classify.ClsNprobe)(
                                 writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryVecLabeled], _: Long) =>
        val s = batch.sparkSession
        writeBatch(graft.functions.Classify.mineHardNegativesServeBatch(
          s, layoutDir, cents,
          batch.toDF("query_id", "embedding", "label"), k, nprobe))
      }
      .start()

  /** Streaming FILTERED vector search (NEW r12): arriving queries
    * carry their predicate value; per micro-batch, probed buckets AND
    * the batch's label set prune/push into the attribute-carrying
    * layout scan, the equality predicate applies inside the bucket
    * join ([[graft.operators.Similarity.annIvfFilteredServeBatch]]).
    * Two-batch parity with the batch
    * [[graft.operators.Similarity.annIvfFiltered]] spec'd. */
  def streamingAnnIvfFilteredTopK(queries: Dataset[QueryVecLabeled],
                                  dir: String, cents: Array[Array[Double]],
                                  k: Int = 5,
                                  nprobe: Int =
                                    graft.operators.Similarity.FilteredNprobe,
                                  excludeSelf: Boolean = false)(
                                  writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryVecLabeled], _: Long) =>
        val s = batch.sparkSession
        writeBatch(graft.operators.Similarity.annIvfFilteredServeBatch(
          s, dir, cents, batch.toDF("query_id", "embedding", "label"),
          k, nprobe, excludeSelf))
      }
      .start()

  // ---- streaming lexical search (pruned inverted-index probe) ------------

  case class QueryTerms(query_id: Long, terms: Seq[String])

  /** Streaming lexical search: arriving term queries probe a STANDING
    * inverted index ([[graft.operators.Search.writeInvertedIndex]]'s
    * layout) — the lexical twin of [[streamingAnnIvfTopK]], built the
    * same way: the probe runs INSIDE `foreachBatch` as a batch plan,
    * the batch's distinct terms prune the postings scan via a
    * pushed-down `token IN (...)`, so per-batch cost tracks the probed
    * posting lists, never the corpus. STATE-FREE for the same reason
    * (a query's candidates are complete within its batch — BM25 stats
    * live in the index, not in stream state). Parity with the batch
    * [[graft.operators.Search.bm25TopK]] on a two-batch split is
    * spec'd in SearchSpec. */
  def streamingBm25TopK(queries: Dataset[QueryTerms], indexDir: String,
                        k: Int = graft.operators.Search.DefaultK)(
                        writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryTerms], _: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val flat = batch.flatMap(q => q.terms.map(q.query_id -> _))
          .toDF("query_id", "term")
        writeBatch(graft.operators.Search.bm25ServeBatch(s, indexDir, flat, k))
      }
      .start()

  /** Streaming phrase serving over the positional layout — the
    * [[streamingBm25TopK]] twin: each micro-batch of (query_id,
    * phrase terms) probes ONLY its terms' bucket directories via
    * [[graft.operators.Search.phraseServeBatch]] (a batch plan inside
    * foreachBatch — stream-static joins cannot partition-prune, the
    * annIvfServeBatch posture). The query batch is driver-collected
    * (bounded by the arriving batch, the phrase-set contract).
    * Two-batch parity with the batch serve is spec'd. */
  def streamingPhraseSearch(queries: Dataset[QueryTerms], posDir: String)(
                            writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryTerms], _: Long) =>
        val s = batch.sparkSession
        val phrases = batch.collect()
          .map(q => q.query_id -> q.terms.toSeq).toSeq
        writeBatch(graft.operators.Search.phraseServeBatch(s, posDir, phrases))
      }
      .start()

  /** Streaming SCD-2 sink: maintain a type-2 dimension history as a
    * parquet snapshot updated per micro-batch via
    * [[graft.operators.Upsert.scd2Apply]] — the SCD-2 twin of the
    * foreachBatch SCD-1 upsert sink. Each batch's affected keys
    * replay their stored change points + the batch; untouched
    * history passes through.
    *
    * The history is PARTITIONED by a key-hash bucket (`_kb`, an
    * internal column — read back through [[readScd2History]]), and
    * each batch rewrites ONLY the buckets its keys hash into, via
    * dynamic partition overwrite (the backfillDays pattern): per-batch
    * write cost tracks the batch's key spread, not the full history —
    * the bound that keeps a year-lived dimension sink viable at
    * 100 TB. The affected slice is read partition-pruned and the
    * merged frame is materialized (localCheckpoint) BEFORE the
    * overwrite — Spark refuses a lazy plan that reads the path it is
    * writing. At-least-once replays are IDEMPOTENT by construction: a
    * change event already present as a change point collapses against
    * itself in the run-collapse (spec'd). In-order batches per key,
    * like the batch operator. */
  def streamingScd2Sink(events: DataFrame, dir: String, key: String,
                        attr: String, ts: String, tie: String,
                        buckets: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        scd2SinkBatch(batch, dir, key, attr, ts, tie, buckets)
      }
      .start()

  /** One micro-batch of the SCD-2 sink, exposed so batch callers and
    * the scale probes can drive the same bounded-write path the
    * streaming sink runs. */
  def scd2SinkBatch(batch: DataFrame, dir: String, key: String,
                    attr: String, ts: String, tie: String,
                    buckets: Int = 64): Unit = {
    val s = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val committed = fs.exists(
      new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"))
    val kb = pmod(xxhash64(col(key)), lit(buckets)).cast("int").as("_kb")
    if (!committed) {
      graft.operators.Upsert.scd2Build(batch, key, attr, ts, tie)
        .withColumn("_kb", kb)
        .write.mode("overwrite").partitionBy("_kb").parquet(dir)
    } else {
      val affected = batch.select(kb).distinct()
        .collect().map(_.getInt(0)).toSeq // bounded by `buckets`
      val slice = s.read.parquet(dir)
        .filter(col("_kb").isin(affected: _*)).drop("_kb")
      val out = graft.operators.Upsert
        .scd2Apply(slice, batch, key, attr, ts, tie)
        .withColumn("_kb", kb)
        .localCheckpoint() // materialize before overwriting read paths
      val conf = "spark.sql.sources.partitionOverwriteMode"
      val prev = s.conf.getOption(conf)
      s.conf.set(conf, "dynamic")
      try out.write.mode("overwrite").partitionBy("_kb").parquet(dir)
      finally prev match {
        case Some(v) => s.conf.set(conf, v)
        case None => s.conf.unset(conf)
      }
    }
    ()
  }

  /** Read back the [[streamingScd2Sink]] history without its internal
    * bucket column. */
  def readScd2History(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir).drop("_kb")

  // ---- streaming CDC apply ------------------------------------------------

  /** Initialize the snapshot a [[streamingCdcApply]] sink maintains:
    * the old snapshot written key-hash-bucketed (`_kb`), so every
    * later micro-batch rewrites only the buckets its diff keys hash
    * into. Read back through [[readCdcSnapshot]]. */
  def writeCdcSnapshot(df: DataFrame, dir: String, keys: Seq[String],
                       buckets: Int = 64): Unit =
    df.withColumn("_kb", cdcBucket(keys, buckets))
      .repartition(col("_kb"))
      .write.mode("overwrite").partitionBy("_kb").parquet(dir)

  private def cdcBucket(keys: Seq[String], buckets: Int) =
    pmod(xxhash64(keys.map(col): _*), lit(buckets)).cast("int")

  /** The [[graft.operators.Cdc.applyCdc]] stream half: maintain a
    * keyed parquet snapshot folded from a stream of snapshotDiff-
    * style change rows (keys, change_type, old_/new_ columns) —
    * the incremental-refresh consumer that turns a few-GB daily/hourly
    * change feed into an always-current 100 TB table copy without
    * re-reading snapshots.
    *
    * Per micro-batch ([[cdcSinkBatch]], the scd2SinkBatch write
    * discipline): the batch's affected key-hash buckets are read
    * partition-pruned, the diff folds in, and ONLY those buckets are
    * rewritten via dynamic partition overwrite — write cost tracks
    * the batch's key spread, never the snapshot. The fold is
    * UPSERT-flavored (ALL diff keys drop out of the kept slice, then
    * insert/update rows come back in), which makes at-least-once
    * replays idempotent: a replayed insert re-lands on its own key
    * instead of duplicating, a replayed delete anti-joins nothing
    * (spec'd) — on a true diff it equals applyCdc exactly. A bucket a
    * delete-only batch drains entirely is removed explicitly (dynamic
    * overwrite only replaces partitions present in the output), and
    * the merged frame is materialized before overwriting the path it
    * read. In-order batches per key, like the batch operator. */
  def streamingCdcApply(diffs: DataFrame, dir: String, keys: Seq[String],
                        compareCols: Seq[String], buckets: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    diffs.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        cdcSinkBatch(batch, dir, keys, compareCols, buckets)
      }
      .start()

  /** One micro-batch of the CDC sink, exposed so batch callers and
    * the scale probes drive the same bounded-write path. */
  def cdcSinkBatch(batch: DataFrame, dir: String, keys: Seq[String],
                   compareCols: Seq[String], buckets: Int = 64): Unit = {
    val s = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val committed = fs.exists(
      new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"))
    val incoming = batch
      .filter(col("change_type").isin("insert", "update"))
      .select(keys.map(col) ++
        compareCols.map(c => col("new_" + c).as(c)): _*)
    if (!committed) {
      // bootstrap from empty: inserts/updates land, deletes no-op
      incoming.withColumn("_kb", cdcBucket(keys, buckets))
        .repartition(col("_kb"))
        .write.mode("overwrite").partitionBy("_kb").parquet(dir)
    } else {
      val affected = batch.select(cdcBucket(keys, buckets).as("_kb"))
        .distinct().collect().map(_.getInt(0)).toSeq // bounded by `buckets`
      val slice = s.read.parquet(dir)
        .filter(col("_kb").isin(affected: _*)).drop("_kb")
      // upsert fold: ALL diff keys leave the kept slice (idempotent
      // replay), insert/update rows come back with their new values
      val touched = batch.select(keys.map(col): _*).distinct()
      val out = slice.join(touched, keys, "left_anti")
        .unionByName(incoming)
        .withColumn("_kb", cdcBucket(keys, buckets))
        .localCheckpoint() // materialize before overwriting read paths
      val conf = "spark.sql.sources.partitionOverwriteMode"
      val prev = s.conf.getOption(conf)
      s.conf.set(conf, "dynamic")
      try out.repartition(col("_kb"))
        .write.mode("overwrite").partitionBy("_kb").parquet(dir)
      finally prev match {
        case Some(v) => s.conf.set(conf, v)
        case None => s.conf.unset(conf)
      }
      // a bucket whose every row a delete-only batch removed is absent
      // from `out` — dynamic overwrite leaves its stale directory
      val written = out.select(col("_kb")).distinct()
        .collect().map(_.getInt(0)).toSet
      affected.filterNot(written).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_kb=$b"), true)
      }
    }
    ()
  }

  /** The maintained CDC snapshot without its internal bucket column. */
  def readCdcSnapshot(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir).drop("_kb")

  case class QueryHybrid(query_id: Long, terms: Seq[String],
                         embedding: Array[Float])

  /** Streaming HYBRID search: each arriving query carries a term set
    * and an embedding; per micro-batch the term-pruned lexical probe
    * and the bucket-pruned IVF probe both run as batch plans and fuse
    * via RRF ([[graft.operators.Search.hybridServeBatch]]) — the
    * serving stack a retrieval pipeline actually runs, inheriting
    * both pruning stories and staying state-free. */
  def streamingHybridTopK(queries: Dataset[QueryHybrid], invDir: String,
                          ivfDir: String, cents: Array[Array[Double]],
                          k: Int = graft.operators.Search.DefaultK,
                          depth: Int = 20,
                          nprobe: Int = graft.operators.Similarity.IvfNprobe,
                          weights: Seq[Double] = Nil)(
                          writeBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[QueryHybrid], _: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val b = batch.localCheckpoint() // two probes, one materialization
        val terms = b.flatMap(q => q.terms.map(q.query_id -> _))
          .toDF("query_id", "term")
        val vecs = b.map(q => (q.query_id, q.embedding))
          .toDF("query_id", "embedding")
        writeBatch(graft.operators.Search.hybridServeBatch(
          s, invDir, ivfDir, cents, terms, vecs, k, depth, nprobe, weights))
      }
      .start()

  /** Run the tumbling aggregation as a real streaming query into an
    * in-memory sink and return the sink contents (used by specs and
    * local smoke runs; `processAllAvailable` drains the source). */
  def runToMemory(spark: SparkSession, source: DataFrame, name: String): DataFrame = {
    val q = tumblingCounts(source).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
