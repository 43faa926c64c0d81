package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Lexical retrieval — BM25 ranked search and its inverted-index
  * serving layout (SURVEY.md §2b). The semantic half of search lives
  * in [[Similarity]] (ANN over embeddings); this is the lexical half
  * a training-data/search pipeline pairs with it (and [[hybridRrf]]
  * fuses the two rankings).
  *
  * Reference scope: the reference (Jiawei57/steam-data-pipeline) has
  * no search capability; this extends the engine the same way the
  * dedup/ANN families do, per the mandate.
  *
  * Scale shape: token rows come from ONE typed pass per doc (the
  * HOF-under-Generate trap — see CLAUDE.md); tf/df/dl are
  * partial-aggregated groupBys of that frame; the query set is tiny
  * and BROADCAST against tf; per-query top-k uses the bounded
  * [[graft.functions.TopK.TopKAggregator]] (map-side partial top-k —
  * k rows per query per partition cross the shuffle, not the
  * candidate lists). The production path is the artifact split:
  * [[writeInvertedIndex]] once, then [[bm25ServeBatch]] reads ONLY
  * the probed term partitions (pushed-down `term IN (...)`) — the
  * lexical analog of the IVF bucket-pruned probe
  * ([[Similarity.annIvfServeBatch]]).
  *
  * Cross-engine determinism (the [[graft.Util]] discipline): with
  * k1 = 1.2 and b = 0.75, the per-term weight
  * tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) multiplied through by
  * 10·S·N⁻¹-free denominators becomes the INTEGER rational
  * 22·tf·S / (10·tf·S + 3·S + 9·dl·N) (S = Σdl, N = docs) — both
  * engines divide the same exactly-representable BIGINTs (one IEEE
  * division, identical bits; exact while 22·tf·S < 2^53 — beyond
  * that, compute in double and keep the 1e-9 snap). The idf uses the
  * +1 variant ln((2N+2)/(2·df+1)) — again an integer rational into
  * ln(). Both factors round to the 1e-9 grid, multiply and sum in
  * exact DECIMAL(13,9)×DECIMAL(13,9), and the final score is ONE
  * double cast rounded to 6 dp; ranking orders by the ROUNDED score
  * with doc_id tie-break, so rank assignment is identical in both
  * engines.
  */
object Search {

  /** Fixed benchmark query set over the synthetic vocabulary:
    * common terms (low idf), the rare 'dup' (high idf), and an
    * out-of-vocabulary term ('warehouse') that must contribute
    * nothing. */
  val BmQueries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("hash", "join", "merge"),
    2L -> Seq("vector", "scan", "filter"),
    3L -> Seq("stream", "window", "batch"),
    4L -> Seq("dup", "customer", "warehouse"),
    5L -> Seq("spark", "query", "fast"))

  val DefaultK = 10

  /** Per-(doc, token) term frequencies — one typed corpus pass. */
  private[graft] def termFreqs(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        t.toLowerCase.split("\\s+").iterator.filter(_.nonEmpty).map(id -> _) }
      .toDF("doc_id", "token")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
  }

  /** The two rounded DECIMAL(13,9) factors of a term's BM25
    * contribution (see object doc for the integer-rational
    * derivation). `nDocs`/`sTok` are corpus scalars. */
  private def idfCol(df: Column, nDocs: Long): Column =
    round(log(lit(2L * nDocs + 2).cast("double") /
      (lit(2L) * df + lit(1L)).cast("double")), 9).cast(DecimalType(13, 9))

  private def wCol(tf: Column, dl: Column, nDocs: Long, sTok: Long): Column =
    round((lit(22L) * tf * lit(sTok)).cast("double") /
      (lit(10L) * tf * lit(sTok) + lit(3L * sTok) + lit(9L) * dl * lit(nDocs))
        .cast("double"), 9).cast(DecimalType(13, 9))

  /** Score a (query_id, term) set against per-doc stats and emit the
    * per-query top-k: (query_id, doc_id, bm25, rank). Shared core of
    * the inline query and the index-served path — identical results
    * by construction. `tfd` must carry (doc_id, token, tf, dl, df). */
  private def scoreAndRank(queries: DataFrame, tfd: DataFrame,
                           nDocs: Long, sTok: Long, k: Int): DataFrame = {
    val s = tfd.sparkSession
    import s.implicits._
    val contrib = tfd
      .join(broadcast(queries.withColumnRenamed("term", "token")), Seq("token"))
      .select(col("query_id"), col("doc_id"),
        (idfCol(col("df"), nDocs) * wCol(col("tf"), col("dl"), nDocs, sTok))
          .as("contrib"))
    val scored = contrib
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("contrib")).cast("double"), 6).as("bm25"))
    scored.select(col("query_id"), col("doc_id"), col("bm25"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => graft.functions.TopK.Scored(t._2, t._3))
      .agg(new graft.functions.TopK.TopKAggregator(k).toColumn)
      .flatMap { case (qid, arr) =>
        arr.iterator.zipWithIndex.map { case (sc, i) => (qid, sc.id, sc.score, i + 1) } }
      .toDF("query_id", "doc_id", "bm25", "rank")
      .orderBy(col("query_id"), col("rank"))
  }

  /** bm25_topk — the oracle-gated inline query: stats are derived
    * from the corpus in-plan (the lineage recomputes the token pass
    * per aggregate — acceptable for the gate query; production uses
    * [[writeInvertedIndex]] + [[bm25ServeBatch]], the artifact split,
    * exactly like ngram_lm's model split). The two corpus scalars
    * (N, S) are a bounded driver artifact (one 2-value collect, the
    * centroid precedent). */
  def bm25TopK(s: SparkSession, d: String, k: Int = DefaultK): DataFrame = {
    import s.implicits._
    // the stats collect below forces evaluation anyway, so the
    // checkpoint is EAGER here (not the lazy-cache trap — CLAUDE.md):
    // tf feeds dl/df/stats/scoring, and without it the token pass
    // re-executes once per consumer
    val tf = termFreqs(Tables.documents(s, d)).localCheckpoint()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val Array(nDocs, sTok) = dl.agg(count(lit(1)), sum(col("dl")))
      .as[(Long, Long)].collect().flatMap(t => Array(t._1, t._2))
    val tfd = tf.join(dl, "doc_id").join(broadcast(df), "token")
    val queries = BmQueries.flatMap { case (q, ts) => ts.map(q -> _) }
      .toDF("query_id", "term")
    scoreAndRank(queries, tfd, nDocs, sTok, k)
  }

  // ---- inverted-index artifact + pruned serving ------------------------

  /** Write the inverted index as THREE tables under `dir`:
    *
    *   - `postings/token=.../` — `(doc_id, tf, dl)` partitioned BY
    *     TERM, so a query batch's scan is pruned to its terms'
    *     partition directories (the lexical analog of
    *     [[Similarity.writeIvfPartitioned]]'s bucket layout),
    *   - `df` — the vocabulary-sized `(token, df)` table,
    *   - `stats` — the 1-row corpus scalars (n_docs, s_tok).
    *
    * df/stats live OUTSIDE the posting rows (not denormalized) so the
    * index is incrementally maintainable: appending a batch of NEW
    * docs ([[appendInvertedIndex]]) appends postings in place and
    * ADDS the batch's df/stats deltas — exact, because a new doc
    * contributes to each count once. A denormalized df would go stale
    * corpus-wide on every append. */
  def writeInvertedIndex(docs: DataFrame, dir: String): Unit = {
    val tf = termFreqs(docs).localCheckpoint()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    tf.join(dl, "doc_id")
      .select(col("token"), col("doc_id"), col("tf"), col("dl"))
      // cluster by token before the partitioned write: without this,
      // every task writes a file into every token directory it holds a
      // row for — tasks × vocabulary files (measured 180s vs 20s on a
      // 10k-term Zipf vocabulary); clustered, each term directory gets
      // one file
      .repartition(col("token"))
      .write.mode("overwrite").partitionBy("token").parquet(s"$dir/postings")
    // no coalesce(1): df is corpus-vocabulary-sized (same reasoning as
    // the append path); small files fold in at compaction
    tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$dir/df")
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("s_tok"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  // ---- bucketed postings: the vocabulary-independent layout --------------

  /** The per-term partitioning above keeps pruning exact but costs one
    * DIRECTORY per vocabulary term — at a real corpus vocabulary
    * (millions of terms) that is millions of directories, past what
    * object-store listings and driver partition discovery tolerate.
    * This is the production alternative: postings partition by a HASH
    * BUCKET of the token (`tb`, `nBuckets` directories total,
    * vocabulary-independent), rows sorted by token within each file so
    * parquet row-group statistics skip non-probed terms inside a
    * probed bucket. A query batch probes ≤ |distinct terms| bucket
    * directories (listed directly, like [[bm25ServeBatch]]) and pushes
    * `token IN (...)` into the scan. `nBuckets` travels with the
    * layout in a `meta` table — serve derives buckets with the SAME
    * hash, so the two can never disagree. */
  def writeInvertedIndexBucketed(docs: DataFrame, dir: String,
                                 nBuckets: Int = 1024,
                                 rowGroupBytes: Long = 8L << 20): Unit = {
    val s = docs.sparkSession
    import s.implicits._
    val tf = termFreqs(docs).localCheckpoint()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    tf.join(dl, "doc_id")
      .select(col("token"), col("doc_id"), col("tf"), col("dl"))
      .withColumn("tb", pmod(xxhash64(col("token")), lit(nBuckets)).cast("int"))
      .repartition(col("tb"))
      .sortWithinPartitions(col("tb"), col("token"), col("doc_id"))
      .write.mode("overwrite").partitionBy("tb")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(s"$dir/postings")
    // df is BUCKETED like the postings: a flat vocabulary-sized table
    // would be scanned whole on every serve (O(vocab) per batch at a
    // millions-term vocabulary); bucketed, serve reads only the probed
    // df buckets, and appends merge only the touched ones
    tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .withColumn("tb", pmod(xxhash64(col("token")), lit(nBuckets)).cast("int"))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$dir/df")
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("s_tok"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    Seq(nBuckets).toDF("n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Daily maintenance for the bucketed layout — the
    * [[appendInvertedIndex]] twin: batch postings append inside the
    * existing bucket directories (assignment replayed from the stored
    * `n_buckets`, so writer and append can never disagree), df/stats
    * merge the batch's exact deltas. */
  def appendInvertedIndexBucketed(batch: DataFrame, dir: String): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    val nBuckets = s.read.parquet(s"$dir/meta")
      .as[Int].head() // one-row layout contract
    val tf = termFreqs(batch).localCheckpoint()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    tf.join(dl, "doc_id")
      .select(col("token"), col("doc_id"), col("tf"), col("dl"))
      .withColumn("tb", pmod(xxhash64(col("token")), lit(nBuckets)).cast("int"))
      .repartition(col("tb"))
      .sortWithinPartitions(col("tb"), col("token"), col("doc_id"))
      .write.mode("append").partitionBy("tb").parquet(s"$dir/postings")
    // df merge touches only the buckets the batch's tokens hash into —
    // read those partitions, fold the deltas, dynamic-overwrite them
    // (the scd2SinkBatch discipline); untouched df buckets keep their
    // files byte-identical
    val deltas = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .withColumn("tb", pmod(xxhash64(col("token")), lit(nBuckets)).cast("int"))
    val affected = deltas.select(col("tb")).distinct()
      .as[Int].collect().toSeq // bounded by nBuckets
    val mergedDf = s.read.parquet(s"$dir/df")
      .filter(col("tb").isin(affected: _*))
      .unionByName(deltas)
      .groupBy(col("token"), col("tb")).agg(sum(col("df")).as("df"))
      .select(col("token"), col("df"), col("tb"))
      .localCheckpoint() // materialize before overwriting read partitions
    val conf = "spark.sql.sources.partitionOverwriteMode"
    val prev = s.conf.getOption(conf)
    s.conf.set(conf, "dynamic")
    try mergedDf.repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$dir/df")
    finally prev match {
      case Some(v) => s.conf.set(conf, v)
      case None => s.conf.unset(conf)
    }
    val mergedStats = s.read.parquet(s"$dir/stats")
      .unionByName(dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("s_tok")))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("s_tok")).as("s_tok"))
      .localCheckpoint()
    mergedStats.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Serve a query batch against the bucketed layout — result-
    * identical to [[bm25ServeBatch]] over the same corpus (spec'd):
    * probed terms → probed buckets (same stored hash), only those
    * bucket directories are LISTED and read — for the postings AND
    * the df lookup — and the `token IN` filter pushes into the scan
    * where the within-file token sort lets row-group stats skip
    * non-probed terms. */
  def bm25ServeBatchBucketed(s: SparkSession, dir: String,
                             queries: DataFrame,
                             k: Int = DefaultK): DataFrame = {
    import s.implicits._
    val nBuckets = s.read.parquet(s"$dir/meta").as[Int].head()
    val terms = queries.select(col("term")).distinct()
      .as[String].collect().sorted // bounded by the query batch
    if (terms.isEmpty)
      return Seq.empty[(Long, Long, Double, Int)]
        .toDF("query_id", "doc_id", "bm25", "rank")
    // bucket assignment replayed through the same Spark hash the
    // writer used (driver-side reimplementation could drift)
    val buckets = terms.toSeq.toDF("token")
      .select(pmod(xxhash64(col("token")), lit(nBuckets)).cast("int"))
      .as[Int].collect().distinct.sorted
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val bucketDirs = buckets.map(b => s"$dir/postings/tb=$b")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (bucketDirs.isEmpty)
      return Seq.empty[(Long, Long, Double, Int)]
        .toDF("query_id", "doc_id", "bm25", "rank")
    val dfDirs = buckets.map(b => s"$dir/df/tb=$b")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (dfDirs.isEmpty) // postings/df dirs are written together
      return Seq.empty[(Long, Long, Double, Int)]
        .toDF("query_id", "doc_id", "bm25", "rank")
    val post = minusDocTombstones(s, dir,
        s.read.option("basePath", s"$dir/postings")
          .parquet(bucketDirs: _*)
          .filter(col("token").isin(terms: _*)))
      .join(broadcast(s.read.option("basePath", s"$dir/df")
        .parquet(dfDirs: _*)
        .filter(col("token").isin(terms: _*))
        .drop("tb")), "token")
    val Array(nDocs, sTok) = s.read.parquet(s"$dir/stats")
      .as[(Long, Long)].collect().flatMap(t => Array(t._1, t._2))
    scoreAndRank(queries, post, nDocs, sTok, k)
  }

  /** [[compactInvertedIndex]] for the bucketed layout: same rewrite,
    * bucket partitioning and the within-file token sort preserved;
    * the df table keeps its bucket partitioning too. */
  def compactInvertedIndexBucketed(s: SparkSession, dir: String,
                                   targetBytes: Long = 128L << 20): Unit = {
    val hadTombstones = new org.apache.hadoop.fs.Path(docTombstonePath(dir))
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(docTombstonePath(dir)))
    graft.sources.Compact.compactInPlace(s, s"$dir/postings", targetBytes,
      partitionCols = Seq("tb"),
      sortCols = Seq("tb", "token", "doc_id"),
      transform = df => minusDocTombstones(s, dir, df))
    if (hadTombstones) foldIndexTombstones(s, dir, bucketed = true)
    else {
      graft.sources.Compact.compactInPlace(s, s"$dir/df", targetBytes,
        partitionCols = Seq("tb"))
      ()
    }
  }

  // ---- deletion support (doc tombstones over the stored index) -----------

  /** DELETE documents from a stored inverted index (either layout) —
    * the lexical twin of [[Similarity.deleteFromLayout]]: doc_ids
    * append to a `_tombstones` log under the index (underscore =
    * invisible to every table scan; posting files stay immutable
    * between compactions). Serving subtracts the log from the probed
    * postings — a deleted doc can never be returned — while df/stats
    * keep counting it until compaction (the Lucene deleted-docs
    * discipline: survivor scores use the stale corpus stats, and the
    * compaction fold restores exactness). Both compaction paths FOLD
    * the log: postings rewritten without the docs, df and stats
    * RECOMPUTED from the surviving postings, log cleared. */
  def deleteFromInvertedIndex(s: SparkSession, dir: String,
                              docIds: DataFrame): Unit =
    docIds.select(col("doc_id")).distinct()
      .write.mode("append").parquet(s"$dir/_tombstones")

  private def docTombstonePath(dir: String) = s"$dir/_tombstones"

  private def minusDocTombstones(s: SparkSession, dir: String,
                                 rows: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(docTombstonePath(dir))
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) rows
    else rows.join(broadcast(s.read.parquet(docTombstonePath(dir))
        .select(col("doc_id")).distinct()),
      Seq("doc_id"), "left_anti")
  }

  /** Recompute df + stats from the (already tombstone-folded)
    * postings and clear the log — the shared tail of both compaction
    * folds. df/stats derive exactly: df = postings per token, stats
    * from the per-doc (doc_id, dl) distinct view. */
  private def foldIndexTombstones(s: SparkSession, dir: String,
                                  bucketed: Boolean): Unit = {
    import s.implicits._
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val post = s.read.parquet(s"$dir/postings")
    val newDf0 = post.groupBy(col("token")).agg(count(lit(1)).as("df"))
    if (bucketed) {
      val nBuckets = s.read.parquet(s"$dir/meta").as[Int].head()
      newDf0
        .withColumn("tb", pmod(xxhash64(col("token")), lit(nBuckets)).cast("int"))
        .repartition(col("tb"))
        .localCheckpoint() // materialize before overwriting the df path
        .write.mode("overwrite").partitionBy("tb").parquet(s"$dir/df")
    } else {
      newDf0.localCheckpoint()
        .write.mode("overwrite").parquet(s"$dir/df")
    }
    post.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("s_tok"))
      .localCheckpoint()
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    fs.delete(new org.apache.hadoop.fs.Path(docTombstonePath(dir)), true)
  }

  /** Daily index maintenance: fold a batch of NEW docs into the
    * standing index — postings append INSIDE the existing term
    * partition directories (pruned probes see the new docs with no
    * index rewrite, the [[Similarity.appendIvfPartitioned]] shape),
    * and the df/stats tables merge the batch's exact deltas (both are
    * materialized via localCheckpoint BEFORE their overwrite — Spark
    * refuses a lazy overwrite-while-reading plan). Docs must be new
    * (append-only corpus, the dedup_incremental posture): re-appended
    * doc_ids would double-count df. Spec'd: append-then-serve ≡
    * one-shot index of the union. */
  def appendInvertedIndex(batch: DataFrame, dir: String): Unit = {
    val s = batch.sparkSession
    val tf = termFreqs(batch).localCheckpoint()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    tf.join(dl, "doc_id")
      .select(col("token"), col("doc_id"), col("tf"), col("dl"))
      .repartition(col("token")) // one file per touched term directory
      .write.mode("append").partitionBy("token").parquet(s"$dir/postings")
    val mergedDf = s.read.parquet(s"$dir/df")
      .unionByName(tf.groupBy(col("token")).agg(count(lit(1)).as("df")))
      .groupBy(col("token")).agg(sum(col("df")).as("df"))
      .localCheckpoint()
    // no coalesce(1): the df table is corpus-vocabulary-sized — a
    // single-task write serializes the merge at scale. Small files
    // from repeated appends are compactIndex's job, not this path's.
    mergedDf.write.mode("overwrite").parquet(s"$dir/df")
    val mergedStats = s.read.parquet(s"$dir/stats")
      .unionByName(dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("s_tok")))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("s_tok")).as("s_tok"))
      .localCheckpoint()
    mergedStats.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Periodic maintenance for the inverted-index artifact: daily
    * [[appendInvertedIndex]] runs accrete one small file per touched
    * term partition (and a multi-file df merge) — re-collapse both in
    * place, keeping the token partitioning so pruned probes keep
    * pruning. stats is a single row rewritten whole each append and
    * needs no maintenance. Serve-identical (spec'd in SearchSpec). */
  def compactInvertedIndex(s: SparkSession, dir: String,
                           targetBytes: Long = 128L << 20): Unit = {
    val hadTombstones = new org.apache.hadoop.fs.Path(docTombstonePath(dir))
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(docTombstonePath(dir)))
    graft.sources.Compact.compactInPlace(s, s"$dir/postings", targetBytes,
      partitionCols = Seq("token"),
      // partition-value type inference would rewrite an all-numeric
      // vocabulary's token dirs as ints — pin the key to string
      transform = df => minusDocTombstones(s, dir,
        df.withColumn("token", col("token").cast("string"))))
    if (hadTombstones) foldIndexTombstones(s, dir, bucketed = false)
    else {
      graft.sources.Compact.compactInPlace(s, s"$dir/df", targetBytes)
      ()
    }
  }

  /** Serve ONE batch of term queries against the stored index: the
    * batch's distinct terms (bounded by the batch) prune the postings
    * scan via pushed-down `token IN (...)` (and the df lookup the
    * same way) — per-batch cost tracks the probed posting lists,
    * never the corpus. Result-identical to [[bm25TopK]] over the same
    * corpus and queries (spec'd). */
  def bm25ServeBatch(s: SparkSession, dir: String, queries: DataFrame,
                     k: Int = DefaultK): DataFrame = {
    import s.implicits._
    // layout dispatch: a bucketed index carries its meta table — every
    // serving entry point (hybrid, streaming) then works against
    // either layout transparently
    if (new org.apache.hadoop.fs.Path(s"$dir/meta").getFileSystem(
          s.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(s"$dir/meta")))
      return bm25ServeBatchBucketed(s, dir, queries, k)
    val terms = queries.select(col("term")).distinct()
      .as[String].collect().sorted // bounded by the query batch
    // Prune at the LISTING level, not just the scan: a plain read of
    // the postings root lists EVERY term partition before the filter
    // prunes any (measured 19s of pure directory listing on a 10k-term
    // Zipf vocabulary — O(vocab) per query batch, the real bottleneck
    // at a corpus-scale vocabulary). Addressing the probed term
    // directories directly makes serve O(probed terms); basePath keeps
    // the token partition column. Missing directories = OOV terms,
    // dropped here exactly as the filter would.
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName _
    val termDirs = terms.map(t => s"$dir/postings/token=${esc(t)}")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (termDirs.isEmpty) // every term OOV: empty result, ranked schema
      return Seq.empty[(Long, Long, Double, Int)]
        .toDF("query_id", "doc_id", "bm25", "rank")
    val post = minusDocTombstones(s, dir,
        s.read.option("basePath", s"$dir/postings")
          .parquet(termDirs: _*))
      .join(broadcast(s.read.parquet(s"$dir/df")
        .filter(col("token").isin(terms: _*))), "token")
    val Array(nDocs, sTok) = s.read.parquet(s"$dir/stats")
      .as[(Long, Long)].collect().flatMap(t => Array(t._1, t._2))
    scoreAndRank(queries, post, nDocs, sTok, k)
  }

  // ---- hybrid retrieval: reciprocal-rank fusion ------------------------

  /** search_hybrid_rrf — fuse the lexical ([[bm25TopK]]) and semantic
    * (exact cosine top-k, the ANN family's correctness baseline)
    * rankings per query via reciprocal-rank fusion:
    * rrf(d) = Σ_lists 1/(60 + rank_list(d)) (Cormack et al.'s k=60).
    * The query set pairs each [[BmQueries]] term set with the
    * embedding of the SAME id — doc_id and vec_id are an aligned id
    * space in this corpus. RRF consumes ANY ranked lists, so the
    * production form feeds the IVF-served semantic list
    * ([[Similarity.annIvfServeBatch]]) and the index-served lexical
    * list ([[bm25ServeBatch]]) — rank fusion itself is a tiny
    * groupBy over 2·depth rows per query.
    *
    * Determinism: each 1/(60+rank) is one IEEE division of exact
    * integers, snapped to the 1e-9 grid and summed in exact decimal;
    * final score is one double cast rounded to 6 dp; ranking orders
    * by (rounded rrf, doc_id) in both engines. */
  /** Fuse ANY ranked lists `(query_id, doc_id, rank)` via RRF — list-
    * agnostic: the gate query feeds it exact rankings, the serving
    * path feeds it the index-served lexical and IVF-served semantic
    * lists. Fusion itself is one tiny groupBy over Σ|lists| rows per
    * query.
    *
    * `weights` (optional, positional with `lists`; missing entries
    * default to 1.0) turn this into weighted RRF — the production
    * knob for biasing lexical vs semantic evidence. Determinism holds
    * unchanged: w/(60+rank) is ONE IEEE division of a literal by an
    * exact small integer, snapped to the 1e-9 grid before the exact
    * decimal sum. */
  def rrfFuse(lists: Seq[DataFrame], k: Int = DefaultK,
              weights: Seq[Double] = Nil): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(weights.isEmpty || weights.length <= lists.length,
      "more weights than lists")
    val s = lists.head.sparkSession
    import s.implicits._
    def rrfTerm(w: Double) = round(lit(w) /
      (lit(60) + col("rank")).cast("double"), 9).cast(DecimalType(13, 9))
    lists.zipWithIndex.map { case (l, i) =>
        val w = if (i < weights.length) weights(i) else 1.0
        l.select(col("query_id"), col("doc_id"), rrfTerm(w).as("c"))
      }
      .reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("c")).cast("double"), 6).as("rrf"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => graft.functions.TopK.Scored(t._2, t._3))
      .agg(new graft.functions.TopK.TopKAggregator(k).toColumn)
      .flatMap { case (qid, arr) =>
        arr.iterator.zipWithIndex.map { case (sc, i) => (qid, sc.id, sc.score, i + 1) } }
      .toDF("query_id", "doc_id", "rrf", "rank")
      .orderBy(col("query_id"), col("rank"))
  }

  def hybridRrf(s: SparkSession, d: String, k: Int = DefaultK,
                depth: Int = 20): DataFrame =
    hybridRrfWeighted(s, d, k, depth, Nil)

  /** search_hybrid_wrrf — the WEIGHTED fusion gate query: same two
    * rankings as [[hybridRrf]], lexical evidence down-weighted to
    * 0.75 (both default weights are binary-exact doubles, so the
    * oracle's decimal literals parse to identical bits). Oracle-gated
    * separately from the unweighted form so the weighted path is
    * hash-verified, not just spec'd. */
  val WrrfLexWeight = 0.75
  def hybridRrfWeighted(s: SparkSession, d: String, k: Int = DefaultK,
                        depth: Int = 20,
                        weights: Seq[Double] = Seq(WrrfLexWeight, 1.0))
      : DataFrame = {
    val cosSim = graft.functions.CosineSimilarity.cosineSim _
    val lex = bm25TopK(s, d, depth)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val qids = BmQueries.map(_._1)
    // semantic side: the exhaustive bucket EQUI-join pair product
    // (bit-identical to the broadcast cross product this used through
    // r13, but it plans as a hash join — the last two hybrid BNLJs
    // retired by the annIvfPrefix precedent)
    val semScored = Similarity.exhaustivePairsFor(s, d, qids)
      .select(col("query_id"), col("neighbor_id"),
        round(cosSim(col("qv"), col("v")), 6).as("cos_sim"))
    val sem = Similarity.topKPerQuery(semScored, depth, ordered = false)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, sem), k, weights)
  }

  /** Serve ONE batch of hybrid queries against the STORED layouts:
    * the index-served lexical list ([[bm25ServeBatch]], term-pruned)
    * fused with the IVF-served semantic list
    * ([[Similarity.annIvfServeBatch]], bucket-pruned). Both probes
    * read only what the batch touches, so hybrid serving inherits
    * both pruning stories. With `nprobe` = nlist the semantic list is
    * exhaustive and this is result-identical to [[hybridRrf]]
    * (spec'd); at serving nprobe it trades that for the probe cost,
    * exactly the IVF recall trade documented in [[Similarity]]. */
  def hybridServeBatch(s: SparkSession, invDir: String, ivfDir: String,
                       cents: Array[Array[Double]],
                       termQueries: DataFrame, vecQueries: DataFrame,
                       k: Int = DefaultK, depth: Int = 20,
                       nprobe: Int = Similarity.IvfNprobe,
                       weights: Seq[Double] = Nil): DataFrame = {
    val lex = bm25ServeBatch(s, invDir, termQueries, depth)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val sem = Similarity.annIvfServeBatch(s, ivfDir, cents, vecQueries,
        depth, nprobe)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, sem), k, weights)
  }

  /** Fusion-quality channel (the recall analog for hybrid serving):
    * top-k overlap between the SERVING-form fusion — lexical list +
    * IVF semantic list at serving nprobe — and the gate fusion, whose
    * semantic side is the exhaustive exact cosine ranking. 1.0 means
    * the nprobe trade cost the fused ranking nothing; measured
    * per-round by Bench next to the ANN recalls, floored in
    * RecallSpec. */
  def hybridFusionQuality(s: SparkSession, d: String, k: Int = DefaultK,
                          depth: Int = 20,
                          nprobe: Int = Similarity.IvfNprobe): Double = {
    val qids = BmQueries.map(_._1)
    val lex = bm25TopK(s, d, depth)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val sem = Similarity
      .annIvf(s, d, nQueries = qids.max.toInt + 1, k = depth, nprobe = nprobe)
      .filter(col("query_id").isInCollection(qids))
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val served = rrfFuse(Seq(lex, sem), k).select("query_id", "doc_id")
    val gate = hybridRrf(s, d, k).select("query_id", "doc_id")
    val n = gate.count().toDouble
    if (n == 0) 0.0
    else served.join(gate, Seq("query_id", "doc_id"), "left_semi").count() / n
  }

  /** DuckDB oracle for [[hybridRrf]] — the bm25 pipeline as CTEs, the
    * brute-force cosine ranking, and the fused decimal sum. `wLex` /
    * `wSem` are SQL literal texts (kept as strings so both engines
    * parse the same decimal — the defaults are binary-exact anyway);
    * "1" reproduces the unweighted gate. */
  def hybridRrfOracleSql(k: Int = DefaultK, depth: Int = 20,
                         wLex: String = "1", wSem: String = "1"): String = {
    val qids = BmQueries.map(_._1).mkString(", ")
    val qvals = BmQueries.flatMap { case (q, ts) =>
      ts.map(t => s"(CAST($q AS BIGINT), '$t')") }.mkString(",\n        ")
    raw"""
      WITH tok AS (
        SELECT doc_id,
          unnest(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> length(x) > 0)) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(dl) AS BIGINT) AS s_tok FROM dl),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      qt(query_id, term) AS (VALUES
        $qvals),
      contrib AS (
        SELECT q.query_id, f.doc_id,
          CAST(round(ln(CAST(2 * s.n_docs + 2 AS DOUBLE) /
                        CAST(2 * d.df + 1 AS DOUBLE)), 9) AS DECIMAL(13,9)) *
          CAST(round(CAST(22 * f.tf * s.s_tok AS DOUBLE) /
                     CAST(10 * f.tf * s.s_tok + 3 * s.s_tok
                          + 9 * l.dl * s.n_docs AS DOUBLE), 9)
               AS DECIMAL(13,9)) AS c
        FROM qt q
        JOIN tf f ON f.token = q.term
        JOIN df d ON d.token = q.term
        JOIN dl l ON l.doc_id = f.doc_id
        CROSS JOIN stats s),
      bm AS (
        SELECT query_id, doc_id,
          round(CAST(sum(c) AS DOUBLE), 6) AS bm25
        FROM contrib GROUP BY 1, 2),
      lex AS (
        SELECT query_id, doc_id, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY bm25 DESC, doc_id) AS rank
          FROM bm) WHERE rank <= $depth),
      qv AS (SELECT vec_id AS query_id, embedding FROM embeddings
             WHERE vec_id IN ($qids)),
      semscore AS (
        SELECT q.query_id, e.vec_id AS doc_id,
          round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                       CAST(e.embedding AS DOUBLE[])), 6) AS cs
        FROM qv q CROSS JOIN embeddings e),
      sem AS (
        SELECT query_id, doc_id, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cs DESC, doc_id) AS rank
          FROM semscore) WHERE rank <= $depth),
      rrlists AS (
        SELECT query_id, doc_id,
          CAST(round(CAST($wLex AS DOUBLE) / CAST(60 + rank AS DOUBLE), 9)
               AS DECIMAL(13,9)) AS c
        FROM lex
        UNION ALL
        SELECT query_id, doc_id,
          CAST(round(CAST($wSem AS DOUBLE) / CAST(60 + rank AS DOUBLE), 9)
               AS DECIMAL(13,9)) AS c
        FROM sem),
      fused AS (
        SELECT query_id, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS rrf
        FROM rrlists GROUP BY 1, 2)
      SELECT query_id, doc_id, rrf, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY rrf DESC, doc_id) AS INT) AS rank
        FROM fused)
      WHERE rank <= $k
      ORDER BY query_id, rank"""
  }

  /** DuckDB oracle for [[bm25TopK]] — replays the tokenization, the
    * integer-rational factors, and the decimal sum. */
  def bm25OracleSql(k: Int = DefaultK): String = {
    val qvals = BmQueries.flatMap { case (q, ts) =>
      ts.map(t => s"(CAST($q AS BIGINT), '$t')") }.mkString(",\n        ")
    raw"""
      WITH tok AS (
        SELECT doc_id,
          unnest(list_filter(string_split_regex(lower(text), '\s+'),
                             x -> length(x) > 0)) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(dl) AS BIGINT) AS s_tok FROM dl),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      qt(query_id, term) AS (VALUES
        $qvals),
      contrib AS (
        SELECT q.query_id, f.doc_id,
          CAST(round(ln(CAST(2 * s.n_docs + 2 AS DOUBLE) /
                        CAST(2 * d.df + 1 AS DOUBLE)), 9) AS DECIMAL(13,9)) *
          CAST(round(CAST(22 * f.tf * s.s_tok AS DOUBLE) /
                     CAST(10 * f.tf * s.s_tok + 3 * s.s_tok
                          + 9 * l.dl * s.n_docs AS DOUBLE), 9)
               AS DECIMAL(13,9)) AS c
        FROM qt q
        JOIN tf f ON f.token = q.term
        JOIN df d ON d.token = q.term
        JOIN dl l ON l.doc_id = f.doc_id
        CROSS JOIN stats s),
      agg AS (
        SELECT query_id, doc_id,
          round(CAST(sum(c) AS DOUBLE), 6) AS bm25
        FROM contrib GROUP BY 1, 2)
      SELECT query_id, doc_id, bm25, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY bm25 DESC, doc_id) AS INT) AS rank
        FROM agg)
      WHERE rank <= $k
      ORDER BY query_id, rank"""
  }

  // ---- phrase search: positional postings --------------------------------

  /** Fixed phrase set over the synthetic vocabulary: two-term phrases
    * that occur naturally, a rarer three-term phrase, and the
    * repeated-token phrase ("window window") that exercises the
    * OVERLAPPING-occurrence semantics (position-based counting finds
    * both matches in "window window window"; a string replace-count
    * would miss one). */
  val PhraseQueries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("merge", "join"),
    2L -> Seq("sort", "order"),
    3L -> Seq("stream", "batch"),
    4L -> Seq("hash", "join", "merge"),
    5L -> Seq("window", "window"))

  /** phrase_search — exact phrase containment over the corpus: every
    * (query, doc) pair where the phrase occurs as a CONSECUTIVE token
    * sequence, with total (overlapping) match count and first
    * position. The inline form is one typed scan per doc (phrases
    * broadcast in the closure, O(len × phrases) per doc, no shuffle
    * before the final sort); the production path is the positional
    * index split ([[writePositionalIndex]] + [[phraseServeBatch]]),
    * spec'd result-identical. */
  def phraseSearch(s: SparkSession, d: String,
                   phrases: Seq[(Long, Seq[String])] = PhraseQueries)
      : DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(phrases)
    graft.Util.fanOutIfAtLeast(
        Tables.documents(s, d).select(col("doc_id"), col("text"))
          .as[(Long, String)])
      .flatMap { case (id, t) =>
        val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        bc.value.iterator.flatMap { case (qid, terms) =>
          var n = 0L; var first = -1L
          var p = 0
          val L = terms.length
          while (p + L <= toks.length) {
            var i = 0
            while (i < L && toks(p + i) == terms(i)) i += 1
            if (i == L) { n += 1; if (first < 0) first = p.toLong }
            p += 1
          }
          if (n > 0) Iterator.single((qid, id, n, first)) else Iterator.empty
        }
      }
      .toDF("query_id", "doc_id", "n_matches", "first_pos")
      .orderBy(col("query_id"), col("doc_id"))
  }

  /** DuckDB replay of [[phraseSearch]]: positions via a lateral
    * unnest(range) and the phrase match as a LIST-SLICE equality —
    * position-based, so overlapping occurrences count exactly like
    * the Spark scan. */
  val phraseSearchOracle: String = {
    val qvals = PhraseQueries.map { case (q, ts) =>
      s"($q, [${ts.map(t => s"'$t'").mkString(", ")}])"
    }.mkString(",\n        ")
    raw"""
      WITH t AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM documents),
      q(query_id, terms) AS (VALUES
        $qvals),
      m AS (
        SELECT q.query_id, t.doc_id, u.p
        FROM t, q, unnest(range(0, len(t.toks))) AS u(p)
        WHERE u.p + len(q.terms) <= len(t.toks)
          AND t.toks[u.p + 1 : u.p + len(q.terms)] = q.terms)
      SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        COUNT(*) AS n_matches, MIN(p) AS first_pos
      FROM m GROUP BY query_id, doc_id
      ORDER BY query_id, doc_id"""
  }

  /** Positional-postings layout — the phrase-serving artifact:
    * (token, doc_id, pos) rows partitioned by a token hash bucket
    * (the [[writeInvertedIndexBucketed]] vocabulary-independent
    * discipline: bounded directory count, within-file token sort for
    * row-group skipping, n_buckets stored in `meta` so writer and
    * serve can never disagree). Shares the inverted-index tombstone
    * log contract: [[deleteFromInvertedIndex]] against this dir, and
    * [[phraseServeBatch]] subtracts. */
  /** One typed pass: (token, doc_id, pos) rows with the bucket key —
    * shared by the writer and the append so assignment cannot
    * drift. */
  private def positionRows(docs: DataFrame, nBuckets: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        t.toLowerCase.split("\\s+").iterator.filter(_.nonEmpty).zipWithIndex
          .map { case (tok, p) => (tok, id, p.toLong) } }
      .toDF("token", "doc_id", "pos")
      .withColumn("tb", pmod(xxhash64(col("token")), lit(nBuckets)).cast("int"))
      .repartition(col("tb"))
      .sortWithinPartitions(col("tb"), col("token"), col("doc_id"), col("pos"))
  }

  def writePositionalIndex(docs: DataFrame, dir: String,
                           nBuckets: Int = 1024,
                           rowGroupBytes: Long = 8L << 20): Unit = {
    val s = docs.sparkSession
    import s.implicits._
    positionRows(docs, nBuckets)
      .write.mode("overwrite").partitionBy("tb")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(s"$dir/postings")
    Seq(nBuckets).toDF("n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Daily maintenance for the positional layout — the
    * [[appendInvertedIndexBucketed]] twin WITHOUT a stats merge
    * (positions carry no corpus statistics, so append is pure): the
    * batch's postings append inside the existing bucket directories,
    * assignment replayed from the stored `n_buckets`. Docs must be
    * NEW (the append-only corpus contract). Spec'd: append-then-serve
    * ≡ one-shot index of the union. */
  def appendPositionalIndex(batch: DataFrame, dir: String): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    val nBuckets = s.read.parquet(s"$dir/meta").as[Int].head()
    positionRows(batch, nBuckets)
      .write.mode("append").partitionBy("tb")
      .parquet(s"$dir/postings")
  }

  /** Compaction for the positional layout: small files fold, the
    * within-file token sort (row-group skipping) is re-established,
    * and the tombstone log FOLDS into the postings — after the swap,
    * serves answer identically without paying the subtract join, and
    * a retestable delete can never resurrect (the
    * [[compactInvertedIndexBucketed]] discipline, minus the df/stats
    * recompute this layout does not carry). */
  def compactPositionalIndex(s: SparkSession, dir: String,
                             targetBytes: Long = 128L << 20): Unit = {
    val tp = new org.apache.hadoop.fs.Path(docTombstonePath(dir))
    val fs = tp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val had = fs.exists(tp)
    graft.sources.Compact.compactInPlace(s, s"$dir/postings", targetBytes,
      partitionCols = Seq("tb"),
      sortCols = Seq("tb", "token", "doc_id", "pos"),
      transform = df => minusDocTombstones(s, dir, df))
    if (had) fs.delete(tp, true)
    ()
  }

  /** Serve a phrase batch against the positional layout — result-
    * identical to the inline scan (spec'd). Probed terms → probed
    * bucket directories (listed directly, `token IN` pushed into the
    * sorted scan); the phrase join is ONE broadcast join + ONE
    * aggregation, not a per-term join chain: each posting row joins
    * the tiny (query, i, term) set, every row votes for the anchor
    * position pos − i, and an anchor with all |phrase| DISTINCT i
    * votes is a match (distinctness handles repeated-token phrases,
    * where one posting row votes for several anchors). */
  def phraseServeBatch(s: SparkSession, dir: String,
                       phrases: Seq[(Long, Seq[String])]): DataFrame = {
    import s.implicits._
    def empty = Seq.empty[(Long, Long, Long, Long)]
      .toDF("query_id", "doc_id", "n_matches", "first_pos")
    val terms = phrases.flatMap(_._2).distinct.sorted
    if (terms.isEmpty) return empty
    val nBuckets = s.read.parquet(s"$dir/meta").as[Int].head()
    val buckets = terms.toDF("token")
      .select(pmod(xxhash64(col("token")), lit(nBuckets)).cast("int"))
      .as[Int].collect().distinct.sorted
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val bucketDirs = buckets.map(b => s"$dir/postings/tb=$b")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (bucketDirs.isEmpty) return empty
    val post = minusDocTombstones(s, dir,
      s.read.option("basePath", s"$dir/postings").parquet(bucketDirs: _*)
        .filter(col("token").isin(terms: _*)))
    val qterms = phrases.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, i) => (qid, i, t, ts.length) } }
      .toDF("query_id", "i", "token", "plen")
    post.join(broadcast(qterms), "token")
      .select(col("query_id"), col("doc_id"),
        (col("pos") - col("i")).as("anchor"), col("i"), col("plen"))
      .filter(col("anchor") >= 0)
      .groupBy(col("query_id"), col("doc_id"), col("anchor"), col("plen"))
      .agg(countDistinct(col("i")).as("hits"))
      .filter(col("hits") === col("plen"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("anchor")).as("first_pos"))
      .orderBy(col("query_id"), col("doc_id"))
  }
}
