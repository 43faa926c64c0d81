package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance op every long-lived
  * 100 TB lake needs: streaming sinks and fine-grained partitions
  * accrete kilobyte parquet files whose per-file open/footer cost
  * dominates scans. Compaction reads the directory once and rewrites
  * it as ceil(totalBytes / targetBytes) files via a round-robin
  * repartition (size-balanced without a shuffle key; no sort order
  * is claimed or destroyed — callers who bucket/sort use the
  * Bucketed writer instead). Sizing from the ACTUAL byte total, not
  * file counts, so a directory of mixed sizes still lands on the
  * target. All paths go through the Hadoop FileSystem API — any
  * scheme, not just local disk.
  */
object Compact {

  case class CompactReport(filesIn: Int, bytesIn: Long, filesOut: Int,
                           rows: Long)

  /** All parquet data files under `dir`, RECURSIVELY — a partitioned
    * layout keeps its files in subdirectories, and a non-recursive
    * listing would report 0 input bytes and size the rewrite to one
    * file. */
  private def dataFiles(s: SparkSession, dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, /* recursive = */ true)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.LocatedFileStatus]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) buf += st
    }
    buf.toArray
  }

  /** Rewrite `dir` into `out` with ~`targetBytes` per output file.
    * Returns (input files, input bytes, output files, rows). Note the
    * output is a FLAT directory: a partitioned input's partition
    * columns become ordinary data columns (values preserved) — callers
    * keeping a partitioned layout compact per partition directory.
    * `out` must differ from `dir`: overwrite-writing the input before
    * the job reads it would destroy the data mid-flight. */
  def compact(s: SparkSession, dir: String, out: String,
              targetBytes: Long = 128L << 20): CompactReport = {
    val conf = s.sparkContext.hadoopConfiguration
    val inPath = new Path(dir).getFileSystem(conf).makeQualified(new Path(dir))
    val outPath = new Path(out).getFileSystem(conf).makeQualified(new Path(out))
    require(inPath != outPath,
      s"compact output must differ from the input directory ($inPath)")
    val in = dataFiles(s, dir)
    val bytesIn = in.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytesIn.toDouble / targetBytes).toInt)
    s.read.parquet(dir).repartition(nOut).write.mode("overwrite").parquet(out)
    // row count read back from the WRITTEN output (one cheap
    // footer-count scan) — never a second pass over the input
    CompactReport(in.length, bytesIn, dataFiles(s, out).length,
      s.read.parquet(out).count())
  }

  /** In-place compaction for a MAINTAINED INDEX directory — the
    * periodic pass that re-collapses an append-only artifact (band /
    * span / emb-code / phash indexes, IVF corpus partitions, inverted-
    * index postings) after N daily appends have accreted N small
    * files per directory. Where [[compact]] writes to a caller-chosen
    * new path, this keeps the index's PATH stable (every serve/detect
    * entry point addresses the index by its directory):
    *
    *   1. rewrite into `dir.compacting` (size-targeted; partitioned
    *      layouts keep their partition columns via `partitionCols`, so
    *      pruned probes keep pruning),
    *   2. swap: current dir renames to `dir.old`, the rewrite renames
    *      in — two metadata ops, no data copy,
    *   3. the PREVIOUS `.old` is deleted at the START of the next
    *      compaction, not at the end of this one — the one-cycle grace
    *      the compacting sink also keeps, so a reader pinned to the
    *      pre-swap listing finishes its scan.
    *
    * `transform` lets log-structured indexes fold their semantic
    * collapse into the same pass (the span index re-aggregates
    * min(keeper_id) per hash — readers already do, so the collapsed
    * index is reader-identical while dropping superseded rows).
    * Cross-compaction atomicity is a table-format concern (the
    * [[compactingSink]] caveat); this is the maintenance shape. */
  def compactInPlace(s: SparkSession, dir: String,
                     targetBytes: Long = 128L << 20,
                     partitionCols: Seq[String] = Nil,
                     transform: DataFrame => DataFrame = identity,
                     sortCols: Seq[String] = Nil)
      : CompactReport = {
    import org.apache.spark.sql.functions.col
    val fs = fsOf(s, dir)
    val old = new Path(dir + ".old")
    if (fs.exists(old)) fs.delete(old, true) // last cycle's grace copy
    val in = dataFiles(s, dir)
    val bytesIn = in.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytesIn.toDouble / targetBytes).toInt)
    val tmp = new Path(dir + ".compacting")
    if (fs.exists(tmp)) fs.delete(tmp, true) // torn previous attempt
    val df = transform(s.read.parquet(dir))
    val clustered =
      if (partitionCols.isEmpty) df.repartition(nOut)
      // hash-cluster by the partition keys so each output partition
      // directory lands ~one file instead of one per task
      else df.repartition(nOut, partitionCols.map(col): _*)
    // layouts that rely on row-group statistics (token-sorted bucketed
    // postings) re-establish their within-file order AFTER the cluster
    val ordered =
      if (sortCols.isEmpty) clustered
      else clustered.sortWithinPartitions(sortCols.map(col): _*)
    if (partitionCols.isEmpty)
      ordered.write.mode("overwrite").parquet(tmp.toString)
    else
      ordered.write.mode("overwrite").partitionBy(partitionCols: _*)
        .parquet(tmp.toString)
    require(fs.exists(new Path(tmp, "_SUCCESS")),
      s"compaction rewrite of $dir did not commit")
    val cur = new Path(dir)
    require(fs.rename(cur, old), s"could not stage $dir aside")
    require(fs.rename(tmp, cur), s"could not swap compacted $dir in")
    CompactReport(in.length, bytesIn, dataFiles(s, dir).length,
      s.read.parquet(dir).count())
  }

  // ---- compacting streaming sink (log-structured generations) -----------

  /** Streaming APPEND sink with built-in small-file maintenance — the
    * compaction loop run AS the sink instead of as a separate job. A
    * micro-batch sink accretes one tiny parquet directory per batch;
    * left alone, a year-lived stream is a million-file table. This
    * sink keeps a two-tier log-structured layout:
    *
    *   - `dir/live/b{batchId}` — one directory per micro-batch,
    *     written with OVERWRITE so an at-least-once foreachBatch
    *     replay rewrites the same directory instead of duplicating,
    *   - `dir/g{N}` — compacted generations; the NAME records the
    *     highest batch id folded in, so recovery needs no manifest:
    *     the newest generation plus live batches with id > N is
    *     always exactly-once data, and stale live directories (from a
    *     crash between compaction and cleanup, or a replay) are
    *     IGNORED by id, never double-counted.
    *
    * Every `compactEvery` batches the current view rewrites into the
    * next generation (size-targeted like [[compact]]). Only
    * directories carrying Spark's `_SUCCESS` marker count as
    * committed — a torn write from a mid-job crash stays invisible
    * instead of masquerading as the current generation — and cleanup
    * runs with a ONE-COMPACTION GRACE: the directories a compaction
    * folds are deleted by the NEXT compaction, not immediately, so a
    * reader holding the pre-compaction listing can finish. A failure
    * anywhere in cleanup affects garbage, not correctness. Readers go
    * through [[readCompacting]]. (Full snapshot isolation across
    * concurrent readers/writers is a table-format concern —
    * Delta/Iceberg; this component is the maintenance SHAPE with
    * crash-safe accounting.) */
  def compactingSink(rows: DataFrame, dir: String, compactEvery: Int = 10,
                     targetBytes: Long = 128L << 20)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // an empty micro-batch would write a schema-less directory
        // that poisons every later read — skip the write, still run
        // the compaction cadence
        if (!batch.isEmpty)
          batch.write.mode("overwrite").parquet(s"$dir/live/b$batchId")
        if ((batchId + 1) % compactEvery == 0)
          compactGenerations(s, dir, batchId, targetBytes)
        ()
      }
      .start()

  private def fsOf(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def numberedDirs(s: SparkSession, dir: String,
                           prefix: String): Seq[(Long, String)] = {
    val fs = fsOf(s, dir); val p = new Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.matches(prefix + "\\d+") &&
        // only COMMITTED directories count: a write that crashed
        // mid-job leaves no _SUCCESS marker, and a torn generation
        // that became 'current' by name alone would silently hide the
        // live batches it failed to fold (and the next compaction
        // would bake the loss in). A torn dir stays invisible until
        // its batch replays and overwrites it.
        fs.exists(new Path(st.getPath, "_SUCCESS")))
      .map(st => (st.getPath.getName.drop(prefix.length).toLong,
        st.getPath.toString))
      .sortBy(_._1)
  }

  private[graft] def currentGen(s: SparkSession, dir: String): Option[(Long, String)] =
    numberedDirs(s, dir, "g").lastOption

  /** The sink's current contents: newest generation + live batches
    * NEWER than it (older live dirs are already folded in — ignored
    * by id, so replayed or crash-orphaned directories cannot
    * double-count). */
  def readCompacting(s: SparkSession, dir: String): DataFrame = {
    val gen = currentGen(s, dir)
    val upTo = gen.map(_._1).getOrElse(-1L)
    val parts = gen.map(_._2).toSeq ++
      numberedDirs(s, s"$dir/live", "b").filter(_._1 > upTo).map(_._2)
    require(parts.nonEmpty, s"no data under $dir")
    parts.map(s.read.parquet(_)).reduce(_ unionByName _)
  }

  /** Committed generation ids retained under `dir`, oldest first —
    * the time-travel catalog. The one-compaction grace means the
    * newest TWO generations (plus live batches newer than the older
    * one) are always on disk, so one full compaction cycle of history
    * is queryable at any time without a manifest. */
  def listGenerations(s: SparkSession, dir: String): Seq[Long] =
    numberedDirs(s, dir, "g").map(_._1)

  /** Time-travel read: the sink's contents AS OF `batchId` — the
    * newest committed generation at or before it plus the live batch
    * directories in between. Sound exactly for the retained window
    * (batchId ≥ oldest retained generation): beyond it, folded live
    * directories are already garbage-collected and a silent partial
    * read would masquerade as history, so this REFUSES instead
    * (fail-loud, the [[readCompacting]] contract). Deeper history is
    * a table-format/retention decision, not a maintenance-sink one. */
  def readAsOf(s: SparkSession, dir: String, batchId: Long): DataFrame = {
    val gens = numberedDirs(s, dir, "g")
    require(gens.isEmpty || batchId >= gens.head._1,
      s"batch $batchId predates the retained window (oldest generation " +
        s"${gens.head._1}) — its folded live directories are collected")
    val gen = gens.filter(_._1 <= batchId).lastOption
    val upTo = gen.map(_._1).getOrElse(-1L)
    val parts = gen.map(_._2).toSeq ++
      numberedDirs(s, s"$dir/live", "b")
        .filter(t => t._1 > upTo && t._1 <= batchId).map(_._2)
    require(parts.nonEmpty, s"no data as of batch $batchId under $dir")
    parts.map(s.read.parquet(_)).reduce(_ unionByName _)
  }

  private[graft] def compactGenerations(s: SparkSession, dir: String,
                                        batchId: Long, targetBytes: Long): Unit = {
    val gen = currentGen(s, dir)
    // at-least-once replay guard: if a generation at or past this
    // batch is already committed, this compaction already ran —
    // proceeding would read g{batchId} while overwrite-writing the
    // same path, which Spark rejects on every retry (a wedged stream)
    if (gen.exists(_._1 >= batchId)) return
    val upTo = gen.map(_._1).getOrElse(-1L)
    val lives = numberedDirs(s, s"$dir/live", "b").filter(_._1 > upTo)
    val inputs = gen.map(_._2).toSeq ++ lives.map(_._2)
    if (inputs.isEmpty) return
    val bytesIn = inputs.flatMap(d => dataFiles(s, d)).map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytesIn.toDouble / targetBytes).toInt)
    inputs.map(s.read.parquet(_)).reduce(_ unionByName _)
      .repartition(nOut)
      .write.mode("overwrite").parquet(s"$dir/g$batchId")
    // cleanup is pure garbage collection with a ONE-COMPACTION GRACE:
    // the directories folded into g{batchId} (the prior generation
    // and its live batches) survive until the NEXT compaction, so a
    // reader that listed the pre-compaction view can finish its scan.
    // Readers never double-count them — readCompacting filters by id
    // against the newest generation. What IS deleted here is one full
    // cycle old: superseded before this compaction even started.
    val fs = fsOf(s, dir)
    numberedDirs(s, dir, "g").filter(_._1 < upTo)
      .foreach { case (_, p) => fs.delete(new Path(p), true) }
    numberedDirs(s, s"$dir/live", "b").filter(_._1 <= upTo)
      .foreach { case (_, p) => fs.delete(new Path(p), true) }
  }
}
