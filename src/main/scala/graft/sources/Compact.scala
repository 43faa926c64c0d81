package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

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
}
