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

  private def dataFiles(s: SparkSession, dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(st => st.isFile &&
      st.getPath.getName.endsWith(".parquet"))
  }

  /** Rewrite `dir` into `out` with ~`targetBytes` per output file.
    * Returns (input files, input bytes, output files, rows). */
  def compact(s: SparkSession, dir: String, out: String,
              targetBytes: Long = 128L << 20): CompactReport = {
    val in = dataFiles(s, dir)
    val bytesIn = in.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytesIn.toDouble / targetBytes).toInt)
    val df = s.read.parquet(dir)
    df.repartition(nOut).write.mode("overwrite").parquet(out)
    CompactReport(in.length, bytesIn, dataFiles(s, out).length, df.count())
  }
}
