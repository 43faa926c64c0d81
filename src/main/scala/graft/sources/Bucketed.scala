package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables by their join key
  * at write time so repeated joins/aggregations on that key run with
  * NO exchange — the single biggest shuffle saver for a fact table
  * that is joined on the same key by every query (at 100 TB, one
  * avoided shuffle is the whole game).
  */
object Bucketed {

  /** Write `df` as a bucketed managed table (sorted within buckets,
    * so sort-merge joins also skip the sort). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write a timeseries-shaped frame range-partitioned AND sorted by
    * (key, ts) — the Spark analog of the reference's composite
    * (app_id, timestamp) index (main.py:91-105), at the storage layer:
    * range partitioning clusters each key into few files, the
    * within-partition sort makes every parquet row group's (key, ts)
    * min/max statistics TIGHT, and a (key, time-range) probe with
    * pushed filters then skips whole row groups and pages at the
    * reader (parquet stats + column-index skipping) instead of
    * decoding the full table and filtering after. Proven in
    * ScaleTechniquesSpec by comparing the scan's numOutputRows against
    * the same data written unsorted: the sorted layout's scan emits a
    * small fraction of the rows for identical results. At 100 TB this
    * is the keyed-timeseries complement to [[writeDayPartitioned]]:
    * day directories prune the TIME axis at the partition level, the
    * range-sorted files prune the KEY axis inside each file.
    *
    * `rowGroupBytes` sizes parquet row groups (the skipping granule) —
    * the default 128 MB suits production; specs shrink it to get many
    * granules from small test data. */
  def writeRangeSorted(df: DataFrame, path: String, keyCol: String,
                       tsCol: String, numFiles: Int = 8,
                       rowGroupBytes: Long = 128L << 20): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numFiles, col(keyCol), col(tsCol))
      .sortWithinPartitions(keyCol, tsCol)
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }

  /** Write a timeseries-shaped frame partitioned by day — the layout
    * that turns time-range queries into partition pruning (the scan
    * reads only matching day directories; `PartitionFilters` in the
    * plan, verified in ScaleTechniquesSpec). At 100 TB this is the
    * difference between scanning a day and scanning a decade. */
  def writeDayPartitioned(df: DataFrame, path: String, tsCol: String): Unit = {
    import org.apache.spark.sql.functions._
    df.withColumn("day", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("day")
      .parquet(path)
  }
}
