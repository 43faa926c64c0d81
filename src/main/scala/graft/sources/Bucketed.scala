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
