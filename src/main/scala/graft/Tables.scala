package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Typed access to the driver-generated parquet tables (TESTDATA.md).
  *
  * Loaders are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom; no caching here — each query builds a
  * fresh plan and the optimizer dedups shared scans where it can.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** `events.ts` has shipped in two physical parquet forms; both are
    * normalized here to a plain TimestampType (micros, session-zone)
    * column so every downstream operator sees one type:
    *
    *  - TIMESTAMP(NANOS): Spark's TimestampType cannot hold nanos, so
    *    read via the nanos-as-long escape hatch and truncate to micros —
    *    identical to DuckDB's ns→µs cast for post-epoch data.
    *  - timestamp[us] without timezone (pyarrow default): Spark reads
    *    TIMESTAMP_NTZ, which admits no numeric casts. The session runs
    *    UTC, so `cast("timestamp")` reinterprets the naive value as the
    *    same instant DuckDB's `epoch()` computes on it.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }
}
