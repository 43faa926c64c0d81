package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generic SCD-1 merge — the engine-side equivalent of the
  * reference's `pg_insert ... on_conflict_do_update`
  * (ref main.py:451-457): apply a batch of updates to a snapshot,
  * last write per key wins.
  *
  * Scale: one shuffle on the key (the window partition). With the
  * snapshot bucketed/partitioned by key on disk, Catalyst elides the
  * exchange on the snapshot side entirely.
  */
object Upsert {

  /** Last-write-wins merge of `updates` into `current`.
    *
    * @param keys       identity columns
    * @param versionCol ordering column (e.g. an updated_at timestamp);
    *                   highest version per key is kept, updates win
    *                   ties against current rows.
    */
  def upsert(current: DataFrame, updates: DataFrame,
             keys: Seq[String], versionCol: String): DataFrame = {
    val tagged = current.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }
}
