package graft.sources

import java.sql.{DriverManager, PreparedStatement, Types}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** JDBC upsert sink — engine-side parity with the reference's actual
  * database sink (`pg_insert ... on_conflict_do_update` of
  * games_metadata + `bulk_insert_mappings` of timeseries rows,
  * ref main.py:451-457, 474-477).
  *
  * Scale shape: the batch is first reduced to one row per key
  * (last-write-wins by the version column — one shuffle), then each
  * PARTITION opens its own connection and merges with batched
  * UPDATE-else-INSERT statements. The driver never collects rows, so
  * sink throughput scales with executor count, bounded only by the
  * target database.
  *
  * The merge pair is portable JDBC (UPDATE, then INSERT where the
  * update count is 0), which lets the spec prove the semantics on
  * embedded Derby with no network; against Postgres the same shell
  * would issue the reference's `INSERT ... ON CONFLICT DO UPDATE`
  * instead — only the two SQL strings change.
  *
  * Delivery: `foreachBatch` is at-least-once; the merge is idempotent
  * per (key, version), so replays converge — the same
  * effectively-once contract the reference gets from primary-key
  * upsert.
  */
object JdbcUpsert {

  private def sqlType(dt: DataType): Int = dt match {
    case LongType       => Types.BIGINT
    case IntegerType    => Types.INTEGER
    case DoubleType     => Types.DOUBLE
    case FloatType      => Types.REAL
    case BooleanType    => Types.BOOLEAN
    case TimestampType  => Types.TIMESTAMP
    case DateType       => Types.DATE
    case _: DecimalType => Types.DECIMAL
    case _              => Types.VARCHAR
  }

  private def setParam(st: PreparedStatement, pos: Int, r: Row, ci: Int,
                       sqlT: Int): Unit =
    if (r.isNullAt(ci)) st.setNull(pos, sqlT)
    else st.setObject(pos, r.get(ci), sqlT)

  /** Merge `batch` into the JDBC table, last write per key winning
    * ACROSS batches: the UPDATE is guarded by `versionCol <= ?`, so
    * replaying an old batch (or applying batches out of order) never
    * regresses a newer stored row. Safe to re-run with any batch any
    * number of times — the table converges to the per-key max-version
    * row it has ever seen.
    *
    * REQUIRES a unique/PRIMARY KEY constraint on the key columns
    * (the reference's games_metadata has one — main.py:79-105): the
    * duplicate-key error is how a newer stored row is recognized on
    * the INSERT path; without the constraint, a replayed old batch
    * would insert a second, stale row for the key. Rows with a NULL
    * versionCol are rejected loudly (the guard can't order NULL). */
  def upsertBatch(batch: DataFrame, url: String, table: String,
                  keys: Seq[String], versionCol: String,
                  jdbcBatchSize: Int = 500): Unit = {
    val schema = batch.schema
    val cols = schema.fieldNames.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    require(nonKeys.nonEmpty,
      s"upsertBatch into $table: every column is a key — nothing to " +
        "merge; use a plain INSERT-if-absent writer for presence tables")
    require(nonKeys.contains(versionCol),
      s"versionCol $versionCol must be a stored non-key column")
    val types = schema.fields.map(f => sqlType(f.dataType))
    val vIdx = cols.indexOf(versionCol)
    // in-batch dedup: version desc, then the remaining non-key columns
    // as a deterministic tie-break — two same-key same-version rows in
    // one batch resolve identically on every run/replay instead of by
    // shuffle arrival order
    val tieBreak = nonKeys.filterNot(_ == versionCol).map(c => col(c).desc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc +: tieBreak: _*)
    val deduped = batch
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    val updSql = s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} " +
      s"WHERE ${keys.map(c => s"$c = ?").mkString(" AND ")} AND $versionCol <= ?"
    val insSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val updOrder = (nonKeys ++ keys).map(cols.indexOf).toArray
    deduped.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url)
        var upd: PreparedStatement = null
        var ins: PreparedStatement = null
        try {
          conn.setAutoCommit(false)
          upd = conn.prepareStatement(updSql)
          ins = conn.prepareStatement(insSql)
          // SQLState class 23 = integrity violation (not every driver
          // subclasses SQLIntegrityConstraintViolation)
          def isDupKey(e: java.sql.SQLException): Boolean =
            e.getSQLState != null && e.getSQLState.startsWith("23")
          def bindInsert(r: Row): Unit =
            cols.indices.foreach(ci => setParam(ins, ci + 1, r, ci, types(ci)))
          rows.grouped(jdbcBatchSize).foreach { group =>
            group.foreach { r =>
              if (r.isNullAt(vIdx)) throw new IllegalArgumentException(
                s"upsertBatch into $table: NULL $versionCol — the version " +
                  "guard cannot order it; filter or default such rows upstream")
              updOrder.zipWithIndex.foreach { case (ci, pi) =>
                setParam(upd, pi + 1, r, ci, types(ci))
              }
              setParam(upd, updOrder.length + 1, r, vIdx, types(vIdx))
              upd.addBatch()
            }
            val counts = upd.executeBatch()
            // fail loudly on drivers that answer SUCCESS_NO_INFO (-2):
            // fresh rows would silently never be inserted — use the
            // DB's native upsert SQL there instead of this pair
            require(counts.forall(_ >= 0),
              s"$table: driver returned no per-statement update counts; " +
                "portable UPDATE-else-INSERT cannot run safely")
            // count == 0: key absent, OR present with a NEWER version
            // (guard skipped it). Batch-INSERT the pending rows — the
            // common bulk path is all-fresh keys, one round-trip per
            // group. A duplicate key identifies the newer-version
            // case: roll back to the savepoint (on Postgres the whole
            // transaction is aborted otherwise) and retry row-at-a-
            // time, tolerating exactly the duplicate-key error.
            val pending = group.iterator.zip(counts.iterator)
              .filter(_._2 == 0).map(_._1).toList
            if (pending.nonEmpty) {
              val spBatch = conn.setSavepoint()
              try {
                pending.foreach { r => bindInsert(r); ins.addBatch() }
                ins.executeBatch()
                ()
              } catch {
                case _: java.sql.BatchUpdateException =>
                  conn.rollback(spBatch)
                  pending.foreach { r =>
                    bindInsert(r)
                    val sp = conn.setSavepoint()
                    try { ins.executeUpdate(); () }
                    catch {
                      case e: java.sql.SQLException if isDupKey(e) =>
                        conn.rollback(sp)
                    }
                  }
              }
            }
          }
          conn.commit()
        } catch {
          case e: Throwable =>
            try conn.rollback() catch { case _: java.sql.SQLException => () }
            throw e
        } finally {
          if (upd != null) upd.close()
          if (ins != null) ins.close()
          conn.close()
        }
      }
    }
  }

  /** Streaming form: every micro-batch merges into the JDBC table —
    * the Structured Streaming analog of the reference's batch loop
    * (fetch 20 apps → upsert → sleep, main.py:432-482). */
  def streamSink(updates: DataFrame, url: String, table: String,
                 keys: Seq[String], versionCol: String): StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        upsertBatch(b.toDF(), url, table, keys, versionCol)
        ()
      }
      .start()
}
