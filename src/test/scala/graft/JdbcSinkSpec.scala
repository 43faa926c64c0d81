package graft

import graft.sources.JdbcUpsert
import java.sql.DriverManager
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Last-write-wins THROUGH the JDBC sink path, proven on embedded
  * Derby (the container has no server database; Derby exercises the
  * same JDBC merge shell that would target Postgres —
  * ref main.py:451-457). */
class JdbcSinkSpec extends SparkSpec {

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft-derby").toString + "/db"
  private lazy val url = s"jdbc:derby:$dbDir;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().execute(sql); () } finally c.close()
  }

  private def readTable(table: String) =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("batched JDBC upsert is last-write-wins per key") {
    exec("""CREATE TABLE games_metadata (
      app_id BIGINT PRIMARY KEY, name VARCHAR(100),
      price DOUBLE, updated_at TIMESTAMP)""")
    import spark.implicits._
    val b1 = Seq(
      (1L, "Half-Life", 9.99, ts("2024-01-01 00:00:00")),
      (2L, "Portal", 19.99, ts("2024-01-01 00:00:00")))
      .toDF("app_id", "name", "price", "updated_at")
    JdbcUpsert.upsertBatch(b1, url, "games_metadata", Seq("app_id"), "updated_at")
    // batch 2: app 1 twice (later version must win the in-batch dedupe),
    // app 3 fresh
    val b2 = Seq(
      (1L, "Half-Life", 4.99, ts("2024-01-02 00:00:00")),
      (1L, "Half-Life", 7.49, ts("2024-01-01 12:00:00")),
      (3L, "Half-Life 3", 59.99, ts("2024-01-02 00:00:00")))
      .toDF("app_id", "name", "price", "updated_at")
    JdbcUpsert.upsertBatch(b2, url, "games_metadata", Seq("app_id"), "updated_at")
    val got = readTable("games_metadata").collect()
      .map(r => r.getAs[Long]("APP_ID") -> r.getAs[Double]("PRICE")).toMap
    assert(got == Map(1L -> 4.99, 2L -> 19.99, 3L -> 59.99))
    // idempotence: replaying batch 2 (at-least-once delivery) converges
    JdbcUpsert.upsertBatch(b2, url, "games_metadata", Seq("app_id"), "updated_at")
    val again = readTable("games_metadata").collect()
      .map(r => r.getAs[Long]("APP_ID") -> r.getAs[Double]("PRICE")).toMap
    assert(again == got)
    // cross-batch last-write-wins: replaying the OLDER batch 1 must
    // not regress rows the newer batch already wrote (version guard)
    JdbcUpsert.upsertBatch(b1, url, "games_metadata", Seq("app_id"), "updated_at")
    val afterOldReplay = readTable("games_metadata").collect()
      .map(r => r.getAs[Long]("APP_ID") -> r.getAs[Double]("PRICE")).toMap
    assert(afterOldReplay == got, "older replayed batch regressed newer rows")
  }

  test("equal-version duplicates in one batch resolve deterministically") {
    exec("""CREATE TABLE eqv_state (
      app_id BIGINT PRIMARY KEY, payload VARCHAR(100), v BIGINT)""")
    import spark.implicits._
    // same key, same version, different payloads — the in-batch dedup
    // orders by (v DESC, payload DESC), so "zz" must win on every run
    // and replay, independent of shuffle arrival order
    val dup = Seq((1L, "aa", 5L), (1L, "zz", 5L), (1L, "mm", 5L))
    for (i <- 1 to 3) {
      val batch = scala.util.Random.shuffle(dup).toDF("app_id", "payload", "v")
        .repartition(if (i % 2 == 0) 3 else 7)
      JdbcUpsert.upsertBatch(batch, url, "eqv_state", Seq("app_id"), "v")
      val got = readTable("eqv_state").collect()
        .map(r => r.getAs[Long]("APP_ID") -> r.getAs[String]("PAYLOAD")).toMap
      assert(got == Map(1L -> "zz"), s"run $i picked ${got(1L)}")
    }
  }

  test("JDBC source round-trips the parquet table and pushes filters down") {
    import graft.sources.JdbcSource
    import org.apache.spark.sql.functions.col
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    cust.write.jdbc(url, "customer_src", new java.util.Properties())
    // round-trip equality with the parquet loader — the partitioned
    // read (8 range cursors over c_custkey, bounds probed from the
    // table) returns exactly the parquet rows
    val back = JdbcSource.readPartitioned(spark, url, "customer_src",
      "c_custkey", numPartitions = 8)
    assert(back.rdd.getNumPartitions == 8, "not a partitioned scan")
    assert(back.count() == cust.count())
    assert(back.exceptAll(cust).isEmpty && cust.exceptAll(back).isEmpty,
      "JDBC round-trip lost or altered rows")
    // predicate pushdown: the filter must reach the JDBCRelation scan
    // (shipped as SQL), not run Spark-side over a full-table fetch
    val filtered = JdbcSource.read(spark, url, "customer_src")
      .filter(col("c_nationkey") === 5)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("c_nationkey"),
      s"filter not pushed to the JDBC scan:\n${plan.take(600)}")
    assert(filtered.count() ==
      cust.filter(col("c_nationkey") === 5).count())
    // column pruning: a two-column projection ships two columns
    val pruned = JdbcSource.readPartitioned(spark, url, "customer_src",
      "c_custkey").select("c_custkey", "c_acctbal")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("ReadSchema: struct<c_custkey:bigint,c_acctbal:double>") ||
      pruned.schema.fieldNames.toSeq == Seq("c_custkey", "c_acctbal"))
    assert(pruned.count() == cust.count())
  }

  test("partitioned read probes a case-sensitive (quoted) table name") {
    import graft.sources.JdbcSource
    // a table whose stored name is case-sensitive: reachable only via
    // a quoted identifier (unquoted, Derby folds Games_Meta →
    // GAMES_META and misses). The probe must not mangle the quoted
    // name the caller hands to Spark's own dbtable option.
    exec("""CREATE TABLE "Games_Meta" ("app_id" BIGINT, "score" BIGINT)""")
    exec("""INSERT INTO "Games_Meta" VALUES (3, 30), (7, 70), (11, 110)""")
    val back = JdbcSource.readPartitioned(spark, url, "\"Games_Meta\"",
      "app_id", numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4, "not a partitioned scan")
    assert(back.count() == 3)
    // bare-name probes against writer-created (case-folded) tables
    // keep working — the fallback path of the same probe
    val bare = JdbcSource.readPartitioned(spark, url, "customer_src",
      "c_custkey", numPartitions = 3)
    assert(bare.count() == Tables.customer(spark, sf).count())
  }

  test("streaming foreachBatch upsert maintains the JDBC table") {
    exec("""CREATE TABLE app_state (
      app_id BIGINT PRIMARY KEY, payload VARCHAR(100), v BIGINT)""")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val q = JdbcUpsert.streamSink(
      input.toDS().toDF("app_id", "payload", "v"),
      url, "app_state", Seq("app_id"), "v")
    try {
      input.addData((1L, "a1", 1L), (2L, "b1", 1L))
      q.processAllAvailable()
      input.addData((2L, "b2", 2L), (3L, "c1", 2L))
      q.processAllAvailable()
    } finally q.stop()
    val got = readTable("app_state").collect()
      .map(r => r.getAs[Long]("APP_ID") -> r.getAs[String]("PAYLOAD")).toMap
    assert(got == Map(1L -> "a1", 2L -> "b2", 3L -> "c1"))
  }
}
