package graft

import graft.operators.Profile
import graft.sources.Bucketed
import org.apache.spark.sql.functions._

/** Table-maintenance components: dynamic-partition backfill and the
  * approximate (HLL) profile. */
class MaintenanceSpec extends SparkSpec {

  test("backfillDays rewrites only the touched day, byte-identical elsewhere") {
    val dir = java.nio.file.Files.createTempDirectory("backfill").toString + "/t"
    val ev = Tables.events(spark, sf)
    Bucketed.writeDayPartitioned(ev, dir, "ts")
    val days = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("day=")).map(_.getName).sorted
    assert(days.length > 1, "need multiple day partitions")
    val target = days.head.stripPrefix("day=")
    def fingerprint(): Map[String, Seq[(String, Long)]] =
      new java.io.File(dir).listFiles.filter(_.getName.startsWith("day="))
        .map { d =>
          d.getName -> d.listFiles.filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.lastModified)).toSeq.sortBy(_._1)
        }.toMap
    val before = fingerprint()
    // backfill the first day with a REPROCESSED frame (values doubled)
    val repro = ev.filter(to_date(col("ts")) === lit(target))
      .withColumn("value", col("value") * 2)
    assert(repro.count() > 0)
    Thread.sleep(1100) // ensure mtime would move if a file were rewritten
    Bucketed.backfillDays(repro, dir, "ts")
    val after = fingerprint()
    // untouched days: same files, same mtimes (not rewritten at all)
    days.filterNot(_ == s"day=$target").foreach { d =>
      assert(after(d) == before(d), s"$d was rewritten by the backfill")
    }
    // the touched day now holds exactly the reprocessed rows
    val got = spark.read.parquet(dir).filter(col("day") === lit(target))
    assert(got.count() == repro.count())
    assert(got.agg(sum(col("value"))).head().getDouble(0) ==
      repro.agg(sum(col("value"))).head().getDouble(0))
    // idempotent: re-running the same backfill converges
    Bucketed.backfillDays(repro, dir, "ts")
    assert(spark.read.parquet(dir).filter(col("day") === lit(target))
      .count() == repro.count())
    // dynamic mode did not leak into the session conf
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .forall(_ != "dynamic"))
  }

  test("incremental CC: daily steps over an edge stream equal one-shot CC") {
    import spark.implicits._
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createTempDirectory("ccidx").toString + "/map"
    val initial = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (100L, 101L)).toDF("d1", "d2")
    // day 1 merges two existing clusters and opens a new one; day 2
    // chains the day-1 cluster into the merged one AND into another
    // existing cluster, plus an isolated pair — merge/relabel paths
    // all exercised
    val day1 = Seq((3L, 10L), (30L, 31L)).toDF("d1", "d2")
    val day2 = Seq((31L, 20L), (11L, 30L), (40L, 41L)).toDF("d1", "d2")
    Dedup.writeClusterIndex(initial, dir)
    Dedup.ccIncrementalStep(spark, dir, day1)
    Dedup.ccIncrementalStep(spark, dir, day2)
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShot = toMap(Dedup.connectedComponentsSafe(
      initial.unionByName(day1).unionByName(day2)))
    assert(toMap(Dedup.readClusterIndex(spark, dir)) == oneShot)
    // spot-check the interesting rows: 20/21/30/31 all relabeled into
    // the component rooted at 1; the untouched cluster kept its label
    assert(oneShot(21L) == 1L && oneShot(31L) == 1L && oneShot(20L) == 1L)
    assert(oneShot(100L) == 100L && oneShot(41L) == 40L)
  }

  test("incremental CC rewrites only touched clusters' buckets") {
    import spark.implicits._
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createTempDirectory("ccidx2").toString + "/map"
    Dedup.writeClusterIndex(
      Seq((1L, 2L), (10L, 11L)).toDF("d1", "d2"), dir)
    def bucketMtimes(): Map[String, Seq[(String, Long)]] =
      new java.io.File(dir).listFiles.filter(_.getName.startsWith("_cb="))
        .map { b =>
          b.getName -> b.listFiles.filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.lastModified)).toSeq.sortBy(_._1)
        }.toMap
    val before = bucketMtimes()
    Thread.sleep(1100)
    // an edge touching only cluster 10: the step's output is the
    // rewritten slice, and cluster 1's bucket files must not move
    val out = Dedup.ccIncrementalStep(spark, dir,
      Seq((11L, 12L)).toDF("d1", "d2"))
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L))
    assert(toIndexMap(spark, dir) ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
    val after = bucketMtimes()
    // cluster 1 and cluster 10 hash to distinct buckets here (spark
    // xxhash64 of 1L vs 10L mod 256) — assert that's still true, then
    // assert only cluster 10's bucket moved
    assert(before.size >= 2, "clusters collided into one bucket")
    assert(after.count { case (k, v) => before.get(k).contains(v) } ==
      before.size - 1, s"more than one bucket rewritten: $before -> $after")
  }

  private def toIndexMap(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.operators.Dedup.readClusterIndex(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental CC: an all-new day opens clusters without touching any") {
    import spark.implicits._
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createTempDirectory("ccidx3").toString + "/map"
    Dedup.writeClusterIndex(Seq((1L, 2L)).toDF("d1", "d2"), dir)
    // no endpoint exists in the map: touched set is empty, the CC
    // runs over the day's edges alone
    Dedup.ccIncrementalStep(spark, dir, Seq((50L, 51L), (51L, 52L))
      .toDF("d1", "d2"))
    assert(toIndexMap(spark, dir) ==
      Map(1L -> 1L, 2L -> 1L, 50L -> 50L, 51L -> 50L, 52L -> 50L))
  }

  test("incremental CC: a new cluster landing in an untouched bucket preserves it") {
    import spark.implicits._
    import graft.operators.Dedup
    // buckets=1 forces EVERY cluster into one directory, so an
    // all-new day (touched set EMPTY) writes into the bucket holding
    // the whole standing map — dynamic partition overwrite replaces
    // that directory wholesale, and without the carry union the
    // untouched clusters' rows were silently deleted (the r10 ADVICE
    // finding; 1024 buckets only hid the collision)
    val dir = java.nio.file.Files.createTempDirectory("ccidx5").toString + "/map"
    Dedup.writeClusterIndex(
      Seq((1L, 2L), (10L, 11L)).toDF("d1", "d2"), dir, buckets = 1)
    Dedup.ccIncrementalStep(spark, dir,
      Seq((50L, 51L)).toDF("d1", "d2"), buckets = 1)
    assert(toIndexMap(spark, dir) ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 50L -> 50L, 51L -> 50L))
    // a merge whose component min is the NEW node (5 joins cluster 10):
    // the relabeled cluster_id is a day node, exercising the other
    // trigger of the same overwrite path
    Dedup.ccIncrementalStep(spark, dir,
      Seq((5L, 10L)).toDF("d1", "d2"), buckets = 1)
    assert(toIndexMap(spark, dir) ==
      Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 10L -> 5L, 11L -> 5L,
        50L -> 50L, 51L -> 50L))
    // equivalence with one-shot CC over the full edge stream holds too
    val oneShot = Dedup.connectedComponentsSafe(
      Seq((1L, 2L), (10L, 11L), (50L, 51L), (5L, 10L)).toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(toIndexMap(spark, dir) == oneShot)
  }

  test("incremental CC: replaying a day's pairs is idempotent") {
    import spark.implicits._
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createTempDirectory("ccidx4").toString + "/map"
    Dedup.writeClusterIndex(
      Seq((1L, 2L), (10L, 11L)).toDF("d1", "d2"), dir)
    val day = Seq((2L, 10L), (60L, 61L)).toDF("d1", "d2")
    Dedup.ccIncrementalStep(spark, dir, day)
    val once = toIndexMap(spark, dir)
    // at-least-once replay: the merged cluster absorbs the same edges
    // with no change (its star edges already encode the connectivity)
    Dedup.ccIncrementalStep(spark, dir, day)
    assert(toIndexMap(spark, dir) == once)
    assert(once(11L) == 1L && once(61L) == 60L)
  }

  test("approximate profile tracks the exact distinct counts within 5%") {
    val d = "/root/testdata/sf0.01"
    val rows = Profile.profileColumnsApprox(spark, d).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_distinct")
      val est = r.getAs[Double]("n_distinct_est")
      // 5% relative with a ±2 absolute floor: at tiny cardinality
      // (l_discount has 11 distinct values) one register collision
      // is ±1 absolute — a 9% relative blip that means nothing
      val err = math.abs(est - exact)
      assert(err <= math.max(0.05 * exact, 2.0),
        s"${r.getAs[String]("column_name")}: est $est vs exact $exact ($err)")
    }
  }
}
