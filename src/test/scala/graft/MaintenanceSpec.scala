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
