package graft

import graft.sources.Compact
import org.apache.spark.sql.functions._

class CompactSpec extends SparkSpec {

  test("compaction collapses small files to the byte-sized target, data intact") {
    val tmp = java.nio.file.Files.createTempDirectory("compact").toString
    val ev = Tables.events(spark, sf)
    // 64 tiny files — the streaming-sink accretion shape
    ev.repartition(64).write.mode("overwrite").parquet(s"$tmp/small")
    val sizeOfOne = {
      val d = new java.io.File(s"$tmp/small")
      d.listFiles.filter(_.getName.endsWith(".parquet")).map(_.length).sum
    }
    // target ≈ a quarter of the total → ~4 output files
    val r = Compact.compact(spark, s"$tmp/small", s"$tmp/big", sizeOfOne / 4)
    assert(r.filesIn == 64)
    assert(r.filesOut <= 5 && r.filesOut >= 3, s"got ${r.filesOut} files")
    assert(r.rows == ev.count())
    // content equality, not just counts
    val a = spark.read.parquet(s"$tmp/small")
    val b = spark.read.parquet(s"$tmp/big")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("compaction of an already-compact directory is a no-op in file count") {
    val tmp = java.nio.file.Files.createTempDirectory("compact2").toString
    Tables.events(spark, sf).coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/one")
    val r = Compact.compact(spark, s"$tmp/one", s"$tmp/out", 1L << 30)
    assert(r.filesIn == 1 && r.filesOut == 1)
  }

  test("compacting a directory onto itself is rejected before any write") {
    val tmp = java.nio.file.Files.createTempDirectory("compact3").toString
    Tables.events(spark, sf).coalesce(2).write.mode("overwrite")
      .parquet(s"$tmp/d")
    intercept[IllegalArgumentException] {
      Compact.compact(spark, s"$tmp/d", s"$tmp/d")
    }
    // equivalent path spellings must also be caught — overwrite-before-
    // read would destroy the input mid-job
    intercept[IllegalArgumentException] {
      Compact.compact(spark, s"$tmp/d", s"$tmp/./d")
    }
    // input untouched
    assert(spark.read.parquet(s"$tmp/d").count() ==
      Tables.events(spark, sf).count())
  }

  test("compacting sink folds batch files into generations, data intact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("lsm").toString + "/t"
    val input = MemoryStream[(Long, String)]
    val q = Compact.compactingSink(input.toDS().toDF("id", "v"), dir,
      compactEvery = 4, targetBytes = 1L << 30)
    var fed = Set.empty[(Long, String)]
    for (b <- 0 until 10) {
      val rows = (0 until 50).map(i => (b * 100L + i, s"r$b-$i"))
      fed ++= rows
      input.addData(rows)
      q.processAllAvailable()
    }
    q.stop()
    def got() = Compact.readCompacting(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got() == fed)
    // compactions fired at batch ids 3 and 7; g7 supersedes g3, and
    // batches 0..7 collapsed to ONE file (tiny bytes, 1 GB target)
    val g = Compact.currentGen(spark, dir)
    assert(g.exists(_._1 == 7L), s"current generation: $g")
    val genFiles = new java.io.File(g.get._2.stripPrefix("file:"))
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(genFiles == 1, s"generation holds $genFiles files")
    // live/ holds only b8, b9 — folded dirs were cleaned up
    val live = new java.io.File(s"$dir/live").listFiles
      .map(_.getName).filter(_.startsWith("b")).toSet
    assert(live == Set("b8", "b9"), s"live dirs: $live")
    // a stale/replayed live dir OLDER than the generation is ignored
    // by id, never double-counted
    spark.range(5).selectExpr("id", "'junk' AS v")
      .write.mode("overwrite").parquet(s"$dir/live/b2")
    assert(got() == fed, "stale live dir leaked into the read")
  }

  test("partitioned input is sized from its recursive file listing") {
    val tmp = java.nio.file.Files.createTempDirectory("compact4").toString
    Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .repartition(8)
      .write.mode("overwrite").partitionBy("day").parquet(s"$tmp/p")
    val r = Compact.compact(spark, s"$tmp/p", s"$tmp/flat", 1L << 30)
    // files live under day=... subdirectories — a non-recursive
    // listing would report filesIn=0/bytesIn=0
    assert(r.filesIn > 0 && r.bytesIn > 0, s"sizing missed nested files: $r")
    assert(r.rows == Tables.events(spark, sf).count())
    // partition column survives as a data column in the flat rewrite
    val flat = spark.read.parquet(s"$tmp/flat")
    assert(flat.columns.contains("day"))
    assert(flat.select("day").distinct().count() ==
      spark.read.parquet(s"$tmp/p").select("day").distinct().count())
  }
}
