package graft

import graft.sources.Ingest

class IngestSpec extends SparkSpec {

  test("appdetails JSON flattens to the reference metadata shape") {
    import spark.implicits._
    val json = """{"name":"  Half-Life™ 3 ","type":"game",
      "release_date":{"date":"2028-01-01"},
      "developers":["Valve","Acme"],"publishers":["Valve"],
      "genres":[{"description":"Action"},{"description":"FPS"}],
      "price_overview":{"initial":5999,"currency":"USD","discount_percent":15}}"""
    val df = Seq(("10", json)).toDF("app_id", "raw")
    val row = Ingest.parseAppDetails(df, "app_id", "raw").collect().head
    assert(row.getAs[String]("name") == "Half-Life 3")
    assert(row.getAs[String]("developer") == "Valve, Acme")
    assert(row.getAs[String]("genres") == "Action, FPS")
    assert(row.getAs[Double]("price_numeric") == 59.99)
    assert(row.getAs[Int]("discount_percent") == 15)
  }

  test("id extraction pulls distinct ids out of markup") {
    import spark.implicits._
    val html = """<a data-ds-appid="10">x</a><a data-ds-appid="20">y</a>
                  <a data-ds-appid="10">dup</a>"""
    val df = Seq(html).toDF("page")
    val ids = Ingest.extractIds(df, "page", "data-ds-appid=\"(\\\\d+)\"")
      .collect().map(_.getString(0)).toSet
    assert(ids == Set("10", "20"))
  }

  test("quarantining read: bad rows land in quarantine, valid rows parse, nothing vanishes") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("price", LongType)))
    val rows = Seq(
      ("1", """{"name":"ok","price":10}"""),          // valid
      ("2", """{"name":"broken","price":"""),          // malformed JSON
      ("3", """{"price":5}"""),                        // parses, name null
      ("4", """not json at all"""),                    // malformed
      ("5", """{"name":"fine","price":7}"""))          // valid
    val qdir = java.nio.file.Files.createTempDirectory("quarantine").toString + "/q"
    val (valid, rep) = Ingest.readJsonQuarantine(
      rows.toDF("id", "raw"), "id", "raw", schema, qdir,
      required = Seq("name"))
    assert(rep == Ingest.QuarantineReport(2, 3))
    val v = valid.collect().map(r =>
      (r.getAs[String]("id"), r.getAs[String]("name"), r.getAs[Long]("price")))
      .toSet
    assert(v == Set(("1", "ok", 10L), ("5", "fine", 7L)))
    // the quarantine holds the ORIGINAL raw text keyed by id (replayable)
    val q = spark.read.parquet(qdir).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("raw")).toMap
    assert(q.keySet == Set("2", "3", "4"))
    assert(q("3") == """{"price":5}""")
    // appends accumulate (a later batch quarantines into the same dir)
    val (_, rep2) = Ingest.readJsonQuarantine(
      Seq(("6", "junk")).toDF("id", "raw"), "id", "raw", schema, qdir,
      required = Seq("name"))
    assert(rep2 == Ingest.QuarantineReport(0, 1))
    assert(spark.read.parquet(qdir).count() == 4)
  }
}
