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
}
