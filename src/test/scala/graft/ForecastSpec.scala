package graft

import org.apache.spark.sql.functions._
import graft.operators.{Recommend, Relational, Timeseries}

/** Semantic invariants of the forecasting / recommender tier (the
  * oracle gate checks cross-engine equality; these check the math
  * MEANS what it claims).
  */
class ForecastSpec extends SparkSpec {
  import spark.implicits._

  private def daysFrom(base: String, ys: Seq[Long], et: String = "a") =
    ys.zipWithIndex.map { case (y, i) =>
      (et, java.sql.Date.valueOf(java.time.LocalDate.parse(base).plusDays(i)), y)
    }.toDF("event_type", "day", "y")

  test("holt-winters on a constant series is exact: fitted == y for every row including forecasts") {
    val got = Timeseries.holtWintersOn(daysFrom("2024-01-01", Seq.fill(21)(42L)))
      .collect()
    // rows 8..21 fitted + 7 forecasts
    assert(got.length == 14 + 7)
    got.foreach { r =>
      assert(r.getAs[Long]("fitted_e6") == 42L * 1000000L,
        s"r=${r.getAs[Long]("r")}: ${r.getAs[Long]("fitted_e6")}")
    }
  }

  test("holt-winters h=1 forecast equals the fitted value once the next observation arrives") {
    // a seasonal + trend + wobble series, deterministic
    val ys = (0 until 22).map(i => 100L + 3L * i + Seq(5L, -2L, 7L, 0L, -4L, 2L, 1L)(i % 7) + (i * i % 5))
    val fullFit = Timeseries.holtWintersOn(daysFrom("2024-01-01", ys))
      .filter(col("y") =!= 0).collect()
      .map(r => r.getAs[Long]("r") -> r.getAs[Long]("fitted_e6")).toMap
    // forecast h=1 from each prefix n >= 14 must equal fitted at r=n+1
    (14 until 22).foreach { n =>
      val fc1 = Timeseries.holtWintersOn(daysFrom("2024-01-01", ys.take(n)), horizon = 1)
        .filter(col("r") === (n + 1)).collect()
      assert(fc1.length == 1)
      assert(fc1.head.getAs[Long]("fitted_e6") == fullFit(n + 1L),
        s"prefix $n: forecast ${fc1.head.getAs[Long]("fitted_e6")} vs fitted ${fullFit(n + 1L)}")
    }
  }

  test("holt-winters skips series shorter than two seasons and keeps others") {
    val mixed = daysFrom("2024-01-01", Seq.fill(13)(5L), "short")
      .union(daysFrom("2024-01-01", Seq.fill(14)(5L), "ok"))
    val got = Timeseries.holtWintersOn(mixed).collect()
    assert(got.forall(_.getAs[String]("event_type") == "ok"))
    assert(got.nonEmpty)
  }

  test("collab recommendations are symmetric in the pair score and never self-recommend") {
    val rows = Relational.recommendCollab(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("item") != r.getAs[Long]("rec_item")))
    // cos(i,j) as scored from i must equal cos(j,i) wherever both are kept
    val score = rows.map(r => (r.getAs[Long]("item"), r.getAs[Long]("rec_item")) ->
      r.getAs[Long]("cos_e6")).toMap
    score.foreach { case ((i, j), c) =>
      score.get((j, i)).foreach(c2 => assert(c2 == c, s"pair ($i,$j): $c vs $c2"))
    }
    // ranks are 1..k dense per item and ordered by (cos desc, rec_item)
    rows.groupBy(_.getAs[Long]("item")).foreach { case (i, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length))
      val keys = sorted.map(r => (-r.getAs[Long]("cos_e6"), r.getAs[Long]("rec_item"))).toSeq
      assert(keys == keys.sorted, s"item $i not rank-ordered")
    }
  }

  test("collab cosine matches hand-computed co-occurrence on a crafted interaction set") {
    // users 1,2 both touch items 10 and 20; user 3 touches only 10.
    // n(10)=3, n(20)=2, c=2 -> cos = 2/sqrt(6)
    val ev = Seq(
      (1L, "view", """{"k": 10}"""), (1L, "click", """{"k": 20}"""),
      (2L, "purchase", """{"k": 10}"""), (2L, "view", """{"k": 20}"""),
      (3L, "view", """{"k": 10}"""), (3L, "error", """{"k": 20}"""),
      (3L, "signup", """{"k": 20}""")) // non-engagement types ignored
      .toDF("user_id", "event_type", "props")
    val dir = java.nio.file.Files.createTempDirectory("collab").toString
    ev.withColumn("event_id", monotonically_increasing_id())
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("value", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.recommendCollab(spark, dir).collect()
      .map(r => (r.getAs[Long]("item"), r.getAs[Long]("rec_item")) ->
        (r.getAs[Long]("shared_users"), r.getAs[Long]("cos_e6"))).toMap
    val expCos = math.floor(2.0 / (math.sqrt(3.0) * math.sqrt(2.0)) * 1e6 + 0.5).toLong
    assert(got((10L, 20L)) == ((2L, expCos)))
    assert(got((20L, 10L)) == ((2L, expCos)))
    assert(got.size == 2)
  }

  test("forecast anomaly flags a planted off-trend spike and nothing on a clean seasonal series") {
    // clean weekly-seasonal series: zero residual everywhere once the
    // state is seeded, so NO day can exceed 3x the mean abs residual
    val season = Seq(100L, 90L, 80L, 70L, 60L, 50L, 40L)
    val clean = (0 until 28).map(i => season(i % 7))
    val got0 = Timeseries.forecastAnomalyOn(daysFrom("2024-01-01", clean))
      .collect()
    assert(got0.nonEmpty && got0.forall(!_.getAs[Boolean]("is_anomaly")))
    // plant one big spike late in the series: that day must flag
    val spiked = clean.updated(24, 500L)
    val got = Timeseries.forecastAnomalyOn(daysFrom("2024-01-01", spiked))
      .collect()
    val flagged = got.filter(_.getAs[Boolean]("is_anomaly"))
      .map(_.getAs[Long]("r"))
    assert(flagged.contains(25L), s"spike day not flagged (flagged: ${flagged.mkString(",")})")
  }

  test("forecast_eval backtest == holtWinters forecasts of the truncated series, exact-zero error on a constant series") {
    val ys = (0 until 28).map(i => 50L + 2L * i + Seq(3L, 0L, -1L, 4L, 1L, -2L, 2L)(i % 7))
    val eval = Timeseries.forecastEvalOn(daysFrom("2024-01-01", ys))
      .collect().map(r => r.getAs[Long]("h") -> r.getAs[Long]("forecast_e6")).toMap
    assert(eval.keySet == (1L to 7L).toSet)
    // the backtest forecast at horizon h IS the HW forecast from the
    // truncated series (train = first 21 days) at rank 21+h
    val fc = Timeseries.holtWintersOn(daysFrom("2024-01-01", ys.take(21)))
      .filter(col("r") > 21).collect()
      .map(r => (r.getAs[Long]("r") - 21) -> r.getAs[Long]("fitted_e6")).toMap
    assert(eval == fc)
    // constant series: forecasts are exact, every ae and mae is 0
    val const = Timeseries.forecastEvalOn(daysFrom("2024-01-01", Seq.fill(28)(9L)))
      .collect()
    assert(const.length == 7)
    assert(const.forall(r => r.getAs[Long]("ae_e6") == 0L &&
      r.getAs[Long]("mae_e6") == 0L &&
      r.getAs[Long]("forecast_e6") == 9000000L))
  }

  test("recommend_eval: one row per multi-item user; a perfectly-correlated clique ranks its held item first") {
    import spark.implicits._
    // users 1..6 all touch items {10, 20, 30}: whichever item is held
    // out, the other two vote it with maximal cosine — rank 1, hit
    val clique = for (u <- 1L to 6L; i <- Seq(10L, 20L, 30L)) yield (u, i)
    // one single-item user: excluded from eval entirely
    val inter = (clique :+ (99L, 50L)).toDF("user_id", "item")
    val got = Recommend.recommendEvalOn(inter).collect()
    assert(got.length == 6)
    got.foreach { r =>
      assert(r.getAs[Int]("rank") == 1 && r.getAs[Boolean]("hit"),
        s"user ${r.getAs[Long]("user_id")}: rank ${r.getAs[Int]("rank")}")
      assert(Seq(10L, 20L, 30L).contains(r.getAs[Long]("held_item")))
    }
    // and on the natural corpus the mechanism holds: every eligible
    // user appears once, hits iff rank in 1..5
    val nat = Recommend.recommendEvalOn(
      Recommend.interactions(Tables.events(spark, sf))).collect()
    assert(nat.nonEmpty)
    nat.foreach { r =>
      val rk = r.getAs[Int]("rank")
      assert(r.getAs[Boolean]("hit") == (rk >= 1 && rk <= 5))
    }
  }

  test("forecast decomposition reassembles the fit: fitted(r+1) == level(r) + trend(r) + seasonal(r+1-7)") {
    val ys = (0 until 28).map(i => 80L + 2L * i + Seq(6L, -3L, 1L, 4L, -5L, 0L, 2L)(i % 7) + (i * 7 % 3))
    val dec = Timeseries.forecastDecomposeOn(daysFrom("2024-01-01", ys))
      .collect().map(r => r.getAs[Long]("r") ->
        (r.getAs[Long]("level_e6"), r.getAs[Long]("trend_e6"),
          r.getAs[Long]("seasonal_e6"))).toMap
    val fit = Timeseries.holtWintersOn(daysFrom("2024-01-01", ys))
      .filter(col("y") > 0).collect()
      .map(r => r.getAs[Long]("r") -> r.getAs[Long]("fitted_e6")).toMap
    assert(dec.keySet == (8L to 28L).toSet)
    // the seasonal consumed at r+1 is the slot updated at r+1-7
    (15L to 28L).foreach { r1 =>
      val (l, b, _) = dec(r1 - 1)
      val (_, _, sPrev) = dec(r1 - 7)
      assert(fit(r1) == l + b + sPrev, s"r=$r1")
    }
    // constant series: pure level, zero trend and seasonality
    val const = Timeseries.forecastDecomposeOn(daysFrom("2024-01-01", Seq.fill(20)(7L)))
      .collect()
    assert(const.nonEmpty)
    const.foreach { r =>
      assert(r.getAs[Long]("level_e6") == 7000000L &&
        r.getAs[Long]("trend_e6") == 0L && r.getAs[Long]("seasonal_e6") == 0L)
    }
  }

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/cf"

  test("CF model: stored-model top-k == in-query; append of new users == fresh training") {
    val inter = Recommend.interactions(Tables.events(spark, sf))
      .localCheckpoint()
    val dir = tmpDir("cf-serve")
    Recommend.writeCfModel(inter, dir)
    assert(Recommend.recommendTopKFromModel(spark, dir).collect().toSeq ==
      Recommend.recommendTopK(inter).collect().toSeq)
    // a day of NEW users (disjoint user ids) folds in exactly
    val day = inter.withColumn("user_id", col("user_id") + 1000L)
      .filter(col("user_id") % 3 === 0)
    Recommend.appendToCfModel(day, dir)
    val fresh = tmpDir("cf-fresh")
    Recommend.writeCfModel(inter.unionByName(day), fresh)
    assert(Recommend.recommendTopKFromModel(spark, dir).collect().toSeq ==
      Recommend.recommendTopKFromModel(spark, fresh).collect().toSeq)
    assert(spark.read.parquet(s"$dir/pairs").orderBy("i", "j").collect().toSeq
      == spark.read.parquet(s"$fresh/pairs").orderBy("i", "j").collect().toSeq)
  }

  test("per-user recommendations exclude the user's own history and rank by summed cosine") {
    import spark.implicits._
    val inter = Recommend.interactions(Tables.events(spark, sf))
      .localCheckpoint()
    val dir = tmpDir("cf-users")
    Recommend.writeCfModel(inter, dir)
    val history = inter.filter(col("user_id") < 3)
    val recs = Recommend.recommendForUsers(spark, dir, history, n = 5)
      .collect()
    assert(recs.nonEmpty)
    val hist = history.as[(Long, Long)].collect().toSet
    recs.foreach { r =>
      assert(!hist.contains((r.getAs[Long]("user_id"),
        r.getAs[Long]("rec_item"))), "recommended an already-touched item")
    }
    // rank order: (score desc, rec_item) dense from 1 per user
    recs.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length))
      val keys = byRank.map(r => (-r.getAs[Long]("score_e6"),
        r.getAs[Long]("rec_item"))).toSeq
      assert(keys == keys.sorted)
    }
  }
}
