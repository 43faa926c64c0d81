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

  test("multiplicative holt-winters is exact on a constant series and beats the additive form on proportional seasonality") {
    // constant series: the seed ratios are exactly 1e6 and every
    // update is a fixed point — fitted == y for all rows + forecasts
    val const = Timeseries.holtWintersMulOn(
      daysFrom("2024-01-01", Seq.fill(21)(42L))).collect()
    assert(const.length == 14 + 7)
    const.foreach(r => assert(r.getAs[Long]("fitted_e6") == 42000000L,
      s"r=${r.getAs[Long]("r")}: ${r.getAs[Long]("fitted_e6")}"))
    // amplitude-growth series: y = L(i) * s(i%7) with L rising — the
    // seasonal swing grows with the level, which is exactly what the
    // additive form's FIXED offsets cannot track; the ratio form's
    // holdout error must come in strictly below it
    val ratios = Seq(1.5, 0.5, 1.25, 0.75, 1.0, 1.25, 0.75)
    val ys = (0 until 63).map(i =>
      ((100 + 4 * i) * ratios(i % 7)).round)
    def sumAe(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getAs[Long]("ae_e6")).sum
    val mulAe = sumAe(Timeseries.forecastMulEvalOn(
      daysFrom("2024-01-01", ys)).collect())
    val addAe = sumAe(Timeseries.forecastEvalOn(
      daysFrom("2024-01-01", ys)).collect())
    assert(mulAe < addAe,
      s"multiplicative ae $mulAe not below additive ae $addAe")
  }

  test("model selection picks the multiplicative form on amplitude growth and the additive form on fixed offsets") {
    // series "mulwins": y = L(i)*s(i%7) with L rising — ratio
    // seasonality, the multiplicative regime. series "addwins":
    // linear trend + FIXED seasonal offsets — the additive form fits
    // it exactly after warmup, the others cannot beat zero error.
    val ratios = Seq(1.5, 0.5, 1.25, 0.75, 1.0, 1.25, 0.75)
    val mulY = (0 until 63).map(i => ((100 + 4 * i) * ratios(i % 7)).round)
    val offs = Seq(30L, -20L, 10L, -10L, 0L, 20L, -30L)
    val addY = (0 until 63).map(i => 500L + 3L * i + offs(i % 7))
    val daily = daysFrom("2024-01-01", mulY, "mulwins")
      .union(daysFrom("2024-01-01", addY, "addwins"))
    val got = Timeseries.forecastModelSelectOn(daily).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("sae_add_e6"), r.getAs[Long]("sae_damped_e6"),
          r.getAs[Long]("sae_mul_e6"), r.getAs[String]("best"))).toMap
    assert(got.size == 2)
    assert(got("mulwins")._4 == "mul", s"mulwins: ${got("mulwins")}")
    assert(got("addwins")._4 == "additive", s"addwins: ${got("addwins")}")
    // the error columns justify both picks numerically (not exact
    // zeros: the week-1 seed absorbs the intra-week trend ramp into
    // the seasonal state, so the additive fit converges
    // geometrically rather than exactly)
    assert(got("addwins")._1 < got("addwins")._2 &&
      got("addwins")._1 < got("addwins")._3)
    assert(got("mulwins")._3 < got("mulwins")._1 &&
      got("mulwins")._3 < got("mulwins")._2)
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

  test("markov next-item: hand-checked transitions on a crafted sequence; self-loops dropped, ties by next_item") {
    // user 1: 10 -> 20 -> 10 -> 20 ; user 2: 10 -> 20 -> 30 -> 30
    // transitions: (10->20)x3, (20->10)x1, (20->30)x1; 30->30 dropped
    val rows = Seq(
      (1L, 0, 10L), (1L, 1, 20L), (1L, 2, 10L), (1L, 3, 20L),
      (2L, 0, 10L), (2L, 1, 20L), (2L, 2, 30L), (2L, 3, 30L))
    val ev = rows.zipWithIndex.map { case ((u, t, i), eid) =>
      (eid.toLong, u, java.sql.Timestamp.valueOf(s"2024-01-01 0$t:00:00"),
        "view", 1.0, s"""{"k": $i}""")
    }.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("markov").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Recommend.recommendMarkov(spark, dir).collect()
      .map(r => (r.getAs[Long]("item"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("next_item"), r.getAs[Long]("transitions"),
          r.getAs[Long]("prob_e6"))).toMap
    assert(got((10L, 1)) == ((20L, 3L, 1000000L)))
    assert(got((20L, 1)) == ((10L, 1L, 500000L)), "tie broken by next_item")
    assert(got((20L, 2)) == ((30L, 1L, 500000L)))
    assert(got.size == 3, s"unexpected rows: $got")
  }

  test("markov leave-last-out backtest: a dominant pattern ranks its held transition 1; an unseen transition scores 0") {
    // users 1..4: 10 -> 20 -> 30 (held 30, ctx 20, prefix trains 10->20)
    // user 5: 10 -> 20 -> 30 -> 40 (held 40, ctx 30 — prefix trains
    // 10->20, 20->30; the 30->40 transition is never seen => rank 0)
    val rows = (for (u <- 1L to 4L; (t, i) <- Seq((0, 10L), (1, 20L), (2, 30L)))
      yield (u, t, i)) ++
      Seq((5L, 0, 10L), (5L, 1, 20L), (5L, 2, 30L), (5L, 3, 40L))
    val ev = rows.zipWithIndex.map { case ((u, t, i), eid) =>
      (eid.toLong, u, java.sql.Timestamp.valueOf(s"2024-01-01 0$t:00:00"),
        "click", 1.0, s"""{"k": $i}""")
    }.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("markoveval").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Recommend.recommendMarkovEval(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("ctx_item"), r.getAs[Long]("held_item"),
          r.getAs[Int]("rank"), r.getAs[Boolean]("hit"))).toMap
    assert(got.size == 5)
    (1L to 4L).foreach(u => assert(got(u) == ((20L, 30L, 1, true)), s"user $u: ${got(u)}"))
    assert(got(5L) == ((30L, 40L, 0, false)))
    // natural-corpus mechanism: one row per >=3-event user, hit iff rank in 1..5
    val nat = Recommend.recommendMarkovEval(spark, sf).collect()
    assert(nat.nonEmpty)
    nat.foreach { r =>
      val rk = r.getAs[Int]("rank")
      assert(r.getAs[Boolean]("hit") == (rk >= 1 && rk <= 5))
    }
  }

  test("session-bounded transitions are a subset of the raw pairs, equal within one in-gap day, and drop day/gap boundaries") {
    import spark.implicits._
    // natural corpus: bounded counts never exceed raw counts pairwise
    val seqEv = Recommend.engagementSeq(Tables.events(spark, sf))
      .localCheckpoint()
    val raw = Recommend.transitionsFromSeq(seqEv).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bounded = Recommend.transitionsFromSeqBounded(seqEv).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(bounded.nonEmpty)
    bounded.foreach { case (k, c) =>
      assert(raw.contains(k) && c <= raw(k),
        s"bounded invented or inflated transition $k") }
    // crafted: same-day in-gap events => EQUAL; a >30min pause and a
    // midnight crossing each drop exactly their boundary transition
    def seqOf(rows: Seq[(Long, String, Long)]) =
      rows.zipWithIndex.map { case ((u, t, i), eid) =>
        (u, java.sql.Timestamp.valueOf(t), eid.toLong, i)
      }.toDF("user_id", "ts", "event_id", "item")
    val sameDay = seqOf(Seq(
      (1L, "2024-01-01 10:00:00", 10L), (1L, "2024-01-01 10:10:00", 20L),
      (1L, "2024-01-01 10:20:00", 30L)))
    assert(Recommend.transitionsFromSeqBounded(sameDay).collect().toSeq
      .map(_.toSeq).sortBy(_.toString) ==
      Recommend.transitionsFromSeq(sameDay).collect().toSeq
        .map(_.toSeq).sortBy(_.toString))
    val split = seqOf(Seq(
      (1L, "2024-01-01 10:00:00", 10L), (1L, "2024-01-01 10:10:00", 20L),
      (1L, "2024-01-01 11:00:00", 30L), // 50min pause: 20->30 dropped
      (1L, "2024-01-01 23:50:00", 40L), // 12h gap: 30->40 dropped
      (1L, "2024-01-02 00:10:00", 50L))) // within gap but crosses
                                         // midnight: 40->50 dropped
    val got = Recommend.transitionsFromSeqBounded(split).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 20L)), s"got $got")
    // the raw form keeps the in-gap midnight pair — proving 40->50
    // above was dropped by the DAY boundary, not the gap test
    assert(Recommend.transitionsFromSeq(split).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .contains((40L, 50L)))
  }

  test("hybrid backtest: fusion recovers what each single signal misses (CF wrong/Markov right and vice versa)") {
    // Corpus crafted so the two eligible users fail on OPPOSITE
    // single signals and fusion rescues both:
    //  user 1 (CF wrong, Markov right): history {200, 100}, held 101.
    //    Six filler cohorts of 8 users sharing {Ci=1..6, 100} push
    //    C1..C6 above 101 in the CF vote ranking (cos 8/sqrt(52*8) >
    //    3/sqrt(52*3)) => cf_rank 7, a top-5 miss; but the three
    //    {100 -> 101} sequence users make 101 the ONLY trained next
    //    item of ctx 100 => mk_rank 1, fused rank 1.
    //  user 2 (CF right, Markov wrong): history {201, 60}, held 50.
    //    Eight users share {50, 60} ordered [50, 60] (co-occurrence
    //    WITHOUT a 60 -> 50 transition) => cf_rank 1; ctx 60's only
    //    trained transition is 60 -> 70 (four [60, 70] users) =>
    //    mk_rank 0, fused rank 2 (70 fuses cf rank 2 + mk rank 1),
    //    still a top-5 hit where Markov alone scores 0.
    val rows =
      Seq((1L, 0, 200L), (1L, 1, 100L), (1L, 2, 101L),
          (2L, 0, 201L), (2L, 1, 60L), (2L, 2, 50L)) ++
      (10L to 12L).flatMap(u => Seq((u, 0, 100L), (u, 1, 101L))) ++
      (for (i <- 1 to 6; j <- 0 until 8)
        yield (100L + i * 10L + j, 0, i.toLong)) ++
      (for (i <- 1 to 6; j <- 0 until 8)
        yield (100L + i * 10L + j, 1, 100L)) ++
      (300L to 307L).flatMap(u => Seq((u, 0, 50L), (u, 1, 60L))) ++
      (400L to 403L).flatMap(u => Seq((u, 0, 60L), (u, 1, 70L)))
    val seqEv = rows.zipWithIndex.map { case ((u, t, i), eid) =>
      (u, java.sql.Timestamp.valueOf(s"2024-01-01 0$t:00:00"),
        eid.toLong, i)
    }.toDF("user_id", "ts", "event_id", "item")
    val got = Recommend.recommendHybridEvalOn(seqEv).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("ctx_item"), r.getAs[Long]("held_item"),
          r.getAs[Int]("cf_rank"), r.getAs[Int]("mk_rank"),
          r.getAs[Int]("rank"), r.getAs[Boolean]("hit"))).toMap
    assert(got.size == 2, s"only the two 3-event users are eligible: $got")
    assert(got(1L) == ((100L, 101L, 7, 1, 1, true)),
      s"CF-miss/Markov-hit user: ${got(1L)}")
    assert(got(2L) == ((60L, 50L, 1, 0, 2, true)),
      s"CF-hit/Markov-miss user: ${got(2L)}")
    // natural-corpus mechanism: one row per >=3-event user; hit is
    // exactly fused-rank-in-1..k; single-signal ranks respect the
    // depth cut
    val nat = Recommend.recommendHybridEval(spark, sf).collect()
    assert(nat.nonEmpty)
    nat.foreach { r =>
      val rk = r.getAs[Int]("rank")
      assert(r.getAs[Boolean]("hit") == (rk >= 1 && rk <= 5))
      assert(r.getAs[Int]("cf_rank") <= 10 && r.getAs[Int]("mk_rank") <= 10)
    }
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

  test("capInteractions: per-user bound honored, capped set ⊆ raw, no user vanishes") {
    import spark.implicits._
    val inter = Recommend.interactions(Tables.events(spark, sf))
      .localCheckpoint()
    val rawSet = inter.as[(Long, Long)].collect().toSet
    val deg = rawSet.groupBy(_._1).map { case (u, rs) => u -> rs.size }
    val capRows = Recommend.capInteractions(inter, 8)
      .as[(Long, Long)].collect()
    assert(capRows.toSet.subsetOf(rawSet), "capped rows must be raw rows")
    // exactly min(8, d_u) kept per user — the cap SELECTS, never drops
    capRows.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.length == math.min(8, deg(u)), s"user $u: ${rs.length}")
    }
    assert(capRows.map(_._1).toSet == rawSet.map(_._1), "no user vanishes")
    // deterministic: a second evaluation picks the identical sample
    assert(Recommend.capInteractions(inter, 8).as[(Long, Long)]
      .collect().toSet == capRows.toSet)
  }

  test("capped CF: a planted power user is bounded and capped pair counts never exceed uncapped") {
    import spark.implicits._
    // one bot user touching the whole catalog + a few normal users
    val power = (0 until 500).map(i => (999L, i.toLong))
    val normal = for (u <- 1L to 5L; i <- Seq(1L, 2L, 3L, 4L)) yield (u, i)
    val inter = (power ++ normal).toDF("user_id", "item").localCheckpoint()
    val capped = Recommend.capInteractions(inter, 8).localCheckpoint()
    assert(capped.filter(col("user_id") === 999L).count() == 8)
    // the power user's pair fan-out collapses from C(500,2) to C(8,2)
    val rawPairs = Recommend.pairCounts(inter)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val capPairs = Recommend.pairCounts(capped)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(rawPairs.size >= 500 * 499 / 2)
    assert(capPairs.size <= 8 * 7 / 2 + 4 * 3 / 2 * 1 + 6) // bot C(8,2) + normal support
    capPairs.foreach { case (ij, c) =>
      assert(rawPairs.contains(ij) && c <= rawPairs(ij),
        s"pair $ij: capped $c vs raw ${rawPairs.get(ij)}")
    }
  }

  test("damped holt-winters: constant series exact AND identical to the undamped fit (zero trend = damping is a no-op)") {
    val daily = daysFrom("2024-01-01", Seq.fill(21)(42L))
    val dmp = Timeseries.holtWintersOn(daily, damped = true).collect()
    assert(dmp.length == 14 + 7)
    dmp.foreach(r => assert(r.getAs[Long]("fitted_e6") == 42000000L))
    assert(dmp.map(_.toSeq).toSeq ==
      Timeseries.holtWintersOn(daily).collect().map(_.toSeq).toSeq)
  }

  test("damped h=1 forecast equals the next fitted value once the observation arrives") {
    val ys = (0 until 22).map(i => 100L + 3L * i + Seq(5L, -2L, 7L, 0L, -4L, 2L, 1L)(i % 7) + (i * i % 5))
    val fullFit = Timeseries.holtWintersOn(daysFrom("2024-01-01", ys), damped = true)
      .filter(col("y") =!= 0).collect()
      .map(r => r.getAs[Long]("r") -> r.getAs[Long]("fitted_e6")).toMap
    (14 until 22).foreach { n =>
      val fc1 = Timeseries.holtWintersOn(daysFrom("2024-01-01", ys.take(n)),
          horizon = 1, damped = true)
        .filter(col("r") === (n + 1)).collect()
      assert(fc1.length == 1 &&
        fc1.head.getAs[Long]("fitted_e6") == fullFit(n + 1L), s"prefix $n")
    }
  }

  test("damping geometry: increments decay toward zero and the forecast is bounded by l + 9b, while the undamped line grows unbounded") {
    // seasonal-free state isolates the trend term
    val st = Timeseries.HwState(50000000L, 1000000L, Seq.fill(7)(0L))
    // floor(9·db/10) iterated from 1e6 hits 0 after ~131 steps
    val damped = (1 to 160).map(h => Timeseries.hwForecastDamped(st, 160, h))
    val linear = (1 to 160).map(h => Timeseries.hwForecast(st, 160, h))
    val dInc = damped.zip(damped.tail).map { case (a, b) => b - a }
    val lInc = linear.zip(linear.tail).map { case (a, b) => b - a }
    assert(lInc.forall(_ == 1000000L), "undamped increments are exactly b")
    // damped increments are non-negative, non-increasing, strictly
    // below b, and reach 0 (the geometric floor-div decay)
    assert(dInc.head < 1000000L && dInc.forall(_ >= 0L))
    dInc.zip(dInc.tail).foreach { case (a, b) => assert(b <= a) }
    assert(dInc.last == 0L)
    // ceiling: Σ φ^k b ≤ 9b exactly (φ = 9/10)
    assert(damped.forall(_ <= 50000000L + 9L * 1000000L))
    assert(linear.last > damped.last)
  }

  test("damped backtest == damped holtWinters forecasts of the truncated series; undamped eval is unchanged by the flag") {
    val ys = (0 until 28).map(i => 50L + 4L * i + Seq(3L, 0L, -1L, 4L, 1L, -2L, 2L)(i % 7))
    val eval = Timeseries.forecastEvalOn(daysFrom("2024-01-01", ys), damped = true)
      .collect().map(r => r.getAs[Long]("h") -> r.getAs[Long]("forecast_e6")).toMap
    val fc = Timeseries.holtWintersOn(daysFrom("2024-01-01", ys.take(21)),
        damped = true)
      .filter(col("r") > 21).collect()
      .map(r => (r.getAs[Long]("r") - 21) -> r.getAs[Long]("fitted_e6")).toMap
    assert(eval == fc)
    // on a genuine trend the damped backtest forecasts BELOW the
    // undamped one at the far horizons (the damp bites)
    val und = Timeseries.forecastEvalOn(daysFrom("2024-01-01", ys))
      .collect().map(r => r.getAs[Long]("h") -> r.getAs[Long]("forecast_e6")).toMap
    assert(eval(7L) < und(7L), s"damped ${eval(7L)} vs undamped ${und(7L)}")
  }

  test("capInteractions commutes with whole-user batches: cap(A ∪ B) == cap(A) ∪ cap(B) on disjoint user sets") {
    import spark.implicits._
    val inter = Recommend.interactions(Tables.events(spark, sf))
      .localCheckpoint()
    val a = inter.filter(col("user_id") % 2 === 0)
    val b = inter.filter(col("user_id") % 2 =!= 0)
    val whole = Recommend.capInteractions(inter, 8)
      .as[(Long, Long)].collect().toSet
    val parts = Recommend.capInteractions(a, 8).as[(Long, Long)].collect().toSet ++
      Recommend.capInteractions(b, 8).as[(Long, Long)].collect().toSet
    // a user's capped set depends only on their own rows, so capped
    // model maintenance by whole users (append/forget) is exact
    assert(whole == parts)
  }

  test("forecast intervals: zero-width on a constant series; band == the exact q95 |residual| element on a noisy one") {
    val const = Timeseries.forecastIntervalsOn(
      daysFrom("2024-01-01", Seq.fill(21)(42L))).collect()
    assert(const.length == 7)
    const.foreach { r =>
      assert(r.getAs[Long]("lo_e6") == 42000000L &&
        r.getAs[Long]("hi_e6") == 42000000L)
    }
    val ys = (0 until 28).map(i =>
      100L + 2L * i + Seq(5L, -2L, 7L, 0L, -4L, 2L, 1L)(i % 7) + (i * i % 11))
    val daily = daysFrom("2024-01-01", ys)
    val got = Timeseries.forecastIntervalsOn(daily).collect()
    assert(got.length == 7)
    // driver recount of the band: q95 element of |y*1e6 - fitted|
    // over the observed fit rows, rank ceil(95n/100)
    val aresid = Timeseries.holtWintersOn(daily, horizon = 0).collect()
      .map(r => math.abs(r.getAs[Long]("y") * 1000000L -
        r.getAs[Long]("fitted_e6"))).sorted
    val band = aresid((95 * aresid.length + 99) / 100 - 1)
    assert(band > 0L)
    got.foreach { r =>
      assert(r.getAs[Long]("lo_e6") == r.getAs[Long]("fitted_e6") - band)
      assert(r.getAs[Long]("hi_e6") == r.getAs[Long]("fitted_e6") + band)
    }
  }

  test("interval backtest: clean held-out days are covered by zero-width bands; a planted held-out spike falls outside") {
    val season = Seq(100L, 90L, 80L, 70L, 60L, 50L, 40L)
    val clean = (0 until 28).map(i => season(i % 7))
    val got0 = Timeseries.forecastIntervalsEvalOn(daysFrom("2024-01-01", clean))
      .collect()
    assert(got0.length == 7)
    got0.foreach { r =>
      assert(r.getAs[Boolean]("covered") &&
        r.getAs[Long]("lo_e6") == r.getAs[Long]("hi_e6"),
        s"h=${r.getAs[Long]("h")}")
    }
    // spike day index 24 = rank 25 = holdout horizon 4 (train = 21)
    val spiked = clean.updated(24, 500L)
    val got = Timeseries.forecastIntervalsEvalOn(daysFrom("2024-01-01", spiked))
      .collect().map(r => r.getAs[Long]("h") -> r.getAs[Boolean]("covered")).toMap
    assert(!got(4L), "the held-out spike must fall outside the bands")
    assert((1L to 7L).filter(_ != 4L).forall(got), "clean held days stay covered")
  }

  test("a total-outage day (y = 0) is flagged by the anomaly monitor") {
    val season = Seq(100L, 90L, 80L, 70L, 60L, 50L, 40L)
    val outage = (0 until 28).map(i => season(i % 7)).updated(24, 0L)
    val got = Timeseries.forecastAnomalyOn(daysFrom("2024-01-01", outage))
      .collect()
    val day25 = got.find(_.getAs[Long]("r") == 25L).get
    assert(day25.getAs[Long]("y") == 0L)
    assert(day25.getAs[Boolean]("is_anomaly"),
      "the zero-valued day must be present AND flagged")
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

  test("hybrid RRF recommendations == a driver recount over the two collected rankings") {
    val cf = Recommend.recommendTopK(
        Recommend.interactions(Tables.events(spark, sf)), 10)
      .collect().map(r => (r.getAs[Long]("item"), r.getAs[Long]("rec_item"),
        r.getAs[Int]("rank")))
    val mk = Recommend.recommendMarkov(spark, sf, 10)
      .collect().map(r => (r.getAs[Long]("item"), r.getAs[Long]("next_item"),
        r.getAs[Int]("rank")))
    def term(rank: Int) = BigDecimal(1.0 / (60 + rank))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val fused = (cf ++ mk).groupBy(t => (t._1, t._2))
      .map { case ((i, c), ts) =>
        (i, c, ts.map(t => term(t._3)).sum.toDouble) }
      .map { case (i, c, s) =>
        (i, c, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    val expected = fused.groupBy(_._1).flatMap { case (i, cands) =>
      cands.toSeq.sortBy { case (_, c, s) => (-s, c) }.take(5).zipWithIndex
        .map { case ((_, c, s), r) => (i, c, s, r + 1) }
    }.toSet
    val got = Recommend.recommendHybrid(spark, sf).collect()
      .map(r => (r.getAs[Long]("item"), r.getAs[Long]("rec_item"),
        r.getAs[Double]("rrf"), r.getAs[Int]("rank"))).toSet
    assert(got.nonEmpty && got == expected)
  }

  test("Markov model: stored top-k == in-query; pruned next-item serve == the full ranking restricted to the batch's contexts; append of new users == fresh") {
    import spark.implicits._
    val events = Tables.events(spark, sf).localCheckpoint()
    val dir = tmpDir("markov-model")
    Recommend.writeMarkovModel(events, dir)
    assert(Recommend.recommendMarkovFromModel(spark, dir)
      .collect().map(_.toSeq).toSeq ==
      Recommend.recommendMarkov(spark, sf).collect().map(_.toSeq).toSeq)
    // pruned serve: per request the rows are exactly the full
    // ranking's rows for that context item
    val reqs = Seq((900L, 3L), (901L, 7L)).toDF("user_id", "item")
    val served = Recommend.markovNextServeBatch(spark, dir, reqs).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ctx_item"),
        r.getAs[Int]("rank"), r.getAs[Long]("next_item"),
        r.getAs[Long]("transitions"), r.getAs[Long]("prob_e6"))).toSet
    val full = Recommend.recommendMarkovFromModel(spark, dir).collect()
      .map(r => (r.getAs[Long]("item"), r.getAs[Int]("rank"),
        r.getAs[Long]("next_item"), r.getAs[Long]("transitions"),
        r.getAs[Long]("prob_e6")))
    val expected = (for ((u, i) <- Seq((900L, 3L), (901L, 7L));
                         row <- full if row._1 == i)
      yield (u, i, row._2, row._3, row._4, row._5)).toSet
    assert(served == expected && served.nonEmpty)
    // append of disjoint NEW users folds in exactly
    val day = events.withColumn("user_id", col("user_id") + 5000L)
      .filter(col("user_id") % 3 === 0)
    Recommend.appendToMarkovModel(day, dir)
    val fresh = tmpDir("markov-fresh")
    Recommend.writeMarkovModel(events.unionByName(day), fresh)
    assert(spark.read.parquet(s"$dir/trans").orderBy("item", "next_item")
      .collect().toSeq ==
      spark.read.parquet(s"$fresh/trans").orderBy("item", "next_item")
        .collect().toSeq)
  }

  test("recommendForUsers: duplicate history rows never double-count votes, and the item-pruned serve equals a full-model driver replay") {
    import spark.implicits._
    val inter = Recommend.interactions(Tables.events(spark, sf))
      .localCheckpoint()
    val dir = tmpDir("cf-dup")
    Recommend.writeCfModel(inter, dir)
    val history = inter.filter(col("user_id") < 4).localCheckpoint()
    val recs = Recommend.recommendForUsers(spark, dir, history, n = 5)
      .collect().map(_.toSeq).toSeq
    // a request repeating every history row (the duplicated-item-in-
    // one-RecRequest shape) must produce the identical answer
    val dup = Recommend.recommendForUsers(spark, dir,
      history.union(history), n = 5).collect().map(_.toSeq).toSeq
    assert(recs == dup, "duplicate history rows changed the votes")
    // full-model driver replay: score every candidate from the RAW
    // pairs/items parquet with no pruning — the semi-join prune must
    // be invisible in the output
    val pairs = spark.read.parquet(s"$dir/pairs")
      .as[(Long, Long, Long)].collect()
    val n = spark.read.parquet(s"$dir/items")
      .as[(Long, Long)].collect().toMap
    val sims = (pairs ++ pairs.map(p => (p._2, p._1, p._3)))
      .map { case (i, j, c) =>
        (i, j) -> math.floor(c.toDouble /
          (math.sqrt(n(i).toDouble) * math.sqrt(n(j).toDouble)) * 1e6 + 0.5).toLong
      }.toMap
    val hist = history.as[(Long, Long)].collect().toSet
    val expected = hist.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val items = rows.map(_._2)
      val votes = sims.toSeq
        .collect { case ((i, j), c) if items.contains(i) => j -> c }
        .groupBy(_._1).map { case (j, cs) => j -> cs.map(_._2).sum }
        .filter { case (j, _) => !hist.contains((u, j)) }
      votes.toSeq.sortBy { case (j, sc) => (-sc, j) }.take(5).zipWithIndex
        .map { case ((j, sc), r) => Seq[Any](u, r + 1, j, sc) }
    }.toSet
    assert(recs.toSet == expected, "pruned serve diverged from the full-model replay")
  }

  test("cold-start fallback serves the provably coldest items content neighbors from the catalog") {
    import spark.implicits._
    val got = Recommend.recommendColdStart(spark, sf).collect()
    assert(got.nonEmpty)
    val byItem = got.groupBy(_.getAs[Long]("item"))
    assert(byItem.size == 10, s"expected 10 cold items, got ${byItem.size}")
    // the chosen set IS the bottom-10 of the recomputed warmth order
    val inter = Recommend.interactions(Tables.events(spark, sf))
      .localCheckpoint()
    val catalog = inter.select(col("item")).distinct()
      .as[Long].collect().toSet
    val w = Recommend.pairCounts(inter).collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(2),
        r.getLong(1) -> r.getLong(2)))
      .groupBy(_._1).map { case (i, cs) => i -> cs.map(_._2).sum }
    val expected = catalog.toSeq
      .map(i => (w.getOrElse(i, 0L), i)).sorted.take(10)
      .map { case (wm, i) => i -> wm }.toMap
    byItem.foreach { case (i, rs) =>
      assert(expected.contains(i), s"item $i is not among the coldest 10")
      rs.foreach(r => assert(r.getAs[Long]("warmth") == expected(i)))
      // each list: 5 catalog neighbors, never self, ranked by
      // (cos desc, rec_item)
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length)
        && rs.length == 5)
      byRank.foreach { r =>
        val rec = r.getAs[Long]("rec_item")
        assert(rec != i && catalog.contains(rec)) }
      val keys = byRank.map(r => (-r.getAs[Double]("cos_sim"),
        r.getAs[Long]("rec_item"))).toSeq
      assert(keys == keys.sorted)
    }
  }

  test("recommendation coverage: a symmetric triangle covers the catalog with zero gini; natural readout stays consistent") {
    import spark.implicits._
    // users form a 3-cycle of co-occurrences: every item co-occurs
    // once with each other item, so every top-k list is symmetric —
    // coverage exactly 1e6 ppm and recommendation frequency is
    // uniform, which the exact-integer gini must score EXACTLY 0
    val rows = Seq((1L, 10L), (1L, 20L), (2L, 20L), (2L, 30L),
      (3L, 30L), (3L, 10L))
    val ev = rows.zipWithIndex.map { case ((u, i), eid) =>
      (eid.toLong, u, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        "view", 1.0, s"""{"k": $i}""")
    }.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("cov").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Recommend.recommendCoverage(spark, dir).collect().head
    assert(r.getAs[Long]("catalog_items") == 3L)
    assert(r.getAs[Long]("recommended_items") == 3L)
    assert(r.getAs[Long]("coverage_ppm") == 1000000L)
    assert(r.getAs[Long]("gini_ppm") == 0L)
    // natural corpus: one row, coverage consistent with the counts,
    // gini within [0, 1e6)
    val n = Recommend.recommendCoverage(spark, sf).collect()
    assert(n.length == 1)
    val nr = n.head
    assert(nr.getAs[Long]("coverage_ppm") ==
      nr.getAs[Long]("recommended_items") * 1000000L /
        nr.getAs[Long]("catalog_items"))
    val g = nr.getAs[Long]("gini_ppm")
    assert(g >= 0L && g < 1000000L)
  }

  test("preference pairs: cross-level pairs with max-engagement levels, bounded per user by the md5 cap") {
    import spark.implicits._
    // user 1: purchase 10, click 20, view 30 — and ALSO views item
    // 10 (max wins: 10 stays level 3). user 2 is a 21-item bot (10
    // purchases + 11 views) — the cap must bound their pair count.
    val rows =
      Seq((1L, "purchase", 10L), (1L, "view", 10L), (1L, "click", 20L),
          (1L, "view", 30L)) ++
      (0 until 10).map(i => (2L, "purchase", 100L + i)) ++
      (0 until 11).map(i => (2L, "view", 200L + i))
    val ev = rows.zipWithIndex.map { case ((u, t, i), eid) =>
      (eid.toLong, u, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        t, 1.0, s"""{"k": $i}""")
    }.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("prefpairs").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Recommend.preferencePairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("chosen_item"),
        r.getAs[Long]("rejected_item"), r.getAs[Int]("chosen_level"),
        r.getAs[Int]("rejected_level"), r.getAs[Int]("margin")))
    val u1 = got.filter(_._1 == 1L).toSet
    assert(u1 == Set((1L, 10L, 20L, 3, 2, 1), (1L, 10L, 30L, 3, 1, 2),
      (1L, 20L, 30L, 2, 1, 1)), s"user-1 pairs: $u1")
    // the bot's pairs are bounded by the cap: the kept set is 8
    // items (deterministic md5 pick), so distinct items across all
    // their pairs is <= 8 (< the 21 uncapped) and the pairs form the
    // complete cross-level bipartite product of the kept split
    val u2 = got.filter(_._1 == 2L)
    val u2items = (u2.map(_._2) ++ u2.map(_._3)).distinct
    assert(u2.nonEmpty && u2items.length <= 8,
      s"cap did not bound the bot: ${u2items.length} items")
    val kp = u2.map(_._2).distinct.length
    val kv = u2.map(_._3).distinct.length
    assert(u2.length == kp * kv, s"not the full bipartite: ${u2.length}")
    // natural corpus: every pair strictly cross-level, margin exact,
    // per-user count within the cap bound
    val nat = Recommend.preferencePairs(spark, sf).collect()
    assert(nat.nonEmpty)
    nat.foreach { r =>
      assert(r.getAs[Int]("chosen_level") > r.getAs[Int]("rejected_level"))
      assert(r.getAs[Int]("margin") ==
        r.getAs[Int]("chosen_level") - r.getAs[Int]("rejected_level"))
    }
    nat.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      assert(rs.length <= 28, s"user $u exceeds the cap bound") }
  }

  test("markov stationary mass follows transition weights into a dangling hub") {
    import spark.implicits._
    // node 1 splits its outflow 3:1 between hubs 3 and 4 (both
    // dangling — no 2-cycle parity; the teleport base keeps mass
    // flowing); node 2 feeds 3 only. Equilibrium order must be
    // pr(3) > pr(4) > pr(1) == pr(2) (sources keep only the base)
    val trans = Seq((1L, 3L, 3L), (1L, 4L, 1L), (2L, 3L, 4L))
      .toDF("item", "next_item", "c")
    val got = Recommend.markovStationaryOn(trans).collect()
      .map(r => r.getAs[Long]("item") -> r.getAs[Long]("pr_e12")).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == got(2L), s"pure sources must tie at base: $got")
    assert(got(3L) > got(4L) && got(4L) > got(1L), s"weight order: $got")
    // natural corpus: one row per item touched by any transition,
    // every mass positive, rounded readout consistent with the
    // integer state
    val nat = Recommend.markovStationary(spark, sf).collect()
    assert(nat.nonEmpty)
    nat.foreach { r =>
      assert(r.getAs[Long]("pr_e12") > 0L)
      assert(r.getAs[Double]("stationary") ==
        BigDecimal(r.getAs[Long]("pr_e12").toDouble / 1e12)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("order-2 backtest: the context pair disambiguates where order 1 ranks wrong, and a novel context backs off to order 1") {
    import spark.implicits._
    // 4 users follow 10 -> 20 -> 30; 6 users follow 40 -> 20 -> 50.
    // From context item 20 alone, order 1 ranks 50 (c=6) over 30
    // (c=4) — the WRONG call for a user who arrived at 20 via 10.
    // The order-2 context (10, 20) -> 30 disambiguates. User 300's
    // context (11, 21) was never trained as a pair => strict backoff
    // to order 1 from 21 (trained by user 30's [7, 21, 35]).
    def seqOf(rows: Seq[(Long, Seq[Long])]) =
      rows.flatMap { case (u, items) => items.zipWithIndex.map {
        case (i, t) => (u, t, i) } }
        .zipWithIndex.map { case ((u, t, i), eid) =>
          (u, java.sql.Timestamp.valueOf(f"2024-01-01 0$t%d:00:00"),
            eid.toLong, i)
        }.toDF("user_id", "ts", "event_id", "item")
    val seqEv = seqOf(
      (1L to 4L).map(u => u -> Seq(10L, 20L, 30L)) ++
      (11L to 16L).map(u => u -> Seq(40L, 20L, 50L)) ++
      Seq(30L -> Seq(7L, 21L, 35L),
        100L -> Seq(99L, 10L, 20L, 30L),
        300L -> Seq(98L, 11L, 21L, 35L))).localCheckpoint()
    val got = Recommend.recommendMarkov2EvalOn(seqEv).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("ctx2_item"), r.getAs[Long]("ctx1_item"),
          r.getAs[Long]("held_item"), r.getAs[Int]("used_order"),
          r.getAs[Int]("rank"), r.getAs[Boolean]("hit"))).toMap
    assert(got.size == 2, s"only the two >=4-event users are eligible: $got")
    assert(got(100L) == ((10L, 20L, 30L, 2, 1, true)),
      s"order-2 context user: ${got(100L)}")
    assert(got(300L) == ((11L, 21L, 35L, 1, 1, true)),
      s"backoff user: ${got(300L)}")
    // the order-1 contrast on the SAME carve: from 20, the held 30
    // ranks BELOW 50 — order 2's rank-1 call is a genuine win
    val carve = seqEv.where(
      !(col("user_id") === 100L && col("item") === 30L) &&
      !(col("user_id") === 300L && col("item") === 35L))
    val m1 = Recommend.transitionsFromSeq(carve).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m1((20L, 50L)) == 6L && m1((20L, 30L)) == 4L,
      s"order-1 counts from 20 drifted: $m1")
  }

  test("session-bounded Markov model: maintenance verbs under gapMinutes stay exact count algebra (append == fresh, forget round-trips)") {
    val events = Tables.events(spark, sf).localCheckpoint()
    val gap = Some(30)
    val dir = tmpDir("markov-bounded")
    Recommend.writeMarkovModel(events, dir, gap)
    // the stored table IS the bounded transition frame
    assert(spark.read.parquet(s"$dir/trans").orderBy("item", "next_item")
      .collect().toSeq ==
      Recommend.transitionsFromSeqBounded(Recommend.engagementSeq(events))
        .orderBy("item", "next_item").collect().toSeq)
    val day = events.withColumn("user_id", col("user_id") + 6000000L)
      .filter(col("user_id") % 4 === 0).localCheckpoint()
    Recommend.appendToMarkovModel(day, dir, gap)
    val fresh = tmpDir("markov-bounded-fresh")
    Recommend.writeMarkovModel(events.unionByName(day), fresh, gap)
    def trans(d: String) = spark.read.parquet(s"$d/trans")
      .orderBy("item", "next_item").collect().toSeq
    assert(trans(dir) == trans(fresh), "bounded append != fresh bounded")
    // forgetting exactly the appended users round-trips to the
    // original model (the subtraction is exact)
    Recommend.forgetFromMarkovModel(day, dir, gap)
    val orig = tmpDir("markov-bounded-orig")
    Recommend.writeMarkovModel(events, orig, gap)
    assert(trans(dir) == trans(orig), "bounded forget did not round-trip")
  }

  test("session-bounded order-2 triples are a subset of the raw ones and the bounded backoff artifact round-trips") {
    val seqEv = Recommend.engagementSeq(Tables.events(spark, sf))
      .localCheckpoint()
    val raw = Recommend.markov2TransitionsFromSeq(seqEv).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val bounded = Recommend.markov2TransitionsFromSeqBounded(seqEv)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(bounded.nonEmpty)
    bounded.foreach { case (k, c) =>
      assert(raw.contains(k) && c <= raw(k),
        s"bounded invented or inflated triple $k") }
    // bounded artifact: both order tables bounded CONSISTENTLY;
    // append then forget of the same users round-trips exactly
    val events = Tables.events(spark, sf).localCheckpoint()
    val gap = Some(30)
    val dir = tmpDir("markov2-bounded")
    Recommend.writeMarkov2Model(events, dir, gap)
    assert(spark.read.parquet(s"$dir/trans2")
      .orderBy("prev2_item", "prev1_item", "next_item").collect().toSeq ==
      Recommend.markov2TransitionsFromSeqBounded(seqEv)
        .orderBy("prev2_item", "prev1_item", "next_item").collect().toSeq)
    val day = events.withColumn("user_id", col("user_id") + 8000000L)
      .filter(col("user_id") % 5 === 0).localCheckpoint()
    Recommend.appendToMarkov2Model(day, dir, gap)
    Recommend.forgetFromMarkov2Model(day, dir, gap)
    val orig = tmpDir("markov2-bounded-orig")
    Recommend.writeMarkov2Model(events, orig, gap)
    def t(d: String, sub: String, cols: Seq[String]) =
      spark.read.parquet(s"$d/$sub").orderBy(cols.map(col): _*)
        .collect().toSeq
    assert(t(dir, "trans2", Seq("prev2_item", "prev1_item", "next_item")) ==
      t(orig, "trans2", Seq("prev2_item", "prev1_item", "next_item")))
    assert(t(dir, "trans", Seq("item", "next_item")) ==
      t(orig, "trans", Seq("item", "next_item")))
  }

  test("markov2 model: stored top-k == in-query; backoff serve routes trained contexts to order 2 and novel ones to order 1; append == fresh") {
    import spark.implicits._
    val events = Tables.events(spark, sf).localCheckpoint()
    val dir = tmpDir("markov2-model")
    Recommend.writeMarkov2Model(events, dir)
    assert(Recommend.recommendMarkov2FromModel(spark, dir)
      .collect().map(_.toSeq).toSeq ==
      Recommend.recommendMarkov2(spark, sf).collect().map(_.toSeq).toSeq)
    // pick one genuinely trained context pair; pair (999999, x) is
    // guaranteed novel (item ids are bounded by the catalog)
    val (p2, p1) = spark.read.parquet(s"$dir/trans2")
      .orderBy("prev2_item", "prev1_item", "next_item")
      .select("prev2_item", "prev1_item").as[(Long, Long)].head()
    val reqs = Seq((900L, p2, p1), (901L, 999999L, p1))
      .toDF("user_id", "prev2_item", "prev1_item")
    val served = Recommend.markov2NextServeBatch(spark, dir, reqs).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("used_order"),
        r.getAs[Int]("rank"), r.getAs[Long]("next_item"),
        r.getAs[Long]("transitions"), r.getAs[Long]("prob_e6"))).toSet
    val full2 = Recommend.recommendMarkov2FromModel(spark, dir).collect()
      .filter(r => r.getAs[Long]("prev2_item") == p2 &&
        r.getAs[Long]("prev1_item") == p1)
      .map(r => (900L, 2, r.getAs[Int]("rank"), r.getAs[Long]("next_item"),
        r.getAs[Long]("transitions"), r.getAs[Long]("prob_e6")))
    val full1 = Recommend.recommendMarkovFromModel(spark, dir).collect()
      .filter(_.getAs[Long]("item") == p1)
      .map(r => (901L, 1, r.getAs[Int]("rank"), r.getAs[Long]("next_item"),
        r.getAs[Long]("transitions"), r.getAs[Long]("prob_e6")))
    assert(served == (full2 ++ full1).toSet && full2.nonEmpty
      && full1.nonEmpty,
      "backoff serve diverged from the full rankings")
    // append of disjoint NEW users folds both orders in exactly
    val day = events.withColumn("user_id", col("user_id") + 7000000L)
      .filter(col("user_id") % 3 === 0)
    Recommend.appendToMarkov2Model(day, dir)
    val fresh = tmpDir("markov2-fresh")
    Recommend.writeMarkov2Model(events.unionByName(day), fresh)
    assert(spark.read.parquet(s"$dir/trans2")
      .orderBy("prev2_item", "prev1_item", "next_item").collect().toSeq ==
      spark.read.parquet(s"$fresh/trans2")
        .orderBy("prev2_item", "prev1_item", "next_item").collect().toSeq)
    assert(spark.read.parquet(s"$dir/trans").orderBy("item", "next_item")
      .collect().toSeq ==
      spark.read.parquet(s"$fresh/trans").orderBy("item", "next_item")
        .collect().toSeq)
  }

  test("hybrid serve: fusing the two pruned stored-model serves == an exact-arithmetic driver replay") {
    import spark.implicits._
    val events = Tables.events(spark, sf).localCheckpoint()
    val inter = Recommend.interactions(events).localCheckpoint()
    val cfDir = tmpDir("hyb-cf")
    val mkDir = tmpDir("hyb-mk")
    Recommend.writeCfModel(inter, cfDir)
    Recommend.writeMarkovModel(events, mkDir)
    val history = inter.filter(col("user_id") < 5).localCheckpoint()
    // context = each request user's max history item (deterministic)
    val ctx = history.groupBy(col("user_id"))
      .agg(max(col("item")).as("item")).localCheckpoint()
    val got = Recommend
      .recommendHybridServeBatch(spark, cfDir, mkDir, history, ctx)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("rec_item"), r.getAs[Double]("rrf")))
    // replay: collect BOTH depth-cut serve lists (each already spec'd
    // against its full model) and fuse with the exact decimal recipe
    val cf = Recommend.recommendForUsers(spark, cfDir, history, 10)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("rec_item"), r.getAs[Int]("rank")))
    val mk = Recommend.markovNextServeBatch(spark, mkDir, ctx, 10)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("next_item"), r.getAs[Int]("rank")))
    def term(rank: Int) = BigDecimal(1.0 / (60 + rank))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val fused = (cf ++ mk).groupBy(t => (t._1, t._2))
      .map { case ((u, c), ts) =>
        (u, c, BigDecimal(ts.map(t => term(t._3)).sum.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    val expected = fused.groupBy(_._1).flatMap { case (u, cands) =>
      cands.toSeq.sortBy { case (_, c, s) => (-s, c) }.take(5).zipWithIndex
        .map { case ((_, c, s), r) => (u, r + 1, c, s) }
    }.toSet
    assert(got.nonEmpty && got.toSet == expected,
      "fused serve diverged from the exact fusion replay")
  }
}
