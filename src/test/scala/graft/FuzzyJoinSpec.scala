package graft

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def naive(ls: Seq[String], rs: Seq[String], d: Int) =
    (for (l <- ls.distinct; r <- rs.distinct; dist = lev(l, r) if dist <= d)
      yield (l, r, dist.toLong)).toSet

  test("editJoin == naive all-pairs filter at d=1 and d=2") {
    // low-entropy strings with planted near-matches: substitutions,
    // insertions, deletions, transposition (= 2 edits), and far pairs
    val ls = Seq("small ring", "red widget", "blue bolt", "hot gear",
      "abc", "ab", "", "aaaa", "xyzzy")
    val rs = Seq("smalx ring", "red widget", "blue boltt", "ht gear",
      "acb", "abcd", "a", "aaba", "totally different")
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin
        .editJoin(ls.toDF("l"), "l", rs.toDF("r"), "r", d)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got == naive(ls, rs, d), s"maxDist=$d")
    }
  }

  test("recall is exact on randomized corpora (FastSS property, d=1)") {
    val rnd = new scala.util.Random(42)
    def word() = (0 until (1 + rnd.nextInt(6)))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    for (trial <- 0 until 5) {
      val ls = Seq.fill(30)(word())
      val rs = Seq.fill(30)(word())
      val got = FuzzyJoin
        .editJoin(ls.toDF("l"), "l", rs.toDF("r"), "r", 1)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got == naive(ls, rs, 1), s"trial $trial: ls=$ls rs=$rs")
    }
  }

  test("d=0 degenerates to an exact distinct join") {
    val got = FuzzyJoin.editJoin(
      Seq("a", "b", "a").toDF("l"), "l",
      Seq("a", "c").toDF("r"), "r", 0).collect()
    assert(got.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq == Seq(("a", "a", 0L)))
  }

  test("blocking join is equi — no nested-loop/cartesian in the plan") {
    val part = Tables.part(spark, sf)
    val plan = FuzzyJoin
      .editJoin(part.select("p_name"), "p_name",
        part.selectExpr("p_name AS probe"), "probe", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
