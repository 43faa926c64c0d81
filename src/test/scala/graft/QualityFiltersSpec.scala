package graft

import graft.functions.QualityFilters

/** Gopher/C4 published filter rule sets: each injected document trips
  * exactly the rule it was crafted for, and the all-integer flag
  * arithmetic matches hand-computed values. */
class QualityFiltersSpec extends SparkSpec {

  private lazy val gopher = QualityFilters.gopherRules(spark, sf)
    .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  private lazy val c4 = QualityFilters.c4Filters(spark, sf)
    .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  private def g(id: Long, col: String): Int =
    gopher(id).getAs[Int](col)
  private def c(id: Long, col: String): Int =
    c4(id).getAs[Int](col)

  test("gopher: the clean inject passes every rule") {
    val flags = Seq("f_words", "f_mean_len", "f_sym", "f_alpha",
      "f_stop", "f_bullet", "f_ellipsis", "passes")
    flags.foreach(f => assert(g(-6L, f) == 1, s"-6 failed $f"))
    assert(g(-6L, "n_words") == 60 && g(-6L, "n_word_chars") == 240)
  }

  test("gopher: each crafted doc trips its targeted rule") {
    assert(g(-1L, "f_bullet") == 0 && g(-1L, "n_bullet") == 10)
    assert(g(-2L, "f_ellipsis") == 0 && g(-2L, "n_ellipsis") == 10)
    assert(g(-2L, "f_sym") == 0 && g(-2L, "n_sym") == 10)
    assert(g(-3L, "f_sym") == 0 && g(-3L, "n_sym") == 60)
    assert(g(-4L, "f_words") == 0 && g(-4L, "n_words") == 5)
    assert(g(-5L, "f_alpha") == 0 && g(-5L, "n_alpha_words") == 0)
  }

  test("gopher: natural docs get exact token accounting") {
    val naturals = gopher.filter(_._1 >= 0)
    assert(naturals.nonEmpty)
    naturals.values.foreach { r =>
      assert(r.getAs[Int]("n_words") > 0)
      assert(r.getAs[Int]("n_alpha_words") <= r.getAs[Int]("n_words"))
      assert(r.getAs[Int]("n_lines") ==
        (r.getAs[Int]("n_words") + 9) / 10)
    }
  }

  test("c4: five proper sentences keep the page; four do not") {
    assert(c(-1L, "page_kept") == 1 && c(-1L, "kept_lines") == 5)
    assert(c(-5L, "page_kept") == 0 && c(-5L, "kept_lines") == 4)
  }

  test("c4: drop reasons land in their precedence buckets") {
    assert(c(-2L, "drop_js") == 1 && c(-2L, "page_kept") == 0)
    assert(c(-3L, "has_lorem") == 1 && c(-3L, "page_kept") == 0)
    assert(c(-4L, "has_brace") == 1 && c(-4L, "page_kept") == 0)
    assert(c(-6L, "drop_punct") == 2 && c(-6L, "page_kept") == 1)
    assert(c(-7L, "drop_short") == 1 && c(-7L, "kept_lines") == 4)
  }

  test("c4: natural token soup has no terminal punctuation — all lines drop") {
    val naturals = c4.filter(_._1 >= 0).values
    assert(naturals.nonEmpty)
    naturals.foreach { r =>
      assert(r.getAs[Int]("kept_lines") == 0)
      assert(r.getAs[Int]("drop_punct") == r.getAs[Int]("n_lines"))
      // empty kept text hashes to the md5 of ""
      assert(r.getAs[String]("kept_md5") ==
        "d41d8cd98f00b204e9800998ecf8427e")
    }
  }

  test("line buckets partition: kept + dropped == n_lines") {
    c4.values.foreach { r =>
      assert(r.getAs[Int]("kept_lines") + r.getAs[Int]("drop_js") +
        r.getAs[Int]("drop_punct") + r.getAs[Int]("drop_short") ==
        r.getAs[Int]("n_lines"))
    }
  }
}
