package graft

import graft.functions.TextFunctions
import graft.sources.Multimodal

class TextSpec extends SparkSpec {

  test("text stats ratios are consistent") {
    val rows = TextFunctions.textStats(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_tokens") > 0)
      val ratio = r.getAs[Double]("stopword_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Int]("n_stopwords") <= r.getAs[Int]("n_tokens"))
    }
  }

  test("langid predicts a language for every doc") {
    val rows = TextFunctions.langId(spark, sf).collect()
    assert(rows.length == 500)
    val langs = rows.map(_.getAs[String]("pred_lang")).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "und")))
  }

  test("fingerprints are deterministic across runs") {
    val a = TextFunctions.fingerprint(spark, sf).collect().map(_.toSeq)
    val b = TextFunctions.fingerprint(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("multimodal features preserve payload size and metadata") {
    val rows = Multimodal.features(spark, sf).collect()
    assert(rows.length == 500)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // ASCII corpus: utf-8 byte length == char count
      assert(r.getAs[Int]("n_bytes") == docs(id))
      assert(r.getAs[Long]("n_pixels") ==
        r.getAs[Int]("width").toLong * r.getAs[Int]("height"))
    }
  }
}
