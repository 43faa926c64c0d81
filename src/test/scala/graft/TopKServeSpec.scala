package graft

import graft.operators.Dedup
import graft.sources.Multimodal
import org.apache.spark.sql.functions._

/** STORED-INDEX SERVING parity for the non-cosine top-k tiers
  * (hamming / image dHash / shingle Jaccard): serving a query batch
  * off the maintained artifact must reproduce the in-query form
  * exactly when the batch IS the in-query query set (excludeSelf
  * bridges the id-space difference — in-query queries live inside
  * the corpus id space, serving batches don't). */
class TopKServeSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/idx"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("hammingTopKServeBatch off the simhash index == in-query hammingTopK") {
    val docs = Dedup.withPlants(Tables.documents(spark, sf))
    val dir = tmp("srv-simhash")
    Dedup.writeSimhashIndex(docs, dir)
    val served = Dedup.hammingTopKServeBatch(spark, dir,
      docs.filter(col("doc_id") < 50), excludeSelf = true)
    assert(rows(served) == rows(Dedup.hammingTopK(docs)))
    assert(served.count() > 0)
  }

  test("phashTopKServeBatch off the phash index == in-query phashTopK") {
    val docs = Multimodal.withPhashPlants(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")))
    val dir = tmp("srv-phash")
    Multimodal.writePhashIndex(docs, dir)
    val served = Multimodal.phashTopKServeBatch(spark, dir,
      docs.filter(col("doc_id") < 50), excludeSelf = true)
    assert(rows(served) == rows(Multimodal.phashTopK(docs)))
    assert(served.count() > 0)
  }

  test("jaccardTopKServeBatch off the band index == in-query jaccardTopK") {
    val docs = Dedup.withPlants(Tables.documents(spark, sf))
    val dir = tmp("srv-band")
    Dedup.writeBandIndex(docs, dir)
    val served = Dedup.jaccardTopKServeBatch(spark, dir, docs,
      docs.filter(col("doc_id") < 50), excludeSelf = true)
    assert(rows(served) == rows(Dedup.jaccardTopK(docs)))
    assert(served.count() > 0)
  }

  test("serving does NOT self-exclude by default: an off-corpus twin retrieves its source") {
    val docs = Dedup.withPlants(Tables.documents(spark, sf))
    val dir = tmp("srv-noexcl")
    Dedup.writeSimhashIndex(docs, dir)
    // a batch doc whose id COLLIDES with a corpus id but differs in
    // content must still see that corpus doc as a neighbor candidate
    val twin = docs.filter(col("doc_id") === 3L) // same id space on purpose
    val served = Dedup.hammingTopKServeBatch(spark, dir, twin)
    assert(served.filter(col("doc_id") === 3L).count() == 1,
      "default serve dropped the identical-id corpus row")
  }
}
