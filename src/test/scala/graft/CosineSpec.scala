package graft

import graft.functions.CosineSimilarity
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class CosineSpec extends SparkSpec {

  test("native expression matches the HOF formulation on real vectors") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val pairs = e.as("a").crossJoin(e.as("b"))
      .select(
        CosineSimilarity.cosineSim(col("a.embedding"), col("b.embedding")).as("native"),
        Similarity.cosineD(col("a.embedding"), col("b.embedding")).as("hof"))
      .collect()
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("self-similarity is 1") {
    val e = Tables.embeddings(spark, sf).limit(10)
    e.select(CosineSimilarity.cosineSim(col("embedding"), col("embedding")).as("c"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("SQL registration works") {
    CosineSimilarity.register(spark)
    Tables.embeddings(spark, sf).limit(5).createOrReplaceTempView("emb_t")
    val rows = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_t").collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("mismatched lengths yield NaN") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val v = df.select(CosineSimilarity.cosineSim(col("a"), col("b"))).collect().head.getDouble(0)
    assert(v.isNaN)
  }
}
