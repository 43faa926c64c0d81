package graft

import graft.plans.RewriteDotProduct
import org.apache.spark.sql.functions._

class RewriteDotProductSpec extends SparkSpec {

  private def hofDot = aggregate(
    zip_with(col("a.embedding"), col("b.embedding"),
      (x, y) => x.cast("double") * y.cast("double")),
    lit(0.0), (acc, v) => acc + v)

  test("rule rewrites the HOF dot-product tree to native DotProduct") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteDotProduct
    try {
      val e = Tables.embeddings(spark, sf).limit(20)
      val df = e.as("a").crossJoin(e.as("b")).select(hofDot.as("dot"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dotproduct") || optimized.contains("DotProduct"),
        s"rule did not fire:\n${optimized.take(400)}")

      // bit-equality vs the interpreted HOF evaluation (rule off)
      val native = df.collect().map(_.getDouble(0))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteDotProduct)
      val plain = df.collect().map(_.getDouble(0))
      assert(native.sameElements(plain))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteDotProduct)
    }
  }
}
