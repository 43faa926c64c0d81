package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        val flags = Seq(
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "SortMergeJoin" -> plan.contains("SortMergeJoin"),
          "nExchanges=" + plan.sliding(9).count(_ == "Exchange ")
            -> true
        ).collect { case (f, true) => f }
        println(s"AUDIT $name: ${flags.mkString(", ")}")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
