package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and optionally time)
  * of one SparkEntry query. Usage: runMain graft.Explain <name> <sfDir> [time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (args.length > 2) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"rows=$n time=${(System.nanoTime() - t0) / 1e9}s")
      println("== Final adaptive plan ==")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
