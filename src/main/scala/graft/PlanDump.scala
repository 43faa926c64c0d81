package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `.explain("formatted")` output for a list of
  * queries into `<outDir>/<name>_<suffix>.txt` — one JVM for the
  * whole list (graft.Explain pays a session per query). Queries with
  * internal eager checkpoints execute those at construction; the
  * resulting `Scan ExistingRDD` leaves in the plan are the expected
  * signature of the checkpoint, not an artifact of this tool.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <sfDir> <q1> [q2 ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val suffix = args(1); val sfDir = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      println(s"dumped $n")
    }
    spark.stop()
  }
}
