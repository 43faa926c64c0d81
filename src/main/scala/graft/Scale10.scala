package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object Scale10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALE $name rows=$n time=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    // synthesize mult x corpora with disjoint id spaces
    def rep(df: DataFrame, idCols: Seq[String], step: Long): DataFrame =
      (0 until mult).map { i =>
        idCols.foldLeft(df)((x, c) => x.withColumn(c, col(c) + lit(i * step)))
      }.reduce(_ unionByName _).repartition(64)
    val docs = rep(Tables.documents(spark, d), Seq("doc_id"), 1000000L)
    val emb  = rep(Tables.embeddings(spark, d), Seq("vec_id"), 1000000L)
    val li   = rep(Tables.lineitem(spark, d), Seq("l_orderkey"), 100000000L)
    t(s"docs_${mult}x")(docs.count())
    t(s"jaccard_${mult}x")(operators.Dedup.ngramJaccard(docs).count())
    t(s"minhash_${mult}x")(operators.Dedup.minhashCandidates(docs).count())
    t(s"simhash_${mult}x")(operators.Dedup.simhashNearDups(docs).count())
    t(s"embcos_${mult}x")(operators.Dedup.embCosineDups(emb).count())
    t(s"q1_${mult}x")(li.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(Util.sum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n")).count())
    spark.stop()
  }
}
