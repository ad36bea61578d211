package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the MinHash signature-agreement deviation from exact Jaccard
  * backing q_minhash_est's bound choice (unblocked pair frame). */
object MhProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = graft.sources.Tables.load(spark, s"/root/testdata/$sf", "documents")
        .repartition(8).withColumn("_all", lit(1))
      for (th <- Seq(0.2, 0.3)) {
        val n = graft.llm.Dedup.minhashEstimateContract(docs, blockCol = "_all",
          threshold = th, bound = 0.0).count()
        val bad = Seq(0.1, 0.15, 0.2).map(b =>
          graft.llm.Dedup.minhashEstimateContract(docs, blockCol = "_all",
            threshold = th, bound = b).filter(!col("est_close")).count())
        println(s"MH $sf th=$th pairs=$n violations@0.1/0.15/0.2=${bad.mkString("/")}")
      }
    }
    spark.stop()
  }
}
