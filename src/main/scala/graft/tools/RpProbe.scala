package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the JL-prefilter shortlist recall backing q_knn_rp's
  * recallBound choice (candidates-deep shortlist survival of the exact
  * top-k), at both SFs and several kOut settings. */
object RpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = graft.sources.Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      for (kOut <- Seq(16, 32)) {
        val bounds = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)
        val passed = bounds.takeWhile { b =>
          graft.llm.Similarity.rpKnnRecallPanel(emb, col("vec_id") < 10,
            k = 5, kOut = kOut, candidates = 50, recallBound = b)
            .collect().head.getBoolean(1)
        }
        println(s"RP $sf kOut=$kOut shortlist-recall >= ${passed.lastOption.getOrElse(0.0)}")
      }
    }
    spark.stop()
  }
}
// sf0.1 checked via RpProbe2 (4x corpus, same panel)
object RpProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    for (b <- Seq(0.3, 0.4, 0.5, 0.6)) {
      val ok = graft.llm.Similarity.rpKnnRecallPanel(emb, col("vec_id") < 10,
        k = 5, kOut = 32, candidates = 50, recallBound = b)
        .collect().head.getBoolean(1)
      println(s"RP sf0.1 kOut=32 bound=$b -> $ok")
    }
    spark.stop()
  }
}
