package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CellProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = graft.sources.Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      val n = emb.count()
      val k = graft.llm.Similarity.autoCellCount(n, 1024L)
      val cb = graft.llm.Kmeans.codebook(spark,
        graft.llm.Kmeans.trainModel(emb, k, 3))
      val sizes = graft.llm.Similarity.assignToCentroids(emb, cb)
        .groupBy(col("cluster_id")).count()
        .agg(min("count"), max("count"), avg("count")).head()
      println(s"[cells] $sf n=$n k=$k min=${sizes.get(0)} max=${sizes.get(1)} avg=${sizes.get(2)}")
    }
    spark.stop()
  }
}
