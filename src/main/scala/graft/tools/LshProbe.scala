package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Ad-hoc diagnostics for the LSH-kNN recall contract (not part of the
  * driver contract): measures realized per-query recall across SFs and
  * (m, probes) so the published `recallBound` carries real margin. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = graft.sources.Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      val exact = Similarity.bruteForceKnn(emb, col("vec_id") < 10, k = 5)
        .select(col("qid"), col("neighbor_id"))
      for ((m, probes) <- Seq((4, 0), (4, 4), (6, 6), (8, 8))) {
        val approx = Similarity.lshKnn(emb, col("vec_id") < 10, k = 5,
            m = m, probes = probes)
          .select(col("qid"), col("neighbor_id"))
        val perQ = exact.join(approx.withColumnRenamed("neighbor_id", "nid"),
            exact("qid") === approx("qid") &&
              col("neighbor_id") === col("nid"), "left_semi")
          .groupBy("qid").count().collect().map(r => r.getLong(1)).sorted
        val nQ = exact.select("qid").distinct().count()
        val minR = if (perQ.length < nQ) 0L else perQ.min
        println(s"$sf m=$m probes=$probes: per-query hits=${perQ.mkString(",")} " +
          s"(nq=$nQ) min=$minR/5")
      }
    }
    spark.stop()
  }
}
