package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition of the graph-ANN rows (round-14 regression hunt):
  * times buildGraph alone, the walk over a materialized graph, and the
  * full panel, so the inherited q_knn_graph slowdown can be attributed
  * to a phase instead of guessed at. */
object ProbeG {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probeg] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (p <- 1 to 2) {
      t(s"p$p build_noop") {
        graft.llm.GraphAnn.buildGraph(emb, m = 16, lshBits = 4, probes = 2)
          .write.format("noop").mode("overwrite").save()
      }
      val g = graft.llm.GraphAnn
        .buildGraph(emb, m = 16, lshBits = 4, probes = 2)
        .localCheckpoint(eager = true)
      t(s"p$p search_on_checkpointed") {
        graft.llm.GraphAnn.search(emb, g, col("vec_id") < 10, k = 5,
            ef = 96, iters = 5, entries = 24)
          .write.format("noop").mode("overwrite").save()
      }
      t(s"p$p panel_on_checkpointed") {
        graft.llm.GraphAnn.knnRecallPanel(emb, g, col("vec_id") < 10,
            k = 5, ef = 96, iters = 5, entries = 24, recallBound = 0.7)
          .write.format("noop").mode("overwrite").save()
      }
      t(s"p$p full_row_inline") {
        graft.llm.GraphAnn.knnRecallPanel(emb,
            graft.llm.GraphAnn.buildGraph(emb, m = 16, lshBits = 4,
              probes = 2),
            col("vec_id") < 10, k = 5, ef = 96, iters = 5, entries = 24,
            recallBound = 0.7)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
