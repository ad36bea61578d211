package graft.tools
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc job-count diagnostics for the clustering loop (not part of the
  * driver contract): iterate-on-DataFrame queries are job-count-bound, so
  * the scheduled-job total IS the cost model locally. */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    def measure(tag: String)(f: => Unit): Unit = {
      Thread.sleep(200); jobs.set(0)
      val t0 = System.nanoTime(); f
      Thread.sleep(200) // listener delivery lag
      println(f"[jobs] $tag n=${jobs.get} ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (p <- 1 to 2) {
      measure(s"p$p q_curation_neardup")(
        graft.llm.Curation.curateNearDup(docs).write
          .format("noop").mode("overwrite").save())
      measure(s"p$p q_dedup_clusters")(
        graft.llm.Dedup.clusters(
          graft.llm.Dedup.minhashNearDups(docs, threshold = 0.6)).write
          .format("noop").mode("overwrite").save())
    }

    // q_embed_centroids_incr probe breakdown at sf0.1, artifacts prebuilt
    // (the bench steady state): which stage owns the jobs/time
    sys.props("graft.artifact.dir") = "/root/repo/target/probe_artifacts"
    graft.sources.Artifacts.wipe()
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.1",
      "embeddings").repartition(spark.sparkContext.defaultParallelism)
    val corpus = emb.filter(col("vec_id") % 10 =!= 9)
    val batch = emb.filter(col("vec_id") % 10 === 9)
    def oldLabels = graft.sources.Artifacts.table(spark, "centroids_incr_labels")(
      graft.llm.Dedup.clusters(
        graft.llm.Similarity.cosinePairsBlocked(corpus, "label", 0.4)))
    def oldSums = graft.sources.Artifacts.table(spark, "centroids_incr_sums")(
      graft.llm.Similarity.clusterCentroidSums(corpus, oldLabels))
    measure("build artifacts")(oldSums.write.format("noop").mode("overwrite").save())
    for (p <- 1 to 2) {
      measure(s"p$p pairs_incr")(
        graft.llm.Similarity.cosinePairsIncremental(corpus, batch, "label", 0.4)
          .write.format("noop").mode("overwrite").save())
      measure(s"p$p clusters_incr") {
        val newPairs = graft.llm.Similarity.cosinePairsIncremental(
          corpus, batch, "label", 0.4)
        graft.llm.Dedup.clustersIncremental(oldLabels, newPairs)
          .write.format("noop").mode("overwrite").save()
      }
      measure(s"p$p full_probe") {
        val newPairs = graft.llm.Similarity.cosinePairsIncremental(
          corpus, batch, "label", 0.4)
        graft.llm.Similarity.clusterCentroidsIncremental(
            emb, oldLabels, oldSums, newPairs)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
