package graft.tools
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc: round/job accounting inside the incremental stitch loop (not
  * part of the driver contract). */
object StitchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    })
    def j[T](tag: String)(f: => T): T = {
      Thread.sleep(150); jobs.set(0); val t0 = System.nanoTime()
      val r = f
      Thread.sleep(150)
      println(f"[stitch] $tag jobs=${jobs.get} ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.1",
      "embeddings").repartition(8)
    val corpus = emb.filter(col("vec_id") % 10 =!= 9)
    val batch = emb.filter(col("vec_id") % 10 === 9)
    val labels = graft.llm.Dedup.clusters(
      graft.llm.Similarity.cosinePairsBlocked(corpus, "label", 0.4))
    labels.write.mode("overwrite").parquet("/tmp/stitch_labels")
    val newPairs = graft.llm.Similarity.cosinePairsIncremental(
      corpus, batch, "label", 0.4)
    newPairs.write.mode("overwrite").parquet("/tmp/stitch_pairs")
    val L = spark.read.parquet("/tmp/stitch_labels")
    val P = spark.read.parquet("/tmp/stitch_pairs")
    println(s"[stitch] labels=${L.count()} pairs=${P.count()}")

    // replicate clustersIncremental phase by phase
    val ends = j("ends")(P.select(col("id_a").as("__eid"))
      .unionByName(P.select(col("id_b").as("__eid"))).distinct()
      .localCheckpoint(eager = true))
    val endMap = j("endMap")(ends
      .join(L, col("doc_id") === col("__eid"), "left")
      .select(col("__eid"), coalesce(col("cluster_id"), col("__eid")).as("__cn"),
        col("cluster_id").isNotNull.as("__lab"))
      .localCheckpoint(eager = true))
    val contracted = j("contract")(P
      .join(endMap.select(col("__eid").as("__ea"), col("__cn").as("__ca")),
        col("id_a") === col("__ea"))
      .join(endMap.select(col("__eid").as("__eb"), col("__cn").as("__cb")),
        col("id_b") === col("__eb"))
      .select(col("__ca").as("id_a"), col("__cb").as("id_b"))
      .localCheckpoint(eager = true))
    println(s"[stitch] contracted pairs=${contracted.count()} " +
      s"nodes=${contracted.select(col("id_a").as("n")).unionByName(contracted.select(col("id_b").as("n"))).distinct().count()}")
    val cl = j("clusters(contracted)")(
      graft.llm.Dedup.clusters(contracted).write.format("noop").mode("overwrite").save())
    val full = j("clustersIncremental(total)")(
      graft.llm.Dedup.clustersIncremental(L, P).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
