package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B of the round-14 local-beam walk vs the distributed
  * walk (LocalWalkCap = 0 forces the old path) in ONE JVM — the
  * host-noise-proof comparison the drifting build host demands. Times
  * the serve-side walk and the full panel over a parquet graph (the
  * prebuilt-row shape). */
object WalkAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .localCheckpoint(eager = true)
    val tmp = java.nio.file.Files.createTempDirectory("walkab").toString
    graft.llm.GraphAnn.buildGraph(emb, m = 16, lshBits = 4, probes = 2)
      .repartition(col("b"))
      .write.mode("overwrite").partitionBy("b").parquet(tmp)
    val graph = spark.read.parquet(tmp)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def t(tag: String)(f: => Unit): Unit = {
      jobs.set(0)
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[walkab] $tag $dt%.2fs jobs=${jobs.get}")
    }
    val defCap = graft.llm.GraphAnn.LocalWalkCap
    for (s <- 1 to 4; mode <- Seq("dist", "local")) {
      graft.llm.GraphAnn.LocalWalkCap = if (mode == "local") defCap else 0
      t(s"s$s walk_$mode") {
        graft.llm.GraphAnn.search(emb, graph, col("vec_id") < 10, k = 5,
            ef = 96, iters = 5, entries = 24)
          .write.format("noop").mode("overwrite").save()
      }
      t(s"s$s panel_$mode") {
        graft.llm.GraphAnn.knnRecallPanel(emb, graph, col("vec_id") < 10,
            k = 5, ef = 96, iters = 5, entries = 24, recallBound = 0.7)
          .write.format("noop").mode("overwrite").save()
      }
    }
    graft.llm.GraphAnn.LocalWalkCap = defCap
    spark.stop()
  }
}
