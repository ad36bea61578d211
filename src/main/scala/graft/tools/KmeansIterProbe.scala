package graft.tools
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc k-means evidence (not part of the driver contract): the catalog
  * row `q_kmeans` publishes a driver-side codebook (its final plan is one
  * LocalTableScan), so the scale claims live in the PER-ITERATION job —
  * this probe prints that job's formatted plan (scan-side argmin
  * assignment, map-side partial (cell, dim) micro-sums, no corpus-wide
  * window or join) and measures that training runs a CONSTANT number of
  * Spark jobs per iteration (2 under AQE: the shuffle query stage + the
  * final collect stage) plus one bounded init collect — the driver-side
  * cost is O(iters), independent of corpus size. */
object KmeansIterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")

    // the per-iteration update frame, as trainModel builds it
    val centers = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .orderBy(col("vec_id")).limit(8)
      .collect().map(_.getSeq[Double](1).toArray)
    val upd = emb
      .select(graft.llm.Kmeans.cellOf("embedding", centers).as("cell"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x").cast("double") * 1e6)).as("s"))
    println("==== kmeans per-iteration update job")
    upd.explain("formatted")

    // job-count check: init collect + one job per iteration
    val jobs = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    // listener delivery is async: wait for the count to go STABLE rather
    // than a fixed sleep (a loaded host can deliver events late, bleeding
    // a previous run's jobs into the next count)
    def settle(): Int = {
      var prev = -1
      while (jobs.get != prev) { prev = jobs.get; Thread.sleep(300) }
      prev
    }
    for (iters <- Seq(1, 3, 5)) {
      settle(); jobs.set(0)
      graft.llm.Kmeans.trainModel(emb, k = 8, iters = iters)
      val n = settle()
      println(s"[jobs] kmeans iters=$iters jobs=$n (expect ${2 * iters + 1})")
    }
    spark.stop()
  }
}
