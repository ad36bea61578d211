package graft.tools
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-row optimization probe (round 14): run named catalog rows under the
  * bench's exact session shape and report wall time, scheduled-job count,
  * stage/task counts and shuffle/input byte totals per pass — the
  * measure-first loop of the optimization guide (§1) without paying for a
  * full bench run.
  *
  * Usage: runMain graft.tools.RowProbe <sfDir> <row1,row2,...> [passes]
  * Honors SPARK_GRAFT_CPUS (default 32, the bench shape) and persists
  * artifacts exactly like Bench so pass >= 2 measures the steady state.
  */
object RowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rows = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q_knn_graph"))
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.props("graft.artifact.dir") =
      sys.env.getOrElse("SPARK_GRAFT_ARTIFACT_DIR",
        "/root/repo/target/probe_artifacts")
    graft.sources.Artifacts.wipe()
    val jobs = new AtomicInteger()
    val stages = new AtomicInteger()
    val tasks = new AtomicInteger()
    val shufW = new AtomicLong()
    val shufR = new AtomicLong()
    val input = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          input.addAndGet(m.inputMetrics.bytesRead)
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    for (p <- 1 to passes; name <- rows) {
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0)
      shufW.set(0); shufR.set(0); input.set(0)
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case t: Throwable =>
        println(s"[rowprobe] p$p $name FAILED: ${t.getMessage}")
        throw t }
      finally graft.ops.Prefix.releaseAll()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener delivery lag
      println(f"[rowprobe] p$p $name%-28s ${dt}%7.2fs jobs=${jobs.get}%-4d " +
        f"stages=${stages.get}%-4d tasks=${tasks.get}%-5d " +
        f"shufW=${shufW.get / 1024}%dKB shufR=${shufR.get / 1024}%dKB " +
        f"input=${input.get / 1024}%dKB")
    }
    spark.stop()
  }
}
