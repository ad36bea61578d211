package graft.tools
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job call-site trace of a catalog row (round-14 job-floor audit):
  * prints every scheduled job's call site so a row's job budget can be
  * attributed to operators instead of guessed at.
  *
  * Usage: runMain graft.tools.JobTrace <sfDir> <row> [passes] */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val row = args.lift(1).getOrElse("q_release_pipeline")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.props("graft.artifact.dir") =
      sys.env.getOrElse("SPARK_GRAFT_ARTIFACT_DIR",
        "/root/repo/target/probe_artifacts")
    graft.sources.Artifacts.wipe()
    val n = new AtomicInteger()
    @volatile var trace = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
              if trace =>
            println(s"[jobtrace] EXEC ${s.executionId} desc=${s.description.takeWhile(_ != '\n')}")
          case _ =>
        }
    })
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = if (trace) {
        val i = n.incrementAndGet()
        val site = Option(s.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        val desc = Option(s.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        // the result stage's details carry the full call-site stack: pull
        // the first graft frames so the job attributes to an operator
        val all = s.stageInfos.flatMap(_.details.split('\n')).map(_.trim)
        val graftF = all.filter(l => l.contains("graft.") &&
          !l.contains("graft.tools")).take(2).mkString(" <- ")
        val frames = if (graftF.nonEmpty) graftF
          else all.take(2).mkString(" <- ")
        // jobs of one action share the SQL execution id — group by it to
        // count actions vs AQE/broadcast sub-jobs
        val exec = Option(s.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .getOrElse("-")
        val snames = s.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ")
        println(f"[jobtrace] job$i%-4d exec=$exec%-5s stages=${s.stageInfos.size}%-3d $site $desc $frames STG[$snames]")
      }
    })
    val fn = graft.SparkEntry.queries(row)
    for (p <- 1 to passes) {
      n.set(0)
      trace = p == passes // trace only the steady-state pass
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      finally graft.ops.Prefix.releaseAll()
      println(f"[jobtrace] pass $p $row ${(System.nanoTime() - t0) / 1e9}%.2fs jobs=${n.get}")
      Thread.sleep(300)
    }
    spark.stop()
  }
}
