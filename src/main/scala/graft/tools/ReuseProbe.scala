package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Ad-hoc probe (not part of the driver contract). Measures whether the
  * hourly-anomaly plan scans events once or twice. Finding that shaped the
  * operator: the agg-then-cross-join form does NOT get exchange reuse
  * across the broadcast boundary (2 parquet scans, 0 ReusedExchange), so
  * `hourlyAnomalies` uses a global window over the calendar-bounded hourly
  * aggregate instead — this probe should now report parquetScans=1. */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    // default: the original hourly-anomaly probe; arg(0): any catalog query
    val df = if (args.nonEmpty) graft.SparkEntry.queries(args(0))(spark, dir)
      else graft.analytics.Analytics.hourlyAnomalies(
        graft.sources.Tables.load(spark, dir, "events"))
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    val executed = df.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(df.queryExecution.executedPlan)
    val s = executed.toString
    val reused = s.linesIterator.count(_.contains("ReusedExchange"))
    val reusedStage = s.linesIterator.count(l =>
      l.contains("ReusedQueryStage") || l.contains("ReusedSubquery"))
    val scans = s.linesIterator.count(_.contains("Scan parquet"))
    Thread.sleep(1500) // let the listener bus drain
    println(s"[reuse] ReusedExchange=$reused reusedStages=$reusedStage " +
      s"parquetScans=$scans bytesRead=${bytesRead.get()}")
    if (sys.env.contains("SPARK_GRAFT_DUMP_PLAN")) println(s)
  }
}
