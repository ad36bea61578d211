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
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "events")
    val df = graft.analytics.Analytics.hourlyAnomalies(events)
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    val executed = df.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(df.queryExecution.executedPlan)
    val s = executed.toString
    val reused = s.linesIterator.count(_.contains("ReusedExchange"))
    val scans = s.linesIterator.count(_.contains("Scan parquet"))
    println(s"[reuse] ReusedExchange=$reused parquetScans=$scans")
  }
}
