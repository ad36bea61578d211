package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scratch probe: does ReusedExchange fire for tf ⋈ agg(tf) — with and
  * without an upstream round-robin repartition? (Not driver contract.) */
object ReuseScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    for ((label, docs, withCf) <- Seq(
        ("plain+cf", base, true),
        ("plain-nocf", base, false))) {
      bytesRead.set(0)
      val tf = docs
        .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
        .groupBy(col("t"), col("doc_id")).agg(count(lit(1)).as("tf"))
      val dfp = (if (withCf)
          tf.groupBy(col("t")).agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
        else tf.groupBy(col("t")).agg(count(lit(1)).as("df")))
        .filter(col("df") > 1)
      val j = tf.join(dfp.hint("shuffle_merge"), Seq("t"))
      j.write.format("noop").mode("overwrite").save()
      val executed = j.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(j.queryExecution.executedPlan)
      val s = executed.toString
      val stageIds = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(s).map(_.group(1)).toList
      Thread.sleep(1500) // let the listener bus drain
      println(s"[scratch:$label] reused=${s.linesIterator.count(_.contains("Reused"))} " +
        s"scans=${s.linesIterator.count(_.contains("Scan parquet"))} stages=$stageIds " +
        s"bytesRead=${bytesRead.get()}")
    }
    spark.stop()
  }
}
