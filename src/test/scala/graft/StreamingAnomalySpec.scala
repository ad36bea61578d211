package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingAnomaly

/** Streaming hourly-volume anomalies: planted-spike detection, bit-level
  * batch parity, watermark finalization, zero-variance guard. */
class StreamingAnomalySpec extends SparkTestBase {
  import spark.implicits._

  private val hourMs = 3_600_000L

  /** n events inside hour h (epoch hours), spread across the hour. */
  private def hourEvents(h: Long, n: Int): Seq[(Long, Timestamp)] =
    (0 until n).map(i => (h, new Timestamp(h * hourMs + 1_000L + i * 997L)))

  test("streaming hourly anomalies: planted spike flagged, batch z parity, open hour held back") {
    // hours 0-5: quiet baseline ~10/h, hour 3 spikes to 60
    val events = (Seq(0, 1, 2, 4, 5).flatMap(h => hourEvents(h, 10)) ++
      hourEvents(3, 60)) :+ ((99L, new Timestamp(12 * hourMs))) // sentinel
    val batchDf = events.toDF("user_id", "ts")
    val (mean, std) = StreamingAnomaly.hourlyBaseline(batchDf)
    assert(std > 0)

    val input = MemoryStream[(Long, Timestamp)](spark)
    val out = StreamingAnomaly.hourlyAnomalies(
      input.toDF().toDF("user_id", "ts"), mean, std,
      watermarkDelay = "0 seconds")
    input.addData(events: _*)
    val q = out.writeStream
      .format("memory").queryName("graft_stream_anomaly")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("graft_stream_anomaly")
      .select(col("hour").cast("long").as("h"), col("n_events"), col("z"),
        col("is_anomaly"))
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)

    // the sentinel's own hour is still open (watermark = max event time):
    // only hours 0-5 finalized — append mode emitted each exactly once
    assert(got.map(_._1) === Seq(0L, 1L, 2L, 3L, 4L, 5L).map(_ * 3600))
    // the spike and only the spike is flagged
    assert(got.filter(_._4).map(_._1) === Seq(3L * 3600))

    // batch parity, bitwise: the same operator run on the same rows as a
    // plain DataFrame produces the identical finalized hours
    val batch = StreamingAnomaly.hourlyAnomalies(batchDf, mean, std)
      .select(col("hour").cast("long"), col("n_events"), col("z"),
        col("is_anomaly"))
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
      .filter(_._1 < 6L * 3600) // streaming held the open sentinel hour back
    assert(got.toSeq === batch.toSeq)

    // and against the batch-native operator (window-derived stats): same
    // hours, same z bits — hourlyBaseline replayed its IEEE op order
    val native = graft.analytics.Analytics.hourlyAnomalies(batchDf)
      .select(col("hour").cast("long"), col("z"))
      .as[(Long, Double)].collect().toMap
    got.foreach { case (h, _, z, _) => assert(native(h) === z) }
  }

  test("streaming hourly anomalies: zero-std baseline flags nothing") {
    val events = Seq(0, 1, 2).flatMap(h => hourEvents(h.toLong, 7)) :+
      ((99L, new Timestamp(9 * hourMs)))
    val (mean, std) = StreamingAnomaly.hourlyBaseline(
      events.toDF("user_id", "ts").filter(col("user_id") =!= 99))
    assert(std === 0.0) // uniform traffic
    val input = MemoryStream[(Long, Timestamp)](spark)
    val out = StreamingAnomaly.hourlyAnomalies(
      input.toDF().toDF("user_id", "ts"), mean, std,
      watermarkDelay = "0 seconds")
    input.addData(events: _*)
    val q = out.writeStream
      .format("memory").queryName("graft_stream_anomaly_flat")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_stream_anomaly_flat")
      .select(col("z"), col("is_anomaly")).as[(Double, Boolean)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (z, a) => z == 0.0 && !a })
  }
}
