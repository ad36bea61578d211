package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingDrift

/** Streaming per-hour PSI drift: planted-shift detection, bit-level batch
  * parity, watermark finalization. */
class StreamingDriftSpec extends SparkTestBase {
  import spark.implicits._

  private val hourMs = 3_600_000L

  /** n events inside hour h with the given value. */
  private def hourEvents(h: Long, n: Int, v: Double): Seq[(Timestamp, Double)] =
    (0 until n).map(i => (new Timestamp(h * hourMs + 1_000L + i * 997L), v))

  test("streaming PSI: planted band shift flagged, batch parity, open hour held back") {
    // baseline history: values uniform over bands 0..3
    val history = (0 until 400).map(i =>
      (new Timestamp(1_000L + i), (i % 4) * 50.0 + 5.0)).toDF("ts", "value")
    val base = StreamingDrift.bandBaseline(history, binWidth = 50.0)
    assert(base.map(_._1) === Seq(0L, 1L, 2L, 3L))

    // live hours 0-2 match the baseline mix; hour 3 collapses to band 0
    val stable = (0L to 2L).flatMap(h =>
      (0 until 4).flatMap(b => hourEvents(h, 10, b * 50.0 + 5.0)))
    val shifted = hourEvents(3L, 40, 5.0)
    val sentinel = Seq((new Timestamp(10 * hourMs), 5.0))
    val events = stable ++ shifted ++ sentinel

    val input = MemoryStream[(Timestamp, Double)](spark)
    val out = StreamingDrift.hourlyPsi(
      input.toDF().toDF("ts", "value"), base, binWidth = 50.0,
      watermarkDelay = "0 seconds")
    input.addData(events: _*)
    val q = out.writeStream
      .format("memory").queryName("graft_stream_drift")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("graft_stream_drift")
      .select(col("hour").cast("long").as("h"), col("n_inband"),
        col("psi"), col("drifted"))
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)

    // sentinel hour still open: exactly hours 0-3 finalized
    assert(got.map(_._1) === Seq(0L, 1L, 2L, 3L).map(_ * 3600))
    // only the collapsed hour drifts; stable hours sit near zero
    assert(got.filter(_._4).map(_._1) === Seq(3L * 3600))
    assert(got.filter(!_._4).forall(_._3 < 0.05), got.mkString(","))

    // batch parity, bitwise: same operator, same rows, batch DataFrame
    val batch = StreamingDrift.hourlyPsi(
        events.toDF("ts", "value"), base, binWidth = 50.0)
      .select(col("hour").cast("long").as("h"), col("n_inband"),
        col("psi"), col("drifted"))
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
      .filter(_._1 < 4L * 3600)
    assert(got.toSeq === batch.toSeq)
  }
}
