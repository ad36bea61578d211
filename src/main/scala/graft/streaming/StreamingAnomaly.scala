package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming form of [[graft.analytics.Analytics.hourlyAnomalies]]: flag
  * hourly-volume z-score outliers on a live event stream, emitting each
  * hour exactly once when the event-time watermark passes it — the alerting
  * contract an ops monitor actually wants (no provisional rows, no
  * retractions, append-mode sink compatible).
  *
  * The batch operator scores each hour against the WHOLE range's
  * mean/std — a stream cannot see the future half of that range, so the
  * baseline here is an explicit (mean, std) pair supplied by the caller
  * and refreshed periodically from the batch path over history (the same
  * split as [[StreamingCuration]]: heavy corpus-wide statistics stay
  * batch, the stream applies them with bounded state). State is one count
  * per open hour window — calendar-bounded, evicted by the watermark.
  *
  * The z expression is the batch operator's, applied to literals: one
  * IEEE subtract and divide per hour on an exact integer count, so a
  * streaming hour and a batch hour with the same baseline score
  * bit-identically (spec-pinned). The zero/negative-std guard mirrors the
  * batch operator's zero-variance guard: z = 0, nothing flagged. */
object StreamingAnomaly {

  /** events (needs event-time `tsCol`) → (hour, n_events, z, is_anomaly).
    * Works unchanged on a batch DataFrame — batch parity is the point:
    * the catalog/oracle row runs THIS code path in batch mode. */
  def hourlyAnomalies(events: DataFrame, baselineMean: Double,
      baselineStd: Double, zThreshold: Double = 2.0,
      watermarkDelay: String = "2 hours", tsCol: String = "ts"): DataFrame = {
    val z =
      if (baselineStd > 0)
        (col("n_events").cast("double") - lit(baselineMean)) / lit(baselineStd)
      else lit(0.0)
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("hour"), col("n_events"),
        z.as("z"), (abs(z) > zThreshold).as("is_anomaly"))
  }

  /** Baseline trainer for [[hourlyAnomalies]]: (mean, std) of the hourly
    * counts over a history table, with the EXACT operation order of the
    * batch operator and its oracle (mean = s/n, msq = sq/n, var = msq −
    * mean², std = √var — each a single IEEE op over exact integer sums),
    * so the literals fed to the stream reproduce batch z bit-for-bit.
    * One driver action over a calendar-bounded aggregate (≤ 8 760
    * rows/year cross the shuffle — same shape as the batch operator). */
  def hourlyBaseline(events: DataFrame, tsCol: String = "ts"): (Double, Double) = {
    val r = events
      .groupBy(date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("nh"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("sq"))
      .head()
    val nh = r.getLong(0).toDouble
    val mean = r.getLong(1).toDouble / nh
    val msq = r.getLong(2).toDouble / nh
    val variance = msq - mean * mean
    (mean, if (variance > 0) math.sqrt(variance) else 0.0)
  }
}
