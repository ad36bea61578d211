package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming form of [[graft.llm.Drift.psi]]: per-hour Population
  * Stability Index of the event `value` band distribution against a
  * trained baseline, emitted exactly once per hour as the event-time
  * watermark passes — the live "did this feed's distribution move?"
  * monitor next to [[StreamingAnomaly]]'s volume z-score.
  *
  * Same batch/stream split as [[StreamingAnomaly]]: the baseline band
  * distribution is heavy corpus-wide state, so it trains batch-side
  * ([[bandBaseline]], the exact op order of the batch operator's oracle)
  * and rides into the stream as LITERALS. The per-hour band histogram is
  * then ONE streaming aggregation — conditional counts over the bounded
  * baseline band set — so the query stays append-mode legal (no chained
  * stateful operators), and the PSI fold over bands is compile-time
  * unrolled into exact integer adds of nano-floored summands: a streaming
  * hour and a batch hour with the same baseline score bit-identically.
  * State per open hour is one row of |bands|+1 longs, watermark-evicted. */
object StreamingDrift {

  /** Baseline trainer: the banded `valueCol` distribution over a history
    * table, band-ascending. One driver action over ≤ range/binWidth
    * grouped rows. */
  def bandBaseline(events: DataFrame, binWidth: Double,
      valueCol: String = "value"): Seq[(Long, Long)] =
    events
      .groupBy(floor(col(valueCol) / binWidth).cast("long").as("band"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("band"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  /** events (event-time `tsCol`) → (hour, n_inband, psi, drifted). PSI is
    * computed over the BASELINE's band set (Laplace(+1) smoothing keeps
    * hour-empty bands finite; `n_inband` counts only in-band events so p
    * normalizes over the same support as q). Works unchanged on a batch
    * DataFrame — the catalog/oracle row runs THIS code path in batch. */
  def hourlyPsi(events: DataFrame, baseline: Seq[(Long, Long)],
      binWidth: Double, psiThreshold: Double = 0.25,
      watermarkDelay: String = "2 hours", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(baseline.nonEmpty, "empty baseline")
    val nTot = baseline.map(_._2).sum
    val nBands = baseline.size
    val band = floor(col(valueCol) / binWidth).cast("long")
    val aggs = baseline.map { case (b, _) =>
      sum(when(band === b, 1L).otherwise(0L)).as(s"c_$b") }
    val hist = events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 hour").as("w"))
      .agg(aggs.head, aggs.tail: _*)
    val nInband = baseline.map { case (b, _) => col(s"c_$b") }.reduce(_ + _)
    val withN = hist.withColumn("n_inband", nInband)
    val contribs = baseline.map { case (b, bc) =>
      val p = (col(s"c_$b") + 1).cast("double") /
        (col("n_inband") + lit(nBands)).cast("double")
      // q: the SAME single IEEE division the batch oracle runs
      val q = lit((bc + 1).toDouble / (nTot + nBands).toDouble)
      floor((p - q) * log(p / q) * lit(1e9)).cast("long")
    }
    val psiNano = contribs.reduce(_ + _)
    withN.select(col("w.start").as("hour"), col("n_inband"),
      (psiNano.cast("double") / 1e9).as("psi"),
      (psiNano.cast("double") / 1e9 > psiThreshold).as("drifted"))
  }
}
