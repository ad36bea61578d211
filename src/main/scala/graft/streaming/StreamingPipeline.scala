package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.etl.EventEtl
import graft.sink.AmplitudeSink

/** Structured-Streaming form of the reference daemon
  * (`synchronous-pull.js:23-105`): an unbounded envelope stream, the O2→O10
  * chain per micro-batch, watermark-bounded insert_id dedup, and the
  * Amplitude sink inside `foreachBatch` with checkpoint commit as the ack.
  *
  * Mapping (SURVEY.md §3.1):
  *   - pull loop            → micro-batch trigger (`maxFilesPerTrigger` /
  *     `Trigger.ProcessingTime` plays MAX_EVENTS_PER_BATCH's role)
  *   - transform chain      → [[EventEtl.parsed]]/[[EventEtl.flatten]]
  *   - Amplitude dedup      → `dropDuplicatesWithinWatermark("insert_id")`,
  *     applied at MESSAGE level (pre-split) so identify records are neither
  *     duplicated nor wrongly conflated; watermark-bounded state, never the
  *     unbounded batch `dropDuplicates` (SURVEY.md §7.4.5)
  *   - send + retry         → [[AmplitudeSink.send]] in `foreachBatch`; a
  *     terminal failure fails the batch, no checkpoint commit, redelivery —
  *     the reference's no-ack-on-failure path (`synchronous-pull.js:83-86`)
  *   - ack                  → checkpoint offset commit after `foreachBatch`
  *   - batch metrics (O14)  → `observe()` counters surfaced through
  *     `StreamingQueryProgress.observedMetrics`
  */
object StreamingPipeline {

  /** Raw envelope stream from a directory of text files (one base64 envelope
    * per line) — the harness stand-in for a Pub/Sub/Kafka source; swap
    * `format` for kafka in production (the chain is source-agnostic). */
  def readEnvelopes(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.format("text")
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.load(dir).withColumnRenamed("value", "value")
  }

  /** The full transform: parse → watermarked message-level dedup → flatten.
    * `publish_time` (RFC-3339 text) supplies event time for the watermark.
    * The parse stage carries `observe("parse", ...)` counters — the
    * engine form of the reference's per-record error logs
    * (`amplitude.validation.error`, `utils.js:66`; silent O6 drops):
    * input/invalid/repaired counts surface per micro-batch through
    * `StreamingQueryProgress.observedMetrics("parse")`. */
  def transform(raw: DataFrame, hmacKey: String,
      watermarkDelay: String = "1 hour", dedup: Boolean = true): DataFrame = {
    val parsed = EventEtl.parsed(raw, hmacKey)
      .observe("parse",
        count(lit(1)).as("input_count"),
        sum(when(!col("valid"), 1L).otherwise(0L)).as("invalid_count"),
        sum(when(col("valid") && col("session_repaired"), 1L).otherwise(0L))
          .as("repaired_count"))
      .withColumn("publish_ts",
        coalesce(to_timestamp(col("publish_time")), current_timestamp()))
    val deduped =
      if (dedup)
        parsed.withWatermark("publish_ts", watermarkDelay)
          .dropDuplicatesWithinWatermark("insert_id")
      else parsed
    EventEtl.flatten(deduped.drop("publish_ts"))
  }

  /** Wire the stream to the Amplitude sink with per-batch metrics logging
    * (O11/O14). Caller starts/stops the returned writer. */
  def writer(flat: DataFrame, cfg: AmplitudeSink.Config,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): DataStreamWriter[org.apache.spark.sql.Row] = {
    val observed = flat.observe("batch",
      count(lit(1)).as("output_count"),
      min(col("publish_time")).as("min_publish_time"),
      max(col("publish_time")).as("max_publish_time"))
    observed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        AmplitudeSink.send(df, cfg)
        () // commit happens after this returns — the ack analog
      }
  }
}
