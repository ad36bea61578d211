package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.analytics.Analytics

/** Continuously-maintained SCD2 history: each micro-batch of change
  * events folds into the type-2 dimension table via
  * [[Analytics.scd2Apply]] inside `foreachBatch` — the history-keeping
  * twin of [[StreamingSnapshot]] (which keeps latest-state). Storage
  * follows the same copy-on-write contract: a new `v=<batchId>`
  * directory per batch plus a `_LATEST` pointer, replays detected by the
  * pointer. Unlike the snapshot, a re-MERGE after a half-committed batch
  * is NOT idempotent (versions would re-increment), so the pointer check
  * is the correctness guard here, not just an optimization — which is
  * exactly why both live behind the same pointer discipline.
  *
  * Micro-batch watermark ordering gives scd2Apply its strictly-newer
  * precondition for free in event-time-ordered sources; out-of-order
  * stragglers fail the operator's rail rather than corrupting history.
  *
  * Scale shape per batch: the history bulk passes one broadcast
  * anti-join (untouched keys), only the batch is windowed — O(batch +
  * touched) regardless of history size. */
object StreamingScd2 {

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    StatePointer.read(spark, dir)

  def readHistory(spark: SparkSession, dir: String): DataFrame =
    latestVersion(spark, dir) match {
      case Some(v) => spark.read.parquet(s"$dir/v=$v")
      case None => throw new IllegalStateException(s"no history at $dir yet")
    }

  /** Reclaim superseded `v=<batchId>` dirs (everything but the committed
    * version). The SCD2 fold is sequential and non-idempotent, so its
    * state stays copy-on-write (unlike [[StreamingSnapshot]]'s segmented
    * MoR — a history table is append-mostly and typically compacted into
    * date-partitioned archives downstream); the vacuum is what keeps the
    * copy-on-write discipline from growing disk without bound. Safe
    * against replays: an applied batchId is pointer-skipped before any
    * state dir is touched. */
  def vacuum(spark: SparkSession, dir: String): Unit =
    latestVersion(spark, dir).foreach { v =>
      SegmentedState.vacuumVersioned(spark, dir, Seq(""), Set(v))
    }

  private[graft] def applyBatch(df: DataFrame, dir: String, keyCol: String,
      tsCol: String, stateCol: String, tieCol: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    latestVersion(spark, dir) match {
      case Some(v) if v >= batchId => () // replay of an applied batch
      case prev =>
        val next = prev match {
          case Some(v) => Analytics.scd2Apply(
            spark.read.parquet(s"$dir/v=$v"), df,
            keyCol, tsCol, stateCol, tieCol)
          case None => Analytics.scd2History(df, keyCol, tsCol, stateCol, tieCol)
        }
        next.write.mode("overwrite").parquet(s"$dir/v=$batchId")
        StatePointer.advance(spark, dir, batchId)
    }
  }

  /** Wire a change-event stream to the maintained history. Caller
    * starts/stops the returned writer. */
  def writer(events: DataFrame, dir: String, checkpointDir: String,
      keyCol: String = "user_id", tsCol: String = "ts",
      stateCol: String = "event_type", tieCol: String = "event_id",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      vacuumEvery: Int = 0): DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        applyBatch(df, dir, keyCol, tsCol, stateCol, tieCol, batchId)
        if (vacuumEvery > 0 && (batchId + 1) % vacuumEvery == 0)
          vacuum(df.sparkSession, dir)
      }
}
