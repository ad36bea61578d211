package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.sources.Merge

/** Continuously-maintained snapshot table: a stream of change rows
  * (inserts, full-row updates, `_deleted` tombstones) folded into a
  * parquet snapshot via [[Merge.upsert]] inside `foreachBatch` — the
  * streaming CDC consumer that keeps a queryable "latest state" table,
  * pairing with [[graft.analytics.Analytics.scd2Apply]] (which keeps the
  * history). This is copy-on-write without a table-format transaction
  * log: each micro-batch writes a NEW `v=<batchId>` directory and then
  * advances a `_LATEST` pointer — readers never observe a half-written
  * snapshot (the [[graft.sources.Io.compactParquet]] new-directory rule).
  *
  * Exactly-once without sink transactions: replays are detected by the
  * pointer (`_LATEST == batchId` ⇒ already applied, skip), and even a
  * replay that re-merges is IDEMPOTENT — re-upserting a batch into the
  * post-batch snapshot rewrites identical rows, re-deletes absent keys,
  * and re-inserts present ones as same-value updates.
  *
  * At 100 TB the full rewrite per batch becomes partition-pruned: derive
  * touched partitions from the batch's keys and rewrite only those
  * ([[graft.sources.Io.overwritePartitions]]), or keep the snapshot
  * bucketed so the anti-join is co-located. The merge plan itself is
  * already the steady-state shape — the snapshot bulk passes one
  * broadcast anti-join and never shuffles. */
object StreamingSnapshot {

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    StatePointer.read(spark, dir)

  /** The current snapshot (empty until the first batch commits). */
  def readSnapshot(spark: SparkSession, dir: String): DataFrame =
    latestVersion(spark, dir) match {
      case Some(v) => spark.read.parquet(s"$dir/v=$v")
      case None => throw new IllegalStateException(s"no snapshot at $dir yet")
    }

  private[graft] def applyBatch(df: DataFrame, dir: String,
      keyCols: Seq[String], deleteCol: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    latestVersion(spark, dir) match {
      case Some(v) if v >= batchId => () // replay of an applied batch: skip
      case prev =>
        val snapshot = prev match {
          case Some(v) => spark.read.parquet(s"$dir/v=$v")
          case None => df.drop(deleteCol).limit(0) // empty, schema-typed
        }
        Merge.upsert(snapshot, df, keyCols, deleteCol)
          .write.mode("overwrite").parquet(s"$dir/v=$batchId")
        StatePointer.advance(spark, dir, batchId)
    }
  }

  /** Wire a change stream to the maintained snapshot. Caller starts/stops
    * the returned writer. */
  def writer(changes: DataFrame, dir: String, keyCols: Seq[String],
      checkpointDir: String, deleteCol: String = "_deleted",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        applyBatch(df, dir, keyCols, deleteCol, batchId)
      }
}
