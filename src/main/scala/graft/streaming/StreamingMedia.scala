package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.llm.Multimodal

/** Always-on MEDIA FEATURES maintenance: a media (or change) stream folds
  * into a persisted per-media feature artifact under the
  * [[StatePointer]]/[[SegmentedState]] discipline — the streaming form of
  * `q_media_neardup_incr`'s features artifact, giving the multimodal
  * family the same always-on ingest story as text near-dup
  * ([[StreamingDedup]]), ANN ([[StreamingIvf]]), and retrieval
  * ([[StreamingIndex]]).
  *
  * The expensive step in a multimodal pipeline is the DECODE. Per batch,
  * ONLY the adds pass the codec boundary ([[Multimodal.extractFeatures]] —
  * scan-side, one codec per task, media bytes never shuffle) and land as
  * an immutable `seg/v=<id>/feat` segment (bytes ∝ batch, and ~10³×
  * smaller than the media). Tombstone id lists ride `seg/v=<id>/del` —
  * features are a per-media row artifact with nothing to decrement, so
  * erasure IS the version-ordered anti join ([[SegmentedState.rowView]]),
  * and erase → re-ingest churn is correct by the same rule. At
  * `maxSegments` the view compacts into `base/v=<id>/feat` hive-bucketed
  * by a media-id hash (clustered write — one file per bucket); minor
  * folds concatenate the del-less tail run without touching the base.
  * Replays are pointer-skipped before any state dir is touched.
  *
  * Serving: [[nearDups]] runs the band → cap → verify tail
  * ([[Multimodal.dedupNearFromFeatures]]) over the merge-on-read view —
  * near-dup over the maintained state never re-reads, re-decodes, or
  * shuffles any media. `q_media_neardup_stream` pins streamed ≡ the
  * inline build's oracle VERBATIM; `q_media_neardup_erasure` pins the
  * survivors contract. */
object StreamingMedia {

  val DefaultMaxSegments = 8
  val DefaultBuckets = 32

  import SegmentedState.Manifest

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    StatePointer.read(spark, dir)

  private def manifest(spark: SparkSession, dir: String): Manifest =
    latestVersion(spark, dir) match {
      case Some(v) => SegmentedState.readManifest(spark, dir, v)
      case None =>
        throw new IllegalStateException(s"no media state at $dir yet")
    }

  /** The maintained (media_id, features) view over the live corpus. */
  def readFeatures(spark: SparkSession, dir: String): DataFrame =
    SegmentedState.rowView(spark, dir, manifest(spark, dir), "feat",
      "media_id", baseDrop = Seq("b"))

  /** Perceptual near-dup pairs over the maintained state — zero media
    * access ([[Multimodal.dedupNearFromFeatures]]). */
  def nearDups(spark: SparkSession, dir: String,
      threshold: Double = 0.9995, dim: Int = 16, bandCoords: Int = 4,
      quantLevels: Int = 256, maxBucket: Int = 4096): DataFrame =
    Multimodal.dedupNearFromFeatures(readFeatures(spark, dir), threshold,
      dim, bandCoords, quantLevels, maxBucket)

  /** Probe a NEW batch against the maintained state without folding it —
    * the [[Multimodal.dedupNearIncremental]] ingest check, reading the
    * corpus side from the maintained features. */
  def probeBatch(spark: SparkSession, dir: String, newMedia: DataFrame,
      threshold: Double = 0.9995, dim: Int = 16,
      codec: Multimodal.MediaCodec = Multimodal.FakeCodec): DataFrame =
    Multimodal.dedupNearIncremental(newMedia, readFeatures(spark, dir),
      threshold, dim, codec = codec)

  /** Fold one batch (optionally a change stream with tombstones under
    * `deleteCol`; tombstone rows need only media_id — they are never
    * decoded) into the persisted feature state. Public so batch-parity
    * catalog rows drive the IDENTICAL code the writer runs. */
  def applyBatch(batch: DataFrame, dir: String, batchId: Long,
      deleteCol: Option[String] = None,
      maxSegments: Int = DefaultMaxSegments,
      nBuckets: Int = DefaultBuckets, dim: Int = 16,
      codec: Multimodal.MediaCodec = Multimodal.FakeCodec,
      majorRatio: Double = StreamingIndex.DefaultMajorRatio): Unit = {
    require(maxSegments >= 1, s"maxSegments must be >= 1: $maxSegments")
    val spark = batch.sparkSession
    latestVersion(spark, dir) match {
      case Some(v) if v >= batchId => // applied or pointer mismatch
        StatePointer.replayCheck(spark, dir, batchId)
      case prev =>
        val adds = deleteCol.fold(batch)(dc => batch.filter(!col(dc)).drop(dc))
        val delIds = deleteCol.map(dc => batch.filter(col(dc))
          .select(col("media_id").as("id")).localCheckpoint(eager = false))
        // ---- segment write: the batch is DECODED here, once ----
        Multimodal.extractFeatures(adds, dim, codec)
          .select(col("media_id"), col("features"))
          .write.mode("overwrite").parquet(s"$dir/seg/v=$batchId/feat")
        val hasDel = delIds.exists(d => !d.isEmpty)
        if (hasDel)
          delIds.get.write.mode("overwrite").parquet(s"$dir/seg/v=$batchId/del")
        // ---- manifest + (amortized) compaction ----
        val prevM = prev.map(SegmentedState.readManifest(spark, dir, _))
          .getOrElse(Manifest(None, Nil, Set.empty))
        val appended = Manifest(prevM.base, prevM.segments :+ batchId,
          if (hasDel) prevM.dels + batchId else prevM.dels)
        val committed =
          if (appended.segments.size < maxSegments) appended
          else SegmentedState.minorPlan(spark, dir, appended, majorRatio) match {
            case None => compactTo(spark, dir, appended, batchId, nBuckets)
              Manifest(Some(batchId), Nil, Set.empty)
            case Some(tailRun) =>
              // MINOR: per-row artifact — pure concat of the del-less
              // tail run; versions bump to batchId, which stays ordered
              // against every tombstone
              SegmentedState.swapIn(tailRun
                .map(v => spark.read.parquet(s"$dir/seg/v=$v/feat"))
                .reduce(_ unionByName _),
                dir, batchId, "feat")
              SegmentedState.afterMinor(appended, tailRun, batchId)
          }
        SegmentedState.writeManifest(spark, dir, batchId, committed)
        StatePointer.advance(spark, dir, batchId)
    }
  }

  private def compactTo(spark: SparkSession, dir: String, m: Manifest,
      v: Long, nBuckets: Int): Unit =
    SegmentedState.writePartitioned(
      SegmentedState.rowView(spark, dir, m, "feat", "media_id",
          baseDrop = Seq("b"))
        .withColumn("b", pmod(xxhash64(col("media_id")), lit(nBuckets.toLong))),
      s"$dir/base/v=$v/feat", Seq("b"))

  /** Out-of-band compaction at the current version (no-op without
    * segments); content-identical, manifest rewrite atomic. */
  def compact(spark: SparkSession, dir: String,
      nBuckets: Int = DefaultBuckets): Unit =
    latestVersion(spark, dir).foreach { v =>
      val m = SegmentedState.readManifest(spark, dir, v)
      if (m.segments.nonEmpty) {
        compactTo(spark, dir, m, v, nBuckets)
        SegmentedState.writeManifest(spark, dir, v,
          Manifest(Some(v), Nil, Set.empty))
      }
    }

  /** Reclaim superseded segments/bases/manifests; `retain` > 1 =
    * concurrent-reader grace window ([[SegmentedState.vacuum]]). */
  def vacuum(spark: SparkSession, dir: String, retain: Int = 1): Unit =
    SegmentedState.vacuum(spark, dir, withStats = false, retain)

  /** Wire a media (or change) stream to the maintained feature state. */
  def writer(media: DataFrame, dir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      deleteCol: Option[String] = None,
      maxSegments: Int = DefaultMaxSegments,
      nBuckets: Int = DefaultBuckets,
      vacuumEvery: Int = 0,
      majorRatio: Double = StreamingIndex.DefaultMajorRatio): DataStreamWriter[org.apache.spark.sql.Row] =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        applyBatch(df, dir, batchId, deleteCol, maxSegments, nBuckets,
          majorRatio = majorRatio)
        if (vacuumEvery > 0 && (batchId + 1) % vacuumEvery == 0)
          vacuum(df.sparkSession, dir)
      }
}
