package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.llm.Search

/** Always-on inverted-index ingest with SEGMENTED persistence — the
  * log-structured layout every production search engine uses for exactly
  * this reason: a micro-batch writes ONLY its own postings.
  *
  * ==Why segments, not bucket-partitioned copy-on-write==
  * The r9 form rewrote the ENTIRE merged index per micro-batch — O(corpus)
  * writes per trigger. Partitioning the persisted index by a gram-hash
  * bucket and rewriting "touched buckets" does NOT fix that: gram hashes
  * spread uniformly, so even a small batch's gram set lands in essentially
  * every bucket and the "touched" set is all of them. The write-cost bound
  * the 10-second-trigger regime needs (bytes per batch ∝ batch, not
  * corpus) requires the LSM discipline instead:
  *
  *  - '''ingest''': each batch appends an immutable SEGMENT
  *    (`seg/v=<batchId>/idx` = [[Search.invertedIndexRaw]] over the adds,
  *    plus `…/del` when the batch carries tombstones) — write ∝ batch;
  *  - '''read''' ([[readIndex]]): merge-on-read — the base plus the live
  *    segments fold through ONE [[Search.indexMerge]] (segment gram lists
  *    broadcast; base grams untouched by any segment pass one anti join
  *    unshuffled), then accumulated tombstones subtract via
  *    [[Search.indexDelete]]. Segment count is bounded by `maxSegments`,
  *    so read amplification is bounded;
  *  - '''compaction''': when the live-segment count reaches `maxSegments`,
  *    the merged view is written as a new base — O(corpus), but amortized
  *    over `maxSegments` batches and embarrassingly parallel because the
  *    base is hive-partitioned by a stable gram-hash bucket
  *    (`b = pmod(xxhash64(gram), nBuckets)`, the
  *    [[graft.sources.Artifacts.table]] cell-partition discipline — also
  *    the unit a future per-bucket compactor or pruned gram probe keys
  *    on);
  *  - '''vacuum''' ([[vacuum]]): deletes every state dir the latest
  *    manifest no longer references (superseded bases, compacted
  *    segments, old stats/manifests), bounding disk. Replays stay safe
  *    after a vacuum because an applied batchId is detected by the
  *    `_LATEST` pointer BEFORE any state dir is touched.
  *
  * ==Commit protocol==
  * Per batch: write segment + stats, then `manifest/v=<batchId>` (the
  * base version + live segment list), then atomically advance `_LATEST`
  * ([[StatePointer]]). Readers resolve pointer → manifest → dirs, so they
  * never observe a half-written batch; a crash before the pointer advance
  * replays the batch, which rewrites the same dirs (overwrite) and
  * commits once. Replays of an APPLIED batch are detected by the pointer
  * and SKIPPED — re-merging postings would double df/cf, so the pointer
  * check is the exactly-once mechanism (`foreachBatch`'s batchId
  * contract).
  *
  * ==Erasure==
  * With `deleteCol` set the batch is a change stream in the
  * [[StreamingSnapshot]] full-row-tombstone convention: tombstones CARRY
  * THE DOC TEXT, so their postings re-derive from the tombstone row
  * itself and subtract exactly ([[Search.indexDelete]] ordering).
  * Preconditions: adds are new docs ([[Search.indexMerge]] disjointness),
  * tombstones reference previously-ingested docs, a doc is not added and
  * erased in the same batch, and an erased doc id is not RE-ingested
  * while its tombstone segment is still live (the read view applies all
  * live tombstones after all live adds; compaction folds the tombstone
  * away, after which the id may return).
  *
  * The state is UNRAILED on disk (df rails are a read decision —
  * [[Search.applyRails]]); [[readRailedIndex]] is the consumer form. */
object StreamingIndex {

  val DefaultMaxSegments = 8
  val DefaultBuckets = 32

  import SegmentedState.Manifest

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    StatePointer.read(spark, dir)

  private def readManifest(spark: SparkSession, dir: String, v: Long): Manifest =
    SegmentedState.readManifest(spark, dir, v)

  private def writeManifest(spark: SparkSession, dir: String, v: Long,
      m: Manifest): Unit =
    SegmentedState.writeManifest(spark, dir, v, m)

  /** Assemble the merge-on-read plan for a manifest: base + live segments
    * through one [[Search.indexMerge]], accumulated tombstones subtracted
    * via [[Search.indexDelete]]. Pure plan construction — no action. */
  private def mergedView(spark: SparkSession, dir: String,
      m: Manifest): DataFrame = {
    val segIdx = m.segments.map(v => spark.read.parquet(s"$dir/seg/v=$v/idx"))
    val base = m.base.map(v => spark.read.parquet(s"$dir/base/v=$v").drop("b"))
    val merged = (base, segIdx) match {
      case (Some(b), Nil) => b
      // a single base-less segment is already one row per gram
      // (invertedIndexRaw's contract): the fold is the identity, so the
      // serving view stays a pure file scan until a second batch lands
      case (None, Seq(only)) if m.dels.isEmpty => only
      case (Some(b), segs) => Search.indexMerge(b, segs.reduce(_ unionByName _))
      case (None, segs) if segs.nonEmpty =>
        // indexMerge with an empty old side degenerates to the pure
        // re-aggregation of the segment union — same code path, no
        // special-case aggregation to keep in sync
        Search.indexMerge(segs.head.limit(0), segs.reduce(_ unionByName _))
      case (None, Nil) =>
        throw new IllegalStateException(s"empty manifest at $dir")
    }
    val delSegs = m.segments.filter(m.dels.contains)
      .map(v => spark.read.parquet(s"$dir/seg/v=$v/del"))
    if (delSegs.isEmpty) merged
    else {
      // multiple tombstone segments can touch the same gram: re-aggregate
      // to one row per gram before the broadcast-gated subtract
      // (indexDelete joins per gram — duplicate del rows would fan out)
      val delAgg = delSegs.reduce(_ unionByName _)
        .groupBy(col("gram"))
        .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"),
          sort_array(flatten(collect_list(col("pl")))).as("pl"))
      Search.indexDelete(merged, delAgg)
    }
  }

  /** The current unrailed index (empty-schema error until a batch lands).
    * A merge-on-read view: one broadcast-gated fold over ≤ `maxSegments`
    * live segments — compaction keeps this bounded. */
  def readIndex(spark: SparkSession, dir: String): DataFrame =
    latestVersion(spark, dir) match {
      case Some(v) => mergedView(spark, dir, readManifest(spark, dir, v))
      case None => throw new IllegalStateException(s"no index at $dir yet")
    }

  /** The current stats sidecar (n_docs, sum_dl) — 1 row, folded and
    * rewritten per batch (O(1) state, not worth segmenting). */
  def readStats(spark: SparkSession, dir: String): DataFrame =
    latestVersion(spark, dir) match {
      case Some(v) => spark.read.parquet(s"$dir/stats/v=$v")
      case None => throw new IllegalStateException(s"no stats at $dir yet")
    }

  /** Consumer view: rails applied over the LIVE doc count, the
    * [[Search.applyRails]] read-time contract (minDf, maxDfFrac·n). */
  def readRailedIndex(spark: SparkSession, dir: String, minDf: Long = 2L,
      maxDfFrac: Double = 0.06): DataFrame = {
    val n = readStats(spark, dir).collect().head.getAs[Long]("n_docs")
    Search.applyRails(readIndex(spark, dir), minDf,
      math.floor(maxDfFrac * n).toLong)
  }

  /** Fold one batch into the persisted state (see object doc for the
    * segment/commit/erasure contracts). Public so the batch-parity catalog
    * rows drive the IDENTICAL code `foreachBatch` runs. */
  def applyBatch(batch: DataFrame, dir: String, batchId: Long,
      deleteCol: Option[String] = None,
      maxSegments: Int = DefaultMaxSegments,
      nBuckets: Int = DefaultBuckets): Unit = {
    require(maxSegments >= 1, s"maxSegments must be >= 1: $maxSegments")
    val spark = batch.sparkSession
    latestVersion(spark, dir) match {
      case Some(v) if v >= batchId => () // replay of an applied batch: skip
      case prev =>
        // lazy checkpoints: each side has 2-3 consumers below (segment
        // write, stats fold, emptiness probe) — don't rescan the batch
        val adds = deleteCol.fold(batch)(dc => batch.filter(!col(dc)).drop(dc))
          .localCheckpoint(eager = false)
        val dels = deleteCol.map(dc => batch.filter(col(dc)).drop(dc)
          .localCheckpoint(eager = false))
        // ---- segment write: bytes ∝ batch, never ∝ corpus ----
        Search.invertedIndexRaw(adds)
          .write.mode("overwrite").parquet(s"$dir/seg/v=$batchId/idx")
        val hasDel = dels.exists(d => !d.isEmpty)
        if (hasDel)
          Search.invertedIndexRaw(dels.get)
            .write.mode("overwrite").parquet(s"$dir/seg/v=$batchId/del")
        // ---- stats fold: 1-row sidecar, O(1) per batch ----
        val batchStats = Search.corpusStats(adds)
        val grown = prev match {
          case Some(v) => Search.statsMerge(
            spark.read.parquet(s"$dir/stats/v=$v"), batchStats)
          case None => batchStats
        }
        val stats = if (hasDel)
          Search.statsDelete(grown, Search.corpusStats(dels.get)) else grown
        stats.write.mode("overwrite").parquet(s"$dir/stats/v=$batchId")
        // ---- manifest + (amortized) compaction ----
        val prevM = prev.map(readManifest(spark, dir, _))
          .getOrElse(Manifest(None, Nil, Set.empty))
        val appended = Manifest(prevM.base, prevM.segments :+ batchId,
          if (hasDel) prevM.dels + batchId else prevM.dels)
        val committed =
          if (appended.segments.size < maxSegments) appended
          else {
            mergedView(spark, dir, appended)
              .withColumn("b", pmod(xxhash64(col("gram")), lit(nBuckets.toLong)))
              .write.mode("overwrite").partitionBy("b")
              .parquet(s"$dir/base/v=$batchId")
            Manifest(Some(batchId), Nil, Set.empty)
          }
        writeManifest(spark, dir, batchId, committed)
        StatePointer.advance(spark, dir, batchId)
    }
  }

  /** Out-of-band compaction: fold the live segments (and their
    * tombstones) into a new bucket-partitioned base at the CURRENT
    * version. No-op when no segments are live. Does not advance the
    * pointer — the content is unchanged, only its layout; the manifest
    * rewrite is atomic (temp + rename), so readers see the old or new
    * layout, never a mix. */
  def compact(spark: SparkSession, dir: String,
      nBuckets: Int = DefaultBuckets): Unit =
    latestVersion(spark, dir).foreach { v =>
      val m = readManifest(spark, dir, v)
      if (m.segments.nonEmpty) {
        mergedView(spark, dir, m)
          .withColumn("b", pmod(xxhash64(col("gram")), lit(nBuckets.toLong)))
          .write.mode("overwrite").partitionBy("b")
          .parquet(s"$dir/base/v=$v")
        writeManifest(spark, dir, v, Manifest(Some(v), Nil, Set.empty))
      }
    }

  /** Delete every state dir the `retain` most recent manifests no
    * longer reference (superseded bases, compacted-away segments, stale
    * stats and manifests) — [[SegmentedState.vacuum]] with the stats
    * sidecar included. `retain` > 1 is the concurrent-reader grace
    * window (see that method's doc). */
  def vacuum(spark: SparkSession, dir: String, retain: Int = 1): Unit =
    SegmentedState.vacuum(spark, dir, withStats = true, retain)

  /** Wire a doc (or change) stream to the maintained index. Caller
    * starts/stops the returned writer. `vacuumEvery` > 0 runs [[vacuum]]
    * after every N applied batches — superseded state is reclaimed
    * continuously instead of growing without bound. */
  def writer(docs: DataFrame, dir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      deleteCol: Option[String] = None,
      maxSegments: Int = DefaultMaxSegments,
      nBuckets: Int = DefaultBuckets,
      vacuumEvery: Int = 0): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        applyBatch(df, dir, batchId, deleteCol, maxSegments, nBuckets)
        if (vacuumEvery > 0 && (batchId + 1) % vacuumEvery == 0)
          vacuum(df.sparkSession, dir)
      }
}
