package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.llm.{Curation, Decontam, TextAnalysis}

/** The ALWAYS-ON release composition: the full curate → exact-dedup →
  * near-dedup → decontaminate pipeline maintained incrementally inside
  * `foreachBatch`, so a nightly ingest updates dedup state, decontam
  * verdicts, and the clean-corpus membership with per-batch cost ∝ batch
  * — the streaming form of [[graft.llm.Curation.releasePipeline]], whose
  * oracle the served snapshot shares VERBATIM (it runs the literal
  * [[graft.llm.Curation.releaseTail]] over the maintained clean set).
  * Every STAGE already had a maintained form ([[StreamingDedup]],
  * [[StreamingIndex]], static-benchmark decontam); this is the
  * composition — where the stage-boundary bug class lives (the wrong
  * corpus feeding the dedup fold, a displaced survivor leaking into the
  * labels), so it gets its own state machine and oracle row.
  *
  * ==State layout (under `dir/`)==
  *  - `docs/v=<b>` — the batch's GATED docs (language + quality pass)
  *    with their per-doc decontam verdict (the verdict depends only on
  *    the doc text and the static benchmark, so it is batch-local
  *    forever); append-only segments, bytes ∝ batch.
  *  - `exact/v=<b>` — the batch's (text_hash, min id) aggregation;
  *    the exact-survivor of a hash is the fold MIN over segments, so a
  *    segment append IS the maintenance (no rewrite).
  *  - `dedup/` — a full [[StreamingDedup]] state dir holding bands /
  *    shingles / pairs / labels over the CURRENT EXACT SURVIVORS (the
  *    corpus [[graft.llm.Curation.curateNearDup]] hands to LSH).
  *  - `_LATEST.v=<b>` — the root pointer ([[StatePointer]]); sub-state
  *    writes land BEFORE it advances, and each is itself
  *    replay-idempotent (overwrite segments; the dedup fold has its own
  *    pointer), so a crash-replay of the root batch is safe.
  *
  * ==The displacement rule (the composition's one subtle edge)==
  * Exact dedup keeps the MIN id per text hash, and the minimum can
  * arrive LATE: a batch carrying (id 5, text T) when the state's
  * survivor of hash(T) is id 100 must (a) hand id 5 to the dedup fold as
  * an add, and (b) TOMBSTONE id 100 out of it — otherwise the near-dup
  * corpus diverges from "the exact survivors" and labels stop matching
  * the batch rebuild. The tombstone needs the displaced doc's text to
  * re-derive its bands — which is the batch doc's own text (same hash ⇒
  * same text), so displacement never reads old state rows. Batch docs
  * whose hash already has a ≤ id survivor never enter the dedup fold at
  * all.
  *
  * ==Per-batch cost at 100 TB==
  * The batch aggregates to its own hash set; the pre-batch survivor
  * lookup semi-joins the exact segments against the BROADCAST batch-hash
  * set (state files are scanned but only matched rows shuffle — the
  * `q_dedup_incr_prebuilt` zero-corpus-exchange shape); the dedup fold
  * is [[StreamingDedup]]'s own O(batch + candidates) probe; decontam
  * broadcasts the static benchmark gram set into the batch scan. Nothing
  * corpus-sized shuffles on ingest. The SNAPSHOT tail (vocab / tokenize /
  * pack / manifest) is the release's inherently-global step and runs at
  * serve time over the maintained clean set — exactly the cost the batch
  * row pays, minus re-running curation/dedup/decontam over history. */
object StreamingRelease {

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    StatePointer.read(spark, dir)

  /** Fold one change batch (docs with `idCol`, `textCol`, lang, source;
    * rows with `deleteCol` = true are full-row ERASURE tombstones of
    * previously-ingested doc ids — the StreamingIndex change-stream
    * contract, and an erased id may not re-ingest) into the maintained
    * release state. Public so the batch-parity catalog rows drive the
    * IDENTICAL code the writer runs.
    *
    * The exact state keeps ALL gated (hash, id) pairs (not per-batch
    * minima): erasing the current survivor of a hash must RESTORE the
    * next-smallest live copy, which per-batch minima cannot name. The
    * dedup fold then maintains the survivor DELTA per affected hash —
    * pre ≠ post ⇒ tombstone pre / ingest post, with the text recovered
    * from the batch rows themselves (same hash ⇒ same text, for adds,
    * displacements, AND restorations — the fold never reads old state
    * rows). Erasure here is SERVING-side (del lists anti-join every
    * view; the inner dedup state physically scrubs via its own
    * segmented compaction); physically scrubbing the docs segments is
    * the per-family vacuum discipline and deliberately out of scope of
    * this composition row. */
  def applyBatch(batch: DataFrame, benchmark: DataFrame, dir: String,
      batchId: Long, lang: String = "en", minQuality: Double = 0.5,
      nearThreshold: Double = 0.6, gramN: Int = 5,
      contamThreshold: Double = 0.3, deleteCol: Option[String] = None,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    latestVersion(spark, dir) match {
      case Some(v) if v >= batchId =>
        StatePointer.replayCheck(spark, dir, batchId)
      case prev =>
        val addRows = deleteCol.fold(batch)(dc => batch.filter(!col(dc)).drop(dc))
        val delRows = deleteCol.map(dc => batch.filter(col(dc)).drop(dc)
            .select(col(idCol), md5(col(textCol)).as("h"),
              col(textCol).as("text"))
            .localCheckpoint(eager = false)) // ids + hashes + fold texts
        // language + quality gate, scan-side (the curate() projection)
        val gated = addRows.select(
            col(idCol), col(textCol), col("lang"), col("source"),
            TextAnalysis.langId(col(textCol)).as("__lp"),
            TextAnalysis.qualityScore(col(textCol)).as("__q"))
          .filter(col("__lp") === lang && col("__q") >= minQuality)
          .drop("__lp", "__q")
          .localCheckpoint(eager = false) // docs seg + pairs + fold text
        // batch-local decontam verdict vs the STATIC benchmark — stored
        // with the doc, never recomputed
        val flagged = gated.join(
          Decontam.contamination(gated, benchmark, gramN, contamThreshold,
              idCol, textCol)
            .select(col(idCol), col("contaminated")),
          Seq(idCol))
        flagged.write.mode("overwrite").parquet(s"$dir/docs/v=$batchId")
        val batchPairs = gated
          .select(md5(col(textCol)).as("h"), col(idCol).as("id"))
          .localCheckpoint(eager = false) // probe + seg write
        // hashes whose survivor can change: the batch's and the erasures'
        val affected = batchPairs.select(col("h"))
          .unionByName(delRows.fold(batchPairs.select(col("h")).limit(0))(
            _.select(col("h"))))
          .distinct()
          .localCheckpoint(eager = false) // pre + post probes
        val delNow = delRows.map(_.select(col(idCol).as("id")))
        // prior state restricted to the affected hashes (broadcast
        // semi-join — state files scan, only matches shuffle), erased
        // ids folded out (del lists are erasure requests: tiny, broadcast)
        val prevLive = prev match {
          case None => batchPairs.limit(0)
          case Some(p) =>
            val pairs = spark.read
              .parquet((0L to p).map(i => s"$dir/exact/v=$i"): _*)
              .join(broadcast(affected), Seq("h"), "left_semi")
            val priorDel = spark.read
              .parquet((0L to p).map(i => s"$dir/del/v=$i"): _*)
            pairs.join(broadcast(priorDel), Seq("id"), "left_anti")
        }
        val pre = prevLive.groupBy(col("h")).agg(min(col("id")).as("pre"))
        val postPairs = prevLive.unionByName(batchPairs)
        val post = delNow.fold(postPairs)(d =>
            postPairs.join(broadcast(d), Seq("id"), "left_anti"))
          .groupBy(col("h")).agg(min(col("id")).as("post"))
        // any row of a hash carries ITS text — batch rows for adds and
        // displacements, the tombstone row itself for restorations
        val textOf = gated.select(md5(col(textCol)).as("h"),
            col(textCol).as("text"))
          .unionByName(delRows.fold(
            gated.select(md5(col(textCol)).as("h"), col(textCol).as("text"))
              .limit(0))(_.select(col("h"), col("text"))))
          .groupBy(col("h")).agg(min(col("text")).as("text"))
        val delta = pre.join(post, Seq("h"), "full_outer")
          .filter(!(col("pre") <=> col("post")))
          .join(textOf, Seq("h"))
          .localCheckpoint(eager = false) // feeds adds AND tombstones
        val adds = delta.filter(col("post").isNotNull)
          .select(col("post").as(idCol), col("text").as(textCol))
          .withColumn("_deleted", lit(false))
        val tombs = delta.filter(col("pre").isNotNull)
          .select(col("pre").as(idCol), col("text").as(textCol))
          .withColumn("_deleted", lit(true))
        StreamingDedup.applyBatch(adds.unionByName(tombs), s"$dir/dedup",
          batchId, deleteCol = Some("_deleted"), threshold = nearThreshold,
          idCol = idCol, textCol = textCol)
        batchPairs.write.mode("overwrite").parquet(s"$dir/exact/v=$batchId")
        delNow.getOrElse(batchPairs.select(col("id")).limit(0))
          .write.mode("overwrite").parquet(s"$dir/del/v=$batchId")
        StatePointer.advance(spark, dir, batchId)
    }
  }

  /** The maintained CLEAN corpus (exact-survivor ∧ near-dup-canonical ∧
    * not-contaminated docs) — the frame the batch pipeline calls
    * `clean`. */
  def readClean(spark: SparkSession, dir: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val v = latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no release state at $dir yet"))
    val erased = spark.read
      .parquet((0L to v).map(i => s"$dir/del/v=$i"): _*)
    val survivors = spark.read
      .parquet((0L to v).map(i => s"$dir/exact/v=$i"): _*)
      .join(broadcast(erased), Seq("id"), "left_anti")
      .groupBy(col("h")).agg(min(col("id")).as(idCol))
      .select(col(idCol))
    val nonCanonical = StreamingDedup.readLabels(spark, s"$dir/dedup")
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    spark.read.parquet((0L to v).map(i => s"$dir/docs/v=$i"): _*)
      .filter(!col("contaminated")).drop("contaminated")
      .join(survivors, Seq(idCol), "left_semi")
      .join(nonCanonical, Seq(idCol), "left_anti")
  }

  /** Serve the release snapshot — the LITERAL
    * [[graft.llm.Curation.releaseTail]] over [[readClean]], so the output
    * shares `q_release_pipeline`'s oracle verbatim when the folded stream
    * carried the same corpus. */
  def snapshot(spark: SparkSession, dir: String, budget: Long = 4096L,
      vocabK: Int = 20, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    Curation.releaseTail(readClean(spark, dir, idCol, textCol), budget,
      vocabK, idCol, textCol)

  /** Reclaim superseded versions of the inner dedup state. The release's
    * own segments (docs/exact) are append-only slices, never superseded —
    * there is nothing to vacuum above the dedup dir. */
  def vacuum(spark: SparkSession, dir: String, retain: Int = 1): Unit =
    StreamingDedup.vacuum(spark, s"$dir/dedup", retain)

  /** `writeStream.foreachBatch` driver — production form of the catalog
    * row's batch-parity drive. */
  def writer(docs: DataFrame, benchmark: DataFrame, dir: String,
      checkpointDir: String, lang: String = "en", minQuality: Double = 0.5,
      nearThreshold: Double = 0.6, gramN: Int = 5,
      contamThreshold: Double = 0.3, deleteCol: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime("1 minute")): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, benchmark, dir, id, lang, minQuality, nearThreshold,
          gramN, contamThreshold, deleteCol)
      }
}
