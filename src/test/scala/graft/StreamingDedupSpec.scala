package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.llm.Dedup
import graft.streaming.StreamingDedup

/** Streaming near-dup maintenance: MemoryStream micro-batches folded
  * through the segmented band/shingle state + sliver labels must be
  * INDISTINGUISHABLE from a batch rebuild over the live corpus, replays
  * must be pointer-skipped (the label fold is non-idempotent), and
  * erasure must re-stitch touched components (splits included). */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  // three near-dup families (shared 9-word template, one distinct tail
  // token ⇒ pairwise Jaccard ≈ 0.7 ≥ 0.6) + singletons, spread so every
  // batch carries members of some family
  private val tmpl = (1 to 9).map(i => s"base$i").mkString(" ")
  private val all = (0L until 24L).map { i =>
    if (i % 4 == 3) (i, s"completely unrelated content $i " +
      s"with different words ${i * 31} and more filler tokens here")
    else (i, s"$tmpl family${i / 8}")
  }

  private def rebuildLabels(rows: Seq[(Long, String)]) =
    Dedup.clusters(Dedup.minhashNearDups(
        rows.toDF("doc_id", "text"), threshold = 0.6))
      .orderBy($"doc_id").collect().toSeq

  test("streamed labels equal the batch rebuild; replay pointer-skipped") {
    val dir = java.nio.file.Files.createTempDirectory("sdedup").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sdedupckpt").toString
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDF().toDF("doc_id", "text")
    val (b0, b1) = all.splitAt(12)

    input.addData(b0: _*)
    val q1 = StreamingDedup.writer(docs, dir, ckpt,
      trigger = Trigger.AvailableNow()).start()
    q1.processAllAvailable(); q1.stop()
    input.addData(b1: _*)
    val q2 = StreamingDedup.writer(docs, dir, ckpt,
      trigger = Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()

    assert(StreamingDedup.readLabels(spark, dir).orderBy($"doc_id")
      .collect().toSeq === rebuildLabels(all))
    assert(StreamingDedup.latestVersion(spark, dir) === Some(1L))

    // replay of an applied batch: the non-idempotent label fold is
    // guarded by the pointer — state unchanged
    StreamingDedup.applyBatch(b1.toDF("doc_id", "text"), dir, batchId = 1L)
    assert(StreamingDedup.readLabels(spark, dir).orderBy($"doc_id")
      .collect().toSeq === rebuildLabels(all))
  }

  test("erase then RE-INGEST of the same doc id: version-ordered erasure lets later batches pair against the returned doc") {
    val dir = java.nio.file.Files.createTempDirectory("sdedupre").toString
    // batch 0: first half; batch 1: TOMBSTONE-ONLY erase of doc 1;
    // batch 2: doc 1 returns with NEW text (a fresh family); batch 3: a
    // brand-new doc that near-dups ONLY the returned text — its pair is
    // discoverable solely through the view, so a wrong kill of the
    // re-ingested bands/shingles (the pre-r10 all-tombstones anti join)
    // would leave both docs singletons and the labels would diverge
    val returnedText = s"$tmpl family9"
    val batches = Seq(
      all.take(12).map { case (i, t) => (i, t, false) },
      all.filter(_._1 == 1L).map { case (i, t) => (i, t, true) },
      Seq((1L, returnedText, false)),
      Seq((100L, returnedText, false)))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingDedup.applyBatch(b.toDF("doc_id", "text", "_deleted"), dir,
        i.toLong, deleteCol = Some("_deleted"))
    }
    val fin = all.take(12).filterNot(_._1 == 1L) ++
      Seq((1L, returnedText), (100L, returnedText))
    def got() = StreamingDedup.readLabels(spark, dir).orderBy($"doc_id")
      .collect().toSeq
    assert(got() === rebuildLabels(fin))
    // the returned doc's artifact rows survive the still-live tombstone
    assert(StreamingDedup.readShingles(spark, dir)
      .filter($"id" === 1L).count() === 1L)
    // compaction folds the tombstone away; labels and views unchanged
    StreamingDedup.compact(spark, dir)
    assert(got() === rebuildLabels(fin))
    assert(StreamingDedup.readShingles(spark, dir)
      .filter($"id" === 1L).count() === 1L)
  }

  test("erasure re-stitches touched components; compaction + vacuum keep the views intact") {
    val dir = java.nio.file.Files.createTempDirectory("sdedupdel").toString
    val doomed = Set(1L, 9L) // one member of each of two families
    val changes = Seq(
      all.take(12).map { case (i, t) => (i, t, false) },            // batch 0
      all.drop(12).map { case (i, t) => (i, t, false) } ++          // batch 1:
        all.take(12).filter(d => doomed(d._1))                      //  + erase
          .map { case (i, t) => (i, t, true) })
    changes.zipWithIndex.foreach { case (b, i) =>
      StreamingDedup.applyBatch(b.toDF("doc_id", "text", "_deleted"), dir,
        i.toLong, deleteCol = Some("_deleted"), maxSegments = 2)
    }
    val survivors = all.filterNot(d => doomed(d._1))
    assert(StreamingDedup.readLabels(spark, dir).orderBy($"doc_id")
      .collect().toSeq === rebuildLabels(survivors))
    // maxSegments=2 forced compaction at batch 1: the views serve from
    // the bucketed base, tombstones folded away
    assert(new java.io.File(s"$dir/base/v=1/bands").exists())
    assert(StreamingDedup.readBands(spark, dir)
      .filter($"id".isin(doomed.toSeq: _*)).count() === 0L)

    StreamingDedup.vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/seg/v=0").exists())
    assert(!new java.io.File(s"$dir/labels/v=0").exists())
    assert(StreamingDedup.readLabels(spark, dir).orderBy($"doc_id")
      .collect().toSeq === rebuildLabels(survivors))
    // replay of the LATEST applied id after vacuum: skipped before any
    // state dir is touched (the one id foreachBatch actually re-delivers)
    StreamingDedup.applyBatch(
      changes(1).toDF("doc_id", "text", "_deleted"), dir, 1L,
      deleteCol = Some("_deleted"))
    assert(StreamingDedup.readLabels(spark, dir).orderBy($"doc_id")
      .collect().toSeq === rebuildLabels(survivors))
    // an id strictly BEHIND the pointer is a fresh-checkpoint-over-
    // existing-state mismatch, not a replay: throws (tightened
    // replayCheck; deterministic re-drives go through Redrive)
    intercept[IllegalStateException] {
      StreamingDedup.applyBatch(
        changes(0).toDF("doc_id", "text", "_deleted"), dir, 0L,
        deleteCol = Some("_deleted"))
    }
  }
}
