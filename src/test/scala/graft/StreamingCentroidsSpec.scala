package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.llm.{Dedup, Similarity}
import graft.streaming.StreamingCentroids

/** Streaming centroid maintenance: MemoryStream micro-batches folded into
  * the (labels, sums, pairs, corpus-view) state must serve centroids
  * INDISTINGUISHABLE from the batch recompute over the live corpus;
  * erasure re-stitches touched components and recomputes their sums from
  * the surviving sliver; replays are pointer-skipped. */
class StreamingCentroidsSpec extends SparkTestBase {
  import spark.implicits._

  // two blocks; within block 0 two tight families (cos ≥ 0.4 within a
  // family, < 0.4 across via near-orthogonal directions), block 1 noise
  private def vec(i: Long): Array[Double] = {
    val fam = (i % 8) match {
      case 0 | 1 | 2 => Array(1.0, 0.05 * i.toDouble % 1, 0.0, 0.0)
      case 3 | 4 => Array(0.0, 0.0, 1.0, 0.03 * (i % 5).toDouble)
      case _ => Array(0.3 + 0.01 * (i % 7), 0.1, 0.05 * (i % 3), 0.9)
    }
    fam
  }
  private val all = (0L until 24L).map(i => (i, (i % 2), vec(i)))

  private def rebuild(rows: Seq[(Long, Long, Array[Double])]) = {
    val emb = rows.toDF("vec_id", "label", "embedding")
    Similarity.clusterCentroids(emb,
        Similarity.cosinePairsBlocked(emb, "label", 0.4))
      .orderBy($"cluster_id", $"dim").collect().toSeq
  }

  test("streamed centroids equal the batch recompute; replay pointer-skipped") {
    val dir = java.nio.file.Files.createTempDirectory("scent").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scentckpt").toString
    val input = MemoryStream[(Long, Long, Array[Double])](spark)
    val emb = input.toDF().toDF("vec_id", "label", "embedding")
    val (b0, b1) = all.splitAt(12)

    input.addData(b0: _*)
    val q1 = StreamingCentroids.writer(emb, dir, ckpt,
      trigger = Trigger.AvailableNow()).start()
    q1.processAllAvailable(); q1.stop()
    input.addData(b1: _*)
    val q2 = StreamingCentroids.writer(emb, dir, ckpt,
      trigger = Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()

    assert(StreamingCentroids.readCentroids(spark, dir)
      .orderBy($"cluster_id", $"dim").collect().toSeq === rebuild(all))
    // replay: the sums fold is non-idempotent — pointer is the guard
    StreamingCentroids.applyBatch(
      b1.toDF("vec_id", "label", "embedding"), dir, batchId = 1L)
    assert(StreamingCentroids.readCentroids(spark, dir)
      .orderBy($"cluster_id", $"dim").collect().toSeq === rebuild(all))
  }

  test("erase then RE-INGEST of the same vec id: version-ordered erasure lets later batches pair against the returned vector") {
    val dir = java.nio.file.Files.createTempDirectory("scentre").toString
    // batch 0: first half; batch 1: TOMBSTONE-ONLY erase of vec 1;
    // batch 2: vec 1 returns pointing in a NEW direction; batch 3: a
    // fresh vector near the returned one (same block) — the pair is
    // discoverable solely through the corpus view, so a wrong kill of
    // the re-ingested row (the pre-r10 all-tombstones anti join) would
    // lose it and the served centroids would diverge from the rebuild
    val returned = (1L, 1L, Array(0.0, 1.0, 0.0, 0.0))
    val friend = (101L, 1L, Array(0.0, 0.98, 0.02, 0.0))
    val batches = Seq(
      all.take(12).map { case (i, l, v) => (i, l, v, false) },
      all.filter(_._1 == 1L).map { case (i, l, v) => (i, l, v, true) },
      Seq((returned._1, returned._2, returned._3, false)),
      Seq((friend._1, friend._2, friend._3, false)))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingCentroids.applyBatch(
        b.toDF("vec_id", "label", "embedding", "_deleted"), dir, i.toLong,
        deleteCol = Some("_deleted"))
    }
    val fin = all.take(12).filterNot(_._1 == 1L) ++ Seq(returned, friend)
    assert(StreamingCentroids.readCentroids(spark, dir)
      .orderBy($"cluster_id", $"dim").collect().toSeq === rebuild(fin))
    // the returned vector survives the still-live tombstone in the view
    assert(StreamingCentroids.readEmbeddings(spark, dir)
      .filter($"vec_id" === 1L).count() === 1L)
  }

  test("erasure recomputes touched components from the surviving sliver; compaction + vacuum") {
    val dir = java.nio.file.Files.createTempDirectory("scentdel").toString
    val doomed = Set(1L, 4L)
    val batches = Seq(
      all.take(12).map { case (i, l, v) => (i, l, v, false) },
      all.drop(12).map { case (i, l, v) => (i, l, v, false) } ++
        all.take(12).filter(r => doomed(r._1))
          .map { case (i, l, v) => (i, l, v, true) })
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingCentroids.applyBatch(
        b.toDF("vec_id", "label", "embedding", "_deleted"), dir, i.toLong,
        deleteCol = Some("_deleted"), maxSegments = 2)
    }
    val survivors = all.filterNot(r => doomed(r._1))
    def got() = StreamingCentroids.readCentroids(spark, dir)
      .orderBy($"cluster_id", $"dim").collect().toSeq
    assert(got() === rebuild(survivors))
    // compaction happened at maxSegments=2: bucketed base, tombstones gone
    assert(new java.io.File(s"$dir/base/v=1/emb").exists())
    assert(StreamingCentroids.readEmbeddings(spark, dir)
      .filter($"vec_id".isin(doomed.toSeq: _*)).count() === 0L)
    StreamingCentroids.vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/seg/v=0").exists())
    assert(!new java.io.File(s"$dir/sums/v=0").exists())
    assert(got() === rebuild(survivors))
  }
}
