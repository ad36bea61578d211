package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.llm.Multimodal
import graft.streaming.StreamingMedia

/** Streaming media-features maintenance: micro-batches folded through the
  * segmented per-media feature state must serve near-dup pairs
  * INDISTINGUISHABLE from [[Multimodal.dedupNear]] over the live corpus;
  * erasure is version-ordered (re-ingest safe, tombstones never decoded);
  * compaction lands the id-bucketed base; replays are pointer-skipped. */
class StreamingMediaSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog once more"
  // ids 0/1 and 4/5 are planted near-dup pairs (repeated content — the
  // re-encode analog); 2, 3 are singletons
  private def text(i: Long): String = i match {
    case 0L => base
    case 1L => base + base
    case 4L => "zzz 000 111 222 333 444 aaa bbb"
    case 5L => "zzz 000 111 222 333 444 aaa bbb" * 2
    // distinct dominant byte per id — byte-histogram cosine between any
    // two of these stays far from 1
    case n => s"unique content row $n " +
      (('a' + n % 26).toChar.toString * (20 + 7 * n.toInt))
  }
  private def mediaOf(ids: Seq[Long]) = Multimodal.mediaFromDocuments(
    ids.map(i => (i, text(i), "en", "s", text(i).length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))

  private def pairsOf(ids: Seq[Long]): Seq[(Long, Long)] =
    Multimodal.dedupNear(mediaOf(ids))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq.sorted

  test("streamed features serve near-dups equal to the inline build; erase -> re-ingest; replay skipped; vacuum safe") {
    val dir = java.nio.file.Files.createTempDirectory("smedia").toString
    def served: Seq[(Long, Long)] =
      StreamingMedia.nearDups(spark, dir)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq.sorted

    // three add batches at maxSegments=2: batch 1 compacts into the
    // id-bucketed base
    StreamingMedia.applyBatch(mediaOf(Seq(0L, 1L)), dir, 0L, maxSegments = 2)
    StreamingMedia.applyBatch(mediaOf(Seq(2L, 3L)), dir, 1L, maxSegments = 2)
    StreamingMedia.applyBatch(mediaOf(Seq(4L, 5L)), dir, 2L, maxSegments = 2)
    assert(served === pairsOf(0L to 5L))
    assert(served === Seq((0L, 1L), (4L, 5L)))

    // replay of an applied batch: pointer-skipped, state unchanged
    StreamingMedia.applyBatch(mediaOf(Seq(99L)), dir, 2L, maxSegments = 2)
    assert(served === Seq((0L, 1L), (4L, 5L)))

    // erasure: tombstone id 1 (full row, never decoded) — its pair dies
    val tomb = mediaOf(Seq(1L)).withColumn("_deleted", lit(true))
      .unionByName(mediaOf(Seq(6L)).withColumn("_deleted", lit(false)))
    StreamingMedia.applyBatch(tomb, dir, 3L, deleteCol = Some("_deleted"),
      maxSegments = 2)
    assert(served === pairsOf(Seq(0L, 2L, 3L, 4L, 5L, 6L)))
    assert(served === Seq((4L, 5L)))

    // re-ingest the erased id: version-ordered erasure keeps the NEW row
    StreamingMedia.applyBatch(
      mediaOf(Seq(1L)).withColumn("_deleted", lit(false)), dir, 4L,
      deleteCol = Some("_deleted"), maxSegments = 2)
    assert(served === Seq((0L, 1L), (4L, 5L)))

    // vacuum reclaims superseded state; the serving view is unchanged
    StreamingMedia.vacuum(spark, dir)
    assert(served === Seq((0L, 1L), (4L, 5L)))

    // the compacted base is hive-bucketed on the id hash (pruned probes /
    // clustered files)
    val f = new java.io.File(dir, "base")
    assert(f.exists, "no compacted base written")
    def findBucketDir(d: java.io.File): Boolean =
      Option(d.listFiles()).exists(_.exists(c =>
        c.getName.startsWith("b=") || (c.isDirectory && findBucketDir(c))))
    assert(findBucketDir(f), "base not bucket-partitioned")
  }

  test("foreachBatch writer drives the identical fold (MemoryStream)") {
    val dir = java.nio.file.Files.createTempDirectory("smediaw").toString
    val ckpt = java.nio.file.Files.createTempDirectory("smediawc").toString
    val input = MemoryStream[(Long, String)](spark)
    val media = Multimodal.mediaFromDocuments(
      input.toDF().toDF("doc_id", "text")
        .withColumn("n_chars", length($"text")))
    input.addData((0L to 5L).map(i => (i, text(i))): _*)
    val q = StreamingMedia.writer(media, dir, ckpt,
      trigger = Trigger.AvailableNow(), maxSegments = 2).start()
    q.processAllAvailable(); q.stop()
    val got = StreamingMedia.nearDups(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq((0L, 1L), (4L, 5L)))
  }
}
