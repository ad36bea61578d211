package graft

import org.apache.spark.sql.functions._

import graft.llm.Multimodal
import graft.streaming.StreamingChunks

/** Streaming chunk-table maintenance: micro-batches folded through the
  * segmented per-media chunk state must serve containment pairs
  * INDISTINGUISHABLE from [[Multimodal.clipContainment]] over the live
  * corpus; erasure is version-ordered (re-ingest safe, tombstones never
  * chunked); replays of a far-behind id throw. */
class StreamingChunksSpec extends SparkTestBase {
  import spark.implicits._

  // the clip-containment spec's multiplicative-hash base (~len/32 cuts)
  private val base = (0 until 300)
    .map(i => ('a' + ((i.toLong * 2654435761L >> 7) % 26).toInt).toChar)
    .mkString
  private def text(i: Long): String = i match {
    case 1L => base
    case 4L => base.substring(32) // OFF-grid clip of 1
    case n => s"unique content row $n " +
      (('a' + n % 26).toChar.toString * (40 + 7 * n.toInt))
  }
  private def mediaOf(ids: Seq[Long]) = Multimodal.mediaFromDocuments(
    ids.map(i => (i, text(i), "en", "s", text(i).length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))

  private def pairsOf(ids: Seq[Long]): Seq[(Long, Long)] =
    Multimodal.clipContainment(mediaOf(ids))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq.sorted

  test("streamed chunks serve containment equal to the inline build; erase -> re-ingest; mismatch replay throws") {
    val dir = java.nio.file.Files.createTempDirectory("schunk").toString
    def served: Seq[(Long, Long)] =
      StreamingChunks.clipPairs(spark, dir)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq.sorted

    // three add batches at maxSegments=2: batch 1 compacts the base
    StreamingChunks.applyBatch(mediaOf(Seq(1L, 2L)), dir, 0L, maxSegments = 2)
    StreamingChunks.applyBatch(mediaOf(Seq(3L)), dir, 1L, maxSegments = 2)
    StreamingChunks.applyBatch(mediaOf(Seq(4L)), dir, 2L, maxSegments = 2)
    assert(served === pairsOf(1L to 4L))
    assert(served === Seq((1L, 4L)), s"got $served")

    // probe a new batch against the maintained state without folding:
    // another off-grid clip pairs with both copies of the content
    val probe = StreamingChunks.probeBatch(spark, dir, Multimodal.mediaFromDocuments(
        Seq((50L, base.substring(64), "en", "s", (base.length - 64).toLong))
          .toDF("doc_id", "text", "lang", "source", "n_chars")))
      .select($"id_new", $"id_other").as[(Long, Long)].collect().toSeq.sorted
    assert(probe === Seq((50L, 1L), (50L, 4L)), s"got $probe")

    // erasure: tombstone the original — the clip's pair dies
    StreamingChunks.applyBatch(
      mediaOf(Seq(1L)).withColumn("_deleted", lit(true)), dir, 3L,
      deleteCol = Some("_deleted"), maxSegments = 2)
    assert(served === Nil)

    // re-ingest: version-ordered erasure keeps the NEW row
    StreamingChunks.applyBatch(
      mediaOf(Seq(1L)).withColumn("_deleted", lit(false)), dir, 4L,
      deleteCol = Some("_deleted"), maxSegments = 2)
    assert(served === Seq((1L, 4L)))

    // replay of the applied id: skipped; a far-behind id: throws
    StreamingChunks.applyBatch(mediaOf(Seq(99L)), dir, 4L, maxSegments = 2)
    assert(served === Seq((1L, 4L)))
    intercept[IllegalStateException] {
      StreamingChunks.applyBatch(mediaOf(Seq(99L)), dir, 0L, maxSegments = 2)
    }

    // vacuum reclaims superseded state; the serving view is unchanged
    StreamingChunks.vacuum(spark, dir)
    assert(served === Seq((1L, 4L)))
  }
}
