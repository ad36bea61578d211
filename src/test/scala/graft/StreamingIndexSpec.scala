package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.llm.Search
import graft.streaming.StreamingIndex

/** Streaming inverted-index maintenance: MemoryStream micro-batches folded
  * through the versioned (idx, stats) state must be INDISTINGUISHABLE from
  * a batch rebuild over the union corpus, and replays must be skipped
  * (re-merging postings would double df/cf). */
class StreamingIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val docsA = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "alpha beta something else"),
    (3L, "one two three four five"))
  private val docsB = Seq(
    (4L, "alpha beta gamma delta"),
    (5L, "totally new content words"))

  test("streamed index + stats equal batch rebuild over the union corpus") {
    val dir = java.nio.file.Files.createTempDirectory("sidx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sidxckpt").toString
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDF().toDF("doc_id", "text")

    input.addData(docsA: _*)
    val q1 = StreamingIndex.writer(docs, dir, ckpt,
      trigger = Trigger.AvailableNow()).start()
    q1.processAllAvailable(); q1.stop()
    input.addData(docsB: _*)
    val q2 = StreamingIndex.writer(docs, dir, ckpt,
      trigger = Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()

    val all = (docsA ++ docsB).toDF("doc_id", "text")
    val got = Search.renderIndex(StreamingIndex.readIndex(spark, dir))
      .orderBy($"gram").collect().toSeq
    val want = Search.renderIndex(Search.invertedIndexRaw(all))
      .orderBy($"gram").collect().toSeq
    assert(got === want)
    assert(StreamingIndex.readStats(spark, dir).collect().toSeq
      === Search.corpusStats(all).collect().toSeq)
    assert(StreamingIndex.latestVersion(spark, dir) === Some(1L))

    // replay of an applied batch: detected by the pointer, state unchanged
    StreamingIndex.applyBatch(docsB.toDF("doc_id", "text"), dir, batchId = 1L)
    assert(Search.renderIndex(StreamingIndex.readIndex(spark, dir))
      .orderBy($"gram").collect().toSeq === want)

    // railed consumer view: rails over the live n ≡ rails over a rebuild
    val n = all.count()
    val gotRailed = Search.renderIndex(
        StreamingIndex.readRailedIndex(spark, dir, minDf = 2L,
          maxDfFrac = 0.9))
      .orderBy($"gram").collect().toSeq
    val wantRailed = Search.renderIndex(
        Search.applyRails(Search.invertedIndexRaw(all), 2L,
          math.floor(0.9 * n).toLong))
      .orderBy($"gram").collect().toSeq
    assert(gotRailed === wantRailed)
  }

  test("change stream with full-row tombstones: adds merge, erasures subtract — state equals rebuild over survivors") {
    val dir = java.nio.file.Files.createTempDirectory("sidxdel").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sidxdelckpt").toString
    val input = MemoryStream[(Long, String, Boolean)](spark)
    val changes = input.toDF().toDF("doc_id", "text", "_deleted")

    // batch 0: ingest docsA; batch 1: ingest docsB + erase docs 1 and 3
    // (tombstones carry the doc text — the erasure-at-source ordering)
    input.addData(docsA.map { case (i, t) => (i, t, false) }: _*)
    val q1 = StreamingIndex.writer(changes, dir, ckpt,
      trigger = Trigger.AvailableNow(), deleteCol = Some("_deleted")).start()
    q1.processAllAvailable(); q1.stop()
    input.addData(docsB.map { case (i, t) => (i, t, false) } ++
      docsA.filter(d => d._1 == 1L || d._1 == 3L)
        .map { case (i, t) => (i, t, true) }: _*)
    val q2 = StreamingIndex.writer(changes, dir, ckpt,
      trigger = Trigger.AvailableNow(), deleteCol = Some("_deleted")).start()
    q2.processAllAvailable(); q2.stop()

    val survivors = (docsA.filterNot(d => d._1 == 1L || d._1 == 3L) ++ docsB)
      .toDF("doc_id", "text")
    assert(Search.renderIndex(StreamingIndex.readIndex(spark, dir))
      .orderBy($"gram").collect().toSeq
      === Search.renderIndex(Search.invertedIndexRaw(survivors))
        .orderBy($"gram").collect().toSeq)
    assert(StreamingIndex.readStats(spark, dir).collect().toSeq
      === Search.corpusStats(survivors).collect().toSeq)
  }
}
