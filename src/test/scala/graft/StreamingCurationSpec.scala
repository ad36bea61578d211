package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingCuration

/** The curation recipe on an unbounded stream: same gates as the batch
  * path, watermark-bounded exact dedup. */
class StreamingCurationSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming curate: gates filter, watermark dedup keeps first arrival") {
    val en = "the quick brown fox is on the hill and it runs for the trees " * 3
    val fr = "le chat est dans la maison pour un moment et le chien dort sur le tapis " * 3
    val junk = "@@@@ #### 1234 5678 !!!! $$$$ %%%% ^^^^ &&&& ****"
    val ms = (m: Long) => new Timestamp(m)

    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val curated = StreamingCuration.curate(
      input.toDF().toDF("doc_id", "text", "ingest_ts"),
      lang = "en", minQuality = 0.4)
    input.addData(
      (0L, en, ms(1_000)),    // kept
      (1L, fr, ms(2_000)),    // language gate
      (2L, junk, ms(3_000)),  // quality gate
      (3L, en, ms(4_000)))    // exact dup of 0 inside the horizon → dropped
    val q = curated.writeStream
      .format("memory").queryName("graft_stream_curate")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_stream_curate")
      .select($"doc_id", $"quality").as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(0L))
    assert(got.head._2 >= 0.4)
  }

  test("streaming gopher gate: the rule battery runs stateless on a stream, batch-parity") {
    // gopherRules is a pure scan-side projection, so it composes into any
    // streaming pipeline with no state and no output-mode constraints —
    // the quality gate an always-on ingest runs before dedup.
    val rows = Seq(
      (1L, ("the be to of and that have with okay " * 6).trim + " tail"),
      (2L, "the be short doc"),
      (3L, ("aa bb " * 30).trim))
    val input = MemoryStream[(Long, String)](spark)
    val gated = graft.llm.TextAnalysis.gopherRules(
      input.toDF().toDF("doc_id", "text"), minWords = 30L)
    input.addData(rows: _*)
    val q = gated.writeStream
      .format("memory").queryName("graft_stream_gopher")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_stream_gopher").orderBy($"doc_id")
    val batch = graft.llm.TextAnalysis.gopherRules(
      rows.toDF("doc_id", "text"), minWords = 30L).orderBy($"doc_id")
    assert(got.collect().toSeq === batch.collect().toSeq)
    assert(got.select($"kept").as[Boolean].collect().toSeq ===
      Seq(true, false, false))
  }

  test("streaming heavy hitters: per-window sketch finalizes on watermark") {
    val ms = (m: Long) => new Timestamp(m)
    val input = MemoryStream[(String, Timestamp)](spark)
    val out = StreamingCuration.windowedHeavyHitters(
      input.toDF().toDF("term", "ingest_ts"), capacity = 8,
      windowLen = "1 minute", watermarkDelay = "0 seconds")
    // window [0,60s): a·3, b·1; the 130s row pushes the watermark past it
    // (no-data micro-batch flushes the closed window); the 130s window
    // itself stays open → only window 1 is emitted
    input.addData(("a", ms(1_000)), ("a", ms(2_000)), ("b", ms(3_000)),
      ("a", ms(4_000)))
    input.addData(("c", ms(130_000)))
    val q = out.writeStream
      .format("memory").queryName("graft_stream_hh")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      """SELECT e.item, e.cnt FROM (
        |  SELECT explode(hh) AS e FROM graft_stream_hh) ORDER BY e.cnt DESC
        |""".stripMargin).as[(String, Long)].collect().toSeq
    assert(rows === Seq(("a", 3L), ("b", 1L)))
  }

  test("streaming CMS: closed window's sketch equals the batch build") {
    val ms = (m: Long) => new Timestamp(m)
    val input = MemoryStream[(String, Timestamp)](spark)
    val out = StreamingCuration.windowedCms(
      input.toDF().toDF("term", "ingest_ts"),
      windowLen = "1 minute", watermarkDelay = "0 seconds")
    input.addData(("alpha", ms(1_000)), ("alpha", ms(2_000)),
      ("beta", ms(3_000)), ("alpha", ms(4_000)))
    input.addData(("late", ms(130_000))) // pushes the watermark past w1
    val q = out.writeStream
      .format("memory").queryName("graft_stream_cms")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      "SELECT depth, bucket, cnt FROM graft_stream_cms")
      .as[(Int, Long, Long)].collect().toSet
    // batch reference over the same closed-window tokens (text = one term)
    val batch = graft.llm.Sketch.cmsBuild(
      Seq("alpha", "alpha", "beta", "alpha").map(t => Tuple1(t)).toDF("text"))
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.toSeq.map(_._3).sum === 4L * 4) // 4 tokens x depth rows
  }

  test("stream-stream join: embeddings matched within the horizon only") {
    val ms = (m: Long) => new Timestamp(m)
    val docsIn = MemoryStream[(Long, String, Timestamp)](spark)
    val embIn = MemoryStream[(Long, Seq[Float], Timestamp)](spark)
    val joined = StreamingCuration.joinWithEmbeddings(
      docsIn.toDF().toDF("doc_id", "text", "ingest_ts"),
      embIn.toDF().toDF("emb_doc_id", "embedding", "embed_ts"),
      horizon = "10 minutes")
    docsIn.addData((1L, "doc one", ms(60_000)), (2L, "doc two", ms(60_000)))
    embIn.addData(
      (1L, Seq(1f, 2f), ms(120_000)),     // doc 1: inside the horizon
      (2L, Seq(3f, 4f), ms(2_000_000)))   // doc 2: past the horizon → dropped
    val q = joined.writeStream
      .format("memory").queryName("graft_stream_join")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_stream_join")
      .select($"doc_id").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  test("stream-stream LEFT OUTER join: unmatched doc flushes with null embedding") {
    val ms = (m: Long) => new Timestamp(m)
    val docsIn = MemoryStream[(Long, String, Timestamp)](spark)
    val embIn = MemoryStream[(Long, Seq[Float], Timestamp)](spark)
    val joined = StreamingCuration.joinWithEmbeddings(
      docsIn.toDF().toDF("doc_id", "text", "ingest_ts"),
      embIn.toDF().toDF("emb_doc_id", "embedding", "embed_ts"),
      horizon = "10 minutes", watermarkDelay = "0 seconds",
      joinType = "left_outer")
    val q = joined.writeStream
      .format("memory").queryName("graft_stream_outer")
      .outputMode("append")
      .start()
    docsIn.addData((1L, "matched", ms(60_000)), (2L, "orphan", ms(60_000)))
    embIn.addData((1L, Seq(1f, 2f), ms(120_000)))
    q.processAllAvailable()
    // the GLOBAL watermark is the min across both inputs — advance BOTH
    // sides past doc 2's horizon; eviction (and the outer null row) lands
    // on a subsequent batch
    embIn.addData((99L, Seq(0f), ms(10_000_000)))
    docsIn.addData((99L, "wm-pusher", ms(10_000_000)))
    q.processAllAvailable()
    embIn.addData((98L, Seq(0f), ms(20_000_000)))
    docsIn.addData((98L, "wm-pusher-2", ms(20_000_000)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("graft_stream_outer")
      .filter($"doc_id" < 90) // drop the watermark-pusher rows
      .select($"doc_id", $"embedding".isNull.as("no_emb"))
      .as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true))
  }

  test("stream-stream FULL OUTER join: orphans flush from BOTH sides") {
    val ms = (m: Long) => new Timestamp(m)
    val docsIn = MemoryStream[(Long, String, Timestamp)](spark)
    val embIn = MemoryStream[(Long, Seq[Float], Timestamp)](spark)
    val joined = StreamingCuration.joinWithEmbeddings(
      docsIn.toDF().toDF("doc_id", "text", "ingest_ts"),
      embIn.toDF().toDF("emb_doc_id", "embedding", "embed_ts"),
      horizon = "10 minutes", watermarkDelay = "0 seconds",
      joinType = "full_outer")
    val q = joined.writeStream
      .format("memory").queryName("graft_stream_full_outer")
      .outputMode("append")
      .start()
    // doc 1 matches; doc 2 never gets an embedding (doc-side orphan);
    // embedding 3 has no document — gated out upstream (emb-side orphan)
    docsIn.addData((1L, "matched", ms(60_000)), (2L, "doc orphan", ms(60_000)))
    embIn.addData((1L, Seq(1f, 2f), ms(120_000)),
      (3L, Seq(9f, 9f), ms(120_000)))
    q.processAllAvailable()
    // advance BOTH sides (global watermark = min) far enough, twice, so
    // eviction emits the outer rows on subsequent batches
    for (t <- Seq(10_000_000L, 20_000_000L)) {
      embIn.addData((99L, Seq(0f), ms(t)))
      docsIn.addData((99L, "wm-pusher", ms(t)))
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("graft_stream_full_outer")
      .filter($"doc_id" < 90)
      .select($"doc_id", $"text".isNull.as("no_text"),
        $"embedding".isNull.as("no_emb"))
      .as[(Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> ((false, false)), // matched inside the horizon
      2L -> ((false, true)),  // doc-side orphan: null embedding
      3L -> ((true, false)))) // emb-side orphan: null text, id from emb side
  }

  test("streaming surgical decontam: per-batch cut equals the batch operator") {
    val bench = Seq((100L, "prompt prefix q1 q2 q3 q4 answer suffix"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (0L, "intro words here q1 q2 q3 q4 closing remarks stay"),
      (1L, "nothing from the benchmark in this one at all"),
      (2L, "tail leak q2 q3 q4 only here"))
    val input = MemoryStream[(Long, String)](spark)
    val acc = scala.collection.mutable.Map.empty[Long, String]
    val q = StreamingCuration.decontamStream(
        input.toDF().toDF("doc_id", "text"), bench, windowTokens = 3) {
        (clean, _) =>
          clean.as[(Long, String)].collect().foreach { case (id, t) =>
            acc.synchronized { acc(id) = t } }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("decontam_ck").toString)
      .start()
    input.addData(docs.take(2): _*)
    input.addData(docs.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val expected = graft.llm.Decontam.decontaminateSpans(
        docs.toDF("doc_id", "text"), bench, windowTokens = 3)
      .as[(Long, String)].collect().toMap
    assert(acc.toMap === expected)
    assert(acc(0L) === "intro words here closing remarks stay")
  }
}
