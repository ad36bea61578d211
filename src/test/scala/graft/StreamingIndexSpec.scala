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

    // out-of-band compaction folds the tombstone segments into the base;
    // the served view is unchanged (content-identical, new layout)
    StreamingIndex.compact(spark, dir)
    assert(new java.io.File(s"$dir/base").exists())
    assert(Search.renderIndex(StreamingIndex.readIndex(spark, dir))
      .orderBy($"gram").collect().toSeq
      === Search.renderIndex(Search.invertedIndexRaw(survivors))
        .orderBy($"gram").collect().toSeq)
  }

  private def duBytes(path: String): Long = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  }

  test("per-batch write cost is proportional to the batch, and compaction + vacuum bound read state and disk") {
    val dir = java.nio.file.Files.createTempDirectory("sidxseg").toString
    val big = (1L to 400L)
      .map(i => (i, s"alpha beta common gram w$i x$i y$i z$i filler words"))
    val small = Seq((1001L, "tiny new arrival doc"), (1002L, "another tiny doc body"))
    val tail = Seq((2001L, "final batch content here"))

    StreamingIndex.applyBatch(big.toDF("doc_id", "text"), dir, 0L)
    val bytesBig = duBytes(s"$dir/seg/v=0")
    StreamingIndex.applyBatch(small.toDF("doc_id", "text"), dir, 1L)
    val bytesSmall = duBytes(s"$dir/seg/v=1")
    // the r9 writer rewrote the ENTIRE merged index per batch; the
    // segment writer's bytes track the batch — the 100 TB contract
    assert(bytesSmall > 0 && bytesSmall * 5 < bytesBig,
      s"batch write not ∝ batch: small=$bytesSmall big=$bytesBig")
    assert(!new java.io.File(s"$dir/base").exists(),
      "no compaction expected below maxSegments")

    // third batch reaches maxSegments=3: compacts into the
    // bucket-partitioned base and empties the live-segment list
    StreamingIndex.applyBatch(tail.toDF("doc_id", "text"), dir, 2L,
      maxSegments = 3)
    assert(new java.io.File(s"$dir/base/v=2").exists())
    assert(new java.io.File(s"$dir/base/v=2").listFiles()
      .exists(_.getName.startsWith("b=")), "base must be bucket-partitioned")

    val all = (big ++ small ++ tail).toDF("doc_id", "text")
    val want = Search.renderIndex(Search.invertedIndexRaw(all))
      .orderBy($"gram").collect().toSeq
    def got() = Search.renderIndex(StreamingIndex.readIndex(spark, dir))
      .orderBy($"gram").collect().toSeq
    assert(got() === want)

    // vacuum reclaims the compacted segments and stale stats/manifests;
    // the served view is unchanged
    StreamingIndex.vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/seg/v=0").exists())
    assert(!new java.io.File(s"$dir/seg/v=1").exists())
    assert(!new java.io.File(s"$dir/stats/v=0").exists())
    assert(got() === want)

    // a batchId FAR behind the pointer AFTER vacuum is not a replay — it
    // is the fresh-checkpoint-over-existing-state mismatch, refused
    // BEFORE any state dir is touched (vacuuming cannot strand it into
    // silently serving stale state)
    intercept[IllegalStateException] {
      StreamingIndex.applyBatch(big.toDF("doc_id", "text"), dir, 0L)
    }
    assert(got() === want)
    assert(StreamingIndex.latestVersion(spark, dir) === Some(2L))
    // the immediately-applied id (a true crash-replay) still skips clean
    StreamingIndex.applyBatch(tail.toDF("doc_id", "text"), dir, 2L,
      maxSegments = 3)
    assert(got() === want)
  }

  test("erase then RE-INGEST of the same doc id: the ordered tombstone fold serves the final corpus") {
    val dir = java.nio.file.Files.createTempDirectory("sidxre").toString
    // batch 0: ingest docsA; batch 1: TOMBSTONE-ONLY batch erasing doc 2
    // (carries the old text); batch 2: doc 2 RETURNS with different text
    // while the tombstone segment is still live (maxSegments=8 — no
    // compaction has folded it away). The fold applies the tombstone at
    // its place in batch order, so the old postings leave the state
    // before the new ones merge.
    val returned = Seq((2L, "alpha beta replacement words entirely"),
      (6L, "unrelated new arrival body"))
    val batches = Seq(
      docsA.map { case (i, t) => (i, t, false) },
      docsA.filter(_._1 == 2L).map { case (i, t) => (i, t, true) },
      returned.map { case (i, t) => (i, t, false) })
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingIndex.applyBatch(b.toDF("doc_id", "text", "_deleted"), dir,
        i.toLong, deleteCol = Some("_deleted"))
    }
    val fin = (docsA.filterNot(_._1 == 2L) ++ returned).toDF("doc_id", "text")
    def got() = Search.renderIndex(StreamingIndex.readIndex(spark, dir))
      .orderBy($"gram").collect().toSeq
    val want = Search.renderIndex(Search.invertedIndexRaw(fin))
      .orderBy($"gram").collect().toSeq
    assert(got() === want)
    assert(StreamingIndex.readStats(spark, dir).collect().toSeq
      === Search.corpusStats(fin).collect().toSeq)
    // compaction folds the boundary layers flat; content identical
    StreamingIndex.compact(spark, dir)
    assert(got() === want)
  }

  test("minor compaction folds the tail run and leaves the base untouched; major fires on the byte ratio") {
    def baseState(dir: String): Seq[(String, Long)] = {
      val b = new java.io.File(s"$dir/base")
      if (!b.exists()) Nil
      else {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(b).map(f => (f.getPath, f.length())).sortBy(_._1)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("sidxminor").toString
    val big = (1L to 300L)
      .map(i => (i, s"alpha beta gram w$i x$i y$i z$i filler body words"))
    def apply(rows: Seq[(Long, String)], b: Long, ratio: Double): Unit =
      StreamingIndex.applyBatch(rows.toDF("doc_id", "text"), dir, b,
        maxSegments = 3, majorRatio = ratio)
    // batches 0-2: first trigger has no base — MAJOR establishes it
    apply(big.take(100), 0L, 0.2)
    apply(big.slice(100, 200), 1L, 0.2)
    apply(big.slice(200, 300), 2L, 0.2)
    assert(new java.io.File(s"$dir/base/v=2").exists())
    val baseAfterMajor = baseState(dir)

    // batches 3-5: tiny deltas, huge ratio — the trigger at batch 5 must
    // MINOR: one merged tail segment at v=5, base files byte-identical
    val tiny = (1001L to 1006L).map(i => (i, s"tiny doc $i fresh words"))
    apply(tiny.take(2), 3L, 1e9)
    apply(tiny.slice(2, 4), 4L, 1e9)
    apply(tiny.slice(4, 6), 5L, 1e9)
    assert(baseState(dir) === baseAfterMajor, "minor must not touch the base")
    assert(!new java.io.File(s"$dir/base/v=5").exists())
    assert(new java.io.File(s"$dir/seg/v=5/idx").exists())
    assert(!new java.io.File(s"$dir/seg/v=5/.idx_minor").exists())
    val all = (big ++ tiny).toDF("doc_id", "text")
    def got() = Search.renderIndex(StreamingIndex.readIndex(spark, dir))
      .orderBy($"gram").collect().toSeq
    val want = Search.renderIndex(Search.invertedIndexRaw(all))
      .orderBy($"gram").collect().toSeq
    assert(got() === want)
    // vacuum reclaims the folded-run members; the view is unchanged
    StreamingIndex.vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/seg/v=3").exists())
    assert(got() === want)

    // byte-ratio major: with the default ratio the accumulated deltas
    // (plus one more batch) exceed 0.2 × base — the next trigger MAJORs
    val more = (2001L to 2200L)
      .map(i => (i, s"bulk delta doc $i alpha beta many more filler words"))
    apply(more.take(100), 6L, 0.01)
    // the count trigger fires here (segments v=5,6,7); at ratio 0.01 the
    // accumulated deltas exceed the byte bound — a MAJOR, not a minor
    // (at this toy scale the bucketed base is mostly per-file footer
    // overhead, so the production default 0.2 is not discriminating)
    apply(more.drop(100), 7L, 0.01)
    assert(new java.io.File(s"$dir/base/v=7").exists(),
      "byte ratio must force a major")
    val fin = (big ++ tiny ++ more).toDF("doc_id", "text")
    assert(Search.renderIndex(StreamingIndex.readIndex(spark, dir))
      .orderBy($"gram").collect().toSeq
      === Search.renderIndex(Search.invertedIndexRaw(fin))
        .orderBy($"gram").collect().toSeq)
  }

  test("a run that died mid-prefix resumes by idempotent re-fold (no isEmpty gate)") {
    val dir = java.nio.file.Files.createTempDirectory("sidxresume").toString
    val batches = Seq(docsA.take(2), docsA.drop(2), docsB)
    // simulate a prior run that applied only batch 0 before dying
    StreamingIndex.applyBatch(batches(0).toDF("doc_id", "text"), dir, 0L)
    // the catalog-row discipline: fold EVERY batch; the pointer skips the
    // applied prefix and the fold continues from the death point
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingIndex.applyBatch(b.toDF("doc_id", "text"), dir, i.toLong)
    }
    val all = (docsA ++ docsB).toDF("doc_id", "text")
    assert(Search.renderIndex(StreamingIndex.readIndex(spark, dir))
      .orderBy($"gram").collect().toSeq
      === Search.renderIndex(Search.invertedIndexRaw(all))
        .orderBy($"gram").collect().toSeq)
    assert(StreamingIndex.readStats(spark, dir).collect().toSeq
      === Search.corpusStats(all).collect().toSeq)
  }

  test("erasure sweep: trailing pure-tombstone runs fold into one del segment — base untouched, no O(corpus) major") {
    import graft.streaming.SegmentedState
    def baseState(dir: String): Seq[(String, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val b = new java.io.File(s"$dir/base")
      if (!b.exists()) Nil else walk(b).map(f => (f.getPath, f.length())).sortBy(_._1)
    }
    val dir = java.nio.file.Files.createTempDirectory("sidxsweep").toString
    val big = (1L to 200L)
      .map(i => (i, s"alpha beta common w$i x$i y$i filler body words"))
    def apply(rows: Seq[(Long, String, Boolean)], b: Long): Unit =
      StreamingIndex.applyBatch(rows.toDF("doc_id", "text", "_deleted"),
        dir, b, deleteCol = Some("_deleted"), maxSegments = 2,
        majorRatio = 1e9)
    // batches 0-1 ingest; the trigger at batch 1 has no base yet — MAJOR
    apply(big.take(100).map(r => (r._1, r._2, false)), 0L)
    apply(big.drop(100).map(r => (r._1, r._2, false)), 1L)
    assert(new java.io.File(s"$dir/base/v=1").exists())
    val baseAfterMajor = baseState(dir)
    // pure-tombstone sweep: batches 2-6 erase disjoint slices. With
    // maxSegments=2 the trigger fires at every batch from 3 on; the tail
    // del-less run is always empty, so pre-r11 EVERY trigger was an
    // O(corpus) major — now each folds the trailing pure-del run into
    // one del segment (write ∝ accumulated tombstones).
    var doomed = Set.empty[Long]
    for ((b, lo) <- Seq((2L, 1L), (3L, 31L), (4L, 61L), (5L, 91L), (6L, 121L))) {
      val ids = (lo until lo + 30L).toSet
      doomed ++= ids
      apply(big.filter(r => ids.contains(r._1)).map(r => (r._1, r._2, true)), b)
    }
    assert(baseState(dir) === baseAfterMajor,
      "an erasure sweep must never rewrite the base (O(corpus) major)")
    val m = SegmentedState.readManifest(spark, dir, 6L)
    assert(m.base === Some(1L))
    assert(m.segments.size <= 2,
      s"segment count must stay bounded without majors: ${m.segments}")
    assert(m.pure === m.dels, "folded sweep segments stay marked pure")
    // the served view equals the rebuild over the survivors
    val survivors = big.filter(r => !doomed.contains(r._1))
      .toDF("doc_id", "text")
    assert(Search.renderIndex(StreamingIndex.readIndex(spark, dir))
      .orderBy($"gram").collect().toSeq
      === Search.renderIndex(Search.invertedIndexRaw(survivors))
        .orderBy($"gram").collect().toSeq)
    assert(StreamingIndex.readStats(spark, dir).collect().toSeq
      === Search.corpusStats(survivors).collect().toSeq)
    // folded-away run members become debris, reclaimed by vacuum, and
    // the view is unchanged
    StreamingIndex.vacuum(spark, dir)
    for (v <- 2L to 5L)
      assert(!new java.io.File(s"$dir/seg/v=$v").exists(), s"v=$v not reclaimed")
    assert(Search.renderIndex(StreamingIndex.readIndex(spark, dir))
      .orderBy($"gram").collect().toSeq
      === Search.renderIndex(Search.invertedIndexRaw(survivors))
        .orderBy($"gram").collect().toSeq)
  }

  test("streamed unigram search index: maintained state + pruned panel probe score exactly like inline bm25, through erasure") {
    import graft.streaming.StreamingSearchIndex
    val dir = java.nio.file.Files.createTempDirectory("sbm25").toString
    val panel = Seq((1, "alpha"), (2, "beta"), (2, "words"))
    def score(docs: Seq[(Long, String)]) =
      Search.bm25(docs.toDF("doc_id", "text"), panel.toDF("query_id", "term"))
        .orderBy($"query_id", $"rank").collect().toSeq
    // maxSegments=2 → the batch-1 trigger majors into the term-bucketed
    // base; batch 2 rides as a live segment over it, so the probe folds
    // base + segment
    StreamingSearchIndex.applyBatch(
      docsA.map { case (i, t) => (i, t, false) }
        .toDF("doc_id", "text", "_deleted"), dir, 0L,
      deleteCol = Some("_deleted"), maxSegments = 2)
    StreamingSearchIndex.applyBatch(
      docsB.map { case (i, t) => (i, t, false) }
        .toDF("doc_id", "text", "_deleted"), dir, 1L,
      deleteCol = Some("_deleted"), maxSegments = 2)
    assert(StreamingSearchIndex.bm25(spark, dir, panel)
      .orderBy($"query_id", $"rank").collect().toSeq
      === score(docsA ++ docsB))
    // erase doc 1 (full-row tombstone carrying the text): scores must
    // equal inline bm25 over the survivors — postings AND stats shrink
    StreamingSearchIndex.applyBatch(
      docsA.filter(_._1 == 1L).map { case (i, t) => (i, t, true) }
        .toDF("doc_id", "text", "_deleted"), dir, 2L,
      deleteCol = Some("_deleted"), maxSegments = 2)
    assert(StreamingSearchIndex.bm25(spark, dir, panel)
      .orderBy($"query_id", $"rank").collect().toSeq
      === score((docsA ++ docsB).filterNot(_._1 == 1L)))
    // the pruned read is the full view restricted to the panel terms
    val terms = panel.map(_._2).distinct
    assert(StreamingSearchIndex.readIndexPruned(spark, dir, terms)
      .orderBy($"term").collect().toSeq
      === StreamingSearchIndex.readIndex(spark, dir)
        .filter($"term".isin(terms: _*)).orderBy($"term").collect().toSeq)
  }

  test("compaction clusters by bucket: one data file per bucket partition, and the pruned read still serves") {
    val dir = java.nio.file.Files.createTempDirectory("sidxcluster").toString
    val docs = (1L to 120L)
      .map(i => (i, s"alpha beta w$i x$i y$i z$i common body words"))
    (0L to 2L).foreach { b =>
      StreamingIndex.applyBatch(
        docs.filter(_._1 % 3 == b).toDF("doc_id", "text"), dir, b,
        maxSegments = 3, nBuckets = 8)
    }
    val base = new java.io.File(s"$dir/base/v=2")
    assert(base.exists())
    val bucketDirs = base.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("b="))
    assert(bucketDirs.nonEmpty)
    for (bd <- bucketDirs) {
      val data = bd.listFiles().filter(f =>
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(data.length === 1,
        s"${bd.getName}: expected ONE clustered data file, got " +
          data.map(_.getName).mkString(", "))
    }
    // the clustered layout serves identically
    assert(Search.renderIndex(StreamingIndex.readIndex(spark, dir))
      .orderBy($"gram").collect().toSeq
      === Search.renderIndex(
        Search.invertedIndexRaw(docs.toDF("doc_id", "text")))
        .orderBy($"gram").collect().toSeq)
  }

  test("vacuum retention is the concurrent-reader envelope: retain=2 keeps a prior manifest's view readable, retain=1 fails it loudly") {
    val dir = java.nio.file.Files.createTempDirectory("sidxretain").toString
    StreamingIndex.applyBatch(docsA.toDF("doc_id", "text"), dir, 0L,
      maxSegments = 3)
    // two readers resolve pointer → manifest v0 NOW; their LAZY plans
    // read seg/v=0 at first action — the production merge-on-read
    // pattern of a long-lived query planned against a snapshot. Neither
    // is materialized yet: a plan that already ran would serve later
    // collects from its memoized shuffle outputs without touching files,
    // which is not the contract under test (fresh execution is).
    val readerRetained = Search.renderIndex(
      StreamingIndex.readIndex(spark, dir)).orderBy($"gram")
    val readerReclaimed = Search.renderIndex(
      StreamingIndex.readIndex(spark, dir)).orderBy($"gram")
    val want = Search.renderIndex(Search.invertedIndexRaw(
      docsA.toDF("doc_id", "text"))).orderBy($"gram").collect().toSeq
    // the writer moves on: two more batches, the second triggers a major
    // — seg/v=0 leaves the LATEST manifest but stays referenced by v=0's
    StreamingIndex.applyBatch(docsB.take(1).toDF("doc_id", "text"), dir, 1L,
      maxSegments = 3)
    StreamingIndex.applyBatch(docsB.drop(1).toDF("doc_id", "text"), dir, 2L,
      maxSegments = 3)
    // retain=2 keeps the previous manifests' dirs: the old reader's first
    // action, executed AFTER the vacuum, still serves its snapshot
    StreamingIndex.vacuum(spark, dir, retain = 2)
    assert(readerRetained.collect().toSeq === want,
      "retain=2 must keep a one-manifest-old reader alive")
    // retain=1 reclaims everything but the live view: a fresh execution
    // of the old plan now FAILS LOUDLY (missing files) — never silently
    // serves partial state
    StreamingIndex.vacuum(spark, dir, retain = 1)
    val e = intercept[Exception] { readerReclaimed.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
        t.isInstanceOf[java.io.FileNotFoundException] ||
        String.valueOf(t.getMessage).contains("FileNotFound") ||
        String.valueOf(t.getMessage).contains("does not exist")),
      s"expected a loud missing-file failure, got: $e")
    // and the LIVE view (current pointer) is unaffected by either vacuum
    assert(Search.renderIndex(StreamingIndex.readIndex(spark, dir))
      .orderBy($"gram").collect().toSeq
      === Search.renderIndex(Search.invertedIndexRaw(
        (docsA ++ docsB).toDF("doc_id", "text")))
        .orderBy($"gram").collect().toSeq)
  }
}
