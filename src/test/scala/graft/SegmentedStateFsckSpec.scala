package graft

import graft.streaming.{SegmentedState, StreamingIndex}

/** fsck is the operational companion to vacuum: structural integrity of
  * a segmented state dir, errors only for states that cannot serve,
  * crash/compaction debris classified as reclaimable info. */
class SegmentedStateFsckSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(ids: Range) =
    ids.map(i => (i.toLong, s"alpha beta doc$i body words here")).toSeq
      .toDF("doc_id", "text")

  private def errors(dir: String) =
    SegmentedState.fsck(spark, dir).filter(_.level == "error")
  private def infos(dir: String) =
    SegmentedState.fsck(spark, dir).filter(_.level == "info")

  test("healthy state: no findings; post-compaction debris is info, vacuum clears it") {
    val dir = java.nio.file.Files.createTempDirectory("fsck").toString
    StreamingIndex.applyBatch(docs(0 until 20), dir, 0L)
    StreamingIndex.applyBatch(docs(20 until 40), dir, 1L)
    assert(SegmentedState.fsck(spark, dir).isEmpty)

    // compaction supersedes the segments; un-vacuumed they are DEBRIS,
    // never corruption
    StreamingIndex.applyBatch(docs(40 until 50), dir, 2L, maxSegments = 3)
    assert(errors(dir).isEmpty)
    assert(infos(dir).count(_.what == "orphan") === 3) // seg v=0,1,2
    StreamingIndex.vacuum(spark, dir)
    assert(SegmentedState.fsck(spark, dir).isEmpty)
  }

  test("a missing referenced segment and a stripped pointer are errors") {
    val dir = java.nio.file.Files.createTempDirectory("fsck2").toString
    StreamingIndex.applyBatch(docs(0 until 10), dir, 0L)
    StreamingIndex.applyBatch(docs(10 until 20), dir, 1L)
    assert(SegmentedState.fsck(spark, dir).isEmpty)

    // manual damage: a referenced segment dir vanishes
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) Option(p.listFiles()).foreach(_.foreach(rm))
      p.delete(): Unit
    }
    rm(new java.io.File(s"$dir/seg/v=0"))
    val e1 = errors(dir)
    assert(e1.exists(f => f.what == "segment" && f.detail.contains("v=0")), e1)

    // pointer markers stripped while state dirs remain: nothing is
    // committed but dirs exist — an error, not a fresh state
    for (m <- new java.io.File(dir).listFiles()
        if m.getName.startsWith("_LATEST")) m.delete()
    val e2 = errors(dir)
    assert(e2.exists(_.what == "pointer"), e2)
  }
}
