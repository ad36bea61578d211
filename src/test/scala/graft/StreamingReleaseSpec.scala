package graft

import org.apache.spark.sql.DataFrame

import graft.llm.Curation
import graft.streaming.{StreamingRelease, StatePointer}

/** The always-on release composition: batches folded through
  * [[StreamingRelease.applyBatch]] must serve a snapshot IDENTICAL to
  * [[Curation.releasePipeline]] over the union corpus — including the
  * composition's one subtle edge, exact-survivor DISPLACEMENT (a later
  * batch carrying a smaller id for an already-seen text must swap the
  * near-dup corpus member), and replays must pointer-skip. */
class StreamingReleaseSpec extends SparkTestBase {
  import spark.implicits._

  // English docs (pass the language + quality gates) with distinct
  // content words; structured so every composition stage has real work:
  //  - doc 100 (batch 0) and doc 5 (batch 2) carry the SAME text T —
  //    exact-dup displacement across batches (survivor 100 → 5);
  //  - doc 50 (batch 1) near-dups T (one word differs) — its canonical
  //    flips from 50 (vs 100) to 5 (vs 5) when the displacement lands;
  //  - doc 7's text equals the benchmark doc — contaminated, dropped;
  //  - the rest are clean singletons.
  private val T =
    "the river was slow and the boats were moving past the old stone bridge near our quiet town"
  private val Tnear =
    "the river was slow and the boats were moving past the old stone bridge near our quiet village"
  private val benchText =
    "cold rain fell on the market stalls and the sellers pulled covers over their fruit"
  private def row(id: Long, t: String) =
    (id, t, "en", s"src${id % 2}", t.length.toLong)
  private val batch0 = Seq(
    row(100L, T),
    row(2L, "a kitchen full of warm bread and the smell of coffee kept everyone at the table all morning"),
    row(7L, benchText))
  private val batch1 = Seq(
    row(50L, Tnear),
    row(3L, "his garden grew tall beans and sweet corn while the crows watched from the wooden fence"))
  private val batch2 = Seq(
    row(5L, T), // the displacing smaller id
    row(9L, "the library kept rare maps and heavy books that nobody had opened for many long years"))
  private val benchmark = Seq(row(900L, benchText))

  private def df(rows: Seq[(Long, String, String, String, Long)]): DataFrame =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  private def snap(dir: String): Seq[org.apache.spark.sql.Row] =
    StreamingRelease.snapshot(spark, dir, budget = 64L)
      .orderBy($"kind", $"shard").collect().toSeq

  test("streamed snapshot equals the batch releasePipeline over the union corpus (displacement included); replay pointer-skips") {
    val dir = java.nio.file.Files.createTempDirectory("srelease").toString
    Seq(batch0, batch1, batch2).zipWithIndex.foreach { case (b, i) =>
      StreamingRelease.applyBatch(df(b), df(benchmark), dir, i.toLong)
    }
    val want = Curation.releasePipeline(
        df(batch0 ++ batch1 ++ batch2), df(benchmark), budget = 64L)
      .orderBy($"kind", $"shard").collect().toSeq
    val got = snap(dir)
    assert(got === want)
    // the displaced survivor really swapped: doc 5 (not 100) must be the
    // clean-set member, and the near-dup loser 50 must be out
    val cleanIds = StreamingRelease.readClean(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(cleanIds.contains(5L) && !cleanIds.contains(100L) &&
      !cleanIds.contains(50L), s"clean set: $cleanIds")
    assert(!cleanIds.contains(7L), "contaminated doc must be dropped")
    // replay of the latest applied id: pointer-skipped, snapshot unchanged
    StreamingRelease.applyBatch(df(batch2), df(benchmark), dir, 2L)
    assert(StatePointer.read(spark, dir) === Some(2L))
    assert(snap(dir) === want)
    // an id behind the pointer throws (the tightened replayCheck)
    intercept[IllegalStateException] {
      StreamingRelease.applyBatch(df(batch0), df(benchmark), dir, 0L)
    }
    // vacuum reclaims superseded dedup state; the snapshot is unchanged
    StreamingRelease.vacuum(spark, dir)
    assert(snap(dir) === want)
  }

  test("erasure: erased survivor's hash RESTORES its next-smallest live copy; snapshot equals the batch pipeline over survivors") {
    val dir = java.nio.file.Files.createTempDirectory("sreleasee").toString
    // batch 0: T under ids 5 (survivor) and 100 (dup); the near-dup 50;
    // clean docs. batch 1: more docs. batch 2: adds + ERASE id 5 —
    // the survivor of hash(T) must fall back to 100 (whose bands
    // re-derive from the tombstone row's own text), and 100 then pairs
    // with 50 in the dedup state — canonical 50, so the final clean set
    // keeps 50 and drops 100.
    val b0 = Seq(row(5L, T), row(100L, T), row(50L, Tnear),
      row(2L, "a kitchen full of warm bread and the smell of coffee kept everyone at the table all morning"))
    val b1 = Seq(
      row(3L, "his garden grew tall beans and sweet corn while the crows watched from the wooden fence"),
      row(7L, benchText))
    val b2adds = Seq(
      row(9L, "the library kept rare maps and heavy books that nobody had opened for many long years"))
    def withDel(rows: Seq[(Long, String, String, String, Long)],
        dels: Seq[(Long, String, String, String, Long)]) =
      df(rows).withColumn("_deleted", org.apache.spark.sql.functions.lit(false))
        .unionByName(df(dels)
          .withColumn("_deleted", org.apache.spark.sql.functions.lit(true)))
    StreamingRelease.applyBatch(withDel(b0, Nil), df(benchmark), dir, 0L,
      deleteCol = Some("_deleted"))
    StreamingRelease.applyBatch(withDel(b1, Nil), df(benchmark), dir, 1L,
      deleteCol = Some("_deleted"))
    StreamingRelease.applyBatch(withDel(b2adds, Seq(row(5L, T))),
      df(benchmark), dir, 2L, deleteCol = Some("_deleted"))
    val want = Curation.releasePipeline(
        df((b0 ++ b1 ++ b2adds).filterNot(_._1 == 5L)), df(benchmark),
        budget = 64L)
      .orderBy($"kind", $"shard").collect().toSeq
    assert(snap(dir) === want)
    val cleanIds = StreamingRelease.readClean(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(!cleanIds.contains(5L), "erased id must leave the clean set")
    assert(cleanIds.contains(50L) && !cleanIds.contains(100L),
      s"restored survivor 100 must near-dup-lose to canonical 50: $cleanIds")
    StreamingRelease.vacuum(spark, dir)
    assert(snap(dir) === want)
  }

  test("erasure of the LAST copy of a hash removes it outright; erasing a gated-out id is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("sreleasel").toString
    val junk = row(40L, "zzz") // fails the quality gate — never ingested
    def withDel(rows: Seq[(Long, String, String, String, Long)],
        dels: Seq[(Long, String, String, String, Long)]) =
      df(rows).withColumn("_deleted", org.apache.spark.sql.functions.lit(false))
        .unionByName(df(dels)
          .withColumn("_deleted", org.apache.spark.sql.functions.lit(true)))
    StreamingRelease.applyBatch(withDel(batch0 :+ junk, Nil),
      df(benchmark), dir, 0L, deleteCol = Some("_deleted"))
    StreamingRelease.applyBatch(withDel(batch1, Seq(batch0.head, junk)),
      df(benchmark), dir, 1L, deleteCol = Some("_deleted"))
    val want = Curation.releasePipeline(
        df(batch0.tail ++ batch1), df(benchmark), budget = 64L)
      .orderBy($"kind", $"shard").collect().toSeq
    assert(snap(dir) === want)
  }

  test("an all-duplicates batch (nothing new survives) folds cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("sreleasedup").toString
    StreamingRelease.applyBatch(df(batch0), df(benchmark), dir, 0L)
    // every doc is a higher-id copy of an already-seen text: the dedup
    // fold gets an EMPTY batch — the state machine must not corrupt
    val dups = batch0.map { case (id, t, l, s, n) => (id + 1000L, t, l, s, n) }
    StreamingRelease.applyBatch(df(dups), df(benchmark), dir, 1L)
    val want = Curation.releasePipeline(
        df(batch0 ++ dups), df(benchmark), budget = 64L)
      .orderBy($"kind", $"shard").collect().toSeq
    assert(snap(dir) === want)
  }
}
