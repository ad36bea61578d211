package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.Analytics
import graft.sources.Merge

/** Semantics pins for the warehouse-maintenance pair beyond what the
  * catalog oracles exercise: MERGE's three clauses on a hand fixture, the
  * duplicate-batch-key rail, and SCD2's collapse/interval/current rules. */
class WarehouseSpec extends SparkTestBase {
  import spark.implicits._

  test("merge upsert: update wins, tombstone removes, insert lands, bulk unchanged") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
    val batch = Seq(
      (2L, "B", 99.0, false), // update
      (3L, "c", 30.0, true),  // delete
      (4L, "d", 40.0, false)  // insert
    ).toDF("k", "v", "x", "_deleted")
    val out = Merge.upsert(snap, batch, Seq("k")).orderBy($"k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "a", 10.0), (2L, "B", 99.0), (4L, "d", 40.0)))
  }

  test("merge upsert: duplicate non-tombstone batch key fails the job") {
    val snap = Seq((1L, "a")).toDF("k", "v")
    val batch = Seq((2L, "x", false), (2L, "y", false))
      .toDF("k", "v", "_deleted")
    val e = intercept[Exception] {
      Merge.upsert(snap, batch, Seq("k")).collect()
    }
    assert(e.getMessage.contains("duplicate batch key"), e.getMessage)
    // duplicate PURE tombstones are idempotent, not ambiguous — allowed
    val tombs = Seq((1L, "a", true), (1L, "a", true)).toDF("k", "v", "_deleted")
    assert(Merge.upsert(snap, tombs, Seq("k")).count() === 0L)
  }

  test("scd2Apply: append equals recompute; no-op batch keeps the row open") {
    val ms = (m: Long) => new Timestamp(m)
    val events = Seq(
      (1L, 1L, "free", ms(0L)), (2L, 1L, "paid", ms(1000L)),
      (3L, 2L, "free", ms(500L)),
      // batch (ts >= 2000): u1 no-op (still paid) then a real change;
      // u2 no-op only; u3 is a brand-new key
      (4L, 1L, "paid", ms(2000L)), (5L, 1L, "free", ms(3000L)),
      (6L, 2L, "free", ms(2500L)),
      (7L, 3L, "trial", ms(2200L))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val hist = Analytics.scd2History(events.filter($"ts" < ms(2000L)))
    val applied = Analytics.scd2Apply(hist, events.filter($"ts" >= ms(2000L)))
    val full = Analytics.scd2History(events)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy($"user_id", $"version").collect().toSeq.map(_.toSeq)
    assert(key(applied) === key(full))
    // u2's open row survived untouched; u3 opened at version 1
    val cur = applied.filter($"is_current").orderBy($"user_id")
      .select($"user_id", $"state", $"version").as[(Long, String, Int)]
      .collect().toSeq
    assert(cur === Seq((1L, "free", 3), (2L, "free", 1), (3L, "trial", 1)))
  }

  test("scd2Apply: out-of-order batch event fails the rail, not the answer") {
    val ms = (m: Long) => new Timestamp(m)
    val events = Seq(
      (1L, 1L, "free", ms(1000L)), (2L, 1L, "paid", ms(2000L))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val hist = Analytics.scd2History(events)
    val stale = Seq((9L, 1L, "trial", ms(1500L)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val e = intercept[Exception] {
      Analytics.scd2Apply(hist, stale).collect()
    }
    assert(e.getMessage.contains("not newer"), e.getMessage)
  }

  test("streaming snapshot: change batches fold into the latest state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingSnapshot
    val dir = java.nio.file.Files.createTempDirectory("snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("snapckpt").toString
    val input = MemoryStream[(Long, String, Boolean)](spark)
    val changes = input.toDF().toDF("k", "v", "_deleted")
    // batch 1: three inserts; batch 2 (a separate query run over the same
    // checkpoint — AvailableNow folds all queued data into one batch):
    // update k=2, delete k=3, insert k=4
    input.addData((1L, "a", false), (2L, "b", false), (3L, "c", false))
    val q1 = StreamingSnapshot.writer(changes, dir, Seq("k"), ckpt,
      trigger = Trigger.AvailableNow()).start()
    q1.processAllAvailable(); q1.stop()
    input.addData((2L, "B", false), (3L, "c", true), (4L, "d", false))
    val q2 = StreamingSnapshot.writer(changes, dir, Seq("k"), ckpt,
      trigger = Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    val snap = StreamingSnapshot.readSnapshot(spark, dir)
      .orderBy($"k").as[(Long, String)].collect().toSeq
    assert(snap === Seq((1L, "a"), (2L, "B"), (4L, "d")))
    assert(StreamingSnapshot.latestVersion(spark, dir) === Some(1L))
    // replaying an applied batch is a detected no-op
    StreamingSnapshot.applyBatch(
      Seq((9L, "z", false)).toDF("k", "v", "_deleted"), dir, Seq("k"),
      "_deleted", batchId = 1L)
    assert(StreamingSnapshot.readSnapshot(spark, dir).count() === 3L)
  }

  test("segmented snapshot: MoR view ≡ sequential upserts; write ∝ batch; compaction + vacuum") {
    import graft.streaming.StreamingSnapshot
    def duBytes(path: String): Long = {
      val root = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(root)) 0L
      else {
        val s = java.nio.file.Files.walk(root)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("snapseg").toString
    val big = (1L to 5000L)
      .map(i => (i, s"payload-$i-${"x" * 40}-${i * 7919}", false))
    val b1 = Seq((2L, "B", false), (3L, "x", true), (1001L, "new", false))
    val b2 = Seq((1001L, "newer", false), (5L, "y", true))

    StreamingSnapshot.applyBatch(big.toDF("k", "v", "_deleted"), dir,
      Seq("k"), "_deleted", batchId = 0L)
    val bytesBig = duBytes(s"$dir/seg/v=0")
    StreamingSnapshot.applyBatch(b1.toDF("k", "v", "_deleted"), dir,
      Seq("k"), "_deleted", batchId = 1L)
    val bytesSmall = duBytes(s"$dir/seg/v=1")
    // the r9 writer rewrote the whole snapshot per batch
    assert(bytesSmall > 0 && bytesSmall * 5 < bytesBig,
      s"batch write not ∝ batch: small=$bytesSmall big=$bytesBig")

    // MoR view ≡ sequential Merge.upsert folds (the r9 semantics)
    def seqUpsert(batches: Seq[Seq[(Long, String, Boolean)]]) =
      batches.map(_.toDF("k", "v", "_deleted"))
        .foldLeft(Seq.empty[(Long, String, Boolean)].toDF("k", "v", "_deleted")
          .drop("_deleted")) { (snap, b) =>
          graft.sources.Merge.upsert(snap, b, Seq("k"))
        }
    val want12 = seqUpsert(Seq(big, b1)).orderBy($"k")
      .as[(Long, String)].collect().toSeq
    assert(StreamingSnapshot.readSnapshot(spark, dir).orderBy($"k")
      .as[(Long, String)].collect().toSeq === want12)

    // third batch hits maxSegments=3: compacts to a bucketed base
    StreamingSnapshot.applyBatch(b2.toDF("k", "v", "_deleted"), dir,
      Seq("k"), "_deleted", batchId = 2L, maxSegments = 3)
    assert(new java.io.File(s"$dir/base/v=2").exists())
    assert(new java.io.File(s"$dir/base/v=2").listFiles()
      .exists(_.getName.startsWith("b=")), "base must be bucket-partitioned")
    val wantAll = seqUpsert(Seq(big, b1, b2)).orderBy($"k")
      .as[(Long, String)].collect().toSeq
    def got() = StreamingSnapshot.readSnapshot(spark, dir).orderBy($"k")
      .as[(Long, String)].collect().toSeq
    assert(got() === wantAll)

    // vacuum reclaims compacted segments; view unchanged; replay of the
    // LAST batch (the only id foreachBatch ever re-delivers) is
    // pointer-skipped before touching any state dir
    StreamingSnapshot.vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/seg/v=0").exists())
    assert(got() === wantAll)
    StreamingSnapshot.applyBatch(b2.toDF("k", "v", "_deleted"), dir,
      Seq("k"), "_deleted", batchId = 2L, maxSegments = 3)
    assert(got() === wantAll)
    // an id MORE than one behind is NOT a replay — it's a fresh
    // checkpoint pointed at existing state, and must throw, not no-op
    intercept[IllegalStateException] {
      StreamingSnapshot.applyBatch(big.toDF("k", "v", "_deleted"), dir,
        Seq("k"), "_deleted", batchId = 0L)
    }
    assert(got() === wantAll)

    // post-compaction ingest reopens the segment log over the new base
    val b3 = Seq((1L, "A2", false), (2001L, "late", false))
    StreamingSnapshot.applyBatch(b3.toDF("k", "v", "_deleted"), dir,
      Seq("k"), "_deleted", batchId = 3L)
    val wantB3 = seqUpsert(Seq(big, b1, b2, b3)).orderBy($"k")
      .as[(Long, String)].collect().toSeq
    assert(got() === wantB3)
  }

  test("segmented snapshot: minor compaction LWW-folds the window, tombstones keep shadowing the base") {
    import graft.streaming.StreamingSnapshot
    def baseState(dir: String): Seq[(String, Long)] = {
      val b = new java.io.File(s"$dir/base")
      if (!b.exists()) Nil
      else {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(b).map(f => (f.getPath, f.length())).sortBy(_._1)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("snapminor").toString
    val big = (1L to 3000L).map(i => (i, s"payload-$i-${"x" * 30}", false))
    def apply(rows: Seq[(Long, String, Boolean)], b: Long,
        ratio: Double): Unit =
      StreamingSnapshot.applyBatch(rows.toDF("k", "v", "_deleted"), dir,
        Seq("k"), "_deleted", b, maxSegments = 3, majorRatio = ratio)
    // establish the base (first trigger always majors)
    apply(big.take(1000), 0L, 0.2)
    apply(big.slice(1000, 2000), 1L, 0.2)
    apply(big.slice(2000, 3000), 2L, 0.2)
    assert(new java.io.File(s"$dir/base/v=2").exists())
    val baseAfterMajor = baseState(dir)

    // tiny window: update key 1 twice, TOMBSTONE base key 2, add a new
    // key — the trigger at batch 5 must MINOR (huge ratio): one folded
    // segment, base bytes untouched, tombstone still shadows key 2
    apply(Seq((1L, "one-a", false)), 3L, 1e9)
    apply(Seq((1L, "one-b", false), (2L, "", true)), 4L, 1e9)
    apply(Seq((9001L, "fresh", false)), 5L, 1e9)
    assert(baseState(dir) === baseAfterMajor, "minor must not touch the base")
    assert(!new java.io.File(s"$dir/base/v=5").exists())
    assert(!new java.io.File(s"$dir/seg/v=3").exists() ||
      StreamingSnapshot.latestVersion(spark, dir).contains(5L))
    val snap = StreamingSnapshot.readSnapshot(spark, dir)
    assert(snap.filter($"k" === 1L).select($"v").as[String].collect()
      .toSeq === Seq("one-b"), "window LWW must pick the latest update")
    assert(snap.filter($"k" === 2L).count() === 0L,
      "a tombstone folded through a minor must keep shadowing the base")
    assert(snap.filter($"k" === 9001L).count() === 1L)
    assert(snap.count() === 3000L - 1L + 1L)
    // the folded segment is one row per key including the tombstone row
    val segRows = spark.read.parquet(s"$dir/seg/v=5").orderBy($"k")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(segRows === Seq((1L, "one-b", false), (2L, "", true),
      (9001L, "fresh", false)))
    // vacuum reclaims the folded window members; view unchanged
    StreamingSnapshot.vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/seg/v=3").exists())
    assert(StreamingSnapshot.readSnapshot(spark, dir).count() === 3000L)
  }

  test("streaming scd2: batched history equals the batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingScd2
    val dir = java.nio.file.Files.createTempDirectory("scd2s").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scd2ckpt").toString
    val input = MemoryStream[(Long, Long, String, Long)](spark)
    val events = input.toDF().toDF("event_id", "user_id", "event_type", "ms")
      .withColumn("ts", expr("timestamp_millis(ms)")).drop("ms")
    def run(): Unit = {
      val q = StreamingScd2.writer(events, dir, ckpt,
        trigger = Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    val all = Seq(
      (1L, 1L, "free", 0L), (2L, 1L, "free", 1000L), (3L, 1L, "paid", 2000L),
      (4L, 1L, "free", 3000L), (5L, 2L, "trial", 2500L))
    input.addData(all.take(3): _*); run()
    input.addData(all.drop(3): _*); run()
    val streamed = StreamingScd2.readHistory(spark, dir)
      .orderBy($"user_id", $"version").collect().toSeq.map(_.toSeq)
    val batch = {
      val df = all.toDF("event_id", "user_id", "event_type", "ms")
        .withColumn("ts", expr("timestamp_millis(ms)")).drop("ms")
      graft.analytics.Analytics.scd2History(df)
        .orderBy($"user_id", $"version").collect().toSeq.map(_.toSeq)
    }
    assert(streamed === batch)
  }

  test("streaming scd2: per-batch writes ∝ touched keys; compaction + vacuum + replay-after-vacuum") {
    import graft.streaming.StreamingScd2
    def duBytes(path: String): Long = {
      val root = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(root)) 0L
      else {
        val s = java.nio.file.Files.walk(root)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("scd2seg").toString
    def ev(rows: Seq[(Long, Long, String, Long)]) =
      rows.toDF("event_id", "user_id", "event_type", "ms")
        .withColumn("ts", expr("timestamp_millis(ms)")).drop("ms")
    // batch 0: 400 keys × 2 state changes; batch 1: 2 keys change again
    val big = (0L until 400L).flatMap(k => Seq(
      (k * 2, k, s"state_a_$k", k), (k * 2 + 1, k, s"state_b_$k", 10000L + k)))
    val small = Seq((9001L, 1L, "late_x", 50000L), (9002L, 2L, "late_y", 50001L))
    val tail = Seq((9003L, 3L, "tail_z", 60000L))
    def apply(rows: Seq[(Long, Long, String, Long)], b: Long,
        maxSegments: Int = 8): Unit =
      StreamingScd2.applyBatch(ev(rows), dir, "user_id", "ts", "event_type",
        "event_id", b, maxSegments)
    apply(big, 0L)
    val bytesBig = duBytes(s"$dir/seg/v=0")
    apply(small, 1L)
    val bytesSmall = duBytes(s"$dir/seg/v=1")
    // the r10 first cut rewrote the WHOLE history per batch; the delta
    // writer's bytes track the touched keys — the 100 TB contract
    assert(bytesSmall > 0 && bytesSmall * 5 < bytesBig,
      s"batch write not ∝ touched: small=$bytesSmall big=$bytesBig")

    def want(rows: Seq[(Long, Long, String, Long)]) =
      Analytics.scd2History(ev(rows))
        .orderBy($"user_id", $"version", $"valid_from")
        .collect().toSeq.map(_.toSeq)
    def got() = StreamingScd2.readHistory(spark, dir)
      .orderBy($"user_id", $"version", $"valid_from")
      .collect().toSeq.map(_.toSeq)
    assert(got() === want(big ++ small))

    // third batch reaches maxSegments=3: compacts both sides into the
    // key-bucketed base; view unchanged
    apply(tail, 2L, maxSegments = 3)
    assert(new java.io.File(s"$dir/base/v=2/closed").exists())
    assert(new java.io.File(s"$dir/base/v=2/open").listFiles()
      .exists(_.getName.startsWith("b=")), "base must be key-bucketed")
    assert(got() === want(big ++ small ++ tail))

    StreamingScd2.vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/seg/v=0").exists())
    assert(got() === want(big ++ small ++ tail))
    // replay of the LAST batch after vacuum: pointer-skipped before any
    // state dir is touched; a far-behind id is a checkpoint/state
    // mismatch and must throw (the StatePointer.replayCheck contract)
    apply(tail, 2L, maxSegments = 3)
    assert(got() === want(big ++ small ++ tail))
    intercept[IllegalStateException] { apply(big, 0L) }
    assert(got() === want(big ++ small ++ tail))
  }

  test("scd2: consecutive duplicates collapse; intervals chain half-open") {
    val ms = (m: Long) => new Timestamp(m)
    val events = Seq(
      (1L, 1L, "free", ms(0L)), (2L, 1L, "free", ms(1000L)),
      (3L, 1L, "paid", ms(2000L)), (4L, 1L, "paid", ms(3000L)),
      (5L, 1L, "free", ms(4000L)),
      (6L, 2L, "paid", ms(500L))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics.scd2History(events).orderBy($"user_id", $"version")
      .collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.map(_.getAs[String]("state")).toSeq === Seq("free", "paid", "free"))
    assert(u1.map(_.getAs[Int]("version")).toSeq === Seq(1, 2, 3))
    // half-open chaining: each valid_to equals the next valid_from
    assert(u1(0).getAs[Timestamp]("valid_to") === u1(1).getAs[Timestamp]("valid_from"))
    assert(u1(1).getAs[Timestamp]("valid_to") === u1(2).getAs[Timestamp]("valid_from"))
    assert(u1.map(_.getAs[Boolean]("is_current")).toSeq === Seq(false, false, true))
    val u2 = out.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length === 1 && u2.head.getAs[Boolean]("is_current"))
  }

  test("column profile: exact null and distinct counts; approx path Expand-free") {
    val df = Seq(
      (1L, Some("a"), Some(1.5)), (2L, Some("a"), None),
      (3L, None, Some(2.5)), (4L, Some("b"), Some(1.5)))
      .toDF("id", "s", "v")
    val got = graft.sources.Profile.profile(df, Seq("id", "s", "v"))
      .orderBy($"col_name")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("id", 4L, 0L, 4L), ("s", 4L, 1L, 2L),
      ("v", 4L, 1L, 2L)))
    // the HLL path must plan WITHOUT the k-way Expand multiplication
    val approxPlan = graft.sources.Profile.profile(df, Seq("id", "s", "v"),
      exact = false).queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan)
    assert(graft.sources.Profile.profile(df, Seq("id"))
      .queryExecution.executedPlan.toString.contains("Expand") ===
      false, "single distinct needs no Expand either")
  }
}
