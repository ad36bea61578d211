package graft

import org.apache.spark.sql.functions.{col, expr}

import graft.llm.{Search, Similarity}
import graft.streaming.{StreamingIndex, StreamingIvf}

/** Randomized churn equivalence for the segmented streaming states: ANY
  * legal change sequence (adds, erasures, re-ingests with changed
  * content, del-only batches, empty batches), at ANY compaction cadence
  * (maxSegments 1 = compact every batch, 3 = mid-stream folds, 8 = all
  * segments stay live), must serve exactly the batch rebuild over the
  * live rows. Seeded generators — deterministic across runs. The
  * hand-written specs pin single scenarios; this pins the CLOSURE of the
  * contract: erase → re-ingest → erase-again cycles, tombstones landing
  * in consecutive batches, a vacuum mid-sequence, and a replay of an
  * already-applied batch, in whatever order the seed deals them. */
class StreamingChurnPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val ids = (0L until 12L).toVector

  /** One random legal batch against the current live map: erases carry
    * the CURRENT row (the full-row-tombstone convention), adds of a live
    * id are forbidden, no add+erase of one id in a batch. Returns the
    * batch rows and the updated live map. */
  private def nextBatch(rng: scala.util.Random, live: Map[Long, Int],
      gen: Int): (Seq[(Long, Int, Boolean)], Map[Long, Int]) = {
    var l = live
    var rows = Vector.empty[(Long, Int, Boolean)]
    val touched = scala.collection.mutable.Set.empty[Long]
    for (_ <- 0 until rng.nextInt(4)) { // 0..3 ops — empty batches happen
      val id = ids(rng.nextInt(ids.length))
      if (!touched(id)) {
        touched += id
        l.get(id) match {
          case Some(g) if rng.nextBoolean() => // erase, tombstone = current row
            rows :+= ((id, g, true)); l -= id
          case Some(_) => () // leave it alone
          case None => // (re-)ingest with fresh content
            rows :+= ((id, gen, false)); l += id -> gen
        }
      }
    }
    (rows, l)
  }

  private def text(id: Long, gen: Int): String =
    s"gen$gen word${id % 5} alpha shared${(id + gen) % 3} tail$id body$gen"

  test("index churn: any legal change sequence at any compaction cadence serves the rebuild") {
    // (maxSegments, majorRatio): ratio 1e9 forces MINOR compaction at
    // every trigger after the first major — the tail-run fold under
    // churn, dels landing anywhere in the window
    for (seed <- 1 to 3; (maxSegments, ratio) <- Seq((1, 0.2), (3, 0.2),
        (8, 0.2), (2, 1e9), (3, 1e9))) {
      val rng = new scala.util.Random(seed * 31 + maxSegments + ratio.toInt)
      val dir = java.nio.file.Files.createTempDirectory(
        s"sidxprop_${seed}_$maxSegments").toString
      var live = Map.empty[Long, Int]
      var replayed = false
      for (b <- 0 until 6) {
        val (rows, l) = nextBatch(rng, live, gen = b)
        live = l
        val df = rows.map { case (id, g, del) => (id, text(id, g), del) }
          .toDF("doc_id", "text", "_deleted")
        StreamingIndex.applyBatch(df, dir, b.toLong,
          deleteCol = Some("_deleted"), maxSegments = maxSegments,
          majorRatio = ratio)
        if (b == 3) StreamingIndex.vacuum(spark, dir)
        if (b == 4 && !replayed) {
          // replay the immediately-applied id (what foreachBatch actually
          // re-delivers after a crash): must skip idempotently
          StreamingIndex.applyBatch(df, dir, b.toLong,
            deleteCol = Some("_deleted"), maxSegments = maxSegments,
            majorRatio = ratio)
          // a FAR-behind id is a checkpoint/state mismatch: refused
          intercept[IllegalStateException] {
            StreamingIndex.applyBatch(df, dir, (b - 2).toLong,
              deleteCol = Some("_deleted"), maxSegments = maxSegments,
              majorRatio = ratio)
          }
          replayed = true
        }
      }
      val fin = live.toSeq.map { case (id, g) => (id, text(id, g)) }
        .toDF("doc_id", "text")
      val ctx = s"seed=$seed maxSegments=$maxSegments live=${live.keySet.toSeq.sorted}"
      assert(Search.renderIndex(StreamingIndex.readIndex(spark, dir))
        .orderBy($"gram").collect().toSeq
        === Search.renderIndex(Search.invertedIndexRaw(fin))
          .orderBy($"gram").collect().toSeq, ctx)
      assert(StreamingIndex.readStats(spark, dir).collect().toSeq
        === Search.corpusStats(fin).collect().toSeq, ctx)
    }
  }

  test("index churn, del-heavy cadence: pure-tombstone batches (the del-run fold path) still serve the rebuild") {
    // erasure-sweep-shaped sequences: bulk ingest, then mostly PURE
    // tombstone batches with occasional re-ingests — the cadence that
    // exercises SegmentedState.delRunPlan (trailing pure-del runs folding
    // into one del segment) interleaved with adds that break the runs
    for (seed <- 1 to 3; maxSegments <- Seq(2, 3)) {
      val rng = new scala.util.Random(seed * 97 + maxSegments)
      val dir = java.nio.file.Files.createTempDirectory(
        s"sidxdel_${seed}_$maxSegments").toString
      var live = Map.empty[Long, Int]
      for (b <- 0 until 10) {
        val rows: Seq[(Long, Int, Boolean)] =
          if (b < 2) { // bulk ingest halves
            val batch = ids.filter(_ % 2 == b).map(id => (id, b, false))
            live ++= batch.map(r => r._1 -> r._2)
            batch
          } else if (live.nonEmpty && rng.nextDouble() < 0.7) {
            // pure-tombstone batch: erase a random non-empty subset
            val pool = live.keys.toSeq.sorted
            val targets = pool.filter(_ => rng.nextDouble() < 0.4) match {
              case Seq() => Seq(pool(rng.nextInt(pool.size)))
              case ts => ts
            }
            val batch = targets.map(id => (id, live(id), true))
            live --= targets
            batch
          } else { // mixed batch (re-ingests + erases) breaks the del run
            val (batch, l) = nextBatch(rng, live, gen = b)
            live = l
            batch
          }
        StreamingIndex.applyBatch(
          rows.map { case (id, g, del) => (id, text(id, g), del) }
            .toDF("doc_id", "text", "_deleted"),
          dir, b.toLong, deleteCol = Some("_deleted"),
          maxSegments = maxSegments, majorRatio = 1e9)
        if (b == 5) StreamingIndex.vacuum(spark, dir)
      }
      val fin = live.toSeq.map { case (id, g) => (id, text(id, g)) }
        .toDF("doc_id", "text")
      val ctx = s"seed=$seed maxSegments=$maxSegments live=${live.keySet.toSeq.sorted}"
      assert(Search.renderIndex(StreamingIndex.readIndex(spark, dir))
        .orderBy($"gram").collect().toSeq
        === Search.renderIndex(Search.invertedIndexRaw(fin))
          .orderBy($"gram").collect().toSeq, ctx)
      assert(StreamingIndex.readStats(spark, dir).collect().toSeq
        === Search.corpusStats(fin).collect().toSeq, ctx)
    }
  }

  test("snapshot churn: random upsert/delete sequences at any compaction cadence serve the sequential fold") {
    import graft.streaming.StreamingSnapshot
    for (seed <- 1 to 2; (maxSegments, ratio) <- Seq((1, 0.2), (3, 0.2),
        (2, 1e9))) {
      val rng = new scala.util.Random(seed * 23 + maxSegments + ratio.toInt)
      val dir = java.nio.file.Files.createTempDirectory(
        s"snapprop_${seed}_$maxSegments").toString
      var batches = Vector.empty[Seq[(Long, String, Boolean)]]
      for (b <- 0 until 6) {
        // unlike the derived-artifact states, ANY change is legal here:
        // updates of live keys, deletes of absent keys, re-inserts —
        // LWW absorbs all of it (one row per key per batch, the
        // railUniqueKeys contract)
        val ks = rng.shuffle(ids).take(rng.nextInt(4))
        val rows = ks.map(k => (k, s"v${b}_$k", rng.nextInt(4) == 0))
        batches :+= rows
        StreamingSnapshot.applyBatch(rows.toDF("k", "v", "_deleted"), dir,
          Seq("k"), "_deleted", b.toLong, maxSegments = maxSegments,
          majorRatio = ratio)
        if (b == 3) StreamingSnapshot.vacuum(spark, dir)
      }
      val want = batches.map(_.toDF("k", "v", "_deleted"))
        .foldLeft(Seq.empty[(Long, String, Boolean)]
          .toDF("k", "v", "_deleted").drop("_deleted")) { (snap, b) =>
          graft.sources.Merge.upsert(snap, b, Seq("k"))
        }
        .orderBy(col("k")).collect().toSeq
      val ctx = s"seed=$seed maxSegments=$maxSegments ratio=$ratio"
      assert(StreamingSnapshot.readSnapshot(spark, dir)
        .orderBy(col("k")).collect().toSeq === want, ctx)
    }
  }

  test("dedup churn: labels under add/erase/re-ingest cycles equal the rebuild over the live corpus") {
    // template + family token ⇒ same-family docs are near-dups (identical
    // texts); the family key moves with the generation, so a re-ingested
    // doc can change cluster membership
    val tmpl = (1 to 9).map(i => s"base$i").mkString(" ")
    def dtext(id: Long, gen: Int): String = s"$tmpl fam${(id + gen) % 3}"
    for (seed <- 1 to 2; (maxSegments, ratio) <- Seq((2, 0.2), (4, 0.2),
        (2, 1e9))) {
      val rng = new scala.util.Random(seed * 13 + maxSegments + ratio.toInt)
      val dir = java.nio.file.Files.createTempDirectory(
        s"sdedupprop_${seed}_$maxSegments").toString
      var live = Map.empty[Long, Int]
      for (b <- 0 until 5) {
        val (rows, l) = nextBatch(rng, live, gen = b)
        live = l
        val df = rows.map { case (id, g, del) => (id, dtext(id, g), del) }
          .toDF("doc_id", "text", "_deleted")
        graft.streaming.StreamingDedup.applyBatch(df, dir, b.toLong,
          deleteCol = Some("_deleted"), maxSegments = maxSegments,
          majorRatio = ratio)
        if (b == 3) graft.streaming.StreamingDedup.vacuum(spark, dir)
      }
      val fin = live.toSeq.map { case (id, g) => (id, dtext(id, g)) }
        .toDF("doc_id", "text")
      val ctx = s"seed=$seed maxSegments=$maxSegments live=${live.keySet.toSeq.sorted}"
      assert(graft.streaming.StreamingDedup.readLabels(spark, dir)
        .orderBy($"doc_id").collect().toSeq
        === graft.llm.Dedup.clusters(
            graft.llm.Dedup.minhashNearDups(fin, threshold = 0.6))
          .orderBy($"doc_id").collect().toSeq, ctx)
    }
  }

  test("centroid churn: served centroids under add/erase/re-ingest cycles equal the recompute") {
    def cvec(id: Long, gen: Int): Array[Double] = {
      val d = (id + gen) % 3
      Array(if (d == 0) 1.0 else 0.0, if (d == 1) 1.0 else 0.0,
        if (d == 2) 1.0 else 0.0, 0.1 * (id % 4))
    }
    for (seed <- 1 to 2; (maxSegments, ratio) <- Seq((2, 0.2), (4, 0.2),
        (2, 1e9))) {
      val rng = new scala.util.Random(seed * 7 + maxSegments + ratio.toInt)
      val dir = java.nio.file.Files.createTempDirectory(
        s"scentprop_${seed}_$maxSegments").toString
      var live = Map.empty[Long, Int]
      for (b <- 0 until 5) {
        val (rows, l) = nextBatch(rng, live, gen = b)
        live = l
        val df = rows.map { case (id, g, del) =>
          (id, id % 2, cvec(id, g), del) }
          .toDF("vec_id", "label", "embedding", "_deleted")
        graft.streaming.StreamingCentroids.applyBatch(df, dir, b.toLong,
          deleteCol = Some("_deleted"), maxSegments = maxSegments,
          majorRatio = ratio)
        if (b == 3) graft.streaming.StreamingCentroids.vacuum(spark, dir)
      }
      val fin = live.toSeq.map { case (id, g) => (id, id % 2, cvec(id, g)) }
        .toDF("vec_id", "label", "embedding")
      val ctx = s"seed=$seed maxSegments=$maxSegments live=${live.keySet.toSeq.sorted}"
      assert(graft.streaming.StreamingCentroids.readCentroids(spark, dir)
        .orderBy($"cluster_id", $"dim").collect().toSeq
        === Similarity.clusterCentroids(fin,
            Similarity.cosinePairsBlocked(fin, "label", 0.4))
          .orderBy($"cluster_id", $"dim").collect().toSeq, ctx)
    }
  }

  test("scd2 churn: random per-key state walks at any compaction cadence serve the rebuilt history") {
    for (seed <- 1 to 2; (maxSegments, ratio) <- Seq((1, 0.2), (3, 0.2),
        (2, 1e9))) {
      val rng = new scala.util.Random(seed * 11 + maxSegments + ratio.toInt)
      val dir = java.nio.file.Files.createTempDirectory(
        s"scd2prop_${seed}_$maxSegments").toString
      var eid = 0L
      var all = Vector.empty[(Long, Long, String, Long)]
      for (b <- 0 until 5) {
        // each batch: 0..4 events, timestamps strictly increasing across
        // batches (the watermark-ordered precondition); states repeat so
        // consecutive-duplicate collapsing and re-opens both happen
        val rows = (0 until rng.nextInt(5)).map { i =>
          eid += 1
          (eid, ids(rng.nextInt(ids.length)),
            s"s${rng.nextInt(3)}", b * 100000L + i * 1000L + eid)
        }
        all ++= rows
        val df = rows.toDF("event_id", "user_id", "event_type", "ms")
          .withColumn("ts", expr("timestamp_millis(ms)")).drop("ms")
        graft.streaming.StreamingScd2.applyBatch(df, dir, "user_id", "ts",
          "event_type", "event_id", b.toLong, maxSegments,
          majorRatio = ratio)
        if (b == 3) graft.streaming.StreamingScd2.vacuum(spark, dir)
      }
      val fin = all.toDF("event_id", "user_id", "event_type", "ms")
        .withColumn("ts", expr("timestamp_millis(ms)")).drop("ms")
      val ctx = s"seed=$seed maxSegments=$maxSegments n=${all.size}"
      assert(graft.streaming.StreamingScd2.readHistory(spark, dir)
        .orderBy($"user_id", $"version").collect().toSeq
        === graft.analytics.Analytics.scd2History(fin)
          .orderBy($"user_id", $"version").collect().toSeq, ctx)
    }
  }

  test("ivf churn: any legal change sequence at any compaction cadence serves the rebuild") {
    def vec(id: Long, gen: Int): Array[Double] =
      Array(1.0 + id, 0.1 * gen, (id % 3).toDouble, 1.0)
    val centers = Similarity.ivfCenters(
      ids.map(i => (i, vec(i, 0))).toDF("vec_id", "embedding"), nCells = 4)
    for (seed <- 1 to 2; (maxSegments, ratio) <- Seq((1, 0.2), (3, 0.2),
        (2, 1e9))) {
      val rng = new scala.util.Random(seed * 17 + maxSegments + ratio.toInt)
      val dir = java.nio.file.Files.createTempDirectory(
        s"sivfprop_${seed}_$maxSegments").toString
      var live = Map.empty[Long, Int]
      for (b <- 0 until 6) {
        val (rows, l) = nextBatch(rng, live, gen = b)
        live = l
        val df = rows.map { case (id, g, del) => (id, vec(id, g), del) }
          .toDF("vec_id", "embedding", "_deleted")
        StreamingIvf.applyBatch(df, dir, b.toLong, centers,
          deleteCol = Some("_deleted"), maxSegments = maxSegments,
          majorRatio = ratio)
        if (b == 4) StreamingIvf.vacuum(spark, dir)
      }
      val fin = live.toSeq.map { case (id, g) => (id, vec(id, g)) }
        .toDF("vec_id", "embedding")
      val ctx = s"seed=$seed maxSegments=$maxSegments live=${live.keySet.toSeq.sorted}"
      // hive-partitioned bases return the partition column last — select
      // a canonical order before comparing
      val cols = Seq("vec_id", "cell", "vnorm").map(col)
      assert(StreamingIvf.readIndex(spark, dir).select(cols: _*)
        .orderBy($"vec_id").collect().toSeq
        === Similarity.ivfAssignments(fin, centers).select(cols: _*)
          .orderBy($"vec_id").collect().toSeq, ctx)
    }
  }
}
