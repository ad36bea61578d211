package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Similarity
import graft.streaming.StreamingGraphAnn

/** Always-on graph-ANN maintenance contracts: the streamed fold
  * (bootstrap build + insertDelta batches) serves the exact top-k over
  * the live view on a clustered corpus, supersede-by-src state stays
  * degree-capped through compaction, erasure physically scrubs the
  * doomed ids out of every surviving file (edges AND the vec sidecar),
  * replays pointer-skip, and behind-the-pointer ids throw. */
class StreamingGraphAnnSpec extends SparkTestBase {
  import spark.implicits._

  // the GraphAnnSpec clustered corpus: 4 well-separated clusters of 12
  // vectors in 64 dims — true top-k of any member is inside its cluster
  private def clustered() = {
    val rows = for (c <- 0 until 4; i <- 0 until 12) yield {
      val v = Array.fill(64)(0.0)
      for (d <- 0 until 4) v(16 * c + d) = 1.0 + 0.01 * ((i * 7 + d) % 5)
      v(63 - (c * 12 + i) % 8) += 0.05
      ((c * 12 + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def fold(emb: DataFrame, dir: String, nBatches: Int,
      maxSegments: Int = 3): Unit =
    (0 until nBatches).foreach { b =>
      StreamingGraphAnn.applyBatch(
        emb.filter($"vec_id" % nBatches === b), dir, b.toLong,
        m = 8, lshBits = 4, probes = 2, ef = 24, iters = 3, entries = 8,
        maxSegments = maxSegments)
    }

  test("streamed fold serves the exact top-k over the live view; compaction partitions the base; vec view = live ids; degree cap") {
    val emb = clustered().localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("sgann").toString
    fold(emb, dir, 3, maxSegments = 2) // compaction fires at batch 1
    val g = StreamingGraphAnn.readGraph(spark, dir).localCheckpoint()
    val maxDeg = g.groupBy($"src").count().agg(max($"count"))
      .head().getLong(0)
    assert(maxDeg <= 8L, s"out-degree $maxDeg exceeds m=8 in the view")
    assert(StreamingGraphAnn.readVecs(spark, dir)
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
      === (0L until 48L).toSeq, "vec sidecar must hold exactly the live ids")
    // the maintained walk re-finds the exact top-5 (queries span batches)
    val pred = $"vec_id" < 3L || $"vec_id" > 44L
    val exact = Similarity.bruteForceKnn(emb, pred, k = 5)
      .select($"qid", $"rank", $"neighbor_id").collect().toSeq
    val got = StreamingGraphAnn.knn(spark, dir, pred, k = 5,
        ef = 24, iters = 3, entries = 8)
      .select($"qid", $"rank", $"neighbor_id").collect().toSeq
    assert(got === exact,
      "maintained-state walk must re-find the exact top-5")
    // the compacted base is hive-partitioned by bucket
    val baseDirs = new java.io.File(s"$dir/base").listFiles()
    assert(baseDirs != null && baseDirs.nonEmpty, "compaction must have run")
    assert(new java.io.File(baseDirs.head, "edges").listFiles()
      .exists(_.getName.startsWith("b=")),
      "compacted edges must be partitioned by b")
  }

  test("erasure: doomed ids leave the live view, survivors re-wire, compaction + vacuum physically scrub every remaining file") {
    val emb = clustered().localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("sganne").toString
    val doomedIds = Seq(13L, 14L, 15L)
    (0 until 3).foreach { b => // three add batches
      StreamingGraphAnn.applyBatch(
        emb.filter($"vec_id" % 3 === b).withColumn("_deleted", lit(false)),
        dir, b.toLong, m = 8, lshBits = 4, probes = 2, ef = 24, iters = 3,
        entries = 8, deleteCol = Some("_deleted"), maxSegments = 99)
    }
    // batch 3: PURE tombstones (the adds-empty path)
    StreamingGraphAnn.applyBatch(
      emb.filter($"vec_id".isin(doomedIds: _*))
        .withColumn("_deleted", lit(true)),
      dir, 3L, m = 8, lshBits = 4, probes = 2, ef = 24, iters = 3,
      entries = 8, deleteCol = Some("_deleted"), maxSegments = 99)
    val g = StreamingGraphAnn.readGraph(spark, dir).localCheckpoint()
    assert(g.filter($"src".isin(doomedIds: _*) ||
      $"dst".isin(doomedIds: _*)).count() === 0L,
      "erased ids must leave the live edge view")
    assert(StreamingGraphAnn.readVecs(spark, dir)
      .filter($"id".isin(doomedIds: _*)).count() === 0L,
      "erased ids must leave the live vec view")
    // the survivors' walk stays exact — cluster-1 members re-wired
    // through the bridge repair
    val survivors = emb.filter(!$"vec_id".isin(doomedIds: _*))
      .localCheckpoint()
    val pred = $"vec_id" >= 12L && $"vec_id" < 20L &&
      !$"vec_id".isin(doomedIds: _*)
    val exact = Similarity.bruteForceKnn(survivors, pred, k = 5)
      .select($"qid", $"rank", $"neighbor_id").collect().toSeq
    val got = StreamingGraphAnn.knn(spark, dir, pred, k = 5,
        ef = 24, iters = 3, entries = 8)
      .select($"qid", $"rank", $"neighbor_id").collect().toSeq
    assert(got === exact, "post-erasure walk must stay exact on survivors")
    // physical scrub: after compaction + vacuum no surviving file —
    // edges or vecs — contains a doomed id anywhere
    StreamingGraphAnn.compact(spark, dir)
    StreamingGraphAnn.vacuum(spark, dir)
    def surviving(sub: String): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      for {
        root <- Seq(new java.io.File(s"$dir/seg"), new java.io.File(s"$dir/base"))
        vdir <- Option(root.listFiles()).toSeq.flatten
        sdir = new java.io.File(vdir, sub)
        if sdir.exists()
        f <- walk(sdir) if f.getName.endsWith(".parquet")
      } yield sdir.getAbsolutePath
    }.distinct
    val edgeDirs = surviving("edges")
    assert(edgeDirs.nonEmpty)
    for (d <- edgeDirs)
      assert(spark.read.parquet(d)
        .filter($"src".isin(doomedIds: _*) || $"dst".isin(doomedIds: _*))
        .count() === 0L, s"doomed id survives in $d")
    for (d <- surviving("vecs"))
      assert(spark.read.parquet(d).filter($"id".isin(doomedIds: _*))
        .count() === 0L, s"doomed vec survives in $d")
  }

  test("replay pointer-skips idempotently; a behind-the-pointer id throws") {
    val emb = clustered().localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("sgannr").toString
    fold(emb, dir, 3)
    val before = StreamingGraphAnn.readGraph(spark, dir)
      .select($"src", $"dst").collect().toSet
    // foreachBatch re-delivery of the committed id: skip, state unchanged
    StreamingGraphAnn.applyBatch(
      emb.filter($"vec_id" % 3 === 2), dir, 2L,
      m = 8, lshBits = 4, probes = 2, ef = 24, iters = 3, entries = 8)
    assert(StreamingGraphAnn.readGraph(spark, dir)
      .select($"src", $"dst").collect().toSet === before)
    // a fresh checkpoint pointed at existing state: loud failure
    intercept[IllegalStateException] {
      StreamingGraphAnn.applyBatch(
        emb.filter($"vec_id" % 3 === 0), dir, 0L,
        m = 8, lshBits = 4, probes = 2, ef = 24, iters = 3, entries = 8)
    }
  }
}
