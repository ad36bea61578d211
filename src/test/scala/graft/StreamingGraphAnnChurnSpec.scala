package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Similarity
import graft.streaming.StreamingGraphAnn

/** Randomized churn invariants for the maintained graph-ANN state. A
  * graph is PATH-DEPENDENT (edge sets depend on insertion order), so
  * unlike the index/IVF churn specs the invariant cannot be "≡ the batch
  * rebuild"; what MUST hold for any legal change sequence at any
  * compaction cadence is:
  *
  *  1. the vec view is exactly the live set, carrying each id's CURRENT
  *     vector (vector updates ride delete → later re-ingest);
  *  2. no erased id appears anywhere — src, dst, or vec row;
  *  3. NO STALE VECTOR COPY survives: every edge row's dst_vec equals
  *     the live generation's vector (erase drops every carried copy,
  *     re-ingest re-wires with the new one — the staleness bug class
  *     this spec exists to catch);
  *  4. out-degree stays ≤ m through every re-cap and repair;
  *  5. the maintained walk still finds the live truth (recall ≥ 0.8 on
  *     the clustered corpus — churn may thin the graph locally, the
  *     panel discipline prices that; seeds are fixed so this is
  *     deterministic, not flaky).
  *
  * Sequences include erase → re-ingest-with-changed-vector cycles,
  * pure-tombstone batches, empty batches, total-erasure → re-bootstrap,
  * a mid-sequence vacuum, replay of the applied id, and the far-behind
  * refusal. */
class StreamingGraphAnnChurnSpec extends SparkTestBase {
  import spark.implicits._

  private val ids = (0L until 24L).toVector
  private val M = 8

  /** Cluster fixed by id (stable geometry), magnitude jittered by gen —
    * a re-ingest changes the vector WITHOUT moving clusters, so truth
    * stays well-separated while staleness is detectable. */
  private def vec(id: Long, gen: Int): Seq[Double] = {
    val c = (id % 4).toInt
    val v = Array.fill(64)(0.0)
    for (d <- 0 until 4)
      v(16 * c + d) = 1.0 + 0.01 * ((id * 7 + d + gen * 3) % 5)
    v(63 - (id % 8).toInt) += 0.05 + 0.01 * (gen % 3)
    v.toSeq
  }

  private def df(rows: Seq[(Long, Int, Boolean)]): DataFrame =
    rows.map { case (id, g, del) => (id, vec(id, g), del) }
      .toDF("vec_id", "embedding", "_deleted")

  private def nextBatch(rng: scala.util.Random, live: Map[Long, Int],
      gen: Int): (Seq[(Long, Int, Boolean)], Map[Long, Int]) = {
    var l = live
    var rows = Vector.empty[(Long, Int, Boolean)]
    val touched = scala.collection.mutable.Set.empty[Long]
    for (_ <- 0 until rng.nextInt(6)) { // 0..5 ops — empty batches happen
      val id = ids(rng.nextInt(ids.length))
      if (!touched(id)) {
        touched += id
        l.get(id) match {
          case Some(g) if rng.nextBoolean() => // erase with the current row
            rows :+= ((id, g, true)); l -= id
          case Some(_) => ()
          case None => // (re-)ingest with the generation's vector
            rows :+= ((id, gen, false)); l += id -> gen
        }
      }
    }
    (rows, l)
  }

  private def applyB(rows: Seq[(Long, Int, Boolean)], dir: String,
      b: Long, maxSegments: Int): Unit =
    StreamingGraphAnn.applyBatch(df(rows), dir, b, m = M, lshBits = 4,
      probes = 2, ef = 24, iters = 3, entries = 8,
      deleteCol = Some("_deleted"), maxSegments = maxSegments)

  private def checkInvariants(dir: String, live: Map[Long, Int],
      ctx: String): Unit = {
    val liveIds = live.keySet
    val vecs = StreamingGraphAnn.readVecs(spark, dir).localCheckpoint()
    assert(vecs.select($"id").collect().map(_.getLong(0)).toSet === liveIds,
      s"vec view != live set $ctx")
    // current-generation vectors in the vec view
    val truth = live.toSeq.map { case (id, g) => (id, vec(id, g)) }
      .toDF("id", "tvec")
    assert(vecs.join(truth, Seq("id"))
      .filter(expr("vec != tvec")).count() === 0L,
      s"stale vector in vec view $ctx")
    if (liveIds.nonEmpty) {
      val g = StreamingGraphAnn.readGraph(spark, dir).localCheckpoint()
      val bad = g.filter(!$"src".isin(liveIds.toSeq: _*) ||
        !$"dst".isin(liveIds.toSeq: _*)).count()
      assert(bad === 0L, s"erased id survives in edges $ctx")
      // no stale dst_vec copy anywhere
      assert(g.join(truth.withColumnRenamed("id", "dst"), Seq("dst"))
        .filter(expr("dst_vec != tvec")).count() === 0L,
        s"stale dst_vec copy $ctx")
      val deg = g.groupBy($"src").count().agg(max($"count"))
        .head().getLong(0)
      assert(deg <= M.toLong, s"degree $deg > $M $ctx")
      // the maintained walk finds the live truth (clusters are intact)
      if (liveIds.size >= 6) {
        val liveEmb = truth.select($"id".as("vec_id"),
          $"tvec".as("embedding"))
        val exact = Similarity.bruteForceKnn(liveEmb, lit(true), k = 3)
          .select($"qid", $"neighbor_id").localCheckpoint()
        val approx = StreamingGraphAnn.knn(spark, dir, lit(true), k = 3,
            ef = 24, iters = 3, entries = 8)
          .select($"qid", $"neighbor_id")
        val hits = approx.join(exact, Seq("qid", "neighbor_id"),
          "left_semi").count()
        val total = exact.count()
        assert(hits.toDouble / total >= 0.8,
          s"churned-graph recall ${hits.toDouble / total} < 0.8 $ctx")
      }
    }
  }

  test("graph churn: any legal change sequence at any compaction cadence keeps the live view exact, scrubbed, fresh, capped, and navigable") {
    for (seed <- 1 to 3; maxSegments <- Seq(1, 3, 99)) {
      val rng = new scala.util.Random(seed * 31 + maxSegments)
      val dir = java.nio.file.Files.createTempDirectory(
        s"sgannprop_${seed}_$maxSegments").toString
      var live = Map.empty[Long, Int]
      var replayed = false
      for (b <- 0 until 7) {
        val (rows, l) =
          if (b == 0) { // bulk bootstrap: half the ids
            val batch = ids.filter(_ % 2 == 0).map(id => (id, 0, false))
            (batch, batch.map(r => r._1 -> r._2).toMap)
          } else nextBatch(rng, live, gen = b)
        live = l
        applyB(rows, dir, b.toLong, maxSegments)
        if (b == 3) StreamingGraphAnn.vacuum(spark, dir)
        if (b == 4 && !replayed) {
          applyB(rows, dir, b.toLong, maxSegments) // replay: skip
          intercept[IllegalStateException] { // far-behind: refuse
            applyB(rows, dir, (b - 2).toLong, maxSegments)
          }
          replayed = true
        }
      }
      checkInvariants(dir, live,
        s"seed=$seed maxSegments=$maxSegments live=${live.keySet.toSeq.sorted}")
    }
  }

  test("graph churn: total erasure then refill re-bootstraps a navigable graph") {
    val dir = java.nio.file.Files.createTempDirectory("sgannwipe").toString
    val half = ids.filter(_ % 2 == 0)
    applyB(half.map(id => (id, 0, false)), dir, 0L, maxSegments = 3)
    // erase EVERYTHING
    applyB(half.map(id => (id, 0, true)), dir, 1L, maxSegments = 3)
    checkInvariants(dir, Map.empty, "post-wipe")
    // refill with fresh generations — the empty-graph re-bootstrap path
    val refill = ids.filter(_ % 2 == 1)
    applyB(refill.map(id => (id, 2, false)), dir, 2L, maxSegments = 3)
    checkInvariants(dir, refill.map(_ -> 2).toMap, "post-refill")
  }
}
