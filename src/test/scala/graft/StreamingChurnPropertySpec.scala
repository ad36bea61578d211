package graft

import org.apache.spark.sql.functions.col

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
    for (seed <- 1 to 3; maxSegments <- Seq(1, 3, 8)) {
      val rng = new scala.util.Random(seed * 31 + maxSegments)
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
          deleteCol = Some("_deleted"), maxSegments = maxSegments)
        if (b == 3) StreamingIndex.vacuum(spark, dir)
        if (b == 4 && !replayed) { // replay an applied batch: must skip
          StreamingIndex.applyBatch(df, dir, (b - 2).toLong,
            deleteCol = Some("_deleted"), maxSegments = maxSegments)
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

  test("ivf churn: any legal change sequence at any compaction cadence serves the rebuild") {
    def vec(id: Long, gen: Int): Array[Double] =
      Array(1.0 + id, 0.1 * gen, (id % 3).toDouble, 1.0)
    val centers = Similarity.ivfCenters(
      ids.map(i => (i, vec(i, 0))).toDF("vec_id", "embedding"), nCells = 4)
    for (seed <- 1 to 2; maxSegments <- Seq(1, 3)) {
      val rng = new scala.util.Random(seed * 17 + maxSegments)
      val dir = java.nio.file.Files.createTempDirectory(
        s"sivfprop_${seed}_$maxSegments").toString
      var live = Map.empty[Long, Int]
      for (b <- 0 until 6) {
        val (rows, l) = nextBatch(rng, live, gen = b)
        live = l
        val df = rows.map { case (id, g, del) => (id, vec(id, g), del) }
          .toDF("vec_id", "embedding", "_deleted")
        StreamingIvf.applyBatch(df, dir, b.toLong, centers,
          deleteCol = Some("_deleted"), maxSegments = maxSegments)
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
