package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.llm.Similarity
import graft.streaming.StreamingIvf

/** Streaming IVF index maintenance: micro-batches folded through the
  * segmented cell-assignment state must serve kNN INDISTINGUISHABLE from
  * the batch artifacts ([[Similarity.ivfAssignments]] +
  * [[Similarity.ivfKnnFromIndex]]) built over the live corpus with the
  * SAME persisted codebook; erasure is version-ordered (re-ingest safe);
  * compaction lands the cell-partitioned serving layout; replays are
  * pointer-skipped. */
class StreamingIvfSpec extends SparkTestBase {
  import spark.implicits._

  // four loose directions so the 4-cell codebook has structure
  private def vec(i: Long): Array[Double] = {
    val base = (i % 4) match {
      case 0 => Array(1.0, 0.1, 0.0, 0.0)
      case 1 => Array(0.0, 1.0, 0.1, 0.0)
      case 2 => Array(0.0, 0.0, 1.0, 0.1)
      case _ => Array(0.1, 0.0, 0.0, 1.0)
    }
    base.map(_ + 0.01 * (i % 7))
  }
  private val all = (0L until 24L).map(i => (i, vec(i)))
  private def df(rows: Seq[(Long, Array[Double])]) =
    rows.toDF("vec_id", "embedding")
  // the codebook is a BUILD artifact: trained once over the full corpus
  private lazy val centers = Similarity.ivfCenters(df(all), nCells = 4)

  private def rebuildKnn(rows: Seq[(Long, Array[Double])], nprobe: Int) =
    Similarity.ivfKnnFromIndex(
        Similarity.ivfAssignments(df(rows), centers), centers,
        col("vec_id") < 4, k = 3, nprobe = nprobe)
      .collect().toSeq

  test("streamed index + knn equal the batch artifacts over the union corpus; replay pointer-skipped") {
    val dir = java.nio.file.Files.createTempDirectory("sivf").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sivfckpt").toString
    val input = MemoryStream[(Long, Array[Double])](spark)
    val emb = input.toDF().toDF("vec_id", "embedding")
    val (b0, b1) = all.splitAt(12)

    input.addData(b0: _*)
    val q1 = StreamingIvf.writer(emb, dir, centers, ckpt,
      trigger = Trigger.AvailableNow()).start()
    q1.processAllAvailable(); q1.stop()
    input.addData(b1: _*)
    val q2 = StreamingIvf.writer(emb, dir, centers, ckpt,
      trigger = Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()

    def got(nprobe: Int) =
      StreamingIvf.knn(spark, dir, col("vec_id") < 4, k = 3, nprobe = nprobe)
        .collect().toSeq
    // full probe = exact; pruned probe = same routing as the batch index
    assert(got(4) === rebuildKnn(all, 4))
    assert(got(2) === rebuildKnn(all, 2))
    assert(StreamingIvf.latestVersion(spark, dir) === Some(1L))

    // replay of an applied batch: pointer-skipped, state unchanged
    StreamingIvf.applyBatch(df(b1), dir, 1L, centers)
    assert(got(4) === rebuildKnn(all, 4))
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

  test("per-batch write cost is proportional to the batch (the 100 TB ingest contract)") {
    val dir = java.nio.file.Files.createTempDirectory("sivfseg").toString
    // id-dependent noise defeats parquet's dictionary/RLE so the big
    // segment's bytes actually track its rows (the fixture's 28 repeated
    // patterns would compress to the metadata floor)
    val big = (0L until 4000L).map(i =>
      (i, vec(i).map(_ + 1e-7 * i * i)))
    val small = Seq((10001L, vec(1L)), (10002L, vec(2L)))
    StreamingIvf.applyBatch(df(big), dir, 0L, centers)
    val bytesBig = duBytes(s"$dir/seg/v=0")
    StreamingIvf.applyBatch(df(small), dir, 1L, centers)
    val bytesSmall = duBytes(s"$dir/seg/v=1")
    assert(bytesSmall > 0 && bytesSmall * 5 < bytesBig,
      s"batch write not ∝ batch: small=$bytesSmall big=$bytesBig")
    assert(!new java.io.File(s"$dir/base").exists(),
      "no compaction expected below maxSegments")
  }

  test("version-ordered erasure with re-ingest; compaction lands the cell-partitioned base; vacuum") {
    val dir = java.nio.file.Files.createTempDirectory("sivfdel").toString
    // b0: first half; b1: TOMBSTONE-ONLY erase of vec 1; b2: vec 1
    // returns pointing in a NEW direction + the rest of the corpus —
    // the returned row must survive the still-live tombstone
    val returned = (1L, Array(0.0, 0.0, 0.9, 0.2))
    val batches = Seq(
      all.take(12).map { case (i, v) => (i, v, false) },
      all.filter(_._1 == 1L).map { case (i, v) => (i, v, true) },
      (all.drop(12) :+ returned).map { case (i, v) => (i, v, false) })
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingIvf.applyBatch(b.toDF("vec_id", "embedding", "_deleted"),
        dir, i.toLong, centers, deleteCol = Some("_deleted"))
    }
    val fin = all.take(12).filterNot(_._1 == 1L) ++ all.drop(12) :+ returned
    def got() = StreamingIvf.knn(spark, dir, col("vec_id") < 4, k = 3,
      nprobe = 4).collect().toSeq
    assert(got() === rebuildKnn(fin, 4))
    assert(StreamingIvf.readIndex(spark, dir)
      .filter(col("vec_id") === 1L).count() === 1L)

    // compaction folds the tombstone away and writes the q_knn_ivf_indexed
    // serving layout: base hive-partitioned by cell
    StreamingIvf.compact(spark, dir)
    assert(new java.io.File(s"$dir/base/v=2/ivf").listFiles()
      .exists(_.getName.startsWith("cell=")),
      "base must be cell-partitioned")
    assert(got() === rebuildKnn(fin, 4))

    StreamingIvf.vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/seg/v=0").exists())
    assert(got() === rebuildKnn(fin, 4))
    // post-compaction the view IS the cell-partitioned base, so a pruned
    // probe gets dynamic partition pruning exactly like the prebuilt
    // q_knn_ivf_indexed artifact (the cluster-scale nprobe-cells-only read)
    val prunedPlan = StreamingIvf.knn(spark, dir, col("vec_id") < 4,
        k = 3, nprobe = 2)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(prunedPlan.contains("dynamicpruningexpression"), prunedPlan)
    // a batchId far behind the pointer after vacuum is the fresh-
    // checkpoint-over-existing-state mismatch: refused before any state
    // dir is touched, and the serving view stays intact
    intercept[IllegalStateException] {
      StreamingIvf.applyBatch(
        batches(0).toDF("vec_id", "embedding", "_deleted"), dir, 0L,
        centers, deleteCol = Some("_deleted"))
    }
    assert(got() === rebuildKnn(fin, 4))
  }
}
