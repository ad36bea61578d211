package graft

import org.apache.hadoop.fs.FileSystem
import org.apache.spark.sql.functions._

import graft.llm.{GraphAnn, Similarity}

/** NSW-style graph-ANN contracts: the bounded build (degree cap, no
  * all-pairs), exactness of the walk on a clustered toy corpus,
  * determinism, the driver-side/column bucket-hash pin, and the
  * prebuilt serving path's pruned-read byte bound. */
class GraphAnnSpec extends SparkTestBase {
  import spark.implicits._

  // 4 well-separated clusters of 12 vectors in 64 dims: cluster c points
  // mostly along axes 16c..16c+3 with small deterministic jitter — true
  // top-k of any member is inside its own cluster, far above noise
  private def clustered() = {
    val rows = for (c <- 0 until 4; i <- 0 until 12) yield {
      val v = Array.fill(64)(0.0)
      for (d <- 0 until 4) v(16 * c + d) = 1.0 + 0.01 * ((i * 7 + d) % 5)
      v(63 - (c * 12 + i) % 8) += 0.05 // symmetry-breaking jitter
      ((c * 12 + i).toLong, v.toSeq, s"c$c")
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("walk over the bounded graph re-finds the exact top-k on a clustered corpus; degree <= m; deterministic") {
    val emb = clustered().localCheckpoint()
    val g = GraphAnn.buildGraph(emb, m = 8, lshBits = 4, probes = 2)
      .localCheckpoint()
    // degree bound: the graph stays m-regular-or-less by construction
    val maxDeg = g.groupBy($"src").count().agg(max($"count")).head().getLong(0)
    assert(maxDeg <= 8L, s"out-degree $maxDeg exceeds m=8")
    val exact = Similarity.bruteForceKnn(emb, $"vec_id" < 6, k = 5)
      .select($"qid", $"rank", $"neighbor_id").collect().toSeq
    def run() = GraphAnn.search(emb, g, $"vec_id" < 6, k = 5,
        ef = 24, iters = 3, entries = 8)
      .select($"qid", $"rank", $"neighbor_id").collect().toSeq
    val got = run()
    assert(got === exact,
      "the walk must re-find the exact top-5 inside well-separated clusters")
    assert(run() === got, "the walk must be deterministic")
  }

  test("panel recall contract row publishes (n_queries, recall_ok)") {
    val emb = clustered().localCheckpoint()
    val g = GraphAnn.buildGraph(emb, m = 8, lshBits = 4, probes = 2)
    val row = GraphAnn.knnRecallPanel(emb, g, $"vec_id" < 6, k = 5,
      ef = 24, iters = 3, entries = 8, recallBound = 0.7).head()
    assert(row.getLong(0) === 6L)
    assert(row.getBoolean(1))
  }

  test("driver-side idBuckets equals the srcBucket column (the gramBuckets pin)") {
    val ids = Seq(0L, 1L, 7L, 123456789L, -42L, Long.MaxValue)
    val fromCol = ids.toDF("src")
      .select($"src", GraphAnn.srcBucket($"src", 32).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- ids)
      assert(GraphAnn.idBuckets(Seq(id), 32) === Seq(fromCol(id)),
        s"bucket mismatch for id $id")
  }

  test("prebuilt serving: each beam round reads only the frontier's buckets' bytes") {
    def fsBytes: Long = {
      val s = FileSystem.getGlobalStorageStatistics.get("file")
      if (s == null) 0L else s.getLong("bytesRead")
    }
    val emb = clustered().localCheckpoint()
    val tmp = java.nio.file.Files.createTempDirectory("gannfs").toString
    GraphAnn.buildGraph(emb, m = 8, lshBits = 4, probes = 2)
      .write.mode("overwrite").partitionBy("b").parquet(tmp)
    def du(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).fold(0L)(_.map(du).sum)
      else f.length()
    val total = du(new java.io.File(tmp))
    val graph = spark.read.parquet(tmp)
    // one query, a tight beam: the touched buckets are a strict subset
    val b0 = fsBytes
    val got = GraphAnn.search(emb, graph, $"vec_id" === 0L, k = 3,
        ef = 4, iters = 2, entries = 2)
      .collect()
    val read = fsBytes - b0
    assert(got.nonEmpty)
    // the walk touches <= (entries + 2 rounds x ef) sources' buckets —
    // far fewer than all 32; reads must stay under the full-graph bytes
    // (footer slack included), proving the partition filter prunes
    assert(read < total * 3 / 4,
      s"pruned walk read $read bytes of a $total-byte graph — " +
        "partition pruning not engaged?")
  }
}
