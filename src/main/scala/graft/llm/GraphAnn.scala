package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.DotProduct

/** Graph-based ANN — the NSW-style navigable-neighbor-graph serving
  * structure modern vector stores default to (Malkov et al.'s NSW/HNSW
  * family), built Spark-first:
  *
  * '''Build''' (one-time layout job, like an index build):
  *  1. candidate edges come from multi-probe LSH buckets
  *    ([[Similarity.lshBucket]] — never an all-pairs join; per-bucket
  *    membership capped deterministically so a degenerate bucket bounds
  *    the quadratic term);
  *  2. per source, the top-`m` candidates by EXACT cosine become edges;
  *  3. one NN-descent refinement round (neighbors-of-neighbors, the
  *    Dong et al. 2011 step): 2-hop candidates rescored exactly, then
  *    the union of LSH edges ∪ reversed edges ∪ 2-hop edges re-tops to
  *    `m` per source — reversal is what makes the graph navigable from
  *    sparse regions.
  * Edge rows CARRY the destination vector (the DiskANN vector-with-
  * neighbors layout): a search step never joins back to the corpus.
  *
  * '''Search''' (beam walk): start from `entries` digest-ranked entry
  * points (deterministic — the [[Sampling]] md5 convention), then
  * `iters` rounds of expand-score-prune: the beam's out-edges are
  * fetched from the graph, scored exactly against the query vector, and
  * the beam re-tops to `ef`. Fixed rounds instead of a convergence test
  * keeps the job count static and the result deterministic; the recall
  * CONTRACT (the q_knn_lsh publishing discipline) is what licenses the
  * approximation.
  *
  * Scale shape at 100 TB: the build shuffles bucket-bounded candidate
  * pairs and edge lists (rows ∝ N·m, never N²); the walk's per-round
  * state is |Q|·ef rows, the frontier's ids are a BOUNDED driver list
  * (the [[Similarity]] capQueryPred convention), and a persisted graph
  * partitioned by source bucket serves each round through static
  * partition pruning + a pushed src-IN filter — reads ∝ frontier·m,
  * zero corpus access (the q_index_phrase probe discipline; the
  * q_knn_graph_prebuilt row pins it). */
object GraphAnn {

  private def dot(a: Column, b: Column): Column = DotProduct(a, b)
  private def norm(v: Column): Column = sqrt(DotProduct(v, v))

  val DefaultBuckets = 32

  /** The bucket a persisted graph is hive-partitioned by. */
  def srcBucket(src: Column, nBuckets: Int = DefaultBuckets): Column =
    pmod(xxhash64(src), lit(nBuckets.toLong))

  /** [[srcBucket]] evaluated DRIVER-SIDE on literal ids (Spark's own
    * XxHash64 expression, seed 42 — the [[Search.gramBuckets]] pin
    * discipline: agreement with the column form is spec-pinned, a
    * divergent hash would silently prune away real edges). */
  def idBuckets(ids: Seq[Long], nBuckets: Int): Seq[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    ids.map { v =>
      val h = XxHash64(Seq(Literal.create(v,
          org.apache.spark.sql.types.LongType)), 42L)
        .eval(null).asInstanceOf[Long]
      ((h % nBuckets) + nBuckets) % nBuckets
    }.distinct.sorted
  }

  /** Build the bounded neighbor graph: (src, dst, score_cos, dst_vec,
    * dst_norm, b) with out-degree ≤ `m` per src. See object doc. */
  def buildGraph(emb: DataFrame, m: Int = 8, lshBits: Int = 6,
      dim: Int = 64, probes: Int = 2, maxBucket: Int = 4096,
      nBuckets: Int = DefaultBuckets,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1, s"out-degree m must be >= 1: $m")
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"))
    // deterministic per-bucket cap: a pathological bucket bounds the
    // candidate join at maxBucket² instead of N² (the Dedup.bandTable
    // corpus-property rule, digest-ranked so the kept set is stable)
    val wb = Window.partitionBy(col("bucket"))
      .orderBy(md5(col("id").cast("string")), col("id"))
    val bucketed = base
      .withColumn("bucket",
        Similarity.lshBucket(col("vec"), lshBits, dim))
      .withColumn("bucket", explode(array(
        col("bucket") +: (0 until math.min(probes, lshBits)).map(i =>
          col("bucket").bitwiseXOR(lit(1L << i))): _*)))
      .withColumn("__r", row_number().over(wb))
      .filter(col("__r") <= maxBucket).drop("__r")
      .localCheckpoint(eager = false) // both sides of the candidate join
    val cand = bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("src"), col("a.vec").as("src_vec"),
        col("a.nrm").as("src_norm"), col("b.id").as("dst"),
        col("b.vec").as("dst_vec"), col("b.nrm").as("dst_norm"))
      .dropDuplicates("src", "dst") // multi-probe can repeat a pair
    val e0 = topM(scoreEdges(cand), m).localCheckpoint(eager = false)
    // NN-descent round over e0 ∪ reverse(e0): 2-hop candidates, exact
    // rescoring off the carried vectors — no corpus join
    val undirected = e0.unionByName(e0.select(
      col("dst").as("src"), col("dst_vec").as("src_vec"),
      col("dst_norm").as("src_norm"), col("src").as("dst"),
      col("src_vec").as("dst_vec"), col("src_norm").as("dst_norm"),
      col("score_cos")))
      .dropDuplicates("src", "dst")
      .localCheckpoint(eager = false) // two sides of the 2-hop join
    val twoHop = undirected.as("x").join(undirected.as("y"),
        col("x.dst") === col("y.src") && col("x.src") =!= col("y.dst"))
      .select(col("x.src").as("src"), col("x.src_vec").as("src_vec"),
        col("x.src_norm").as("src_norm"), col("y.dst").as("dst"),
        col("y.dst_vec").as("dst_vec"), col("y.dst_norm").as("dst_norm"))
      .dropDuplicates("src", "dst")
    val all = undirected.unionByName(scoreEdges(twoHop))
      .dropDuplicates("src", "dst")
    topM(all, m)
      .select(col("src"), col("dst"), col("score_cos"), col("dst_vec"),
        col("dst_norm"))
      .withColumn("b", srcBucket(col("src"), nBuckets))
  }

  // keeps the src vector/norm alongside: the NN-descent 2-hop rescoring
  // reads them off the edge rows, never the corpus
  private def scoreEdges(cand: DataFrame): DataFrame =
    cand.select(col("src"), col("src_vec"), col("src_norm"), col("dst"),
      (dot(col("src_vec"), col("dst_vec"))
        / (col("src_norm") * col("dst_norm"))).as("score_cos"),
      col("dst_vec"), col("dst_norm"))

  private def topM(scored: DataFrame, m: Int): DataFrame = {
    val w = Window.partitionBy(col("src"))
      .orderBy(col("score_cos").desc, col("dst"))
    scored.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= m).drop("__r")
  }

  /** Beam-walk the graph for the `queryPred` rows: (qid, rank,
    * neighbor_id, score). `graph` is [[buildGraph]]'s output (inline or
    * read back from a partitioned artifact). Each round collects the
    * frontier's ≤ |Q|·ef ids (bounded driver state) and probes the graph
    * with a bucket + src-IN filter — statically pruned when the artifact
    * is hive-partitioned on `b`. */
  def search(emb: DataFrame, graph: DataFrame, queryPred: Column, k: Int,
      ef: Int = 32, iters: Int = 3, entries: Int = 8,
      nBuckets: Int = DefaultBuckets,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && ef >= k, s"need ef >= k >= 1: ef=$ef k=$k")
    val queries = emb.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"),
        norm(col(vecCol)).as("qnorm"))
      .localCheckpoint(eager = false) // re-joined every round
    // digest-ranked entry points: deterministic, uniform, a bounded
    // TakeOrdered — never a global sort
    val entry = emb
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        norm(col(vecCol)).as("nrm"))
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(entries)
    def score(cand: DataFrame): DataFrame = cand
      .join(broadcast(queries), Seq("qid"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        (dot(col("qvec"), col("vec")) / (col("qnorm") * col("nrm")))
          .as("score"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id"))
    def topEf(beam: DataFrame): DataFrame = beam
      .withColumn("__r", row_number().over(wq))
      .filter(col("__r") <= ef).drop("__r")
    var beam = topEf(score(queries.select(col("qid")).crossJoin(entry)))
      .localCheckpoint(eager = true) // the walk reads it twice per round
    for (_ <- 1 to iters) {
      // bounded driver list: |Q|·ef frontier ids -> pushed IN filters
      val ids = beam.select(col("id")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val buckets = idBuckets(ids, nBuckets)
      val expanded = graph
        .filter(col("b").isin(buckets: _*) && col("src").isin(ids: _*))
        .join(broadcast(beam.select(col("qid"), col("id").as("src"))),
          Seq("src"))
        .select(col("qid"), col("dst").as("id"),
          col("dst_vec").as("vec"), col("dst_norm").as("nrm"))
        .dropDuplicates("qid", "id")
      beam = topEf(beam.unionByName(score(expanded))
          .dropDuplicates("qid", "id"))
        .localCheckpoint(eager = true)
    }
    beam.withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
        col("score"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Panel recall contract (the [[Similarity.lshKnnRecallPanel]]
    * convention — a greedy walk can strand an individual query behind a
    * bad entry point by data geometry, panel recall is the stable
    * publishable statistic): ONE row (n_queries, recall_ok) where
    * recall_ok ⇔ Σ hits / Σ exact ≥ `recallBound`. */
  def knnRecallPanel(emb: DataFrame, graph: DataFrame, queryPred: Column,
      k: Int, ef: Int = 32, iters: Int = 3, entries: Int = 8,
      recallBound: Double = 0.5, nBuckets: Int = DefaultBuckets,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val approx = search(emb, graph, queryPred, k, ef, iters, entries,
        nBuckets, idCol, vecCol)
      .select(col("qid"), col("neighbor_id"))
      .localCheckpoint(eager = false) // hits join + the panel count
    val exact = Similarity.bruteForceKnn(emb, queryPred, k, idCol, vecCol)
      .select(col("qid"), col("neighbor_id"))
      .localCheckpoint(eager = false)
    val hits = approx.join(exact, Seq("qid", "neighbor_id"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"), countDistinct(col("qid")).as("nq"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .select(col("nq").as("n_queries"),
        (col("n_hits").cast("double") / col("n_exact").cast("double")
          >= recallBound).as("recall_ok"))
  }
}
