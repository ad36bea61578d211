package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.DotProduct

/** Distributed Lloyd's k-means over an embedding column — the codebook
  * trainer that makes SemDeDup's cell-count lever real at corpus scale:
  * [[Similarity.semanticDedup]]'s per-cell ε-join is only safe when cell
  * count grows with the corpus, and the near-dup-graph centroids
  * ([[Similarity.clusterCentroids]]) cap k at the (small, data-driven)
  * cluster count. Here k is a free parameter.
  *
  * Scale structure — the bounded-driver-state pattern ([[graft.expr.SpaceSaving]],
  * IVF's `localLloyd`), now with the COUNTING distributed:
  *   - driver state is the k × dim codebook (k=65k × 768 dims = 400 MB,
  *     the practical ceiling), never rows;
  *   - per iteration ONE job: assignment is a scan-side codegen projection
  *     (centers inlined as literals — nothing is even broadcast), the
  *     update is a (cell, dim) micro-unit integer sum that partially
  *     aggregates map-side, so the only shuffle moves k × dim partial
  *     sums and the only driver traffic is the k × dim collected update;
  *   - the corpus is scanned once per iteration (inherent to Lloyd) —
  *     at 100 TB, train on a digest-sampled projection
  *     ([[Sampling.sampleByKey]]) exactly like FAISS trains IVF.
  *
  * Determinism/portability discipline (the [[Similarity.clusterCentroids]]
  * rules, applied per iteration):
  *   - init = the first k vectors by id (seeded sampling upstream if
  *     random init is wanted) — SQL-expressible, no RNG;
  *   - assignment argmin ranks ||c||² − 2·v·c with ties → smallest cell,
  *     every operand bit-identical on both engines (sequential-fold dot,
  *     literal centers);
  *   - centroid update sums floor(x·1e6) micro-longs exactly and divides
  *     once — bit-portable across engines AND partitionings, so iteration
  *     t+1's distances are computed from identical doubles everywhere;
  *   - empty cells keep their previous center (mirrored by the oracle's
  *     carry-forward join).
  */
object Kmeans {

  /** Trained codebook: `centers(cell)(dim)` after the final update;
    * `counts(cell)` = that update's assignment counts (0 = cell emptied,
    * center carried from the previous iteration). */
  case class Model(centers: Array[Array[Double]], counts: Array[Long])

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    DotProduct(a, b)

  /** Scan-side argmin cell assignment against literal centers: ranks
    * ||c||² − 2·v·c (squared L2 minus the row's own ||v||², constant per
    * row), ties → smallest cell — the [[Similarity.ivfKnn]] expression,
    * shared here so training and serving assign identically. */
  private[graft] def cellOf(vecCol: String, centers: Array[Array[Double]]) = {
    val cellRank = array(centers.zipWithIndex.map { case (c, i) =>
      val ca = array(c.map(lit(_)).toIndexedSeq: _*)
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - dot(col(vecCol), ca) * 2.0).as("d"), lit(i).as("cell"))
    }.toIndexedSeq: _*)
    array_sort(cellRank).getItem(0).getField("cell")
  }

  /** Run `iters` Lloyd iterations with k cells over `emb`. One Spark job
    * per iteration; driver state bounded at k × dim. */
  def trainModel(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Model = {
    require(k > 0 && iters > 0, s"need k > 0, iters > 0: $k, $iters")
    // init: first k vectors by id — bounded collect, SQL-mirrorable
    var centers: Array[Array[Double]] = emb
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .orderBy(col(idCol)).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(centers.nonEmpty, "kmeans: empty input")
    var counts = new Array[Long](centers.length)
    for (_ <- 1 to iters) {
      // one job: scan-side assignment, (cell, dim) micro-sums, k×dim collect
      val upd = emb
        .select(cellOf(vecCol, centers).as("cell"),
          posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("x").cast("double") * 1e6)).as("s"))
        .collect()
      val next = centers.map(_.clone())
      counts = new Array[Long](centers.length)
      upd.foreach { r =>
        val cell = r.getInt(0); val d = r.getInt(1)
        val n = r.getLong(2); val s = r.getLong(3)
        // the oracle's exact expression: s::DOUBLE / (n::DOUBLE * 1e6)
        next(cell)(d) = s.toDouble / (n.toDouble * 1e6)
        counts(cell) = n
      }
      centers = next
    }
    Model(centers, counts)
  }

  /** Codebook in [[Similarity.centroidVectors]]' shape — (cluster_id,
    * n_members, centroid) — so [[Similarity.assignToCentroids]] and
    * [[Similarity.semanticDedup]] consume a k-means codebook unchanged. */
  def codebook(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.centers.zipWithIndex.map { case (c, i) =>
      (i.toLong, model.counts(i), c.toSeq)
    }.toSeq.toDF("cluster_id", "n_members", "centroid")
  }

  /** Per-cluster clustering quality: simplified silhouette on squared-L2
    * distances to the trained codebook — a(v) = dist² to the assigned
    * center, b(v) = dist² to the nearest OTHER center,
    * s = (b − a) / max(a, b), averaged per cell. The quality gauge that
    * tells a SemDeDup operator whether its cells are tight (s → 1) or
    * arbitrary (s → 0): cells with low silhouette are where the per-cell
    * ε-join's "duplicates share a cell" assumption leaks.
    *
    * Scale shape: the k distances are ONE scan-side codegen projection
    * (centers inlined as literals, the [[cellOf]] expression family —
    * nothing broadcast, no join); the only shuffle is the (cell)-keyed
    * partial-aggregated micro-unit sum, k rows out. Portability: the
    * rank value d = ‖c‖² − 2·v·c is the assignment expression verbatim
    * (ties → smallest cell), a/b shift it by ‖v‖² in one addition each,
    * each s quantizes to floor(s·1e6) BEFORE the sum, and the published
    * mean is one IEEE division — the [[Similarity.clusterCentroids]]
    * discipline. */
  def silhouette(emb: DataFrame, model: Model,
      vecCol: String = "embedding"): DataFrame = {
    require(model.centers.length >= 2, "silhouette needs k >= 2")
    val v = col(vecCol)
    val ranks = array(model.centers.zipWithIndex.map { case (c, i) =>
      val ca = array(c.map(lit(_)).toIndexedSeq: _*)
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - dot(v, ca) * 2.0).as("d"), lit(i).as("cell"))
    }.toIndexedSeq: _*)
    val sorted = array_sort(ranks)
    val vv = dot(v, v)
    val da = sorted.getItem(0).getField("d") + vv
    val db = sorted.getItem(1).getField("d") + vv
    val sMicro = when(greatest(da, db) > 0.0,
      floor(((db - da) / greatest(da, db)) * 1e6).cast("long")).otherwise(0L)
    emb
      .select(sorted.getItem(0).getField("cell").as("cell"),
        sMicro.as("smicro"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"), sum(col("smicro")).as("sil_micro_sum"))
      .select(col("cell"), col("n_members"), col("sil_micro_sum"),
        (col("sil_micro_sum").cast("double") /
          (col("n_members").cast("double") * 1e6)).as("mean_sil"))
  }

  /** Train + publish the codebook long-form — (cell, n_members, dim, c),
    * the oracle-checkable catalog shape (scalar cells, total order). */
  def train(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val m = trainModel(emb, k, iters, idCol, vecCol)
    m.centers.zipWithIndex.flatMap { case (c, cell) =>
      c.zipWithIndex.map { case (v, d) => (cell, m.counts(cell), d, v) }
    }.toSeq.toDF("cell", "n_members", "dim", "c")
  }
}
