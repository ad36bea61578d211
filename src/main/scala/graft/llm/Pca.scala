package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.DotProduct

/** Distributed power iteration for the TOP PRINCIPAL DIRECTION of an
  * embedding column — the fourth bounded-driver-state trainer (after
  * [[Kmeans]], [[Bpe]], [[QualityProbe]]): v ← normalize(Σᵢ (xᵢ·v)·xᵢ),
  * the matrix-free iteration every "all-but-the-top" / dominant-direction-
  * removal embedding postprocessor needs (compose with
  * [[Similarity.centerEmbeddings]] for true PCA on centered vectors).
  *
  * Scale structure (the [[Kmeans]] pattern exactly):
  *   - driver state is ONE dim-length vector, never rows;
  *   - one job per iteration: xᵢ·v is a scan-side codegen dot against the
  *     LITERAL v, the update Σ (xᵢ·v)·xᵢ is a (dim)-keyed micro-unit
  *     integer sum that partially aggregates map-side — the only shuffle
  *     moves `dim` partial rows, the only driver traffic the collected
  *     dim sums;
  *   - the corpus is scanned once per iteration (inherent to power
  *     iteration); at 100 TB train on a digest sample like IVF/k-means.
  *
  * Portability discipline: per-row contributions floor((xᵢ·v)·xᵢ_d onto
  * the 1e-6 grid and sum as exact integers (order-independent); the
  * normalization ‖g‖ folds the squared components IN DIM ORDER (a fixed
  * left fold, mirrored by the oracle's list_reduce) and sqrt is correctly
  * rounded — so every iteration's v, and the published direction, is
  * bit-identical across engines and partitionings. Deterministic init:
  * the min-id vector, normalized. */
object Pca {

  /** `iters` power iterations; returns the direction as Array[Double]. */
  def topDirection(emb: DataFrame, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Double] =
    powerChain(emb, iters, idCol, vecCol)._1

  /** [[topDirection]] plus the final iteration's ‖g‖ = ‖Av‖ — for unit v
    * the Rayleigh estimate of the GRAM operator's top eigenvalue λ_A
    * (covariance eigenvalue = λ_A / n); what [[whitenTransform]] scales
    * by. */
  def topEigen(emb: DataFrame, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): (Array[Double], Double) = {
    val (v, n2) = powerChain(emb, iters, idCol, vecCol)
    (v, math.sqrt(n2))
  }

  private def powerChain(emb: DataFrame, iters: Int,
      idCol: String, vecCol: String): (Array[Double], Double) = {
    require(iters > 0, s"iters must be positive: $iters")
    // deterministic init: the min-id vector, normalized (the Kmeans
    // first-k-by-id discipline); dot/norm as the oracle's sequential fold
    val first = emb
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .orderBy(col(idCol)).limit(1)
      .collect()
    require(first.nonEmpty, "pca: empty input")
    val x0 = first(0).getSeq[Double](1).toArray
    val n0 = math.sqrt(x0.map(x => x * x).reduceLeft(_ + _))
    require(n0 > 0, "pca: the min-id vector is zero — cannot initialize")
    var v = x0.map(_ / n0)
    var lastN2 = 0.0
    for (_ <- 1 to iters) {
      val vArr = array(v.map(lit(_)).toIndexedSeq: _*)
      val g = emb
        .select(DotProduct(col(vecCol), vArr).as("s"),
          posexplode(col(vecCol)).as(Seq("dim", "xd")))
        .groupBy(col("dim"))
        .agg(sum(floor((col("s") * col("xd").cast("double")) * lit(1e6))
          .cast("long")).as("g"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      // the oracle's exact expressions: g::DOUBLE / 1e6, dim-ordered
      // left-fold of squares, one division by the correctly-rounded sqrt
      val gd = g.map(_._2.toDouble / 1e6)
      val n2 = gd.map(x => x * x).reduceLeft(_ + _)
      require(n2 > 0,
        "pca: gradient collapsed below the 1e-6 grid — rank-deficient " +
          "input (k exceeds the effective rank?); deflate fewer components")
      lastN2 = n2
      v = gd.map(_ / math.sqrt(n2))
    }
    (v, lastN2)
  }

  /** Train + publish long-form — (dim, v), the oracle-checkable shape. */
  def train(emb: DataFrame, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    topDirection(emb, iters, idCol, vecCol).zipWithIndex
      .map { case (x, d) => (d, x) }.toSeq.toDF("dim", "v")
  }

  /** Top-k directions by DEFLATION: after each converged direction the
    * corpus is replaced scan-side by its residual x ← x − (x·v)·v and the
    * iteration reruns — the standard sequential power method for a small
    * k (the whitening/"all-but-the-top-k" use case; for large k use a
    * proper sketch). Each deflated frame checkpoints: component j+1's
    * iterations re-read the residual, not a j-deep projection chain.
    * Driver state is k dim-vectors; everything else is [[topDirection]]'s
    * per-iteration shape. Exactly mirrored by the oracle: the deflation
    * arithmetic (t::DOUBLE − s·v_d, the dot first) is the same expression
    * chain on both engines, so all k directions are bit-portable. */
  def topDirections(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Array[Double]] =
    deflatedChains(emb, k, iters, idCol, vecCol).map(_._1)

  /** The deflation loop both [[topDirections]] and [[whitenTransform]]
    * share: k power chains, each over the previous chain's scan-side
    * residual x − (x·v)·v (checkpointed). Returns each component's
    * (direction, final ‖g‖²). */
  private def deflatedChains(emb: DataFrame, k: Int, iters: Int,
      idCol: String, vecCol: String): Seq[(Array[Double], Double)] = {
    require(k > 0, s"k must be positive: $k")
    var cur = emb.select(col(idCol), col(vecCol))
    val out = Seq.newBuilder[(Array[Double], Double)]
    for (j <- 1 to k) {
      val (v, n2) = powerChain(cur, iters, idCol, vecCol)
      out += ((v, n2))
      if (j < k) {
        val vArr = array(v.map(lit(_)).toIndexedSeq: _*)
        cur = cur.select(col(idCol),
          zip_with(col(vecCol), vArr,
            (a, b) => a.cast("double") - DotProduct(col(vecCol), vArr) * b)
            .as(vecCol))
          .localCheckpoint(eager = false)
      }
    }
    out.result()
  }

  /** [[topDirections]] published long-form — (component, dim, v). */
  def trainK(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    topDirections(emb, k, iters, idCol, vecCol).zipWithIndex.flatMap {
      case (v, c) => v.zipWithIndex.map { case (x, d) => (c, d, x) }
    }.toSeq.toDF("component", "dim", "v")
  }

  /** PCA-whitened coordinates: project every vector onto the top-k
    * deflated directions and scale each coordinate by 1/√λ̂ (λ̂ = the
    * component's covariance-eigenvalue estimate ‖Av‖/n from the final
    * power iteration) — unit-variance decorrelated features, the
    * embedding preprocessing SemDeDup/clustering literature calls
    * whitening. Long form (idCol, component, coord), scan-side with the
    * directions and scales inlined as literals; zero shuffles. Every
    * scale is a driver double computed from the bit-portable (n2, n), so
    * coordinates match the oracle's bit-for-bit. */
  def whitenTransform(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = emb.count()
    require(n > 0, "pca: empty input")
    deflatedChains(emb, k, iters, idCol, vecCol).zipWithIndex.map { case ((v, n2), j) =>
      val vArr = array(v.map(lit(_)).toIndexedSeq: _*)
      // the oracle's exact expression: dot / sqrt(sqrt(n2) / n)
      val scale = math.sqrt(math.sqrt(n2) / n.toDouble)
      emb.select(col(idCol), lit(j).as("component"),
        (DotProduct(col(vecCol), vArr) / lit(scale)).as("coord"))
    }.reduce(_ unionByName _)
  }

  /** Remove the component along `direction` from every vector — the
    * "all-but-the-top" projection, scan-side with the direction inlined
    * as a literal: x ← x − (x·v)·v. Long form (idCol, dim, c); zero
    * shuffles beyond the scan. */
  def removeDirection(emb: DataFrame, direction: Array[Double],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val vArr = array(direction.map(lit(_)).toIndexedSeq: _*)
    emb
      .select(col(idCol), DotProduct(col(vecCol), vArr).as("s"),
        posexplode(col(vecCol)).as(Seq("dim", "xd")))
      .select(col(idCol), col("dim"),
        (col("xd").cast("double") -
          col("s") * element_at(vArr, col("dim") + 1)).as("c"))
  }
}
