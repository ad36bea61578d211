package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift diagnostics between corpus slices — the monitoring
  * layer a production training-data pipeline runs on every ingest batch:
  * "did this source's length/quality profile move?" is the question that
  * catches scraper breakage and upstream format changes before they
  * poison a mixture. Complements [[Dsir.sourceKl]] (token-distribution
  * KL): PSI is the banded-feature form model-monitoring systems publish,
  * with the (p−q)·ln(p/q) summand symmetric in direction and additive
  * per band, so per-band contributions are auditable.
  *
  * Portability discipline: exact integer counts, Laplace(+1) smoothing,
  * a FIXED IEEE op sequence per band floored to the 1e-9 grid, and an
  * exact integer nano-sum per source (the [[Dsir]] λ convention) — any
  * engine reproduces the published value bit-for-bit. */
object Drift {

  /** Population Stability Index of a banded numeric feature, per group vs
    * the whole-corpus baseline:
    *
    *   PSI(s) = Σ_bands (p_s − q)·ln(p_s / q),
    *   p_s = (c_s + 1)/(n_s + B),  q = (c + 1)/(n + B)
    *
    * over the B bands observed anywhere in the corpus (Laplace(+1) keeps
    * empty-band ratios finite; a band one side lacks still contributes).
    * The conventional reading: < 0.1 stable, 0.1–0.25 moderate shift,
    * > 0.25 drifted.
    *
    * Scale shape: ONE aggregation over (group, band) — band is a
    * scan-side floor-divide projection — then everything runs on the
    * (groups × bands) grid: baseline counts re-aggregate the per-group
    * frame (no second corpus scan), the full grid is a cross join of two
    * tiny distinct frames, and the PSI sum is an exact long aggregation
    * of per-band nano-floored contributions. The corpus is read once,
    * shuffled never (the groupBy keys are low-cardinality). */
  def psi(df: DataFrame, groupCol: String, featureCol: Column,
      binWidth: Long): DataFrame = {
    val binned = df.select(col(groupCol).as("grp"),
      floor(featureCol.cast("double") / binWidth).cast("long").as("band"))
    val cell = binned.groupBy(col("grp"), col("band"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = cell.groupBy(col("band")).agg(sum(col("c")).as("bc"))
    val nGrp = cell.groupBy(col("grp")).agg(sum(col("c")).as("n"))
    val totals = base.agg(sum(col("bc")).as("nTot"),
      count(lit(1)).as("nBands"))
    // full grid: every group × every observed band (missing cells count 0)
    val grid = nGrp.crossJoin(base.select(col("band"), col("bc")))
      .join(cell, Seq("grp", "band"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(totals) // 1-row
    val p = (col("c") + 1).cast("double") /
      (col("n") + col("nBands")).cast("double")
    val q = (col("bc") + 1).cast("double") /
      (col("nTot") + col("nBands")).cast("double")
    val contrib = floor((p - q) * log(p / q) * lit(1e9)).cast("long")
    val out = grid
      .withColumn("contrib_nano", contrib)
      .groupBy(col("grp").as(groupCol))
      .agg(sum(col("contrib_nano")).as("psi_nano"))
      .select(col(groupCol),
        (col("psi_nano").cast("double") / 1e9).as("psi"))
    val mat = out.localCheckpoint()
    cell.unpersist()
    mat
  }

  /** Embedding-space drift: per group, the Euclidean distance between
    * the group's centroid and the corpus centroid — the "did this
    * source's embedding distribution move" monitor that catches encoder
    * version skew and upstream content shifts [[psi]]'s scalar bands
    * can't see. Centroids use the
    * [[Similarity.clusterCentroidSums]] discipline (exact micro-unit
    * integer sums, ONE division per (group, dim)); the distance is a
    * sequential dim-ordered fold of squared diffs (the `list_reduce`
    * oracle convention) — bit-portable end to end.
    *
    * Scale shape: one posexplode scan into a (groups × dims)-bounded
    * aggregation; corpus sums RE-AGGREGATE the per-group frame (no
    * second corpus read); everything after runs on the tiny grid. */
  def embeddingShift(emb: DataFrame, groupTable: DataFrame,
      groupCol: String = "source", joinId: String = "doc_id",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val g = groupTable.select(col(joinId).as("__gid"), col(groupCol).as("grp"))
    val gs = emb.join(g, col(idCol) === col("__gid"))
      .select(col("grp"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("grp"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x").cast("double") * 1e6)).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cs = gs.groupBy(col("dim"))
      .agg(sum(col("n")).as("nTot"), sum(col("s")).as("sTot"))
    val diffs = gs.join(broadcast(cs), Seq("dim"))
      .select(col("grp"), col("dim"), col("n"),
        (col("s").cast("double") / (col("n").cast("double") * 1e6) -
          col("sTot").cast("double") / (col("nTot").cast("double") * 1e6))
          .as("diff"))
    val out = diffs
      .groupBy(col("grp"))
      .agg(min(col("n")).as("n_vecs"),
        sort_array(collect_list(struct(col("dim"),
          (col("diff") * col("diff")).as("dsq")))).as("arr"))
      .select(col("grp").as(groupCol), col("n_vecs"),
        sqrt(aggregate(transform(col("arr"), t => t.getField("dsq")),
          lit(0.0), (a, b) => a + b)).as("shift"))
    val mat = out.localCheckpoint()
    gs.unpersist()
    mat
  }
}
