package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear quality-probe trainer — the third bounded-driver-
  * state trainer in the library (after [[Kmeans]] and [[Bpe]]): learn a
  * linear model over cheap scan-side text features by full-batch gradient
  * descent, entirely on-cluster. The production use is the fastText-style
  * quality classifier every curation stack trains ("does this doc look
  * like the reference corpus?") — here a linear probe with squared loss,
  * which keeps every operation IEEE mul/add/div (no exp/sigmoid, whose
  * libm variance would break engine portability).
  *
  * Scale structure (the [[Kmeans]] pattern):
  *   - driver state is the (d+1)-double weight vector, never rows;
  *   - one job per iteration: predictions are scan-side arithmetic with
  *     the weights inlined as LITERALS, the gradient is a (d+1)-column
  *     micro-unit integer sum that partially aggregates map-side — the
  *     only shuffle rows are one partial per task, the only driver
  *     traffic the (d+1) collected sums;
  *   - features derive scan-side in one pass; persist the feature frame
  *     (here: checkpoint) so iterations re-read features, not the corpus.
  *
  * Portability discipline: per-row gradient contributions floor onto the
  * 1e-6 grid and sum as exact integers (order-independent), the weight
  * update is the same double expression on both engines, and every
  * feature is built from exact integer counts with single IEEE divisions
  * — so all iterations' weights, and therefore the published model and
  * scores, are bit-identical across engines AND partitionings. The
  * oracle mirrors training with a fixed-iteration unrolled-CTE chain
  * (the q_bpe_merges / q_kmeans technique). */
object QualityProbe {

  /** Feature dimensionality including the bias column x0. */
  val Dims = 4

  /** Scan-side feature/label frame: (idCol, x0=1, x1 = words/100,
    * x2 = type-token ratio, x3 = mean word length/10, y = [labelCol ==
    * positive]). All counts exact integers; each ratio ONE IEEE
    * division; blank docs get zero features (bias only). */
  def features(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", labelCol: String = "lang",
      positive: String = "en"): DataFrame = {
    val t = col(textCol)
    val words = split(lower(trim(t)), "\\s+")
    // library-wide token convention (see TextAnalysis.tokenCount) so the
    // probe's features count tokens exactly like the packing/sampling
    // operators its scores feed (e.g. curriculumShards)
    val nW = TextAnalysis.tokenCount(t).cast("long")
    val sumWlen = aggregate(words, lit(0L), (acc, x) => acc + length(x))
    val nDistinct = size(array_distinct(words)).cast("long")
    val guard = nW > 0
    docs.select(
      col(idCol),
      lit(1.0).as("x0"),
      (nW.cast("double") / lit(100.0)).as("x1"),
      when(guard, nDistinct.cast("double") / nW.cast("double"))
        .otherwise(lit(0.0)).as("x2"),
      when(guard, (sumWlen.cast("double") / nW.cast("double")) / lit(10.0))
        .otherwise(lit(0.0)).as("x3"),
      when(col(labelCol) === positive, lit(1.0)).otherwise(lit(0.0)).as("y"))
  }

  private def pred(w: Array[Double]): Column =
    col("x0") * lit(w(0)) + col("x1") * lit(w(1)) +
      col("x2") * lit(w(2)) + col("x3") * lit(w(3))

  /** Full-batch GD on squared loss: w ← w − lr · (Σ floor((resid·xⱼ)·1e6))
    * / (n · 1e6). One Spark job per iteration; driver state = Dims
    * doubles. Returns the trained weights. */
  def trainWeights(feat: DataFrame, lr: Double = 0.5, iters: Int = 3): Array[Double] = {
    require(iters > 0, s"iters must be positive: $iters")
    val n = feat.count()
    require(n > 0, "probe: empty input")
    var w = Array.fill(Dims)(0.0)
    for (_ <- 1 to iters) {
      val resid = pred(w) - col("y")
      val g = feat.select((0 until Dims).map(j =>
        sum(floor((resid * col(s"x$j")) * lit(1e6)).cast("long")).as(s"g$j")): _*)
        .head()
      // the oracle's exact expression: w - lr * (g::DOUBLE / (n::DOUBLE * 1e6))
      w = Array.tabulate(Dims)(j =>
        w(j) - lr * (g.getLong(j).toDouble / (n.toDouble * 1e6)))
    }
    w
  }

  /** Train + publish long-form — (dim, w), the oracle-checkable shape. */
  def train(feat: DataFrame, lr: Double = 0.5, iters: Int = 3): DataFrame = {
    val spark = feat.sparkSession
    import spark.implicits._
    trainWeights(feat, lr, iters).zipWithIndex
      .map { case (v, i) => (i, v) }.toSeq.toDF("dim", "w")
  }

  /** Apply a trained probe: (idCol, score = x·w), weights inlined as
    * literals — scan-side, zero shuffles, the model-filtering pass a
    * curation pipeline runs over the full corpus. */
  def score(feat: DataFrame, w: Array[Double],
      idCol: String = "doc_id"): DataFrame = {
    require(w.length == Dims, s"expected $Dims weights, got ${w.length}")
    feat.select(col(idCol), pred(w).as("score"))
  }
}

/** Multinomial Naive Bayes text classifier, trained AND applied fully
  * in-plan — the second classifier family next to [[QualityProbe]]
  * (generative token-count model vs discriminative feature probe; the
  * fastText-supervised workhorse shape for source/quality routing).
  *
  * Everything is aggregations: training is ONE (label, term) count pass
  * (Laplace(+1) smoothed over the V-term vocabulary), scoring joins each
  * document's token multiset against the label×term log-likelihood grid
  * and sums EXACT nano-floored integers, argmax is a partial-aggregating
  * max-struct — no iteration, no driver state at all (the model lives in
  * the plan as a frame). Log-likelihoods and priors floor onto the 1e-9
  * grid before any sum, so scores and the argmax are bit-portable (the
  * [[Dsir]] discipline). The unseen-(label, term) floor ln(1/(n_l + V))
  * materializes through the full grid — the grid is |V|·|labels|, the
  * model-size bound that makes the broadcast legal at scale. */
object NaiveBayes {

  /** Train on `docs` and classify the SAME frame (the self-consistency
    * setup a routing classifier is smoke-tested with), publishing the
    * actual × predicted confusion matrix. Ties break toward the
    * lexicographically smallest label. */
  def confusion(docs: DataFrame, labelCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), col(labelCol).as("actual"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cell = toks.groupBy(col("actual").as("label"), col("term"))
      .agg(count(lit(1)).as("c"))
    val nl = cell.groupBy(col("label")).agg(sum(col("c")).as("nl"))
    val vocab = cell.select(col("term")).distinct()
    val v = vocab.count()
    val nDocs = docs.count()
    val priors = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nd"))
      .select(col("label"),
        floor(log(col("nd").cast("double") / lit(nDocs.toDouble)) * lit(1e9))
          .cast("long").as("prior_nano"))
    // full label × term grid: unseen pairs take the Laplace floor
    val grid = nl.crossJoin(vocab)
      .join(cell, Seq("label", "term"), "left")
      .select(col("label"), col("term"),
        floor(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("nl") + lit(v)).cast("double")) * lit(1e9))
          .cast("long").as("ll_nano"))
    val scores = toks
      .join(broadcast(grid), Seq("term"))
      .groupBy(col("id"), col("actual"), col("label"))
      .agg(sum(col("ll_nano")).as("tok_nano"))
      .join(broadcast(priors), Seq("label"))
      .select(col("id"), col("actual"), col("label"),
        (col("tok_nano") + col("prior_nano")).as("score_nano"))
    // argmax with min-label tie-break: min over (−score, label) structs
    val predicted = scores
      .groupBy(col("id"), col("actual"))
      .agg(min(struct((-col("score_nano")).as("neg"), col("label"))).as("m"))
      .select(col("actual"), col("m.label").as("predicted"))
    val out = predicted.groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
    val mat = out.localCheckpoint()
    toks.unpersist()
    mat
  }
}
