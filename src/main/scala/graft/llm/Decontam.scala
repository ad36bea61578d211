package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents whose n-gram content
  * overlaps an evaluation/benchmark set — the step every training-data
  * pipeline runs so the model is not graded on its own training data
  * (same contamination definition as the n-gram-overlap checks published
  * with GPT-3/PaLM-class training corpora: a doc is contaminated when a
  * large fraction of its n-grams appear verbatim in the benchmark).
  *
  * Scale shape: the benchmark side is TINY relative to the corpus (eval
  * sets are thousands of docs; the corpus is the 100 TB side), so its
  * distinct gram set BROADCASTS and the corpus is touched by one narrow
  * scan-side explode + a per-doc aggregation on the uniform doc-id key —
  * the corpus never shuffles by gram, and nothing is quadratic. Grams ride
  * as 64-bit [[Dedup.shingleHashes]] keys (one-pass codegen kernel), not
  * strings. */
object Decontam {

  /** Per corpus doc: (idCol, n_grams, n_hits, contaminated) where
    * contaminated ⇔ |doc grams ∩ benchmark grams| / |doc grams| ≥
    * `threshold`. Docs with zero grams ([[Dedup.shingleHashes]] emits one
    * gram even for empty text) always report. */
  def contamination(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
      threshold: Double = 0.3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val benchGrams = benchmark
      .select(explode(Dedup.shingleHashes(col(textCol), n)).as("h"))
      .distinct()
      .withColumn("hit", lit(1L))
    corpus
      .select(col(idCol), explode(Dedup.shingleHashes(col(textCol), n)).as("h"))
      .join(broadcast(benchGrams), Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("contaminated",
        col("n_hits").cast("double") / col("n_grams").cast("double")
          >= threshold)
  }

  /** The decontaminated corpus: drop every contaminated doc. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
      threshold: Double = 0.3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    corpus.join(
      contamination(corpus, benchmark, n, threshold, idCol, textCol)
        .filter(col("contaminated")).select(col(idCol)),
      Seq(idCol), "left_anti")

  /** SEMANTIC decontamination: flag corpus vectors whose max cosine against
    * any benchmark embedding reaches `threshold` — the embedding-space
    * complement of the verbatim n-gram check above (catches paraphrased /
    * translated benchmark leakage that shares no 5-gram).
    *
    * Scale shape mirrors [[contamination]]'s asymmetry: the benchmark panel
    * is the small side, so it BROADCASTS into a scan-side scoring
    * projection over the corpus — per corpus row, |panel| codegen'd
    * [[graft.expr.DotProduct]]s reduced by `greatest`, zero corpus
    * shuffles, output one row per corpus vector. Panel norms fold into the
    * literal-free plan once per row pair; max over doubles is
    * order-independent, so the published score is partitioning- and
    * engine-portable (the [[Similarity]] sequential-fold discipline).
    * For panels too large to broadcast-scan (rare: eval suites are MBs),
    * gate with [[Similarity.lshKnn]]'s bucketed join first and score only
    * colliding pairs. */
  def semanticContamination(corpus: DataFrame, benchmark: DataFrame,
      threshold: Double = 0.95, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val panel = benchmark.select(col(idCol).as("bench_id"),
      col(vecCol).as("bvec"))
    val scored = corpus
      .select(col(idCol), col(vecCol))
      .crossJoin(broadcast(panel))
      .groupBy(col(idCol))
      .agg(max(Similarity.cosine(col(vecCol), col("bvec"))).as("max_sim"))
    scored.select(col(idCol), col("max_sim"),
      (col("max_sim") >= threshold).as("contaminated"))
  }
}
