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
}
