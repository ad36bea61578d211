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

  /** SURGICAL decontamination — span-level: instead of dropping whole
    * docs whose gram-overlap ratio crosses a threshold, emit the exact
    * maximal token spans of each corpus doc covered by a
    * `windowTokens`-token window that appears VERBATIM in the benchmark
    * (then cut just those with [[Dedup.removeSpans]], keeping the rest
    * of the document). This is [[Dedup.duplicatedSpans]]' ExactSubstr
    * machinery pointed across corpora: the duplicated-window set is "in
    * the benchmark" rather than "in ≥2 corpus docs".
    *
    * Scale shape inherits [[contamination]]'s asymmetry: the benchmark's
    * distinct window set BROADCASTS into a semi-join over the corpus'
    * positional windows (one codegen'd scan pass); the only exchange is
    * the per-doc island sort. The corpus never shuffles by window. */
  def contaminationSpans(corpus: DataFrame, benchmark: DataFrame,
      windowTokens: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val benchWindows = benchmark
      .select(explode(Dedup.shingleHashes(col(textCol), windowTokens)).as("h"))
      .distinct()
    val pos = Dedup.positionalWindows(corpus, windowTokens, idCol, textCol)
    Dedup.spansFromHits(
      pos.join(broadcast(benchWindows), Seq("h"), "left_semi"), windowTokens)
  }

  /** Leak forensics, grouped by BENCHMARK doc: which eval items leaked
    * into the corpus, how widely (distinct corpus docs), and how heavily
    * (matching window occurrences) — the report that decides whether a
    * benchmark split is salvageable or must be regenerated. Same
    * broadcast asymmetry as [[contaminationSpans]], but the benchmark
    * side keeps its doc id through an inner join so hits attribute back
    * to the eval item. Window keys stay 64-bit hashes end-to-end. */
  def leakReport(corpus: DataFrame, benchmark: DataFrame,
      windowTokens: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val benchWindows = benchmark
      .select(col(idCol).as("bench_id"),
        explode(Dedup.shingleHashes(col(textCol), windowTokens)).as("h"))
      .distinct()
    Dedup.positionalWindows(corpus, windowTokens, idCol, textCol)
      .join(broadcast(benchWindows), Seq("h"))
      .groupBy(col("bench_id"))
      .agg(count_distinct(col("doc_id")).as("n_corpus_docs"),
        count(lit(1)).as("n_window_hits"))
  }

  /** The surgically decontaminated corpus: every leaked span cut, every
    * doc kept. */
  def decontaminateSpans(corpus: DataFrame, benchmark: DataFrame,
      windowTokens: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Dedup.removeSpans(corpus,
      contaminationSpans(corpus, benchmark, windowTokens, idCol, textCol),
      idCol, textCol)

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
