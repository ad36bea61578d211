package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * select raw-corpus documents whose hashed-n-gram distribution looks like
  * a TARGET corpus (the "make 100 TB of crawl look like Wikipedia" step).
  * Bag-of-hashed-ngrams models for target p and raw q over B buckets;
  * a document's importance weight is log w(x) = Σ_gram (ln p_b − ln q_b)
  * over its gram stream; resampling keeps the top-k under Gumbel noise.
  *
  * Scale shape: the learned state is ONE B-row table (the per-bucket
  * log-ratios) built by two partially-aggregated gram scans — bounded like
  * the k-means codebook, never corpus-sized — and scoring is a scan-side
  * explode + broadcast join + per-doc integer sum (uniform doc-id keys, no
  * skew). Nothing is collected to the driver.
  *
  * Portability discipline: buckets are md5-prefix integers mod B (the
  * [[Sampling]] digest convention); each bucket's log-ratio runs ONE ln
  * over a fixed ((tc+1)/(rc+1))·((rt+B)/(tt+B)) op sequence and floors
  * onto the 1e-9 grid (the BM25 idf discipline), and document scores are
  * exact integer nano-sums — order-independent, engine-portable. Gumbel
  * keys reuse [[Sampling.weightedSample]]'s digest-uniform construction. */
object Dsir {

  val DefaultBuckets = 256

  /** The positional unigram+bigram gram stream (multiset, not distinct —
    * DSIR models counts). */
  def gramStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = split(lower(trim(col(textCol))), "\\s+")
    val bigrams = when(size(words) >= 2,
      transform(sequence(lit(0), size(words) - 2),
        i => concat_ws(" ", slice(words, i + lit(1), lit(2)))))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol),
      explode(concat(words, bigrams)).as("gram"))
  }

  /** Composable bucket form — the [[graft.expr.GramBuckets]] kernel's
    * reference semantics, kept for the parity spec. */
  private[graft] def bucketOf(gram: Column, b: Int): Column =
    pmod(graft.expr.Md5Prefix(gram, 8), lit(b.toLong))

  /** The B-row learned model: per-bucket nano-quantized importance
    * log-ratio λ_b = ⌊ln(p̂_b / q̂_b)·10⁹⌋ with Laplace(+1) smoothing.
    * Buckets never seen in either corpus still get a row (they score the
    * pure total-ratio prior), so the table is closed over ANY future
    * document. Each corpus contributes one partial-agg scan; totals ride a
    * 1×1 scalar join. */
  def bucketLogRatios(raw: DataFrame, target: DataFrame,
      buckets: Int = DefaultBuckets, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = raw.sparkSession
    // fused kernel: one codegen pass text -> bucket array (bit-identical
    // to gramStream + bucketOf; parity spec-pinned)
    val rb = raw.select(
      explode(graft.expr.GramBuckets(col(textCol), buckets)).as("bucket"))
    val tb = target.select(
      explode(graft.expr.GramBuckets(col(textCol), buckets)).as("bucket"))
    val rc = rb.groupBy(col("bucket")).agg(count(lit(1)).as("rc"))
    val tc = tb.groupBy(col("bucket")).agg(count(lit(1)).as("tc"))
    // coalesce: an empty corpus sums to NULL, which would silently NULL
    // every λ — with 0 the ratio degrades to the smoothing prior instead
    val tot = rc.agg(coalesce(sum(col("rc")), lit(0L)).as("rt"))
      .crossJoin(tc.agg(coalesce(sum(col("tc")), lit(0L)).as("tt")))
    spark.range(buckets).toDF("bucket")
      .join(rc, Seq("bucket"), "left")
      .join(tc, Seq("bucket"), "left")
      .crossJoin(tot)
      .select(col("bucket"),
        floor(log(
          ((coalesce(col("tc"), lit(0L)) + 1).cast("double") /
            (coalesce(col("rc"), lit(0L)) + 1).cast("double")) *
          ((col("rt") + buckets).cast("double") /
            (col("tt") + buckets).cast("double"))) * lit(1e9))
          .cast("long").as("lam_nano"))
  }

  /** Score every document: n_grams and the exact integer nano-sum of its
    * grams' bucket log-ratios. `lambdas` (B rows) broadcasts. */
  def score(docs: DataFrame, lambdas: DataFrame,
      buckets: Int = DefaultBuckets, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol),
        explode(graft.expr.GramBuckets(col(textCol), buckets)).as("bucket"))
      .join(broadcast(lambdas), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("lam_nano")).as("score_nano"))

  /** Per-source KL divergence to the corpus gram distribution —
    * KL(p_s ‖ p) over the hashed-gram buckets — the mixture diagnostic
    * that ranks how far each source's language sits from the blend (a
    * source with near-zero KL adds no diversity; an extreme one needs its
    * own temperature). Laplace(+1) smoothing both sides.
    *
    * Portability: per (source, bucket) the contribution is ONE fixed op
    * sequence — w = (c_sb+1)/(N_s+B), ratio = the DSIR pairing, one ln,
    * floored to nano-units — and the per-source sum is exact-integer over
    * the closed B-bucket frame. Driver state: none; the aggregate is
    * sources × B rows (bounded like the λ table). */
  def sourceKl(docs: DataFrame, buckets: Int = DefaultBuckets,
      groupCol: String = "source", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val b = docs.select(col(groupCol),
      explode(graft.expr.GramBuckets(col(textCol), buckets)).as("bucket"))
    val sb = b.groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("csb"))
    val cb = b.groupBy(col("bucket")).agg(count(lit(1)).as("cb"))
    val ns = sb.groupBy(col(groupCol)).agg(sum(col("csb")).as("nsrc"))
    val ntot = cb.agg(coalesce(sum(col("cb")), lit(0L)).as("ntot"))
    val frame = ns
      .crossJoin(spark.range(buckets).toDF("bucket"))
      .join(sb, Seq(groupCol, "bucket"), "left")
      .join(broadcast(cb), Seq("bucket"), "left")
      .crossJoin(broadcast(ntot))
    val w = (coalesce(col("csb"), lit(0L)) + 1).cast("double") /
      (col("nsrc") + buckets).cast("double")
    val ratio =
      ((coalesce(col("csb"), lit(0L)) + 1).cast("double") /
        (coalesce(col("cb"), lit(0L)) + 1).cast("double")) *
      ((col("ntot") + buckets).cast("double") /
        (col("nsrc") + buckets).cast("double"))
    frame
      .select(col(groupCol), col("nsrc"),
        floor(w * log(ratio) * lit(1e9)).cast("long").as("contrib"))
      .groupBy(col(groupCol))
      .agg(first(col("nsrc")).as("n_grams"), sum(col("contrib")).as("kl_nano"))
  }

  /** Gumbel-top-k importance resampling over scored docs: key = score +
    * Gumbel(digest-uniform u), both in exact nano-units — the paper's
    * resampling, made deterministic/engine-portable by deriving u from the
    * row key like [[Sampling.weightedSample]] and flooring the Gumbel draw
    * onto the 1e-9 grid (a raw double key carries the nested-ln engines'
    * low-bit disagreement; the integer key doesn't). Plan: scan-side key +
    * TakeOrdered. */
  def resample(scored: DataFrame, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    val u = (graft.expr.Md5Prefix(col(idCol).cast("string"), 8) + lit(1L))
      .cast("double") / lit(4294967297.0)
    scored
      .withColumn("key_nano",
        col("score_nano") + floor(-log(-log(u)) * lit(1e9)).cast("long"))
      .orderBy(col("key_nano").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("score_nano"), col("key_nano"))
  }
}
