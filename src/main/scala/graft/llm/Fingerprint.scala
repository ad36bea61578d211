package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003 — the MOSS algorithm): hash every word k-gram, slide a window of w
  * consecutive hashes, and record the window minimum (rightmost on ties).
  * The selected (position, hash) set is the document's fingerprint — a
  * guaranteed-coverage sample (any shared run of w+k-1 words between two
  * documents shares ≥1 fingerprint) at expected density 2/(w+1), the
  * property ad-hoc "every i-th shingle" sampling does not have.
  *
  * Scale shape: entirely SCAN-SIDE — one projection of higher-order
  * functions per document (grams → hashes → window argmins → distinct),
  * zero shuffles; the output explode is the narrow (doc_id, pos, fp)
  * stream a fingerprint-equi self-join consumes exactly like
  * [[Dedup.minhashNearDups]]'s band keys. Documents are bounded (a row
  * fits in memory by the corpus contract), so the per-row O(n·w) transform
  * is safe at any corpus size.
  *
  * Portability: hashes are md5-prefix integers (the [[Sampling]] digest
  * convention) and the rightmost-min pick is expressed as
  * first-position-in-reversed-window — both exactly mirrored by the DuckDB
  * oracle's list comprehension. */
object Fingerprint {

  /** (doc_id, pos, fp) fingerprint rows; `pos` is the 1-based k-gram
    * position the selected hash sits at. Documents shorter than k words
    * fingerprint their whole text as one gram; gram counts below w shrink
    * the single window to the gram count. */
  def winnow(docs: DataFrame, k: Int = 3, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")
    val words = split(lower(trim(col(textCol))), "\\s+")
    val grams = when(size(words) >= k,
      transform(sequence(lit(0), size(words) - k),
        i => concat_ws(" ", slice(words, i + lit(1), lit(k)))))
      .otherwise(array(concat_ws(" ", words)))
    val hashes = transform(grams,
      g => graft.expr.Md5Prefix(g, 8))
    // (fp, pos) is deduplicated as the single long fp·2^20 + pos (fp is a
    // 32-bit md5 prefix, pos bounded by a 2^20-gram = ~1M-word document): DuckDB's list_distinct
    // cannot deduplicate structs, and the encoded form keeps the mirror
    // exact on both engines.
    // Fail fast past the encoding width (the lshBucket assert_true idiom):
    // a silent pos wraparound would alias fingerprints across positions.
    val guarded = when(assert_true(size(col("h")) <= 1048575,
      lit("winnow: document exceeds 2^20 grams — raise the pos encoding width"))
      .isNull, col("h"))
    docs
      .select(col(idCol), hashes.as("h"))
      .select(col(idCol), guarded.as("h"))
      .select(col(idCol),
        explode(array_distinct(transform(
          when(size(col("h")) >= w, sequence(lit(w), size(col("h"))))
            .otherwise(sequence(size(col("h")), size(col("h")))),
          e => {
            val st = when(e >= w, e - w + 1).otherwise(lit(1))
            val s = slice(col("h"), st, e - st + 1)
            val m = array_min(s)
            m * lit(1048576L) + (e - array_position(reverse(s), m) + 1)
          }))).as("sel"))
      .select(col(idCol), expr("sel % 1048576").as("pos"),
        expr("sel div 1048576").as("fp"))
  }

  /** Fingerprint-sharing candidate pairs — the MOSS match step: two docs
    * are candidates when they share ≥ `minShared` selected fingerprints.
    * The self-join is fp-equi (uniformly distributed md5 keys); `maxDf`
    * prunes boilerplate fingerprints shared by too many docs BEFORE the
    * join, the [[Dedup]] hot-shingle rail. */
  def sharedFingerprints(fps: DataFrame, minShared: Long = 2,
      maxDf: Long = 100, idCol: String = "doc_id"): DataFrame = {
    val pruned = fps.select(col(idCol), col("fp")).distinct()
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col("df") <= maxDf)
      .select(col(idCol), col("fp"))
    val a = pruned.select(col(idCol).as("id_a"), col("fp"))
    val b = pruned.select(col(idCol).as("id_b"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
