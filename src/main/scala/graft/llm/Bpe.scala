package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge trainer — the step between
  * [[TextAnalysis.tokenizeToIds]]'s fixed word vocabulary and a real
  * subword tokenizer: learn the `numMerges` highest-count adjacent symbol
  * merges over a corpus word-frequency table (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016).
  *
  * Scale shape — the SpaceSaving/IVF "bounded driver state" pattern:
  * per round, pair counting is a distributed explode + partial-aggregating
  * sum keyed by pair (the corpus-sized work), the ONLY driver traffic is a
  * 1-row TakeOrdered argmax, and applying the winning merge is a pure
  * scan-side string rewrite. Driver state after m rounds is the m-row
  * merge table. The word table iterates, so each round lazily checkpoints
  * and the next round's count action materializes it (the clustering
  * loop's discipline — one job per merge).
  *
  * Tokenization is carried as every symbol wrapped in U+001F (unit
  * separator): `␟a␟␟b␟␟c␟`. The merge rewrite is then a plain substring
  * replace of `␟a␟␟b␟` → `␟ab␟`; each symbol owns BOTH its delimiters, so
  * adjacent matches share no characters and sequential left-to-right
  * replace (Java and DuckDB semantics alike) is EXACTLY BPE's greedy
  * leftmost-first application. A space-joined carrier gets this wrong: on
  * runs like [a,b,a,b] the second match's leading space is already
  * consumed by the first ([ab,a,b] instead of [ab,ab]), and un-anchored
  * patterns can false-match across symbol boundaries ("al l" vs "a ll").
  * Input words must not contain U+001F — whitespace-split corpus tokens
  * never do. */
object Bpe {

  private val US = "\u001f"

  /** One learned merge: the `rank`-th merge rewrites adjacent
    * (left, right) → merged; `cnt` is its frequency-weighted occurrence
    * count at pick time. */
  case class Merge(rank: Int, left: String, right: String,
      merged: String, cnt: Long)

  /** Corpus → (word, freq) table: lowercased whitespace tokens — the
    * standard BPE training input (training on the word-frequency table,
    * never on running text, is what makes each round one small shuffle:
    * the explode fans out |vocab| × avg-word-length rows, not the
    * corpus). */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Seed tokenization: each character a symbol, plus the end-of-word
    * marker `</w>` (distinguishes "est"-as-suffix from "est"-as-word). */
  private[llm] def seedTok(word: Column): Column =
    concat(
      array_join(transform(
        sequence(lit(1), length(word)),
        i => concat(lit(US), substring(word, i, lit(1)), lit(US))), ""),
      lit(US + "</w>" + US))

  /** Symbols of a carrier string: split on the separator, drop the empty
    * fragments between/around the wrapped symbols. */
  private def symbols(tok: Column): Column =
    filter(split(tok, US), x => x =!= lit(""))

  /** Adjacent symbol pairs as "left right". Guarded for 1-symbol words:
    * sequence(1, 0) would DESCEND in Spark and fabricate pairs. */
  private[llm] def adjacentPairs(tok: Column): Column = {
    val syms = symbols(tok)
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => concat_ws(" ", element_at(syms, i), element_at(syms, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** Train `numMerges` merges over a (word, freq) table. Returns the merge
    * table in learned order; stops early when no adjacent pair remains.
    * Tie-break is pinned to (count desc, pair asc) — the published
    * algorithm leaves it open; a deterministic oracle cannot. */
  def trainMerges(words: DataFrame, numMerges: Int,
      wordCol: String = "word", freqCol: String = "freq"): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    var cur = words
      .select(col(freqCol).as("freq"), seedTok(col(wordCol)).as("tok"))
      .localCheckpoint(eager = false)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = cur
        .select(col("freq"), explode(adjacentPairs(col("tok"))).as("pair"))
        .groupBy(col("pair"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        val Array(l, r) = pair.split(" ", 2)
        merges += Merge(rank, l, r, l + r, cnt)
        cur = cur
          .withColumn("tok", replace(col("tok"),
            lit(US + l + US + US + r + US), lit(US + l + r + US)))
          .localCheckpoint(eager = false)
        rank += 1
      }
    }
    merges.result()
  }

  /** Merge table → DataFrame for catalog/oracle publication. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }

  /** Apply a learned merge table to a carrier column: one chained
    * scan-side replace per merge, in learned order — BPE inference is
    * rank-ordered rule application, and each replace is the same
    * greedy-leftmost rewrite training used. */
  private[llm] def applyMerges(tok: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(tok) { (t, m) =>
      replace(t, lit(US + m.left + US + US + m.right + US),
        lit(US + m.merged + US))
    }

  /** Tokenize words with a trained merge table — the inference half of
    * [[trainMerges]]. Returns (word…, tokens: array<string>). Pure
    * scan-side projection (a codegen'd chain of `merges.length` string
    * replaces): no shuffle, no per-row driver work — encode a 100 TB
    * corpus's word table by broadcasting nothing but the expression
    * itself. */
  def encode(words: DataFrame, merges: Seq[Merge],
      wordCol: String = "word"): DataFrame =
    words.withColumn("tokens",
      symbols(applyMerges(seedTok(col(wordCol)), merges)))
}
