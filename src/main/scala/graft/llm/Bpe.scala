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

  /** Batched trainer — the scale fix for [[trainMerges]]' one driver
    * round-trip PER merge (a 30k-merge vocabulary = 30k sequential Spark
    * jobs; scheduler latency, not data, is the wall): learn up to
    * `batchSize` merges from ONE pair-count job, cutting rounds ~B-fold,
    * while provably emitting the IDENTICAL merge sequence (property-pinned
    * against [[trainMerges]] in BpeSpec).
    *
    * Why the accepted set is exactly what sequential training would pick,
    * in order — three facts about one round's (cnt desc, pair asc) ranking:
    *   1. '''Disjoint merges don't interact.''' If merge q shares no
    *      symbol with merge p (neither p's sides nor its merged symbol),
    *      applying p cannot create or destroy an occurrence of q, so q's
    *      count survives p unchanged.
    *   2. '''Every count that changes is bounded by a non-accepted
    *      count.''' A pair that p touches either existed (count only
    *      decreases) or is new around p's merged symbol — and each new
    *      (x, ab) occurrence comes from an old (x, a) occurrence, so its
    *      count ≤ that parent's old count. Parents share a symbol with an
    *      accepted merge, hence are non-accepted, hence rank ≤ C (the
    *      first non-accepted pair's count).
    *   3. '''Strict dominance kills tie inversions.''' Accepted picks are
    *      trimmed to cnt > C, so no changed/new pair (≤ C) can tie an
    *      accepted pick and steal its turn via string order.
    *   Therefore after applying accepted picks 1..j−1, pick j is still
    *   the global argmax — sequential training makes the same choices.
    *   The trim keeps a prefix (counts are non-increasing), and a
    *   fully-trimmed round falls back to the bare argmax, which is
    *   sequential by definition — every round advances ≥ 1 merge.
    *
    * Returns (merges, rounds) — rounds is the driver round-trip count the
    * batching exists to minimize. */
  def trainMergesBatch(words: DataFrame, numMerges: Int, batchSize: Int = 8,
      wordCol: String = "word", freqCol: String = "freq"): (Seq[Merge], Int) = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    var cur = words
      .select(col(freqCol).as("freq"), seedTok(col(wordCol)).as("tok"))
      .localCheckpoint(eager = false)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var rounds = 0
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val b = math.min(batchSize, numMerges - rank + 1)
      // 3b+2 rows: enough to find the disjoint prefix AND see the first
      // non-accepted pair (the dominance bound C) in one bounded collect
      val top = cur
        .select(col("freq"), explode(adjacentPairs(col("tok"))).as("pair"))
        .groupBy(col("pair"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(3 * b + 2)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        rounds += 1
        val used = scala.collection.mutable.HashSet.empty[String]
        val prefix = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var bound: Option[Long] = None // first non-accepted pair's count
        val it = top.iterator
        while (bound.isEmpty && it.hasNext) {
          val r = it.next()
          val Array(l, rr) = r.getString(0).split(" ", 2)
          val cnt = r.getLong(1)
          val syms = Seq(l, rr, l + rr)
          if (prefix.size < b && syms.forall(!used.contains(_))) {
            prefix += ((l, rr, cnt)); used ++= syms
          } else bound = Some(cnt)
        }
        // if the collect ran dry with every row accepted, no pair remains
        // outside the prefix (limit > b forces a leftover row otherwise)
        val accepted0 = bound match {
          case Some(c) =>
            val dom = prefix.takeWhile(_._3 > c) // counts non-increasing ⇒ prefix
            if (dom.isEmpty) prefix.take(1) else dom
          case None => prefix
        }
        val accepted = accepted0.toSeq
        accepted.zipWithIndex.foreach { case ((l, r, cnt), i) =>
          merges += Merge(rank + i, l, r, l + r, cnt)
        }
        cur = accepted.foldLeft(cur) { case (d, (l, r, _)) =>
          d.withColumn("tok", replace(col("tok"),
            lit(US + l + US + US + r + US), lit(US + l + r + US)))
        }.localCheckpoint(eager = false)
        rank += accepted.size
      }
    }
    (merges.result(), rounds)
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
