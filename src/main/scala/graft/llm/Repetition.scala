package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality signals for training-data curation, after the
  * MassiveText/Gopher filtering rules: documents dominated by repeated
  * lines or repeated word n-grams are boilerplate/spam and get filtered
  * before near-dup detection ever runs.
  *
  * Signals:
  *   - duplicate-line fraction: lines beyond the first occurrence of their
  *     text, over all non-blank lines,
  *   - duplicate-line character fraction: characters on those repeated
  *     lines, over all non-blank-line characters,
  *   - top n-gram character fraction (n small, 2-4): characters claimed by
  *     occurrences of the single most frequent word n-gram, over the
  *     document's characters (capped at 1.0 — overlapping occurrences can
  *     nominally exceed the text; the Gopher exact covered-position union
  *     is not worth a per-position expansion at scale),
  *   - duplicated n-gram character fraction (n larger, 5-10): characters in
  *     n-gram occurrences whose gram appears more than once, over all
  *     n-gram occurrence characters.
  *
  * Scale structure: each signal is explode → two-level hash aggregation
  * keyed by (doc_id, line|gram) then (doc_id) — keys carry the doc id, so
  * skew is bounded by the largest single document, partial aggregation
  * collapses repeats map-side, and no join ever leaves the doc's own rows.
  * The profile join of the four signal frames is doc_id-equi over already
  * doc_id-hashed aggregates. No UDFs; everything stays in codegen.
  */
object Repetition {

  private def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word n-grams of lowercased text, duplicates KEPT — counts are the
    * whole point here. Same short-text fallback as [[Dedup.shingles]]
    * (fewer than n words → one gram of the whole text), but no distinct. */
  def ngrams(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + lit(1), lit(n)))))
      .otherwise(array(concat_ws(" ", w)))
  }

  /** Non-blank lines (whitespace-only lines dropped), duplicates kept,
    * original spacing preserved — dup detection is on the raw line text. */
  def lines(text: Column): Column =
    filter(split(text, "\n"), l => length(trim(l)) > 0)

  /** The HOF composition [[graft.expr.RepetitionGrams]] replaces — kept as
    * the executable spec of the kernel's semantics (parity-pinned). */
  def taggedHof(text: Column, ns: Seq[Int]): Column = {
    def tag(kind: String, arr: Column): Column =
      transform(arr, g => struct(lit(kind).as("kind"), g.as("gram")))
    concat(tag("line", lines(text)) +: ns.map(n => tag(s"g$n", ngrams(text, n))): _*)
  }

  /** Per-document duplicate-line stats: (idCol, n_lines, dup_line_frac,
    * dup_line_char_frac). Documents with no non-blank lines get zeros. */
  def lineStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val perLine = docs
      .select(col(idCol), explode(lines(col(textCol))).as("line"))
      .groupBy(col(idCol), col("line"))
      .agg(count(lit(1)).as("cnt"))
    val perDoc = perLine.groupBy(col(idCol)).agg(
      sum(col("cnt")).as("n_lines"),
      ((sum(col("cnt")) - count(lit(1))).cast("double")
        / sum(col("cnt")).cast("double")).as("dup_line_frac"),
      (sum(when(col("cnt") > 1, col("cnt") * length(col("line"))).otherwise(0L))
        .cast("double")
        / sum(col("cnt") * length(col("line"))).cast("double"))
        .as("dup_line_char_frac"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left").select(
      col(idCol),
      coalesce(col("n_lines"), lit(0L)).as("n_lines"),
      coalesce(col("dup_line_frac"), lit(0.0)).as("dup_line_frac"),
      coalesce(col("dup_line_char_frac"), lit(0.0)).as("dup_line_char_frac"))
  }

  /** Per-document most frequent word n-gram and the character fraction it
    * claims: (idCol, top{n}_gram, top{n}_char_frac). Ties break to the
    * lexicographically greatest gram (max over (count, gram) pairs) so the
    * answer is deterministic under any partitioning. */
  def topNgram(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val perGram = docs
      .select(col(idCol), length(trim(col(textCol))).as("n_chars"),
        explode(ngrams(col(textCol), n)).as("gram"))
      .groupBy(col(idCol), col("n_chars"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    perGram.groupBy(col(idCol)).agg(
        max(struct(col("cnt"), col("gram"))).as("top"),
        max(col("n_chars")).as("n_chars"))
      .select(col(idCol), col("top.gram").as(s"top${n}_gram"),
        least(lit(1.0),
          (col("top.cnt") * length(col("top.gram"))).cast("double")
            / greatest(col("n_chars"), lit(1)).cast("double"))
          .as(s"top${n}_char_frac"))
  }

  /** Per-document duplicated n-gram character fraction: characters in
    * occurrences of grams seen more than once, over all n-gram occurrence
    * characters. (idCol, dup{n}_char_frac). */
  def dupNgramCharFrac(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val perGram = docs
      .select(col(idCol), explode(ngrams(col(textCol), n)).as("gram"))
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    perGram.groupBy(col(idCol)).agg(
      (sum(when(col("cnt") > 1, col("cnt") * length(col("gram"))).otherwise(0L))
        .cast("double")
        / greatest(sum(col("cnt") * length(col("gram"))), lit(1L)).cast("double"))
        .as(s"dup${n}_char_frac"))
  }

  /** The composed per-document repetition profile: line stats + top-2/3
    * gram fractions + duplicated-5-gram fraction. One row per document.
    *
    * FUSED: the four signals share one tagged explode — each (line | 2-gram
    * | 3-gram | 5-gram) occurrence becomes a (kind, gram) row — then ONE
    * (id, kind, gram) count, ONE (id, kind) stats aggregation, and a
    * per-id pivot. Versus composing the public per-signal functions
    * (4 scans, 8 aggregations, 3 joins) this is 1 scan and 3 aggregations;
    * the formulas are expression-identical per kind, so results are
    * bit-equal to the composed form (the oracle pins this). Keys still
    * carry the doc id — skew stays bounded by the largest document. */
  def profile(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // one-pass codegen'd kernel; taggedHof below is the reference
    // composition it must stay bit-equal to (pinned by RepetitionSpec)
    val tagged = docs.select(
      col(idCol), length(trim(t)).as("n_chars"),
      explode(graft.expr.RepetitionGrams(t, Seq(2, 3, 5))).as("kg"))
      .select(col(idCol), col("n_chars"),
        col("kg.kind").as("kind"), col("kg.gram").as("gram"))
    val perGram = tagged
      .groupBy(col(idCol), col("kind"), col("gram"))
      .agg(max(col("n_chars")).as("n_chars"), count(lit(1)).as("cnt"))
    val perKind = perGram
      .groupBy(col(idCol), col("kind"))
      .agg(
        max(col("n_chars")).as("n_chars"),
        sum(col("cnt")).as("occ"),
        count(lit(1)).as("uniq"),
        sum(col("cnt") * length(col("gram"))).as("chars_all"),
        sum(when(col("cnt") > 1, col("cnt") * length(col("gram"))).otherwise(0L))
          .as("chars_dup"),
        max(struct(col("cnt"), col("gram"))).as("top"))
    def topFrac = least(lit(1.0),
      (col("top.cnt") * length(col("top.gram"))).cast("double")
        / greatest(col("n_chars"), lit(1)).cast("double"))
    perKind.groupBy(col(idCol)).agg(
      // line-less documents have no 'line' rows → zeros, as lineStats' left
      // join produced
      coalesce(max(when(col("kind") === "line", col("occ"))), lit(0L))
        .as("n_lines"),
      coalesce(max(when(col("kind") === "line",
        (col("occ") - col("uniq")).cast("double") / col("occ").cast("double"))),
        lit(0.0)).as("dup_line_frac"),
      coalesce(max(when(col("kind") === "line",
        col("chars_dup").cast("double") / col("chars_all").cast("double"))),
        lit(0.0)).as("dup_line_char_frac"),
      max(when(col("kind") === "g2", col("top.gram"))).as("top2_gram"),
      max(when(col("kind") === "g2", topFrac)).as("top2_char_frac"),
      max(when(col("kind") === "g3", topFrac)).as("top3_char_frac"),
      max(when(col("kind") === "g5",
        col("chars_dup").cast("double")
          / greatest(col("chars_all"), lit(1L)).cast("double")))
        .as("dup5_char_frac"))
  }
}
