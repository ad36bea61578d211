package graft

import graft.llm.Repetition

/** Pins the Gopher-style repetition signals on multi-line fixtures — the
  * synthetic documents table is single-line, so the catalog oracle never
  * exercises the line-dup path; these fixtures do. */
class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    // 3 non-blank lines, "a b" twice: dup_line_frac = 1/3,
    // dup chars = 2*3 of 2*3+3 = 2/3
    (0L, "a b\na b\nc d"),
    // blank and whitespace-only lines are dropped before dup detection
    (1L, "x y\n\n   \nx y"),
    (2L, ""),
    (3L, "   \n "),
    // no repetition at all
    (4L, "one two three four five six")
  ).toDF("doc_id", "text")

  test("lineStats: dup fractions and blank-line handling") {
    val m = Repetition.lineStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(m(0L) === ((3L, 1.0 / 3.0, 6.0 / 9.0)))
    assert(m(1L) === ((2L, 1.0 / 2.0, 1.0)))
    assert(m(2L) === ((0L, 0.0, 0.0)))
    assert(m(3L) === ((0L, 0.0, 0.0)))
    assert(m(4L) === ((1L, 0.0, 0.0)))
  }

  test("topNgram: most frequent bigram, char fraction, deterministic ties") {
    // words: a b a b c d → bigrams: "a b","b a","a b","b c","c d"
    val m = Repetition.topNgram(docs, 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    // doc 0: top "a b" ×2, len 3; n_chars = len("a b\na b\nc d") = 11
    assert(m(0L) === (("a b", 6.0 / 11.0)))
    // doc 4: all bigrams unique → tie on cnt=1 breaks to the
    // lexicographically greatest bigram
    assert(m(4L)._1 === "two three")
    // empty doc: fallback gram is "", fraction 0
    assert(m(2L) === (("", 0.0)))
    // whitespace doc: trim strips spaces but not \n, so the word split
    // yields two empty words and the fallback bigram is a single space over
    // a 1-char ("\n") text — degenerate but deterministic
    assert(m(3L) === ((" ", 1.0)))
  }

  test("topNgram caps overlapping-occurrence fraction at 1") {
    val spam = Seq((0L, "a a a a a a a a")).toDF("doc_id", "text")
    val r = Repetition.topNgram(spam, 2).collect().head
    assert(r.getString(1) === "a a")
    assert(r.getDouble(2) === 1.0)
  }

  test("dupNgramCharFrac: repeated 5-grams vs clean text") {
    val d = Seq(
      (0L, "p q r s t p q r s t p q r s t"), // heavy 5-gram repetition
      (1L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val m = Repetition.dupNgramCharFrac(d, 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(0L) > 0.5)
    assert(m(1L) === 0.0)
  }

  test("profile composes one row per doc") {
    val p = Repetition.profile(docs)
    assert(p.count() === 5)
    assert(p.columns.toSeq === Seq("doc_id", "n_lines", "dup_line_frac",
      "dup_line_char_frac", "top2_gram", "top2_char_frac", "top3_char_frac",
      "dup5_char_frac"))
  }

  test("RepetitionGrams kernel is bit-equal to the HOF composition") {
    import org.apache.spark.sql.functions.{col, explode}
    val edge = Seq(
      (0L, "a b\nc d  e\na b\n\n   \nf"),   // dup lines, blank + space-only lines
      (1L, "one"),                           // fewer tokens than every n
      (2L, ""),                              // empty text
      (3L, "  Tabs\tand  Runs   x  "),       // mixed separators, edge spaces
      (4L, "x y x y x y x y z"),             // heavy 2-gram repetition
      (5L, "line one\nline one\nline two")
    ).toDF("doc_id", "text")
    val ns = Seq(2, 3, 5)
    def dump(c: org.apache.spark.sql.Column) = edge
      .select(col("doc_id"), explode(c).as("kg"))
      .select(col("doc_id"), col("kg.kind"), col("kg.gram"))
      .as[(Long, String, String)].collect().toSeq
    assert(dump(graft.expr.RepetitionGrams(col("text"), ns))
      === dump(Repetition.taggedHof(col("text"), ns)))
  }
}
