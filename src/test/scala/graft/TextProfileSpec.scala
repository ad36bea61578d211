package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expr.TextProfile
import graft.llm.TextAnalysis

/** Pins the one-pass [[TextProfile]] kernel to the Column-composed
  * originals it replaced (HOF filter counts, regexp_replace counts,
  * regexp_extract_all) — the DuckDB oracles mirror THOSE, so kernel ≡
  * composable form ⇒ kernel ≡ oracle. */
class TextProfileSpec extends SparkTestBase {
  import spark.implicits._

  // the pre-kernel composable formulas, verbatim
  private def words(text: Column) = split(lower(trim(text)), "\\s+")
  private def hofHits(text: Column, ws: Seq[String]) =
    size(filter(words(text), t => t.isin(ws: _*)))
  private def oldCjk(text: Column) =
    length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
  private def oldPunct(text: Column) =
    length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
  private def oldDigit(text: Column) =
    length(text) - length(regexp_replace(text, "[0-9]", ""))
  private def oldBpeish(text: Column) =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
  private def oldNWords(text: Column) = size(words(text))

  private def checkParity(texts: Seq[String]): Unit = {
    val df = texts.toDF("text")
    val p = TextProfile(col("text"))
    val rows = df.select(
      col("text"),
      p.getItem(TextProfile.IEn).as("k_en"),
      hofHits(col("text"), TextAnalysis.StopwordsEn).as("o_en"),
      p.getItem(TextProfile.IFr).as("k_fr"),
      hofHits(col("text"), TextAnalysis.StopwordsFr).as("o_fr"),
      p.getItem(TextProfile.IEs).as("k_es"),
      hofHits(col("text"), TextAnalysis.StopwordsEs).as("o_es"),
      p.getItem(TextProfile.IDe).as("k_de"),
      hofHits(col("text"), TextAnalysis.StopwordsDe).as("o_de"),
      p.getItem(TextProfile.ICjk).as("k_cjk"), oldCjk(col("text")).as("o_cjk"),
      p.getItem(TextProfile.IPunct).as("k_p"), oldPunct(col("text")).as("o_p"),
      p.getItem(TextProfile.IDigit).as("k_d"), oldDigit(col("text")).as("o_d"),
      p.getItem(TextProfile.IBpeish).as("k_b"), oldBpeish(col("text")).as("o_b"),
      p.getItem(TextProfile.INWords).as("k_w"), oldNWords(col("text")).as("o_w"),
      p.getItem(TextProfile.ITrimLen).as("k_t"), length(trim(col("text"))).as("o_t"))
      .collect()
    rows.foreach { r =>
      val t = r.getAs[String]("text")
      for (f <- Seq("en", "fr", "es", "de", "cjk", "p", "d", "b", "w", "t")) {
        assert(r.getAs[Int](s"k_$f") === r.getAs[Int](s"o_$f"),
          s"field $f diverges on ${t.map(c => f"\\u${c.toInt}%04x").mkString}")
      }
    }
  }

  test("kernel matches composable formulas on adversarial fixtures") {
    checkParity(Seq(
      "", " ", "  ", "\t", "\n", " \t ", "a", " a ", "a  b", "\ta b\t",
      "the quick brown fox", "The THE tHe on IN is",
      "le la de et un une est dans pour sur",
      "der die das und ein eine ist in mit auf",
      "el la de y un una es en para con",
      "in la de un es", // shared tokens hit several languages
      "with, punctuation! (lots) [of] {it}~ @#$%^&*",
      "123 456.789 a1b2c3", "...", "a-b-c", "__init__",
      "你好世界", "中文 text mixed 中文", "日本語テスト",
      "ça va très bien naïve café", // non-ASCII letters
      "word " * 50, "x" * 500,
      "ends with space ", " starts with space", "tab\tseparated\twords",
      "newline\nseparated\nwords", "cr\randvt\fand ff"))
  }

  test("kernel matches composable formulas on random strings") {
    // deterministic fuzz: alphabet biased toward interesting chars — ws,
    // punct, digits, stopword fragments, CJK, accented letters
    val rnd = new scala.util.Random(20260812L)
    val ws = Array(' ', '\t', '\n', '\r', '\f', '')
    val punct = Array('!', '.', ',', '?', '(', ')', '~', '@')
    val frags = Array("the", "and", "for", "with", "le", "la", "de", "un",
      "der", "die", "el", "في", "naïve")
    def randText(): String = {
      val n = rnd.nextInt(60)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        rnd.nextInt(7) match {
          case 0 => sb += ws(rnd.nextInt(ws.length))
          case 1 => sb += ('a' + rnd.nextInt(26)).toChar
          case 2 => sb += ('0' + rnd.nextInt(10)).toChar
          case 3 => sb ++= frags(rnd.nextInt(frags.length))
          case 4 => sb += punct(rnd.nextInt(punct.length))
          case 5 => sb += (0x4e00 + rnd.nextInt(0x9fff - 0x4e00)).toChar
          case 6 => sb += (0x00a1 + rnd.nextInt(0x045e)).toChar
        }
      }
      sb.toString
    }
    checkParity(Seq.fill(300)(randText()))
  }

  test("shingle_hashes kernel matches the composable shingle+hash chain") {
    val fixtures = Seq(
      "", " ", "a", "a b", "a b c", "a b c d e",
      "The Quick BROWN fox", "  padded   with   spaces  ",
      "tab\tand\nnewline separated words here",
      "répété répété açaí Ümlaut WORDS", "中文 mixed 中文 tokens more",
      "dup dup dup dup dup dup", // repeated shingles → distinct collapses
      "one") ++ (0 until 100).map { i =>
      val rnd = new scala.util.Random(i)
      (0 until rnd.nextInt(30)).map(_ =>
        Seq("the", "fox", "Ran", "9", "a-b", "x", "\t", "日本")(rnd.nextInt(8)))
        .mkString(" ")
    }
    for (w <- Seq(1, 3, 5)) {
      val composed = transform(array_distinct(
        when(size(split(lower(trim(col("t"))), "\\s+")) >= w,
          transform(sequence(lit(0), size(split(lower(trim(col("t"))), "\\s+")) - w),
            i => concat_ws(" ", slice(split(lower(trim(col("t"))), "\\s+"), i + lit(1), lit(w)))))
          .otherwise(array(concat_ws(" ", split(lower(trim(col("t"))), "\\s+"))))),
        s => xxhash64(s))
      val rows = fixtures.toDF("t")
        .select(col("t"), graft.expr.ShingleHashes(col("t"), w).as("k"),
          composed.as("o"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"w=$w diverges on '${r.getString(0)}'")
      }
    }
  }

  test("non-distinct w=1 shingle_hashes equals the token-multiset hash chain") {
    val fixtures = Seq("", "a", "dup dup dup", "The the THE x", " lead trail ",
      "a\tb\nc", "日本 日本 mixed")
    val rows = fixtures.toDF("t").select(
      col("t"),
      graft.expr.ShingleHashes(col("t"), 1, distinct = false).as("k"),
      transform(split(lower(trim(col("t"))), "\\s+"), x => xxhash64(x)).as("o"),
      graft.llm.Dedup.simhash(col("t")).as("sig"),
      graft.expr.SimHash64(
        transform(split(lower(trim(col("t"))), "\\s+"), x => xxhash64(x))).as("sig_o"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"tokens diverge on '${r.getString(0)}'")
      assert(r.getLong(3) === r.getLong(4), s"simhash diverges on '${r.getString(0)}'")
    }
  }

  test("SQL registration works") {
    graft.GraftFunctions.registerAll(spark)
    val r = Seq("the fox in the hole").toDF("t")
      .selectExpr("text_profile(t) AS p").head().getSeq[Int](0)
    assert(r(TextProfile.IEn) === 3) // the, in, the
    assert(r(TextProfile.INWords) === 5)
  }

  test("minhash_sig SQL rejects non-literal k cleanly") {
    graft.GraftFunctions.registerAll(spark)
    val e = intercept[Exception] {
      Seq((Array(1L, 2L), 4)).toDF("hs", "k")
        .selectExpr("minhash_sig(hs, k)").head()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
