package graft

import graft.llm.Bpe

/** BPE merge trainer vs a sequential reference implementation (the
  * published algorithm over an in-memory word-frequency map), including
  * the greedy-leftmost case a space-joined carrier gets wrong. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference BPE: symbol vectors, explicit greedy leftmost merge walk. */
  private def refBpe(words: Map[String, Long], m: Int): Seq[Bpe.Merge] = {
    var toks: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toVector :+ "</w>", f) }
    val out = Seq.newBuilder[Bpe.Merge]
    var rank = 1
    var done = false
    while (rank <= m && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      toks.foreach { case (v, f) =>
        v.indices.dropRight(1).foreach { i =>
          val p = (v(i), v(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a + " " + b) }.head
        out += Bpe.Merge(rank, l, r, l + r, cnt)
        toks = toks.map { case (v, f) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < v.length) {
            if (i + 1 < v.length && v(i) == l && v(i + 1) == r) {
              nb += (l + r); i += 2 // greedy leftmost, consume both
            } else { nb += v(i); i += 1 }
          }
          (nb.result(), f)
        }
        rank += 1
      }
    }
    out.result()
  }

  test("bpe: adjacent repeats merge greedy-leftmost ([a,b,a,b] -> [ab,ab], not [ab,a,b])") {
    // 'abab' x5 forces (a,b) first; the SECOND occurrence inside the same
    // word must also merge in that round — the delimiter-sharing trap
    val words = Map("abab" -> 5L, "cd" -> 2L)
    val got = Bpe.trainMerges(words.toSeq.toDF("word", "freq"), 2)
    val want = refBpe(words, 2)
    assert(got === want)
    // rank-1 merge is (a,b) with weighted count 10 (2 occurrences x freq 5)
    assert(got.head === Bpe.Merge(1, "a", "b", "ab", 10L))
  }

  test("bpe: substring symbols never false-match across boundaries ('al l' vs 'a ll')") {
    // after (l,l) merges, a word ending in ...'al'+'l' must NOT lose its
    // 'l l' to a pattern matching across the 'al' boundary
    val words = Map("all" -> 4L, "ball" -> 3L, "al" -> 2L)
    val got = Bpe.trainMerges(words.toSeq.toDF("word", "freq"), 3)
    assert(got === refBpe(words, 3))
  }

  test("bpe: randomized corpora match the reference for 5 merges") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val alphabet = "abcde"
      val words = (1 to 12).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.distinct.map(w => w -> (1L + rnd.nextInt(9))).toMap
      val got = Bpe.trainMerges(words.toSeq.toDF("word", "freq"), 5)
      val want = refBpe(words, 5)
      assert(got === want, s"trial $trial diverged: corpus $words")
    }
  }

  test("bpe: batched trainer emits the identical merge sequence in fewer rounds") {
    // randomized corpora: batch (B=4) ≡ sequential for 8 merges
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val alphabet = "abcde"
      val words = (1 to 12).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.distinct.map(w => w -> (1L + rnd.nextInt(9))).toMap
      val df = words.toSeq.toDF("word", "freq")
      val (got, rounds) = Bpe.trainMergesBatch(df, 8, batchSize = 4)
      assert(got === Bpe.trainMerges(df, 8), s"trial $trial diverged: $words")
      assert(rounds <= got.size)
    }
    // adversarial overlap: every top pair shares symbols ("abab" runs) —
    // the dominance trim must fall back to 1 merge/round, never diverge
    val overlap = Map("abab" -> 9L, "aba" -> 5L, "bab" -> 5L)
    val odf = overlap.toSeq.toDF("word", "freq")
    val (og, _) = Bpe.trainMergesBatch(odf, 6, batchSize = 4)
    assert(og === Bpe.trainMerges(odf, 6))
    // adversarial ties: equal counts across disjoint AND conflicting pairs
    val ties = Map("ab" -> 3L, "cd" -> 3L, "ce" -> 3L, "xy" -> 2L)
    val tdf = ties.toSeq.toDF("word", "freq")
    val (tg, _) = Bpe.trainMergesBatch(tdf, 8, batchSize = 4)
    assert(tg === Bpe.trainMerges(tdf, 8))
  }

  test("bpe: batching compresses rounds on the real corpus") {
    val words = Bpe.wordFreq(
      graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents"))
      .localCheckpoint()
    val (batch, rounds) = Bpe.trainMergesBatch(words, 12, batchSize = 4)
    assert(batch === Bpe.trainMerges(words, 12))
    assert(rounds < 12, s"batching bought nothing: $rounds rounds for 12 merges")
  }

  test("bpe: early exhaustion stops cleanly (single-char words have no pairs after one merge)") {
    // 'a' seeds as [a, </w>]: one pair, then nothing
    val got = Bpe.trainMerges(Map("a" -> 3L).toSeq.toDF("word", "freq"), 4)
    assert(got === Seq(Bpe.Merge(1, "a", "</w>", "a</w>", 3L)))
  }

  test("bpe: encode applies merges rank-ordered and matches the reference walk") {
    val words = Map("abab" -> 5L, "all" -> 4L, "ball" -> 3L, "ab" -> 2L)
    val wordsDf = words.toSeq.toDF("word", "freq")
    val merges = Bpe.trainMerges(wordsDf, 4)
    // reference: greedy leftmost application of each merge in rank order
    def refEncode(w: String): Vector[String] =
      merges.foldLeft(w.map(_.toString).toVector :+ "</w>") { (v, m) =>
        val nb = Vector.newBuilder[String]
        var i = 0
        while (i < v.length) {
          if (i + 1 < v.length && v(i) == m.left && v(i + 1) == m.right) {
            nb += m.merged; i += 2
          } else { nb += v(i); i += 1 }
        }
        nb.result()
      }
    val got = Bpe.encode(wordsDf, merges)
      .select($"word", $"tokens").as[(String, Seq[String])].collect().toMap
    words.keys.foreach { w => assert(got(w) === refEncode(w), s"word $w") }
  }

  test("bpe: wordFreq lowercases and drops empties") {
    val docs = Seq("The the  THE", "cat").toDF("text")
    val got = Bpe.wordFreq(docs).as[(String, Long)].collect().toMap
    assert(got === Map("the" -> 3L, "cat" -> 1L))
  }
}
