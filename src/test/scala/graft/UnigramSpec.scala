package graft

import graft.llm.Unigram
import graft.llm.Unigram.Piece

/** Unigram-LM trainer vs a sequential reference implementation (Viterbi
  * hard-EM over an in-memory word-frequency map with the same pinned
  * tie-breaks), plus the coverage/tie-break/OOV contracts the published
  * algorithm leaves open. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private val Neg = Unigram.Neg

  /** Reference trainer: the same algorithm, no Spark — plain loops. */
  private def refTrain(words: Map[String, Long], seedMulti: Int,
      keepMulti: Int, emRounds: Int): Seq[Piece] = {
    def nanoLp(c: Long, tot: Long): Long =
      math.floor(math.log((c + 1).toDouble / tot.toDouble) * 1e9).toLong
    // seed: all substrings of length 1..MaxLen, freq-weighted
    val sub = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      for (i <- 0 until w.length; l <- 1 to Unigram.MaxLen
           if i + l <= w.length)
        sub(w.substring(i, i + l)) = sub.getOrElse(w.substring(i, i + l), 0L) + f
    }
    val chars = sub.filter(_._1.length == 1).toSeq
    val multis = sub.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedMulti)
    def normalized(counts: Seq[(String, Long)]): Seq[Piece] = {
      val tot = counts.map(_._2 + 1).sum
      counts.map { case (p, c) => Piece(p, c, nanoLp(c, tot)) }.sortBy(_.piece)
    }
    def viterbi(w: String, lp: Map[String, Long]): Seq[String] = {
      val n = w.length
      val b = new Array[Long](n + 1)
      for (i <- 1 to n)
        b(i) = (1 to math.min(Unigram.MaxLen, i)).map { l =>
          b(i - l) + lp.getOrElse(w.substring(i - l, i), Neg)
        }.max
      var pos = n
      val out = List.newBuilder[String]
      val rev = scala.collection.mutable.ListBuffer.empty[String]
      while (pos > 0) {
        val sel = (1 to math.min(Unigram.MaxLen, pos)).find { l =>
          b(pos) == b(pos - l) + lp.getOrElse(w.substring(pos - l, pos), Neg)
        }.get // shortest last piece among score-equal predecessors
        rev += w.substring(pos - sel, pos)
        pos -= sel
      }
      rev.toSeq.reverse
    }
    var vocab = normalized(chars ++ multis)
    for (round <- 1 to emRounds) {
      val lp = vocab.map(p => p.piece -> p.lpNano).toMap
      val counts = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, f) =>
        viterbi(w, lp).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val kept =
        if (round == 1) {
          val keptMultis = vocab.filter(_.piece.length >= 2)
            .map(p => p.piece -> counts.getOrElse(p.piece, 0L))
            .sortBy { case (p, c) => (-c, p) }.take(keepMulti)
          vocab.filter(_.piece.length == 1)
            .map(p => p.piece -> counts.getOrElse(p.piece, 0L)) ++ keptMultis
        } else vocab.map(p => p.piece -> counts.getOrElse(p.piece, 0L))
      vocab = normalized(kept)
    }
    vocab
  }

  // shared substructure + repeats so the seed, prune, and EM rounds all
  // have real work; equal-freq words create the lp ties the tie-break pins
  private val corpus = Map(
    "lower" -> 5L, "lowest" -> 4L, "newer" -> 6L, "newest" -> 3L,
    "wider" -> 5L, "widest" -> 5L, "low" -> 7L, "new" -> 7L,
    "abab" -> 4L, "ab" -> 4L)

  test("unigram: train matches the sequential reference (2 EM rounds)") {
    val got = Unigram.train(corpus.toSeq.toDF("word", "freq"),
      seedMulti = 12, keepMulti = 6, emRounds = 2)
    val want = refTrain(corpus, 12, 6, 2)
    assert(got === want)
  }

  test("unigram: 3 EM rounds also match (post-prune rounds re-count everything)") {
    val got = Unigram.train(corpus.toSeq.toDF("word", "freq"),
      seedMulti = 10, keepMulti = 4, emRounds = 3)
    assert(got === refTrain(corpus, 10, 4, 3))
  }

  test("unigram: single characters are never pruned (coverage rule)") {
    val vocab = Unigram.train(corpus.toSeq.toDF("word", "freq"),
      seedMulti = 12, keepMulti = 2, emRounds = 2)
    val chars = corpus.keys.flatMap(_.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(vocab.map(_.piece).toSet))
    assert(vocab.count(_.piece.length >= 2) === 2)
  }

  test("unigram: encode concatenation identity + determinism") {
    val words = corpus.toSeq.toDF("word", "freq")
    val vocab = Unigram.train(words, seedMulti = 12, keepMulti = 6)
    val enc = Unigram.encode(words, vocab)
      .select($"word", $"tokens").as[(String, Seq[String])].collect()
    enc.foreach { case (w, toks) =>
      assert(toks.mkString("") === w, s"tokens must tile the word: $w")
      assert(toks.forall(_.nonEmpty))
    }
  }

  test("unigram: score-equal segmentations take the SHORTEST last piece") {
    // lp(ab) = lp(a)+lp(b): 'ab'-as-one-piece ties 'a'+'b'; the backward
    // walk must pick l=1 at the final stop -> ["a","b"], never ["ab"]
    val vocab = Seq(Piece("a", 0, -100L), Piece("ab", 0, -200L),
      Piece("b", 0, -100L))
    val enc = Unigram.encode(Seq(("ab", 1L)).toDF("word", "freq"), vocab)
      .select($"tokens").as[Seq[String]].head()
    assert(enc === Seq("a", "b"))
  }

  test("unigram: codegen'd kernel ≡ staged-HOF reference, bit-equal (ties, OOV, multi-byte)") {
    // the RepetitionGrams discipline: the hot path moved to a codegen'd
    // kernel (expr.UnigramEncode), the HOF chain stays as the oracle
    // shape — this pin is what licenses the swap. The alphabet includes a
    // 2-byte codepoint and a surrogate PAIR so the kernel's codepoint
    // indexing (Spark substr semantics, not Java chars) is exercised;
    // lp values sit on a coarse grid so lp(xy) == lp(x)+lp(y) ties are
    // common and the shortest-last-piece tie-break actually fires.
    val rnd = new scala.util.Random(14L)
    val cps = Array("a", "b", "c", "é", "𝄞") // 𝄞 U+1D11E
    val wordStrs = (1 to 60).map { _ =>
      (1 to (1 + rnd.nextInt(10)))
        .map(_ => cps(rnd.nextInt(cps.length))).mkString
    } :+ "x𝄞x" // OOV char surrounded by a known astral one
    val words = wordStrs.zipWithIndex
      .map { case (w, i) => (w, i.toLong + 1L) }.toDF("word", "freq")
    val unit = -100000000L
    val singles = cps.map(c => Piece(c, 1, unit)).toSeq
    val multis = (1 to 40).map { _ =>
      val l = 2 + rnd.nextInt(3)
      (1 to l).map(_ => cps(rnd.nextInt(cps.length))).mkString
    }.distinct.map { p =>
      // grid multiples: sometimes exactly |p|·unit (a tie with the
      // all-singles path), sometimes cheaper (the multi wins)
      val cpLen = p.codePointCount(0, p.length)
      Piece(p, 1, unit * (cpLen - rnd.nextInt(2)))
    }
    val vocab = (singles ++ multis)
      .groupBy(_.piece).map(_._2.head).toSeq.sortBy(_.piece)
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select($"word", $"tokens").as[(String, Seq[String])]
      .collect().sortBy(_._1).toSeq
    val got = run(Unigram.encode(words, vocab))
    val want = run(Unigram.encodeHof(words, vocab))
    assert(got === want)
    got.foreach { case (w, toks) => assert(toks.mkString("") === w) }
  }

  test("unigram sample: alpha -> infinity recovers the Viterbi segmentation (tie-free vocab)") {
    // gaps of >= 0.2 nano-log units between competing paths: at alpha=60
    // the runner-up's probability mass is e^(-60*0.2) ~ 6e-6 — no
    // 52-bit draw lands there, so every sampled path IS the argmax
    val words = corpus.toSeq.toDF("word", "freq")
    val vocab = Unigram.train(words, seedMulti = 12, keepMulti = 6)
      // perturb lps by piece-dependent offsets so no two paths tie
      .zipWithIndex.map { case (p, i) =>
        Piece(p.piece, p.cnt, p.lpNano - (i + 1) * 1000000L) }
    val viterbi = Unigram.encode(words, vocab)
      .select($"word", $"tokens").as[(String, Seq[String])]
      .collect().sortBy(_._1).toSeq
    val sampled = Unigram.sample(words, vocab, alpha = 60.0, salt = "sA")
      .select($"word", $"tokens").as[(String, Seq[String])]
      .collect().sortBy(_._1).toSeq
    assert(sampled === viterbi)
  }

  test("unigram sample: concatenation identity, OOV traversal, and salt-driven variation at alpha=1") {
    val words = corpus.keys.toSeq.sorted.map((_, 1L)).toDF("word", "freq")
    val vocab = Unigram.train(corpus.toSeq.toDF("word", "freq"),
      seedMulti = 12, keepMulti = 6)
    def run(salt: String) = Unigram.sample(words, vocab, 1.0, salt)
      .select($"word", $"tokens").as[(String, Seq[String])]
      .collect().sortBy(_._1).toSeq
    val a = run("s1")
    a.foreach { case (w, toks) =>
      assert(toks.mkString("") === w, s"tokens must tile the word: $w")
      assert(toks.forall(_.nonEmpty))
    }
    // determinism: the draw is a pure function of (salt, word, position)
    assert(run("s1") === a)
    // regularization actually regularizes: with a deliberately TIED
    // lattice (lp(ab) = lp(a) + lp(b), each path mass 50%) different
    // salts must produce different segmentations — the trained vocab
    // above is too peaked to show variation in a handful of draws
    // (runner-up mass ~e^-9 per junction), which is itself the expected
    // behavior, not a bug
    val tied = Seq(Piece("a", 0, -100000000L), Piece("b", 0, -100000000L),
      Piece("ab", 0, -200000000L))
    val tiedWords = Seq(("ababab", 1L), ("abab", 1L)).toDF("word", "freq")
    def runTied(salt: String) = Unigram.sample(tiedWords, tied, 1.0, salt)
      .select($"word", $"tokens").as[(String, Seq[String])]
      .collect().sortBy(_._1).toSeq
    val t1 = runTied("s1")
    t1.foreach { case (w, toks) => assert(toks.mkString("") === w) }
    val variants = (2 to 9).map(i => runTied(s"s$i"))
    assert(variants.exists(_ !== t1),
      "8 salts produced identical segmentations of a 50/50 lattice — " +
        "sampling inert?")
    // OOV char still surfaces as its own single-char piece
    val oov = Unigram.sample(Seq(("axb", 1L)).toDF("word", "freq"),
        Seq(Piece("a", 0, -100L), Piece("b", 0, -100L)), 1.0, "s1")
      .select($"tokens").as[Seq[String]].head()
    assert(oov === Seq("a", "x", "b"))
  }

  test("unigram: OOV character surfaces as a sentinel-scored single-char piece") {
    val vocab = Seq(Piece("a", 0, -100L), Piece("b", 0, -100L))
    val enc = Unigram.encode(Seq(("axb", 1L)).toDF("word", "freq"), vocab)
      .select($"tokens").as[Seq[String]].head()
    assert(enc === Seq("a", "x", "b"))
  }
}
