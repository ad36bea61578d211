package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM (SentencePiece-style) tokenizer trainer — the
  * EM complement to [[Bpe]]: where BPE grows a vocabulary bottom-up by
  * merging, the unigram trainer starts from a LARGE seed of candidate
  * substrings and PRUNES, re-estimating piece probabilities by
  * expectation-maximization (Kudo, "Subword Regularization", ACL 2018).
  * This implementation is the hard-EM (Viterbi) variant: the E-step
  * counts pieces along each word's single best segmentation — the
  * deterministic choice that makes the whole trainer oracle-mirrorable.
  *
  * Scale shape — the [[Kmeans]] bounded-driver-state discipline:
  *   - driver state is ONLY the vocab table (piece, count, nano log-prob),
  *     ≤ |alphabet| + seedMulti rows;
  *   - each E-step is ONE distributed scan of the (word, freq) table: the
  *     vocab rides into the scan as a LITERAL map (nothing corpus-sized
  *     is broadcast, let alone shuffled), the per-word Viterbi DP is a
  *     scan-side higher-order expression, and piece counts come back
  *     through one partial-aggregating explode/sum keyed on ≤ |V| pieces;
  *   - seeding/pruning collects are vocab-bounded TakeOrdereds.
  *
  * Portability discipline: the DP works entirely on NANO log-probs
  * (longs) — path sums, the argmax, and the backward reconstruction's
  * equality test are exact integer arithmetic, so Spark and the DuckDB
  * list_reduce-fold mirror pick bit-identical segmentations. The ONLY float
  * op per EM round is the single `floor(1e9 · ln((c+1)/Σ(c+1)))` per
  * piece (the [[Search]] idf / [[Dsir]] λ nano-ln convention). Add-1
  * smoothing keeps every surviving piece's log-prob finite even at
  * Viterbi count 0.
  *
  * Tie-breaks are pinned where the published algorithm leaves them open
  * (a deterministic oracle cannot): seed/prune selection orders by
  * (count desc, piece asc); path reconstruction takes the SHORTEST last
  * piece among score-equal predecessors. Single characters are never
  * pruned (the SentencePiece coverage rule — it keeps the DP total: every
  * position is always reachable, so the OOV sentinel never wins during
  * training).
  */
object Unigram {

  /** Max piece length. 4 keeps the candidate explosion (|word|·maxLen
    * substrings per word) and the DP fan-in small; SentencePiece's own
    * default caps at 16. */
  val MaxLen = 4

  /** OOV sentinel log-prob (−2⁴⁰ nano-units) — the char-fallback score.
    * Applied to LENGTH-1 lookups only: a missing multi-char piece is not
    * a candidate at all (null, dropped from the DP fan-in), else one
    * sentinel-priced unknown 4-gram would absorb its known neighbours
    * ("axb" tokenizing as one piece instead of a/x/b). With the fallback
    * confined to single chars, every position stays reachable (the
    * SentencePiece character-coverage rule) and an unseen character
    * surfaces as exactly one sentinel-scored single-char token. Sits far
    * below any real lp (≈ −1e11 at worst) so it never displaces a real
    * piece during training. */
  val Neg: Long = -1099511627776L

  /** One vocab entry: `cnt` is the count backing the CURRENT log-prob
    * (substring count at seed, Viterbi count after an EM round). */
  case class Piece(piece: String, cnt: Long, lpNano: Long)

  /** Piece log-prob: char-fallback for l = 1, null (not a candidate) for
    * missing multi-char pieces — see [[Neg]]. */
  private def lpLookup(lpMap: Column, piece: Column, l: Int): Column =
    if (l == 1) coalesce(element_at(lpMap, piece), lit(Neg))
    else element_at(lpMap, piece)

  /** Forward DP: 1-based array `b` with b(j) = best nano score of the
    * length-(j−1) prefix; b(len+1) is the word's best full score. */
  private[llm] def bestScores(w: Column, lpMap: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      array(lit(0L)),
      (acc, i) => concat(acc, array(
        greatest((1 to MaxLen).map { l =>
          when(i >= l, element_at(acc, i - l + 1) +
            lpLookup(lpMap, w.substr(i - l + 1, lit(l)), l))
        }: _*))))

  /** Predecessor array off a materialized best-score column: pred(j) =
    * j − (SHORTEST piece length whose predecessor score + piece log-prob
    * exactly equals b(j+1) — all longs, exact, and the forward max
    * guarantees a witness, so pred is total). */
  private def predArray(w: Column, best: Column, lpMap: Column): Column =
    transform(sequence(lit(1), length(w)), j =>
      j - (1 to MaxLen).foldRight(lit(null).cast("int")) { (l, rest) =>
        when(j >= l &&
          element_at(best, j + 1) ===
            element_at(best, j - l + 1) +
              lpLookup(lpMap, w.substr(j - l + 1, lit(l)), l),
          lit(l)).otherwise(rest)
      })

  /** Pointer chase from `length(w)` through pred to 0: always-append fold
    * (appends 0 once the walk reaches the origin), at most `length(w)`
    * real steps since pieces are ≥ 1 char. */
  private def pathChase(w: Column, pred: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      array(length(w).cast("int")),
      (acc, _) => {
        val last = element_at(acc, size(acc))
        concat(acc, array(
          when(last <= 0, lit(0)).otherwise(element_at(pred, last))))
      })

  /** Pieces from consecutive path pairs, restored to word order. */
  private def piecesFromPath(w: Column, path: Column): Column =
    reverse(filter(
      transform(sequence(lit(1), size(path) - 1), k =>
        when(element_at(path, k) > 0,
          w.substr(element_at(path, k + 1) + 1,
            element_at(path, k) - element_at(path, k + 1)))),
      x => x.isNotNull))

  /** REFERENCE Viterbi segmentation as a staged higher-order-expression
    * chain — four SEPARATE projections (best / pred / path / pieces; pred
    * references best 2·MaxLen times and the chase references pred per
    * step, so CollapseProject must keep each expensive column in its own
    * stage or it re-evaluates per use). The same four stages run as CTEs
    * in the DuckDB mirror, which is why this form is kept: it IS the
    * oracle shape, and UnigramSpec pins the codegen'd kernel bit-equal to
    * it. The hot paths ([[train]]'s E-step, [[encode]]) run
    * [[withViterbi]] instead — HOFs never enter whole-stage codegen, a
    * ~10× interpreted-evaluation tax on the step that touches every byte
    * of a release corpus. Words must be non-empty ([[Bpe.wordFreq]]
    * guarantees it): `sequence(1, 0)` would DESCEND and fabricate
    * positions. */
  private[llm] def withViterbiHof(df: DataFrame, w: Column, lpMap: Column,
      out: String): DataFrame =
    df.withColumn("__uni_best", bestScores(w, lpMap))
      .withColumn("__uni_pred", predArray(w, col("__uni_best"), lpMap))
      .withColumn("__uni_path", pathChase(w, col("__uni_pred")))
      .withColumn(out, piecesFromPath(w, col("__uni_path")))
      .drop("__uni_best", "__uni_pred", "__uni_path")

  /** Viterbi-segment `w` under the vocab into `out` — the codegen'd
    * one-pass kernel ([[graft.expr.UnigramEncode]]; whole-stage-codegen
    * friendly, exact Long arithmetic, bit-equal to [[withViterbiHof]] by
    * UnigramSpec's parity pin). */
  private[llm] def withViterbi(df: DataFrame, w: Column,
      vocab: Seq[Piece], out: String): DataFrame =
    df.withColumn(out, graft.expr.UnigramEncode(w,
      vocab.map(p => p.piece -> p.lpNano).toMap, MaxLen, Neg))

  private def lpMapLiteral(vocab: Seq[Piece]): Column =
    map_from_arrays(
      array(vocab.map(p => lit(p.piece)): _*),
      array(vocab.map(p => lit(p.lpNano)): _*))

  /** The one float op: nano-floored ln of the smoothed count share. The
    * identical expression shape runs in the DuckDB mirror. */
  private def nanoLp(cnt: Long, tot: Long): Long =
    math.floor(math.log((cnt + 1).toDouble / tot.toDouble) * 1e9).toLong

  /** All substrings of length 1..MaxLen with freq-weighted occurrence
    * counts — the seed candidate table. */
  private[llm] def substringCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), i =>
          filter(
            transform(sequence(lit(1), lit(MaxLen)), l =>
              when(i + l - 1 <= length(col("word")),
                col("word").substr(i, l))),
            x => x.isNotNull)))).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("freq")).as("cnt"))

  /** Train over a (word, freq) table ([[Bpe.wordFreq]]'s output).
    * `seedMulti` multi-char candidates enter; after the first E-step the
    * vocab prunes to all single chars + the `keepMulti` highest-count
    * multis; `emRounds` Viterbi-EM rounds total. Returns the final vocab
    * with each piece's LAST-round Viterbi count and log-prob. */
  def train(words: DataFrame, seedMulti: Int, keepMulti: Int,
      emRounds: Int = 2): Seq[Piece] = {
    require(seedMulti >= keepMulti && keepMulti > 0,
      s"need seedMulti >= keepMulti > 0: $seedMulti, $keepMulti")
    require(emRounds >= 1, s"emRounds must be >= 1: $emRounds")
    val wf = words.select(col("word"), col("freq"))
      .localCheckpoint(eager = false)
    val sub = substringCounts(wf).localCheckpoint(eager = false)
    // bounded collects: the whole alphabet + the top multi-char slice
    val chars = sub.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multis = sub.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(seedMulti)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    def normalized(counts: Seq[(String, Long)]): Seq[Piece] = {
      // smoothing total over the CURRENT vocab: Σ(c+1)
      val tot = counts.map(_._2 + 1).sum
      counts.map { case (p, c) => Piece(p, c, nanoLp(c, tot)) }
        .sortBy(_.piece)
    }
    var vocab = normalized((chars ++ multis).toSeq)
    for (round <- 1 to emRounds) {
      // E: Viterbi counts under the current log-probs — one scan, vocab
      // riding along as a codegen reference object, piece-keyed partial
      // agg, |V|-bounded collect
      val counts = withViterbi(wf, col("word"), vocab, "toks")
        .select(col("freq"), explode(col("toks")).as("piece"))
        .groupBy(col("piece"))
        .agg(sum(col("freq")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // prune once, after the first round's counts (chars never leave)
      val kept =
        if (round == 1) {
          val keptMultis = vocab.filter(_.piece.length >= 2)
            .map(p => p.piece -> counts.getOrElse(p.piece, 0L))
            .sortBy { case (p, c) => (-c, p) }
            .take(keepMulti)
          vocab.filter(_.piece.length == 1)
            .map(p => p.piece -> counts.getOrElse(p.piece, 0L)) ++ keptMultis
        } else vocab.map(p => p.piece -> counts.getOrElse(p.piece, 0L))
      // M: re-normalize with add-1 smoothing over the surviving vocab
      vocab = normalized(kept)
    }
    vocab
  }

  /** Vocab → DataFrame for catalog/oracle publication. */
  def vocabDf(spark: SparkSession, vocab: Seq[Piece]): DataFrame = {
    import spark.implicits._
    vocab.toDF("piece", "cnt", "lp_nano")
  }

  /** Inference: Viterbi-segment each word under a trained vocab — a pure
    * scan-side projection (one codegen'd kernel call per row): no
    * shuffle, no driver work, encode a 100 TB word table flat-out. */
  def encode(words: DataFrame, vocab: Seq[Piece],
      wordCol: String = "word"): DataFrame =
    withViterbi(words, col(wordCol), vocab, "tokens")

  /** [[encode]] through the reference HOF chain — the oracle shape, kept
    * (and exposed to the specs) so UnigramSpec can pin kernel ≡ HOF
    * bit-equality, the [[graft.expr.RepetitionGrams]] discipline. */
  private[graft] def encodeHof(words: DataFrame, vocab: Seq[Piece],
      wordCol: String = "word"): DataFrame =
    withViterbiHof(words, col(wordCol), lpMapLiteral(vocab), "tokens")

  /** Subword REGULARIZATION: sample a segmentation per word with
    * P(x) ∝ (∏ p(piece))^α instead of taking the argmax — Kudo's
    * (ACL 2018) training-time augmentation, the soft-EM complement the
    * Viterbi [[encode]] approximates as α → ∞ (UnigramSpec pins that
    * recovery on a tie-free vocab). Draws are md5-pure functions of
    * (salt, word, position) — [[graft.expr.UnigramSample]] — so the
    * "random" sample is deterministic, partitioning-independent, and
    * oracle-mirrorable; vary `salt` per epoch to get fresh segmentations
    * (the q_sample_rows key-purity convention). Same scale shape as
    * [[encode]]: one codegen'd kernel call per row, no shuffle, no
    * driver state. */
  def sample(words: DataFrame, vocab: Seq[Piece], alpha: Double = 1.0,
      salt: String = "s0", wordCol: String = "word"): DataFrame =
    words.withColumn("tokens", graft.expr.UnigramSample(col(wordCol),
      vocab.map(p => p.piece -> p.lpNano).toMap, MaxLen, Neg, alpha, salt))
}
