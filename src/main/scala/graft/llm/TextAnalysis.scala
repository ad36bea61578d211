package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.TextProfile

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language identification (stopword heuristic), and
  * document fingerprinting. All scalar counters come from ONE pass of the
  * codegen'd [[graft.expr.TextProfile]] kernel (HOF/regex pipelines never
  * enter whole-stage codegen — see the kernel's scaladoc for the measured
  * cost); the arithmetic on top stays in Column space, where Catalyst's
  * subexpression elimination dedups the shared kernel call within a
  * projection. Narrow, embarrassingly parallel at any scale. */
object TextAnalysis {

  import TextProfile.{IBpeish, ICjk, IDe, IDigit, IEn, IEs, IFr, INWords, IPunct, ITrimLen}

  /** Tiny high-frequency function-word sets per language (canonical copies
    * live next to the kernel that matches them — [[TextProfile]]). */
  val StopwordsEn: Seq[String] = TextProfile.StopwordsEn
  val StopwordsFr: Seq[String] = TextProfile.StopwordsFr
  val StopwordsEs: Seq[String] = TextProfile.StopwordsEs
  val StopwordsDe: Seq[String] = TextProfile.StopwordsDe

  /** The 10-int profile array (see [[TextProfile]] index map). */
  def profile(text: Column): Column = TextProfile(text)

  /** Whitespace token count (0 for blank/empty text). */
  def tokenCount(text: Column): Column = {
    val p = profile(text)
    when(p.getItem(ITrimLen) === 0, lit(0)).otherwise(p.getItem(INWords))
  }

  /** BPE-ish subword proxy: letter runs, digit runs, or single
    * non-alphanumeric glyphs — the standard pre-tokenizer regex shape. */
  def bpeishTokenCount(text: Column): Column = profile(text).getItem(IBpeish)

  def punctCount(text: Column): Column = profile(text).getItem(IPunct)

  def digitRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      profile(text).getItem(IDigit).cast("double") / length(text).cast("double"))

  private def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Fraction of tokens that are in the given stopword set. The default
    * (English) set rides the kernel; a custom set falls back to the
    * composable HOF form. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = StopwordsEn): Column =
    if (stopwords == StopwordsEn) {
      val p = profile(text)
      // split() never yields an empty array (empty text → one empty token),
      // so the guard is vestigial but kept for shape parity with the
      // composable form and its oracle.
      when(p.getItem(INWords) === 0, 0.0).otherwise(
        p.getItem(IEn).cast("double") / p.getItem(INWords).cast("double"))
    } else {
      val w = words(text)
      when(size(w) === 0, 0.0).otherwise(
        size(filter(w, t => t.isin(stopwords: _*))).cast("double") /
          size(w).cast("double"))
    }

  /** Heuristic language ID: CJK codepoint share decides zh; otherwise the
    * argmax of per-language stopword hit counts, 'und' when all zero.
    * Deterministic tie-break by fixed language order. */
  def langId(text: Column): Column = {
    val p = profile(text)
    val cjk = p.getItem(ICjk)
    val scores = Seq(
      "en" -> p.getItem(IEn), "fr" -> p.getItem(IFr),
      "es" -> p.getItem(IEs), "de" -> p.getItem(IDe))
    val best = scores.tail.foldLeft(struct(scores.head._2.as("s"), lit(scores.head._1).as("l"))) {
      case (acc, (lang, s)) =>
        when(s > acc.getField("s"), struct(s.as("s"), lit(lang).as("l"))).otherwise(acc)
    }
    when(cjk > 0 && cjk * 5 > length(text), lit("zh"))
      .when(best.getField("s") > 0, best.getField("l"))
      .otherwise(lit("und"))
  }

  /** Composite quality score in [0,1]: length sweet-spot, moderate
    * punctuation, low digit share, healthy stopword presence. Weights are
    * heuristic; the operator contract is determinism + monotonicity in each
    * component. Raw IEEE-double arithmetic, deliberately NOT rounded:
    * identical int-derived expressions are bit-exact across engines, while
    * `round()` semantics differ (Spark HALF_UP on BigDecimal vs native
    * double rounding elsewhere). */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val lenScore = least(len / 200.0, lit(1.0)) * when(len > 2000, 0.5).otherwise(1.0)
    val punctRatio = punctCount(text).cast("double") / greatest(len, lit(1.0))
    val punctScore = when(punctRatio > 0.2, 0.3).otherwise(lit(1.0) - punctRatio)
    val digitScore = lit(1.0) - least(digitRatio(text) * 2.0, lit(1.0))
    val swScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    lenScore * 0.3 + punctScore * 0.3 + digitScore * 0.2 + swScore * 0.2
  }

  /** Winnowing-style document fingerprint: md5 of each word 5-gram, keep
    * the k lexicographically-smallest distinct digests (a k-min sketch —
    * stable under permutation, linear-time, fixed output size). md5 rather
    * than xxhash64 so the fingerprint is portable: any engine (DuckDB,
    * Trino, Python) reproduces it for cross-system dedup audits. */
  def fingerprint(text: Column, w: Int = 5, k: Int = 8): Column =
    slice(array_sort(array_distinct(
      transform(Dedup.shingles(text, w), s => md5(s)))), 1, k)

  /** Corpus vocabulary: top-k terms by total frequency, with document
    * frequency alongside. Deterministic tie-break on the term itself.
    * Scale: explode → hash-aggregate on the term (uniform after
    * lowercasing; a handful of stopword heavy-hitters are absorbed by
    * map-side partial agg), then TakeOrdered for the top-k — no global
    * sort materializes. */
  def vocabTopK(docs: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf_total"), count_distinct(col("doc_id")).as("df"))
      .orderBy(col("tf_total").desc, col("term"))
      .limit(k)

  /** Heavy-hitter tokens via the mergeable [[graft.expr.SpaceSavingTopK]]
    * SpaceSaving aggregate: the bounded-memory alternative to [[vocabTopK]]
    * for web-scale vocabularies — the exact path shuffles one row per
    * DISTINCT term (billions at 100 TB); this one moves `capacity` counters
    * per map-side partial, nothing proportional to the vocabulary. Same
    * token semantics as [[vocabTopK]]. With capacity ≥ |vocab| counts are
    * exact and err = 0 (oracle regime); undersized capacity degrades to the
    * classic overestimate-with-bound guarantee (spec regime). */
  def heavyHitters(docs: DataFrame, capacity: Int, k: Int,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val tok = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val hh = GraftBridge.column(
      graft.expr.SpaceSavingTopK(
        GraftBridge.expression(col("term")), capacity).toAggregateExpression())
    tok.agg(hh.as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("term"), col("e.cnt").as("cnt"),
        col("e.err").as("err"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(k)
  }

  /** Per-group heavy hitters: one SpaceSaving summary per `groupCol` value
    * (mixture sources, languages, shards), top-k within each group — the
    * per-stratum vocabulary profile mixture tuning reads next to
    * [[graft.llm.Dsir]]'s per-source KL. Same sketch-only shuffle
    * discipline as [[heavyHitters]]: each map-side partial carries
    * `capacity` counters PER GROUP SEEN IN THAT TASK (bounded by
    * capacity × |groups|, never by vocabulary), merged per group key; the
    * per-group top-k is a rank window over |groups| × capacity rows.
    * Exactness regime as [[heavyHitters]]: capacity ≥ per-group |vocab| ⇒
    * exact counts, err = 0. */
  def heavyHittersByGroup(docs: DataFrame, groupCol: String, capacity: Int,
      k: Int, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val tok = docs
      .select(col(groupCol).as("grp"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val hh = GraftBridge.column(
      graft.expr.SpaceSavingTopK(
        GraftBridge.expression(col("term")), capacity).toAggregateExpression())
    tok.groupBy(col("grp")).agg(hh.as("hh"))
      .select(col("grp"), explode(col("hh")).as("e"))
      .select(col("grp").as(groupCol), col("e.item").as("term"),
        col("e.cnt").as("cnt"), col("e.err").as("err"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
          .orderBy(col("cnt").desc, col("term"))))
      .filter(col("rank") <= k)
  }

  /** Documents → vocab-id sequences: the tokenize step between curation and
    * [[Packing]] (packed shards carry int sequences, not text). Tokens map
    * through a broadcast (term → term_id) table — vocabularies are KBs–MBs
    * against TBs of text; OOV tokens become `oovId`. Token ORDER is
    * preserved: posexplode carries the position through the join and a
    * per-document sort_array restores it — the only shuffle is the doc_id
    * groupBy (uniform key), the sort is in-memory per document.
    * Emits (doc_id, n_tokens, ids). */
  def tokenizeToIds(docs: DataFrame, vocab: DataFrame, oovId: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol),
        posexplode(split(lower(trim(col(textCol))), "\\s+")).as(Seq("pos", "term")))
      .join(broadcast(vocab.select(col("term"), col("term_id"))), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"),
        coalesce(col("term_id"), lit(oovId)).as("tid")))).as("pt"))
      .select(col(idCol), size(col("pt")).as("n_tokens"),
        transform(col("pt"), x => x.getField("tid")).as("ids"))

  /** Deterministic dense ids for a [[vocabTopK]] vocabulary: 1-based rank
    * by (tf_total desc, term) — id 0 stays free for OOV. The global window
    * runs on the k-row vocab, never on corpus data. */
  def vocabWithIds(vocab: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    vocab.select(col("term"),
      row_number().over(Window.orderBy(col("tf_total").desc, col("term")))
        .as("term_id"))
  }

  /** Per-document TF and smoothed TF-IDF restricted to a vocabulary (pass
    * [[vocabTopK]]'s output). idf = ln((N+1)/(df+1)) + 1 — the standard
    * smooth variant; `nDocs` is passed explicitly so the caller controls
    * the corpus-size snapshot (no hidden action here). The vocab join is
    * broadcast: TF rows never shuffle. */
  def tfidf(docs: DataFrame, vocab: DataFrame, nDocs: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    tf.join(broadcast(vocab.select(col("term"), col("df"))), Seq("term"))
      .withColumn("tfidf",
        col("tf").cast("double") *
          (log(lit(nDocs + 1.0) / (col("df") + lit(1.0))) + lit(1.0)))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** CCNet-style bigram language-model quality score: the corpus trains a
    * bigram LM (add-one smoothing), every document is scored by its mean
    * bigram log-probability — boilerplate and gibberish sit far from the
    * corpus distribution and score low.
    *
    *   P(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁) + V),   score = mean ln P
    *
    * `nVocab` (V = distinct unigrams) is passed explicitly like
    * [[tfidf]]'s nDocs — the caller controls the corpus-size snapshot.
    * Only documents with ≥ 2 tokens have bigrams; others are dropped.
    *
    * Scale shape: count tables are hash aggregations on uniform gram keys;
    * scoring joins per-doc bigram occurrences against them (shuffle
    * equi-joins — at real scale the bigram table is far over broadcast
    * size). The per-doc mean folds ln terms in SORTED gram order
    * (sort_array + aggregate), so the double summation is deterministic
    * under any partitioning — same fold-order pinning as the kNN dot
    * products. */
  def bigramLmScore(docs: DataFrame, nVocab: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    lmScoreCore(docs, unigramCounts(docs, textCol), nVocab, idCol, textCol)

  /** [[bigramLmScore]] with V derived from its OWN unigram count table
    * instead of a caller-side distinct-count corpus pass: the c(w₁) table
    * is vocab-bounded, so it eagerly checkpoints and its row count IS V
    * (identical token definition — same split, no empties filter). One
    * fewer full corpus read per scoring run, scores bit-identical to
    * `bigramLmScore(docs, V)` — the [[Search.bm25]] single-scan
    * discipline applied to the LM trainer. */
  def bigramLmScoreSelfV(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val c1 = unigramCounts(docs, textCol).localCheckpoint(eager = true)
    lmScoreCore(docs, c1, c1.count(), idCol, textCol)
  }

  /** The corpus unigram table c(w₁) — the LM denominator AND (row count)
    * the vocabulary size. */
  private def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))

  private def lmScoreCore(docs: DataFrame, c1: DataFrame, nVocab: Long,
      idCol: String, textCol: String): DataFrame = {
    val words = split(lower(trim(col(textCol))), "\\s+")
    val g2 = Repetition.ngrams(col(textCol), 2)
    val docBigrams = docs
      .filter(size(words) >= 2)
      .select(col(idCol).as("doc_id"), explode(g2).as("gram"))
    val c2 = docBigrams.groupBy(col("gram")).agg(count(lit(1)).as("c2"))
    val scoredGrams = docBigrams
      .join(c2, Seq("gram"))
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .join(c1, Seq("w1"))
      .select(col("doc_id"), col("gram"),
        log((col("c2") + lit(1.0)) / (col("c1") + lit(nVocab.toDouble)))
          .as("lnp"))
    scoredGrams
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sort_array(collect_list(struct(col("gram"), col("lnp")))).as("terms"))
      .select(col("doc_id"), col("n_bigrams"),
        (aggregate(col("terms"), lit(0.0), (acc, t) => acc + t.getField("lnp"))
          / col("n_bigrams").cast("double")).as("lm_score"))
  }

  /** Fixed-token-window document chunking with overlap — long documents
    * split into training/RAG-sized pieces: chunk i covers tokens
    * [i·stride, i·stride + chunk), stride = chunk − overlap, the last
    * chunk runs short rather than padding, and a doc of ≤ overlap tokens
    * still yields its one (whole) chunk. Zero-token docs yield zero rows.
    * Distinct from [[Packing.packByBudget]], which ASSIGNS whole docs to
    * budgeted shards; this SPLITS a doc's token sequence.
    *
    * Scale shape: pure scan-side explode (sequence + slice, all codegen'd
    * array ops) — no shuffle, no state; output rows ≈ input tokens /
    * stride. Tokens are whitespace words of the trimmed text (empties
    * dropped); original case/punctuation preserved in the chunk text. */
  def chunkByTokens(docs: DataFrame, chunk: Int, overlap: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunk > 0, s"chunk must be positive: $chunk")
    require(overlap >= 0 && overlap < chunk,
      s"overlap must be in [0, chunk): $overlap")
    val stride = chunk - overlap
    val words = filter(split(trim(col(textCol)), "\\s+"), w => w =!= lit(""))
    val nChunks = when(size(col("w")) <= 0, lit(0)).otherwise(
      greatest(ceil((size(col("w")) - lit(overlap)).cast("double") / stride)
        .cast("int"), lit(1)))
    docs
      .select(col(idCol), words.as("w"))
      .select(col(idCol), col("w"), nChunks.as("nc"))
      .filter(col("nc") > 0)
      .select(col(idCol),
        explode(sequence(lit(0), col("nc") - 1)).as("chunk_idx"), col("w"))
      .select(col(idCol), col("chunk_idx"),
        least(lit(chunk), size(col("w")) - col("chunk_idx") * stride)
          .as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("w"), col("chunk_idx") * stride + 1, lit(chunk)))
          .as("chunk_text"))
  }

  /** Per-document stats projection over a corpus. */
  /** Corpus length distribution in fixed-width character bins — the first
    * diagnostic a curation run produces before choosing length filters.
    * One scan + one tiny aggregation: only ~(maxLen/binWidth) bin rows
    * cross the shuffle, whatever the corpus size. Emits
    * (bin_start, bin_end, n_docs, n_chars), bins `[start, start+width)`. */
  def lengthHistogram(docs: DataFrame, binWidth: Int = 100,
      textCol: String = "text"): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    docs
      .select(length(col(textCol)).cast("long").as("len"))
      .groupBy((floor(col("len") / binWidth) * binWidth).as("bin_start"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("n_chars"))
      .select(col("bin_start"), (col("bin_start") + binWidth).as("bin_end"),
        col("n_docs"), col("n_chars"))
      .orderBy(col("bin_start"))
  }

  /** Per-source corpus profile: doc counts, char/token totals, and mean doc
    * length — the mixture table a training run balances its sampling
    * weights against. One scan over the kernel, partial-agg friendly,
    * output rows = number of sources. The mean is a single IEEE division
    * of exact integer sums, so it is engine-portable bit-for-bit. */
  def sourceProfile(docs: DataFrame, textCol: String = "text",
      sourceCol: String = "source"): DataFrame =
    docs
      .select(col(sourceCol), length(col(textCol)).cast("long").as("len"),
        tokenCount(col(textCol)).cast("long").as("toks"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("n_chars"),
        sum(col("toks")).as("n_tokens"))
      .withColumn("avg_chars",
        col("n_chars").cast("double") / col("n_docs").cast("double"))
      .orderBy(col(sourceCol))

  /** Gopher quality-filter rules (Rae et al. 2021, arXiv:2112.11446,
    * Appendix A) — the published heuristic battery every large text
    * curation pipeline runs before model-based filtering: word-count
    * bounds, mean-word-length bounds, symbol-to-word ratio (# and
    * ellipsis), bullet-line and ellipsis-line fractions, the
    * alphabetic-word fraction, and a minimum stopword-hit count.
    *
    * Publishes every rule's measured value plus the conjunction `kept`
    * (not just the verdict) so the filter is auditable — at 100 TB you
    * tune thresholds against the metric distributions, not by re-running
    * the scan per candidate threshold. All expressions are scan-side
    * codegen built-ins (one pass, no shuffle, no UDF); every published
    * ratio is ONE IEEE division of exact integer counts, so the output is
    * engine-portable bit-for-bit, and threshold comparisons on those
    * exact doubles are portable too. */
  def gopherRules(docs: DataFrame,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanWlen: Double = 3.0, maxMeanWlen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopHits: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val words = split(lower(trim(t)), "\\s+")
    // the library-wide token convention (one-pass kernel, blank -> 0) —
    // NOT an inline re-split, so rule counts can never drift from the
    // counts packing/sampling/search bill by
    val nWords = tokenCount(t).cast("long")
    val sumWlen = aggregate(words, lit(0L), (acc, x) => acc + length(x))
    val nHash = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    // '...' counts once per 3-char occurrence; '…' once per char
    val nEll = floor((length(t) - length(replace(t, lit("..."), lit(""))))
        .cast("double") / lit(3.0)).cast("long") +
      (length(t) - length(regexp_replace(t, "…", ""))).cast("long")
    val lines = split(t, "\n")
    val nLines = size(lines).cast("long") // split never yields [] — min 1
    val bulletLines = size(filter(lines, l =>
      startswith(ltrim(l), lit("-")) || startswith(ltrim(l), lit("*")) ||
        startswith(ltrim(l), lit("•")))).cast("long")
    val ellipsisLines = size(filter(lines, l =>
      endswith(rtrim(l), lit("...")) || endswith(rtrim(l), lit("…"))))
      .cast("long")
    val alphaWords = size(filter(words, x => x.rlike("[a-z]"))).cast("long")
    val stopArr = array(StopwordsGopher.map(lit): _*)
    val stopHits = size(filter(words, x => array_contains(stopArr, x))).cast("long")
    val guard = nWords > 0
    docs.select(
        col(idCol), nWords.as("n_words"),
        when(guard, sumWlen.cast("double") / nWords.cast("double"))
          .otherwise(lit(0.0)).as("mean_wlen"),
        when(guard, (nHash + nEll).cast("double") / nWords.cast("double"))
          .otherwise(lit(0.0)).as("symbol_ratio"),
        (bulletLines.cast("double") / nLines.cast("double")).as("bullet_frac"),
        (ellipsisLines.cast("double") / nLines.cast("double")).as("ellipsis_frac"),
        when(guard, alphaWords.cast("double") / nWords.cast("double"))
          .otherwise(lit(0.0)).as("alpha_frac"),
        when(guard, stopHits).otherwise(lit(0L)).as("stop_hits"))
      .withColumn("kept",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_wlen") >= minMeanWlen && col("mean_wlen") <= maxMeanWlen &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("bullet_frac") <= maxBulletFrac &&
          col("ellipsis_frac") <= maxEllipsisFrac &&
          col("alpha_frac") >= minAlphaFrac &&
          col("stop_hits") >= minStopHits)
  }

  /** The Gopher paper's stopword list (§A1.1): a doc must hit at least
    * two of these to pass the stop-word rule. */
  val StopwordsGopher: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def docStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars_computed"),
      tokenCount(col(textCol)).as("n_tokens"),
      bpeishTokenCount(col(textCol)).as("n_bpeish_tokens"),
      punctCount(col(textCol)).as("n_punct"),
      stopwordRatio(col(textCol)).as("stopword_ratio"),
      qualityScore(col(textCol)).as("quality"),
      langId(col(textCol)).as("lang_pred"),
      fingerprint(col(textCol)).as("fingerprint"))

  /** Per-language tokenizer fertility: chars per whitespace token — the
    * metric tokenizer teams track per language (a tokenizer that spends 3×
    * the tokens on one language starves it of effective context). One
    * partial-aggregated scan; the ratio is a single IEEE division of exact
    * longs. */
  def tokenizerFertility(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("lang"), col("n_chars"),
        tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(col("lang"), col("n_docs"), col("total_chars"),
        col("total_tokens"),
        (col("total_chars").cast("double") /
          col("total_tokens").cast("double")).as("chars_per_token"))

  /** Canonical text normalization — the pass every pipeline runs BEFORE
    * hashing/dedup so that formatting noise (control chars, whitespace
    * runs, case) doesn't split identical content into distinct digests:
    * lowercase → control chars to spaces → whitespace runs collapsed →
    * trimmed. Pure scan-side projection. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\p{Cntrl}]", " "), "\\s+", " "))

  /** Default topic lexicons for [[topicTags]], alphabetical by topic. */
  val DefaultTopics: Seq[(String, Seq[String])] = Seq(
    "commerce" -> Seq("customer", "order", "price", "supplier", "part", "region"),
    "perf" -> Seq("slow", "fast", "small", "large", "batch", "cache"),
    "query" -> Seq("join", "hash", "scan", "filter", "merge", "sort"))

  /** Lexicon-based topic tagging — the domain-classification pass a
    * training mixture is balanced on when no classifier is available: per
    * doc, hit counts against each topic's keyword list plus the argmax
    * topic (ties break to the EARLIER topic in the given order — the
    * first-wins when-chain is mirrored verbatim by the oracle's CASE).
    * Pure scan-side HOFs, zero shuffles. */
  def topicTags(docs: DataFrame, topics: Seq[(String, Seq[String])] = DefaultTopics,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(topics.nonEmpty, "topicTags: at least one topic")
    val w = words(col(textCol))
    val scored = docs.select(col(idCol) +: topics.map { case (t, lex) =>
      size(filter(w, x => x.isin(lex: _*))).cast("long").as(s"s_$t")
    }: _*)
    def pick(rest: List[String]): Column = rest match {
      case t :: Nil => lit(t)
      case t :: tail =>
        when(tail.map(o => col(s"s_$t") >= col(s"s_$o"))
          .reduce(_ && _), t).otherwise(pick(tail))
      case Nil => throw new IllegalArgumentException("unreachable")
    }
    scored.withColumn("topic", pick(topics.map(_._1).toList))
  }

  /** Per-document unigram (word) Shannon entropy — the diversity/quality
    * signal that separates natural prose (high entropy) from keyword-stuffed
    * spam, template boilerplate, and repetition loops (low entropy): a
    * filtering axis orthogonal to [[graft.expr.RepetitionGrams]]' verbatim
    * n-gram repetition and the Gopher length rules.
    *
    * Entirely scan-side — no shuffle, no join, no per-word explode: the
    * word multiset's run lengths come from the SORTED word array's
    * change-points via array HOFs, so the per-row cost is O(W log W) and
    * the corpus never moves. Portability: each term (c/n)·ln(c/n) is a
    * fixed IEEE op sequence floored to the 1e-9 grid (the DSIR λ
    * discipline — ln's engine low-bit disagreement is absorbed by the
    * grid), the per-doc sum is an exact integer fold in sorted-word order,
    * and the published entropy is one sign flip + division. */
  def wordEntropy(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sortedWords = "array_sort(split(lower(trim(text)), '\\\\s+'))"
    docs.selectExpr(s"$idCol AS doc_id", s"$sortedWords AS sw")
      .selectExpr("doc_id", "size(sw) AS n_words",
        // run starts: 0-based indices where the sorted array changes value
        """filter(sequence(0, size(sw) - 1),
          |  i -> i = 0 OR element_at(sw, i + 1) != element_at(sw, i))
          |  AS starts""".stripMargin,
        "sw")
      .selectExpr("doc_id", "n_words",
        "size(starts) AS n_distinct",
        // run lengths from consecutive starts (+ the array end), each term
        // floored to nano-units before the exact integer fold
        """aggregate(
          |  transform(sequence(0, size(starts) - 1),
          |    j -> bigint(floor(
          |      (double(element_at(concat(starts, array(size(sw))), j + 2)
          |              - element_at(starts, j + 1)) / double(n_words))
          |      * ln(double(element_at(concat(starts, array(size(sw))), j + 2)
          |              - element_at(starts, j + 1)) / double(n_words))
          |      * 1e9))),
          |  0L, (a, x) -> a + x) AS ent_nano_neg""".stripMargin)
      .selectExpr("doc_id", "n_words", "n_distinct",
        "-ent_nano_neg AS entropy_nano",
        "double(-ent_nano_neg) / 1e9 AS entropy")
  }

  /** Per-group DISTINCTIVE terms by z-scored log-odds ratio with a
    * uniform Dirichlet prior (Monroe, Colaresi & Quinn 2008, "Fightin'
    * Words") — the statistically-grounded replacement for raw tf-idf
    * "top terms per source": the z-score divides the log-odds delta by
    * its estimated standard deviation, so rare-but-lopsided terms don't
    * drown out genuinely characteristic ones.
    *
    *   δ_w = ln((c_gw+1)/(n_g − c_gw + V − 1))
    *       − ln((c_w − c_gw + 1)/(n − n_g − (c_w − c_gw) + V − 1))
    *   z_w = δ_w / sqrt(1/(c_gw+1) + 1/(c_w − c_gw + 1))
    *
    * with V the vocabulary size (α0 = V under the uniform prior). Exact
    * integer counts; δ and z run a fixed IEEE op sequence and z floors
    * to the 1e-9 grid before ranking (ties by term) — engine-portable,
    * the [[Drift.psi]]/[[Dsir]] discipline.
    *
    * Scale shape: ONE (group, term) count aggregation over the corpus;
    * corpus-wide term totals re-aggregate that frame (no second scan)
    * and broadcast back; the top-k rank window runs under
    * WindowGroupLimit. Nothing driver-side. */
  def distinctiveTerms(docs: DataFrame, groupCol: String, k: Int,
      textCol: String = "text"): DataFrame = {
    val cell = docs
      .select(col(groupCol).as("grp"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("grp"), col("term"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termTot = cell.groupBy(col("term")).agg(sum(col("c")).as("cw"))
    val grpTot = cell.groupBy(col("grp")).agg(sum(col("c")).as("ng"))
    val totals = termTot.agg(sum(col("cw")).as("nTot"),
      count(lit(1)).as("v"))
    val joined = cell
      .join(broadcast(termTot), Seq("term"))
      .join(broadcast(grpTot), Seq("grp"))
      .crossJoin(totals) // 1-row
    val cRest = col("cw") - col("c")
    val delta =
      log((col("c") + 1).cast("double") /
        (col("ng") - col("c") + col("v") - 1).cast("double")) -
      log((cRest + 1).cast("double") /
        (col("nTot") - col("ng") - cRest + col("v") - 1).cast("double"))
    val z = delta / sqrt(lit(1.0) / (col("c") + 1).cast("double") +
      lit(1.0) / (cRest + 1).cast("double"))
    val scored = joined
      .withColumn("z_nano", floor(z * lit(1e9)).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("z_nano").desc, col("term"))
    val out = scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("grp").as(groupCol), col("rank"), col("term"),
        (col("z_nano").cast("double") / 1e9).as("z"))
    val mat = out.localCheckpoint()
    cell.unpersist()
    mat
  }

  /** Top-k collocations: word pairs that co-occur in documents far beyond
    * chance, ranked by document-level pointwise mutual information
    *   PMI(a,b) = ln( df_ab · N / (df_a · df_b) )
    * with a `minPairDf` support floor (classic collocation mining — the
    * corpus-statistics complement to [[distinctiveTerms]]' group
    * contrasts). Exact integer document frequencies, ONE fixed IEEE
    * product/quotient chain into ln, nano-floored before the global
    * (pmi, pair) rank — engine-portable.
    *
    * Scale shape: distinct words per doc explode scan-side; the pair
    * frame is a per-doc self-equi-join on doc_id — per-doc quadratic in
    * DISTINCT words, which a `maxDf` rail bounds on real corpora by
    * dropping stopwords from the universe first (here the vocabulary is
    * corpus-bounded, so the default keeps everything); the global top-k
    * is one TakeOrdered. */
  def collocations(docs: DataFrame, k: Int, minPairDf: Long = 5L,
      maxDf: Long = Long.MaxValue,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val e0 = docs.select(col(idCol).as("doc_id"),
      explode(Dedup.shingles(col(textCol), 1)).as("term"))
    val dfw = e0.groupBy(col("term")).agg(count(lit(1)).as("dfw"))
      .filter(col("dfw") <= maxDf)
    val e = e0.join(broadcast(dfw), Seq("term"))
    val nDocs = docs.select(col(idCol)).distinct().count()
    val pairs = e.as("a")
      .join(e.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"),
        col("a.dfw").as("df_a"), col("b.dfw").as("df_b"))
      .agg(count(lit(1)).as("df_pair"))
      .filter(col("df_pair") >= minPairDf)
    val pmiNano = floor(log(
      (col("df_pair").cast("double") * lit(nDocs.toDouble)) /
        (col("df_a").cast("double") * col("df_b").cast("double"))) * lit(1e9))
      .cast("long")
    // TakeOrdered first (distributed top-k), THEN rank the k survivors —
    // a global rank window over the full pair frame would single-partition
    val top = pairs.withColumn("pmi_nano", pmiNano)
      .orderBy(col("pmi_nano").desc, col("term_a"), col("term_b"))
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi_nano").desc, col("term_a"), col("term_b"))
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("term_a"), col("term_b"), col("df_pair"),
        (col("pmi_nano").cast("double") / 1e9).as("pmi"))
  }
}
