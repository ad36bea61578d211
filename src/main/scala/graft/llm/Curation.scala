package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The standard corpus-curation recipe, composed from the library's
  * operators: language filter → quality floor → exact dedup (min-id
  * survivor wins; duplicate count retained for weighting/inspection).
  *
  * Plan shape at 100 TB: ONE narrow scan-side projection computes language
  * and quality off the shared one-pass [[graft.expr.TextProfile]] kernel
  * (Catalyst subexpression elimination dedups the kernel call), the filter
  * prunes before any shuffle, and the only wide operator is the dedup's
  * hash aggregation on a uniform 128-bit digest. Near-dup passes
  * ([[Dedup.minhashNearDups]] etc.) slot in AFTER the exact pass — they
  * then run on the (much smaller) distinct corpus. */
object Curation {

  /** Curate: keep `lang` documents with quality ≥ `minQuality`, collapse
    * exact duplicates to their min-id survivor. Returns
    * (doc_id, quality, n_copies) — one row per surviving document. */
  def curate(docs: DataFrame, lang: String = "en", minQuality: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = docs.select(
      col(idCol), col(textCol),
      TextAnalysis.langId(col(textCol)).as("lang_pred"),
      TextAnalysis.qualityScore(col(textCol)).as("quality"))
    val kept = scored
      .filter(col("lang_pred") === lang && col("quality") >= minQuality)
    kept
      .groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as(idCol),
        // survivor's quality: identical text ⇒ identical quality — min is
        // a deterministic way to say "the value", oracle-mirrorable
        min(col("quality")).as("quality"),
        count(lit(1)).as("n_copies"))
      .drop("text_hash")
  }

  /** Gate-order waterfall over the [[curate]] recipe: one row per stage
    * with (n_in, n_out, n_dropped) — the pipeline-observability table
    * that says WHERE the corpus went (language gate vs quality gate vs
    * exact dedup), before anyone debugs a surprising survivor count.
    * ONE scan: all stage counts are conditional aggregates over the same
    * scored projection (the dedup stage is one distinct over the gated
    * digests). */
  def curationWaterfall(docs: DataFrame, lang: String = "en",
      minQuality: Double = 0.5, textCol: String = "text"): DataFrame = {
    val scored = docs.select(col(textCol).as("text"),
      TextAnalysis.langId(col(textCol)).as("lp"),
      TextAnalysis.qualityScore(col(textCol)).as("q"))
    val pass1 = col("lp") === lang
    val pass2 = pass1 && col("q") >= minQuality
    val agg = scored.agg(
      count(lit(1)).as("n0"),
      sum(when(pass1, 1L).otherwise(0L)).as("n1"),
      sum(when(pass2, 1L).otherwise(0L)).as("n2"),
      count_distinct(when(pass2, md5(col("text")))).as("n3"))
    agg.select(explode(array(
        struct(lit("1_language").as("stage"), col("n0").as("n_in"),
          col("n1").as("n_out")),
        struct(lit("2_quality").as("stage"), col("n1").as("n_in"),
          col("n2").as("n_out")),
        struct(lit("3_exact_dedup").as("stage"), col("n2").as("n_in"),
          col("n3").as("n_out")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.n_in").as("n_in"),
        col("r.n_out").as("n_out"),
        (col("r.n_in") - col("r.n_out")).as("n_dropped"))
      .orderBy(col("stage"))
  }

  /** The full recipe: [[curate]] (language → quality → exact dedup), then
    * NEAR-duplicate clustering over the exact survivors — each MinHash
    * cluster keeps only its canonical (min-id) member. Near-dup detection
    * runs after the exact pass on purpose: the distinct corpus is the
    * small side, and viral exact duplicates never reach the LSH join.
    * Returns the same (doc_id, quality, n_copies) shape as [[curate]]. */
  def curateNearDup(docs: DataFrame, lang: String = "en",
      minQuality: Double = 0.5, threshold: Double = 0.6,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // `exact` feeds two plan branches (the survivor semi-join and the
    // final anti-join) with different pruned columns, so exchange reuse
    // never fires and an unpersisted plan would run the scan + profile
    // kernel + dedup aggregation twice. It is tiny (one row per surviving
    // document's text hash) — persist, materialize the output, release.
    val exact = curate(docs, lang, minQuality, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Semi-join only — no dropDuplicates guard: `exact` ids are min-per-
    // text-hash picks from these same docs, and a semi join emits each
    // left row at most once, so duplicate output rows require duplicate
    // doc ids in the INPUT, which the corpus contract forbids (and which
    // the pair generator tolerates anyway — equal ids never pair).
    val survivorDocs = docs.join(exact.select(col(idCol)), Seq(idCol), "left_semi")
    val pairs = Dedup.minhashNearDups(survivorDocs, threshold,
      idCol = idCol, textCol = textCol)
    val nonCanonical = Dedup.clusters(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    val out = exact.join(nonCanonical, Seq(idCol), "left_anti")
      .localCheckpoint() // eager: compute before releasing `exact`
    exact.unpersist()
    out
  }

  /** The END-TO-END release: [[curateNearDup]] (language → quality →
    * exact dedup → near-dup canonical) → [[Decontam.decontaminate]]
    * against the benchmark → [[TextAnalysis.tokenizeToIds]] under a vocab
    * trained on the RELEASED corpus itself → [[Packing.packByBudget]]
    * token shards → the shard manifest + dataset-card summary a training
    * run consumes. Every stage exists standalone (and is oracle-gated
    * standalone); this composition is where stage-boundary bugs live —
    * the wrong corpus feeding the vocab, a pre-dedup doc leaking into the
    * pack order, contamination computed over raw rather than curated
    * text — so it ships as one gated row.
    *
    * Returns one 'shard' row per token shard (n_docs, n_tokens,
    * n_sources, n_langs off the release metadata) plus one 'card' row
    * (shard = −1) with the whole-release totals.
    *
    * Plan shape: each stage's own 100 TB discipline composes — the only
    * corpus-sized exchanges are curation's digest aggregation, the LSH
    * band shuffle over exact survivors, the tokenize vocab aggregation,
    * and packing's two-phase prefix (benchmark grams and the vocab both
    * broadcast; the manifest aggregates shard-keyed rows). `clean` feeds
    * three branches (vocab, tokenize, manifest metadata), so it persists
    * for the build and releases after the (shards+1)-row result
    * materializes. */
  def releasePipeline(docs: DataFrame, benchmark: DataFrame,
      budget: Long = 4096L, lang: String = "en", minQuality: Double = 0.5,
      nearThreshold: Double = 0.6, gramN: Int = 5,
      contamThreshold: Double = 0.3, vocabK: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val survivors = curateNearDup(docs, lang, minQuality, nearThreshold,
      idCol, textCol)
    val curated = docs.join(survivors.select(col(idCol)), Seq(idCol), "left_semi")
    val clean = Decontam.decontaminate(curated, benchmark, gramN,
      contamThreshold, idCol, textCol)
    releaseTail(clean, budget, vocabK, idCol, textCol)
  }

  /** The release's GLOBAL tail over an already-clean corpus — vocab
    * trained on the release itself, tokenize, budgeted packing, and the
    * manifest+card rollup. Factored out so the always-on streamed
    * composition ([[graft.streaming.StreamingRelease]]) serves its
    * snapshot through the LITERAL same code the batch row runs: snapshot
    * ≡ batch output is then exactly "maintained clean set ≡ batch clean
    * set". `clean` must carry (idCol, textCol, lang, source). */
  def releaseTail(cleanDocs: DataFrame, budget: Long = 4096L,
      vocabK: Int = 20, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val clean = cleanDocs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = TextAnalysis.vocabWithIds(
      TextAnalysis.vocabTopK(clean, vocabK, idCol, textCol))
    val tokenized = TextAnalysis.tokenizeToIds(clean, vocab,
        idCol = idCol, textCol = textCol)
      .select(col(idCol), col("n_tokens"))
    val shards = Packing.packByBudget(tokenized, col(idCol),
        col("n_tokens"), budget)
      .withColumnRenamed("pack_key", idCol)
    val meta = clean.select(col(idCol), col("lang"), col("source"))
      .join(shards.select(col(idCol), col("n_tokens"), col("shard")),
        Seq(idCol))
    // manifest + card in ONE aggregation: rollup's grand-total row IS the
    // dataset card (separate aggs would rescan meta and recompute the
    // whole tokenize/pack chain — the JobCountSpec budget pins this)
    val out = meta.rollup(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"))
      .select(
        when(col("shard").isNull, lit("card")).otherwise(lit("shard"))
          .as("kind"),
        coalesce(col("shard"), lit(-1L)).as("shard"),
        col("n_docs"), col("n_tokens"), col("n_sources"), col("n_langs"))
      .localCheckpoint() // eager: (shards+1) rows, computed before unpersist
    clean.unpersist()
    out
  }
}
