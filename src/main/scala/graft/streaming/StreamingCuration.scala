package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Streaming form of the curation recipe ([[graft.llm.Curation]]): an
  * unbounded document stream is scored, gated, and deduplicated with
  * bounded state — the shape an always-on ingest (crawl feed, upload
  * queue) runs, versus the batch recipe's full-corpus pass.
  *
  * Stage mapping:
  *   - language/quality gates are pure scan-side projections off the
  *     one-pass [[graft.expr.TextProfile]] kernel — stateless, identical
  *     expressions to the batch path (same columns, same thresholds);
  *   - exact dedup becomes `dropDuplicatesWithinWatermark` on the content
  *     digest: state is bounded by the watermark horizon instead of the
  *     corpus (the batch min-id survivor rule needs the whole corpus; a
  *     stream keeps the FIRST arrival inside the horizon — the natural
  *     streaming analog);
  *   - near-dup clustering stays a periodic batch job over the curated
  *     store ([[graft.llm.Curation.curateNearDup]]): LSH banding needs
  *     corpus-wide joins no bounded-state streaming operator expresses.
  */
object StreamingCuration {

  /** Watermarked stream–stream inner join: each curated-document event is
    * enriched with its embedding-arrival event within a bounded interval
    * (embedding lands no earlier than the doc, no later than `horizon`
    * after it). Both sides carry watermarks and the join condition bounds
    * event time in BOTH directions, so Spark can evict state — the three
    * requirements for an unbounded-safe stream-stream join. State per side
    * is O(rows inside the horizon), never the full stream. */
  def joinWithEmbeddings(docs: DataFrame, embeddings: DataFrame,
      horizon: String = "10 minutes",
      watermarkDelay: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val d = docs.withWatermark("ingest_ts", watermarkDelay)
    val e = embeddings.withWatermark("embed_ts", watermarkDelay)
    // "left_outer": docs whose embedding never lands inside the horizon
    // emit with a null embedding once the watermark passes the bound —
    // the dead-letter feed a production ingest monitors. "full_outer"
    // additionally flushes orphan EMBEDDINGS (an embedding whose document
    // was gated out upstream) with a null text — the other dead-letter
    // direction; doc_id coalesces across sides so the consumer has one id
    // column regardless of which side survived.
    d.join(e,
      d("doc_id") === e("emb_doc_id") &&
        e("embed_ts") >= d("ingest_ts") &&
        e("embed_ts") <= d("ingest_ts") + expr(s"INTERVAL $horizon"),
      joinType)
      .select(coalesce(d("doc_id"), e("emb_doc_id")).as("doc_id"),
        d("text"), e("embedding"), d("ingest_ts"), e("embed_ts"))
  }

  /** docs stream → curated stream. Expects (doc_id, text, event time
    * `ingest_ts`); emits (doc_id, quality, text) for kept documents. */
  def curate(docs: DataFrame, lang: String = "en", minQuality: Double = 0.5,
      watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .select(col("doc_id"), col("text"), col("ingest_ts"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .filter(col("lang_pred") === lang && col("quality") >= minQuality)
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ingest_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")
      .select(col("doc_id"), col("quality"), col("text"))

  /** Trending tokens per tumbling window via the mergeable
    * [[graft.expr.SpaceSavingTopK]] sketch — state per window is the
    * sketch's `capacity` counters, NEVER one state row per distinct token
    * (the exact streaming count would grow state with the vocabulary; a
    * crawl feed's vocabulary is unbounded). Watermark + append mode: each
    * window's sketch finalizes once the watermark passes, exactly like any
    * windowed agg — the aggregate's serialize/merge path IS the streaming
    * state codec. Emits (window, hh: array<struct<item,cnt,err>>). */
  def windowedHeavyHitters(tokens: DataFrame, capacity: Int,
      windowLen: String = "1 hour", watermarkDelay: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val hh = GraftBridge.column(
      graft.expr.SpaceSavingTopK(
        GraftBridge.expression(col("term")), capacity).toAggregateExpression())
    tokens
      .withWatermark("ingest_ts", watermarkDelay)
      .groupBy(window(col("ingest_ts"), windowLen))
      .agg(hh.as("hh"))
  }

  /** Always-on surgical decontamination: every micro-batch of an ingest
    * stream has its benchmark-leaked spans cut before landing
    * ([[graft.llm.Decontam.decontaminateSpans]] against the STATIC
    * benchmark table). Span removal is per-doc given the benchmark — no
    * cross-batch state — but the island merge needs a per-doc window
    * function, which streaming DataFrames can't express; `foreachBatch`
    * is exactly the bridge: each micro-batch is a batch frame, the batch
    * operator runs unchanged (one code path, so the streaming result is
    * the batch result by construction — pinned in StreamingCurationSpec),
    * and the checkpoint gives the usual effectively-once sink contract.
    * The benchmark's broadcast window set is rebuilt per batch from the
    * static frame — cache `benchmark` if it is expensive to read. */
  def decontamStream(docs: DataFrame, benchmark: DataFrame,
      windowTokens: Int = 20)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.llm.Decontam.decontaminateSpans(batch, benchmark,
        windowTokens), id)
    }

  /** Per-window Count-Min sketch over a (term, ingest_ts) stream — the
    * always-on form of [[graft.llm.Sketch.cmsBuild]]: each tumbling window
    * finalizes a depth × width counter table on watermark passage
    * (append mode — one emission per closed (window, cell)). State per
    * open window is bounded at depth·width rows by construction, the same
    * fixed-size-state argument as the windowed SpaceSaving sketch; the
    * emitted cells merge with batch/other-shard sketches via
    * [[graft.llm.Sketch.cmsMerge]] (counts add — proved in LlmSpec). */
  def windowedCms(tokens: DataFrame, depth: Int = 4, width: Int = 64,
      windowLen: String = "1 hour", watermarkDelay: String = "1 hour"): DataFrame =
    tokens
      .withWatermark("ingest_ts", watermarkDelay)
      .select(col("ingest_ts"),
        explode(array((0 until depth).map(j =>
          struct(lit(j).as("depth"),
            graft.llm.Sketch.bucket(col("term"), j, width).as("bucket"))): _*))
          .as("cell"))
      .groupBy(window(col("ingest_ts"), windowLen),
        col("cell.depth").as("depth"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
}
