package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-operations reports: snapshot diff between two corpus versions and
  * the one-row dataset card — the audit surface a managed 100 TB training
  * corpus needs around the transform operators (what changed since the last
  * release, and what is in the release).
  */
object Report {

  /** Diff two corpus snapshots by content digest: each id is classified
    * `added` (new only), `removed` (old only), `changed` (both, different
    * digest) or `unchanged`.
    *
    * Scale shape: the digests are computed SCAN-SIDE in each snapshot's own
    * projection, so document bytes never enter the join — the full-outer
    * join carries (id, 32-byte digest) rows only, shuffled on the id both
    * sides. No broadcast (both sides are corpus-sized by assumption); with
    * both snapshots bucketed by id on disk the exchange disappears
    * entirely (the [[graft.sources.Io]] bucketed-writer path). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"), md5(col(textCol)).as("old_digest"))
    val n = newDf.select(col(idCol).as("id"), md5(col(textCol)).as("new_digest"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("old_digest").isNull, "added")
          .when(col("new_digest").isNull, "removed")
          .when(col("old_digest") =!= col("new_digest"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** One-row dataset card: corpus size, token/char volume, source/language
    * breadth, exact duplicate rate, mean document length. One full scan
    * with partial aggregation — the distinct counts expand to the standard
    * two-phase distinct plan (the only shuffles; at 100 TB swap
    * `countDistinct` for `approx_count_distinct` when a ±2% card is
    * acceptable — here the exact form is the oracle-able one). Ratios are
    * single IEEE divisions of exact longs — bit-portable. */
  def datasetCard(docs: DataFrame): DataFrame = {
    val words = split(lower(trim(col("text"))), "\\s+")
    docs
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        size(words).cast("long").as("n_words"), md5(col("text")).as("digest"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_tokens"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("digest")).as("n_unique"))
      .select(col("n_docs"), col("n_tokens"), col("total_chars"),
        col("n_sources"), col("n_langs"), col("n_unique"),
        ((col("n_docs") - col("n_unique")).cast("double") /
          col("n_docs").cast("double")).as("dup_rate"),
        (col("n_tokens").cast("double") /
          col("n_docs").cast("double")).as("avg_words"))
  }
}
