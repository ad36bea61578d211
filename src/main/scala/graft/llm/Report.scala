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

  /** Pairwise source-overlap matrix: Jaccard similarity between each pair
    * of sources' distinct word-n-gram sets — the redundancy diagnostic
    * that complements the per-source KL mixture report: two sources with
    * high gram overlap are double-billing the same content against two
    * mixture budgets (the cross-source duplication [[graft.llm.Dedup]]'s
    * provenance report counts per-cluster, measured corpus-wide here).
    *
    * Scale shape: grams ride as xxhash64 keys (never strings) through ONE
    * (source, gram)-distinct aggregation; the intersection self-join is
    * gram-keyed over that deduplicated frame — fan-out per gram is
    * |sources| at most, so the join is linear in the distinct-gram count;
    * per-source set sizes are a |sources|-row broadcast. Every pair
    * (including zero-overlap ones) is published off the sizes cross —
    * |sources|² rows, driver-safe. One IEEE division per pair. */
  def sourceOverlap(docs: DataFrame, n: Int = 3,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    val g = docs
      .select(col(srcCol).as("src"),
        explode(graft.llm.Dedup.shingleHashes(col(textCol), n)).as("h"))
      .distinct()
    val sizes = g.groupBy(col("src")).agg(count(lit(1)).as("sz"))
    val inter = g.as("a")
      .join(g.as("b"), col("a.h") === col("b.h") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    broadcast(sizes.select(col("src").as("src_a"), col("sz").as("sz_a")))
      .join(broadcast(sizes.select(col("src").as("src_b"), col("sz").as("sz_b"))),
        col("src_a") < col("src_b"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("sz_a"), col("sz_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") /
          (col("sz_a") + col("sz_b") - coalesce(col("n_common"), lit(0L)))
            .cast("double")).as("jaccard"))
  }

  /** Zipf power-law fit over the corpus vocabulary: least-squares slope of
    * ln(frequency) against ln(rank) across the top-`topN` terms — the
    * corpus-health gauge (natural language sits near slope −1; a flat
    * slope means templated/synthetic token distributions, a cliff means a
    * vocabulary dominated by a few tokens).
    *
    * Scale shape: the vocabulary aggregation is the [[graft.llm.TextAnalysis]]
    * vocab machinery (gram-keyed, partial-aggregated); the fit itself runs
    * over a TakeOrdered top-`topN` frame collapsed into ONE bounded array
    * row — no global window over the corpus, `topN` is driver-state-sized
    * by construction. Portability: x/y land on the 1e-9 ln grid, the four
    * regression sums are sequential folds in rank order (aggregate ≡
    * list_reduce), and slope/intercept are a fixed scalar op sequence. */
  def zipfFit(docs: DataFrame, topN: Int = 100,
      textCol: String = "text"): DataFrame = {
    require(topN >= 2, s"zipf fit needs topN >= 2: $topN")
    val vocab = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(topN)
    vocab
      .agg(collect_list(struct((-col("c")).as("nc"), col("w"), col("c")))
        .as("arr"))
      .selectExpr("sort_array(arr) AS arr") // (c desc, w asc) = rank order
      .selectExpr(
        """transform(arr, (s, i) -> struct(
          |  floor(ln(double(i + 1)) * 1e9) / 1e9 AS x,
          |  floor(ln(double(s.c)) * 1e9) / 1e9 AS y)) AS t""".stripMargin)
      .selectExpr("double(size(t)) AS n",
        "aggregate(t, 0D, (a, s) -> a + s.x) AS sx",
        "aggregate(t, 0D, (a, s) -> a + s.y) AS sy",
        "aggregate(t, 0D, (a, s) -> a + s.x * s.y) AS sxy",
        "aggregate(t, 0D, (a, s) -> a + s.x * s.x) AS sxx")
      .selectExpr("bigint(n) AS n_terms",
        "(n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope",
        "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept")
  }
}
