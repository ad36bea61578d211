package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over document-similarity graphs — the popularity
  * signal web-corpus curation pipelines attach to documents (Common Crawl
  * publishes exactly this class of ranking over its link graph): documents
  * central in the near-dup/similarity graph are template/boilerplate
  * hubs; isolated documents are unique content. Centrality feeds canonical
  * selection ("keep the most-connected copy") and quality weighting.
  *
  * PageRank here is EXACT-INTEGER on the micro-unit grid (the
  * [[Similarity.clusterCentroids]] discipline): scores live in millionths,
  * every update is s'(v) = base + d·(Σ_u→v s(u) div deg(u)) div 100 with
  * integer floor division — no floats anywhere, so the result is
  * bit-portable across engines and partitionings by construction, and the
  * oracle is a plain unrolled-CTE mirror. Dangling nodes contribute
  * nothing and settle at the base score (mass leaks, as in the
  * non-normalized PageRank variant — deterministic and fine for a
  * RANKING signal).
  *
  * Scale shape: a fixed iteration count (no fixpoint detection), each
  * iteration = one edges⋈scores broadcast-free equi-join + one dst-keyed
  * partial-aggregated shuffle — the classic distributed PageRank plan.
  * Driver state: none. Edge/degree frames are checkpointed once and
  * re-read per iteration. Integer range: safe while total mass
  * (nodes × 10⁶ × damping) stays under 2⁶³/100 ≈ 9·10¹⁶ — i.e. up to
  * ~10¹⁰ nodes. */
object Graph {

  /** (idCol, rank_micro, degree) after `iters` rounds; `pairs` is an
    * undirected (id_a, id_b) pair list (each pair once). */
  def pagerank(nodes: DataFrame, pairs: DataFrame, iters: Int = 3,
      dampingPct: Int = 85, idCol: String = "doc_id"): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100,
      s"iters >= 1, dampingPct in [0,100]: $iters, $dampingPct")
    val ids = nodes.select(col(idCol).as("id")).distinct()
      .localCheckpoint(eager = false)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(eager = false)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = false)
    val base = (100L - dampingPct) * 10000L
    var scores = ids.select(col("id"), lit(1000000L).as("s"))
    for (_ <- 1 to iters) {
      val contrib = scores
        .join(deg, scores("id") === deg("src"))
        .select(col("src"), expr("s div deg").as("c"))
      val incoming = edges.join(contrib, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
      scores = ids
        .join(incoming, ids("id") === incoming("dst"), "left")
        .select(ids("id"),
          (lit(base) + expr(s"($dampingPct * coalesce(inc, 0L)) div 100"))
            .as("s"))
    }
    scores
      .join(deg, scores("id") === deg("src"), "left")
      .select(col("id").as(idCol), col("s").as("rank_micro"),
        coalesce(col("deg"), lit(0L)).as("degree"))
  }
}
