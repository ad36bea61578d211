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

  /** Bounded-hop BFS distances from a seed set over an undirected pair
    * list: hops(v) = length of the shortest seed→v path, NULL beyond
    * `maxHops` or unreachable — "how far does influence/contamination
    * spread from these documents through the near-dup graph" (e.g. seeds
    * = a benchmark's contaminated docs; 2 hops = paraphrases of
    * paraphrases).
    *
    * Scale shape: each round joins ONLY the just-discovered frontier
    * (d = h−1) against the edge list — settled nodes never rejoin — and
    * folds via a (id → min d) aggregation; distances are bounded
    * integers, every exchange carries (long, long) rows, and the state
    * frame re-checkpoints per round (the [[kCore]] lineage discipline).
    * Rounds are maxHops, fixed — the driver cost is O(maxHops) job
    * submissions, corpus-size-independent. */
  def bfsHops(nodes: DataFrame, pairs: DataFrame, seeds: DataFrame,
      maxHops: Int, idCol: String = "doc_id"): DataFrame = {
    require(maxHops >= 1, s"maxHops >= 1: $maxHops")
    val ids = nodes.select(col(idCol).as("id")).distinct()
      .localCheckpoint(eager = false)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(eager = false)
    var dist = seeds.select(col(seeds.columns.head).as("id")).distinct()
      .withColumn("d", lit(0L))
    for (h <- 1 to maxHops) {
      val next = edges
        .join(dist.filter(col("d") === (h - 1)), col("src") === col("id"))
        .select(col("dst").as("id"), lit(h.toLong).as("d"))
      dist = dist.unionByName(next)
        .groupBy(col("id")).agg(min(col("d")).as("d"))
        .localCheckpoint(eager = false)
    }
    ids.join(dist, Seq("id"), "left")
      .select(col("id").as(idCol), col("d").as("hops"))
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected canonical pair list (id_a < id_b, each edge once) — the
    * graph-density twin of [[pagerank]]: a high-LCC node sits inside a
    * tightly-interlinked template family (its neighbors also duplicate
    * each other), a high-degree/low-LCC node is a hub stitching otherwise
    * unrelated documents — exactly the split curation wants between
    * "boilerplate cluster" and "popular but unique".
    *
    * Scale shape — the degree-ordered orientation (node-iterator++): each
    * edge is directed from its lower-(degree, id) endpoint, so wedge
    * enumeration joins each node's OUT-edges only — fan-out per node is
    * min(deg, …) and the quadratic concentrates on low-degree vertices
    * (Σ d_out² is minimized by this orientation; the classic
    * skew-resistant triangle plan). The closure check is one semi-join of
    * wedges against the canonical edge list; every exchange carries
    * (long, long) rows. LCC = 2T / d(d−1): exact integer numerator and
    * denominator, ONE IEEE division — engine-portable; NULL below degree
    * 2 (undefined, the [[graft.llm.Probe]] zero-variance convention). */
  def triangles(pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .localCheckpoint(eager = false)
    val deg = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
      .localCheckpoint(eager = false)
    val withDeg = e
      .join(deg.select(col("id").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("degree").as("db")), Seq("b"))
    // orient low-(deg, id) → high; ties on degree fall back to id, and the
    // canonical frame already has a < b — so src = a iff da <= db
    val oriented = withDeg.select(
      when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("src"),
      when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint(eager = false)
    // wedges at each source, canonicalized by endpoint id so the closure
    // edge lookup hits the (id_a < id_b) canonical frame directly
    val wedges = oriented.as("x")
      .join(oriented.as("y"), col("x.src") === col("y.src")
        && col("x.dst") < col("y.dst"))
      .select(col("x.src").as("v0"), col("x.dst").as("v1"),
        col("y.dst").as("v2"))
    val tri = wedges.join(e,
      wedges("v1") === e("a") && wedges("v2") === e("b"), "left_semi")
    val tn = tri
      .select(explode(array(col("v0"), col("v1"), col("v2"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    deg.join(tn, Seq("id"), "left")
      .select(col("id").as("node_id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          (coalesce(col("triangles"), lit(0L)) * 2).cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"))
          .as("lcc"))
  }

  /** Synchronous label propagation (community detection) over an
    * undirected canonical pair list: labels start as the node's own id;
    * each round every node adopts the label MOST FREQUENT among its
    * neighbours, ties broken by the SMALLEST label, isolated nodes keep
    * their own — the deterministic LPA variant, so the result is a pure
    * function of (graph, iters) and the DuckDB oracle mirrors the same
    * unrolled rounds (the [[pagerank]]/[[kCore]] fixed-iteration
    * convention; classic LPA's random tie-breaks would be un-oracle-able).
    * Communities separate the near-dup graph's template FAMILIES without
    * the full transitive closure [[Dedup.clusters]] computes: two families
    * bridged by one accidental edge stay distinct here (the bridge node
    * follows its majority side) but fuse under connected components.
    *
    * Scale shape: each round is one (edge ⋈ label) hash join keyed on the
    * label side plus one (node)-keyed aggregation; the vote winner folds
    * through a single `max(struct(count, -label))` — a partial-aggregable
    * max, NO per-node sort window — and every exchange carries (long,
    * long[, long]) rows. Labels re-checkpoint per round so round t+1
    * reads a sliver, not a t-deep join chain; rounds are fixed, so driver
    * cost is O(iters) job submissions, corpus-size-independent. */
  def labelPropagation(nodes: DataFrame, pairs: DataFrame, iters: Int = 3,
      idCol: String = "doc_id"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(eager = false)
    var labels = nodes.select(col(idCol).as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val votes = edges
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("c"))
      // winner = lexicographic max of (count, -label): most frequent,
      // smallest label on ties — labels are non-negative ids, so the
      // negation is a total order flip
      val best = votes
        .groupBy(col("src").as("id"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("w"))
        .select(col("id"), (-col("w.nl")).as("win"))
      labels = labels
        .join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("win"), col("label")).as("label"))
        .localCheckpoint(eager = false)
    }
    labels.select(col("id").as(idCol), col("label").as("community"))
  }

  /** k-core peeling over an undirected canonical pair list: `iters` rounds
    * of "drop every node with degree < k, then recount" — the density
    * filter that isolates the tightly-interlinked CORE of a template/
    * boilerplate family from its pendant one-off members (degree alone
    * can't: a hub touching many singletons has high degree but no core).
    * Returns the surviving (node_id, degree) with degrees measured on the
    * final surviving subgraph.
    *
    * Fixed iteration count, NOT a fixpoint probe — the result is a
    * deterministic function of (graph, k, iters) on any engine (the
    * [[pagerank]] convention: the oracle mirrors the same unrolled
    * rounds; peeling converges when no round removes a node, and `iters`
    * of 3–5 suffices on shallow near-dup graphs — raise it for deep
    * chains). Scale shape: each round is one (node)-keyed degree count +
    * two edge semi-joins, all exchanges (long, long); edges re-checkpoint
    * per round so round t+1 reads t's sliver, not a t-deep join chain. */
  def kCore(pairs: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    require(k >= 1 && iters >= 1, s"bad k-core params: $k, $iters")
    var edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .localCheckpoint(eager = false)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("id")).unionByName(e.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    for (_ <- 1 to iters) {
      val keep = degrees(edges).filter(col("degree") >= k).select(col("id"))
      edges = edges
        .join(keep.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
        .localCheckpoint(eager = false)
    }
    degrees(edges).select(col("id").as("node_id"), col("degree"))
  }
}
