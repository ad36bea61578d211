package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a relational
  * artifact: a `depth × width` counter table estimating term frequencies
  * under fixed-size state — the streaming-friendly companion to
  * [[graft.expr.SpaceSaving]] (which keeps the top items; CMS answers point
  * queries for ANY item, with one-sided error: est ≥ exact, over by at most
  * εN with probability 1−δ for width=e/ε, depth=ln(1/δ)).
  *
  * Scale shape: the build is one exploded scan with map-side partial
  * aggregation — each task combines into AT MOST depth × width local rows
  * before the single (depth, bucket)-keyed exchange, so the shuffle volume
  * is bounded by the sketch size per partition regardless of corpus size.
  * Sketches over corpus shards MERGE by adding counts bucket-wise (proved
  * in LlmSpec) — the property that makes the sketch maintainable
  * incrementally like the dedup/search artifacts.
  *
  * Portability discipline: buckets are md5-prefix integers (the
  * [[Sampling]] digest convention) — any engine reproduces the exact
  * sketch, so the artifact is auditable cross-engine, not just
  * cross-partitioning. */
object Sketch {

  val DefaultDepth = 4
  val DefaultWidth = 64

  /** Frequent + absent probe terms: the absent tail exercises the
    * collision-overestimate path (exact 0, est ≥ 0). */
  val CmsPanel: Seq[String] = Seq("batch", "column", "filter", "hash",
    "join", "merge", "neutrino", "order", "row", "scan", "small", "zzzq")

  /** Row j's bucket for a term: md5("j:term") 8-hex prefix mod width. */
  def bucket(term: Column, j: Int, width: Int): Column =
    pmod(graft.expr.Md5Prefix(concat(lit(j.toString), lit(":"), term), 8),
      lit(width.toLong))

  private def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Build the sketch over the corpus's whitespace tokens: one row per
    * non-empty (depth, bucket) cell with its collision-summed count. */
  def cmsBuild(docs: DataFrame, depth: Int = DefaultDepth,
      width: Int = DefaultWidth, textCol: String = "text"): DataFrame = {
    val toks = docs.select(explode(words(col(textCol))).as("term"))
    toks
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("depth"), bucket(col("term"), j, width).as("bucket"))): _*))
        .as("cell"))
      .groupBy(col("cell.depth").as("depth"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built over disjoint corpus shards: counts add
    * bucket-wise (outer union — a cell absent from one side contributes 0).
    * Result is bit-identical to building over the union corpus. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("depth"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** DELETION-aware CMS maintenance — the right-to-erasure companion to
    * [[cmsMerge]]: CMS is a LINEAR sketch (every cell is a sum over item
    * occurrences), so a purged shard's counts subtract EXACTLY and the
    * result is bit-identical to rebuilding over the survivors — cells
    * whose count reaches 0 drop, matching [[cmsBuild]]'s non-empty-cell
    * contract (oracle-pinned). `deletedSketch` is [[cmsBuild]] over the
    * doomed rows, computed at erasure time while they are still readable
    * (the [[graft.sources.Merge.applyDeletes]] ordering). Linearity is
    * what the other sketches lack: see [[kmvDelete]] (partial) and the
    * bloom/HLL rebuild contracts pinned in LlmSpec. */
  def cmsDelete(sketch: DataFrame, deletedSketch: DataFrame): DataFrame =
    sketch.unionByName(
        deletedSketch.select(col("depth"), col("bucket"), (-col("cnt")).as("cnt")))
      .groupBy(col("depth"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") > 0L)

  /** Point-query the sketch for each panel term: est = min over depth rows
    * of the term's bucket count (0 for an untouched bucket), next to the
    * exact corpus count — publishing the one-sided-error contract
    * (`overestimate` must be uniformly true). The panel is a literal
    * (bounded, broadcast); the only corpus read is the exact-count scan. */
  def cmsEstimate(sketch: DataFrame, docs: DataFrame, panel: Seq[String],
      depth: Int = DefaultDepth, width: Int = DefaultWidth,
      textCol: String = "text"): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val p = panel.toDF("term")
    val cells = p.select(col("term"),
      explode(array((0 until depth).map(j =>
        struct(lit(j).as("depth"), bucket(col("term"), j, width).as("bucket"))): _*))
        .as("cell"))
      .select(col("term"), col("cell.depth").as("depth"), col("cell.bucket").as("bucket"))
    val est = cells
      .join(sketch, Seq("depth", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
    val exact = docs
      .select(explode(words(col(textCol))).as("term"))
      .filter(col("term").isin(panel: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    est
      .join(exact, Seq("term"), "left")
      .select(col("term"), col("est_count"),
        coalesce(col("c"), lit(0L)).as("exact_count"),
        (col("est_count") >= coalesce(col("c"), lit(0L))).as("overestimate"))
  }

  /** [[cmsBuild]] over an arbitrary key column (stringified) instead of
    * text tokens — the form the join-size estimator sketches each side
    * with. Same cells, same mergeability. */
  def cmsBuildKeys(df: DataFrame, keyCol: Column, depth: Int = DefaultDepth,
      width: Int = DefaultWidth): DataFrame = {
    val term = keyCol.cast("string")
    df.select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("depth"), bucket(term, j, width).as("bucket"))): _*))
        .as("cell"))
      .groupBy(col("cell.depth").as("depth"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** CMS inner-product equi-join cardinality estimate (Cormode &
    * Muthukrishnan 2005 §4.2): |A ⋈ B| = Σ_v fA(v)·fB(v), estimated as
    * min over depth rows of the bucket-wise product sum — one-sided
    * (each row's collisions only ADD cross terms), so `overestimate` is
    * a contract, published next to the exact size.
    *
    * This is the pre-shuffle gauge a planner wants at 100 TB: each side
    * sketches in ONE scan (mergeable across shards via [[cmsMerge]] —
    * build once per table, reuse per candidate join), the estimate
    * itself touches only two depth×width sketch tables, and a blown-up
    * estimate says "salt or rethink this join" before any 100 TB
    * shuffle runs. The exact side here executes the per-key count join
    * for the contract; production callers read just the estimate. */
  def cmsJoinSize(a: DataFrame, keyA: Column, b: DataFrame, keyB: Column,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val ips = cmsBuildKeys(a, keyA, depth, width).as("x")
      .join(cmsBuildKeys(b, keyB, depth, width).as("y"),
        Seq("depth", "bucket"))
      .groupBy(col("depth"))
      .agg(sum(col("x.cnt") * col("y.cnt")).as("ip"))
    // a depth row whose buckets are fully disjoint has inner product 0 —
    // keep it in the min via the literal depth frame
    val est = (0 until depth).toDF("depth")
      .join(ips, Seq("depth"), "left")
      .agg(min(coalesce(col("ip"), lit(0L))).as("est_join_size"))
    val fa = a.select(keyA.cast("string").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("ca"))
    val fb = b.select(keyB.cast("string").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("cb"))
    val exact = fa.join(fb, Seq("k"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))
        .as("exact_join_size"))
    est.crossJoin(exact)
      .select(col("est_join_size"), col("exact_join_size"),
        (col("est_join_size") >= col("exact_join_size")).as("overestimate"))
  }

  // ---- KMV / theta distinct sketch (Bar-Yossef et al. 2002; the bottom-k
  // form behind Apache DataSketches' theta sketch) ----

  /** KMV hash: the value's md5 14-hex prefix as a fraction of 2^56 —
    * uniform in [0, 1), deterministic, engine-portable (the [[Sampling]]
    * digest discipline). 56-bit resolution makes same-u collisions of
    * distinct values negligible below ~10^7 distincts per group. */
  def kmvU(value: Column): Column =
    graft.expr.Md5Prefix(value, 14).cast("double") / lit(math.pow(2, 56))

  /** Build a bottom-k (KMV) distinct sketch per group: the k smallest
    * hash values of the group's distinct `valueCol`s. The k-th smallest of
    * n uniform hashes sits near k/n, so the sketch supports distinct
    * estimation ([[kmvEstimate]]) AND — because every group hashes values
    * with the SAME function — set-algebra estimates across groups
    * ([[kmvSetOps]]), which HLL cannot do for intersections.
    *
    * Scale shape: the distinct pass is a hash aggregation with map-side
    * combine; the per-group bottom-k is a rank window that Spark rewrites
    * with WindowGroupLimit, so each map partition forwards at most k rows
    * per group into the exchange. State per group is k doubles —
    * mergeable (union of sketches re-bottom-k'd = sketch of union,
    * pinned in LlmSpec). */
  def kmvBuild(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("u"))
    df.select(col(groupCol).as("grp"), kmvU(col(valueCol)).as("u"))
      .groupBy(col("grp"), col("u")).agg(count(lit(1)).as("_n")).drop("_n")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("grp"), col("u"), col("rnk"))
  }

  /** Merge two [[kmvBuild]] sketches (disjoint corpus shards or an
    * incremental batch): per group, re-bottom-k of the distinct union of
    * retained hashes. Result is IDENTICAL to building over the union
    * corpus (the k smallest of a union are among the k smallest of each
    * side — spec-pinned), which is what makes the sketch an incrementally
    * maintainable artifact: the corpus is never re-scanned, only ≤ 2k
    * rows per group pass through. */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("u"))
    a.select(col("grp"), col("u"))
      .union(b.select(col("grp"), col("u"))).distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("grp"), col("u"), col("rnk"))
  }

  /** DELETION over a bottom-k sketch — the honest partial answer, because
    * a DISTINCT sketch is not linear: a value's hash can be subtracted
    * only when the value is FULLY GONE from the group's survivors —
    * reference-count semantics, exactly why deletion-heavy pipelines
    * pair distinct sketches with per-value reference counts. The caller
    * derives `deleted` either as doomed values anti-joined against the
    * surviving rows, or (cheaper — one corpus pass, no pair-level
    * anti-join; the q_kmv_delete shape) as the values whose survivor
    * occurrence count aggregates to 0. Removing the gone hashes and
    * re-ranking yields a sketch
    * BIT-IDENTICAL to [[kmvBuild]] over the survivors for every group
    * where that is provable from the sketch alone:
    *
    *  - an UNSATURATED group retains ALL its distinct hashes — removal is
    *    exact by construction;
    *  - a SATURATED group whose retained bottom-k was untouched is also
    *    exact: the gone values all hashed ABOVE u_k (they were never
    *    retained), so the survivors' bottom-k is unchanged;
    *  - a SATURATED group that lost a RETAINED hash cannot subtract —
    *    values between u_k and the discarded tail were never kept — so it
    *    is flagged `needs_rebuild = true` and the caller re-runs
    *    [[kmvBuild]] over the survivors for THOSE GROUPS ONLY (a
    *    group-pruned rebuild, not a corpus pass; the flag frame is one
    *    row per group).
    *
    * Returns (grp, u, rnk, needs_rebuild) — rnk re-ranked over the
    * retained hashes; flagged groups' rows are the trimmed remainder and
    * must not be estimated from. A flagged group that lost its ENTIRE
    * retained bottom-k still surfaces as one (grp, null, null, true)
    * marker row, so the caller's rebuild set never silently misses it.
    * Spec-pinned in LlmSpec. */
  def kmvDelete(sketch: DataFrame, deleted: DataFrame, groupCol: String,
      valueCol: String, k: Int): DataFrame = {
    val delHash = deleted
      .select(col(groupCol).as("grp"), kmvU(col(valueCol)).as("u")).distinct()
    val size = sketch.groupBy(col("grp")).agg(count(lit(1)).as("_n"))
    val hits = sketch.join(delHash, Seq("grp", "u"), "left_semi")
      .groupBy(col("grp")).agg(count(lit(1)).as("_nhit"))
    val flags = size.join(hits, Seq("grp"), "left")
      .select(col("grp"),
        (col("_n") === k && coalesce(col("_nhit"), lit(0L)) > 0L)
          .as("needs_rebuild"))
      .localCheckpoint(eager = false) // kept join + emptied-group union
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("u"))
    val kept = sketch.join(delHash, Seq("grp", "u"), "left_anti")
      .select(col("grp"), col("u"))
      .withColumn("rnk", row_number().over(w))
      .join(broadcast(flags), Seq("grp"))
    // a FLAGGED group can lose its entire retained bottom-k (every
    // retained hash fully gone) — it must still surface, with a null
    // marker row, or the caller would never rebuild it and the group
    // would silently vanish from the maintained sketch. An UNSATURATED
    // group whose values are all gone vanishes legitimately (it truly
    // has no surviving distincts), so only needs_rebuild rows are kept.
    val emptied = flags.filter(col("needs_rebuild"))
      .join(kept.select(col("grp")), Seq("grp"), "left_anti")
      .select(col("grp"), lit(null).cast("double").as("u"),
        lit(null).cast("int").as("rnk"), col("needs_rebuild"))
    kept.unionByName(emptied)
  }

  /** Distinct-count estimate per group from a [[kmvBuild]] sketch: an
    * UNSATURATED group (fewer than k distincts) is counted exactly; a
    * saturated one estimates (k−1)/u_k (the classic unbiased KMV form —
    * the k-th minimum itself is the threshold, not a sample). */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_kept"), max(col("u")).as("u_k"))
      .select(col("grp"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit(k - 1).cast("double") / col("u_k")).as("est_distinct"))

  /** Theta-sketch set algebra over two groups of one [[kmvBuild]] sketch:
    * per group θ = 1 (unsaturated: the sketch IS the set) or u_k
    * (saturated: samples are the k−1 values BELOW θ); the pair estimate
    * uses θ∧ = min(θ_a, θ_b) and counts surviving samples:
    * est = |S ∩ [0, θ∧)| / θ∧ with S the union (resp. intersection) of
    * the two sample sets — the estimator DataSketches publishes for
    * theta sketch union/intersection. Because both groups hash with the
    * same function, a shared value yields the SAME u in both sketches,
    * which is what makes the sample-set intersection meaningful.
    *
    * Everything here runs over ≤ 2k sketch rows — the two θ scalars ride
    * 1×1 cross joins; no corpus access. */
  def kmvSetOps(sketch: DataFrame, k: Int, grpA: String,
      grpB: String): DataFrame = {
    def side(g: String, tag: String): (DataFrame, DataFrame) = {
      val s = sketch.filter(col("grp") === g)
      val theta = s.agg(count(lit(1)).as("n"), max(col("u")).as("uk"))
        .select(when(col("n") < k, lit(1.0)).otherwise(col("uk"))
          .as(s"theta_$tag"))
      val samples = s.crossJoin(theta) // 1×1
        .filter(col("u") < col(s"theta_$tag"))
        .select(col("u").as(s"u_$tag"))
      (theta, samples)
    }
    val (thA, sA) = side(grpA, "a")
    val (thB, sB) = side(grpB, "b")
    val theta = thA.crossJoin(thB) // 1×1
      .select(least(col("theta_a"), col("theta_b")).as("theta"))
    val unionCnt = sA.select(col("u_a").as("u"))
      .union(sB.select(col("u_b").as("u"))).distinct()
      .crossJoin(theta).filter(col("u") < col("theta"))
      .agg(count(lit(1)).as("n_union"))
    val interCnt = sA.join(sB, col("u_a") === col("u_b"), "inner")
      .crossJoin(theta).filter(col("u_a") < col("theta"))
      .agg(count(lit(1)).as("n_inter"))
    theta.crossJoin(unionCnt).crossJoin(interCnt) // 1×1×1
      .select(
        (col("n_union").cast("double") / col("theta")).as("est_union"),
        (col("n_inter").cast("double") / col("theta")).as("est_intersect"))
  }

  // ---- Bottom-k quantile sketch (hash-ranked uniform ROW sample) ----
  // The missing member next to CMS (point frequencies), SpaceSaving (top
  // items), KMV/theta (distincts + set algebra), HLL (mergeable distincts)
  // and bloom (membership): mergeable QUANTILES. Exact per-group order
  // statistics (q_percentiles / q_grouped_quantiles) pay a full per-group
  // sort at every refresh — at 100 TB the maintainable artifact form is a
  // fixed-size mergeable sample, which is what this is.

  /** Row-sample hash: md5 14-hex prefix of the row's UNIQUE key, kept in
    * LONG form — ordering by the raw 56-bit prefix ≡ ordering by
    * [[kmvU]]'s double without the division, so the DuckDB mirror stays
    * integer end to end (the [[Sampling]] digest portability idiom). */
  def qsketchH(key: Column): Column =
    graft.expr.Md5Prefix(key.cast("string"), 14)

  /** Build a bottom-k QUANTILE sketch per group: the k rows whose keys
    * hash smallest, carrying their VALUES. Where [[kmvBuild]] bottom-k's
    * the group's distinct VALUES (a distinct-count sketch), this bottom-k's
    * the group's ROWS with multiplicity — a deterministic uniform
    * k-sample (hash order is independent of the value column), so the
    * sample's q-th order statistic estimates the group's q-th quantile
    * with rank error O(sqrt(q(1-q)/k)) w.h.p. — the classic
    * sample-quantile bound. The estimate is an ACTUAL value of the column
    * (no interpolation arithmetic): bit-portable across engines, which is
    * what lets the DuckDB oracle mirror the WHOLE chain value-exactly
    * (SparkEntry contract rule 4).
    *
    * Mergeable by the same algebra as KMV: the k smallest hashes of a
    * union are among the k smallest of each side, so [[quantileMerge]]
    * over disjoint shard sketches is BIT-IDENTICAL to building over the
    * union corpus (spec-pinned). Scale shape: the per-group bottom-k is a
    * rank window Spark rewrites with WindowGroupLimit — each map
    * partition forwards at most k rows per group into the exchange — and
    * everything downstream of the build touches only sketch-sized frames.
    * Caller contract: `keyCol` is unique per row (it is the sample
    * identity for merge disjointness and [[quantileDelete]] erasure). */
  def quantileBuild(df: DataFrame, groupCol: String, keyCol: String,
      valueCol: String, k: Int): DataFrame =
    bottomK(df.select(col(groupCol).as("grp"), qsketchH(col(keyCol)).as("h"),
      col(valueCol).cast("double").as("v")), k)

  /** THE canonical sample ordering every DuckDB mirror replays: rank by
    * (hash, value). One definition — build, merge, delete and the
    * thresholded trim all share it. */
  private val hashRankW = org.apache.spark.sql.expressions.Window
    .partitionBy(col("grp")).orderBy(col("h"), col("v"))

  /** Bottom-k trim of a (grp, h, v) frame under [[hashRankW]]. */
  private def bottomK(rows: DataFrame, k: Int): DataFrame =
    rows.withColumn("rnk", row_number().over(hashRankW))
      .filter(col("rnk") <= k)

  /** Merge two [[quantileBuild]] sketches over DISJOINT row sets (corpus
    * shards, or an incremental batch against the persisted corpus
    * sketch): per group, re-bottom-k of the concatenation. Bit-identical
    * to building over the union — the incremental-maintenance property;
    * only ≤ 2k rows per group pass through, the corpus is never
    * re-scanned. Associative (spec-pinned), so a stream of batches folds
    * in any grouping. */
  def quantileMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    bottomK(a.select(col("grp"), col("h"), col("v"))
      .union(b.select(col("grp"), col("h"), col("v"))), k)

  /** DELETION over a bottom-k row sample — strictly SIMPLER than
    * [[kmvDelete]]'s reference-count taxonomy, because row keys are
    * unique: removing the doomed keys' hashes from the retained set
    * leaves EXACTLY the bottom-(k−d) of the survivors (any survivor
    * hashing below the old k-th minimum was already retained), which is
    * still a valid uniform sample — just smaller, with
    * sqrt(k/(k−d))-wider rank error. No group can silently lose
    * correctness; the only rail needed is SIZE: a group whose sample
    * shrinks below `minKeep` is flagged `needs_rebuild = true` (estimate
    * error no longer bounded as designed) and the caller re-runs
    * [[quantileBuild]] over that group's survivors only — group-pruned,
    * not a corpus pass. A group whose ENTIRE sample is deleted still
    * surfaces, as one null marker row with the flag set (the
    * [[kmvDelete]] marker discipline) — an emptied quantile sample says
    * nothing about the population being empty, so silently vanishing
    * would lose the group from the maintained sketch while survivors
    * exist. `deleted` carries (groupCol, keyCol) of the doomed rows;
    * hashes join on the same [[qsketchH]]. */
  def quantileDelete(sketch: DataFrame, deleted: DataFrame,
      groupCol: String, keyCol: String, k: Int, minKeep: Int): DataFrame = {
    val delH = deleted
      .select(col(groupCol).as("grp"), qsketchH(col(keyCol)).as("h"))
      .distinct()
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    val kept0 = sketch.join(delH, Seq("grp", "h"), "left_anti")
      .select(col("grp"), col("h"), col("v"))
      .localCheckpoint(eager = false) // ranked output + marker anti-join
    // rank + size flag ride ONE (grp)-keyed exchange; the marker branch
    // is group-cardinality-sized (two distincts + an anti-join)
    val kept = kept0
      .withColumn("rnk", row_number().over(hashRankW))
      .withColumn("needs_rebuild", count(lit(1)).over(wg) < minKeep)
    val emptied = sketch.select(col("grp")).distinct()
      .join(kept0.select(col("grp")).distinct(), Seq("grp"), "left_anti")
      .select(col("grp"), lit(null).cast("long").as("h"),
        lit(null).cast("double").as("v"), lit(null).cast("int").as("rnk"),
        lit(true).as("needs_rebuild")) // 0 survivors < any minKeep >= 1
    kept.unionByName(emptied)
  }

  /** Quantile estimates from a sketch (or any (grp, h, v) sample frame):
    * for each (label, q) in `panel`, the sample value at 1-based rank
    * ⌈q·m⌉ (clamped ≥ 1) in (value, hash) order — the lower-order-
    * statistic definition, ties broken by hash for a deterministic ROW
    * though the published VALUE is tie-invariant. Runs entirely over
    * sketch-sized frames; the explode is per sketch row × |panel|. */
  def quantileEstimate(sketch: DataFrame,
      panel: Seq[(String, Double)]): DataFrame = {
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v"), col("h"))
    val qq = array(panel.map { case (l, q) =>
      struct(lit(l).as("qlabel"), lit(q).as("q")) }: _*)
    sketch
      .withColumn("m", count(lit(1)).over(wg))
      .withColumn("rv", row_number().over(wv))
      .select(col("grp"), col("m"), col("rv"), col("v"),
        explode(qq).as("qq"))
      .filter(col("rv") ===
        greatest(lit(1L), ceil(col("qq").getField("q") * col("m"))))
      .select(col("grp"), col("qq").getField("qlabel").as("qlabel"),
        col("qq").getField("q").as("q"), col("v").as("est_value"))
  }

  /** INVERSE-quantile estimates from a sketch (or any (grp, h, v) sample
    * frame): for each (label, x) in `panel`, the fraction of sample rows
    * with v ≤ x — the empirical-CDF estimate of P(value ≤ x), the rank↔
    * quantile dual of [[quantileEstimate]] ("what fraction of documents
    * are under 512 tokens" against the same maintained sample that
    * answers "what is p90"). Same O(√(q(1−q)/k)) additive error; exact
    * integer comparison counts folded by ONE IEEE division, so the value
    * is bit-portable across engines. */
  def quantileRankOf(sketch: DataFrame,
      panel: Seq[(String, Double)]): DataFrame = {
    val xx = array(panel.map { case (l, x) =>
      struct(lit(l).as("xlabel"), lit(x).as("x")) }: _*)
    sketch.select(col("grp"), explode(xx).as("p"), col("v"))
      .select(col("grp"), col("p").getField("xlabel").as("xlabel"),
        col("p").getField("x").as("x"), col("v"))
      .groupBy(col("grp"), col("xlabel"), col("x"))
      .agg((count(when(col("v") <= col("x"), lit(1))).cast("double")
        / count(lit(1)).cast("double")).as("est_frac_le"))
  }

  /** Tag every row with its per-group QUANTILE BUCKET using sketch
    * boundaries — percentile bucketing WITHOUT a global sort. `qs` are
    * ascending quantiles (e.g. 0.25/0.5/0.75 → quartile buckets 0..3);
    * bucket = the number of boundary values strictly below the row's
    * value. The boundary frame is ≤ |groups|·|qs| rows and BROADCASTS
    * into the one scan of `df`, where the exact alternative (`ntile`
    * over a global per-group sort) pays a full range exchange of the
    * corpus — this is the serving-side shape that makes the sketch an
    * artifact at 100 TB: boundaries are maintained incrementally
    * ([[quantileMergeT]]) and bucketing stays a scan-side map. Bucket
    * boundaries are actual column values ([[quantileEstimate]]), so the
    * whole tagging is engine-portable integer/comparison arithmetic.
    * Rows of a group ABSENT from the sketch (a group born after the last
    * boundary refresh) surface with a NULL bucket — never silently
    * dropped; the caller routes them to a default or triggers the
    * refresh. */
  def quantileBucket(df: DataFrame, sketch: DataFrame, groupCol: String,
      valueCol: String, qs: Seq[Double]): DataFrame = {
    // strictly increasing: a duplicate quantile yields duplicate boundary
    // values and a permanently-empty bucket index
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1) &&
      qs.zip(qs.drop(1)).forall { case (a, b) => a < b },
      s"qs must be strictly increasing in (0,1): $qs")
    require(!df.columns.contains("_bs") && !df.columns.contains("_qb_grp"),
      "column names _bs/_qb_grp are reserved by quantileBucket")
    val est = quantileEstimate(sketch,
      qs.zipWithIndex.map { case (q, i) => (s"b$i", q) })
    val bounds = est.groupBy(col("grp"))
      .agg(array_sort(collect_list(struct(col("q"), col("est_value"))))
        .as("_bs"))
      .withColumnRenamed("grp", "_qb_grp") // never collides with df's own
    df.join(broadcast(bounds), df(groupCol) === bounds("_qb_grp"), "left")
      .withColumn("bucket", aggregate(col("_bs"), lit(0), (acc, b) =>
        acc + when(col(valueCol) > b.getField("est_value"), lit(1))
          .otherwise(lit(0))))
      .drop("_bs", "_qb_grp")
  }

  // ---- Thresholded (θ) quantile forms: the MAINTAINED sketch algebra ----
  // [[quantileMerge]]/[[quantileDelete]] are exact for their documented
  // preconditions (merging BUILD outputs over disjoint rows; a one-shot
  // delete). Arbitrary INTERLEAVINGS of ingest and erasure — the always-on
  // streamed state — need KMV's theta discipline: after an erasure a
  // group's sample covers its population only up to the OLD threshold, so
  // a plain bottom-k merge with a later batch would admit batch rows ABOVE
  // it and silently bias the sample toward new data. The maintained state
  // therefore carries, per group, an explicit EXCLUSIVE hash threshold
  // tau, with the invariant
  //     rows = { live population rows with h < tau }
  // (tau = Long.MaxValue while a group is unsaturated). Every T-operation
  // preserves the invariant EXACTLY (spec-pinned against a brute-force
  // population replay), so the sample is a valid uniform sample of the
  // live population at all times — the theta-sketch union/difference
  // algebra applied to row samples carrying values.

  /** Maintained thresholded sketch: sample `rows` (grp, h, v) plus the
    * per-group exclusive threshold `taus` (grp, tau). A group whose
    * sample empties keeps its taus row — the threshold is what stops a
    * later merge from resurrecting coverage the erasure destroyed. */
  final case class QuantileState(rows: DataFrame, taus: DataFrame)

  /** Build-style trim of a candidate frame (grp, h, v, tau0) already
    * filtered to h < tau0: saturated groups (≥ k+1 candidates) tighten
    * tau to their (k+1)-th smallest hash; the rest keep tau0. Groups
    * with zero candidate rows do NOT appear — callers re-attach them
    * ([[quantileMergeT]]). */
  private def trimT(cand: DataFrame, k: Int): QuantileState = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("h"), col("v"))
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    val t = cand
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k + 1)
      .withColumn("n", count(lit(1)).over(wg))
      .withColumn("tau", when(col("n") === k + 1,
        max(when(col("rnk") === k + 1, col("h"))).over(wg))
        .otherwise(col("tau0")))
    QuantileState(
      t.filter(col("h") < col("tau"))
        .select(col("grp"), col("h"), col("v")),
      t.groupBy(col("grp")).agg(min(col("tau")).as("tau")))
  }

  /** Thresholded build: retain the k+1 smallest hashes per group; if
    * saturated, the (k+1)-th is the exclusive threshold and the k below
    * it are the sample, else tau = Long.MaxValue and the group is
    * complete. Same WindowGroupLimit scale shape as [[quantileBuild]]. */
  def quantileBuildT(df: DataFrame, groupCol: String, keyCol: String,
      valueCol: String, k: Int): QuantileState =
    trimT(df.select(col(groupCol).as("grp"), qsketchH(col(keyCol)).as("h"),
        col(valueCol).cast("double").as("v"),
        lit(Long.MaxValue).as("tau0")), k)

  /** Theta union over DISJOINT live populations: tau0 = min of the two
    * thresholds (a side missing the group is empty with tau = MaxValue),
    * candidates = both samples cut to h < tau0 — each side retains ALL
    * its population's rows below the other's threshold, so the cut set
    * is exactly the union population below tau0 — then re-trimmed to k.
    * Only sketch-sized frames move; the populations are never re-read. */
  def quantileMergeT(a: QuantileState, b: QuantileState,
      k: Int): QuantileState = {
    val taus0 = a.taus.select(col("grp"), col("tau").as("tau_a"))
      .join(b.taus.select(col("grp"), col("tau").as("tau_b")),
        Seq("grp"), "full")
      .select(col("grp"),
        least(coalesce(col("tau_a"), lit(Long.MaxValue)),
          coalesce(col("tau_b"), lit(Long.MaxValue))).as("tau0"))
    val cand = a.rows.unionByName(b.rows)
      .join(taus0, Seq("grp"))
      .filter(col("h") < col("tau0"))
    val trimmed = trimT(cand, k)
    QuantileState(trimmed.rows,
      taus0.join(trimmed.taus.select(col("grp"), col("tau").as("tau_t")),
          Seq("grp"), "left")
        .select(col("grp"), coalesce(col("tau_t"), col("tau0")).as("tau")))
  }

  /** Theta difference: remove the doomed rows' hashes; tau is UNCHANGED
    * (the invariant survives verbatim — every surviving population row
    * below tau is still in the sample). The sample only shrinks; size
    * health is the caller's read-side check ([[quantileFlagsT]]). */
  def quantileDeleteT(st: QuantileState, deleted: DataFrame,
      groupCol: String, keyCol: String): QuantileState = {
    val delH = deleted
      .select(col(groupCol).as("grp"), qsketchH(col(keyCol)).as("h"))
      .distinct()
    QuantileState(st.rows.join(delH, Seq("grp", "h"), "left_anti"), st.taus)
  }

  /** Read-side health: per group, the live sample size and whether it
    * fell below `minKeep` (estimate error no longer bounded as designed —
    * the caller re-ingests that group's survivors; fully-emptied groups
    * still surface, from their retained taus row). */
  def quantileFlagsT(st: QuantileState, minKeep: Int): DataFrame =
    st.taus.join(
        st.rows.groupBy(col("grp")).agg(count(lit(1)).as("n_sample")),
        Seq("grp"), "left")
      .select(col("grp"), coalesce(col("n_sample"), lit(0L)).as("n_sample"),
        (coalesce(col("n_sample"), lit(0L)) < minKeep).as("needs_rebuild"))
}
