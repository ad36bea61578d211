package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for corpus curation.
  *
  * `df.sample()` is seeded per-partition: the kept set changes whenever the
  * partitioning does, which makes curation runs non-reproducible across
  * cluster sizes and unverifiable across engines. Here the keep decision is
  * a pure function of the ROW KEY: hash the key with md5 and keep rows
  * whose 16-bit digest prefix falls below round(fraction · 2¹⁶). Any
  * engine that can md5 a string reproduces the exact sample — the property
  * a 100 TB curation audit actually needs — and the sample is stable under
  * repartitioning, retries, and incremental reruns (a row's fate never
  * changes, so downstream caches stay valid).
  *
  * Pure narrow projection/filter — no shuffle, no RNG state. */
object Sampling {

  /** 4-hex-digit keep threshold for a fraction in [0, 1). 16-bit
    * granularity: the realized rate is exact at multiples of 1/65536.
    * Clamped to ffff: fractions ≥ ~0.999992 would round to 65536, whose
    * 5-char "10000" sorts lexicographically BELOW most 4-char digests and
    * would invert the split to near-0% instead of near-100%. */
  def digestThreshold(fraction: Double): String = {
    require(fraction >= 0 && fraction < 1, s"fraction must be in [0,1): $fraction")
    f"${math.min(math.round(fraction * 65536), 65535L)}%04x"
  }

  /** Keep predicate for a key column at the given fraction. */
  def keepByDigest(key: Column, fraction: Double): Column =
    substring(md5(key.cast("string")), 1, 4) < lit(digestThreshold(fraction))

  /** Deterministic Bernoulli sample keyed on `key`. */
  def sampleByKey(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(keepByDigest(key, fraction))

  /** Deterministic stratified sample: per-stratum fractions; strata absent
    * from the map are dropped. Thresholds are inlined as a CASE over the
    * stratum column — still a pure scan-side filter. */
  def stratified(df: DataFrame, strata: Column, key: Column,
      fractions: Map[String, Double]): DataFrame = {
    val thresh = fractions.toSeq.sortBy(_._1).foldLeft(lit("0000")) {
      case (acc, (s, f)) => when(strata === s, lit(digestThreshold(f))).otherwise(acc)
    }
    df.filter(substring(md5(key.cast("string")), 1, 4) < thresh)
  }

  /** Deterministic weighted sample without replacement, k rows, inclusion
    * probability ∝ `weight` (Efraimidis–Spirakis A-Res: keep the k
    * smallest −ln(u)/w keys, u a uniform hash of the row key). The same
    * digest-derived u makes the drawn SET a pure function of the data —
    * reproducible across engines and partitionings like [[sampleByKey]].
    * Plan: scan-side key computation + TakeOrdered — no shuffle beyond the
    * top-k merge. Weights must be strictly positive. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int): DataFrame = {
    val u = (graft.expr.Md5Prefix(key.cast("string"), 8) + lit(1L))
      .cast("double") / lit(4294967297.0)
    val skey = -log(u) / weight.cast("double")
    df.filter(weight.cast("double") > 0) // null/non-positive weight = weight 0: never drawn
      .withColumn("__skey", skey)
      .orderBy(col("__skey"), key)
      .limit(k)
      .drop("__skey")
  }

  /** Deterministic train/val/test assignment — the split every training
    * pipeline needs, with the same digest discipline as [[sampleByKey]]:
    * a row's split is a pure function of its KEY, so it never migrates
    * across reruns, repartitionings, or corpus growth (new rows slot in
    * without reshuffling old ones — contrast a global `randomSplit`, whose
    * assignment changes whenever the data or partitioning does, silently
    * leaking held-out rows into train). Fractions bucket the 16-bit digest
    * prefix: [0, t_train) → train, [t_train, t_train+t_val) → val, rest →
    * test. Pure scan-side projection; partition the OUTPUT by `split` for
    * downstream reads. */
  def assignSplit(df: DataFrame, key: Column, trainFrac: Double,
      valFrac: Double): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      s"fractions must be non-negative and sum below 1: $trainFrac + $valFrac")
    val p = substring(md5(key.cast("string")), 1, 4)
    df.withColumn("split",
      when(p < lit(digestThreshold(trainFrac)), "train")
        .when(p < lit(digestThreshold(trainFrac + valFrac)), "val")
        .otherwise("test"))
  }

  /** HRW rebalance report: the minimal-disruption property of
    * [[assignShards]] published as numbers — assignments before and
    * after adding `newShard` computed in ONE scan (both are pure
    * projections), with the moved share (expected ≈ 1/(n+1)) and the
    * zero-moves-between-old-shards flag that distinguishes rendezvous
    * hashing from mod-k (where ~all rows move). The go-ahead evidence
    * before growing a 100 TB layout. */
  def shardRebalanceReport(df: DataFrame, key: Column,
      shards: Seq[String], newShard: String): DataFrame = {
    val both = assignShards(
        assignShards(df, key, shards).withColumnRenamed("shard", "shard_before"),
        key, shards :+ newShard)
      .withColumnRenamed("shard", "shard_after")
    both.agg(count(lit(1)).as("n_total"),
        sum(when(col("shard_before") =!= col("shard_after"), 1L)
          .otherwise(0L)).as("n_moved"),
        sum(when(col("shard_before") =!= col("shard_after") &&
            col("shard_after") =!= newShard, 1L)
          .otherwise(0L)).as("n_moved_between_old"))
      .withColumn("moved_share",
        col("n_moved").cast("double") / col("n_total").cast("double"))
      .withColumn("minimal_disruption", col("n_moved_between_old") === 0L)
  }

  /** Leakage-free train/val/test split: near-duplicate CLUSTERS assign
    * atomically (every member of a component draws the SAME split from
    * the component's min-id key), docs outside any cluster split by
    * their own id — so no near-duplicate pair ever straddles train and
    * test, the eval-hygiene failure ordinary per-doc splits commit
    * (a test doc whose near-copy sits in train scores as memorization).
    * `clusterLabels` is [[graft.llm.Dedup.clusters]] output; the split
    * itself is the [[assignSplit]] digest discipline on the coalesced
    * key — reruns and corpus growth preserve membership. */
  def assignSplitLeakFree(docs: DataFrame, clusterLabels: DataFrame,
      trainFrac: Double, valFrac: Double,
      idCol: String = "doc_id"): DataFrame =
    assignSplit(docs.join(clusterLabels, Seq(idCol), "left"),
      coalesce(col("cluster_id"), col(idCol)), trainFrac, valFrac)
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("split_key"),
        col("split"))

  /** Deterministic k-fold assignment (cross-validation): fold = 16-bit
    * digest prefix mod k — same key-pure discipline as [[assignSplit]], so
    * fold membership survives reruns and corpus growth. Fold sizes are
    * uniform to within the 2¹⁶-bucket granularity. */
  def assignFold(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k > 1, s"k must exceed 1: $k")
    df.withColumn("fold",
      pmod(graft.expr.Md5Prefix(key.cast("string"), 4).cast("int"),
        lit(k)))
  }

  /** Rendezvous (HRW, Thaler & Ravishankar 1996) shard assignment: each
    * row goes to the shard with the highest digest weight md5(shard:key).
    * THE property row caps/mod-hashing lack: when a shard is added,
    * ONLY rows whose new-shard weight wins move — expected 1/(n+1) of the
    * corpus, all of it TO the new shard, none between old shards
    * (spec-pinned) — so growing a 100 TB layout from n to n+1 shards
    * rewrites one shard's worth of data, not everything. Key-pure like
    * every assignment here (same discipline as [[assignSplit]]); pure
    * scan-side projection, |shards| digests per row, no shuffle.
    *
    * Weights encode as w·64 + shardIndex so the argmax is a plain long
    * `greatest` on both engines (ties — 2⁻³² per pair — break to the
    * LATER shard in the list, deterministically). Max 64 shards per call;
    * compose hierarchically beyond. */
  def assignShards(df: DataFrame, key: Column, shards: Seq[String]): DataFrame = {
    require(shards.nonEmpty && shards.size <= 64,
      s"1..64 shards: ${shards.size}")
    require(shards.distinct.size == shards.size, "shard names must be unique")
    val encoded = shards.zipWithIndex.map { case (s, i) =>
      graft.expr.Md5Prefix(concat(lit(s), lit(":"), key.cast("string")), 8) *
        lit(64L) + lit(i.toLong)
    }
    val best =
      if (encoded.size == 1) encoded.head else greatest(encoded: _*)
    df.withColumn("shard",
      element_at(array(shards.map(lit(_)): _*),
        (best % 64).cast("int") + 1))
  }

  /** Deterministic per-group cap: keep at most `cap` rows per group, chosen
    * by md5-digest rank of the row key — source balancing for a training
    * mixture (one viral crawl must not dominate the mix). The kept set is
    * a pure function of (group, key): stable under repartitioning and
    * retries, and a group's survivors only change when THAT group grows.
    * One shuffle on the group key; the rank window sorts each group's
    * partition slice, never the corpus. A pathologically hot group makes
    * that slice big — cap the input with [[sampleByKey]] first if a single
    * group approaches executor memory. */
  def capPerGroup(df: DataFrame, group: Column, key: Column, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cap > 0, s"cap must be positive: $cap")
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(group).orderBy(md5(key.cast("string")), key)))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Token-budget mixture sampling: per-group COST budgets instead of
    * [[capPerGroup]]'s row caps — the form a training-mix spec actually
    * takes ("20 B tokens of web, 5 B of code"). Rows are consumed in
    * md5-digest order of `key` (the same key-pure discipline as every
    * sampler here: the kept set is a function of the data, not the
    * partitioning, and a group's take only changes when THAT group
    * changes); a row is kept while the group's running cost, INCLUDING the
    * row, stays within its budget. Groups absent from `budgets` are
    * dropped.
    *
    * Scale design: the running cost is a per-group prefix sum, and the
    * naive window — PARTITION BY group ORDER BY digest — sends an entire
    * group to ONE task, which at 100 TB means one executor sorting a
    * multi-TB source. Instead this runs [[graft.llm.Packing]]'s two-phase
    * prefix sum GENERALIZED to groups: range-repartition on (group,
    * digest) so each task holds a contiguous slice of one or a few
    * groups, per-(pid, group) running sums in parallel, then ONE bounded
    * collect of the (pid, group) slice totals — at most partitions ×
    * groups rows, KBs for any real mixture — prefix-scanned per group on
    * the driver and broadcast back. The ranged frame is localCheckpoint'ed
    * before the totals collect for the same reason Packing pins its cut:
    * RangePartitioner re-samples per action, and the offsets are only
    * valid against the cut they were computed from.
    *
    * Returns the kept rows with the group/cost columns plus `cum_cost`
    * (the inclusive running cost — the audit trail of WHY each row fit). */
  /** Temperature-sampling budgets (the multilingual-LM mixture rule:
    * sample source s proportionally to n_s^α, α < 1 upweighting small
    * sources): per-group budgets for [[sampleToBudget]] from the groups'
    * own cost totals, totalBudget · w_g / Σw with w = cost^(1/2^halvings).
    *
    * α is restricted to 1/2^k on purpose: IEEE sqrt is CORRECTLY ROUNDED
    * (a composition of k sqrts is bit-identical on every engine) while
    * pow(x, α) is libm-dependent — the same reason BM25 quantizes its one
    * ln. The sqrt'd weights floor onto the 1e-6 grid and everything after
    * is exact integer arithmetic (sum, product, floor division), so the
    * budget map is engine-portable bit-for-bit.
    *
    * Driver state is one row per group (the mixture table — bounded); the
    * totals job is one partial-aggregating scan. */
  def temperatureBudgets(df: DataFrame, group: Column, cost: Column,
      totalBudget: Long, halvings: Int = 1): Map[String, Long] = {
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    require(halvings >= 1 && halvings <= 6, s"halvings in [1,6]: $halvings")
    val tots = df.select(group.as("g"), cost.cast("long").as("c"))
      .groupBy(col("g")).agg(sum(col("c")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(tots.nonEmpty, "temperatureBudgets: empty input")
    require(tots.forall(_._2 >= 0),
      s"negative group cost totals (sqrt would yield NaN -> silent 0 budgets): " +
        tots.filter(_._2 < 0).mkString(", "))
    val sMicro = tots.map { case (g, t) =>
      val w = (1 to halvings).foldLeft(t.toDouble)((x, _) => math.sqrt(x))
      g -> math.floor(w * 1e6).toLong
    }
    val total = sMicro.map(_._2).sum
    require(total > 0,
      "all group cost totals are zero — no weight mass to split budgets over")
    sMicro.map { case (g, s) => g -> (totalBudget * s) / total }.toMap
  }

  def sampleToBudget(df: DataFrame, group: Column, key: Column, cost: Column,
      budgets: Map[String, Long], nParts: Int = 0,
      withBudget: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgets.nonEmpty, "budgets must be non-empty")
    require(budgets.values.forall(_ >= 0), s"budgets must be non-negative: $budgets")
    val spark = df.sparkSession
    val n = if (nParts > 0) nParts else spark.sparkContext.defaultParallelism
    val budgetCol = budgets.toSeq.sortBy(_._1).foldLeft(lit(-1L)) {
      case (acc, (g, b)) => when(col("mix_group") === g, lit(b)).otherwise(acc)
    }
    val ranged = df
      .select(group.as("mix_group"), key.as("mix_id"), cost.cast("long").as("cost"))
      .filter(col("mix_group").isin(budgets.keys.toSeq: _*))
      .withColumn("mix_key", md5(col("mix_id").cast("string")))
      .repartitionByRange(n, col("mix_group"), col("mix_key"))
      .withColumn("pid", spark_partition_id())
    val w = Window.partitionBy(col("pid"), col("mix_group"))
      .orderBy(col("mix_key"), col("mix_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // Freeze the range cut (see Packing): offsets below are only valid for
    // the pid assignment this exact materialization produced.
    val intra = ranged
      .withColumn("intra", coalesce(sum(col("cost")).over(w), lit(0L)))
      .localCheckpoint()
    // Bounded driver state: one row per (pid, group) slice — partitions ×
    // groups, never data-sized.
    val totals = intra.groupBy(col("pid"), col("mix_group"))
      .agg(sum(col("cost")).as("tot"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets = totals.groupBy(_._2).toSeq.flatMap { case (g, slices) =>
      val sorted = slices.sortBy(_._1)
      sorted.map(_._1).zip(sorted.map(_._3).scanLeft(0L)(_ + _))
        .map { case (pid, off) => (pid, g, off) }
    }
    val offDf = spark.createDataFrame(offsets).toDF("pid", "mix_group", "mix_off")
    val kept = intra
      .join(broadcast(offDf), Seq("pid", "mix_group"))
      .withColumn("cum_cost", col("mix_off") + col("intra") + col("cost"))
      .filter(col("cum_cost") <= budgetCol)
    // withBudget publishes the SAME column the filter enforced (not a
    // caller-side reconstruction that could drift from it) — the audit
    // trail for derived-budget mixtures like temperatureBudgets.
    if (withBudget)
      kept.select(col("mix_id"), col("mix_group"), col("cost"),
        col("cum_cost"), budgetCol.as("budget"))
    else
      kept.select(col("mix_id"), col("mix_group"), col("cost"), col("cum_cost"))
  }

  /** DoReMi-style probe-driven mixture reweighting (Xie et al., "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    * NeurIPS 2023): iterate the budgeted mixture sampler with per-source
    * weights updated multiplicatively from a proxy model's per-source
    * signal — here [[QualityProbe]] scores, quality-seeking (sources
    * whose SAMPLED docs score above the round's minimum mean gain
    * weight; DoReMi's excess-loss direction is the same update with the
    * sign flipped into the signal).
    *
    * The fifth bounded-driver-state trainer ([[Kmeans]] / [[graft.llm.Bpe]] /
    * [[QualityProbe]] / [[graft.llm.Unigram]] discipline): driver state
    * is the per-source mixture table; each round is one [[sampleToBudget]]
    * pass (grouped two-phase prefix, never a per-source global window)
    * plus one partial-aggregating join of the kept ids against the
    * score frame, collected at sources-count rows.
    *
    * Portability discipline: scores floor once onto the 1e-6 grid;
    * per-round means, the exponentiated-gradient factor
    * `1e6 + ⌊η·excess/1e6⌋`, weight products, and budget splits are all
    * exact integer arithmetic (floorDiv ≡ DuckDB's `//`) — the whole
    * trajectory is engine-portable bit-for-bit, so the oracle unrolls
    * the rounds as CTE stacks (the q_bpe_merges technique).
    *
    * Returns the full trajectory: one row per (round, source) with the
    * round's budget, kept-row count, kept mean score (micro), and the
    * post-update weight (micro). */
  def reweightMixture(docs: DataFrame, scores: DataFrame, totalBudget: Long,
      rounds: Int = 3, etaMicro: Long = 500000L,
      groupCol: String = "source", idCol: String = "doc_id",
      costCol: Column = null): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    require(etaMicro >= 0, s"etaMicro must be >= 0: $etaMicro")
    val spark = docs.sparkSession
    import spark.implicits._
    val cost = Option(costCol).getOrElse(TextAnalysis.tokenCount(col("text")))
    // bounded driver state: one row per source
    val groups = docs.select(col(groupCol)).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    require(groups.nonEmpty, "reweightMixture: empty input")
    val base = docs
      .select(col(groupCol), col(idCol), cost.cast("long").as("mix_cost"))
      .localCheckpoint(eager = false)
    val sm = scores
      .select(col(idCol),
        floor(col("score") * lit(1e6)).cast("long").as("s_micro"))
      .localCheckpoint(eager = false) // re-read every round, built once
    var weights = groups.map(_ -> 1000000L).toMap
    val out = Seq.newBuilder[(Int, String, Long, Long, Long, Long)]
    for (r <- 1 to rounds) {
      val totW = weights.values.sum
      val budgets = weights.map { case (g, w) => g -> (totalBudget * w) / totW }
      val kept = sampleToBudget(base, col(groupCol), col(idCol),
        col("mix_cost"), budgets)
      val stats = kept.select(col("mix_id").as(idCol), col("mix_group"))
        .join(sm, Seq(idCol))
        .groupBy(col("mix_group"))
        .agg(count(lit(1)).as("cnt"), sum(col("s_micro")).as("sm"))
        .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2)))
        .toMap
      val means = groups.map { g =>
        val (cnt, s) = stats.getOrElse(g, (0L, 0L))
        g -> (if (cnt == 0) 0L else Math.floorDiv(s, cnt))
      }.toMap
      val minM = means.values.min
      val newW = groups.map { g =>
        val factor =
          1000000L + Math.floorDiv(etaMicro * (means(g) - minM), 1000000L)
        g -> Math.floorDiv(weights(g) * factor, 1000000L)
      }.toMap
      groups.foreach { g =>
        out += ((r, g, budgets(g), stats.getOrElse(g, (0L, 0L))._1,
          means(g), newW(g)))
      }
      weights = newW
    }
    out.result().toDF("round", groupCol, "budget", "n_kept",
      "mean_score_micro", "weight_micro")
  }
}
