package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training shards
  * in a deterministic key order — the step between a curated corpus and a
  * training run (each shard ≈ one context-window build / output file).
  *
  * Semantics (streaming greedy pack): documents are laid out end-to-end in
  * `key` order; a document whose span STARTS inside shard i belongs to
  * shard i, i.e. `shard = floor(prefix_exclusive_tokens / budget)`. Shards
  * may overflow by at most one document — the standard contract when
  * documents are not split across shards.
  *
  * Scale design: the naive formulation is a global running sum — a window
  * with no PARTITION BY, which Spark executes on a SINGLE partition (the
  * classic 100 TB killer). Instead the prefix sum is two-phase, the same
  * shape every distributed scan/prefix primitive uses:
  *
  *   1. range-repartition by key (so partition p holds a contiguous key
  *      range, p < q ⇒ all keys in p < all keys in q);
  *   2. per-partition running sums in parallel (window PARTITIONed by the
  *      range-partition id);
  *   3. collect ONE row per partition (the partition totals — a few KB at
  *      any scale), prefix-scan them on the driver, and add the offsets
  *      back as a broadcast join.
  *
  * The result is independent of the partition count/boundaries: offsets
  * telescope, so `off(p) + intra` equals the global exclusive prefix no
  * matter where the range sampler cut — PROVIDED both the totals job and
  * the output job see the SAME cut. RangePartitioner seeds its reservoir
  * sample per RDD id, so two separate actions over the same lineage can
  * draw different boundaries; the ranged frame is therefore
  * `localCheckpoint`ed (eager) before the totals collect. That both
  * truncates the lineage — there is no recompute path that could re-sample
  * — and makes the second job read the materialized blocks, so every pid
  * in the offset map is the pid the output rows carry. (A plain persist
  * would still leave a re-sample path open on block eviction; checkpoint
  * loss fails the job instead of silently mis-sharding.)
  *
  * The per-partition offsets rejoin as a broadcast-hash-joined (pid →
  * offset) frame, NOT a literal when-chain: a chain is O(P) deep in the
  * expression tree, and at 10⁴–10⁵ range partitions it blows the 64 KB
  * codegen method limit and degrades analysis to ~O(P²). The broadcast
  * build side is one row per partition — KBs at any scale.
  */
object Packing {

  /** Phase 1+2 of the prefix sum: range-repartition on `key`, then the
    * per-partition exclusive running sum (window PARTITIONed by the range
    * pid — never a global window). Exposed for plan inspection; callers
    * want [[packByBudget]], which checkpoints this before acting twice. */
  private[graft] def intraPartitionPrefix(df: DataFrame, key: Column,
      tokens: Column, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = df
      .select(key.as("pack_key"), tokens.cast("long").as("n_tokens"))
      .repartitionByRange(n, col("pack_key"))
      .withColumn("pid", spark_partition_id())
    // Per-partition EXCLUSIVE running sum. The window re-shuffles by pid —
    // hash on ≤ n keys — keeping the whole prefix computation declarative;
    // rows within a pid partition stay ordered by the window's ORDER BY.
    val w = Window.partitionBy(col("pid")).orderBy(col("pack_key"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.withColumn("intra",
      coalesce(sum(col("n_tokens")).over(w), lit(0L)))
  }

  /** Phases 1-3 complete: (pack_key, n_tokens, gpos) with gpos the GLOBAL
    * exclusive token prefix in key order — the primitive both packers
    * derive from. See the class doc for why the ranged frame checkpoints
    * before the totals collect. */
  private def globalPrefix(df: DataFrame, key: Column, tokens: Column,
      nParts: Int): DataFrame = {
    val spark = df.sparkSession
    val n = if (nParts > 0) nParts else spark.sparkContext.defaultParallelism
    // Freeze the range cut: one materialization serves both the totals
    // collect below and the caller's action (see class doc).
    val intra = intraPartitionPrefix(df, key, tokens, n).localCheckpoint()

    // Partition totals: one row per pid — bounded by the partition count,
    // not the data — prefix-scanned on the driver.
    val totals = intra.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive scan: offsets(p) = sum of totals of partitions before p
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _))
    val offDf = spark.createDataFrame(offsets.toSeq)
      .toDF("pid", "pack_pid_offset")

    intra
      .join(broadcast(offDf), Seq("pid"))
      .withColumn("gpos", col("intra") + col("pack_pid_offset"))
      .select(col("pack_key"), col("n_tokens"), col("gpos"))
  }

  /** One row per input doc: (key, n_tokens, shard). `tokens` must be a
    * non-negative integral column (e.g. [[TextAnalysis.tokenCount]]). */
  def packByBudget(df: DataFrame, key: Column, tokens: Column,
      budget: Long, nParts: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    globalPrefix(df, key, tokens, nParts)
      .withColumn("shard", floor(col("gpos") / budget))
      .select(col("pack_key"), col("n_tokens"), col("shard"))
  }

  /** Context-window packing, the GPT-style pretraining layout: all tokens
    * laid end-to-end in `key` order and CUT every `context` tokens —
    * documents MAY span windows (contrast [[packByBudget]], whose docs
    * never split). Returns per doc (pack_key, n_tokens, gpos, seq_id,
    * seq_off): the training sequence the doc STARTS in and its token
    * offset there — with n_tokens, exactly what a loader needs to place
    * every span (a doc occupies seq_id:seq_off onward, rolling into
    * subsequent sequences). All integer arithmetic off the same two-phase
    * global prefix — no global window, repartition-invariant. */
  def packWindows(df: DataFrame, key: Column, tokens: Column,
      context: Long, nParts: Int = 0): DataFrame = {
    require(context > 0, s"context must be positive: $context")
    globalPrefix(df, key, tokens, nParts)
      .withColumn("seq_id", floor(col("gpos") / context))
      .withColumn("seq_off", col("gpos") - col("seq_id") * context)
      .select(col("pack_key"), col("n_tokens"), col("gpos"),
        col("seq_id"), col("seq_off"))
  }

  /** Deterministic epoch shuffle: a reproducible global permutation of
    * the corpus per training epoch — `shuffle_pos` = rank of
    * md5(key:epoch), so epoch e's order is pseudorandom, stable across
    * reruns, and different from epoch e+1's, with NO mutable shuffle
    * state (the pretraining-loader contract: any worker can recompute
    * any epoch's order from the keys alone).
    *
    * Scale shape: the same three-phase machinery as the packers —
    * range-partition by the hash, per-partition exclusive window count,
    * bounded (pid, total) driver scan — never ONE global window over the
    * corpus. md5 ties break on the key, so the permutation is total.
    * PRECONDITION: `key` must be unique (duplicate keys collide in the
    * tie-break and their relative order is arbitrary). */
  def epochShuffle(df: DataFrame, key: Column, epoch: Int,
      nParts: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val n = if (nParts > 0) nParts else spark.sparkContext.defaultParallelism
    val ranged = df
      .select(key.as("shuffle_key"),
        md5(concat(key.cast("string"), lit(s":e$epoch"))).as("ord"))
      .repartitionByRange(n, col("ord"), col("shuffle_key"))
      .withColumn("pid", spark_partition_id())
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("ord"), col("shuffle_key"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // freeze the range cut before the totals collect (the globalPrefix
    // re-sample rationale)
    val intra = ranged
      .withColumn("intra", coalesce(count(lit(1)).over(w), lit(0L)))
      .localCheckpoint()
    val totals = intra.groupBy(col("pid"))
      .agg(count(lit(1)).as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _))
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "off")
    intra.join(broadcast(offDf), Seq("pid"))
      .select(col("shuffle_key"),
        (col("intra") + col("off")).as("shuffle_pos"))
  }

  /** Shard fill-rate report over a [[packByBudget]] layout — the loader
    * diagnostic: docs never split, so a doc STARTING before a shard
    * boundary spills past it and shard token sums wander around the
    * budget; `fill_share` (one IEEE division over the exact integer sum)
    * says by how much, and whether the budget needs headroom. One
    * (shard)-keyed aggregation over the already-packed frame. */
  def packEfficiency(packed: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    packed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
      .withColumn("fill_share",
        col("shard_tokens").cast("double") / lit(budget.toDouble))
  }

  /** Curriculum sharding: lay the corpus out in SCORE order (easy → hard,
    * or hard → easy — the caller's score polarity decides) and cut
    * token-budget shards along that order, so a training loader walking
    * shard 0, 1, 2… replays the curriculum. This is [[packByBudget]] with
    * the ordering key = (score, id): the same two-phase range-partitioned
    * prefix sum — never a global window — just sorted by the model
    * signal (e.g. [[QualityProbe.score]]) instead of the id.
    *
    * `scores` is (idCol, score). Returns (idCol, score, n_tokens, shard);
    * ties in score break by id, so the layout is total and
    * repartition-invariant. */
  def curriculumShards(docs: DataFrame, scores: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val joined = docs.join(scores.select(col(idCol), col("score")), Seq(idCol))
    packByBudget(joined, struct(col("score"), col(idCol)),
      TextAnalysis.tokenCount(col(textCol)), budget)
      .select(col("pack_key").getField(idCol).as(idCol),
        col("pack_key").getField("score").as("score"),
        col("n_tokens"), col("shard"))
  }

  /** The end-to-end export: curated corpus → token-budget shards → one
    * parquet directory per shard (hive-partitioned on `shard`, so a
    * training loader reads shard k with partition pruning, no full-corpus
    * listing). This is the last step of the pipeline: curation decides
    * WHAT trains, packing decides WHERE it lands. */
  def exportShards(curated: DataFrame, outPath: String, budget: Long,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val shards = packByBudget(curated,
      col(idCol), TextAnalysis.tokenCount(col(textCol)), budget)
      .withColumnRenamed("pack_key", idCol)
    graft.sources.Io.writePartitioned(
      curated.join(shards.select(col(idCol), col("shard")), Seq(idCol)),
      outPath, "shard")
  }
}
