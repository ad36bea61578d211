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
  * matter where the range sampler cut. Determinism therefore survives
  * RangePartitioner's reservoir sampling.
  */
object Packing {

  /** One row per input doc: (key, n_tokens, shard). `tokens` must be a
    * non-negative integral column (e.g. [[TextAnalysis.tokenCount]]). */
  def packByBudget(df: DataFrame, key: Column, tokens: Column,
      budget: Long, nParts: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = df.sparkSession
    val n = if (nParts > 0) nParts else spark.sparkContext.defaultParallelism
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
    val intra = ranged.withColumn("intra", coalesce(sum(col("n_tokens")).over(w), lit(0L)))

    // Partition totals: one row per pid — bounded by the partition count,
    // not the data — prefix-scanned on the driver.
    val totals = intra.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive scan: offsets(p) = sum of totals of partitions before p
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _)).toMap
    val offCol = totals.foldLeft(lit(0L)) {
      case (acc, (p, _)) => when(col("pid") === p, lit(offsets(p))).otherwise(acc)
    }

    intra
      .withColumn("shard", floor((col("intra") + offCol) / budget))
      .select(col("pack_key"), col("n_tokens"), col("shard"))
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
