package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle operators. AQE's skew-join splits oversized
  * SORT-MERGE partitions at runtime, but it cannot help when the operator
  * is an aggregation with one hot key, or when a map-side combine still
  * leaves one reducer with the hot key's whole stream. Explicit salting
  * spreads a hot key over `saltFactor` sub-keys at the cost of replicating
  * the (small) other side / a second aggregation pass. */
object Skew {

  /** Inner equi-join with a salted left side: the large/skewed `left` gets
    * a deterministic uniform salt, the small `right` is replicated once per
    * salt value, so every (key, salt) pair still meets its match — result
    * row set is EXACTLY the plain inner join's.
    *
    * The salt derives from `monotonically_increasing_id` (stable under task
    * retry for a given input split), not from the key — identical hot-key
    * rows spread across all `saltFactor` reducers.
    *
    * Cost model: right side grows ×saltFactor before its shuffle — use for
    * big-skewed ⋈ small-but-over-broadcast-threshold. If right fits a
    * broadcast, `broadcast(right)` beats salting outright. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
          salted(leftKey) === replicated(rightKey))
      .drop("__salt")
  }

  /** Two-phase aggregation for a skewed grouping key: partial-aggregate on
    * (key, salt) first — the hot key's stream splits across saltFactor
    * reducers — then merge the partials per key. `aggs` must be
    * decomposable (sum/count/min/max: merge with the same fn; avg must be
    * expressed as sum+count by the caller). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int = 16): DataFrame =
    df.withColumn("__salt",
        pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_" + valueCol),
        sum(col("__pcnt")).as("n_rows"))

  /** Key-skew diagnostic: ONE row — (n_keys, n_rows, max_share,
    * top`K`_share, gini) of the key's row-count distribution — the report
    * that decides whether a join/agg on this key needs [[saltedEquiJoin]]
    * / [[saltedSumCount]] / AQE skew handling before it burns a cluster.
    * Gini uses the rank formula over ASCENDING counts (ties broken by
    * key for a deterministic ranking):
    *   G = 2·Σ(i·cᵢ) / (n·Σcᵢ) − (n+1)/n
    * — exact integer sums, two IEEE divisions and one subtract,
    * engine-mirrored. 0 = uniform keys, → 1 = one key owns everything.
    *
    * Scale shape: one count aggregation on the key (map-side combine),
    * then everything runs on the per-key count frame — but "over keys,
    * not rows" bounds NOTHING for the workloads a skew report exists for
    * (billions of distinct user ids), so the ascending rank comes from
    * [[graft.ops.Prefix.globalOrder]]'s two-phase range-partitioned
    * prefix, never a single-partition rank window; the key total rides
    * back as a literal from the same bounded (pid, totals) driver scan
    * instead of a second global count window. */
  def skewReport(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
    // (c, key) is a total order: keys are unique after the groupBy
    val ord = graft.ops.Prefix.globalOrder(
      counts, Seq(col("c"), col(key)), col("c"))
    val ranked = ord.frame.withColumnRenamed("__rn", "i")
    ranked.agg(
        count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        max(col("c")).as("_maxc"),
        sum(col("i") * col("c")).as("_s2"),
        sum(when(col("i") > lit(ord.nRows) - topK, col("c"))
          .otherwise(0L)).as("_topc"))
      .select(col("n_keys"), col("n_rows"),
        (col("_maxc").cast("double") / col("n_rows").cast("double"))
          .as("max_share"),
        (col("_topc").cast("double") / col("n_rows").cast("double"))
          .as(s"top${topK}_share"),
        ((lit(2L) * col("_s2")).cast("double") /
          (col("n_keys") * col("n_rows")).cast("double") -
          (col("n_keys") + 1).cast("double") / col("n_keys").cast("double"))
          .as("gini"))
  }
}
