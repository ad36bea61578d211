package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering — the
  * data-skipping trick production lakehouses ship as OPTIMIZE ZORDER BY.
  * A table sorted on one column prunes range predicates on THAT column
  * only; interleaving the bits of two (or more) bounded dimensions into
  * one sort key clusters the data so that EVERY dimension's values are
  * locally narrow per file — parquet min/max stats then skip row groups
  * for a predicate on ANY of the interleaved dimensions. At 100 TB this
  * is the difference between "point/range queries on a second dimension
  * scan the table" and "they read the few files whose stats overlap".
  *
  * The z-value itself is a pure bit-arithmetic expression
  * (shift/and/or — whole-stage codegen, no UDF), deterministic and
  * engine-portable, which is what makes the mapping oracle-able
  * (q_zorder mirrors the unrolled interleave in DuckDB bit ops). The
  * layout write ([[zOrderWrite]]) range-partitions on the z-value and
  * sorts within partitions — the sampling inside repartitionByRange
  * makes file BOUNDARIES nondeterministic (fine: layout is not a value
  * contract; the skipping behavior is spec-pinned by an FS-byte probe
  * instead). */
object Layout {

  /** Morton z-value of two NON-NEGATIVE dimensions, `bits` bits each
    * (values are masked to the bit budget — callers bucket or mod their
    * raw columns first): bit i of `a` lands at position 2i+1, bit i of
    * `b` at 2i. Monotone locality: close (a, b) pairs get close
    * z-values, so clustering by z clusters BOTH dimensions. */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** Morton z-value of k NON-NEGATIVE dimensions, `bits` bits each —
    * production OPTIMIZE ZORDER takes an arbitrary column list, and the
    * bit interleave generalizes round-robin: bit i of dimension j lands
    * at position i·k + (k−1−j), so earlier columns take the more
    * significant slot within each round (for k = 2 this is exactly
    * [[zValue2]]'s layout: bit i of `a` at 2i+1, of `b` at 2i — the
    * q_zorder oracle pin is unchanged by the generalization). The total
    * bit budget bits·k must fit a positive long (≤ 63). Same expression
    * discipline: pure shift/and/or chain, whole-stage codegen, no UDF,
    * bit-for-bit mirrorable in the oracle's integer arithmetic. */
  def zValueN(cols: Seq[Column], bits: Int = 16): Column = {
    val k = cols.size
    require(k >= 2, s"zValueN interleaves at least 2 dimensions: $k")
    require(bits >= 1 && bits * k <= 63,
      s"bit budget bits*k must be in [1, 63]: bits=$bits, k=$k")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftrightunsigned(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * k + (k - 1 - j))
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-order-clustered on (aCol, bCol) into `nFiles` files:
    * range-partition by the z-value (equal-frequency boundaries via
    * Spark's range sampler), sort within each partition, drop the
    * helper column. One full shuffle + local sort — the one-time layout
    * job production tables amortize over every later pruned read. */
  def zOrderWrite(df: DataFrame, aCol: String, bCol: String, path: String,
      nFiles: Int, bits: Int = 16): Unit =
    zOrderWriteN(df, Seq(aCol, bCol), path, nFiles, bits)

  /** [[zOrderWrite]] for k dimensions ([[zValueN]]) — the full OPTIMIZE
    * ZORDER BY (c1, …, ck) layout job. */
  def zOrderWriteN(df: DataFrame, zCols: Seq[String], path: String,
      nFiles: Int, bits: Int = 16): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1: $nFiles")
    df.withColumn("__z", zValueN(zCols.map(col), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
