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
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(
          shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i + 1),
        shiftleft(
          shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-order-clustered on (aCol, bCol) into `nFiles` files:
    * range-partition by the z-value (equal-frequency boundaries via
    * Spark's range sampler), sort within each partition, drop the
    * helper column. One full shuffle + local sort — the one-time layout
    * job production tables amortize over every later pruned read. */
  def zOrderWrite(df: DataFrame, aCol: String, bCol: String, path: String,
      nFiles: Int, bits: Int = 16): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1: $nFiles")
    df.withColumn("__z", zValue2(col(aCol), col(bCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
