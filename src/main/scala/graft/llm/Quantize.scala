package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8-style) embedding quantization: the storage/serving
  * compression step of a large ANN pipeline — 4 bytes/dim float32 → 1
  * byte/dim code + 2 doubles of per-vector scale metadata (≈4× smaller
  * index, the first lever before product quantization).
  *
  * Per-vector min/max codebook: code_i = floor((x_i − vmin) · L / (vmax −
  * vmin)) clamped to [0, L−1+1] (the max element lands exactly on L).
  * `floor` (not round) keeps the bucketing unambiguous across engines —
  * halfway-rounding semantics differ between runtimes; floor on IEEE
  * doubles with an identical expression tree is bit-reproducible.
  *
  * Everything is a narrow scan-side projection over codegen'd array HOFs —
  * no shuffle, no UDF; at 100 TB this runs at parquet-scan speed and the
  * output is columnar-friendly (fixed-length code arrays).
  */
object Quantize {

  private val Levels = 255

  /** (id, vmin, vmax, codes array<int>). Degenerate vectors (vmax = vmin)
    * quantize to all-zero codes rather than NaN. */
  def scalarQuantize(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val vmin = array_min(v)
    val vmax = array_max(v)
    val code = (x: Column) =>
      least(floor((x - vmin) * Levels / (vmax - vmin)), lit(Levels)).cast("int")
    emb.select(
      col(idCol),
      vmin.as("vmin"),
      vmax.as("vmax"),
      when(vmax === vmin, transform(v, _ => lit(0)))
        .otherwise(transform(v, code)).as("codes"))
  }

  /** Dequantized reconstruction (bucket midpoint) — for measuring
    * quantization error or serving approximate scores without the floats. */
  def dequantize(quantized: DataFrame, codesCol: String = "codes"): DataFrame =
    quantized.withColumn("approx",
      transform(col(codesCol), c =>
        col("vmin") + (c.cast("double") + 0.5) * (col("vmax") - col("vmin")) / Levels))
}
