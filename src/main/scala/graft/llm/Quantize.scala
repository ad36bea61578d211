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

  // --- product quantization (the billion-scale ANN compression: IVF for
  // --- the coarse cells, PQ for the in-cell codes) ---

  /** PQ codebooks: the vector space split into `m` subspaces, one
    * `kCodes`-centroid k-means codebook per subspace, trained with the same
    * bounded driver-local Lloyd's as the IVF coarse quantizer (hash-ordered
    * sample, deterministic; the model is m·k·(dim/m) doubles — KBs). */
  def pqTrain(emb: DataFrame, m: Int, kCodes: Int = 16, seed: Long = 42L,
      maxIter: Int = 10, trainSampleRows: Int = 8192,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    val sample = emb
      .select(col(vecCol).cast("array<double>").as("v"))
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
      .limit(trainSampleRows)
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "pq: empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"pq: dim $dim not divisible by m=$m")
    val dsub = dim / m
    // The m subspace codebooks are independent — train them on the
    // driver's cores in parallel (each Lloyd's run is itself sequential,
    // so every codebook is still bit-deterministic). At m=32 × 256 codes
    // this is the dominant driver cost of the PQ queries (~1 s serial).
    import scala.collection.parallel.CollectionConverters._
    (0 until m).toArray.par.map { j =>
      Similarity.localLloyd(
        sample.filter(_.length == dim).map(_.slice(j * dsub, (j + 1) * dsub)),
        kCodes, maxIter)
    }.toArray
  }

  /** Encode every vector to m small codes via the one-pass codegen'd
    * [[graft.expr.PqEncode]] kernel — scan-side only, codebooks ride as a
    * task-local reference object. */
  def pqEncode(emb: DataFrame, codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol),
      graft.expr.PqEncode(col(vecCol), codebooks).as("codes"))

  /** The Column-space encode [[graft.expr.PqEncode]] replaces — kept as the
    * executable spec of the kernel's argmin semantics (parity-pinned). At
    * m=32 × kCodes=256 this form builds and sorts 8192 struct expressions
    * per row and falls out of whole-stage codegen (measured ~100× slower). */
  def pqEncodeColumns(emb: DataFrame, codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dsub = codebooks.head.head.length
    val v = col(vecCol).cast("array<double>")
    val codeCols = codebooks.zipWithIndex.map { case (cb, j) =>
      val sub = slice(v, j * dsub + 1, dsub)
      val rank = array(cb.zipWithIndex.map { case (c, ci) =>
        val ca = array(c.map(lit(_)).toIndexedSeq: _*)
        val c2 = c.map(x => x * x).sum
        struct((lit(c2) - graft.expr.DotProduct(sub, ca) * 2.0).as("d"),
          lit(ci).as("code"))
      }.toIndexedSeq: _*)
      array_sort(rank).getItem(0).getField("code")
    }
    emb.select(col(idCol), array(codeCols.toIndexedSeq: _*).as("codes"))
  }

  /** Reconstruction from PQ codes: per subspace a literal codebook lookup
    * (`element_at` — codegen'd, no HOF lambda), concatenated back to a full
    * vector. Approximate scoring against reconstructions is the serving
    * path that never touches the original floats. */
  def pqDecode(codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    concat(codebooks.zipWithIndex.map { case (cb, j) =>
      val cbLit = array(cb.map(c => array(c.map(lit(_)).toIndexedSeq: _*)).toIndexedSeq: _*)
      element_at(cbLit, element_at(codes, j + 1) + 1)
    }.toIndexedSeq: _*)
}
