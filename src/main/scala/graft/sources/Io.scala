package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch ingestion/egress beyond the canonical parquet tables: schema'd
  * CSV / JSON-lines readers and layout-aware parquet writers.
  *
  * Scale rules encoded here:
  *   - readers take an EXPLICIT schema — schema inference is a full extra
  *     pass over the input (at 100 TB, a second 100 TB scan) and can
  *     silently widen types between runs; `FAILFAST` surfaces corrupt
  *     records instead of nulling them into the pipeline.
  *   - `writePartitioned` lays the output out hive-style so downstream
  *     scans prune partitions at file-listing time (the `PartitionFilters`
  *     line in a plan). Partition columns must be low-cardinality —
  *     date/region-shaped, never ids (millions of directories kill every
  *     object-store listing).
  *   - `writeBucketed` pre-shuffles ONCE at write time; repeated equi-joins
  *     or aggregations on the bucket key then run with no exchange at all
  *     (see PlanSpec's bucketed-join contract). The bucket count is a
  *     cluster-lifetime choice: pick ~(largest expected table / target
  *     task size), same for every table sharing the key. */
object Io {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST")
      .csv(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC round-trip — the other columnar interchange format a data
    * platform meets (Hive-era warehouses). Spark's native vectorized ORC
    * reader/writer; schema travels in the file, predicate pushdown and
    * column pruning work exactly as for parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      bucketCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Incremental partition maintenance — the daily-ingest upsert for a
    * hive-partitioned table WITHOUT a table format: dynamic partition
    * overwrite replaces exactly the partitions present in `df` and leaves
    * every other partition's files untouched, so a day's re-run rewrites
    * one day, not the table. (Static overwrite mode — the default — would
    * TRUNCATE the whole root first: at 100 TB that is the difference
    * between a 100 GB job and a 100 TB one, and an outage if it fails
    * midway.) Readers see the swap per-partition; concurrent writers to
    * DIFFERENT partitions compose. IoSpec pins the untouched-partition
    * survival. */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: String*): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Morton (Z-order) interleave of two non-negative 31-bit keys into one
    * long: bit i of `a` lands at position 2i, bit i of `b` at 2i+1, so
    * z-adjacent rows are close in BOTH dimensions at every scale of the
    * curve. 31 bits each keeps the result in the 62 positive bits — the
    * long stays non-negative, so plain numeric ordering IS curve order.
    * Pure Column composition (62 shift/or terms — static, codegen inlines
    * it); higher input bits are ignored. */
  def zValue(a: Column, b: Column): Column = {
    val ai = a.cast("long"); val bi = b.cast("long")
    (0 until 31).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(ai.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(bi.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Z-order-clustered parquet layout: range-partition + sort by the
    * Morton value of two filter columns, so each output file covers a
    * small rectangle in (c1, c2) space and parquet row-group min/max
    * statistics prune scans filtered on EITHER column — a single-column
    * sort gives perfect pruning on that column and none on the other;
    * Z-order trades a little of the first for most of the second. The
    * write pays one range shuffle; every later selective scan wins.
    * (IoSpec measures the per-file bounding-box shrinkage directly.) */
  def writeZOrdered(df: DataFrame, c1: String, c2: String, path: String,
      nFiles: Int): Unit =
    df.withColumn("__z", zValue(col(c1), col(c2)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * ⌈total bytes / targetFileBytes⌉ files at `dst`. Streaming ingests and
    * dynamic-partition writers accrete thousands of KB-sized files; at
    * 100 TB that is the scan killer nobody budgets for — a task per file,
    * a driver-memory-sized listing, and row groups too small for the
    * min/max statistics to prune anything.
    *
    * Sizing comes from the source's OWN file listing (driver-side, one
    * filesystem call — already paid by any scan of the directory), so the
    * file count tracks the data, not a guess. The rewrite `coalesce`s
    * rather than repartitions: compaction must not pay a shuffle of the
    * whole dataset to fix metadata — uneven-ish files are fine, a second
    * full copy is not. Writes to a NEW directory: object stores have no
    * atomic directory swap, so publish-by-rename (or catalog pointer flip)
    * stays the caller's transaction — compacting in place would lose data
    * on any mid-job failure. Returns the file count written. */
  /** Raw media ingestion: a directory tree of opaque files as
    * (path, modificationTime, length, content binary) rows — Spark's
    * `binaryFile` source, the batch entry point of the multimodal
    * pipeline ([[graft.llm.Multimodal]] consumes the `content` column).
    * `pathGlobFilter` prunes at LISTING time (e.g. `*.jpg` never reads
    * non-matches); `maxBytesPerFile` guards the task heap — binaryFile
    * materializes a whole file per row, so a stray multi-GB object would
    * OOM an executor without the cap. */
  def readBinaryFiles(spark: SparkSession, path: String,
      glob: String = "*", maxFileBytes: Long = 512L * 1024 * 1024): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .filter(col("length") <= maxFileBytes)

  /** Raw text-dump ingestion: one row per LINE (`wholetext=false`) or per
    * FILE (`wholetext=true`, each file one document — the crawl-dump
    * shape the LLM text pipeline starts from; pair with
    * `input_file_name()` for provenance). */
  def readText(spark: SparkSession, path: String,
      wholetext: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholetext.toString).text(path)

  def compactParquet(spark: SparkSession, src: String, dst: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(src)).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(src).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(dst)
    nFiles
  }
}
