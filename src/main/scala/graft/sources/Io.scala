package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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

  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      bucketCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
}
