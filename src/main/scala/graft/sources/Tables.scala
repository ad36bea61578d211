package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Canonical parquet table loader for the harness star schema + event/LLM
  * tables (TESTDATA.md).
  *
  * Timestamp normalization — every generation of the driver's testdata is
  * mapped to the SAME session-UTC instant type (`TIMESTAMP`, i.e. ltz), so
  * the whole catalog sees one ts type regardless of snapshot vintage:
  *   - parquet TIMESTAMP(NANOS) (rounds ≤5): Spark refuses it by default
  *     (`PARQUET_TYPE_ILLEGAL`); read nanos as long
  *     (`spark.sql.legacy.parquet.nanosAsLong` — runtime-settable) and
  *     truncate to µs, bit-identical to DuckDB's native ns handling.
  *   - parquet timestamp[us] without isAdjustedToUTC (round 6 snapshot):
  *     Spark reads TIMESTAMP_NTZ, which `unix_millis`/tz arithmetic reject.
  *     Cast to TIMESTAMP under the pinned UTC session zone — wall time
  *     becomes the identical UTC instant, and the driver's comparator
  *     strips tz before hashing, so oracle parity is unchanged
  *     (FIXTURES.md caveats). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Pin the session zone HERE, not only in entry points: the NTZ→ltz cast
    // below reinterprets wall time under this zone, so an ad-hoc session
    // (tool probes) on a non-UTC host would otherwise load shifted instants.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      (f.name, f.dataType) match {
        case ("ts", LongType) =>
          d.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case (n, TimestampNTZType) =>
          d.withColumn(n, col(n).cast(TimestampType))
        case _ => d
      }
    }
  }
}
