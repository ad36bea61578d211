package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Canonical parquet table loader for the harness star schema + event/LLM
  * tables (TESTDATA.md).
  *
  * The driver-generated `events.ts` is parquet TIMESTAMP(NANOS), which Spark
  * refuses by default (`PARQUET_TYPE_ILLEGAL`). We read nanos as long
  * (`spark.sql.legacy.parquet.nanosAsLong` — runtime-settable) and truncate
  * to a µs timestamp, which is bit-identical to what DuckDB does natively on
  * ns parquet — required for oracle parity (FIXTURES.md caveats). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
