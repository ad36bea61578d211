package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.etl.{EnvelopeGen, EventEtl}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** HMAC key for the pseudonymize/insert_id stages (reference `HMAC_KEY`
    * env var, `synchronous-pull.js:15`). Fixed for reproducible harness
    * runs; the library API takes it as a parameter. */
  val HmacKey = "graft-test-key"

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(spark, dir, name)

  /** Flagship: the reference's full per-record transform chain O2→O10
    * (decode → unwrap → validate → repair → pseudonymize → insert_id →
    * identify-split) over envelopes synthesized from the events table.
    * Driver smoke-checks rows>0 on /root/testdata/sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val events = tbl(spark, "/root/testdata/sf0.001", "events")
    // localCheckpoint: cut the synthetic-envelope lineage (see Queries.envelopes).
    EventEtl.pipeline(EnvelopeGen.fromEvents(events).localCheckpoint(), HmacKey)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.all
}
