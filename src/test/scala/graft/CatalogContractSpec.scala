package graft

import org.scalatest.funsuite.AnyFunSuite

/** The catalog's own contract, machine-checked (no Spark session needed):
  * every row the driver runs must have a DuckDB oracle, except the two
  * HMAC rows that are fundamentally un-oracle-able (golden-vector-pinned
  * in HmacSha256Spec instead) — a new row silently lacking an oracle
  * would otherwise downgrade to the weaker rows-only check without
  * anyone deciding that. */
class CatalogContractSpec extends AnyFunSuite {

  /** The ONLY rows allowed to ship without an oracle, with the reason. */
  private val rowsOnlyByDesign = Set(
    "q_etl_pseudonymize", // HMAC-SHA256 output: DuckDB has no keyed hash
    "q_etl_insert_id")    // hash-of-hash over the same HMAC

  test("every catalog row has an oracle or is allowlisted rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === rowsOnlyByDesign,
      s"rows without oracles beyond the allowlist: ${missing -- rowsOnlyByDesign}")
  }

  test("no orphan oracles (every oracle names a real catalog row)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans === Set.empty[String], s"orphan oracle entries: $orphans")
  }

  test("every benchMaxSf ceiling names a real catalog row") {
    val orphans = SparkEntry.benchMaxSf.keySet -- SparkEntry.queries.keySet
    assert(orphans === Set.empty[String], s"orphan bench ceilings: $orphans")
  }

  test("oracle SQL publishes no uncast integer aggregate in the final select") {
    // heuristic tripwire for contract rule #2 (SparkEntry doc): a final
    // SELECT publishing sum(...)/count(...) without ::BIGINT produces
    // HUGEINT -> pandas float64 vs Spark int64 and the driver hash
    // fails on dtype alone (q_decontam r5, q_cluster_quality r7). The
    // authoritative check is tools/check_oracle.py's dtype gate; this
    // catches the obvious textual slip at compile-test time.
    val suspicious = SparkEntry.oracleSql.filter { case (_, sql) =>
      val finalSelect = sql.split("(?i)\\bSELECT\\b").last
      // a bare "sum(x) AS alias" with no cast anywhere in the clause
      "(?i)sum\\([^)]*\\) AS \\w+".r.findAllIn(finalSelect).exists(m =>
        !m.contains("::") && !finalSelect.contains("CAST(sum"))
    }.keySet
    // rows where the pattern appears but the published value is a ratio
    // into DOUBLE or the sum is already cast upstream — reviewed by hand
    val reviewed = Set("q_window_df_hist")
    assert((suspicious -- reviewed) === Set.empty[String],
      s"possible uncast integer aggregates: ${suspicious -- reviewed}")
  }
}
