package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract expectations (the dbt-test / Great Expectations layer):
  * declarative checks evaluated as aggregations, each yielding one
  * (check, n_violations, passed) row — the gate an ingestion pipeline
  * runs before publishing a table, and the audit artifact it stores.
  *
  * Scale shape: all row-predicate checks against one table FUSE into a
  * SINGLE scan ([[scanChecks]] — one conditional-sum aggregate per
  * check, map-side combined); uniqueness is one keys-only aggregation
  * (count vs count-distinct, never payload rows); referential integrity
  * is a broadcast-able anti-join count against the parent's key
  * projection. Nothing collects; the suite is a union of one-row
  * frames. */
object Expect {

  private def row(name: String, violations: Column): Column =
    struct(lit(name).as("check_name"), violations.as("n_violations"))

  /** Row-predicate checks fused into ONE scan: each (name, predicate)
    * counts the rows where the predicate FAILS (NULL predicate = fail,
    * so `col.between(..)` on a NULL value counts as a violation — the
    * conservative contract reading). */
  def scanChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    require(checks.map(_._1).distinct.size == checks.size,
      "duplicate check names")
    val aggs = checks.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(name) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // backticked re-resolution: a check name containing a dot must read
    // back as the literal alias, not a nested-field path
    val stacked = one.select(explode(array(checks.map { case (n, _) =>
      row(n, col(s"`$n`")) }: _*)).as("r"))
    stacked.select(col("r.check_name").as("check_name"),
      col("r.n_violations").as("n_violations"))
  }

  /** Key-uniqueness check: violations = n_rows − n_distinct_keys. */
  def unique(df: DataFrame, keyCols: Seq[String], name: String): DataFrame =
    df.select(keyCols.map(col): _*)
      .agg((count(lit(1)) -
        count_distinct(struct(keyCols.map(col): _*))).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Referential-integrity check: child rows whose key has no parent. */
  def refIntegrity(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, name: String): DataFrame =
    child.select(col(childKey))
      .join(broadcast(parent.select(col(parentKey).as(childKey)).distinct()),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Union the checks into the published suite report, `passed` derived. */
  def suite(checks: DataFrame*): DataFrame =
    checks.reduce(_ unionByName _)
      .select(col("check_name"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))
      .orderBy(col("check_name"))
}
