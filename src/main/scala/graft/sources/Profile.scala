package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the table-stakes warehouse diagnostic next to the
  * [[Expect]] contract checks: per-column row/null/distinct counts, the
  * numbers an ingestion pipeline publishes with every snapshot and a
  * query planner's first-order statistics (null fraction, cardinality).
  *
  * Scale shape: ONE pass over the table. All per-column plain counts fuse
  * into a single aggregate; the exact distinct counts make Spark plan one
  * Expand (k× row multiplication before partial aggregation) — the
  * standard multi-distinct plan, map-side combined, no per-column rescans.
  * At 100 TB prefer `exact = false`: HyperLogLog++ distinct counts keep
  * the whole profile a plain one-pass partial aggregate with NO Expand
  * and bounded state (the oracle-checked catalog row runs exact; the
  * approx path shares the plan of the HLL rows proven elsewhere). */
object Profile {

  def profile(df: DataFrame, columns: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(columns.nonEmpty, "no columns given")
    require(columns.distinct.size == columns.size, "duplicate columns")
    val aggs = columns.flatMap { c =>
      val v = col(s"`$c`")
      Seq(count(v).as(s"__nn_$c"),
        (if (exact) count_distinct(v) else approx_count_distinct(v))
          .as(s"__nd_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(columns.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"`__nn_$c`")).as("n_null"),
        col(s"`__nd_$c`").as("n_distinct"))): _*)).as("r"))
      .select(col("r.col_name").as("col_name"), col("r.n_rows").as("n_rows"),
        col("r.n_null").as("n_null"), col("r.n_distinct").as("n_distinct"))
  }
}
