package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a relational
  * artifact: a `depth × width` counter table estimating term frequencies
  * under fixed-size state — the streaming-friendly companion to
  * [[graft.expr.SpaceSaving]] (which keeps the top items; CMS answers point
  * queries for ANY item, with one-sided error: est ≥ exact, over by at most
  * εN with probability 1−δ for width=e/ε, depth=ln(1/δ)).
  *
  * Scale shape: the build is one exploded scan with map-side partial
  * aggregation — each task combines into AT MOST depth × width local rows
  * before the single (depth, bucket)-keyed exchange, so the shuffle volume
  * is bounded by the sketch size per partition regardless of corpus size.
  * Sketches over corpus shards MERGE by adding counts bucket-wise (proved
  * in LlmSpec) — the property that makes the sketch maintainable
  * incrementally like the dedup/search artifacts.
  *
  * Portability discipline: buckets are md5-prefix integers (the
  * [[Sampling]] digest convention) — any engine reproduces the exact
  * sketch, so the artifact is auditable cross-engine, not just
  * cross-partitioning. */
object Sketch {

  val DefaultDepth = 4
  val DefaultWidth = 64

  /** Frequent + absent probe terms: the absent tail exercises the
    * collision-overestimate path (exact 0, est ≥ 0). */
  val CmsPanel: Seq[String] = Seq("batch", "column", "filter", "hash",
    "join", "merge", "neutrino", "order", "row", "scan", "small", "zzzq")

  /** Row j's bucket for a term: md5("j:term") 8-hex prefix mod width. */
  def bucket(term: Column, j: Int, width: Int): Column =
    pmod(graft.expr.Md5Prefix(concat(lit(j.toString), lit(":"), term), 8),
      lit(width.toLong))

  private def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Build the sketch over the corpus's whitespace tokens: one row per
    * non-empty (depth, bucket) cell with its collision-summed count. */
  def cmsBuild(docs: DataFrame, depth: Int = DefaultDepth,
      width: Int = DefaultWidth, textCol: String = "text"): DataFrame = {
    val toks = docs.select(explode(words(col(textCol))).as("term"))
    toks
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("depth"), bucket(col("term"), j, width).as("bucket"))): _*))
        .as("cell"))
      .groupBy(col("cell.depth").as("depth"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built over disjoint corpus shards: counts add
    * bucket-wise (outer union — a cell absent from one side contributes 0).
    * Result is bit-identical to building over the union corpus. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("depth"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query the sketch for each panel term: est = min over depth rows
    * of the term's bucket count (0 for an untouched bucket), next to the
    * exact corpus count — publishing the one-sided-error contract
    * (`overestimate` must be uniformly true). The panel is a literal
    * (bounded, broadcast); the only corpus read is the exact-count scan. */
  def cmsEstimate(sketch: DataFrame, docs: DataFrame, panel: Seq[String],
      depth: Int = DefaultDepth, width: Int = DefaultWidth,
      textCol: String = "text"): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val p = panel.toDF("term")
    val cells = p.select(col("term"),
      explode(array((0 until depth).map(j =>
        struct(lit(j).as("depth"), bucket(col("term"), j, width).as("bucket"))): _*))
        .as("cell"))
      .select(col("term"), col("cell.depth").as("depth"), col("cell.bucket").as("bucket"))
    val est = cells
      .join(sketch, Seq("depth", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
    val exact = docs
      .select(explode(words(col(textCol))).as("term"))
      .filter(col("term").isin(panel: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    est
      .join(exact, Seq("term"), "left")
      .select(col("term"), col("est_count"),
        coalesce(col("c"), lit(0L)).as("exact_count"),
        (col("est_count") >= coalesce(col("c"), lit(0L))).as("overestimate"))
  }
}
