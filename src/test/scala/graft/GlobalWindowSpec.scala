package graft

import org.apache.spark.sql.catalyst.plans.logical.Window

/** The catalog-wide generalization of PlanSpec's "packing: no global
  * window" contract: NO catalog row may plan an empty-partition-spec
  * Window over data that grows with the corpus. A single-partition
  * WindowExec puts the whole frame on one reducer — the one plan shape
  * that is quietly correct at sf0.01 and IS the corpus at 100 TB.
  *
  * Two sweeps, because global windows appear in two places:
  *   1. the LAZY plan of each catalog row (optimized logical plan —
  *      catches any composition that reintroduces one downstream);
  *   2. the SOURCE tree (catches construction-time windows that
  *      checkpoint/collect before the final plan, where sweep 1 cannot
  *      see them — e.g. the pre-checkpoint stage of ops.Prefix itself).
  *
  * The allowlist is the set of windows whose frame is bounded by
  * CONSTRUCTION, not by luck — each entry names the bound.
  */
class GlobalWindowSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Rows whose final plan may carry an empty-partition window, with the
    * reason the frame is bounded. A new name appearing here must bring a
    * documented bound or a Prefix.globalOrder rewrite. */
  private val boundedByConstruction: Map[String, String] = Map(
    // hourlyAnomalies: stats window over the hourly aggregate —
    // calendar-bounded (8760 rows/year), documented at Analytics.scala
    "q_hourly_anomaly" -> "hourly aggregate is calendar-bounded",
    // collocations: rank window over the k survivors of a TakeOrdered
    // limit(k) — k rows by construction
    "q_collocations" -> "rank runs on the limit(k) frame",
    // robustStats: cumulative window over DISTINCT 1-cent grid values —
    // bounded by the value domain (price range in cents), not row count
    "q_robust_stats" -> "cent-grid value domain bounds the distinct frame",
    // vocabWithIds: row_number over the k-row vocabTopK output
    "q_tokenize_ids" -> "vocab bounded to k rows by vocabTopK"
  )

  test("no catalog row plans an empty-partition-spec Window over unbounded data") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, sf)
        val globals = df.queryExecution.optimizedPlan.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }
        if (globals.nonEmpty) Some(name) else None
    }
    // EXACT equality both ways: a new global window must be justified
    // here, and an allowlist entry whose window disappeared must be
    // retired (so the list can only ever name live, reviewed bounds)
    assert(offenders.toSet === boundedByConstruction.keySet,
      s"unexplained global windows: ${offenders.toSet -- boundedByConstruction.keySet} " +
        s"(use graft.ops.Prefix.globalOrder or document the bound); " +
        s"stale allowlist entries: ${boundedByConstruction.keySet -- offenders.toSet}")
  }

  test("source tree: Window.orderBy/empty partitionBy only in allowlisted files") {
    // construction-time global windows (pre-checkpoint stages, trainers)
    // never show in a final plan — catch them at the source level
    val allowedFiles = Set(
      // the two-phase prefix itself windows on the range-partition id —
      // its own PlanSpec test pins that the partition spec is non-empty
      "TextAnalysis.scala", // vocabWithIds: k-row vocab (doc'd at call site)
      "Analytics.scala"     // hourlyAnomalies (calendar), robustStats (grid)
    )
    val root = new java.io.File("src/main/scala/graft")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty
    val offending = walk(root).filter { f =>
      val src = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      src.contains("Window.orderBy(") || src.contains("Window.partitionBy()")
    }.map(_.getName).toSet
    assert((offending -- allowedFiles).isEmpty,
      s"unallowlisted global-window construction in: ${offending -- allowedFiles}")
  }
}
