package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe (not part of the driver contract): the measured
  * SCALING-EXPONENT evidence behind the "would survive 100×" claims —
  * the plan-shape contracts (PlanSpec) argue the asymptotics, this probe
  * measures them across the three generated scale factors and publishes
  * the log-log slope. A row whose cost is ∝ corpus shows exponent ≈ 1;
  * a quadratic one ≈ 2; a probe over a pruned/persisted artifact ≪ 1.
  *
  * Method: for each headline row, run per SF with the steady-state
  * artifact discipline (graft.artifact.dir set per SF — pass 1 builds
  * persisted artifacts, later passes probe them, exactly the Bench
  * protocol), take the min of `passes` runs, and fit the exponent
  * between the two LARGEST SFs (sf0.001 times are dominated by fixed
  * job-launch overhead, which would bias every slope toward 0).
  * Host noise caveat: single-digit-second rows on a contended host
  * carry ±30% — treat slopes as one-decimal evidence, not benchmarks. */
object SlopeProbe {

  val Rows: Seq[String] = Seq(
    // segmented streaming state: build+fold (pass 1) then serving read
    "q_index_stream", "q_index_stream_minor",
    // pruned serving probes over persisted indexes
    "q_index_phrase", "q_bm25_indexed",
    // index build (the ∝ corpus baseline the probes should beat)
    "q_inverted_index",
    // dedup headliners: banded LSH, prefix-filtered Jaccard, exact
    "q_dedup_exact", "q_dedup_minhash", "q_jaccard_prefix",
    // ANN: cell-pruned IVF probe vs the brute-force truth row
    "q_knn_ivf_indexed", "q_knn_brute",
    // semantic dedup (cell-blocked ε-join with the maxCell rail)
    "q_semantic_dedup",
    // media: banded perceptual near-dup build vs the steady-state ingest
    // probe against the persisted features artifact
    "q_media_neardup", "q_media_neardup_incr",
    // quantile sketch: the build (∝ corpus, WindowGroupLimit-bounded
    // shuffle) vs the streamed state's steady-state read (pass 2+ folds
    // pointer-skip; the state is sketch-sized, so the serving read
    // should sit at exponent ≈ 0)
    "q_quantile_sketch", "q_quantile_stream")

  def main(args: Array[String]): Unit = {
    val sfs = Seq("0.001", "0.01", "0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_SLOPE_PASSES", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_SLOPE_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = scala.collection.mutable.Map.empty[(String, String), Double]
    for (sf <- sfs) {
      val dir = s"/root/testdata/sf$sf"
      sys.props("graft.artifact.dir") =
        s"/root/repo/target/slope_artifacts/sf$sf"
      graft.sources.Artifacts.wipe()
      for (name <- Rows; if graft.SparkEntry.queries.contains(name)
          && only.forall(_.contains(name))) {
        val gated = graft.SparkEntry.benchMaxSf.get(name).exists(_ < sf.toDouble)
        if (gated) System.err.println(s"[slope] sf$sf $name SF-GATED, skipped")
        else {
          // failed passes are EXCLUDED from the min — a failure returns in
          // near-zero time, and folding it in would print a bogus slope
          // instead of a missing data point
          val ts = (1 to passes).flatMap { _ =>
            val t0 = System.nanoTime()
            val ok =
              try {
                graft.SparkEntry.queries(name)(spark, dir)
                  .write.format("noop").mode("overwrite").save()
                true
              } catch { case e: Throwable =>
                System.err.println(s"[slope] $name@$sf FAILED: ${e.getMessage}")
                false
              }
            if (ok) Some((System.nanoTime() - t0) / 1e9) else None
          }
          ts match {
            case Seq() =>
              System.err.println(s"[slope] sf$sf $name all passes failed — no data point")
            case some =>
              times((name, sf)) = some.min
              System.err.println(f"[slope] sf$sf $name ${some.min}%.2fs")
          }
        }
      }
    }
    println(f"${"row"}%-22s ${"sf0.001"}%9s ${"sf0.01"}%9s ${"sf0.1"}%9s  slope(0.01→0.1)")
    for (name <- Rows) {
      def t(sf: String) = times.get((name, sf))
      val slope = (t("0.01"), t("0.1")) match {
        case (Some(a), Some(b)) if a > 0 => Some(math.log(b / a) / math.log(10.0))
        case _ => None
      }
      def fmt(o: Option[Double]) = o.fold("-")(v => f"$v%9.2f")
      println(f"$name%-22s ${fmt(t("0.001"))}%9s ${fmt(t("0.01"))}%9s " +
        f"${fmt(t("0.1"))}%9s  ${slope.fold("-")(s => f"$s%.2f")}")
    }
    spark.stop()
  }
}
