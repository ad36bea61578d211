package graft.tools
import org.apache.spark.sql.SparkSession
/** Plan audit: print formatted plans for key catalog queries so scan
  * pruning (ReadSchema), pushed filters, broadcast joins, and
  * whole-stage-codegen coverage are reviewable per round. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val qs = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q1_pricing_summary", "q_region_revenue", "q_top_customers",
        "q_knn_brute", "q_dedup_minhash", "q_cube_revenue", "q_join_semi_anti",
        "q_session_window", "q_ngram_jaccard", "q_lang_breakdown",
        "q_asof_enrich", "q_range_join", "q_knn_ivf",
        "q_pack_sequences", "q_embed_quantize", "q_sample_docs",
        "q_repetition", "q_window_rank", "q_grouping_sets", "q_salted_agg",
        "q_vocab_topk", "q_tfidf", "q_lm_score", "q_pivot_revenue",
        "q_unpivot", "q_topk_per_group", "q_sample_weighted",
        "q_dedup_incr_near", "q_join_outer", "q_percentiles")
    for (q <- qs) {
      println(s"==== $q")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
