package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation statistics over corpus-sized predictions — the
  * "is the quality probe any good?" step between training a filter and
  * trusting it on 100 TB.
  *
  * AUC is computed as the tie-corrected Mann-Whitney statistic:
  * AUC = (Σ_pos avgrank − P(P+1)/2) / (P·N), with average ranks over tied
  * scores. Scale shape: the corpus first SHRINKS to one row per DISTINCT
  * score (partial-aggregated groupBy); only those rows enter the global
  * rank window — the standard distributed-AUC layout. Scores from the
  * repo's trainers land on deterministic grids, so distinct counts stay
  * far below row counts; quantize the score column first if a model emits
  * fully-continuous scores and the distinct frame itself would be huge.
  *
  * Portability: rank arithmetic stays EXACT-INTEGER throughout — the
  * numerator is doubled (2·R_pos = Σ p·(2·cum − c + 1)) so average ranks
  * never materialize as halves — and the published AUC is one IEEE
  * division of exact longs. Integer headroom: num2 ~ P·2·(P+N), safe to
  * ~10⁹ positives against ~10⁹ negatives. */
object Eval {

  /** One row: (n_pos, n_neg, auc) of `scoreCol` predicting boolean
    * `labelCol`; auc is NULL when either class is empty. */
  def auc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val agg = df
      .select(scoreCol.as("s"), labelCol.cast("int").cast("long").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    // global window over DISTINCT scores only — the post-shrink frame
    val ranked = agg.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("s"))))
    ranked
      .agg(
        sum(col("p") * (lit(2L) * col("cum") - col("c") + lit(1L))).as("num2"),
        sum(col("p")).as("n_pos"),
        (sum(col("c")) - sum(col("p"))).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("num2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))
  }
}
