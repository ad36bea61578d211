package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Quantize, Similarity}

/** Ad-hoc diagnostics for the PQ path (not part of the driver contract). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val cbs = Quantize.pqTrain(emb, m = 8)
    println(s"codebooks: m=${cbs.length} k=${cbs.head.length} dsub=${cbs.head.head.length}")
    val enc = Quantize.pqEncode(emb, cbs)
    enc.show(3, false)
    val dec = enc.withColumn("avec", Quantize.pqDecode(col("codes"), cbs))
    val row = dec.join(emb, "vec_id").select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"), col("avec")).head()
    val v = row.getSeq[Double](1); val a = row.getSeq[Double](2)
    println(s"dim orig=${v.length} approx=${a.length}")
    val err = v.zip(a).map { case (x, y) => math.abs(x - y) }
    println(f"mean abs err ${err.sum / err.length}%.4f  max ${err.max}%.4f")
    for ((m, kc) <- Seq((8, 16), (8, 64), (16, 64), (16, 256), (32, 256))) {
      val ok = Similarity.pqKnnRecall(emb, col("vec_id") < 10, k = 5,
        m = m, kCodes = kc, recallBound = 0.0)
      // recallBound 0 → all true; recompute real recall via the internals
      val cbs2 = Quantize.pqTrain(emb, m, kc)
      val approx2 = Quantize.pqEncode(emb, cbs2)
        .withColumn("avec", Quantize.pqDecode(col("codes"), cbs2))
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
      val scored = approx2.join(broadcast(qs), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("neighbor_id"),
          Similarity.cosine(col("qv"), col("avec")).as("score"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("neighbor_id"))
      val pqTop = scored.withColumn("r", row_number().over(w)).filter(col("r") <= 5)
        .select(col("qid"), col("neighbor_id"))
      val ex = Similarity.bruteForceKnn(emb, col("vec_id") < 10, 5)
        .select(col("qid"), col("neighbor_id"))
      val rec = pqTop.join(ex, Seq("qid", "neighbor_id"), "left_semi").count() / 50.0
      val perQ = pqTop.join(ex, Seq("qid", "neighbor_id"), "left_semi")
        .groupBy("qid").count().collect().map(_.getLong(1))
      println(f"m=$m k=$kc recall@5 = $rec%.2f  per-query min=${perQ.min}/5 (n=${perQ.length})")
    }
    spark.stop()
  }
}
