package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parameter probe for the graph-ANN family: panel recall@k of the
  * NSW-style walk vs exact, across (m, ef, iters), at a given SF —
  * evidence behind the q_knn_graph recall bound (PLANS_r14). */
object ProbeGraphAnn {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = if (a.nonEmpty) a(0) else "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.load(s, dir, "embeddings")
      .repartition(8).localCheckpoint()
    println(s"corpus=${emb.count()}")
    val exact = graft.llm.Similarity
      .bruteForceKnn(emb, col("vec_id") < 10, 5)
      .select(col("qid"), col("neighbor_id")).localCheckpoint()
    val nExact = exact.count()
    for ((m, bits, probes) <- Seq((16, 4, 2));
         (ef, iters, entries) <- Seq((96, 5, 24))) {
      val t0 = System.nanoTime()
      val g = graft.llm.GraphAnn.buildGraph(emb, m = m, lshBits = bits,
        probes = probes).localCheckpoint()
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val approx = graft.llm.GraphAnn.search(emb, g, col("vec_id") < 10,
          k = 5, ef = ef, iters = iters, entries = entries)
        .select(col("qid"), col("neighbor_id"))
      val hits = approx.join(exact, Seq("qid", "neighbor_id"), "left_semi")
        .count()
      val tSearch = (System.nanoTime() - t1) / 1e9
      println(f"GANN m=$m bits=$bits probes=$probes ef=$ef iters=$iters e=$entries recall=${hits.toDouble / nExact}%.3f build=$tBuild%.1fs search=$tSearch%.1fs")
    }
    s.stop()
  }
}
