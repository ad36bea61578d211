package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the formatted physical plan of the graph-ANN build (the shape
  * the round-14 narrow-shuffle claim is checked against): run before and
  * after the optimization and diff the Exchange projections. */
object GraphPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    println("==== GraphAnn.buildGraph(m=16, lshBits=4, probes=2) ====")
    graft.llm.GraphAnn.buildGraph(emb, m = 16, lshBits = 4, probes = 2)
      .explain("formatted")
    spark.stop()
  }
}
