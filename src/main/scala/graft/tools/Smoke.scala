package graft.tools
import org.apache.spark.sql.SparkSession
/** Replica of the driver's t1 smoke: SparkEntry.entry rows>0 at sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.entry(spark).count()
    println(f"SMOKE rows=$n in ${(System.nanoTime()-t0)/1e9}%.1fs")
    spark.stop()
  }
}
