package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Ad-hoc timing of the LSH bucket-cap overhead (not part of the driver
  * contract). */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .repartition(32)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[cap] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (pass <- 1 to 3) {
      time(s"p$pass capped")(
        Dedup.minhashNearDups(docs, threshold = 0.6).count())
      time(s"p$pass uncapped")(
        Dedup.minhashNearDups(docs, threshold = 0.6,
          maxBucket = Int.MaxValue).count())
    }
    spark.stop()
  }
}
