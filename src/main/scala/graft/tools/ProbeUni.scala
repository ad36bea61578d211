package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeUni {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.load(s, if (a.nonEmpty) a(0) else "/root/testdata/sf0.001", "documents")
    val words = graft.llm.Bpe.wordFreq(docs)
    val t0 = System.nanoTime()
    val v = graft.llm.Unigram.train(words, seedMulti = 40, keepMulti = 20)
    println(f"TRAIN ${(System.nanoTime()-t0)/1e9}%.1fs vocab=${v.size}")
    v.foreach(p => println(s"V|${p.piece}|${p.cnt}|${p.lpNano}"))
    val enc = graft.llm.Unigram.encode(words, v)
      .select(col("word"), col("freq"), size(col("tokens")).as("n"),
        array_join(col("tokens"), " ").as("toks")).orderBy(col("word"))
    enc.collect().foreach(r => println(s"E|${r.getString(0)}|${r.getLong(1)}|${r.getInt(2)}|${r.getString(3)}"))
  }
}
