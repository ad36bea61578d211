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
    // kernel-vs-HOF encode timing over an inflated word table (the
    // PLANS_r14 speedup evidence for the codegen'd Viterbi kernel):
    // same words replicated so the per-row DP dominates scheduling
    val big = words.crossJoin(s.range(200).select(col("id")))
      .select(concat(col("word"), lit("x")).as("word"), col("freq"))
      .localCheckpoint()
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      for (pass <- 1 to 3) {
        val t = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"ENC $tag p$pass ${(System.nanoTime()-t)/1e9}%.2fs")
      }
    }
    time("kernel")(graft.llm.Unigram.encode(big, v))
    time("hof")(graft.llm.Unigram.encodeHof(big, v))
  }
}
