package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe (not part of the driver contract): the FS-byte evidence
  * for the r10 segmented streaming state — per-batch bytes written must
  * scale with the BATCH, not the corpus (the r9 copy-on-write writer
  * rewrote the whole merged index every micro-batch). Replays the
  * q_index_stream fold at a given SF and prints the byte count of every
  * state directory, plus a small fourth batch against the compacted
  * corpus — the steady-state trigger the 10-second regime cares about. */
object SegBytesProbe {
  private def du(path: String): Long = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .repartition(8).localCheckpoint()
    val state = java.nio.file.Files.createTempDirectory("segbytes").toString
    // the q_index_stream shape: thirds, compaction at maxSegments=3
    (0L to 2L).foreach { b =>
      graft.streaming.StreamingIndex.applyBatch(
        docs.filter(col("doc_id") % 3 === b), state, b, maxSegments = 3)
      println(s"[segbytes] after batch $b: " +
        s"seg/v=$b=${du(s"$state/seg/v=$b")} " +
        s"base=${du(s"$state/base")} stats=${du(s"$state/stats/v=$b")}")
    }
    // steady state: a 1%-of-corpus batch lands on the compacted base —
    // this is the recurring trigger cost
    val n = docs.count()
    graft.streaming.StreamingIndex.applyBatch(
      docs.filter(col("doc_id") % 100 === 0)
        .withColumn("doc_id", col("doc_id") + lit(10000000L)),
      state, 3L, maxSegments = 8)
    println(s"[segbytes] corpus=$n docs; steady batch (${n / 100} docs): " +
      s"seg/v=3=${du(s"$state/seg/v=3")} vs base=${du(s"$state/base")} " +
      s"(batch write = ${"%.1f".format(100.0 * du(s"$state/seg/v=3") / du(s"$state/base"))}% of corpus state)")
    graft.streaming.StreamingIndex.vacuum(spark, state)
    println(s"[segbytes] after vacuum: total=${du(state)}")

    // ---- SCD2: delta writes (closed + touched-open) vs full history ----
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .repartition(8).localCheckpoint()
    val scd2 = java.nio.file.Files.createTempDirectory("segbytes_scd2").toString
    val cuts = Seq("2024-01-18", "2024-01-25").map(lit(_).cast("timestamp"))
    Seq(ev.filter(col("ts") < cuts(0)),
        ev.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
        ev.filter(col("ts") >= cuts(1)))
      .zipWithIndex.foreach { case (b, i) =>
        graft.streaming.StreamingScd2.applyBatch(b, scd2, "user_id", "ts",
          "event_type", "event_id", i.toLong)
        println(s"[segbytes] scd2 after batch $i: " +
          s"seg/v=$i=${du(s"$scd2/seg/v=$i")}")
      }
    // steady state: a single-key late change against the whole history
    val late = ev.orderBy(col("ts").desc).limit(1)
      .withColumn("ts", col("ts") + expr("INTERVAL 1 DAY"))
      .withColumn("event_type", lit("segbytes_probe_state"))
    graft.streaming.StreamingScd2.applyBatch(late, scd2, "user_id", "ts",
      "event_type", "event_id", 3L)
    val hist = du(s"$scd2/seg/v=0") + du(s"$scd2/seg/v=1") + du(s"$scd2/seg/v=2")
    println(s"[segbytes] scd2 steady 1-key batch: seg/v=3=${du(s"$scd2/seg/v=3")} " +
      s"vs history=$hist (the r10 first cut rewrote all of it per batch)")
    spark.stop()
  }
}
