package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.llm.Sketch
import graft.streaming.StreamingQuantile

/** The maintained thresholded quantile sketch: the theta invariant
  * (rows = {live population with h < tau}, per group, EXACTLY) must
  * survive every ingest/erasure interleaving — including the case the
  * plain bottom-k algebra gets wrong, a merge AFTER an erasure — plus
  * pointer-replay idempotency and tau retention through a fully-emptied
  * saturated group. */
class StreamingQuantileSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 8

  private def df(rows: Seq[(String, String, Double)]): DataFrame =
    rows.toDF("grp", "key", "x")

  /** Brute-force replay of the invariant: hash the live population and
    * cut each group at the state's tau. */
  private def expected(live: Seq[(String, String, Double)],
      taus: DataFrame): Seq[(String, Long, Double)] =
    df(live)
      .select($"grp", Sketch.qsketchH($"key").as("h"), $"x".cast("double").as("v"))
      .join(taus, Seq("grp"))
      .filter($"h" < $"tau")
      .select($"grp", $"h", $"v")
      .orderBy($"grp", $"h", $"v")
      .as[(String, Long, Double)].collect().toSeq

  private def got(st: Sketch.QuantileState): Seq[(String, Long, Double)] =
    st.rows.orderBy($"grp", $"h", $"v")
      .as[(String, Long, Double)].collect().toSeq

  test("theta invariant holds through ingest, erasure, merge-after-erasure, and a fully-emptied saturated group; replays pointer-skip") {
    val dir = java.nio.file.Files.createTempDirectory("squant").toString
    def apply(b: DataFrame, id: Long, del: Option[String] = None): Unit =
      StreamingQuantile.applyBatch(b, dir, id, "grp", "key", "x", K, del)

    // g: 80 rows over two batches (saturated at k=8); t: 20 rows in
    // batch 0 (also saturated)
    val b0 = (0 until 40).map(i => ("g", s"a$i", i * 1.0)) ++
      (0 until 20).map(i => ("t", s"t$i", 100.0 + i))
    val b1 = (40 until 80).map(i => ("g", s"a$i", i * 1.0))
    apply(df(b0), 0L)
    apply(df(b1), 1L)
    val st1 = StreamingQuantile.readState(spark, dir)
    assert(got(st1) === expected(b0 ++ b1, st1.taus))
    assert(got(st1).count(_._1 == "g") === K) // saturated: exactly k

    // batch 2: erase every 4th g-row AND ALL of t (previously ingested),
    // while adding 20 fresh g-rows — erasure before adds, one batch
    val doomedG = (0 until 80).filter(_ % 4 == 1).map(i => ("g", s"a$i", i * 1.0))
    val doomedT = (0 until 20).map(i => ("t", s"t$i", 100.0 + i))
    val addsG = (80 until 100).map(i => ("g", s"a$i", i * 1.0))
    val b2 = df(addsG).withColumn("_del", lit(false))
      .unionByName(df(doomedG ++ doomedT).withColumn("_del", lit(true)))
    apply(b2, 2L, del = Some("_del"))

    val st2 = StreamingQuantile.readState(spark, dir)
    val live2 = (b0 ++ b1 ++ addsG)
      .filterNot((doomedG ++ doomedT).toSet)
    assert(got(st2) === expected(live2, st2.taus))
    // t fully emptied but its taus row survives, and flags surface it
    val flags2 = Sketch.quantileFlagsT(st2, minKeep = 4)
      .orderBy($"grp").as[(String, Long, Boolean)].collect().toSeq
    assert(flags2.find(_._1 == "t").get === (("t", 0L, true)))
    assert(!flags2.find(_._1 == "g").get._3)
    val tauT2 = st2.taus.filter($"grp" === "t").select($"tau")
      .as[Long].head()
    assert(tauT2 < Long.MaxValue) // the saturated threshold was retained

    // batch 3: 30 NEW t-rows — the retained tau must gate admission
    // (losing the taus row would admit all 30 and break the invariant)
    val addsT = (100 until 130).map(i => ("t", s"t$i", 200.0 + i))
    apply(df(addsT), 3L)
    val st3 = StreamingQuantile.readState(spark, dir)
    val live3 = live2 ++ addsT
    assert(got(st3) === expected(live3, st3.taus))
    val tSample = got(st3).filter(_._1 == "t")
    assert(tSample.nonEmpty && tSample.size < 30,
      s"tau must gate the new t rows: ${tSample.size}")

    // replays: the immediately-applied batchId (a true crash-replay) is
    // an idempotent skip; a FAR-BEHIND id is NOT a replay — it means a
    // fresh checkpoint (ids reset) was pointed at existing state, and
    // silently skipping would serve stale state forever — so it throws
    apply(df(addsT), 3L)
    intercept[IllegalStateException] { apply(df(b1), 1L) }
    assert(got(StreamingQuantile.readState(spark, dir)) === got(st3))

    // estimates come off the maintained sample directly
    val est = Sketch.quantileEstimate(st3.rows, Seq(("p50", 0.5)))
    assert(est.count() === 2L) // one per group
  }

  test("churn property: any legal ingest/erase/re-ingest sequence keeps the theta invariant exact, with a vacuum and a replay mid-sequence") {
    // the hand-written test pins single scenarios; this pins the CLOSURE:
    // erase → re-ingest (same key, CHANGED value) → erase-again cycles,
    // empty batches, in whatever order the seed deals them. k = 4 so
    // saturation/threshold-tightening happens constantly.
    val keys = for (g <- Seq("g", "t"); i <- 0 until 12) yield (g, s"${g}$i")
    def value(grp: String, key: String, gen: Int): Double =
      (grp.hashCode % 7).toDouble + key.length + gen * 10.0
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed * 131)
      val dir = java.nio.file.Files.createTempDirectory(s"squantp$seed").toString
      var live = Map.empty[(String, String), Int]
      for (b <- 0 until 5) {
        var l = live
        var rows = Vector.empty[(String, String, Double, Boolean)]
        val touched = scala.collection.mutable.Set.empty[(String, String)]
        for (_ <- 0 until rng.nextInt(8)) { // 0..7 ops — empty batches happen
          val kk = keys(rng.nextInt(keys.length))
          if (!touched(kk)) {
            touched += kk
            l.get(kk) match {
              case Some(g) if rng.nextBoolean() => // erase the current row
                rows :+= ((kk._1, kk._2, value(kk._1, kk._2, g), true)); l -= kk
              case Some(_) => ()
              case None => // (re-)ingest with generation-fresh value
                rows :+= ((kk._1, kk._2, value(kk._1, kk._2, b), false))
                l += kk -> b
            }
          }
        }
        live = l
        val bdf = rows.toDF("grp", "key", "x", "_del")
        StreamingQuantile.applyBatch(bdf, dir, b.toLong,
          "grp", "key", "x", k = 4, deleteCol = Some("_del"))
        if (b == 2) {
          StreamingQuantile.vacuum(spark, dir)
          // replay of an applied batch must be pointer-skipped
          StreamingQuantile.applyBatch(bdf, dir, b.toLong,
            "grp", "key", "x", k = 4, deleteCol = Some("_del"))
        }
        val st = StreamingQuantile.readState(spark, dir)
        val liveRows = live.toSeq.map { case ((g, kk), gen) =>
          (g, kk, value(g, kk, gen)) }
        assert(got(st) === expected(liveRows, st.taus),
          s"seed=$seed batch=$b live=${live.size}")
      }
    }
  }

  test("writer wires the identical fold through foreachBatch; vacuum drops superseded versions") {
    val dir = java.nio.file.Files.createTempDirectory("squantw").toString
    val ckpt = java.nio.file.Files.createTempDirectory("squantwc").toString
    val input = MemoryStream[(String, String, Double)](spark)
    val events = input.toDF().toDF("grp", "key", "x")

    val b0 = (0 until 30).map(i => ("g", s"a$i", i * 1.0))
    val b1 = (30 until 60).map(i => ("g", s"a$i", i * 1.0))
    input.addData(b0: _*)
    val q1 = StreamingQuantile.writer(events, dir, ckpt,
      "grp", "key", "x", K, trigger = Trigger.AvailableNow()).start()
    q1.processAllAvailable(); q1.stop()
    input.addData(b1: _*)
    val q2 = StreamingQuantile.writer(events, dir, ckpt,
      "grp", "key", "x", K, trigger = Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()

    val st = StreamingQuantile.readState(spark, dir)
    assert(got(st) === expected(b0 ++ b1, st.taus))

    // retain=2 is the concurrent-reader grace window: v=0 SURVIVES
    StreamingQuantile.vacuum(spark, dir, retain = 2)
    val kept2 = new java.io.File(s"$dir/rows").list().toSeq.sorted
    assert(kept2 === Seq("v=0", "v=1"), kept2.toString)
    StreamingQuantile.vacuum(spark, dir)
    val vdirs = new java.io.File(s"$dir/rows").list().toSeq
    assert(vdirs === Seq("v=1"), vdirs.toString) // only the latest survives
    // state still serves after the vacuum
    assert(got(StreamingQuantile.readState(spark, dir)).nonEmpty)
  }
}
