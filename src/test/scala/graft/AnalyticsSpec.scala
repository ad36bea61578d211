package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.Analytics
import graft.llm.Sampling

/** Behavior pins for the operators whose catalog oracles assert arithmetic
  * but not semantics: the anomaly detector must actually flag a planted
  * spike, and the per-group cap must be invariant to partitioning. */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  test("hourly anomalies: planted spike flagged, steady hours are not") {
    // 48 steady hours of 10 events, one hour with 300
    val rows = for {
      h <- 0 until 48
      i <- 0 until (if (h == 17) 300 else 10)
    } yield (h.toLong * 100 + i, new Timestamp(h * 3600L * 1000))
    val events = rows.toDF("event_id", "ts")
    val out = Analytics.hourlyAnomalies(events).collect()
    assert(out.length === 48)
    val flagged = out.filter(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.map(_.getAs[Long]("n_events")).toSeq === Seq(300L))
    assert(flagged.head.getAs[Double]("z") > 2.0)
    // steady hours sit below the spike-inflated mean: negative z, unflagged
    assert(out.filter(_.getAs[Long]("n_events") == 10L).forall(r =>
      r.getAs[Double]("z") < 0 && !r.getAs[Boolean]("is_anomaly")))
  }

  test("attribution: in-window touch credits, stale touch does not") {
    val ms = (m: Long) => new Timestamp(m)
    val h = 3600L * 1000
    val events = Seq(
      // u1: click 1h before purchase → attributed
      (1L, 1L, "click", ms(10 * h)), (2L, 1L, "purchase", ms(11 * h)),
      // u2: view 30h before purchase (window 24h) → found but NOT attributed
      (3L, 2L, "view", ms(0L)), (4L, 2L, "purchase", ms(30 * h)),
      // u3: purchase with no touch at all
      (5L, 3L, "purchase", ms(5 * h)),
      // u1 again: later purchase still credits the same last click
      (6L, 1L, "purchase", ms(12 * h))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics.lastTouchAttribution(events)
      .orderBy($"event_id")
      .select($"event_id", $"touch_type", $"attributed")
      .as[(Long, Option[String], Boolean)].collect().toSeq
    assert(out === Seq(
      (2L, Some("click"), true),
      (4L, Some("view"), false),
      (5L, None, false),
      (6L, Some("click"), true)))
  }

  test("rolling active: trailing window unions the right days") {
    val day = (d: Int, u: Long) =>
      (u * 100 + d, u, "view", new Timestamp(d.toLong * 86400L * 1000))
    // u1 active days 1..3; u2 active day 1 only; u3 active day 9
    val events = (Seq(1, 2, 3).map(day(_, 1L)) ++ Seq(day(1, 2L), day(9, 3L)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val m = Analytics.rollingActive(events, windowDays = 7)
      .select($"day".cast("string"), $"dau", $"wau")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(m("1970-01-02") === ((2L, 2L))) // day 1: u1+u2
    assert(m("1970-01-04") === ((1L, 2L))) // day 3: dau=u1, wau=u1+u2
    // day 9: dau=u3; u1's day 3 is exactly 6 days back — still in window
    assert(m("1970-01-10") === ((1L, 2L)))
  }

  test("debounce: burst collapses to its head; types and users independent") {
    val ms = (m: Long) => new Timestamp(m)
    val events = Seq(
      // u1/click burst: 0, 40s, 90s — chain (40≤60, 50≤60) → keep only head,
      // then 200s (gap 110s > 60) survives
      (1L, 1L, "click", ms(0L)), (2L, 1L, "click", ms(40000L)),
      (3L, 1L, "click", ms(90000L)), (4L, 1L, "click", ms(200000L)),
      // same user, different type at 10s: untouched by the click burst
      (5L, 1L, "view", ms(10000L)),
      // other user inside u1's burst window: independent
      (6L, 2L, "click", ms(20000L))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val kept = Analytics.debounce(events, withinMs = 60000L)
      .select($"event_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L, 6L))
  }

  test("per-group cap: at most cap rows, kept set survives repartitioning") {
    val df = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("id", "grp")
    def kept(d: org.apache.spark.sql.DataFrame): Map[String, Set[Long]] =
      Sampling.capPerGroup(d, col("grp"), col("id"), cap = 25)
        .as[(Long, String)].collect().groupBy(_._2).view
        .mapValues(_.map(_._1).toSet).toMap
    val base = kept(df)
    assert(base.values.forall(_.size === 25))
    // pure function of (group, key): any physical layout keeps the same set
    assert(kept(df.repartition(13, col("id"))) === base)
    // a group under the cap survives whole
    val small = kept(df.filter(col("id") < 30))
    assert(small.values.map(_.size).toSet === Set(10))
  }

  test("epoch shuffle: exact permutation, reproducible per epoch, distinct across epochs") {
    import spark.implicits._
    val df = (0L until 500L).toDF("id")
    def order(epoch: Int) = graft.llm.Packing
      .epochShuffle(df, col("id"), epoch)
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
    val e1 = order(1)
    assert(e1.sorted === (0L until 500L), "positions form an exact permutation")
    assert(order(1) === e1, "same epoch reproduces bit-identically")
    assert(order(2) !== e1, "different epoch permutes differently")
  }

  test("ratio metric: identical units give zero SE; heterogeneity gives positive SE") {
    import spark.implicits._
    // every user identical (2 clicks / 10 views) -> varx = vary = cov = 0
    val same = (1L to 30L).flatMap(u =>
      Seq.fill(2)((u, 1L, 0L)) ++ Seq.fill(10)((u, 0L, 1L)))
      .toDF("u", "clk", "vw")
    val s0 = Analytics.ratioMetricCi(same, col("u"), col("clk"), col("vw"))
      .select($"n", $"ratio", $"se").as[(Long, Double, Option[Double])]
      .collect().head
    assert(s0 === ((30L, 0.2, Some(0.0))))
    // heterogeneous users -> positive finite SE
    val mixed = (1L to 30L).flatMap(u =>
      Seq.fill((u % 5 + 1).toInt)((u, 1L, 0L)) ++ Seq.fill(10)((u, 0L, 1L)))
      .toDF("u", "clk", "vw")
    val s1 = Analytics.ratioMetricCi(mixed, col("u"), col("clk"), col("vw"))
      .select($"se").as[Option[Double]].collect().head.get
    assert(s1 > 0.0 && s1 < 1.0)
  }

  test("srm: biased allocation flagged, near-even split passes") {
    import spark.implicits._
    val crit = 3.841458820694124 // chi2(1), alpha=0.05
    def run(aCount: Int) = Analytics.srmCheck(
        (1 to 1000).map(i => if (i <= aCount) "a" else "b").toDF("arm"),
        col("arm"), Seq("a" -> 0.5, "b" -> 0.5), crit)
      .select($"n_total", $"n_a", $"n_b", $"chi2", $"srm_detected")
      .as[(Long, Long, Long, Double, Boolean)].collect().head
    val bad = run(700) // chi2 = 2 * 200^2/500 = 160
    assert(bad === ((1000L, 700L, 300L, 160.0, true)))
    val ok = run(498)  // chi2 = 2 * 2^2/500 = 0.016
    assert(!ok._5 && ok._4 < 0.02)
  }

  test("grouped quantiles and MAD: hand-computed discrete selections per segment") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
      ("b", 7.0)).toDF("g", "v")
    val gq = Analytics.groupedQuantiles(df, col("g"), col("v"))
      .select($"grp", $"n", $"med_c", $"p10_c", $"p90_c")
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (g, n, m, p10, p90) => g -> ((n, m, p10, p90)) }.toMap
    // discrete rule: min c whose running count reaches the rank threshold
    assert(gq("a") === ((4L, 200L, 100L, 10000L)))
    assert(gq("b") === ((1L, 700L, 700L, 700L)))
    val gm = Analytics.groupedMad(df, col("g"), col("v"))
      .select($"grp", $"med_c", $"mad_c")
      .as[(String, Long, Long)].collect()
      .map { case (g, m, d) => g -> ((m, d)) }.toMap
    // devs for a vs med 200: {100, 0, 100, 9800} -> MAD = 100
    assert(gm("a") === ((200L, 100L)))
    assert(gm("b") === ((700L, 0L)))
  }

  test("mean test: planted lift detected, identical arms give z ~ 0") {
    import spark.implicits._
    val lifted = ((1 to 400).map(i => ("a", 10.0 + (i % 7))) ++
      (1 to 400).map(i => ("b", 14.0 + (i % 7)))).toDF("arm", "value")
    val z1 = Analytics.meanTest(lifted, col("arm"), "a", "b", col("value"))
      .select($"mean_a", $"mean_b", $"z")
      .as[(Double, Double, Option[Double])].collect().head
    assert(z1._2 - z1._1 === 400.0) // means are on the cents grid
    assert(z1._3.get > 10.0, s"strong lift must give a large z: ${z1._3}")
    val same = ((1 to 400).map(i => ("a", 10.0 + (i % 7))) ++
      (1 to 400).map(i => ("b", 10.0 + (i % 7)))).toDF("arm", "value")
    val z0 = Analytics.meanTest(same, col("arm"), "a", "b", col("value"))
      .select($"z").as[Option[Double]].collect().head.get
    assert(z0 === 0.0)
  }

  test("cuped: perfect covariate removes all variance; flat covariate removes none") {
    import spark.implicits._
    import java.sql.Timestamp
    val pre = Timestamp.valueOf("2024-01-10 00:00:00")
    val post = Timestamp.valueOf("2024-01-20 00:00:00")
    val cut = lit("2024-01-15").cast("timestamp")
    // each user's post metric EQUALS the pre covariate -> theta=1, Y' constant
    val perfect = (1L to 50L).flatMap(u => Seq(
      (u, pre, u * 2.0), (u, post, u * 2.0))).toDF("user_id", "ts", "value")
    val p = Analytics.cupedReport(perfect, cut)
      .select($"theta", $"var_reduction").as[(Double, Double)].collect().head
    assert(p._1 === 1.0 && p._2 === 1.0)
    // constant covariate: no signal -> theta 0, reduction 0
    val flat = (1L to 50L).flatMap(u => Seq(
      (u, pre, 5.0), (u, post, u * 3.0))).toDF("user_id", "ts", "value")
    val f = Analytics.cupedReport(flat, cut)
      .select($"theta", $"var_reduction").as[(Double, Double)].collect().head
    assert(f._1 === 0.0 && f._2 === 0.0)
  }

  test("poisson bootstrap: constant data gives zero SE; replicates resample properly") {
    import spark.implicits._
    val const = (1L to 400L).map(i => (i, 500L)).toDF("k", "v")
    val repsC = Analytics.bootstrapReplicates(const, col("k"), col("v"), b = 8)
    // every replicate of a constant column has the same mean -> SE exactly 0
    assert(Analytics.bootstrapSe(repsC) === 0.0)
    val got = repsC.select($"rep", $"n_eff", $"mean")
      .as[(Int, Long, Double)].collect()
    assert(got.length === 8)
    // Poisson(1) weights: each replicate's effective n is near 400 but
    // varies (resampling actually happened); no replicate is empty
    assert(got.forall { case (_, n, m) => n > 300 && n < 500 && m === 500.0 })
    assert(got.map(_._2).distinct.length > 1, "weights must vary across reps")
    // non-constant data: replicate means differ, SE positive and small
    // relative to the spread of a uniform 0..999 population
    val varied = (1L to 400L).map(i => (i, i % 1000)).toDF("k", "v")
    val se = Analytics.bootstrapSe(
      Analytics.bootstrapReplicates(varied, col("k"), col("v"), b = 16))
    assert(se > 0.0 && se < 60.0, s"se=$se")
  }

  test("hll daily table lifecycle: merge is lossless, erasure rebuilds only touched days and reuses untouched bytes verbatim") {
    import graft.analytics.Analytics
    def ts(day: Int): Timestamp = new Timestamp(day * 86400L * 1000)
    // day 1: users 1,2,3 + doomed 93; day 2: users 4,5 + doomed 93;
    // day 3: users 6,7 (untouched); day 4: ONLY the doomed user
    val rows = Seq(
      (1L, 1L, ts(1)), (2L, 2L, ts(1)), (3L, 3L, ts(1)), (4L, 93L, ts(1)),
      (5L, 4L, ts(2)), (6L, 5L, ts(2)), (7L, 93L, ts(2)),
      (8L, 6L, ts(3)), (9L, 7L, ts(3)),
      (10L, 93L, ts(4)))
    val ev = rows.toDF("event_id", "user_id", "ts")
    val doom = $"user_id" === 93L

    // merge: halves folded by same-day sketch union give the same per-day
    // estimates as one build (exact at this scale)
    val full = Analytics.hllDailyBuild(ev)
    val merged = Analytics.hllDailyMerge(
      Analytics.hllDailyBuild(ev.filter($"event_id" % 2 === 0)),
      Analytics.hllDailyBuild(ev.filter($"event_id" % 2 === 1)))
    def estimates(t: org.apache.spark.sql.DataFrame): Map[String, Long] =
      t.select($"day".cast("string"),
          org.apache.spark.sql.functions.hll_sketch_estimate($"sk").as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estimates(merged) === estimates(full))

    // erasure: days 1,2,4 are touched (93 appears), day 3 is not
    val after = Analytics.hllDailyDelete(full, ev.filter(!doom),
      ev.filter(doom))
    def bytes(t: org.apache.spark.sql.DataFrame): Map[String, Seq[Byte]] =
      t.select($"day".cast("string"), $"sk").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
    val beforeB = bytes(full)
    val afterB = bytes(after)
    // untouched day's artifact bytes are REUSED, not rebuilt
    assert(afterB("1970-01-04") === beforeB("1970-01-04"))
    // fully-doomed day legitimately vanishes
    assert(!afterB.contains("1970-01-05"), afterB.keySet.toString)
    // touched days match a fresh build over the survivors bit-exactly
    val survB = bytes(Analytics.hllDailyBuild(ev.filter(!doom)))
    assert(afterB("1970-01-02") === survB("1970-01-02"))
    assert(afterB("1970-01-03") === survB("1970-01-03"))
    // and the period estimate holds the published contract
    val contract = Analytics.hllUniquesFromTable(after, ev.filter(!doom))
      .collect().head
    assert(contract.getAs[Long]("exact_users") === 7L)
    assert(contract.getAs[Boolean]("sketch_within_5pct"))
  }
}
