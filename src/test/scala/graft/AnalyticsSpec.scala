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
}
