package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Scheduled-job-COUNT contracts for the iterative operators: the clustering
  * fixpoint is job-count-bound (each round = one action), so the job total
  * is the cost that matters and the one that silently regresses — a
  * wall-clock assertion would be host-noise-bound, a job count is exact.
  * Pins the round-5 budget: min-seeded labels + lazy checkpoints converge a
  * planted two-component graph within one confirm round. */
class JobCountSpec extends SparkTestBase {
  import spark.implicits._

  private def countJobs(f: => Unit): Int = {
    val jobs = new AtomicInteger()
    val l = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try { f; Thread.sleep(300) /* listener delivery lag */ }
    finally spark.sparkContext.removeSparkListener(l)
    jobs.get()
  }

  test("clusters: planted graph converges within the job budget") {
    // two chains (0-1-2, 10-11) + the empty-singleton case exercised via
    // pair-less ids being absent entirely
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val n = countJobs {
      Dedup.clusters(pairs).write.format("noop").mode("overwrite").save()
    }
    // measured 15 on the round-5 structure: init (edges + labels lazy
    // checkpoints materialize as their own jobs + the seed sum), the
    // 2-round fixpoint (chain 0-1-2 needs one propagation + one confirm,
    // each = propagate checkpoint + sum), and the noop write. Budget 18:
    // the pre-round-5 shape (eager checkpoints, distinct-init, no min
    // seeding) was ~1.6× this and must trip the assert.
    assert(n <= 18, s"clusters scheduled $n jobs on a 3-edge graph")
    // correctness alongside the budget: both components min-labeled
    val got = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L))
  }
}
