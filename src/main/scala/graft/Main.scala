package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

import graft.sink.AmplitudeSink
import graft.streaming.StreamingPipeline

/** O15 — the runnable daemon: the engine form of the reference's `main()`
  * loop (`synchronous-pull.js:23-109`).
  *
  * Mapping:
  *   - env validation → [[GraftConfig.fromEnv]] (fatal, lists ALL missing
  *     vars; reference `startup.error`, `synchronous-pull.js:18-21`)
  *   - pull loop with MAX_EVENTS_PER_BATCH → micro-batch trigger with
  *     `maxFilesPerTrigger` (`synchronous-pull.js:31-34,44`)
  *   - transform + send + retry → [[StreamingPipeline]] / [[AmplitudeSink]]
  *   - ack → checkpoint commit after a successful `foreachBatch`
  *   - `events.processed` per-batch log (`synchronous-pull.js:94-101`) →
  *     [[Main.ProgressLogger]] over `observedMetrics`
  *   - SIGINT/SIGTERM graceful stop (`synchronous-pull.js:36-42,107-109`) →
  *     JVM shutdown hook calling `query.stop()`; the current micro-batch
  *     finishes (and acks) before the process exits, matching the
  *     reference's finish-current-iteration semantics.
  */
object Main {

  @transient private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.fromEnv() // throws with the full missing-var list
    val b = SparkSession.builder()
      .appName("graft-amplitude-send")
      .config("spark.sql.session.timeZone", "UTC")
    // master normally comes from spark-submit; GRAFT_MASTER covers bare runs
    sys.env.get("GRAFT_MASTER").orElse(Some("local[*]"))
      .foreach(m => if (!sys.props.contains("spark.master")) b.master(m))
    val spark = b.getOrCreate()
    runSupervised(spark, cfg)
  }

  @volatile private var shuttingDown = false

  /** The reference's error-and-continue loop (`pubsub.pull.error`,
    * `synchronous-pull.js:45-51`: a failed pull is logged and the loop
    * continues): a failed stream is logged and restarted from the
    * checkpoint after a backoff — unsent batches were never committed, so
    * the source redelivers and insert_id dedup neutralizes any partial
    * delivery. `maxRestarts < 0` = restart forever (the daemon form);
    * tests pass a bound. Returns the number of restarts consumed. */
  def runSupervised(spark: SparkSession, cfg: GraftConfig,
      poster: AmplitudeSink.Poster = AmplitudeSink.HttpPoster,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      maxRestarts: Int = -1, restartBackoffMs: Long = 5000L): Int = {
    var restarts = 0
    var query = start(spark, cfg, poster, trigger)
    val hook = new Thread(() => {
      shuttingDown = true
      log.info("""{"type":"shutdown","msg":"stopping stream"}""")
      try query.stop() catch { case _: Exception => () }
    })
    Runtime.getRuntime.addShutdownHook(hook)
    try {
      var done = false
      while (!done) {
        try {
          query.awaitTermination() // normal stop or AvailableNow completion
          done = true
        } catch {
          case e: Exception if !shuttingDown &&
              (maxRestarts < 0 || restarts < maxRestarts) =>
            restarts += 1
            // first line only: Spark appends the full logical plan to
            // streaming exceptions — that belongs in debug logs, not the
            // structured error channel
            val msg = String.valueOf(e.getMessage).takeWhile(_ != '\n').take(400)
            log.warn(s"""{"type":"stream.error","restart":$restarts,"error":${
              "\"" + msg.replace("\\", "\\\\").replace("\"", "\\\"") + "\""}}""")
            Thread.sleep(restartBackoffMs)
            query = start(spark, cfg, poster, trigger)
        }
      }
      restarts
    } finally {
      try Runtime.getRuntime.removeShutdownHook(hook)
      catch { case _: IllegalStateException => () } // JVM already exiting
    }
  }

  /** Compose config → source → transform → sink and start the stream.
    * `poster`/`trigger` are injectable for tests (recording transport,
    * `Trigger.AvailableNow`). */
  def start(spark: SparkSession, cfg: GraftConfig,
      poster: AmplitudeSink.Poster = AmplitudeSink.HttpPoster,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    spark.streams.addListener(ProgressLogger)
    val raw = StreamingPipeline.readEnvelopes(spark, cfg.sourceDir,
      maxFilesPerTrigger = Some(cfg.maxEventsPerBatch))
    val flat = StreamingPipeline.transform(raw, cfg.hmacKey)
    StreamingPipeline.writer(flat,
      AmplitudeSink.Config(
        apiKey = cfg.amplitudeApiKey,
        maxPerRequest = cfg.maxEventsPerBatch,
        maxRetries = cfg.maxRetries,
        timeoutMs = cfg.httpTimeoutMs,
        poster = poster),
      cfg.checkpointDir, trigger).start()
  }

  /** The reference's `events.processed` info log per batch
    * (`synchronous-pull.js:94-101`), fed from the `parse`/`batch` observe()
    * counters carried by the pipeline. */
  object ProgressLogger extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val om = e.progress.observedMetrics
      val parse = Option(om.get("parse"))
      val batch = Option(om.get("batch"))
      if (parse.nonEmpty || batch.nonEmpty) {
        def l(r: Option[org.apache.spark.sql.Row], f: String): Long =
          r.map(_.getAs[Long](f)).getOrElse(0L)
        def s(r: Option[org.apache.spark.sql.Row], f: String): String =
          r.flatMap(x => Option(x.getAs[String](f))).getOrElse("")
        log.info(
          s"""{"type":"events.processed"""" +
            s""","minPublishedTime":"${s(batch, "min_publish_time")}"""" +
            s""","maxPublishedTime":"${s(batch, "max_publish_time")}"""" +
            s""","inputCount":${l(parse, "input_count")}""" +
            s""","outputCount":${l(batch, "output_count")}""" +
            s""","invalidCount":${l(parse, "invalid_count")}""" +
            s""","repairedCount":${l(parse, "repaired_count")}}""")
      }
    }
  }
}
