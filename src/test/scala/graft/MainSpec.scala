package graft

import java.nio.file.Files
import java.util.Base64

import org.apache.spark.sql.streaming.Trigger

/** O15 end-to-end: the daemon composition (config → source → transform →
  * sink → ack) driven against the recording transport, including the
  * checkpoint-as-ack restart contract. */
class MainSpec extends SparkTestBase {

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def envelope(uid: String, time: Long): String =
    b64(s"""{"jsonPayload":{"user_id":"$uid","device_id":"d-$uid","event_type":"e","time":$time},""" +
      s""""attributes":{"logging.googleapis.com/timestamp":"2024-01-01T00:00:00.000Z"}}""")

  test("config validation reports ALL missing variables") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig.fromEnv(Map("HMAC_KEY" -> "k"))
    }
    for (v <- Seq("AMPLITUDE_API_KEY", "MAX_EVENTS_PER_BATCH",
        "GRAFT_SOURCE_DIR", "GRAFT_CHECKPOINT_DIR"))
      assert(e.getMessage.contains(v))
    assert(!e.getMessage.contains("HMAC_KEY"))
  }

  test("supervisor restarts a failed stream; redelivery completes the send") {
    val src = Files.createTempDirectory("graft-sv-src").toFile
    val ckpt = Files.createTempDirectory("graft-sv-ckpt").toFile
    val cfg = GraftConfig(
      amplitudeApiKey = "key-sv", hmacKey = "graft-test-key",
      maxEventsPerBatch = 10, sourceDir = src.getAbsolutePath,
      checkpointDir = ckpt.getAbsolutePath, maxRetries = 0)
    Files.writeString(new java.io.File(src, "b.txt").toPath, envelope("u9", 900) + "\n")
    // first POST fails terminally (maxRetries=0) -> query fails -> the
    // supervisor restarts from the uncommitted checkpoint -> redelivery
    // succeeds on the now-healthy transport
    FlakyPoster.reset(failures = 1)
    val restarts = Main.runSupervised(spark, cfg, poster = FlakyPoster,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      maxRestarts = 3, restartBackoffMs = 50L)
    assert(restarts === 1)
    assert(FlakyPoster.attempts === 2) // the failed POST + the redelivered one
  }

  test("daemon end-to-end: reads, transforms, posts, acks via checkpoint") {
    val src = Files.createTempDirectory("graft-src").toFile
    val ckpt = Files.createTempDirectory("graft-ckpt").toFile
    val cfg = GraftConfig(
      amplitudeApiKey = "key-1", hmacKey = "graft-test-key",
      maxEventsPerBatch = 10, sourceDir = src.getAbsolutePath,
      checkpointDir = ckpt.getAbsolutePath)

    RecordingPoster.reset()
    Files.writeString(new java.io.File(src, "batch1.txt").toPath,
      envelope("u1", 1000) + "\n" + envelope("u2", 2000) + "\n")
    val q1 = Main.start(spark, cfg, poster = RecordingPoster,
      trigger = Trigger.AvailableNow())
    q1.processAllAvailable(); q1.stop()
    // one POST per non-empty partition of the batch (all ≤ maxPerRequest)
    val sent1 = RecordingPoster.bodies.mkString("\n")
    assert(RecordingPoster.bodies.forall(_.startsWith("""{"api_key":"key-1","events":[""")))
    assert(sent1.contains("\"device_id\":\"d-u1\""))
    assert(sent1.contains("\"device_id\":\"d-u2\""))

    // restart with one NEW file: the checkpoint (ack ledger) must prevent
    // re-sending batch1 — only u3 goes out
    RecordingPoster.reset()
    Files.writeString(new java.io.File(src, "batch2.txt").toPath,
      envelope("u3", 3000) + "\n")
    val q2 = Main.start(spark, cfg, poster = RecordingPoster,
      trigger = Trigger.AvailableNow())
    q2.processAllAvailable(); q2.stop()
    val sent2 = RecordingPoster.bodies.mkString("\n")
    assert(sent2.contains("\"device_id\":\"d-u3\""))
    assert(!sent2.contains("\"device_id\":\"d-u1\""))
  }
}
