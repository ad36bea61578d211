package graft

import graft.streaming.{Redrive, StatePointer}

/** The deterministic-re-drive contract every streamed catalog row now
  * drives through (the r13 ADVICE fix): a fresh dir folds everything, a
  * died-mid-prefix dir folds ONLY the un-applied suffix, a completed dir
  * serves WITHOUT invoking the drive at all (the steady-state a bench
  * pass ≥ 2 must measure — not a replayCheck throw, not a re-drive), and
  * a pointer ahead of the declared final id throws (two rows sharing a
  * state dir with divergent batch sequences). Plus the tightened
  * [[StatePointer.replayCheck]]: skip is ONLY for the committed id
  * itself; any id strictly behind the pointer throws. */
class RedriveSpec extends SparkTestBase {

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("redrive").toString

  test("fresh dir drives every batch 0..final") {
    val dir = freshDir()
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    Redrive(spark, dir, 2L) { b =>
      seen += b
      StatePointer.advance(spark, dir, b)
    }
    assert(seen.toSeq === Seq(0L, 1L, 2L))
    assert(StatePointer.read(spark, dir) === Some(2L))
  }

  test("died-mid-prefix dir resumes the un-applied suffix only") {
    val dir = freshDir()
    StatePointer.advance(spark, dir, 0L) // a previous run died after batch 0
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    Redrive(spark, dir, 3L) { b =>
      seen += b
      StatePointer.advance(spark, dir, b)
    }
    assert(seen.toSeq === Seq(1L, 2L, 3L))
  }

  test("completed dir serves without invoking the drive (bench pass >= 2)") {
    val dir = freshDir()
    Redrive(spark, dir, 2L)(b => StatePointer.advance(spark, dir, b))
    var invoked = false
    Redrive(spark, dir, 2L) { _ => invoked = true }
    assert(!invoked, "a completed fold must serve as-is, never re-drive")
    assert(StatePointer.read(spark, dir) === Some(2L))
  }

  test("pointer ahead of the declared final id throws (shared-dir mismatch)") {
    val dir = freshDir()
    Redrive(spark, dir, 3L)(b => StatePointer.advance(spark, dir, b))
    val err = intercept[IllegalStateException] {
      Redrive(spark, dir, 2L)(_ => fail("must not drive"))
    }
    assert(err.getMessage.contains("ahead"))
  }

  test("replayCheck: committed id skips, behind-the-pointer throws, next id proceeds") {
    val dir = freshDir()
    StatePointer.advance(spark, dir, 2L)
    assert(StatePointer.replayCheck(spark, dir, 2L),
      "the committed id is the one foreachBatch re-delivers — skip")
    assert(!StatePointer.replayCheck(spark, dir, 3L))
    // one-behind is NOT a legitimate replay (foreachBatch never
    // re-delivers a committed-and-superseded id): fresh checkpoint over
    // existing state — must throw, not no-op (the r13 ADVICE low item)
    intercept[IllegalStateException](StatePointer.replayCheck(spark, dir, 1L))
    intercept[IllegalStateException](StatePointer.replayCheck(spark, dir, 0L))
  }

  test("a streamed catalog row re-invoked over persisted state serves identically (the bench shape)") {
    // the exact bench-mode sequence: same row, same state dir, three
    // invocations — pass 1 folds, passes 2-3 must serve the SAME result
    // without throwing (r13's regression threw here and the bench
    // recorded time-to-throw as the pin)
    import spark.implicits._
    val docs = (0L until 12L)
      .map(i => (i, s"alpha beta gamma delta token$i"))
      .toDF("doc_id", "text")
    val dir = freshDir()
    def invoke() = {
      Redrive(spark, dir, 2L) { b =>
        streaming.StreamingIndex.applyBatch(
          docs.filter($"doc_id" % 3 === b), dir, b, maxSegments = 3)
      }
      streaming.StreamingIndex.vacuum(spark, dir)
      llm.Search.renderIndex(
          streaming.StreamingIndex.readIndex(spark, dir))
        .orderBy($"gram").collect().toSeq
    }
    val first = invoke()
    assert(first.nonEmpty)
    assert(invoke() === first)
    assert(invoke() === first)
  }
}
