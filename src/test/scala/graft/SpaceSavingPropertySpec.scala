package graft

import graft.expr.SpaceSavingTopK
import org.apache.spark.unsafe.types.UTF8String

/** Property pins for the SpaceSaving summary itself (driver-side, no Spark
  * jobs — the Summary class is plain JVM code): the classic guarantees must
  * hold for EVERY stream and capacity, not just the planted spec cases.
  * 200 seeded random (stream, capacity, split) trials; random merge splits
  * model Spark's partial/final aggregation. */
class SpaceSavingPropertySpec extends SparkTestBase {

  private def utf8(s: String) = UTF8String.fromString(s)

  /** Skewed random stream: heavy 3-item head, 20-item middle, 200-item
    * tail — the regime SpaceSaving exists for. */
  private def randomStream(rng: scala.util.Random): List[String] = {
    val n = rng.nextInt(300)
    List.fill(n) {
      rng.nextInt(12) match {
        case x if x < 8 => ("a" :: "b" :: "c" :: Nil)(rng.nextInt(3))
        case x if x < 11 => s"m${rng.nextInt(20)}"
        case _ => s"t${rng.nextInt(200)}"
      }
    }
  }

  private def summarize(items: Seq[String], cap: Int): SpaceSavingTopK.Summary = {
    val s = new SpaceSavingTopK.Summary(cap)
    items.foreach(i => s.add(utf8(i), 1L))
    s
  }

  private def entries(s: SpaceSavingTopK.Summary): Map[String, (Long, Long)] = {
    val b = Map.newBuilder[String, (Long, Long)]
    s.foreach((item, cnt, err) => b += item.toString -> (cnt, err))
    b.result()
  }

  private def checkBounds(truth: Map[String, Long],
      got: Map[String, (Long, Long)], cap: Int, tag: String): Unit = {
    assert(got.size <= cap, s"$tag: size ${got.size} > cap $cap")
    got.foreach { case (item, (cnt, err)) =>
      val t = truth.getOrElse(item, 0L)
      assert(cnt >= t, s"$tag: underestimate for $item: $cnt < $t")
      assert(cnt - err <= t, s"$tag: lower bound broken for $item: ${cnt - err} > $t")
    }
  }

  test("200 random trials: overestimate bound, presence, merge, round-trip") {
    val rng = new scala.util.Random(0xC0FFEE)
    (1 to 200).foreach { trial =>
      val items = randomStream(rng)
      val cap = 1 + rng.nextInt(40)
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap

      // single-summary guarantees
      val single = entries(summarize(items, cap))
      checkBounds(truth, single, cap, s"t$trial single")
      // counter sum = n ⇒ min counter ≤ n/cap ⇒ anything heavier is present
      val n = items.size.toLong
      truth.foreach { case (item, t) =>
        if (t.toDouble > n.toDouble / cap)
          assert(single.contains(item), s"t$trial: heavy $item lost (true $t, n $n)")
      }

      // merged-summary guarantees under a random split (partial/final agg)
      val cut = if (items.isEmpty) 0 else rng.nextInt(items.size + 1)
      val (left, right) = items.splitAt(cut)
      val merged = summarize(left, cap)
      merged.mergeIn(summarize(right, cap))
      val got = entries(merged)
      checkBounds(truth, got, cap, s"t$trial merged")
      // exact regime survives merging
      if (truth.size <= cap) {
        assert(got.view.mapValues(_._1).toMap === truth, s"t$trial exact regime")
        assert(got.values.forall(_._2 == 0L), s"t$trial exact errs")
      }

      // serialization round-trip is lossless
      val agg = SpaceSavingTopK(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), cap)
      val back = agg.deserialize(agg.serialize(merged))
      assert(entries(back) === got, s"t$trial roundtrip")
      assert(back.capacity === cap)
    }
  }
}
