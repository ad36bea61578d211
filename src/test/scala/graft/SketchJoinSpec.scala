package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.llm.{Decontam, Dedup, Sketch, Similarity}

/** Round-7 session-5 additions: KMV/theta distinct sketch, prefix-filtering
  * exact set-similarity join, and 1-bit binary embedding quantization. */
class SketchJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def randomDocs(rng: Random, n: Int, vocab: Int): Seq[(Long, String)] =
    (0L until n).map { i =>
      val len = 5 + rng.nextInt(30)
      (i, List.fill(len)(s"w${rng.nextInt(vocab)}").mkString(" "))
    }

  test("prefix join == naive blocked all-pairs truth on random corpora") {
    for (trial <- 1 to 3) {
      val rng = new Random(500 + trial)
      // small vocab forces heavy overlap — the hard case for the filter;
      // a planted duplicate pair guarantees ≥ 1 output row
      val base = randomDocs(rng, 40, 12)
      val docs = (base :+ ((40L, base(3)._2))).toDF("doc_id", "text")
      val t = 0.3 + 0.2 * rng.nextDouble()
      val got = Dedup.prefixJaccardPairs(docs, threshold = t, n = 2)
        .orderBy($"id_a", $"id_b")
        .select($"id_a", $"id_b", round($"jaccard", 9)).collect().toSeq
      val want = Dedup.ngramJaccardPairs(
          docs.withColumn("_all", lit(1)), "_all", n = 2,
          threshold = t, maxDf = Int.MaxValue)
        .orderBy($"id_a", $"id_b")
        .select($"id_a", $"id_b", round($"jaccard", 9)).collect().toSeq
      assert(got.nonEmpty, s"trial $trial: planted dup not found")
      assert(got === want, s"trial $trial t=$t")
    }
  }

  test("KMV: sharded-merge identity, exact-when-unsaturated, bounded error") {
    for (trial <- 1 to 3) {
      val rng = new Random(900 + trial)
      val k = 32
      val vals = (0 until 400).map(i => (s"g${i % 2}", s"v${rng.nextInt(300)}"))
        .toDF("grp", "v")
      val full = Sketch.kmvBuild(vals, "grp", "v", k)
      // merge identity: re-bottom-k of the union of shard sketches
      val shardA = Sketch.kmvBuild(vals.filter(xxhash64($"v") % 2 === 0), "grp", "v", k)
      val shardB = Sketch.kmvBuild(vals.filter(xxhash64($"v") % 2 =!= 0), "grp", "v", k)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"grp").orderBy($"u")
      val merged = shardA.union(shardB).select($"grp", $"u").distinct()
        .withColumn("rnk", row_number().over(w)).filter($"rnk" <= k)
      assert(merged.orderBy($"grp", $"u").collect().toSeq ===
        full.orderBy($"grp", $"u").collect().toSeq, s"trial $trial merge")
      // unsaturated group is exact
      val tiny = (1 to 10).map(i => ("t", s"x$i")).toDF("grp", "v")
      val est0 = Sketch.kmvEstimate(Sketch.kmvBuild(tiny, "grp", "v", k), k)
        .select($"est_distinct").as[Double].head()
      assert(est0 === 10.0, s"trial $trial unsaturated")
      // saturated estimate within 3 standard errors (~1/sqrt(k-2))
      val exact = vals.filter($"grp" === "g0").select($"v").distinct().count()
      val est = Sketch.kmvEstimate(full, k).filter($"grp" === "g0")
        .select($"est_distinct").as[Double].head()
      val relErr = math.abs(est - exact) / exact
      assert(relErr <= 3.0 / math.sqrt(k - 2), s"trial $trial err=$relErr")
    }
  }

  test("KMV theta set ops: exact on unsaturated groups, bounded when saturated") {
    // unsaturated: theta = 1 for both sides, so union/intersect are EXACT
    val vals = ((1 to 20).map(i => ("a", s"v$i")) ++
      (11 to 25).map(i => ("b", s"v$i"))).toDF("grp", "v")
    val sk = Sketch.kmvBuild(vals, "grp", "v", k = 64)
    val row = Sketch.kmvSetOps(sk, k = 64, "a", "b").head()
    assert(row.getDouble(0) === 25.0 && row.getDouble(1) === 10.0)
    // saturated: error within 3/sqrt(k-2) of truth for the union
    val rng = new Random(7)
    val big = ((0 until 500).map(_ => ("a", s"u${rng.nextInt(400)}")) ++
      (0 until 500).map(_ => ("b", s"u${rng.nextInt(400) + 200}"))).toDF("grp", "v")
    val k = 64
    val skB = Sketch.kmvBuild(big, "grp", "v", k)
    val got = Sketch.kmvSetOps(skB, k, "a", "b").head()
    val exactU = big.select($"v").distinct().count().toDouble
    assert(math.abs(got.getDouble(0) - exactU) / exactU <= 3.0 / math.sqrt(k - 2))
  }

  test("signBits packs sign bits MSB-first; binaryKnn finds planted duplicate") {
    // 64-dim vector with only dim 0 positive → bit 63 (MSB of the fold)
    val v0 = Array.fill(64)(-1.0f); v0(0) = 1.0f
    val v63 = Array.fill(64)(-1.0f); v63(63) = 1.0f
    val sigs = Seq((0L, v0.toSeq), (1L, v63.toSeq)).toDF("vec_id", "embedding")
      .select($"vec_id", Similarity.signBits($"embedding").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) === Long.MinValue) // bit 63 alone = sign bit
    assert(sigs(1L) === 1L)
    // planted near-identical pair: binary shortlist + rerank must rank it #1
    val rng = new Random(11)
    val base = Array.fill(64)(rng.nextGaussian().toFloat)
    val emb = ((2L until 40L).map(i =>
      (i, Array.fill(64)(rng.nextGaussian().toFloat).toSeq)) ++
      Seq((0L, base.toSeq), (1L, base.map(x => x * 1.01f).toSeq)))
      .toDF("vec_id", "embedding")
    val top = Similarity.binaryKnn(emb, $"vec_id" === 0L, k = 1, candidates = 5)
      .select($"neighbor_id").as[Long].head()
    assert(top === 1L)
  }

  test("PSI: zero on identical distributions, flags a planted shift") {
    import graft.llm.Drift
    // two groups with the SAME length profile → p = q exactly → psi = 0
    val same = (0 until 200).map(i => (s"g${i % 2}", 100L + (i / 2 % 5) * 200L))
      .toDF("grp", "len")
    val psi0 = Drift.psi(same, "grp", col("len"), binWidth = 200L)
      .select($"psi").as[Double].collect()
    assert(psi0.forall(math.abs(_) < 1e-6), psi0.mkString(","))
    // planted shift: g1's lengths move 5 bands up → its psi must dominate
    val shifted = ((0 until 100).map(i => ("g0", 100L + (i % 5) * 200L)) ++
      (0 until 100).map(i => ("g1", 1100L + (i % 5) * 200L))).toDF("grp", "len")
    val byGrp = Drift.psi(shifted, "grp", col("len"), binWidth = 200L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byGrp("g1") > 0.25, s"shift not flagged: $byGrp")
  }

  test("distinctive terms: a group-exclusive planted term ranks first") {
    val rng = new Random(21)
    val docs = ((0 until 30).map(i =>
      (i.toLong, "alpha", ("zebra " * 5) +
        List.fill(20)(s"c${rng.nextInt(40)}").mkString(" "))) ++
      (30 until 60).map(i =>
        (i.toLong, "beta", List.fill(25)(s"c${rng.nextInt(40)}").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val top = graft.llm.TextAnalysis.distinctiveTerms(docs, "source", k = 3)
      .filter($"source" === "alpha" && $"rank" === 1)
      .select($"term").as[String].head()
    assert(top === "zebra")
  }

  test("multi-touch attribution: credits normalize; U-shape at n=3") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val events = Seq(
      (1L, ts(0), 7L, "view", 0.0, "{}"),
      (2L, ts(10), 7L, "click", 0.0, "{}"),
      (3L, ts(20), 7L, "view", 0.0, "{}"),
      (4L, ts(30), 7L, "purchase", 5.0, "{}"),
      (5L, ts(0), 8L, "view", 0.0, "{}"),
      (6L, ts(5), 8L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = analytics.Analytics.multiTouchAttribution(events).collect()
    val conv4 = out.filter(_.getAs[Long]("event_id") == 4L)
      .sortBy(_.getAs[Int]("position"))
    assert(conv4.map(_.getAs[Double]("credit_u")).toSeq === Seq(0.4, 0.2, 0.4))
    assert(math.abs(conv4.map(_.getAs[Double]("credit_decay")).sum - 1.0) < 1e-9)
    // single-touch conversion gets full credit under both models
    val conv6 = out.filter(_.getAs[Long]("event_id") == 6L)
    assert(conv6.length === 1 &&
      conv6.head.getAs[Double]("credit_u") === 1.0 &&
      conv6.head.getAs[Double]("credit_decay") === 1.0)
  }

  test("scd2 lookup: picks the interval covering the fact; pre-history is NULL") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    // user 1 states: A at t0, B at t10 → intervals [t0,t10), [t10,∞)
    val changes = Seq(
      (10L, ts(0), 1L, "A", 0.0, "{}"),
      (11L, ts(10), 1L, "B", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dim = analytics.Analytics.scd2History(changes)
    val facts = Seq(
      (100L, 1L, ts(5)),   // inside [t0,t10) → A
      (101L, 1L, ts(10)),  // boundary: half-open → B
      (102L, 1L, ts(99)),  // open interval → B
      (103L, 1L, ts(-5)))  // pre-history → NULL
      .toDF("event_id", "user_id", "ts")
    val got = analytics.Analytics.scd2Lookup(facts, dim)
      .select($"event_id", $"state").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(100L -> Some("A"), 101L -> Some("B"),
      102L -> Some("B"), 103L -> None))
  }

  test("kmvMerge == full rebuild on random shards") {
    for (trial <- 1 to 3) {
      val rng = new Random(37 + trial)
      val k = 16
      val vals = (0 until 300).map(i => (s"g${i % 3}", s"v${rng.nextInt(200)}"))
        .toDF("grp", "v")
      val full = Sketch.kmvBuild(vals, "grp", "v", k)
      val merged = Sketch.kmvMerge(
        Sketch.kmvBuild(vals.filter(xxhash64($"v") % 2 === 0), "grp", "v", k),
        Sketch.kmvBuild(vals.filter(xxhash64($"v") % 2 =!= 0), "grp", "v", k), k)
      assert(merged.orderBy($"grp", $"u").collect().toSeq ===
        full.orderBy($"grp", $"u").collect().toSeq, s"trial $trial")
    }
  }

  test("fuzzy match: planted typo variant found, distance exact, distant pair absent") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over dogs"),
      (1L, "the quick brawn fox jumps over dogs"), // 1 substitution
      (2L, "completely different text here now ok")).toDF("doc_id", "text")
    val got = Dedup.fuzzyMatchPairs(docs, prefixChars = 40, maxDist = 5)
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 1L, 1L)))
  }

  test("fuzzy match: segment prefilter ≡ all-pairs truth (varied lengths, shorts, rotations)") {
    // adversarial corpus for the PassJoin rail: planted pairs at every
    // distance 0..6, records SHORTER than maxDist+1 (the banded
    // fallback), length differences up to ±6, shift-heavy edits
    // (leading insertions move every segment), and duplicate texts
    val texts = Seq(
      "abcdefghijklmnopqrstuvwxyz0123456789ABCD", // base, 40 chars
      "abcdefghijklmnopqrstuvwxyz0123456789ABCD", // exact dup (d=0)
      "Xbcdefghijklmnopqrstuvwxyz0123456789ABCD", // 1 sub
      "XYabcdefghijklmnopqrstuvwxyz0123456789AB", // leading 2-insert + trunc
      "abcdefghijklmnopqrst",                     // 20 chars
      "abcdefghijklmnop",                         // 16 chars: len diff 4
      "abcdefghijklmno",                          // 15: len diff 5 from 20
      "ab", "abc", "a", "",                       // shorts (< k) incl empty
      "zyxwvutsrqponmlkjihgfedcba9876543210DCBA", // far from base
      "abcdeQghijklmnopqrstuvwxyz0123456789ABCD", // 1 sub mid
      "abcdefghijklmnopqrstuvwxyz0123456789",     // 36: 4 deletions
      "fghijklmnopqrstuvwxyz0123456789ABCD"       // 35: 5 leading dels
    )
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Dedup.fuzzyMatchPairs(docs, prefixChars = 40, maxDist = 5)
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Long)]
      .collect().toSet
    // truth: quadratic thresholded levenshtein over the same prefixes
    val recs = texts.map(_.take(40)).zipWithIndex
    val truth = (for {
      (ta, ia) <- recs; (tb, ib) <- recs
      if ia < ib && math.abs(ta.length - tb.length) <= 5
      d = {
        val dp = Array.tabulate(ta.length + 1, tb.length + 1) { (x, y) =>
          if (x == 0) y else if (y == 0) x else 0 }
        for (x <- 1 to ta.length; y <- 1 to tb.length)
          dp(x)(y) = math.min(math.min(dp(x - 1)(y) + 1, dp(x)(y - 1) + 1),
            dp(x - 1)(y - 1) + (if (ta(x - 1) == tb(y - 1)) 0 else 1))
        dp(ta.length)(tb.length)
      }
      if d <= 5
    } yield (ia.toLong, ib.toLong, d.toLong)).toSet
    assert(got === truth)
  }

  test("fuzzy match: domain blocking keeps in-block pairs, drops straddlers") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over dogs", "en"),
      (1L, "the quick brawn fox jumps over dogs", "en"), // in-block, d=1
      (2L, "the quick briwn fox jumps over dogs", "de"), // cross-block, d=1
      (3L, "the quick brwwn fox jumps over dogs", "de")) // in-block with 2
      .toDF("doc_id", "text", "lang")
    val got = Dedup.fuzzyMatchPairs(docs, prefixChars = 40, maxDist = 5,
        blockCols = Seq("lang"))
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 1L, 1L), (2L, 3L, 1L)))
  }

  test("duplicated spans: planted shared run yields exact maximal span; cut is surgical") {
    val docs = Seq(
      (0L, "a b c d e f g h i j"),
      (1L, "z1 z2 d e f g h z3 z4 z5"),
      (2L, "totally unrelated words here padding ok"),
      (3L, "xx yy"), // short-doc fallback pair: exact dup of 4
      (4L, "xx yy")).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, windowTokens = 3)
    val got = spans.select($"doc_id", $"span_start", $"span_end", $"n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 0 shares tokens d..h (positions 3..7) with doc 1 (positions 2..6);
    // the 3 duplicated window starts merge into ONE maximal span each.
    // Short exact-dup pair: fallback whole-text window, end clamped to n-1.
    assert(got === Set((0L, 3L, 7L, 5L), (1L, 2L, 6L, 5L),
      (3L, 0L, 1L, 2L), (4L, 0L, 1L, 2L)))
    val clean = Dedup.removeSpans(docs, spans)
      .select($"doc_id", $"clean_text").as[(Long, String)].collect().toMap
    assert(clean(0L) === "a b c i j")
    assert(clean(1L) === "z1 z2 z3 z4 z5")
    assert(clean(2L) === "totally unrelated words here padding ok")
    assert(clean(3L) === "" && clean(4L) === "")
  }

  test("duplicated spans: overlapping coverage merges, disjoint spans stay split") {
    // merge rule: duplicated starts p, q merge while q − p ≤ W.
    // docs 0/1 share windows at starts 0 and 4 (gap 4 > W=3): coverage
    // [0,2] and [4,6] has a one-token hole at 3 ⇒ two spans.
    // docs 2/3 share starts 0..3 (consecutive) ⇒ one span [0,5].
    val docs = Seq(
      (0L, "p q r s1 m n o t1 t2"),
      (1L, "p q r u1 m n o u2 u3"),
      (2L, "f g h i j k vv ww"),
      (3L, "f g h i j k xx yy")).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, windowTokens = 3)
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 0L, 2L), (0L, 4L, 6L), (1L, 0L, 2L), (1L, 4L, 6L),
      (2L, 0L, 5L), (3L, 0L, 5L)))
  }

  test("incremental spans: maintained window counts = full recompute on batch") {
    val rng = new Random(71)
    def sentence() = (0 until 12).map(_ => s"w${rng.nextInt(40)}").mkString(" ")
    val shared = "s1 s2 s3 s4 s5"
    // corpus docs 0-5 (two carry the shared run), batch docs 10-13 (two
    // carry it — one duplicating corpus, one duplicating within-batch)
    val docs = (Seq(
      (0L, s"${sentence()} $shared ${sentence()}"),
      (1L, s"$shared ${sentence()}")) ++
      (2L to 5L).map(i => (i, sentence())) ++ Seq(
      (10L, s"${sentence()} $shared"),
      (11L, sentence()),
      (12L, s"aa bb cc dd ee ff ${sentence()}"),
      (13L, s"zz aa bb cc dd ee ff ${sentence()}")))
      .toDF("doc_id", "text")
    val full = Dedup.duplicatedSpans(docs, windowTokens = 3)
      .filter($"doc_id" >= 10L)
      .select($"doc_id", $"span_start", $"span_end", $"n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    val incr = Dedup.incrementalSpans(
        docs.filter($"doc_id" >= 10L),
        Dedup.windowDf(docs.filter($"doc_id" < 10L), windowTokens = 3),
        windowTokens = 3)
      .select($"doc_id", $"span_start", $"span_end", $"n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(incr === full)
    assert(full.exists(_._1 == 10L), "corpus-vs-batch duplication found")
    assert(full.exists(_._1 == 12L) && full.exists(_._1 == 13L),
      "within-batch duplication found")
  }

  test("team draft: alternating teams per round, unique picks from own lists") {
    val rng = new Random(83)
    val qids = 0L until 6L
    def ranking(base: Long) = qids.flatMap { q =>
      val ids = rng.shuffle((100L until 130L).toList).take(5)
      ids.zipWithIndex.map { case (id, i) => (q, i + 1, id + base) }
    }.toDF("qid", "rank", "neighbor_id")
    val ra = ranking(0L); val rb = ranking(1000L) // disjoint id spaces
    val la = ra.as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val lb = rb.as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val out = graft.llm.Eval.teamDraft(ra, rb, rounds = 2)
      .as[(Long, Long, Long, String)].collect()
    qids.foreach { q =>
      val picks = out.filter(_._1 == q).sortBy(_._2)
      assert(picks.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L))
      assert(picks.map(_._3).distinct.length === 4, "unique picks")
      val teams = picks.map(_._4).toSeq
      assert(teams(1) != teams(0) && teams(3) != teams(2),
        "second pick of each round goes to the other team")
      picks.foreach { case (_, _, id, team) =>
        val lst = if (team == "A") la(q) else lb(q)
        assert(lst.contains(id), s"pick $id not in team $team's list")
      }
      // with disjoint id spaces each team drafts its own top-2 in order
      assert(picks.filter(_._4 == "A").map(_._3).toSeq === la(q).take(2))
      assert(picks.filter(_._4 == "B").map(_._3).toSeq === lb(q).take(2))
    }
  }

  test("leak-free split: every cluster lands whole in one split") {
    val rng = new Random(67)
    def noise() = List.fill(2)(s"n${rng.nextInt(100000)}").mkString(" ")
    // 30 planted exact-dup pairs (disjoint vocab per pair) + 40 singletons
    val docs = ((0L until 60L by 2L).flatMap { i =>
      val txt = (1 to 10).map(j => s"w${i}t$j").mkString(" ")
      Seq((i, txt), (i + 1, txt))
    } ++
      (100L until 140L).map(i => (i, s"${noise()} ${noise()} ${noise()}")))
      .toDF("doc_id", "text")
    val labels = Dedup.clusters(Dedup.minhashNearDups(docs, threshold = 0.6))
    val split = graft.llm.Sampling
      .assignSplitLeakFree(docs, labels, 0.6, 0.2)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val lbl = labels.select($"doc_id", $"cluster_id")
      .as[(Long, Long)].collect().groupBy(_._2).values
    assert(lbl.nonEmpty)
    lbl.foreach { members =>
      val splits = members.map(m => split(m._1)).toSet
      assert(splits.size === 1, s"cluster ${members.toSeq} straddles $splits")
    }
    assert(split.values.toSet.size > 1, "multiple splits actually used")
  }

  test("contrastive triplets: positive shares the label, negatives never do") {
    val rng = new Random(61)
    val emb = (0L until 40L).map(i =>
      (i, s"L${i % 4}", Array.fill(8)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.contrastiveTriplets(emb, col("vec_id") < 3L, kNeg = 3)
      .select($"qid", $"pos_id", $"neg_id")
      .as[(Long, Long, Long)].collect()
    assert(got.length === 9, "3 anchors x 3 negatives")
    val lbl = (0L until 40L).map(i => i -> s"L${i % 4}").toMap
    got.foreach { case (q, p, n) =>
      assert(lbl(p) === lbl(q) && p != q, s"positive label for $q")
      assert(lbl(n) !== lbl(q), s"negative label for $q")
    }
  }

  test("mmr rerank: redundant near-duplicate demoted below the diverse candidate") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),   // query
      (1L, Array(0.8f, 0.6f)),   // top candidate
      (2L, Array(0.8f, 0.6f)),   // exact duplicate of 1 — pure top-k keeps it
      (3L, Array(0.8f, -0.6f)))  // equally relevant, diverse
      .toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceKnn(emb, col("vec_id") === 0L, k = 2)
      .select($"rank", $"neighbor_id").as[(Int, Long)].collect().toSeq
    assert(topk.map(_._2) === Seq(1L, 2L), "top-k keeps the duplicate")
    val mmr = Similarity.mmrRerank(emb, col("vec_id") === 0L, k = 2, m = 3)
      .select($"mmr_rank", $"neighbor_id").as[(Long, Long)].collect().toSeq
    assert(mmr === Seq((1L, 1L), (2L, 3L)),
      "MMR swaps the duplicate for the diverse candidate")
  }

  test("CMS join-size estimate: exact side right, one-sided contract holds") {
    val a = Seq(1L, 1L, 1L, 2L, 3L, 3L, 9L).toDF("k")   // f: 1→3, 2→1, 3→2, 9→1
    val b = Seq(1L, 2L, 2L, 3L, 7L).toDF("k")           // f: 1→1, 2→2, 3→1, 7→1
    // exact = 3·1 + 1·2 + 2·1 = 7
    val got = graft.llm.Sketch.cmsJoinSize(a, col("k"), b, col("k"))
      .as[(Long, Long, Boolean)].collect().head
    assert(got._2 === 7L)
    assert(got._3, s"estimate ${got._1} must not undershoot exact ${got._2}")
    // self-join estimate bounds F2 = sum of squared frequencies
    val f2 = graft.llm.Sketch.cmsJoinSize(a, col("k"), a, col("k"))
      .as[(Long, Long, Boolean)].collect().head
    assert(f2._2 === (9L + 1 + 4 + 1) && f2._3)
  }

  test("surgical decontam: only the leaked span is cut, the doc survives") {
    val corpus = Seq(
      (0L, "intro words here q1 q2 q3 q4 closing remarks stay"),
      (1L, "nothing from the benchmark in this one at all")).toDF("doc_id", "text")
    val bench = Seq((100L, "prompt prefix q1 q2 q3 q4 answer suffix"))
      .toDF("doc_id", "text")
    val spans = Decontam.contaminationSpans(corpus, bench, windowTokens = 3)
    val got = spans.select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect().toSet
    // leaked windows "q1 q2 q3" (start 3) and "q2 q3 q4" (start 4)
    // merge into one span covering tokens 3..6
    assert(got === Set((0L, 3L, 6L)))
    val clean = Decontam.decontaminateSpans(corpus, bench, windowTokens = 3)
      .select($"doc_id", $"clean_text").as[(Long, String)].collect().toMap
    assert(clean(0L) === "intro words here closing remarks stay")
    assert(clean(1L) === "nothing from the benchmark in this one at all")
  }

  test("collocations: a planted always-together pair tops the ranking") {
    val rng = new Random(53)
    // "aaa bbb" co-occur in 20 docs and never otherwise; noise words are
    // spread independently across many docs
    val docs = ((0 until 20).map(i =>
      (i.toLong, s"aaa bbb n${rng.nextInt(6)} n${rng.nextInt(6)}")) ++
      (20 until 80).map(i =>
        (i.toLong, s"n${rng.nextInt(6)} n${rng.nextInt(6)} n${rng.nextInt(6)}")))
      .toDF("doc_id", "text")
    val top = graft.llm.TextAnalysis.collocations(docs, k = 3, minPairDf = 5)
      .filter($"rank" === 1)
      .select($"term_a", $"term_b").as[(String, String)].head()
    assert(top === (("aaa", "bbb")))
  }

  test("Naive Bayes: disjoint vocabularies classify perfectly (diagonal confusion)") {
    val docs = ((0 until 15).map(i => (i.toLong, "cats", "meow purr whiskers feline")) ++
      (15 until 30).map(i => (i.toLong, "dogs", "woof bark fetch canine")))
      .toDF("doc_id", "source", "text")
    val conf = graft.llm.NaiveBayes.confusion(docs)
      .select($"actual", $"predicted", $"n_docs")
      .as[(String, String, Long)].collect().toSet
    assert(conf === Set(("cats", "cats", 15L), ("dogs", "dogs", 15L)))
  }

  test("BFS hops: path graph distances exact, beyond-maxHops and disconnected NULL") {
    // path 0-1-2-3-4-5, disconnected 6-7; seed = {0}
    val nodes = (0L to 7L).map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
      .toDF("id_a", "id_b")
    val seeds = Seq(Tuple1(0L)).toDF("doc_id")
    val got = graft.llm.Graph.bfsHops(nodes, pairs, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(0L -> Some(0L), 1L -> Some(1L), 2L -> Some(2L),
      3L -> Some(3L), 4L -> None, 5L -> None, 6L -> None, 7L -> None))
  }

  test("delete propagation: purged keys gone, others byte-identical, audit adds up") {
    val table = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))
      .toDF("user_id", "v")
    val dk = Seq(Tuple1(1L), Tuple1(9L)).toDF("user_id") // 9 hits nothing
    val kept = sources.Merge.applyDeletes(table, dk, Seq("user_id"))
      .orderBy($"user_id", $"v").as[(Long, String)].collect().toSeq
    assert(kept === Seq((2L, "c"), (3L, "d")))
    val audit = sources.Merge.deleteAudit(table, dk, Seq("user_id")).head()
    assert((audit.getLong(0), audit.getLong(1), audit.getLong(2)) === ((2L, 1L, 2L)))
  }

  test("skew report: uniform keys gini ~0, one dominant key gini high") {
    val uniform = (0 until 100).map(i => Tuple1(s"k${i % 10}")).toDF("k")
    val g0 = analytics.Skew.skewReport(uniform, "k", topK = 3).head()
    assert(math.abs(g0.getAs[Double]("gini")) < 1e-9)
    assert(math.abs(g0.getAs[Double]("top3_share") - 0.3) < 1e-9)
    val skewed = ((0 until 91).map(_ => Tuple1("hot")) ++
      (0 until 9).map(i => Tuple1(s"k$i"))).toDF("k")
    val g1 = analytics.Skew.skewReport(skewed, "k", topK = 3).head()
    assert(g1.getAs[Double]("gini") > 0.7 &&
      g1.getAs[Double]("max_share") === 0.91)
  }

  test("expectations: planted violations counted per check; NULL fails range") {
    val li = Seq(
      (1L, 1, Some(10.0), "A"),
      (1L, 1, Some(99.0), "X"),  // dup key + out-of-range + bad flag
      (2L, 1, None, "N"))        // NULL quantity = range violation
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val parent = Seq(Tuple1(1L)).toDF("o_orderkey") // orderkey 2 is orphaned
    val got = sources.Expect.suite(
        sources.Expect.scanChecks(li, Seq(
          "range" -> $"l_quantity".between(1, 50),
          "flag" -> $"l_returnflag".isin("A", "N", "R"))),
        sources.Expect.unique(li, Seq("l_orderkey", "l_linenumber"), "pk"),
        sources.Expect.refIntegrity(li, "l_orderkey", parent, "o_orderkey", "fk"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got === Map("range" -> ((2L, false)), "flag" -> ((1L, false)),
      "pk" -> ((1L, false)), "fk" -> ((1L, false))))
  }

  test("seasonal anomalies: a spike hidden by daily cycle is flagged per-slot") {
    import java.sql.Timestamp
    val hourMs = 3600000L
    // 8 days: hour-of-day 0 always 100 events, hod 1 always 10 — except
    // day 7 hod 1 spikes to 100 (which equals the hod-0 NORMAL: a flat
    // baseline would never flag it). 8 samples because a single outlier
    // among n caps at z = √(n−1): 5 days would pin z at exactly 2.0.
    val events = (0 until 8).flatMap { day =>
      def mk(hod: Int, n: Int) = (0 until n).map(i =>
        (day * 100000L + hod * 1000L + i,
          new Timestamp((day * 24L + hod) * hourMs + i)))
      mk(0, 100) ++ mk(1, if (day == 7) 100 else 10)
    }.toDF("event_id", "ts")
    val flagged = analytics.Analytics.seasonalAnomalies(events)
      .filter($"is_anomaly")
      .select($"hod", $"n_events").as[(Int, Long)].collect().toSet
    assert(flagged === Set((1, 100L)))
  }

  test("A/B test: planted conversion gap significant; balanced arms are not") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    def mk(users: Range, convertEvery: Int) = users.zipWithIndex.flatMap {
      case (u, i) =>
        val base = Seq((u * 100L, ts(0), u.toLong, "view", 0.0, "{}"))
        if (i % convertEvery == 0)
          base :+ ((u * 100L + 1, ts(1), u.toLong, "purchase", 1.0, "{}"))
        else base
    }
    // arm 0 = even users convert at 1/2; arm 1 = odd users convert at 1/5
    val events = (mk(0 until 400 by 2, 2) ++ mk(1 until 400 by 2, 5))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = analytics.Analytics.abTest(events, col("user_id") % 2).head()
    assert(r.getAs[Long]("exp_c") === 200 && r.getAs[Long]("exp_t") === 200)
    assert(r.getAs[Double]("lift") < 0 && r.getAs[Boolean]("significant"))
    // same conversion pattern in both arms → |z| small, not significant
    val bal = (mk(0 until 400 by 2, 2) ++ mk(1 until 400 by 2, 2))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(!analytics.Analytics.abTest(bal, col("user_id") % 2)
      .head().getAs[Boolean]("significant"))
  }

  test("EWMA: constant series forecasts itself; step change flags until absorbed") {
    import java.sql.Timestamp
    val hourMs = 3600000L
    // 6 quiet hours at 8 events, then a 40-event spike hour
    val events = ((0 until 6).flatMap(h => (0 until 8).map(i =>
      (h * 100L + i, new Timestamp(h * hourMs + i)))) ++
      (0 until 40).map(i => (600L + i, new Timestamp(6 * hourMs + i))))
      .toDF("event_id", "ts")
    val rows = analytics.Analytics.ewmaBaseline(events, alphaDen = 8)
      .select($"n_events", $"forecast", $"spike")
      .as[(Long, Double, Boolean)].collect()
    assert(rows.take(6).forall { case (n, f, s) => n == 8L && f == 8.0 && !s })
    val (n6, f6, s6) = rows(6)
    assert(n6 == 40L && f6 == 8.0 && s6) // 40 > 1.5 × 8
  }

  test("calibration bins: edges span [min,max], rates exact, degenerate collapses") {
    val df = ((0 until 50).map(i => (i / 50.0, i >= 25)) :+ ((1.0, true)))
      .toDF("score", "label")
    val bins = graft.llm.Eval.calibrationBins(df, $"score", $"label", nBins = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3))).toMap
    // scores uniform on [0,1): 10 in the bottom bin, the max caps into
    // bin 4; all 51 rows land somewhere and rates are monotone (the
    // perfectly-separable label). Exact mid-bin membership is FP-edge
    // dependent (0.6/0.2 floors to 2) — deterministic, but not asserted.
    assert(bins(0L) === ((10L, 0.0)) && bins(4L) === ((11L, 1.0)))
    assert(bins.values.map(_._1).sum === 51L)
    assert(bins.toSeq.sortBy(_._1).map(_._2._2).sliding(2)
      .forall(p => p.head <= p.last))
    // all-equal scores: single bin 0, no zero-width division
    val flat = (0 until 8).map(i => (0.5, i % 2 == 0)).toDF("score", "label")
    val b0 = graft.llm.Eval.calibrationBins(flat, $"score", $"label").collect()
    assert(b0.length === 1 && b0.head.getLong(0) === 0L &&
      b0.head.getDouble(3) === 0.5)
  }

  test("query expansion: co-occurring term surfaces, original term excluded") {
    // docs about "spark" always mention "shuffle"; unrelated docs don't
    val docs = ((0 until 5).map(i =>
      (i.toLong, s"spark shuffle engine run$i")) ++
      (5 until 30).map(i => (i.toLong, s"noise other text item$i")))
      .toDF("doc_id", "text")
    val queries = Seq((1, "spark")).toDF("query_id", "term")
    val got = graft.llm.Search.expandQueries(docs, queries,
        fbDocs = 5, fbTerms = 3)
      .select($"rank", $"term").as[(Int, String)].collect()
    assert(got.map(_._2).contains("shuffle"))
    assert(!got.map(_._2).contains("spark")) // original term anti-joined out
  }

  test("robust stats: hand-computed order statistics; outlier can't move them") {
    // 1..9 plus a wild outlier: median 5.50→? values are dollars
    val vals = ((1 to 9).map(_.toDouble) :+ 1e6).map(Tuple1(_)).toDF("v")
    val r = analytics.Analytics.robustStats(vals, $"v").head()
    // n=10: median idx ⌈10/2⌉? (n+1) div 2 = 5 → 5.0; p10 idx 1 → 1.0;
    // p90 idx (90+9) div 10 = 9 → 9.0
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Double]("median") === 5.0)
    assert(r.getAs[Double]("p10") === 1.0 && r.getAs[Double]("p90") === 9.0)
    // MAD over |v−5|: {4,3,2,1,0,1,2,3,4,999995} sorted median idx 5 → 2
    assert(r.getAs[Double]("mad") === 2.0)
    // trimmed mean over [1,9] = mean(1..9) = 5 — the outlier is gone
    assert(r.getAs[Double]("trimmed_mean") === 5.0)
    // winsorized: outlier clamps to 9 → (45+9)/10 = 5.4
    assert(r.getAs[Double]("winsorized_mean") === 5.4)
  }

  test("embedding shift: displaced group reads its offset, centered group ~0") {
    val rng = new Random(77)
    def vec(offset: Float) =
      Array.fill(8)(rng.nextGaussian().toFloat * 0.01f + offset).toSeq
    // group "b" displaced by +1 per dim; equal sizes put the corpus mean
    // halfway, so each group sits ~sqrt(8)*0.5 ≈ 1.41 away
    val emb = ((0L until 50L).map(i => (i, vec(0f))) ++
      (50L until 100L).map(i => (i, vec(1f)))).toDF("vec_id", "embedding")
    val docs = (0L until 100L).map(i =>
      (i, if (i < 50) "a" else "b")).toDF("doc_id", "source")
    val got = graft.llm.Drift.embeddingShift(emb, docs)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(got("a") - math.sqrt(8) * 0.5) < 0.05, got.toString)
    assert(math.abs(got("b") - math.sqrt(8) * 0.5) < 0.05, got.toString)
    // identical groups → both shifts ~0
    val same = ((0L until 40L).map(i => (i, vec(0f)))).toDF("vec_id", "embedding")
    val sdocs = (0L until 40L).map(i => (i, s"g${i % 2}")).toDF("doc_id", "source")
    val g0 = graft.llm.Drift.embeddingShift(same, sdocs)
      .collect().map(_.getDouble(2))
    assert(g0.forall(_ < 0.01), g0.mkString(","))
  }

  test("markov attribution: the only converting channel takes all the credit") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    // users 1..10: view → purchase (every conversion passes through view);
    // users 11..20: click → nothing (click never converts)
    val events = ((1 to 10).flatMap(u => Seq(
      (u * 10L, ts(0), u.toLong, "view", 0.0, "{}"),
      (u * 10L + 1, ts(5), u.toLong, "purchase", 1.0, "{}"))) ++
      (11 to 20).map(u => (u * 10L, ts(0), u.toLong, "click", 0.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = analytics.Analytics.markovAttribution(events)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(got("view")._1 === 1000000L) // removing view kills ALL conversions
    assert(got("click")._1 === 0L)
    assert(got("view")._2.exists(v => math.abs(v - 1.0) < 1e-9))
  }

  test("retrieval metrics: perfect ranking scores 1.0; miss scores 0 MRR") {
    // q1: 2 relevant docs ranked 1,2 of 3 → NDCG@3 = 1, MRR = 1
    // q2: relevant doc absent from top-k → NDCG 0, MRR 0
    val ranking = Seq(
      (1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 20L), (2L, 2, 21L), (2L, 3, 22L))
      .toDF("qid", "rank", "neighbor_id")
    val qrels = Seq((1L, 10L), (1L, 11L), (2L, 99L)).toDF("qid", "neighbor_id")
    val got = graft.llm.Eval.retrievalMetrics(ranking, qrels, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getDouble(3))).toList
    assert(got.length === 2)
    val (q1, q2) = (got(0), got(1))
    assert(q1._1 === 1L && q1._2 === 2L && q1._3.exists(v => math.abs(v - 1.0) < 1e-9)
      && q1._4 === 1.0)
    assert(q2._1 === 2L && q2._2 === 1L && q2._3.exists(_ === 0.0) && q2._4 === 0.0)
  }
}
