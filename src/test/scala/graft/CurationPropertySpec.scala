package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dsir, Eval, Fingerprint, Graph, Sampling, Sketch}

/** Randomized property pins for the curation/report operators added in
  * round 7: the published guarantees must hold for EVERY input, not just
  * the planted spec cases. Trials are seeded (deterministic CI); Spark
  * runs are kept small because every trial is a full job. */
class CurationPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("CMS: one-sided error and sharded-merge identity on random corpora") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val vocab = (1 to 30).map(i => s"v$i")
      val docs = (0L until 40L).map { i =>
        (i, List.fill(3 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size)))
          .mkString(" "))
      }.toDF("doc_id", "text")
      val full = Sketch.cmsBuild(docs)
      val merged = Sketch.cmsMerge(
        Sketch.cmsBuild(docs.filter($"doc_id" % 2 === 0)),
        Sketch.cmsBuild(docs.filter($"doc_id" % 2 === 1)))
      assert(merged.orderBy($"depth", $"bucket").collect().toSeq ===
        full.orderBy($"depth", $"bucket").collect().toSeq, s"trial $trial")
      val est = Sketch.cmsEstimate(full, docs, vocab.take(10) :+ "absent")
        .select($"overestimate").as[Boolean].collect()
      assert(est.length === 11 && est.forall(identity), s"trial $trial")
    }
  }

  test("winnowing: every planted shared w+k-1 run is detected; density bounded") {
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val run = (1 to 6).map(i => s"shared${trial}x$i").mkString(" ") // 6 = w+k-1
      def noise(n: Int) =
        List.fill(n)(s"n${rng.nextInt(100000)}").mkString(" ")
      val d = Seq(
        (0L, s"${noise(5 + rng.nextInt(10))} $run ${noise(5 + rng.nextInt(10))}"),
        (1L, s"${noise(5 + rng.nextInt(10))} $run ${noise(5 + rng.nextInt(10))}"))
        .toDF("doc_id", "text")
      val fps = Fingerprint.winnow(d, k = 3, w = 4)
        .select($"doc_id", $"fp").as[(Long, Long)].collect()
      val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert((byDoc(0L) & byDoc(1L)).nonEmpty, s"trial $trial: guarantee broken")
      // density: selections per doc within [grams/w, grams]
      val counts = fps.groupBy(_._1).view.mapValues(_.length).toMap
      d.select($"doc_id", size(split(lower(trim($"text")), "\\s+")) - 2)
        .as[(Long, Int)].collect().foreach { case (id, grams) =>
          assert(counts(id) <= grams && counts(id) >= grams / 4,
            s"trial $trial doc $id: ${counts(id)} of $grams grams")
        }
    }
  }

  test("HRW: growth moves only to the new shard, within the expected fraction") {
    for (n <- Seq(2, 4, 7)) {
      val shards = (0 until n).map(i => s"sh$i")
      val d = (0L until 600L).map(Tuple1(_)).toDF("k")
      val before = Sampling.assignShards(d, $"k", shards)
        .select($"k", $"shard").as[(Long, String)].collect().toMap
      val after = Sampling.assignShards(d, $"k", shards :+ "new")
        .select($"k", $"shard").as[(Long, String)].collect().toMap
      val moved = before.keys.filter(k => before(k) != after(k)).toSeq
      assert(moved.forall(after(_) == "new"), s"n=$n: moved between old shards")
      val expect = 600.0 / (n + 1)
      assert(moved.size < expect * 2.2 && moved.size > expect / 2.5,
        s"n=$n: moved ${moved.size}, expected ~$expect")
    }
  }

  test("AUC equals the naive pairwise statistic on random scored sets") {
    val rng = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val rows = (0 until 60).map { _ =>
        (rng.nextInt(8).toDouble, rng.nextBoolean()) // ties guaranteed
      }
      val naive = {
        val pos = rows.filter(_._2).map(_._1)
        val neg = rows.filterNot(_._2).map(_._1)
        val s = (for (p <- pos; q <- neg) yield
          if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
        s / (pos.size.toDouble * neg.size.toDouble)
      }
      val got = Eval.auc(rows.toDF("score", "label"), $"score", $"label")
        .select($"auc").as[Double].head()
      assert(math.abs(got - naive) < 1e-12, s"trial $trial: $got vs $naive")
    }
  }

  test("integer PageRank: a ring graph is exactly stationary at the unit mass") {
    // on a 2-regular ring every update is 150000 + 85*(2*(1e6 div 2)) div 100
    // = 1000000 exactly — the fixed point stays bit-exact through floor math
    val n = 12
    val nodes = (0L until n.toLong).map(Tuple1(_)).toDF("doc_id")
    val pairs = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("id_a", "id_b")
    val r = Graph.pagerank(nodes, pairs, iters = 3)
      .select($"rank_micro").as[Long].collect()
    assert(r.length === n && r.forall(_ === 1000000L))
  }

  test("DSIR: uniform target over the raw corpus scores every doc identically") {
    // target == raw => per-bucket ratio is exactly 1 before smoothing skew;
    // with identical counts the lambda table is all floor(ln(1)*1e9) = 0
    val docs = (0L until 30L).map(i => (i, "same words every time", "en"))
      .toDF("doc_id", "text", "lang")
    val lam = Dsir.bucketLogRatios(docs, docs)
    assert(lam.filter($"lam_nano" =!= 0L).count() === 0L)
    val scores = Dsir.score(docs, lam)
      .select($"score_nano").as[Long].collect()
    assert(scores.forall(_ === 0L))
  }

  test("scd2Apply equals the full recompute on random logs and random cuts") {
    val rng = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val states = Seq("a", "b", "c")
      val events = (1L to 120L).map { eid =>
        (eid, rng.nextInt(6).toLong, states(rng.nextInt(3)),
          new java.sql.Timestamp(rng.nextInt(100000).toLong * 1000))
      }.toDF("event_id", "user_id", "event_type", "ts")
      // cut at a random timestamp; ties across the cut stay whole-sided
      val cutMs = (20000 + rng.nextInt(60000)).toLong * 1000
      val cut = new java.sql.Timestamp(cutMs)
      val hist = graft.analytics.Analytics.scd2History(
        events.filter($"ts" < cut))
      val applied = graft.analytics.Analytics.scd2Apply(
        hist, events.filter($"ts" >= cut))
      val full = graft.analytics.Analytics.scd2History(events)
      def key(df: org.apache.spark.sql.DataFrame) =
        df.orderBy($"user_id", $"version").collect().toSeq.map(_.toSeq)
      assert(key(applied) === key(full), s"trial $trial cut $cutMs")
    }
  }

  test("merge upsert: re-applying the same batch is an identity") {
    val rng = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val snap = (1L to 50L).map(k => (k, s"v${rng.nextInt(100)}"))
        .toDF("k", "v")
      val batch = (1L to 70L).filter(_ => rng.nextBoolean()).map { k =>
        (k, s"b${rng.nextInt(100)}", rng.nextInt(4) == 0)
      }.toDF("k", "v", "_deleted")
      val once = graft.sources.Merge.upsert(snap, batch, Seq("k"))
        .localCheckpoint()
      val twice = graft.sources.Merge.upsert(once, batch, Seq("k"))
      def key(df: org.apache.spark.sql.DataFrame) =
        df.orderBy($"k").collect().toSeq.map(_.toSeq)
      assert(key(twice) === key(once), s"trial $trial")
    }
  }

  test("paragraph dedup matches a brute-force reference on random corpora") {
    val rng = new scala.util.Random(37)
    for (trial <- 1 to 3) {
      val p = 4
      val banner = (1 to p).map(i => s"ban${trial}x$i").mkString(" ")
      def noiseWords(n: Int) = List.fill(n)(s"w${rng.nextInt(50)}")
      val docs = (0L until 20L).map { i =>
        val words =
          if (i % 3 == 0) banner.split(" ").toList ::: noiseWords(p * (1 + rng.nextInt(3)))
          else noiseWords(1 + rng.nextInt(12))
        (i, words.mkString(" "))
      }
      val out = graft.llm.Dedup.dedupParagraphs(docs.toDF("doc_id", "text"),
          paraWords = p)
        .orderBy($"doc_id")
        .as[(Long, String, Long, Long)].collect().toSeq
      // brute-force reference in plain Scala
      val paras = docs.map { case (id, text) =>
        val ws = text.trim.toLowerCase.split("\\s+").toSeq
        val np = math.max(1, math.ceil(ws.size / p.toDouble).toInt)
        id -> (0 until np).map(j => ws.slice(j * p, j * p + p).mkString(" "))
      }.toMap
      val counts = paras.values.flatten.groupBy(identity).view.mapValues(_.size)
      val expected = docs.map { case (id, text) =>
        val kept = paras(id).filter(counts(_) <= 1)
        val dropped = paras(id).size - kept.size
        val textOut = if (dropped == 0) text else kept.mkString(" ")
        (id, textOut, paras(id).size.toLong, dropped.toLong)
      }
      assert(out === expected, s"trial $trial")
    }
  }

  test("cms join-size: one-sided on random key sets, exact side matches brute force") {
    val rng = new scala.util.Random(37)
    for (trial <- 1 to 3) {
      val a = Seq.fill(120)(rng.nextInt(25).toLong).toDF("k")
      val b = Seq.fill(90)(rng.nextInt(25).toLong).toDF("k")
      val got = Sketch.cmsJoinSize(a, col("k"), b, col("k"))
        .as[(Long, Long, Boolean)].collect().head
      val brute = a.as("x").join(b.as("y"), col("x.k") === col("y.k")).count()
      assert(got._2 === brute, s"trial $trial exact side")
      assert(got._3 && got._1 >= got._2, s"trial $trial one-sided")
    }
  }

  test("mmr: first pick is top-1; selection is a k-subset of the shortlist, no repeats") {
    val rng = new scala.util.Random(41)
    for (trial <- 1 to 2) {
      val emb = (0L until 60L).map(i =>
        (i, Array.fill(8)(rng.nextGaussian().toFloat)))
        .toDF("vec_id", "embedding")
      val top = graft.llm.Similarity
        .bruteForceKnn(emb, col("vec_id") < 3, k = 12)
        .select($"qid", $"rank", $"neighbor_id")
        .as[(Long, Int, Long)].collect()
      val mmr = graft.llm.Similarity
        .mmrRerank(emb, col("vec_id") < 3, k = 4, m = 12)
        .select($"qid", $"mmr_rank", $"neighbor_id")
        .as[(Long, Long, Long)].collect()
      for (q <- 0L until 3L) {
        val shortlist = top.filter(_._1 == q).map(_._3).toSet
        val picked = mmr.filter(_._1 == q).sortBy(_._2).map(_._3)
        assert(picked.length === 4 && picked.distinct.length === 4,
          s"trial $trial q$q no repeats")
        assert(picked.toSet.subsetOf(shortlist), s"trial $trial q$q subset")
        assert(picked.head === top.filter(t => t._1 == q && t._2 == 1).head._3,
          s"trial $trial q$q first pick = top-1")
      }
    }
  }

  test("spans: coverage-union reference reproduced on random corpora; removal consistent") {
    val rng = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      val w = 2 + rng.nextInt(3) // W in {2,3,4}
      // small vocab forces plenty of accidental duplicated windows
      val raw = (0L until 25L).map { i =>
        (i, List.fill(1 + rng.nextInt(12))(s"t${rng.nextInt(6)}").mkString(" "))
      }
      val docs = raw.toDF("doc_id", "text")

      // brute reference: positional windows (with the short-doc whole-text
      // fallback), duplicated = in >= 2 distinct docs, per-doc coverage
      // union of [p, min(p+w-1, n-1)] merged into maximal spans
      val wins = raw.map { case (id, text) =>
        val toks = text.split("\\s+")
        val ws =
          if (toks.length >= w)
            (0 to toks.length - w).map(p => (p, toks.slice(p, p + w).mkString(" ")))
          else Seq((0, toks.mkString(" ")))
        (id, toks.length, ws)
      }
      val dupSet = wins.flatMap { case (id, _, ws) => ws.map(x => (x._2, id)) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      val expected = wins.flatMap { case (id, n, ws) =>
        val starts = ws.filter(x => dupSet(x._2)).map(_._1).sorted
        // merge starts while q - p <= w; span end clamps to n-1
        val islands = starts.foldLeft(List.empty[List[Int]]) {
          case (acc, p) if acc.nonEmpty && p - acc.head.head <= w =>
            (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }
        islands.map(isl =>
          (id, isl.min.toLong, math.min(isl.max + w - 1, n - 1).toLong))
      }.toSet
      val got = graft.llm.Dedup.duplicatedSpans(docs, windowTokens = w)
        .select($"doc_id", $"span_start", $"span_end")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === expected, s"trial $trial w=$w")

      // removal consistency: cleaned docs contain exactly the uncovered tokens
      val spans = graft.llm.Dedup.duplicatedSpans(docs, windowTokens = w)
      val clean = graft.llm.Dedup.removeSpans(docs, spans)
        .select($"doc_id", $"clean_text").as[(Long, String)].collect().toMap
      raw.foreach { case (id, text) =>
        val toks = text.split("\\s+")
        val covered = expected.filter(_._1 == id)
          .flatMap(s => s._2 to s._3).map(_.toInt)
        val want = toks.indices.filterNot(covered.contains).map(toks).mkString(" ")
        assert(clean(id) === want, s"trial $trial doc $id")
      }
    }
  }
}
