package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analytics.{Analytics, Skew}

/** Plan-shape contracts — the 100 TB claims, asserted against Catalyst
  * output so they can't silently regress:
  *   - dimension joins broadcast (no sort-merge on the star join)
  *   - scans prune to the referenced columns
  *   - bucketed tables co-locate an equi-join with NO shuffle on either
  *     side (the pre-partitioned-source pattern a production deployment
  *     uses for repeated fact-fact joins)
  */
class PlanSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def t(n: String) = graft.sources.Tables.load(spark, sf, n)

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("star join broadcasts every dimension; fact scan prunes columns") {
    val plan = formatted(Analytics.regionRevenue(
      t("lineitem"), t("orders"), t("customer"), t("nation"), t("region")))
    // each operator appears once in the tree and once as a "(n) Op" detail
    assert("""\(\d+\) BroadcastHashJoin""".r.findAllIn(plan).size === 4, plan)
    assert(!plan.contains("SortMergeJoin"))
    // lineitem: 16 columns in the table, 3 referenced
    val readSchema = "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"
    assert(plan.contains(readSchema), plan)
  }

  test("semi/anti joins reduce the probe side to its key column") {
    val plan = formatted(Analytics.customerOrderPresence(t("orders"), t("customer")))
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("ReadSchema: struct<o_custkey:bigint>"), plan)
  }

  test("asof join: latest state at-or-before, null before first snapshot") {
    import java.sql.Timestamp
    val ms = (m: Long) => new Timestamp(m)
    val left = Seq((1L, "u", ms(50)), (2L, "u", ms(100)), (3L, "u", ms(150)),
      (4L, "u", ms(20)), (5L, "v", ms(100)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(("u", ms(30), 1.0), ("u", ms(100), 2.0), ("w", ms(10), 9.0))
      .toDF("user_id", "rts", "v")
    val out = Analytics.asofJoin(left, right, "user_id", "ts", "rts", Seq("v"))
      .select($"event_id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(1.0)) // 50 -> snapshot at 30
    assert(out(2L) === Some(2.0)) // boundary: 100 sees the ts=100 snapshot
    assert(out(3L) === Some(2.0)) // carry forward
    assert(out(4L) === None)      // before any snapshot
    assert(out(5L) === None)      // no snapshots for v at all
  }

  test("range join equals the theta join; boundaries are [start, end)") {
    import java.sql.Timestamp
    val ms = (m: Long) => new Timestamp(m)
    val rnd = new scala.util.Random(3L)
    val points = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", ms(rnd.nextInt(100000).toLong)))
      .toDF("pid", "k", "t")
    val intervals = (1 to 40).map { i =>
      val s = rnd.nextInt(90000).toLong
      (s"k${rnd.nextInt(5)}", ms(s), ms(s + 1 + rnd.nextInt(20000)), i.toLong)
    }.toDF("k", "ws", "we", "wid")
    val naive = points.join(intervals,
        points("k") === intervals("k") && $"t" >= $"ws" && $"t" < $"we")
      .select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val bucketed = Analytics.rangeJoin(points, intervals, "k", "t", "ws", "we",
        bucketWidth = 7000L)
      .select($"pid", $"wid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(bucketed === naive)
    // explicit boundary pins
    val p2 = Seq((1L, "x", ms(1000)), (2L, "x", ms(1999)), (3L, "x", ms(2000)))
      .toDF("pid", "k", "t")
    val i2 = Seq(("x", ms(1000), ms(2000), 7L)).toDF("k", "ws", "we", "wid")
    val hits = Analytics.rangeJoin(p2, i2, "k", "t", "ws", "we", 500L)
      .select($"pid").as[Long].collect().toSet
    assert(hits === Set(1L, 2L)) // start inclusive, end exclusive
  }

  test("salted join/agg equal their plain forms on a 90%-hot-key input") {
    val left = ((1 to 900).map(_ => (7L, "hot")) ++ (1 to 100).map(i => (i.toLong % 50, "cold")))
      .toDF("k", "tag")
    val right = (0L to 60L).map(i => (i, s"dim$i")).toDF("rk", "name")
    val plain = left.join(right, $"k" === $"rk")
      .select($"k", $"tag", $"name").collect().map(_.toString).sorted
    val salted = Skew.saltedEquiJoin(left, right, "k", "rk", saltFactor = 8)
      .select($"k", $"tag", $"name").collect().map(_.toString).sorted
    assert(salted === plain)
    // the hot key really spreads: >1 distinct salt among k=7 rows
    val hotSalts = left.withColumn("s",
        pmod(hash(monotonically_increasing_id()), lit(8)))
      .filter($"k" === 7).select($"s").distinct().count()
    assert(hotSalts > 4)

    val plainAgg = left.groupBy($"k").agg(count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val saltedAgg = Skew.saltedSumCount(left, "k", "k", saltFactor = 8)
      .select($"k", $"n_rows")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(saltedAgg === plainAgg)
  }

  test("bucketed tables join with no shuffle on either side") {
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    // a crashed prior run can orphan the managed locations (the catalog is
    // per-session in-memory, the warehouse dir is not)
    for (d <- Seq("orders_bkt", "customer_bkt")) {
      val p = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, d)
      if (p.exists) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete()
        }
        rm(p)
      }
    }
    t("orders").write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_bkt")
    t("customer").write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_bkt")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast path — the point is shuffle avoidance
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_name")
      val plan = formatted(j)
      assert(plan.contains("SortMergeJoin"), plan)
      // bucketing pre-partitions both sides: no exchange anywhere
      assert(!plan.contains("Exchange"), plan)
      assert(j.count() === t("orders").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("steady-state band-table probe: corpus side reads bucketed, no exchange") {
    // the Dedup.bandTable steady-state claim, as a tested plan shape: the
    // corpus band table is persisted bucketed on the join key, so an
    // ingest's candidate probe shuffles ONLY the batch — at 100 TB the
    // corpus never moves again
    spark.sql("DROP TABLE IF EXISTS corpus_bands_bkt")
    val p = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      "corpus_bands_bkt")
    if (p.exists) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      rm(p)
    }
    val docs = t("documents")
    graft.sources.Io.writeBucketed(
      graft.llm.Dedup.bandTable(docs.filter($"doc_id" < 250)),
      "corpus_bands_bkt", 4, Seq("band", "band_hash"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle path — with broadcast the claim is trivially true
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // uncapped batch band frame: keeps the batch subtree narrow so the
      // ONE expected exchange is unambiguously the batch-side reshuffle
      // (the cap's count-agg adds its own exchanges when forced off
      // broadcast, which is orthogonal to the claim under test)
      val batch = graft.llm.Dedup.bandTable(docs.filter($"doc_id" >= 250),
        maxBucket = Int.MaxValue)
      val probe = spark.table("corpus_bands_bkt").as("c")
        .join(batch.as("b"),
          $"c.band" === $"b.band" && $"c.band_hash" === $"b.band_hash")
        .select($"b.id".as("id_new"), $"c.id".as("id_other"))
      val plan = formatted(probe)
      // exactly ONE shuffle: the batch side reorganizing into the corpus's
      // bucket layout; zero exchanges between the bucketed scan and the join
      assert("""\(\d+\) Exchange""".r.findAllIn(plan).size === 1, plan)
      val scanIdx = plan.indexOf("Scan parquet spark_catalog.default.corpus_bands_bkt")
      assert(scanIdx >= 0, plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(probe.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("decontamination: benchmark grams broadcast, corpus scan prunes columns") {
    val docs = t("documents")
    val plan = formatted(graft.llm.Decontam.contamination(
      docs.filter($"doc_id" % 50 =!= 0), docs.filter($"doc_id" % 50 === 0)))
    // the corpus (100 TB side) must never shuffle by gram: the benchmark
    // gram set is the broadcast build side of the membership join
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("chunking is a pure scan-side explode — zero exchanges") {
    val plan = formatted(graft.llm.TextAnalysis.chunkByTokens(
      t("documents"), chunk = 64, overlap = 8))
    assert(!plan.contains("Exchange"), plan)
    assert("""\(\d+\) Generate\b""".r.findFirstIn(plan).isDefined, plan)
    assert(plan.contains("explode"), plan)
  }

  test("runtime bloom-filter pruning injects on a selective dim join") {
    // Spark 4 runtime filtering: a selective filter on the build side can
    // inject bloom_filter_might_contain on the probe side's scan. The size
    // thresholds target real tables — drop them so the sf0.001 fixtures
    // qualify, proving the engine config doesn't break the injection path.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // creation side must be UNDER its threshold (build a small filter),
      // application side must be OVER its threshold (big enough to prune)
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val j = t("lineitem")
        .join(t("orders").filter($"o_orderpriority" === "1-URGENT"),
          $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_extendedprice")
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"), plan)
      assert(j.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("packing: no global (empty-partition-spec) window in the plan") {
    // inspect the pre-checkpoint stage — packByBudget checkpoints it, which
    // collapses the executed subtree to a Scan ExistingRDD in the final plan
    val plan = formatted(graft.llm.Packing.intraPartitionPrefix(
      t("documents"), $"doc_id", length($"text"), n = 4))
    // a Window whose detail section shows no partition spec would mean the
    // single-partition cumsum; ours must window on the range-partition id
    val winDetails = """\(\d+\) Window\b[\s\S]*?(?=\n\(\d+\) )""".r
      .findAllIn(plan).toSeq
    assert(winDetails.nonEmpty, plan)
    assert(winDetails.forall(_.contains("pid")), plan)
  }

  test("packing: offset rejoin is one broadcast join, not an O(P) expression chain") {
    // with 256 range partitions the old foldLeft(when) formulation put 256
    // CASE WHEN arms in the plan (64 KB codegen blowup at 10^4+ partitions);
    // the fix joins a (pid -> offset) frame, so the plan must show exactly
    // one broadcast hash join and zero CASE WHEN, independent of nParts
    val out = graft.llm.Packing.packByBudget(
      t("documents"), $"doc_id", length($"text"), budget = 4096L, nParts = 256)
    val plan = formatted(out)
    assert("""\(\d+\) BroadcastHashJoin""".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("CASE WHEN"), plan)
    assert(out.count() > 0)
  }

  test("quantize: scan-side only — no exchange, codes match per-row min/max") {
    val q = graft.llm.Quantize.scalarQuantize(t("embeddings"))
    assert(!formatted(q).contains("Exchange"), formatted(q))
    val row = q.filter($"vec_id" === 7L).select($"vmin", $"vmax").head()
    assert(row.getDouble(0) <= row.getDouble(1))
  }

  test("vocab top-k plans as TakeOrdered, not a global sort") {
    val plan = formatted(graft.llm.TextAnalysis.vocabTopK(t("documents"), 10))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("grouping sets expand before the shuffle (partial agg per set)") {
    val plan = formatted(Analytics.groupingSetsRevenue(t("orders"), t("customer")))
    assert(plan.contains("Expand"), plan)
    // partial aggregation below the exchange: HashAggregate appears both
    // sides of the shuffle
    assert("""\(\d+\) HashAggregate""".r.findAllIn(plan).size >= 2, plan)
  }

  test("heavy hitters: partial sketch both sides of one sketch-only exchange") {
    val plan = formatted(graft.llm.TextAnalysis.heavyHitters(
      t("documents"), capacity = 64, k = 10))
    // partial + final ObjectHashAggregate: only `capacity` counters per
    // partition cross the wire, never one row per distinct term
    assert("""\(\d+\) ObjectHashAggregate""".r.findAllIn(plan).size === 2, plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("media dedup: digest projected scan-side, bytes never shuffle") {
    val media = graft.llm.Multimodal.mediaFromDocuments(t("documents"))
    val plan = formatted(graft.llm.Multimodal.dedupExact(media))
    // the first (agg) exchange carries only (hash, id) — the media binary
    // must not appear in any exchange's input columns
    val exchanges = """(?s)\(\d+\) Exchange.*?Input.*?\n""".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, plan)
    assert(!exchanges.exists(_.contains("media")), plan)
  }

  test("media near-dup: feature extraction shuffles nothing; no exchange ever carries the media bytes") {
    val media = graft.llm.Multimodal.mediaFromDocuments(t("documents"))
    // stage 1, the codec boundary: scan → mapPartitions, narrow end to end
    val featPlan = formatted(graft.llm.Multimodal.extractFeatures(media))
    assert(!featPlan.contains("Exchange"), featPlan)
    // the full near-dup pipeline: the feats checkpoint truncates the media
    // scan out of downstream lineage, so every exchange (banding join,
    // pair distinct, verify joins) moves only ids/bands/features
    val plan = formatted(graft.llm.Multimodal.dedupNear(media))
    val exchanges = """(?s)\(\d+\) Exchange.*?Input.*?\n""".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, plan)
    // the binary column's attribute is `media#N` — distinct from media_id
    assert(!exchanges.exists(s => """media#\d""".r.findFirstIn(s).isDefined), plan)
  }

  test("media frame overlap: frame digests projected scan-side, bytes never shuffle") {
    val media = graft.llm.Multimodal.mediaFromDocuments(t("documents"))
    val plan = formatted(graft.llm.Multimodal.frameOverlap(media,
      frameBytes = 32, everyNth = 2))
    val exchanges = """(?s)\(\d+\) Exchange.*?Input.*?\n""".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, plan)
    // shuffles carry (media_id, digest) and pair counts only — neither
    // the media bytes nor the sliced frames ever leave the scan stage
    for (bad <- Seq("media#", "frame#"))
      assert(!exchanges.exists(_.contains(bad)), s"$bad in a shuffle:\n$plan")
  }

  test("media near-dup incremental: corpus features scanned, never shuffled; media in no exchange") {
    val docs = t("documents")
    val corpusFeats = graft.llm.Multimodal.extractFeatures(
        graft.llm.Multimodal.mediaFromDocuments(docs.filter($"doc_id" % 4 =!= 3)))
      .select($"media_id", $"features")
    val batch = graft.llm.Multimodal.mediaFromDocuments(
      docs.filter($"doc_id" % 4 === 3))
    val plan = formatted(
      graft.llm.Multimodal.dedupNearIncremental(batch, corpusFeats))
    val exchanges = """(?s)\(\d+\) Exchange.*?Input.*?\n""".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, plan)
    // shuffles move band keys and candidate ids only: the media binary
    // never leaves its scan, and the corpus FEATURES attach via broadcast
    // joins (batch-bounded build sides) — a features-carrying shuffle
    // would mean the ingest reshuffles the corpus artifact
    for (bad <- Seq("media#", "features#"))
      assert(!exchanges.exists(_.contains(bad)), s"$bad in a shuffle:\n$plan")
  }

  test("filtered knn: gate is a semi-join below the broadcast scoring join") {
    val allowed = t("documents").filter($"n_chars" >= 400).select($"doc_id")
    val plan = formatted(graft.llm.Similarity.filteredKnn(
      t("embeddings"), allowed, $"vec_id" < 10, 5))
    // the metadata gate must reach the corpus as a semi-join (survivors
    // shrink BEFORE scoring), with the gate scan pruned to its two columns
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), plan)
    // scoring still broadcasts the query side (inequality join → BNLJ)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("tokenize to ids: vocab join broadcasts; one corpus shuffle (doc agg)") {
    val docs = t("documents")
    val vocab = graft.llm.TextAnalysis.vocabWithIds(
      graft.llm.TextAnalysis.vocabTopK(docs, 20))
    val plan = formatted(graft.llm.TextAnalysis.tokenizeToIds(docs, vocab))
    // the (term -> id) table is KBs against TBs of exploded tokens: it must
    // arrive as a broadcast, never a shuffled sort-merge join
    assert("""\(\d+\) BroadcastHashJoin""".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the corpus-side plan shuffles once, on doc_id for the regroup; the
    // vocab's own tiny exchange sits under the k-row TakeOrdered subtree
    val corpusExchanges = """(?s)\(\d+\) Exchange.*?Input.*?\n""".r
      .findAllIn(plan).count(_.contains("doc_id"))
    assert(corpusExchanges === 1, plan)
  }

  test("winnowing fingerprints are a pure scan-side projection — zero exchanges") {
    val plan = formatted(graft.llm.Fingerprint.winnow(t("documents")))
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("CMS build: map-side partial combine both sides of one sketch-keyed exchange") {
    val plan = formatted(graft.llm.Sketch.cmsBuild(t("documents")))
    // partial HashAggregate below the exchange caps per-task output at
    // depth x width rows; the exchange carries (depth, bucket) keys only
    assert("""\(\d+\) HashAggregate""".r.findAllIn(plan).size === 2, plan)
    assert("""\(\d+\) Exchange""".r.findAllIn(plan).size === 1, plan)
    assert(plan.contains("ReadSchema: struct<text:string>"), plan)
  }

  test("semantic decontam: panel broadcasts, corpus never shuffles") {
    val emb = t("embeddings")
    val plan = formatted(graft.llm.Decontam.semanticContamination(
      emb, emb.filter($"vec_id" % 50 === 7), threshold = 0.4))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the only exchange is the per-vector max aggregation on vec_id —
    // embedding arrays are reduced scan-side before it
    val aggExchange = """(?s)\(\d+\) Exchange.*?Arguments: hashpartitioning\(vec_id""".r
    assert(aggExchange.findFirstIn(plan).isDefined, plan)
  }

  test("DSIR: lambda table broadcasts into the scoring scan") {
    val docs = t("documents")
    val lam = graft.llm.Dsir.bucketLogRatios(docs, docs.filter($"lang" === "en"))
      .localCheckpoint(eager = false)
    val plan = formatted(graft.llm.Dsir.score(docs, lam))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("hard negatives ride the broadcast nested loop like brute knn") {
    val plan = formatted(graft.llm.Similarity.hardNegatives(
      t("embeddings"), $"vec_id" < 5, k = 5))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("topic tagging is scan-side only — zero exchanges") {
    val plan = formatted(graft.llm.TextAnalysis.topicTags(t("documents")))
    assert(!plan.contains("Exchange"), plan)
  }

  test("merge upsert: snapshot bulk anti-joins against a broadcast, no snapshot shuffle") {
    val snap = t("orders")
    val cols = snap.columns.map(col).toSeq
    val batch = snap.filter($"o_orderkey" % 7 === 0)
      .select(cols: _*).withColumn("_deleted", lit(false))
    val plan = formatted(graft.sources.Merge.upsert(snap, batch, Seq("o_orderkey")))
    // the MERGE itself is broadcast-only: no sort-merge join anywhere, and
    // the anti-join is a BroadcastHashJoin
    assert("""BroadcastHashJoin LeftAnti""".r.findAllIn(plan).nonEmpty, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the only exchanges are the batch-side rail window + broadcasts — the
    // snapshot's full row set enters no shuffle (its widest column set
    // appears in no Exchange input)
    val exchanges = """(?s)\(\d+\) Exchange.*?Input.*?\n""".r.findAllIn(plan).toSeq
    assert(!exchanges.exists(_.contains("o_orderdate")), plan)
  }

  test("scd2: one shuffle, all window passes share the (key, ts, tie) sort") {
    val plan = formatted(Analytics.scd2History(t("events")))
    assert("""\(\d+\) Exchange""".r.findAllIn(plan).size === 1, plan)
    assert("""\(\d+\) Sort""".r.findAllIn(plan).size === 1, plan)
    assert("""\(\d+\) Window""".r.findAllIn(plan).size >= 2, plan)
  }

  test("paragraph dedup: hashes shuffle, text never does; bulk passes an anti-join") {
    val plan = formatted(
      graft.llm.Dedup.dedupParagraphs(t("documents"), materialize = false))
    val exchanges = """(?s)\(\d+\) Exchange.*?Input.*?\n""".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, plan)
    assert(!exchanges.exists(e => e.contains("text") || e.contains("para")), plan)
    assert(plan.contains("BroadcastHashJoin LeftAnti"), plan)
  }

  test("triangles: equi-joins only — no cartesian/broadcast-nested-loop blowup") {
    val pairs = graft.llm.Similarity.cosinePairsBlocked(t("embeddings"), "label", 0.4)
    val plan = formatted(graft.llm.Graph.triangles(pairs))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("silhouette: scan-side distances, one cell-keyed shuffle, no joins") {
    val emb = t("embeddings")
    val model = graft.llm.Kmeans.trainModel(emb, k = 4, iters = 1)
    val plan = formatted(graft.llm.Kmeans.silhouette(emb, model))
    assert(!plan.contains("Join"), plan)
    assert("""\(\d+\) Exchange""".r.findAllIn(plan).size === 1, plan)
  }

  test("scd2Apply: history bulk via broadcast anti-join, no sort-merge anywhere") {
    val ev = t("events")
    val cut = lit("2024-01-25").cast("timestamp")
    val plan = formatted(Analytics.scd2Apply(
      Analytics.scd2History(ev.filter(col("ts") < cut)),
      ev.filter(col("ts") >= cut)))
    assert(plan.contains("BroadcastHashJoin LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("word entropy is a pure scan-side projection — zero exchanges") {
    val plan = formatted(graft.llm.TextAnalysis.wordEntropy(t("documents")))
    assert(!plan.contains("Exchange"), plan)
  }

  test("source overlap: gram hashes shuffle, text never does") {
    val plan = formatted(graft.llm.Report.sourceOverlap(t("documents")))
    val exchanges = """(?s)\(\d+\) Exchange.*?Input.*?\n""".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, plan)
    assert(!exchanges.exists(_.contains("text")), plan)
  }

  test("random projection is a pure scan-side projection — zero exchanges") {
    val plan = formatted(t("embeddings").select(col("vec_id"),
      graft.llm.Similarity.randomProjection(col("embedding"), 64, 16).as("rp")))
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("zipf fit: top-N via TakeOrdered, not a global sort of the vocabulary") {
    val plan = formatted(graft.llm.Report.zipfFit(t("documents")))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("snapshot diff: digests computed scan-side, text in no exchange") {
    val docs = t("documents")
    val plan = formatted(graft.llm.Report.snapshotDiff(
      docs.filter($"doc_id" % 10 =!= 3), docs.filter($"doc_id" % 10 =!= 5)))
    val exchanges = """(?s)\(\d+\) Exchange.*?Input.*?\n""".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, plan)
    assert(!exchanges.exists(_.contains("text")), plan)
  }

  test("binary knn: Hamming shortlist rides WindowGroupLimit partial limits") {
    val plan = formatted(graft.llm.Similarity.binaryKnn(
      t("embeddings"), $"vec_id" < 5, k = 3, candidates = 20))
    // partial WindowGroupLimit before the exchange AND the final one after
    assert("""\(\d+\) WindowGroupLimit""".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("SortMergeJoin"), plan) // both stages broadcast
  }

  test("quantile sketch: bottom-k rides WindowGroupLimit partial limits (only ~k rows per group per map partition cross the wire)") {
    val plan = formatted(graft.llm.Sketch.quantileBuild(
      t("events"), "event_type", "event_id", "value", k = 256))
    // partial WindowGroupLimit before the exchange AND the final one after:
    // the rank filter is pushed map-side, so the exchange input is bounded
    // by k·partitions per group, never the corpus
    assert("""\(\d+\) WindowGroupLimit""".r.findAllIn(plan).size >= 2, plan)
  }

  test("quantile bucketing: boundaries broadcast into the corpus scan — the only shuffle is the sketch build's own") {
    val ev = t("events")
    val plan = formatted(graft.llm.Sketch.quantileBucket(ev,
      graft.llm.Sketch.quantileBuild(ev, "event_type", "event_id", "value", 64),
      "event_type", "value", Seq(0.25, 0.5, 0.75)))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the PROPERTY: no corpus-side shuffle — the only exchange(s) belong
    // to the k-bounded bottom-k build feeding the broadcast boundaries.
    // Global ntile would add a per-group range/sort exchange of the
    // corpus (a Sort above the corpus scan); asserting "≤ 1 exchange and
    // zero Sort" pins that without the brittle exact count an AQE/planner
    // change could flip. (The build's own WindowGroupLimit sort is
    // k-bounded and allowed — it sits under the one exchange.)
    assert("""\(\d+\) Exchange""".r.findAllIn(plan).size <= 1, plan)
  }

  test("erasure propagation: one broadcast anti-join, bulk never shuffles") {
    val dim = Analytics.scd2History(t("events"))
    val keys = t("events").filter($"user_id" % 7 === 3).select($"user_id")
    val plan = formatted(graft.sources.Merge.applyDeletes(dim, keys, Seq("user_id")))
    assert(plan.contains("BroadcastHashJoin LeftAnti"), plan)
    assert("""\(\d+\) BroadcastHashJoin""".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("expectation scan checks fuse into a single table scan") {
    val plan = formatted(graft.sources.Expect.scanChecks(t("lineitem"), Seq(
      "a" -> $"l_quantity".between(1, 50),
      "b" -> $"l_returnflag".isin("A", "N", "R"),
      "c" -> $"l_shipdate".isNotNull)))
    assert("""\(\d+\) Scan parquet""".r.findAllIn(plan).size === 1, plan)
  }

  test("query expansion: feedback ids gate the corpus via semi-join before the explode") {
    import spark.implicits._
    val plan = formatted(graft.llm.Search.expandQueries(t("documents"),
      Seq((1, "hash"), (2, "window")).toDF("query_id", "term")))
    assert(plan.contains("LeftSemi"), plan)
    // the expansion tail adds no sort-merge join anywhere
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("duplicated spans: text rides in no exchange; islands share one doc sort") {
    val plan = formatted(graft.llm.Dedup.duplicatedSpans(t("documents"), 20))
    val exchanges = """(?s)\(\d+\) Exchange.*?Input.*?\n""".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, plan)
    // windows ride as 64-bit keys: no window string or doc text shuffles
    assert(!exchanges.exists(_.contains("text")), plan)
    // both Window passes (lag + running sum) stack on ONE doc-keyed sort
    assert("""\(\d+\) Sort""".r.findAllIn(plan).size === 1, plan)
    assert("""\(\d+\) Window""".r.findAllIn(plan).size === 2, plan)
  }

  test("surgical decontam: benchmark windows broadcast, corpus never shuffles by window") {
    val docs = t("documents")
    val plan = formatted(graft.llm.Decontam.contaminationSpans(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0), 20))
    assert(plan.contains("BroadcastHashJoin LeftSemi"), plan)
    // the ONLY non-broadcast exchange is the per-doc island sort
    val exchanges = """\(\d+\) Exchange hashpartitioning\(([^,]+)""".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges.forall(_.startsWith("doc_id")), plan)
  }

  test("join-size estimate: sketch branch joins on cells, never on raw keys") {
    val plan = formatted(graft.llm.Sketch.cmsJoinSize(
      t("events"), col("user_id"), t("orders"), col("o_custkey")))
    // depth×width sketch tables are tiny: every join in the estimator
    // (sketch-sketch on cells, depth frame, exact contract, 1×1 attach)
    // stays broadcast — nothing sort-merges, nothing is quadratic
    assert(!plan.contains("SortMergeJoin"), plan)
    assert("""\(\d+\) BroadcastHashJoin""".r.findAllIn(plan).nonEmpty, plan)
  }

  test("more-like-this: term-keyed join only, no cartesian, railed postings") {
    val plan = formatted(graft.llm.Search.moreLikeThis(
      t("documents"), col("doc_id") < 10, k = 5))
    // candidates pair through the railed term postings — never doc×doc
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("team draft: bounded lists, draft steps scan-side (no joins after the list join)") {
    import spark.implicits._
    def rk(base: Long) = (0L until 4L).flatMap(q =>
      (1 to 5).map(r => (q, r, base + q * 10 + r))).toDF("qid", "rank", "neighbor_id")
    val plan = formatted(graft.llm.Eval.teamDraft(rk(0L), rk(100L), rounds = 2))
    // exactly ONE join (the two collected list frames on qid); every
    // draft step is a projection over the collected arrays
    assert("""(?m)^\(\d+\) [A-Za-z]*Join""".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bands/shingles delete: one broadcast anti-join each, corpus side never shuffles") {
    val docs = t("documents")
    val bands = graft.llm.Dedup.bandTable(docs)
    val deleted = docs.filter($"doc_id" % 10 === 7).select($"doc_id")
    val plan = formatted(graft.llm.Dedup.bandsDelete(bands, deleted))
    assert(plan.contains("BroadcastHashJoin LeftAnti"), plan)
    // the band table side passes the anti join in place: its rows enter
    // no hash exchange (only the broadcast build side moves)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("index delete: broadcast gram gating — untouched grams pass without a shuffle") {
    val docs = t("documents")
    // the persisted artifact is a FILE in production — materialize it so
    // the contract reads the probe plan, not the build lineage
    val dir = java.nio.file.Files.createTempDirectory("idx_del_plan").toString
    graft.llm.Search.invertedIndexRaw(docs).write.parquet(s"$dir/idx")
    val old = spark.read.parquet(s"$dir/idx")
    val deletedIdx = graft.llm.Search.invertedIndexRaw(
        docs.filter($"doc_id" % 10 === 6))
      .localCheckpoint(eager = true) // build lineage out of the probe plan
    val plan = formatted(graft.llm.Search.indexDelete(old, deletedIdx))
    // anti (untouched branch) + inner (touched branch), both broadcast;
    // the posting cut is scan-side — no sort-merge, and the old index
    // enters no hash exchange (only the deleted-gram build side moves)
    assert(plan.contains("BroadcastHashJoin LeftAnti"), plan)
    assert("""\(\d+\) BroadcastHashJoin""".r.findAllIn(plan).size === 2, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("window-df delete: only (h, ndocs) shuffles — no text in any exchange") {
    val docs = t("documents")
    val corpusDf = graft.llm.Dedup.windowDf(docs, windowTokens = 20)
      .localCheckpoint(eager = false)
    val plan = formatted(graft.llm.Dedup.windowDfDelete(
      corpusDf, docs.filter($"doc_id" % 10 === 5), windowTokens = 20))
    val exchanges = """(?s)\(\d+\) Exchange.*?Input.*?\n""".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty, plan)
    assert(!exchanges.exists(_.contains("text")), plan)
  }

  test("streamed index read: the railed serving view starts at file scans — no build lineage") {
    val dir = java.nio.file.Files.createTempDirectory("sidx_plan").toString
    graft.streaming.StreamingIndex.applyBatch(
      t("documents").limit(50), dir, 0L)
    val plan = formatted(
      graft.streaming.StreamingIndex.readRailedIndex(spark, dir))
    // one parquet scan (the single live segment), rails as a scan-side
    // filter: no exchange, no aggregation, no tokenize lineage
    assert("""\(\d+\) Scan parquet""".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("HashAggregate"), plan)

    // after more batches land, compaction restores the pure-scan serving
    // shape (the steady-state read the q_index_stream bench measures)
    graft.streaming.StreamingIndex.applyBatch(
      t("documents").limit(80).filter($"doc_id" >= 50), dir, 1L)
    graft.streaming.StreamingIndex.compact(spark, dir)
    val compacted = formatted(
      graft.streaming.StreamingIndex.readRailedIndex(spark, dir))
    assert("""\(\d+\) Scan parquet""".r.findAllIn(compacted).size === 1, compacted)
    assert(!compacted.contains("Exchange"), compacted)
    assert(!compacted.contains("HashAggregate"), compacted)
  }

  test("streamed row-artifact erasure: the version-ordered kill is a broadcast hash anti-join, never a nested loop") {
    // version ordering is resolved STATICALLY per part (part versions are
    // plan-time literals — SegmentedState.rowView anti-joins each part
    // only against strictly-newer tombstone segments), so the kill join
    // is a plain broadcast hash anti join on id, no version columns. A
    // BroadcastNestedLoopJoin here would mean that static resolution
    // regressed to a runtime inequality — bulk × tombstones at 100 TB.
    // Pin the hash form.
    val dir = java.nio.file.Files.createTempDirectory("sivf_plan").toString
    val emb = t("embeddings").limit(60)
    val centers = graft.llm.Similarity.ivfCenters(emb, nCells = 4)
    graft.streaming.StreamingIvf.applyBatch(
      emb.withColumn("_deleted", lit(false)), dir, 0L, centers,
      deleteCol = Some("_deleted"))
    graft.streaming.StreamingIvf.applyBatch(
      emb.filter($"vec_id" === 0).withColumn("_deleted", lit(true)),
      dir, 1L, centers, deleteCol = Some("_deleted"))
    val plan = formatted(graft.streaming.StreamingIvf.readIndex(spark, dir))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // and the bulk side reads segment files directly — no assignment
    // lineage, no SHUFFLE anywhere in the serving view (the only
    // exchange is the tombstone broadcast); the add segment NEWER than
    // the tombstone takes no join at all (plan-time version resolution)
    assert(!plan.contains("hashpartitioning") &&
      !plan.contains("rangepartitioning"), plan)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(plan).size === 3, plan) // 2 seg + 1 del
  }

  test("ivf probe over persisted artifacts: file scans in, no training lineage") {
    val emb = t("embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ivf_plan").toString
    graft.llm.Similarity.ivfCenters(emb, nCells = 4)
      .write.mode("overwrite").parquet(s"$dir/centers")
    val centers = spark.read.parquet(s"$dir/centers")
    graft.llm.Similarity.ivfAssignments(emb, centers)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/index")
    val index = spark.read.parquet(s"$dir/index")
    // cell-partitioned layout: a literal cell probe prunes to that
    // partition's files (the nprobe-cells-only read at cluster scale)
    val pruned = formatted(index.filter(col("cell") === 2))
    assert(pruned.contains("PartitionFilters") &&
      """PartitionFilters: \[[^\]]*cell""".r.findFirstIn(pruned).isDefined,
      pruned)
    val plan = formatted(graft.llm.Similarity.ivfKnnFromIndex(
      index, centers, col("vec_id") < 10, k = 5, nprobe = 4))
    // the probe reads the index files on both sides of the cell join
    // plus the dynamic-pruning subquery scan — the embeddings TABLE and
    // the Lloyd/assignment lineage are gone
    assert("""\(\d+\) Scan parquet""".r.findAllIn(plan).size === 3, plan)
    assert(!plan.contains("embeddings.parquet"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // DYNAMIC partition pruning on the corpus side: at cluster scale the
    // probe physically reads only its nprobe cells' partition files
    assert(plan.contains("dynamicpruningexpression"), plan)
  }

  test("clip-containment probe over the persisted chunk table: corpus media never re-chunked") {
    import graft.llm.Multimodal
    val docs = t("documents")
    val media = Multimodal.mediaFromDocuments(docs)
    val dir = java.nio.file.Files.createTempDirectory("clip_plan").toString
    Multimodal.chunkTable(media).write.mode("overwrite").parquet(s"$dir/chunks")
    val chunks = spark.read.parquet(s"$dir/chunks")
    val batch = Multimodal.mediaFromDocuments(
      docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 900L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    val plan = formatted(
      Multimodal.clipContainmentIncremental(batch, chunks))
    // corpus side = ONE parquet scan of the chunk artifact; the corpus
    // media bytes and their codec-boundary chunking lineage are gone.
    // The only object boundary (mapPartitions -> SerializeFromObject)
    // chunked the BATCH, whose checkpoint truncates it from this plan.
    assert(plan.contains(s"$dir/chunks".stripPrefix("/")) ||
      plan.contains("chunks"), plan)
    assert(!plan.contains("documents.parquet"), plan)
    assert(!plan.contains("SerializeFromObject"), plan)
  }

  test("bucket-pruned index probe: driver-side buckets match the column hash; the base scan takes a static partition filter on them") {
    import graft.llm.Search
    // the two bucketings MUST agree — a divergence would silently prune
    // real postings, so this equality is the safety contract the pruned
    // probes rest on (incl. non-ASCII and empty-string grams)
    val grams = Seq("alpha beta", "the fast", "zz unseen gram",
      "naïve café", "", "word λµ", "a  b")
    val colSide = grams.toDF("gram")
      .select(col("gram"), pmod(xxhash64(col("gram")), lit(16L)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (g <- grams)
      assert(Search.gramBuckets(Seq(g), 16) === Seq(colSide(g)), s"gram '$g'")

    // a bucket-partitioned persisted index + a literal panel probe:
    // static partition pruning (PartitionFilters on b) — only the panel
    // grams' buckets' files are listed and read
    val dir = java.nio.file.Files.createTempDirectory("pruned_idx").toString
    val docs = t("documents").limit(150)
    Search.withBucket(Search.invertedIndexRaw(docs), 16)
      .write.mode("overwrite").partitionBy("b").parquet(dir)
    val idx = spark.read.parquet(dir)
    val panelGrams = Search.PhrasePanel
      .flatMap(p => Search.phraseGrams(p._2)).distinct
    val pruned = Search.pruneToGrams(idx, panelGrams, 16)
    val plan = formatted(pruned)
    assert("""PartitionFilters: \[[^\]]*b#\d+L? IN""".r
      .findFirstIn(plan).isDefined, plan)
    assert(plan.contains("PushedFilters") && plan.contains("In(gram"), plan)
    // pruning is the identity restricted to the panel: same rows as a
    // plain gram filter over the full index
    assert(pruned.orderBy($"gram").collect().toSeq
      === idx.drop("b").filter($"gram".isin(panelGrams: _*))
        .orderBy($"gram").collect().toSeq)
  }

  test("streamed index pruned read: the compacted base scan carries the panel buckets' static partition filter and serves identical rows") {
    import graft.llm.Search
    import graft.streaming.StreamingIndex
    val dir = java.nio.file.Files.createTempDirectory("sidx_pruned").toString
    val docs = t("documents").limit(120)
    // 3 batches at maxSegments=3 → major at batch 2: bucketed base +
    // manifest-recorded modulus, plus one more live segment on top
    (0L to 2L).foreach { b =>
      StreamingIndex.applyBatch(docs.filter($"doc_id" % 3 === b), dir, b,
        maxSegments = 3)
    }
    StreamingIndex.applyBatch(docs.limit(0), dir, 3L, maxSegments = 8)
    val panelGrams = Search.PhrasePanel
      .flatMap(p => Search.phraseGrams(p._2)).distinct
    val view = StreamingIndex.readIndexPruned(spark, dir, panelGrams)
    val plan = formatted(view)
    assert("""PartitionFilters: \[[^\]]*b#\d+L? IN""".r
      .findFirstIn(plan).isDefined, plan)
    // parity with the unpruned view restricted to the panel — catches a
    // wrong modulus (manifest vs configuration) or a hash divergence
    assert(view.orderBy($"gram").collect().toSeq
      === StreamingIndex.readIndex(spark, dir)
        .filter($"gram".isin(panelGrams: _*))
        .orderBy($"gram").collect().toSeq)
  }
}
