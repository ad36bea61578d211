package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Analytics
import graft.etl.{EnvelopeGen, EventEtl}

/** The driver-facing query catalog: one entry per implemented operator
  * (SURVEY.md §2), plus the analytics and LLM-pipeline layers. Each
  * oracle-able query has DuckDB SQL in [[Oracles.all]] (its own file) with
  * identical column names/aliases and a total deterministic ORDER BY.
  */
object Queries {

  import SparkEntry.HmacKey

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    graft.sources.Tables.load(s, dir, n)

  /** CPU-heavy LLM operators over the single-file documents/embeddings
    * tables: one parquet file = one input split = one task, serializing the
    * whole shingle/hash/score pipeline. A tiny repartition shuffle (~5 MB)
    * buys full-core parallelism; at production scale the source would
    * already arrive in many splits and this becomes a no-op choice. */
  private def tWide(s: SparkSession, dir: String, n: String): DataFrame =
    t(s, dir, n).repartition(s.sparkContext.defaultParallelism)

  /** The q_media_clip_* planted batch: 33-byte-offset (OFF-grid) clips
    * of docs 0–9, shared by the offgrid/incr/prebuilt/delete rows. */
  private def clipBatch(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") < 10 && col("n_chars") >= 224)
      .select(
        (col("doc_id") + 3000000L).as("media_id"),
        col("text").substr(lit(34), col("n_chars")).cast("binary").as("media"),
        (col("n_chars") - 33).cast("int").as("width"),
        lit("utf8").as("format"),
        lit(1).as("height"))

  /** Raw synthetic envelopes, materialized once per (session, dir):
    * `localCheckpoint` + cache because every ETL query shares this source —
    * in a real deployment the envelopes are a parquet/Kafka scan, and the
    * checkpoint restores that one-materialization shape for the synthetic
    * generator. Repartitioned to full parallelism first: the events table is
    * a single parquet file = one input split, and without the exchange EVERY
    * ETL query's parse stage would run as one task (a Pub/Sub/Kafka source
    * arrives many-partitioned; this restores that shape too). The engine
    * work itself ([[EventEtl.parsed]] onward) is NOT cached — each query
    * pays its own transform cost. */
  private val envCache =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  private def envelopes(s: SparkSession, dir: String): DataFrame =
    envCache.getOrElseUpdate((s, dir),
      EnvelopeGen.fromEvents(t(s, dir, "events"))
        .repartition(s.sparkContext.defaultParallelism)
        .localCheckpoint())
  /** Quantile panel shared by the q_quantile_* rows (and their oracles). */
  private val QuantilePanel = Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99))

  /** Publish a quantile-sketch estimate with its rank-error contract: the
    * empirical CDF of the TRUTH population at the estimate must sit within
    * `bound` of the requested q (the sample-quantile guarantee the sketch
    * is built on). The estimate frame is ≤ groups×panel rows — broadcast
    * against the population scan, never a shuffle of the corpus. */
  private def quantileContract(est: DataFrame, pop: DataFrame,
      bound: Double, okCol: String): DataFrame =
    broadcast(est).join(pop, Seq("grp"))
      .groupBy(col("grp"), col("qlabel"), col("q"), col("est_value"))
      .agg((count(when(col("v_pop") <= col("est_value"), lit(1))).cast("double")
        / count(lit(1)).cast("double")).as("frac_le"))
      .select(col("grp"), col("qlabel"), col("q"), col("est_value"),
        (abs(col("frac_le") - col("q")) <= bound).as(okCol))
      .orderBy(col("grp"), col("qlabel"))

  /** Persisted-index-artifact build with the doc count riding the SAME
    * scan (the Search.bm25 observe() discipline): returns (index, nDocs)
    * for ONE corpus read where artifact-build-plus-`docs.count()` paid
    * two — and, in bench mode, ZERO corpus reads on steady-state passes,
    * because n persists as a 1-row `<name>_n` sidecar next to the index
    * artifact (a production index ships with its stats sidecar — the
    * [[graft.streaming.StreamingIndex]] stats contract, batch form).
    * Verify mode eagerly checkpoints the build (the action that fires the
    * observed metric), so the gate still proves build ≡ oracle from
    * scratch every run. */
  private def countedArtifact(s: SparkSession, name: String,
      partitionBy: Seq[String], docs: DataFrame)(
      build: DataFrame => DataFrame): (DataFrame, Long) =
    sources.Artifacts.root match {
      case None =>
        val obs = org.apache.spark.sql.Observation()
        val idx = build(docs.observe(obs, count(lit(1)).as("n_docs")))
          .localCheckpoint(eager = true)
        (idx, obs.get("n_docs").asInstanceOf[Long])
      case Some(r) =>
        val nPath = s"$r/${name}_n"
        if (new java.io.File(nPath, "_SUCCESS").exists()) {
          val idx = sources.Artifacts.table(s, name, partitionBy)(
            sys.error(s"artifact $name must exist when its sidecar does"))
          (idx, s.read.parquet(nPath).head.getLong(0))
        } else {
          // index-present-without-sidecar would make table() skip the
          // build and the observation below block forever — fail loudly
          // (a crash between the two writes; wipe the artifact root)
          require(!new java.io.File(s"$r/$name/_SUCCESS").exists(),
            s"index artifact $name exists without its _n sidecar — " +
              "stale artifact root, wipe it")
          val obs = org.apache.spark.sql.Observation()
          val idx = sources.Artifacts.table(s, name, partitionBy)(
            build(docs.observe(obs, count(lit(1)).as("n_docs"))))
          val n = obs.get("n_docs").asInstanceOf[Long]
          import s.implicits._
          Seq(n).toDF("n_docs").coalesce(1).write.mode("overwrite")
            .parquet(nPath)
          (idx, n)
        }
    }

  private def parsedDf(s: SparkSession, dir: String): DataFrame =
    EventEtl.parsed(envelopes(s, dir), HmacKey)
  private def flat(s: SparkSession, dir: String): DataFrame =
    EventEtl.pipeline(envelopes(s, dir), HmacKey)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- ETL chain: O2-O5 decode/unwrap (round-trip identity) ----
    "q_etl_decode" -> ((s, dir) =>
      parsedDf(s, dir)
        .select(col("event_id"), col("event_type"), col("time_ms"))
        .orderBy(col("event_id"))),

    // ---- O6 validation gate ----
    "q_etl_validate" -> ((s, dir) =>
      parsedDf(s, dir).filter(col("valid"))
        .select(col("event_id"), col("user_id_raw").as("user_id"),
          col("device_id_raw").as("device_id"))
        .orderBy(col("event_id"))),

    // ---- O7 session_id repair (parseInt / -1 / numeric passthrough) ----
    "q_etl_repair_session" -> ((s, dir) =>
      parsedDf(s, dir).filter(col("valid"))
        .select(col("event_id"), col("session_id"))
        .orderBy(col("event_id"))),

    // ---- O10 identify split: arity + ordering ----
    "q_etl_split_identify" -> ((s, dir) =>
      flat(s, dir)
        .select(col("event_id"), col("event_type"), col("is_identify"), col("seq"))
        .orderBy(col("event_id"), col("seq"))),

    // ---- O10 verb/non-verb map partition fidelity ----
    "q_etl_user_props" -> ((s, dir) =>
      flat(s, dir)
        .filter(!col("is_identify"))
        .select(col("event_id"), col("user_properties"))
        .orderBy(col("event_id"))),

    // ---- O8 pseudonymize (HMAC — no SQL oracle; golden-vector tested) ----
    "q_etl_pseudonymize" -> ((s, dir) =>
      flat(s, dir)
        .filter(!col("is_identify"))
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id"))),

    // ---- O9 insert_id (HMAC-of-HMAC — no SQL oracle) ----
    "q_etl_insert_id" -> ((s, dir) =>
      flat(s, dir)
        .filter(!col("is_identify"))
        .select(col("event_id"), col("insert_id"))
        .orderBy(col("event_id"))),

    // ---- O12-adjacent: effectively-once dedup of a redelivered batch ----
    "q_etl_dedup" -> ((s, dir) => {
      val env = envelopes(s, dir)
      val doubled = env.unionByName(env) // simulated Pub/Sub redelivery
      EventEtl.pipelineDedup(doubled, HmacKey)
        .select(col("event_id"), col("event_type"), col("is_identify"))
        .orderBy(col("event_id"), col("is_identify").desc)
    }),

    // ---- O11+O14 batch metrics + error side-channels (utils.js:66) ----
    "q_etl_metrics" -> ((s, dir) =>
      EventEtl.pipelineMetrics(parsedDf(s, dir))),

    // ---- analytics: aggregations ----
    "q1_pricing_summary" -> ((s, dir) => Analytics.pricingSummary(t(s, dir, "lineitem"))),
    "q_top_customers" -> ((s, dir) =>
      Analytics.topCustomers(t(s, dir, "orders"), t(s, dir, "customer"), 10)),
    "q_region_revenue" -> ((s, dir) =>
      Analytics.regionRevenue(t(s, dir, "lineitem"), t(s, dir, "orders"),
        t(s, dir, "customer"), t(s, dir, "nation"), t(s, dir, "region"))),
    "q_rollup_revenue" -> ((s, dir) =>
      Analytics.rollupRevenue(t(s, dir, "orders"), t(s, dir, "customer"),
        t(s, dir, "nation"), t(s, dir, "region"))),
    "q_segment_revenue" -> ((s, dir) =>
      Analytics.segmentRevenue(t(s, dir, "orders"), t(s, dir, "customer"))),
    // TPC-H-shape pack: correlated scalar subquery (decorrelated), EXISTS
    // (semi), conditional share, NOT IN (anti) + count-distinct
    "q_small_order_rev" -> ((s, dir) =>
      Analytics.smallOrderRevenue(t(s, dir, "lineitem"), t(s, dir, "part"))),
    "q_priority_returns" -> ((s, dir) =>
      Analytics.priorityReturns(t(s, dir, "orders"), t(s, dir, "lineitem"))),
    "q_promo_share" -> ((s, dir) =>
      Analytics.promoShare(t(s, dir, "lineitem"), t(s, dir, "part"))),
    "q_supplier_breadth" -> ((s, dir) =>
      Analytics.supplierBreadth(t(s, dir, "lineitem"), t(s, dir, "part"),
        t(s, dir, "supplier"))),
    "q_daily_active" -> ((s, dir) => Analytics.dailyActive(t(s, dir, "events"))),
    // per-hour volume z-scores: tiny hourly agg + one broadcast stats row
    "q_hourly_anomaly" -> ((s, dir) => Analytics.hourlyAnomalies(t(s, dir, "events"))),
    // the STREAMING anomaly operator run in batch mode (same code path,
    // windowed agg + literal baseline): the baseline is trained by
    // hourlyBaseline with the batch operator's exact IEEE op order, so z
    // matches q_hourly_anomaly bit-for-bit — batch parity as an oracle row
    "q_hourly_anomaly_stream" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val (mean, std) = streaming.StreamingAnomaly.hourlyBaseline(events)
      streaming.StreamingAnomaly.hourlyAnomalies(events, mean, std)
        .orderBy(col("hour"))
    }),
    // funnel discovery: per-user (prev_type -> type) bigram counts
    "q_transitions" -> ((s, dir) => Analytics.transitions(t(s, dir, "events"))),
    // double-fire cleaner: 1h chain-debounce per (user, type), kept heads
    "q_debounce" -> ((s, dir) =>
      Analytics.debounce(t(s, dir, "events"), withinMs = 3600000L)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))),
    // type-2 SCD history: per-user event_type state intervals, consecutive
    // duplicates collapsed, half-open validity windows — one user_id shuffle,
    // all three window passes on the same sort
    "q_scd2" -> ((s, dir) =>
      Analytics.scd2History(t(s, dir, "events"))
        .orderBy(col("user_id"), col("version"))),
    // CDC steady state: history built from the pre-cutoff events, the
    // post-cutoff batch applied incrementally — untouched keys pass an
    // anti-join, only the batch is windowed. Shares q_scd2's oracle
    // VERBATIM: the maintained table must equal the full recompute.
    "q_scd2_incr" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val cut = lit("2024-01-25").cast("timestamp")
      Analytics.scd2Apply(
          Analytics.scd2History(ev.filter(col("ts") < cut)),
          ev.filter(col("ts") >= cut))
        .orderBy(col("user_id"), col("version"))
    }),
    // STREAMING SCD2: three time-ordered micro-batches folded through the
    // segmented history state — closed intervals append, open rows merge
    // LWW per key, per-batch writes ∝ touched keys (never ∝ history).
    // Redrive drives the un-applied suffix only (resume safety) and
    // serves as-is once the pointer sits at the final id; vacuum
    // reclaims superseded state. Shares q_scd2's full-recompute oracle
    // VERBATIM.
    "q_scd2_stream" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/scd2_stream_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_scd2s").toString
      }
      val c1 = lit("2024-01-18").cast("timestamp")
      val c2 = lit("2024-01-25").cast("timestamp")
      val batches = Seq(ev.filter(col("ts") < c1),
          ev.filter(col("ts") >= c1 && col("ts") < c2),
          ev.filter(col("ts") >= c2))
      streaming.Redrive(s, state, 2L) { i =>
        streaming.StreamingScd2.applyBatch(batches(i.toInt), state,
          "user_id", "ts", "event_type", "event_id", i)
      }
      streaming.StreamingScd2.vacuum(s, state)
      streaming.StreamingScd2.readHistory(s, state)
        .orderBy(col("user_id"), col("version"))
    }),
    // right-to-erasure propagation: the SCD2 history scrubbed of the
    // requested keys through one broadcast anti-join (bulk never shuffles)
    "q_delete_propagation" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      sources.Merge.applyDeletes(
          Analytics.scd2History(ev),
          ev.filter(col("user_id") % 7 === 3).select(col("user_id")),
          Seq("user_id"))
        .orderBy(col("user_id"), col("version"))
    }),
    // the erasure request's compliance evidence: deleted rows/keys and
    // the remaining-row count, exact
    "q_delete_audit" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      sources.Merge.deleteAudit(
          Analytics.scd2History(ev),
          ev.filter(col("user_id") % 7 === 3).select(col("user_id")),
          Seq("user_id"))
    }),
    // key-skew diagnostic: share of the heaviest keys + Gini of the
    // count distribution — the "do we need salting here?" report
    "q_skew_report" -> ((s, dir) =>
      analytics.Skew.skewReport(t(s, dir, "events"), "event_type", topK = 3)),
    // data-contract expectation suite: four fused scan checks + key
    // uniqueness + referential integrity, published as the audit report
    "q_expectations" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      sources.Expect.suite(
        sources.Expect.scanChecks(li, Seq(
          "lineitem_quantity_range" -> col("l_quantity").between(1, 50),
          "lineitem_returnflag_accepted" ->
            col("l_returnflag").isin("A", "N", "R"),
          "lineitem_shipdate_not_null" -> col("l_shipdate").isNotNull,
          "lineitem_discount_range" -> col("l_discount").between(0, 0.1))),
        sources.Expect.unique(li, Seq("l_orderkey", "l_linenumber"),
          "lineitem_pk_unique"),
        sources.Expect.refIntegrity(li, "l_orderkey",
          t(s, dir, "orders"), "o_orderkey", "lineitem_orders_fk"))
    }),
    // hour-of-day seasonal anomaly z-scores: each hour vs the SAME
    // slot's baseline, so daily periodicity stops masking spikes
    "q_seasonal_anomaly" -> ((s, dir) =>
      Analytics.seasonalAnomalies(t(s, dir, "events"))
        .orderBy(col("hour"))),
    // experimentation read-out: deterministic user_id % 2 arms, distinct
    // exposures/conversions, pooled two-proportion z, |z| > 1.96 call
    "q_ab_test" -> ((s, dir) =>
      Analytics.abTest(t(s, dir, "events"), col("user_id") % 2)),
    // EWMA(1/8) hourly level + forecast + spike flags: integer nano-grid
    // fold over the one collected hourly array (sequential by nature)
    "q_ewma_baseline" -> ((s, dir) =>
      Analytics.ewmaBaseline(t(s, dir, "events"))),
    // temporal lookup against the SCD2 dimension: purchases pick up the
    // state current at their timestamp (point-in-validity join)
    "q_scd2_lookup" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Analytics.scd2Lookup(
          ev.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("ts")),
          Analytics.scd2History(ev))
        .orderBy(col("event_id"))
    }),
    // top 3-step event-type paths inside 30-min-gap sessions — the
    // discovered-order complement to the prescribed-order funnel
    "q_session_paths" -> ((s, dir) =>
      Analytics.topSessionPaths(t(s, dir, "events"))),
    "q_topk_events" -> ((s, dir) => Analytics.topkEvents(t(s, dir, "events"), 5)),
    // HLL's raw estimate can't be oracled (DuckDB's sketch differs), but
    // its ERROR CONTRACT can: emit the exact count plus a boolean asserting
    // the estimate landed within 5× the requested rsd — the oracle predicts
    // TRUE, so a broken sketch (or a silently-exact fallback emitting
    // nonsense) fails the hash compare. approx_users is still computed (the
    // boolean forces the HLL+exact two-agg plan).
    "q_uniques_hll" -> ((s, dir) =>
      Analytics.uniques(t(s, dir, "events"))
        .select(col("exact_users"),
          (abs(col("approx_users").cast("double") / col("exact_users").cast("double")
            - 1.0) <= 0.05).as("hll_within_5pct"))),
    // mergeable-artifact uniques: per-day HLL sketches unioned for the
    // period count (never re-scanning events); ±5% contract vs exact
    "q_uniques_sketches" -> ((s, dir) =>
      Analytics.uniquesFromDailySketches(t(s, dir, "events"))),
    // HLL artifact MAINTENANCE: per-day sketch tables built over two
    // disjoint corpus halves fold via lossless same-day sketch union
    // (hllDailyMerge) — estimates off the maintained table must satisfy
    // the same ±5% contract as a rebuild over the union corpus (shares
    // q_uniques_sketches's oracle verbatim); only sketch rows move
    "q_hll_incr" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val table = sources.Artifacts.table(s, "hll_daily_old")(
        Analytics.hllDailyBuild(ev.filter(col("event_id") % 2 === 0)))
      val batch = Analytics.hllDailyBuild(ev.filter(col("event_id") % 2 === 1))
      Analytics.hllUniquesFromTable(
        Analytics.hllDailyMerge(table, batch), ev)
    }),
    // HLL artifact ERASURE: the insertion-only-sketch taxonomy resolved
    // by day-pruned rebuild — doomed users' days rebuild their sketches
    // from that day's survivors (broadcast-gated scan), untouched days
    // reuse their artifact bytes verbatim (spec-pinned in AnalyticsSpec).
    // Oracle = the survivors' exact count + contract.
    "q_hll_delete" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val doom = col("user_id") % 10 === 3
      val table = sources.Artifacts.table(s, "hll_daily_full")(
        Analytics.hllDailyBuild(ev))
      Analytics.hllUniquesFromTable(
        Analytics.hllDailyDelete(table, ev.filter(!doom), ev.filter(doom)),
        ev.filter(!doom))
    }),
    // the exact half of uniques() split out so it gets a value-level oracle
    "q_uniques_exact" -> ((s, dir) =>
      t(s, dir, "events").agg(count_distinct(col("user_id")).as("exact_users"))),

    // Z-order (Morton) mapping — the multi-dim clustering key behind
    // OPTIMIZE ZORDER data skipping: pure bit arithmetic (codegen'd, no
    // UDF), published per event so the oracle pins the interleave
    // exactly; the skipping behavior itself is FS-byte-pinned in
    // LayoutSpec (a 2nd-dimension predicate reads a fraction of the
    // z-clustered files vs a single-column-sorted layout).
    "q_zorder" -> ((s, dir) =>
      t(s, dir, "events").select(col("event_id"),
        sources.Layout.zValue2(pmod(col("user_id"), lit(4096L)),
          pmod(col("event_id"), lit(4096L)), bits = 12).as("zval"))
        .orderBy(col("event_id"))),
    // k = 3 Z-order over (day, user, event) buckets — production
    // OPTIMIZE ZORDER takes a column list; the round-robin interleave is
    // oracle-pinned bit-for-bit and the k = 3 skipping contract is
    // FS-byte-pinned in LayoutSpec.
    "q_zorder3" -> ((s, dir) =>
      t(s, dir, "events").select(col("event_id"),
        sources.Layout.zValueN(Seq(
          pmod(datediff(col("ts").cast("date"),
            lit("1970-01-01").cast("date")), lit(1024)),
          pmod(col("user_id"), lit(1024L)),
          pmod(col("event_id"), lit(1024L))), bits = 10).as("zval"))
        .orderBy(col("event_id"))),

    // ---- analytics: grouping sets / joins beyond inner / set ops ----
    "q_cube_revenue" -> ((s, dir) =>
      Analytics.cubeRevenue(t(s, dir, "orders"), t(s, dir, "customer"))),
    "q_join_semi_anti" -> ((s, dir) =>
      Analytics.customerOrderPresence(t(s, dir, "orders"), t(s, dir, "customer"))),
    "q_set_cohorts" -> ((s, dir) =>
      Analytics.viewPurchaseCohorts(t(s, dir, "events"))),

    // ---- warehouse maintenance: keyed MERGE (upsert) ----
    // a deterministic change batch derived from the snapshot itself
    // (updates %7, tombstones %13 minus the update keys, inserts at
    // −key−1 for %11 keys — strictly negative, guaranteed-absent) applied
    // via the broadcast-anti-join MERGE; the snapshot bulk never shuffles
    // STREAMING SNAPSHOT (CDC latest-state): three time-ordered change
    // batches — per batch, each user's LATEST event row (one row per key,
    // the MERGE contract) — folded through the segmented LWW state, then
    // a pure-tombstone batch erases users ≡ 3 (mod 7). Serves the latest
    // event per surviving user; oracle = the same argmax in SQL. The one
    // maintained state that previously had spec-only coverage.
    "q_snapshot_stream" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/snap_stream_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_snaps").toString
      }
      def latestPerUser(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("_rn", row_number().over(Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("_rn") === 1).drop("_rn")
      val c1 = lit("2024-01-18").cast("timestamp")
      val c2 = lit("2024-01-25").cast("timestamp")
      val batches = Seq(
        latestPerUser(ev.filter(col("ts") < c1))
          .withColumn("_deleted", lit(false)),
        latestPerUser(ev.filter(col("ts") >= c1 && col("ts") < c2))
          .withColumn("_deleted", lit(false)),
        latestPerUser(ev.filter(col("ts") >= c2))
          .withColumn("_deleted", lit(false)),
        // erasure batch: full-row tombstones for every user ≡ 3 (mod 7)
        latestPerUser(ev.filter(col("user_id") % 7 === 3))
          .withColumn("_deleted", lit(true)))
      streaming.Redrive(s, state, 3L) { i =>
        streaming.StreamingSnapshot.applyBatch(batches(i.toInt), state,
          Seq("user_id"), "_deleted", i)
      }
      streaming.StreamingSnapshot.vacuum(s, state)
      streaming.StreamingSnapshot.readSnapshot(s, state)
        .orderBy(col("user_id"))
    }),
    "q_merge_upsert" -> ((s, dir) => {
      val snap = t(s, dir, "orders")
      val cols = snap.columns.map(col).toSeq
      val updates = snap.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .select(cols: _*).withColumn("_deleted", lit(false))
      val deletes = snap.filter(col("o_orderkey") % 13 === 0 &&
          col("o_orderkey") % 7 =!= 0)
        .select(cols: _*).withColumn("_deleted", lit(true))
      val inserts = snap.filter(col("o_orderkey") % 11 === 0)
        .withColumn("o_orderkey", -col("o_orderkey") - 1)
        .withColumn("o_orderstatus", lit("N"))
        .select(cols: _*).withColumn("_deleted", lit(false))
      graft.sources.Merge.upsert(snap,
          updates.unionByName(deletes).unionByName(inserts), Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- analytics: as-of join (event enrichment with latest state) ----
    // each event picks up its user's latest daily-snapshot value at or
    // before the event time — the classic as-of enrichment, via the
    // union+last_value composition (no range join)
    "q_asof_enrich" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val snap = ev.groupBy(col("user_id"), date_trunc("day", col("ts")).as("rts"))
        .agg(max(col("value")).as("day_max"))
      Analytics.asofJoin(
        ev.select(col("event_id"), col("user_id"), col("ts")), snap,
        "user_id", "ts", "rts", Seq("day_max"))
        .select(col("event_id"), col("day_max"))
        .orderBy(col("event_id"))
    }),

    // last-touch attribution: conversions credit the latest in-window
    // touch via the audited asof composition; deterministic under
    // same-timestamp touch bursts (max-(type,id) dedupe)
    "q_attribution" -> ((s, dir) =>
      Analytics.lastTouchAttribution(t(s, dir, "events"))
        .orderBy(col("event_id"))),
    // data-driven Markov removal-effect attribution: journey chain,
    // 12 integer value-iteration rounds, per-channel removal surgery
    "q_attribution_markov" -> ((s, dir) =>
      Analytics.markovAttribution(t(s, dir, "events"))
        .orderBy(col("channel"))),
    // multi-touch attribution: U-shaped (40/20/40 position-based) and
    // time-decay (2^(−Δt/6h), nano-grid weights → exact integer
    // normalizer) credits side by side, one interval join + one window
    "q_attribution_multi" -> ((s, dir) =>
      Analytics.multiTouchAttribution(t(s, dir, "events"))
        .orderBy(col("event_id"), col("position"))),
    // trailing 7-day actives + DAU/WAU stickiness: broadcast day-list
    // range join, exact distinct per window (HLL swap documented at scale)
    "q_rolling_active" -> ((s, dir) =>
      Analytics.rollingActive(t(s, dir, "events"))
        .orderBy(col("day"))),

    // ---- analytics: range (interval-containment) join ----
    // events matched into their user's 6-hour daily window via the
    // bucketized range join (equi-join on (key, hour-bucket) + residual)
    "q_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val win = ev.select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
        .select(col("user_id"),
          timestamp_millis(unix_millis(col("day")) + (col("user_id") % 12) * 3600000L)
            .as("w_start"),
          timestamp_millis(unix_millis(col("day")) + (col("user_id") % 12 + 6) * 3600000L)
            .as("w_end"))
      Analytics.rangeJoin(
        ev.select(col("event_id"), col("user_id"), col("ts")), win,
        "user_id", "ts", "w_start", "w_end", bucketWidth = 3600000L)
        .select(col("event_id"), col("w_start"))
        .orderBy(col("event_id"))
    }),

    // ---- analytics: skew mitigation, oracled against plain semantics ----
    // the salted two-phase aggregation must equal the plain groupBy — the
    // oracle IS the plain SQL, so the hot-key path can't drift
    "q_salted_agg" -> ((s, dir) =>
      analytics.Skew.saltedSumCount(
        t(s, dir, "orders").select(col("o_custkey"),
          col("o_totalprice").cast("decimal(18,6)").as("price")),
        "o_custkey", "price")
        .select(col("o_custkey"),
          col("sum_price").cast("string").cast("double").as("sum_price"),
          col("n_rows"))
        .orderBy(col("o_custkey"))),

    // ---- analytics: explicit grouping sets (beyond rollup/cube) ----
    "q_grouping_sets" -> ((s, dir) =>
      Analytics.groupingSetsRevenue(t(s, dir, "orders"), t(s, dir, "customer"))),

    // ---- analytics: pivot (explicit value set — no discovery pass) ----
    "q_pivot_revenue" -> ((s, dir) =>
      Analytics.pivotRevenue(t(s, dir, "orders"), t(s, dir, "customer"),
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))),

    // ---- analytics: full outer join (the one join shape not yet pinned) ----
    "q_join_outer" -> ((s, dir) => {
      val n = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      t(s, dir, "customer")
        .join(n, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("n_orders"))
        .orderBy(col("custkey"))
    }),

    // ---- analytics: scalar string functions, one oracle-pinned row each ----
    "q_string_fns" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        levenshtein(substring(col("text"), 1, 12), col("source")).cast("long").as("lev"),
        reverse(col("source")).as("rev_source"),
        lpad(col("doc_id").cast("string"), 6, "0").as("padded"),
        translate(col("source"), "src", "XYZ").as("translated"),
        concat(repeat(lit("ab"), 2), substring(col("text"), 1, 4)).as("combo"))
        .orderBy(col("doc_id"))),

    // ---- analytics: scalar date/time functions ----
    "q_date_fns" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"))
        .orderBy(col("o_orderkey"))),

    // ---- analytics: scalar array functions ----
    "q_array_fns" -> ((s, dir) => {
      val w = split(lower(trim(col("text"))), "\\s+")
      t(s, dir, "documents").select(
        col("doc_id"),
        size(w).cast("long").as("n"),
        array_join(slice(w, 2, 3), " ").as("mid"),
        size(array_distinct(w)).cast("long").as("n_uniq"),
        array_contains(w, "the").as("has_the"),
        array_join(slice(array_sort(array_distinct(w)), 1, 5), ",").as("sorted_uniq5"))
        .orderBy(col("doc_id"))
    }),

    // ---- analytics: unpivot/melt (inverse of pivot, shuffle-free) ----
    "q_unpivot" -> ((s, dir) =>
      Analytics.unpivotPartMeasures(t(s, dir, "part"))),

    // ---- analytics: ranking-function family ----
    "q_window_rank" -> ((s, dir) =>
      Analytics.orderRanks(t(s, dir, "orders"))
        .orderBy(col("o_custkey"), col("rn"))),
    // per-group top-k (vs q_topk_events' global top-k): one shuffle on the
    // group key, per-partition sort, early filter — no global sort
    "q_topk_per_group" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("source"), col("rn"), col("doc_id"), col("n_chars"))
        .orderBy(col("source"), col("rn"))
    }),

    // ---- analytics: distribution + frame window functions (the rank
    // family is q_window_rank): percent_rank/cume_dist are ratios of row
    // counts — exact int-derived doubles, oracle-safe — and the bounded
    // ROWS frame exercises sliding aggregation (empty frame → NULL on
    // both engines) ----
    "q_window_cume" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      t(s, dir, "documents").select(
          col("source"), col("doc_id"), col("n_chars"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          sum(col("n_chars")).over(w.rowsBetween(-3, -1)).as("prev3_chars"),
          first(col("doc_id")).over(w).as("first_doc"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // RANGE-interval frame (value-defined bounds; q_window_cume covers the
    // ROWS family): trailing-30-day spend per customer
    "q_window_range" -> ((s, dir) =>
      Analytics.trailingSpend(t(s, dir, "orders"), days = 30)),

    // ---- analytics: numerically-disciplined moments ----
    // stddev/corr straight from the built-in double aggregators are NOT
    // cross-engine-reproducible (merge order varies with partitioning);
    // the scale-safe discipline is exact integer power sums (map-side
    // combinable, overflow-free at these magnitudes) folded to doubles by
    // an identical expression tree on both engines — bit-exact.
    // outlier-resistant money summary: self-computed discrete order
    // statistics on the cents grid (no percentile-function tie trust),
    // MAD, trimmed + winsorized means
    "q_robust_stats" -> ((s, dir) =>
      Analytics.robustStats(t(s, dir, "orders"), col("o_totalprice"))),
    "q_stats_moments" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"),
        col("n_chars").cast("long").as("x"),
        llm.TextAnalysis.tokenCount(col("text")).cast("long").as("y"))
      val agg = d.groupBy(col("source")).agg(
        count(lit(1)).as("n_rows"),
        sum(col("x")).as("sx0"), sum(col("y")).as("sy0"),
        sum(col("x") * col("x")).as("sxx0"),
        sum(col("y") * col("y")).as("syy0"),
        sum(col("x") * col("y")).as("sxy0"))
      val n = col("n_rows").cast("double")
      val sx = col("sx0").cast("double"); val sy = col("sy0").cast("double")
      val sxx = col("sxx0").cast("double"); val syy = col("syy0").cast("double")
      val sxy = col("sxy0").cast("double")
      agg.select(col("source"), col("n_rows"),
          (sx / n).as("mean_chars"),
          sqrt((sxx - sx * sx / n) / (n - lit(1.0))).as("stddev_chars"),
          ((n * sxy - sx * sy) /
            (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
            .as("corr_chars_tokens"))
        .orderBy(col("source"))
    }),

    // per-group HLL with the same error-contract publishing as the global
    // q_uniques_hll: exact count + a boolean the oracle predicts TRUE
    "q_uniques_per_group" -> ((s, dir) =>
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id")).as("approx_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users").cast("double")
            / col("exact_users").cast("double") - 1.0) <= 0.15)
            .as("hll_within_15pct"))
        .orderBy(col("event_type"))),

    // ---- analytics: higher-order array functions (lambda forms — the
    // non-lambda array surface is q_array_fns) ----
    "q_hof_fns" -> ((s, dir) => {
      val words = filter(split(lower(trim(col("text"))), "\\s+"),
        w => w =!= lit(""))
      t(s, dir, "documents").select(
          col("doc_id"),
          size(filter(words, w => length(w) > 3)).as("n_long_words"),
          aggregate(words, lit(0L), (acc, w) => acc + length(w))
            .as("total_word_chars"),
          exists(words, w => w === lit("the")).as("has_the"),
          aggregate(zip_with(words, words,
              (a, b) => (length(a) * length(b)).cast("long")),
            lit(0L), (acc, v) => acc + v).as("sum_sq_word_len"))
        .orderBy(col("doc_id"))
    }),

    // ---- SQL surface: the library's functions from pure SQL ----
    // registerAll + temp view + spark.sql — the path a SQL client (or
    // spark.sql.extensions=graft.GraftExtensions) uses; size() over the
    // codegen'd kernels is engine-mirrorable even where hashes aren't
    "q_sql_surface" -> ((s, dir) => {
      GraftFunctions.registerAll(s)
      tWide(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql("""SELECT doc_id,
              |  CAST(size(shingle_hashes(text, 3)) AS BIGINT) AS n_shingles,
              |  CAST(size(md5_token_hashes(text)) AS BIGINT) AS n_tokens
              |FROM documents_v ORDER BY doc_id""".stripMargin)
    }),

    // ---- warehouse: column profiling ----
    // one-scan per-column row/null/distinct profile (exact distincts via
    // the standard Expand multi-distinct plan; exact=false swaps in HLL
    // for the Expand-free 100 TB path)
    "q_profile" -> ((s, dir) =>
      sources.Profile.profile(t(s, dir, "events"),
          Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
        .orderBy(col("col_name"))),

    // continuous-metric Welch z over a deterministic 50/50 hash split:
    // exact cents moment sums per arm, pinned-order derived doubles
    "q_mean_test" -> ((s, dir) =>
      Analytics.meanTest(
        t(s, dir, "events").withColumn("arm",
          when(llm.Sampling.keepByDigest(col("user_id"), 0.5), "a")
            .otherwise("b")),
        col("arm"), "a", "b", col("value"))),

    // delta-method SE for the user-level click/view ratio: naive row
    // binomial variance is wrong under within-user correlation
    "q_ratio_metric" -> ((s, dir) =>
      Analytics.ratioMetricCi(t(s, dir, "events"), col("user_id"),
        when(col("event_type") === "click", 1L).otherwise(0L),
        when(col("event_type") === "view", 1L).otherwise(0L))),

    // SRM gate: chi-square of hash-split arm counts vs the configured
    // 50/25/25 allocation — literal-unrolled pinned-order terms
    "q_srm" -> ((s, dir) =>
      Analytics.srmCheck(
        llm.Sampling.assignSplit(
          t(s, dir, "events").select(col("user_id")).distinct(),
          col("user_id"), 0.5, 0.25),
        col("split"),
        Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25),
        critValue = 5.991464547107979)),

    // CUPED variance reduction: pre-period covariate vs experiment metric
    // per user, exact cents-grid moment sums, pinned-order IEEE derived
    // values — the A/B sensitivity lever next to q_ab_test
    "q_cuped" -> ((s, dir) =>
      Analytics.cupedReport(t(s, dir, "events"),
        lit("2024-01-15").cast("timestamp"))),

    // Poisson bootstrap (one pass, no resampled copies): 16 deterministic
    // replicates of mean order value on the cents grid — md5 uniforms,
    // literal inverse-CDF cutoffs, one published division per replicate
    "q_bootstrap" -> ((s, dir) =>
      Analytics.bootstrapReplicates(t(s, dir, "orders"),
          col("o_orderkey"), floor(col("o_totalprice") * 100 + 0.5), b = 16)
        .select(col("rep").cast("long").as("rep"), col("n_eff"), col("mean"))
        .orderBy(col("rep"))),

    // per-segment discrete order statistics: median/p10/p90 by order
    // priority on the cents grid — the grouped robustStats
    "q_grouped_quantiles" -> ((s, dir) =>
      Analytics.groupedQuantiles(t(s, dir, "orders"),
          col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("grp"))),

    // robust per-segment dispersion: the same selection rule run twice
    // (median, then median of |x − med| over the deviation grid)
    "q_grouped_mad" -> ((s, dir) =>
      Analytics.groupedMad(t(s, dir, "orders"),
          col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("grp"))),

    // ---- analytics: exact percentiles ----
    "q_percentiles" -> ((s, dir) =>
      Analytics.quantitySpread(t(s, dir, "lineitem"))),

    // ---- analytics: JSON / map scalar functions ----
    "q_json_props" -> ((s, dir) => Analytics.propsJson(t(s, dir, "events"))),
    "q_map_ops" -> ((s, dir) => Analytics.propsMapOps(t(s, dir, "events"))),

    // ---- analytics: windows / sessionization / funnels ----
    "q_session_window" -> ((s, dir) =>
      Analytics.sessionWindowStats(t(s, dir, "events"))),
    "q_session_stats" -> ((s, dir) => Analytics.sessionStats(t(s, dir, "events"))),
    "q_session_durations" -> ((s, dir) => Analytics.sessionDurations(t(s, dir, "events"))),
    "q_funnel" -> ((s, dir) =>
      Analytics.funnel(t(s, dir, "events"), Seq("view", "click", "purchase"))),
    "q_retention" -> ((s, dir) => Analytics.retention(t(s, dir, "events"))),
    "q_tumbling_hour" -> ((s, dir) => Analytics.tumblingCounts(t(s, dir, "events"))),
    // the streaming windowed CMS run on the batch-parity path (the
    // q_hourly_anomaly_stream convention): per-hour depth × width sketch
    // cells over the event-type stream — state bounded at d·w per window
    "q_cms_windowed" -> ((s, dir) =>
      streaming.StreamingCuration.windowedCms(
          t(s, dir, "events")
            .select(col("event_type").as("term"), col("ts").as("ingest_ts")),
          windowLen = "1 hour")
        .select(col("window.start").as("hour"), col("depth"), col("bucket"),
          col("cnt"))
        .orderBy(col("hour"), col("depth"), col("bucket"))),

    // ---- LLM data pipeline: deduplication ----
    "q_dedup_exact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      llm.Dedup.exact(docs.unionByName(docs)) // doubled corpus: every text ×2
        .orderBy(col("keep_id"))
    }),
    // ---- LLM data pipeline: the composed curation recipe ----
    "q_curation" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Curation.curate(docs.unionByName(docs)) // doubled: dedup is real
        .orderBy(col("doc_id"))
    }),
    // gate-order drop accounting over the same recipe (doubled corpus so
    // the dedup stage shows real drops): one scan, conditional counts
    "q_curation_waterfall" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Curation.curationWaterfall(docs.unionByName(docs))
    }),
    // ---- LLM data pipeline: near-dup clustering (pairs -> components) ----
    // Connected components over the minhash near-dup pairs; the oracle
    // recomputes the pair graph as all-pairs exact Jaccard and labels
    // components with a recursive CTE — fully independent algorithm, same
    // fixpoint.
    "q_dedup_clusters" -> ((s, dir) =>
      llm.Dedup.clusters(
        llm.Dedup.minhashNearDups(tWide(s, dir, "documents"), threshold = 0.6))
        .orderBy(col("doc_id"))),

    // leakage-free split: clusters assign ATOMICALLY (component min-id
    // keys the digest draw), so no near-dup pair straddles train/test
    "q_split_leakfree" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Sampling.assignSplitLeakFree(docs,
          llm.Dedup.clusters(
            llm.Dedup.minhashNearDups(docs, threshold = 0.6)),
          trainFrac = 0.8, valFrac = 0.1)
        .orderBy(col("doc_id"))
    }),

    // split-parity check over the leak-free assignment: PSI of each
    // split's length distribution vs the corpus baseline — the
    // exchangeability evidence a leakage-free split still owes
    "q_split_parity" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val split = llm.Sampling.assignSplitLeakFree(docs,
        llm.Dedup.clusters(
          llm.Dedup.minhashNearDups(docs, threshold = 0.6)),
        trainFrac = 0.8, valFrac = 0.1)
      llm.Drift.psi(
          docs.join(split.select(col("doc_id"), col("split")), Seq("doc_id")),
          "split", col("n_chars"), binWidth = 200L)
        .orderBy(col("split"))
    }),

    // near-dup provenance: per-cluster source spread — within-crawl vs
    // cross-corpus duplication (mixture double-counting audit). Labels
    // broadcast; the corpus never shuffles.
    "q_dedup_provenance" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Dedup.clusterProvenance(docs,
          llm.Dedup.clusters(llm.Dedup.minhashNearDups(docs, threshold = 0.6)))
        .orderBy(col("cluster_id"))
    }),

    // integer-grid PageRank over the near-dup similarity graph: the
    // boilerplate/hub signal. Exact micro-unit arithmetic (no floats),
    // 3 fixed iterations = 3 join+partial-agg rounds; edges/degrees
    // checkpointed once. Edge set = the LSH pair frame (recall 1 vs the
    // oracle's exact-Jaccard edges on this corpus, q_dedup_minhash).
    "q_pagerank" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Graph.pagerank(docs,
          llm.Dedup.minhashNearDups(docs, threshold = 0.6))
        .orderBy(col("doc_id"))
    }),
    // bounded-hop BFS from a seed set over the near-dup graph: how far
    // contamination spreads; frontier-only expansion, 4 unrolled rounds
    "q_graph_bfs" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Graph.bfsHops(docs,
          llm.Dedup.minhashNearDups(docs, threshold = 0.6),
          docs.filter(col("doc_id") < 20).select(col("doc_id")),
          maxHops = 4)
        .orderBy(col("doc_id"))
    }),
    // per-node triangles + local clustering coefficient over the embedding
    // similarity graph: degree-ordered wedge orientation, one closure
    // semi-join — separates template families (high LCC) from hubs
    "q_graph_triangles" -> ((s, dir) =>
      llm.Graph.triangles(
          llm.Similarity.cosinePairsBlocked(tWide(s, dir, "embeddings"),
            "label", 0.4))
        .orderBy(col("node_id"))),
    // 2-core of the same graph after 3 unrolled peeling rounds: pendant
    // members drop, the interlinked family cores survive
    "q_graph_kcore" -> ((s, dir) =>
      llm.Graph.kCore(
          llm.Similarity.cosinePairsBlocked(tWide(s, dir, "embeddings"),
            "label", 0.4), k = 2, iters = 3)
        .orderBy(col("node_id"))),

    // label-propagation communities over the near-dup graph (3 synchronous
    // rounds, deterministic min-label tie-break): template families
    // WITHOUT the transitive closure q_dedup_clusters computes — a single
    // accidental bridge edge no longer fuses two families. Same edge set
    // as q_pagerank/q_graph_bfs, so the oracle reuses their
    // exact-Jaccard ≥ 0.6 pair derivation.
    "q_graph_lpa" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Graph.labelPropagation(docs,
          llm.Dedup.minhashNearDups(docs, threshold = 0.6), iters = 3)
        .orderBy(col("doc_id"))
    }),

    // snapshot diff between corpus releases: v1 drops the %10==3 docs and
    // carries a truncated revision of the %10==7 docs; v2 drops %10==5.
    // Digests are computed scan-side — the full-outer join moves (id,
    // digest) rows only, never text. t(), not tWide(): the round-robin
    // repartition would itself shuffle text (the q_media_dedup rationale).
    "q_corpus_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 10 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 7, substring(col("text"), 1, 40))
            .otherwise(col("text")).as("text"))
      val v2 = docs.filter(col("doc_id") % 10 =!= 5)
      llm.Report.snapshotDiff(v1, v2).orderBy(col("doc_id"))
    }),

    // one-row dataset card: the release summary (volume, breadth, exact
    // dup rate, mean length) in a single partial-aggregated scan
    "q_dataset_card" -> ((s, dir) =>
      llm.Report.datasetCard(tWide(s, dir, "documents"))),

    // "keep the best copy": canonical = longest member of each near-dup
    // cluster (tie → min id); singletons canonical by themselves. Oracle
    // reuses the recursive-CTE component labeling + a window argmax.
    "q_dedup_canonical" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Dedup.clusterCanonicals(docs,
          llm.Dedup.minhashNearDups(docs, threshold = 0.6))
        .select(col("doc_id"), col("cluster_id"), col("n_members"),
          col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // ---- LLM data pipeline: sequence packing (corpus -> training shards) ----
    // 4096-token budget over doc_id order; the two-phase distributed prefix
    // sum must agree with the oracle's single global window cumsum.
    // no tWide here: packByBudget's own repartitionByRange is the
    // parallelism-restoring exchange (an extra round-robin first would
    // just add a shuffle)
    "q_pack_sequences" -> ((s, dir) =>
      llm.Packing.packByBudget(t(s, dir, "documents"),
          col("doc_id"), llm.TextAnalysis.tokenCount(col("text")), budget = 4096L)
        .withColumnRenamed("pack_key", "doc_id")
        .orderBy(col("doc_id"))),
    // deterministic epoch-1 shuffle: reproducible global permutation via
    // md5(key:epoch) rank, two-phase prefix (never one global window)
    "q_epoch_shuffle" -> ((s, dir) =>
      llm.Packing.epochShuffle(t(s, dir, "documents"), col("doc_id"),
          epoch = 1)
        .orderBy(col("shuffle_key"))),
    // per-shard fill report over the same layout: docs never split, so
    // fill wanders around the budget — the loader headroom diagnostic
    "q_pack_efficiency" -> ((s, dir) =>
      llm.Packing.packEfficiency(
          llm.Packing.packByBudget(t(s, dir, "documents"),
            col("doc_id"), llm.TextAnalysis.tokenCount(col("text")),
            budget = 4096L),
          budget = 4096L)
        .orderBy(col("shard"))),
    // GPT-style context-window layout: tokens laid end-to-end, cut every
    // 2048 — docs span windows; each doc gets its start (seq_id, seq_off)
    // from the same two-phase global prefix (no global window)
    "q_pack_windows" -> ((s, dir) =>
      llm.Packing.packWindows(t(s, dir, "documents"),
          col("doc_id"), llm.TextAnalysis.tokenCount(col("text")), context = 2048L)
        .withColumnRenamed("pack_key", "doc_id")
        .orderBy(col("doc_id"))),

    // ---- LLM data pipeline: embedding quantization ----
    // codes emitted comma-joined (pandas array-cell constraint, as
    // q_text_quality); vmin/vmax round-trip bit-exact via the VARCHAR cast
    // convention on the oracle side.
    "q_embed_quantize" -> ((s, dir) =>
      llm.Quantize.scalarQuantize(tWide(s, dir, "embeddings"))
        .select(col("vec_id"), col("vmin"), col("vmax"),
          array_join(col("codes"), ",").as("codes"))
        .orderBy(col("vec_id"))),

    // ---- LLM data pipeline: deterministic sampling ----
    // keep/drop is a pure function of md5(doc_id) — reproducible across
    // engines, partitionings, and retries (see graft.llm.Sampling). The
    // oracle recomputes the digest predicate verbatim.
    "q_sample_docs" -> ((s, dir) =>
      llm.Sampling.sampleByKey(t(s, dir, "documents"), col("doc_id"), 0.25)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),
    // digest-bucketed train/val/test: 80/10/10 → thresholds 0.8='cccd',
    // 0.9='e666'; a row's split is a pure function of md5(doc_id)
    "q_split_assign" -> ((s, dir) =>
      llm.Sampling.assignSplit(t(s, dir, "documents"), col("doc_id"),
          trainFrac = 0.8, valFrac = 0.1)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("split"))),
    // deterministic 5-fold CV assignment: fold = digest16 mod 5
    "q_split_folds" -> ((s, dir) =>
      llm.Sampling.assignFold(t(s, dir, "documents"), col("doc_id"), k = 5)
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("fold"))),
    // source balancing: at most 20 digest-ranked docs survive per source
    "q_source_cap" -> ((s, dir) =>
      llm.Sampling.capPerGroup(t(s, dir, "documents"), col("source"),
          col("doc_id"), cap = 20)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),
    // per-stratum rates; strata absent from the map are dropped entirely
    "q_sample_stratified" -> ((s, dir) =>
      llm.Sampling.stratified(t(s, dir, "documents"), col("source"), col("doc_id"),
          Map("src0" -> 0.75, "src1" -> 0.5, "src2" -> 0.125))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),
    // length-weighted k=100 draw (Efraimidis-Spirakis keys off the same
    // md5 digest); the drawn SET is the oracle-checkable fact
    "q_sample_weighted" -> ((s, dir) =>
      llm.Sampling.weightedSample(t(s, dir, "documents"),
          col("doc_id"), col("n_chars"), k = 100)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))),
    // token-budget mixture: per-source token budgets consumed in digest
    // order via the grouped two-phase prefix sum (no per-source global
    // window). src5's budget exceeds its sf0.01 total (full take) and cuts
    // interior at sf0.1 — both boundary regimes exercised; unlisted
    // sources drop entirely.
    "q_mix_budget" -> ((s, dir) =>
      llm.Sampling.sampleToBudget(t(s, dir, "documents"), col("source"),
          col("doc_id"), llm.TextAnalysis.tokenCount(col("text")),
          Map("src0" -> 500L, "src3" -> 120L, "src5" -> 2000L,
            "src9" -> 64L, "src17" -> 700L))
        .select(col("mix_id").as("doc_id"), col("mix_group").as("source"),
          col("cost").as("n_tokens"), col("cum_cost").as("cum_tokens"))
        .orderBy(col("source"), col("doc_id"))),

    // DSIR importance scores: the 256-bucket hashed-unigram+bigram model
    // (target = English docs, raw = full corpus), λ on the 1e-9 ln grid,
    // exact integer nano-sum per doc. The λ table is checkpointed — the
    // bounded learned artifact, built once, consumed broadcast.
    "q_dsir_scores" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val lam = llm.Dsir.bucketLogRatios(docs, docs.filter(col("lang") === "en"))
        .localCheckpoint(eager = false)
      llm.Dsir.score(docs, lam).orderBy(col("doc_id"))
    }),
    // per-source KL to the corpus gram distribution: the mixture
    // diagnostic, exact integer nano-sums over the closed bucket frame
    "q_source_kl" -> ((s, dir) =>
      llm.Dsir.sourceKl(tWide(s, dir, "documents"))
        .orderBy(col("source"))),
    // the streaming PSI monitor's exact code path in batch mode (the
    // q_hourly_anomaly_stream convention): baseline bands trained with
    // the batch op order, per-hour PSI vs those literals
    "q_psi_stream" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val base = streaming.StreamingDrift.bandBaseline(ev, binWidth = 50.0)
      streaming.StreamingDrift.hourlyPsi(ev, base, binWidth = 50.0)
        .orderBy(col("hour"))
    }),
    // PSI drift per source vs the corpus baseline over 200-char length
    // bands — the monitoring metric that flags scraper/format breakage;
    // Laplace-smoothed, nano-grid summands, exact integer sum
    "q_psi_drift" -> ((s, dir) =>
      llm.Drift.psi(tWide(s, dir, "documents"), "source", col("n_chars"),
          binWidth = 200L)
        .orderBy(col("source"))),
    // embedding-space drift: per-source centroid shift vs the corpus
    // centroid — encoder-skew monitoring the scalar PSI bands can't see
    "q_embed_drift" -> ((s, dir) =>
      llm.Drift.embeddingShift(tWide(s, dir, "embeddings"),
          tWide(s, dir, "documents"))
        .orderBy(col("source"))),
    // Monroe log-odds "Fightin' Words": top-5 distinctive terms per
    // source by z-scored log-odds under a uniform Dirichlet prior
    "q_distinctive_terms" -> ((s, dir) =>
      llm.TextAnalysis.distinctiveTerms(tWide(s, dir, "documents"),
          "source", k = 5)
        .orderBy(col("source"), col("rank"))),
    // collocation mining: top-15 word pairs by document-level PMI with a
    // df_pair ≥ 5 support floor
    "q_collocations" -> ((s, dir) =>
      llm.TextAnalysis.collocations(tWide(s, dir, "documents"), k = 15)),
    // multinomial Naive Bayes source classifier trained and applied
    // in-plan; published as the actual × predicted confusion matrix
    "q_nb_confusion" -> ((s, dir) =>
      llm.NaiveBayes.confusion(tWide(s, dir, "documents"))
        .orderBy(col("actual"), col("predicted"))),

    // the resampling step: Gumbel-top-100 under digest-uniform noise —
    // the drawn set + keys are the oracle-checkable facts
    "q_dsir_sample" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val lam = llm.Dsir.bucketLogRatios(docs, docs.filter(col("lang") === "en"))
        .localCheckpoint(eager = false)
      llm.Dsir.resample(llm.Dsir.score(docs, lam), k = 100)
        .orderBy(col("doc_id"))
    }),

    // rendezvous (HRW) shard assignment: argmax of per-shard digest
    // weights — adding a shard moves only rows won BY the new shard
    // (movement property spec-pinned); pure scan-side
    "q_shard_assign" -> ((s, dir) =>
      llm.Sampling.assignShards(t(s, dir, "documents"), col("doc_id"),
          Seq("s0", "s1", "s2", "s3", "s4"))
        .select(col("doc_id"), col("shard"))
        .orderBy(col("doc_id"))),

    // the HRW minimal-disruption property as numbers: adding s5 moves
    // ~1/6 of rows, all TO s5, zero between old shards
    "q_shard_rebalance" -> ((s, dir) =>
      llm.Sampling.shardRebalanceReport(t(s, dir, "documents"),
        col("doc_id"), Seq("s0", "s1", "s2", "s3", "s4"), "s5")),

    // canonical text normalization over planted formatting noise (leading
    // blanks, tab runs, trailing mix): the pre-hashing pass that keeps
    // formatting variants from splitting digests
    "q_text_normalize" -> ((s, dir) => {
      val noisy = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("  "), substring(col("text"), 1, 40), lit("\t\t"),
          substring(col("text"), 41, 1000000), lit(" \t")).as("text"))
      noisy.select(col("doc_id"),
          llm.TextAnalysis.normalizeText(col("text")).as("normalized"))
        .orderBy(col("doc_id"))
    }),

    // temperature-sampled mixture (α = 0.5): per-source budgets derived
    // from the sources' own token totals via composed correctly-rounded
    // sqrt + integer micro arithmetic (bit-portable, see
    // Sampling.temperatureBudgets), then the grouped two-phase budget
    // sampler. The published budget column audits the derivation.
    "q_mix_temperature" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = llm.TextAnalysis.tokenCount(col("text"))
      val budgets = llm.Sampling.temperatureBudgets(docs, col("source"),
        toks, totalBudget = 8000L)
      llm.Sampling.sampleToBudget(docs, col("source"), col("doc_id"), toks,
          budgets, withBudget = true)
        .select(col("mix_id").as("doc_id"), col("mix_group").as("source"),
          col("cost").as("n_tokens"), col("cum_cost").as("cum_tokens"),
          col("budget"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // DoReMi-style probe-driven mixture reweighting: 3 rounds of budgeted
    // sampling with per-source weights updated multiplicatively from the
    // trained probe's kept-sample mean scores (exact integer trajectory —
    // the oracle unrolls all rounds). Publishes the full (round, source)
    // trajectory: budget in, kept count, kept mean, weight out.
    "q_mix_reweight" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val feat = llm.QualityProbe.features(tWide(s, dir, "documents"))
        .localCheckpoint(eager = false)
      val w = llm.QualityProbe.trainWeights(feat, lr = 0.5, iters = 3)
      llm.Sampling.reweightMixture(docs, llm.QualityProbe.score(feat, w),
          totalBudget = 8000L, rounds = 3)
        .orderBy(col("round"), col("source"))
    }),

    // Oracled against ALL-PAIRS exact Jaccard: the output is the exact-
    // Jaccard-verified pair set, so the comparison asserts LSH recall = 1
    // on this corpus (its true-pair similarities sit far above the 16-band
    // S-curve's high-recall zone) AND the verify join's arithmetic.
    // the full recipe: exact survivors then near-dup cluster canonicals
    "q_curation_neardup" -> ((s, dir) =>
      llm.Curation.curateNearDup(tWide(s, dir, "documents"))
        .orderBy(col("doc_id"))),
    // END-TO-END release: curate → near-dedup → decontam (every 50th doc
    // plays the benchmark, the q_decontam convention) → tokenize under a
    // release-trained vocab → 4096-token shards → manifest + card. Each
    // stage is oracle-gated standalone; THIS row gates their composition
    // (the stage-boundary bugs: wrong corpus feeding the vocab, pre-dedup
    // docs in the pack order, contamination over raw rather than curated
    // text).
    "q_release_pipeline" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Curation.releasePipeline(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0))
        .orderBy(col("kind"), col("shard"))
    }),
    // the ALWAYS-ON release composition: three micro-batches fold through
    // StreamingRelease.applyBatch (gate → decontam verdict → exact-
    // survivor displacement → StreamingDedup fold, per-batch cost ∝
    // batch), then the snapshot runs the LITERAL releaseTail over the
    // maintained clean set — shares q_release_pipeline's oracle
    // VERBATIM: the maintained composition ≡ the batch recompute.
    "q_release_stream" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 50 =!= 0)
      val benchmark = docs.filter(col("doc_id") % 50 === 0)
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/srelease_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_srel").toString
      }
      streaming.Redrive(s, state, 2L) { b =>
        streaming.StreamingRelease.applyBatch(
          corpus.filter(col("doc_id") % 3 === b), benchmark, state, b)
      }
      streaming.StreamingRelease.vacuum(s, state)
      streaming.StreamingRelease.snapshot(s, state)
        .orderBy(col("kind"), col("shard"))
    }),
    // … and under ERASURE: the tail batch carries full-row tombstones
    // for already-ingested docs ≡ 6 (mod 10) — an erased SURVIVOR's hash
    // falls back to its next-smallest live copy (the full-pairs exact
    // state; the restored survivor's bands re-derive from the tombstone
    // row's own text), the dedup state re-stitches, and the snapshot ≡
    // the batch releasePipeline over the SURVIVORS (the parametrized
    // oracle mirror).
    "q_release_stream_erasure" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 50 =!= 0)
      val benchmark = docs.filter(col("doc_id") % 50 === 0)
      val dc: org.apache.spark.sql.Column = col("doc_id") % 10 === 6
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/srelease_erasure_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_srele").toString
      }
      streaming.Redrive(s, state, 2L) {
        case b if b < 2 =>
          streaming.StreamingRelease.applyBatch(
            corpus.filter(col("doc_id") % 3 === b)
              .withColumn("_deleted", lit(false)),
            benchmark, state, b, deleteCol = Some("_deleted"))
        case b =>
          streaming.StreamingRelease.applyBatch(
            corpus.filter(col("doc_id") % 3 === 2)
              .withColumn("_deleted", lit(false))
              .unionByName(corpus.filter(col("doc_id") % 3 =!= 2 && dc)
                .withColumn("_deleted", lit(true))),
            benchmark, state, b, deleteCol = Some("_deleted"))
      }
      streaming.StreamingRelease.vacuum(s, state)
      streaming.StreamingRelease.snapshot(s, state)
        .orderBy(col("kind"), col("shard"))
    }),
    "q_dedup_minhash" -> ((s, dir) =>
      llm.Dedup.minhashNearDups(tWide(s, dir, "documents"), threshold = 0.6)
        .orderBy(col("id_a"), col("id_b"))),
    // incremental-ingest dedup: docs >= 250 arrive as the new batch against
    // the < 250 corpus; only texts unseen in the corpus survive
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      llm.Dedup.incrementalNew(
        docs.filter(col("doc_id") >= 250), docs.filter(col("doc_id") < 250))
        .orderBy(col("doc_id"))
    }),
    // bloom fast path: same semantics (and oracle) as q_dedup_incremental —
    // bloom misses bypass the anti-join, hits (incl. false positives) fall
    // through to it, so the result is exact
    "q_dedup_incr_bloom" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") < 250)
      val bloom = llm.Dedup.digestBloom(corpus, expectedItems = 300)
      llm.Dedup.incrementalNewBloom(
        docs.filter(col("doc_id") >= 250), corpus, bloom)
        .orderBy(col("doc_id"))
    }),
    // the bloom's erasure contract: a bloom CANNOT subtract (insertion-
    // only bit array), so after deletions the prebuilt filter goes STALE
    // — and the ingest stays EXACT anyway, because a bloom hit is never
    // an authority, only a routing decision: stale hits (including every
    // erased digest) fall through to the anti-join against the LIVE
    // corpus, and misses are still guaranteed-unseen (deletions only
    // remove corpus rows, so no-false-negatives survives staleness). A
    // re-ingest of an ERASED text is correctly accepted as new. Cost of
    // staleness is fpp drift, not correctness — rebuild on a schedule,
    // not per erasure. Oracle = NOT-IN SQL against the survivors.
    "q_dedup_bloom_stale" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus0 = docs.filter(col("doc_id") < 250)
      val bloom = llm.Dedup.digestBloom(corpus0, expectedItems = 300)
      val survivors = corpus0.filter(col("doc_id") % 10 =!= 6)
      llm.Dedup.incrementalNewBloom(
        docs.filter(col("doc_id") >= 250), survivors, bloom)
        .orderBy(col("doc_id"))
    }),
    // incremental NEAR-dup: batch-vs-corpus + batch-internal LSH candidates,
    // exact-verified; oracle = the partitioned all-pairs Jaccard truth
    "q_dedup_incr_near" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Dedup.incrementalNearDups(
        docs.filter(col("doc_id") >= 250), docs.filter(col("doc_id") < 250),
        threshold = 0.6)
        .orderBy(col("id_new"), col("id_other"))
    }),
    // the steady-state form: corpus bands + shingles PREBUILT (persisted
    // via Artifacts in bench mode — the probe pass starts at a FileScan;
    // PlanSpec pins the shuffle-free corpus probe), batch joins against
    // them. Same truth as q_dedup_incr_near: the two forms must be
    // indistinguishable.
    "q_dedup_incr_prebuilt" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      def corpus = docs.filter(col("doc_id") < 250)
      llm.Dedup.incrementalNearDupsPrebuilt(
        docs.filter(col("doc_id") >= 250),
        sources.Artifacts.table(s, "incr_bands")(llm.Dedup.bandTable(corpus)),
        sources.Artifacts.table(s, "incr_shingles")(
          llm.Dedup.shingleTable(corpus)),
        threshold = 0.6)
        .orderBy(col("id_new"), col("id_other"))
    }),
    // DELETION-aware band/shingle-table maintenance: the purged ids fold
    // out of the persisted LSH artifacts by broadcast anti join (per-doc
    // rows — nothing to decrement), and the batch probe over the
    // maintained tables must equal the truth over corpus ∖ deleted
    "q_dedup_prebuilt_delete" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      def corpus = docs.filter(col("doc_id") < 250)
      val deleted = docs.filter(col("doc_id") < 250 &&
        col("doc_id") % 10 === 7).select(col("doc_id"))
      llm.Dedup.incrementalNearDupsPrebuilt(
        docs.filter(col("doc_id") >= 250),
        llm.Dedup.bandsDelete(
          sources.Artifacts.table(s, "incr_bands")(llm.Dedup.bandTable(corpus)),
          deleted),
        llm.Dedup.shinglesDelete(
          sources.Artifacts.table(s, "incr_shingles")(
            llm.Dedup.shingleTable(corpus)),
          deleted),
        threshold = 0.6)
        .orderBy(col("id_new"), col("id_other"))
    }),
    // incremental label maintenance: corpus labels + the batch's pair list
    // stitched by touched-component re-propagation only — the oracle is
    // the FULL-recompute clusters SQL, so the row proves the two paths
    // indistinguishable (old+incremental pairs = the full pair graph here:
    // recall 1 at this threshold, pinned by q_dedup_minhash's truth)
    "q_dedup_incr_clusters" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") < 250)
      val labels = sources.Artifacts.table(s, "incr_cluster_labels")(
        llm.Dedup.clusters(
          llm.Dedup.minhashNearDups(corpus, threshold = 0.6)))
      val newPairs = llm.Dedup.incrementalNearDups(
        docs.filter(col("doc_id") >= 250), corpus, threshold = 0.6)
        .select(col("id_new").as("id_a"), col("id_other").as("id_b"))
      llm.Dedup.clustersIncremental(labels, newPairs)
        .orderBy(col("doc_id"))
    }),
    // DELETION-aware label maintenance (right-to-erasure): the persisted
    // labels + pair artifacts fold OUT an erased doc set by touched-
    // component re-propagation over RETAINED pairs — deletions can SPLIT
    // components (a removed bridge doc disconnects its neighbors), so
    // subtraction alone cannot maintain labels. Oracle = the full
    // recompute over corpus ∖ deleted: the two must be indistinguishable.
    "q_dedup_incr_delete" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val pairs = sources.Artifacts.table(s, "del_cluster_pairs")(
        llm.Dedup.minhashNearDups(docs, threshold = 0.6)
          .select(col("id_a"), col("id_b")))
      val labels = sources.Artifacts.table(s, "del_cluster_labels")(
        llm.Dedup.clusters(pairs))
      val deleted = docs.filter(col("doc_id") % 10 === 3).select(col("doc_id"))
      llm.Dedup.clustersDelete(labels, pairs, deleted)
        .orderBy(col("doc_id"))
    }),
    // STREAMING near-dup maintenance, batch-parity form: three disjoint
    // micro-batches folded through StreamingDedup.applyBatch (the
    // IDENTICAL code the writer runs) — segmented band/shingle state
    // (bytes ∝ batch), sliver labels/pairs stitched by contracted-graph
    // propagation, compaction at maxSegments=3 re-capping the merged
    // buckets, vacuum reclaiming superseded state. Redrive resumes a
    // died-mid-prefix fold and serves completed state without touching
    // it. The served labels share q_dedup_clusters' full-recompute
    // oracle VERBATIM.
    "q_dedup_stream" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sdedup_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sdedup").toString
      }
      streaming.Redrive(s, state, 2L) { b =>
        streaming.StreamingDedup.applyBatch(
          docs.filter(col("doc_id") % 3 === b), state, b, maxSegments = 3)
      }
      streaming.StreamingDedup.vacuum(s, state)
      streaming.StreamingDedup.readLabels(s, state).orderBy(col("doc_id"))
    }),
    // STREAMING ingest + ERASURE: the tail batch carries the last third's
    // clean docs WITH full-row tombstones for every already-ingested
    // doc_id ≡ 6 (mod 10) — tombstoned components re-stitch over
    // retained pairs (splits handled), band/shingle views fold the ids
    // out by anti join. Labels ≡ a full recompute over the survivors.
    "q_dedup_stream_erasure" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sdedup_erasure_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sdedupe").toString
      }
      val dc: org.apache.spark.sql.Column = col("doc_id") % 10 === 6
      streaming.Redrive(s, state, 2L) {
        case b if b < 2 =>
          streaming.StreamingDedup.applyBatch(
            docs.filter(col("doc_id") % 3 === b)
              .withColumn("_deleted", lit(false)),
            state, b, deleteCol = Some("_deleted"), maxSegments = 3)
        case b =>
          streaming.StreamingDedup.applyBatch(
            docs.filter(col("doc_id") % 3 === 2 && !dc)
              .withColumn("_deleted", lit(false))
              .unionByName(docs.filter(col("doc_id") % 3 =!= 2 && dc)
                .withColumn("_deleted", lit(true))),
            state, b, deleteCol = Some("_deleted"), maxSegments = 3)
      }
      streaming.StreamingDedup.vacuum(s, state)
      streaming.StreamingDedup.readLabels(s, state).orderBy(col("doc_id"))
    }),
    // STREAMING erase → RE-INGEST (update churn): docs ≡ 6 (mod 10) from
    // the first batch are tombstoned in batch 1 and RETURN in batch 2,
    // then batch 3's docs must discover their near-dups of the returned
    // docs THROUGH the view while the tombstone segment is still live
    // (maxSegments=5 — nothing compacts). The version-ordered erasure
    // join (a tombstone kills only strictly earlier rows of its id) is
    // what makes this serve the FULL corpus — labels share
    // q_dedup_clusters' oracle VERBATIM, no survivors filter.
    "q_dedup_stream_reingest" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sdedup_reingest_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sdedupr").toString
      }
      val dc: org.apache.spark.sql.Column =
        col("doc_id") % 3 === 0 && col("doc_id") % 10 === 6
      def batchOf(b: Long): org.apache.spark.sql.DataFrame = b match {
        case 0L => docs.filter(col("doc_id") % 3 === 0)
          .withColumn("_deleted", lit(false))
        case 1L => docs.filter(col("doc_id") % 3 === 1)
          .withColumn("_deleted", lit(false))
          .unionByName(docs.filter(dc).withColumn("_deleted", lit(true)))
        case 2L => docs.filter(dc).withColumn("_deleted", lit(false))
        case _ => docs.filter(col("doc_id") % 3 === 2)
          .withColumn("_deleted", lit(false))
      }
      streaming.Redrive(s, state, 3L) { b =>
        streaming.StreamingDedup.applyBatch(batchOf(b), state, b,
          deleteCol = Some("_deleted"), maxSegments = 5)
      }
      streaming.StreamingDedup.vacuum(s, state)
      streaming.StreamingDedup.readLabels(s, state).orderBy(col("doc_id"))
    }),
    // portable md5 hash family so the oracle can recompute signatures:
    // the all-pairs Hamming truth asserts the combination-block index's
    // pigeonhole completeness (every pair ≤ maxHamming is FOUND) and the
    // bit-voting + verify arithmetic — same publishing discipline as
    // q_dedup_minhash's all-pairs Jaccard truth.
    "q_dedup_simhash" -> ((s, dir) =>
      llm.Dedup.simhashNearDups(tWide(s, dir, "documents"), maxHamming = 3,
          sigFn = llm.Dedup.simhashPortable)
        .orderBy(col("id_a"), col("id_b"))),
    // exact verbatim-span dedup (the complement of near-dup LSH): pairs
    // sharing >= 1 window of 20 consecutive tokens; oracle recomputes the
    // window sets over strings
    "q_dedup_substring" -> ((s, dir) =>
      llm.Dedup.exactSubstringPairs(tWide(s, dir, "documents"),
          windowTokens = 20, minShared = 1)
        .orderBy(col("id_a"), col("id_b"))),
    // the SPANS those pairs share: maximal runs of tokens covered by a
    // cross-doc verbatim 20-token window (ExactSubstr, Lee et al. 2022) —
    // the surgical-removal coordinates, suffix-array-free
    "q_dedup_spans" -> ((s, dir) =>
      llm.Dedup.duplicatedSpans(tWide(s, dir, "documents"),
          windowTokens = 20)
        .orderBy(col("doc_id"), col("span_start"))),
    // and the cut applied: every covered token removed, the rest of the
    // document kept verbatim (modulo whitespace normalization)
    "q_dedup_span_removal" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Dedup.removeSpans(docs,
          llm.Dedup.duplicatedSpans(docs, windowTokens = 20))
        .orderBy(col("doc_id"))
    }),
    // steady-state spans: batch vs the persisted corpus window-df artifact
    // (merged distinct-doc counts; only batch-sized frames shuffle) —
    // shares the full-recompute mirror restricted to batch docs
    "q_dedup_spans_incr" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Dedup.incrementalSpans(
          docs.filter(col("doc_id") >= 250),
          sources.Artifacts.table(s, "span_window_df")(
            llm.Dedup.windowDf(docs.filter(col("doc_id") < 250),
              windowTokens = 20)),
          windowTokens = 20)
        .orderBy(col("doc_id"), col("span_start"))
    }),
    // window-df shard-merge proof + duplication histogram: the merged
    // halves must reproduce the single-build distribution exactly
    // (window hashes are engine-local; the histogram is the portable
    // fingerprint)
    "q_window_df_hist" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Dedup.windowDfHistogram(
          llm.Dedup.windowDfMerge(
            llm.Dedup.windowDf(docs.filter(col("doc_id") < 250),
              windowTokens = 20),
            llm.Dedup.windowDf(docs.filter(col("doc_id") >= 250),
              windowTokens = 20)))
        .orderBy(col("ndocs"))
    }),
    // DELETION-aware window-df maintenance: the purged docs' window
    // counts subtract from the persisted artifact (zeros drop), and the
    // result's histogram must equal a rebuild over corpus ∖ deleted —
    // the erasure path for the span-dedup corpus state
    "q_window_df_delete" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val corpusDf = sources.Artifacts.table(s, "window_df_del")(
        llm.Dedup.windowDf(docs, windowTokens = 20))
      llm.Dedup.windowDfHistogram(
          llm.Dedup.windowDfDelete(corpusDf,
            docs.filter(col("doc_id") % 10 === 5), windowTokens = 20))
        .orderBy(col("ndocs"))
    }),
    // per-source token-duplication share: the go/no-go gauge for span
    // removal, exact integer token sums + one published division
    "q_span_dup_rate" -> ((s, dir) =>
      llm.Dedup.spanDupRate(tWide(s, dir, "documents"), windowTokens = 20)
        .orderBy(col("source"))),
    // per-source gram novelty: share of distinct per-doc 3-grams seen
    // nowhere else — fresh content vs re-served boilerplate
    "q_gram_novelty" -> ((s, dir) =>
      llm.Dedup.gramNovelty(tWide(s, dir, "documents"), n = 3)
        .orderBy(col("source"))),
    // surgical decontamination: the exact corpus spans leaked verbatim
    // from the benchmark split (broadcast benchmark window set, corpus
    // never shuffles by window) ...
    "q_decontam_spans" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Decontam.contaminationSpans(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0), windowTokens = 20)
        .orderBy(col("doc_id"), col("span_start"))
    }),
    // leak forensics by benchmark item: how widely and heavily each eval
    // doc leaked into the corpus — salvage-or-regenerate evidence
    "q_leak_report" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Decontam.leakReport(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0), windowTokens = 20)
        .orderBy(col("bench_id"))
    }),
    // ... and the cut applied: leaked spans removed, every doc kept
    "q_decontam_surgical" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Decontam.decontaminateSpans(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0), windowTokens = 20)
        .orderBy(col("doc_id"))
    }),
    // winnowing fingerprints (MOSS): rightmost-min of each 4-window of
    // word-3-gram md5 hashes, scan-side HOFs only — zero exchanges
    "q_fingerprint_winnow" -> ((s, dir) =>
      llm.Fingerprint.winnow(tWide(s, dir, "documents"), k = 3, w = 4)
        .orderBy(col("doc_id"), col("pos"))),
    // the MOSS match step over the winnowed corpus: fp-equi self-join,
    // boilerplate fingerprints df-pruned before the quadratic
    "q_fingerprint_pairs" -> ((s, dir) =>
      llm.Fingerprint.sharedFingerprints(
          llm.Fingerprint.winnow(tWide(s, dir, "documents"), k = 3, w = 4),
          minShared = 2, maxDf = 100)
        .orderBy(col("id_a"), col("id_b"))),
    // fuzzy record linkage over 40-char record keys, DEFAULT form:
    // (lang, source) domain blocking conjoined with the length band —
    // candidates are per-block, so the worst case is the largest block,
    // never the corpus. This is the 100 TB-safe shape a user should copy.
    "q_fuzzy_match" -> ((s, dir) =>
      llm.Dedup.fuzzyMatchPairs(tWide(s, dir, "documents"),
          prefixChars = 40, maxDist = 5, blockCols = Seq("lang", "source"))
        .orderBy(col("id_a"), col("id_b"))),
    // the unblocked all-pairs truth: length-band only — quadratic in the
    // corpus, kept as a small-SF correctness row proving the blocking
    // never drops an IN-BLOCK pair (the blocked row's recall contract is
    // "within-block exact"; this row is the global candidate set)
    "q_fuzzy_allpairs" -> ((s, dir) =>
      llm.Dedup.fuzzyMatchPairs(tWide(s, dir, "documents"),
          prefixChars = 40, maxDist = 5)
        .orderBy(col("id_a"), col("id_b"))),
    // maxDf=2 exercises the high-DF pruning path through the oracle (the
    // sf corpus' max block-level DF is 3, so ≥3 would be a no-op here).
    // containment (asymmetric Jaccard): catches a doc CONTAINED in a
    // larger one, which symmetric Jaccard dilutes; either direction ≥ 0.6
    "q_dedup_containment" -> ((s, dir) =>
      llm.Dedup.containmentPairs(tWide(s, dir, "documents"), n = 3,
          threshold = 0.6)
        .orderBy(col("id_a"), col("id_b"))),
    // paragraph-granularity boilerplate removal: corpus-wide duplicate
    // 8-word windows stripped from every host; untouched bulk keeps its
    // original bytes through a broadcast anti-join
    "q_dedup_paragraph" -> ((s, dir) =>
      llm.Dedup.dedupParagraphs(tWide(s, dir, "documents"), paraWords = 8)
        .orderBy(col("doc_id"))),
    // MinHash accuracy contract: signature-agreement estimate within 0.15
    // of exact Jaccard on every ≥0.3 pair (measured max deviation < 0.1 at
    // every SF, MhProbe; deterministic hashes ⇒ the margin is safe)
    "q_minhash_est" -> ((s, dir) =>
      llm.Dedup.minhashEstimateContract(
          tWide(s, dir, "documents").withColumn("_all", lit(1)),
          blockCol = "_all", threshold = 0.3, bound = 0.15)
        .orderBy(col("id_a"), col("id_b"))),
    "q_ngram_jaccard" -> ((s, dir) =>
      llm.Dedup.ngramJaccardPairs(tWide(s, dir, "documents"), "source", n = 3,
          threshold = 0.3, maxDf = 2)
        .orderBy(col("id_a"), col("id_b"))),
    // prefix-filtering exact set-similarity join (AllPairs/PPJoin):
    // UNBLOCKED corpus-wide Jaccard ≥ 0.3 with zero recall loss — the
    // rarest-tokens-first prefix equi-join generates a complete candidate
    // set, exact verification reproduces the naive all-pairs truth the
    // oracle computes
    "q_jaccard_prefix" -> ((s, dir) =>
      llm.Dedup.prefixJaccardPairs(tWide(s, dir, "documents"),
          threshold = 0.6, n = 3)
        .orderBy(col("id_a"), col("id_b"))),
    "q_embed_near_dups" -> ((s, dir) =>
      llm.Similarity.cosinePairsBlocked(tWide(s, dir, "embeddings"), "label", 0.4)
        .orderBy(col("id_a"), col("id_b"))),
    // per-near-dup-cluster mean-pooled embedding, micro-unit exact sums ⇒
    // bit-portable centroids (see Similarity.clusterCentroids)
    "q_embed_centroids" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      llm.Similarity.clusterCentroids(emb,
          llm.Similarity.cosinePairsBlocked(emb, "label", 0.4))
        .orderBy(col("cluster_id"), col("dim"))
    }),
    // incremental centroid maintenance: corpus (< 250) centroids persist
    // as mergeable micro sums; the batch (>= 250) stitches labels via
    // clustersIncremental, old sums remap (components only merge), only
    // FRESH members' vectors are read. Shares q_embed_centroids' oracle
    // VERBATIM: old + incremental pairs = the full pair graph, so the
    // maintained state must equal the full recompute.
    // 90/10 modulo split: the oracle (full recompute over the union) is
    // split-independent, so the row uses a REALISTIC steady-state shape —
    // small batch against a large persisted corpus AT EVERY SF — instead
    // of the fixed vec_id<250 cut, which at sf0.1 (5000 vectors) made the
    // "batch" 19× the corpus and the row the bench's slowest
    "q_embed_centroids_incr" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val corpus = emb.filter(col("vec_id") % 10 =!= 9)
      val batch = emb.filter(col("vec_id") % 10 === 9)
      val oldLabels = sources.Artifacts.table(s, "centroids_incr_labels")(
        llm.Dedup.clusters(
          llm.Similarity.cosinePairsBlocked(corpus, "label", 0.4)))
      val oldSums = sources.Artifacts.table(s, "centroids_incr_sums")(
        llm.Similarity.clusterCentroidSums(corpus, oldLabels))
      val newPairs = llm.Similarity.cosinePairsIncremental(
        corpus, batch, "label", 0.4)
      llm.Similarity.clusterCentroidsIncremental(emb, oldLabels, oldSums, newPairs)
        .orderBy(col("cluster_id"), col("dim"))
    }),
    // DELETION-aware centroid maintenance: erase a vector set from the
    // persisted (labels, sums) state — touched components recompute their
    // member sums (a split divides members between new labels, which a
    // subtraction can't apportion), untouched sums carry through one anti
    // join with vectors unread. Oracle = full recompute over
    // embeddings ∖ deleted.
    "q_centroids_delete" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val pairs = sources.Artifacts.table(s, "del_centroid_pairs")(
        llm.Similarity.cosinePairsBlocked(emb, "label", 0.4)
          .select(col("id_a"), col("id_b")))
      val labels = sources.Artifacts.table(s, "del_centroid_labels")(
        llm.Dedup.clusters(pairs))
      val sums = sources.Artifacts.table(s, "del_centroid_sums")(
        llm.Similarity.clusterCentroidSums(emb, labels))
      val deleted = emb.filter(col("vec_id") % 10 === 4).select(col("vec_id"))
      llm.Similarity.clusterCentroidsDelete(emb, labels, sums, pairs, deleted)
        .orderBy(col("cluster_id"), col("dim"))
    }),
    // STREAMING centroid maintenance, batch-parity form: three disjoint
    // embedding micro-batches folded through StreamingCentroids
    // .applyBatch (segmented corpus view, sliver labels/sums/pairs under
    // the pointer discipline); served centroids = one division over the
    // maintained sums. Shares q_embed_centroids' full-recompute oracle
    // VERBATIM.
    "q_centroids_stream" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/scent_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_scent").toString
      }
      streaming.Redrive(s, state, 2L) { b =>
        streaming.StreamingCentroids.applyBatch(
          emb.filter(col("vec_id") % 3 === b), state, b, maxSegments = 3)
      }
      streaming.StreamingCentroids.vacuum(s, state)
      streaming.StreamingCentroids.readCentroids(s, state)
        .orderBy(col("cluster_id"), col("dim"))
    }),
    // STREAMING ingest + ERASURE: tail batch carries the last third's
    // clean vectors WITH full-row tombstones for every already-ingested
    // vec_id ≡ 4 (mod 10) — touched components re-stitch and their sums
    // recompute from the surviving member sliver (splits cannot be
    // apportioned by subtraction). Centroids ≡ full recompute over the
    // survivors (q_centroids_delete's oracle).
    "q_centroids_stream_erasure" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/scent_erasure_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_scente").toString
      }
      val dc: org.apache.spark.sql.Column = col("vec_id") % 10 === 4
      streaming.Redrive(s, state, 2L) {
        case b if b < 2 =>
          streaming.StreamingCentroids.applyBatch(
            emb.filter(col("vec_id") % 3 === b)
              .withColumn("_deleted", lit(false)),
            state, b, deleteCol = Some("_deleted"), maxSegments = 3)
        case b =>
          streaming.StreamingCentroids.applyBatch(
            emb.filter(col("vec_id") % 3 === 2 && !dc)
              .withColumn("_deleted", lit(false))
              .unionByName(emb.filter(col("vec_id") % 3 =!= 2 && dc)
                .withColumn("_deleted", lit(true))),
            state, b, deleteCol = Some("_deleted"), maxSegments = 3)
      }
      streaming.StreamingCentroids.vacuum(s, state)
      streaming.StreamingCentroids.readCentroids(s, state)
        .orderBy(col("cluster_id"), col("dim"))
    }),

    // STREAMING erase → RE-INGEST for the centroid state: vectors ≡ 4
    // (mod 10) from batch 0 are tombstoned in batch 1 and RETURN in
    // batch 2; batch 3 pairs against them through the view while the
    // tombstone is still live (maxSegments=5 — nothing compacts). The
    // version-ordered erasure join serves the FULL corpus — shares
    // q_embed_centroids' oracle VERBATIM.
    "q_centroids_stream_reingest" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/scent_reingest_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_scentr").toString
      }
      val dc: org.apache.spark.sql.Column =
        col("vec_id") % 3 === 0 && col("vec_id") % 10 === 4
      def batchOf(b: Long): org.apache.spark.sql.DataFrame = b match {
        case 0L => emb.filter(col("vec_id") % 3 === 0)
          .withColumn("_deleted", lit(false))
        case 1L => emb.filter(col("vec_id") % 3 === 1)
          .withColumn("_deleted", lit(false))
          .unionByName(emb.filter(dc).withColumn("_deleted", lit(true)))
        case 2L => emb.filter(dc).withColumn("_deleted", lit(false))
        case _ => emb.filter(col("vec_id") % 3 === 2)
          .withColumn("_deleted", lit(false))
      }
      streaming.Redrive(s, state, 3L) { b =>
        streaming.StreamingCentroids.applyBatch(batchOf(b), state, b,
          deleteCol = Some("_deleted"), maxSegments = 5)
      }
      streaming.StreamingCentroids.vacuum(s, state)
      streaming.StreamingCentroids.readCentroids(s, state)
        .orderBy(col("cluster_id"), col("dim"))
    }),

    // global mean-centering: per-dim micro-unit exact mean (only dim
    // partial rows shuffle), broadcast back, scan-side subtraction
    "q_embed_center" -> ((s, dir) =>
      llm.Similarity.centerEmbeddings(tWide(s, dir, "embeddings"))
        .orderBy(col("vec_id"), col("dim"))),
    // embedding outliers: micro-quantized distance to the corpus mean
    // (inlined as a literal — scan-side fold, no corpus join), z over a
    // 1-row broadcast stats frame (the hourlyAnomalies op order)
    "q_embed_outliers" -> ((s, dir) =>
      llm.Similarity.embeddingOutliers(tWide(s, dir, "embeddings"))
        .orderBy(col("vec_id"))),

    // power-iteration top principal direction: one job per iteration
    // (scan-side literal-v dot, (dim)-keyed micro sums), driver state =
    // one dim-vector — the 4th bounded-driver-state trainer
    "q_pca_direction" -> ((s, dir) =>
      llm.Pca.train(tWide(s, dir, "embeddings"), iters = 3)
        .orderBy(col("dim"))),
    // top-k by deflation: corpus replaced scan-side by its residual after
    // each converged direction, checkpointed between components
    "q_pca_topk" -> ((s, dir) =>
      llm.Pca.trainK(tWide(s, dir, "embeddings"), k = 2, iters = 3)
        .orderBy(col("component"), col("dim"))),
    // PCA whitening: coordinates on the top-2 directions scaled by
    // 1/sqrt(eigenvalue estimate) — unit-variance decorrelated features,
    // scan-side with directions and scales inlined
    "q_pca_whiten" -> ((s, dir) =>
      llm.Pca.whitenTransform(tWide(s, dir, "embeddings"), k = 2, iters = 3)
        .orderBy(col("vec_id"), col("component"))),
    // "all-but-the-top" applied: x − (x·v)·v scan-side with the trained
    // direction inlined as a literal
    "q_pca_remove" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      llm.Pca.removeDirection(emb, llm.Pca.topDirection(emb, iters = 3))
        .orderBy(col("vec_id"), col("dim"))
    }),

    // nearest-centroid routing: every vector classified into its best
    // cluster (broadcast codebook, map-side argmax — no corpus window).
    // The codebook is a PERSISTED artifact (the q_knn_ivf_indexed
    // pattern): at 100 TB assignment is a scan-side probe against a
    // stored codebook, never a per-query clustering fixpoint — bench
    // passes 2+ measure exactly that probe, while verify still proves
    // the assignment over a freshly derived codebook.
    "q_embed_assign" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val centroids = sources.Artifacts.table(s, "assign_centroids")(
        llm.Similarity.centroidVectors(
          llm.Similarity.clusterCentroids(emb,
            llm.Similarity.cosinePairsBlocked(emb, "label", 0.4))))
      llm.Similarity.assignToCentroids(emb, centroids)
        .orderBy(col("vec_id"))
    }),

    // SemDeDup, DEFAULT form: the codebook is a k-means quantizer whose
    // k SCALES WITH THE CORPUS (k = max(8, ⌈n/targetCellSize⌉)) — the
    // 100 TB-safe shape, since the within-cell ε-join is quadratic in
    // cell size and cell count is its only lever. Nearest-centroid cells
    // block the ε-similarity join (the cell plays LSH's block role); per
    // duplicate group keep the member LEAST similar to its centroid (the
    // paper's diversity rule). At catalog SFs n ≤ 2000 ⇒ k = 8 = the
    // oracle's unrolled-Lloyd kmK, so the data-driven k stays pinned —
    // guarded below so a larger SF fails loudly AT THE CAUSE instead of
    // as a confusing hash mismatch. n comes from a persisted 1-row stats
    // sidecar (steady state never re-counts the corpus per dedup pass).
    "q_semantic_dedup" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val n = sources.Artifacts.table(s, "semdedup_n")(
        emb.agg(count(lit(1)).as("n"))).head().getLong(0)
      require(llm.Similarity.autoCellCount(n, 1024L) == 8,
        s"q_semantic_dedup: autoCellCount($n, 1024) != 8 — the DuckDB " +
          "oracle unrolls Lloyd's at kmK=8; re-pin the oracle for this SF")
      llm.Similarity.semanticDedupAuto(emb, 0.5, knownN = Some(n))
        .orderBy(col("vec_id"))
    }),

    // the steady-state form: k-means codebook + per-vector assignment are
    // PREBUILT artifacts (persisted in production; here built once and
    // checkpointed, the q_dedup_incr_prebuilt pattern) — the dedup pass
    // itself runs no Lloyd iterations and no codebook argmax. Shares
    // q_semantic_dedup's oracle verbatim: the two forms must be
    // indistinguishable.
    "q_semantic_dedup_prebuilt" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val centroids = sources.Artifacts.table(s, "semdedup_centroids")(
        llm.Kmeans.codebook(s, llm.Kmeans.trainModel(emb, k = 8, iters = 3)))
      val assign = sources.Artifacts.table(s, "semdedup_assign")(
        llm.Similarity.assignToCentroids(emb, centroids)
          .select(col("vec_id"), col("cluster_id").as("cell"),
            col("score").as("centroid_sim")))
      llm.Similarity.semanticDedupFromAssign(emb, assign, 0.5)
        .orderBy(col("vec_id"))
    }),

    // distributed Lloyd k-means: one job per iteration (scan-side argmin
    // assignment, (cell, dim) micro-unit sums), k × dim driver codebook —
    // the free-k quantizer SemDeDup's cell-count lever needs at 100 TB
    "q_kmeans" -> ((s, dir) =>
      llm.Kmeans.train(tWide(s, dir, "embeddings"), k = 8, iters = 3)
        .orderBy(col("cell"), col("dim"))),
    // clustering-quality gauge over the same codebook: per-cell simplified
    // silhouette (squared-L2), micro-quantized before the sum — scan-side
    // distances, one (cell)-keyed shuffle
    "q_cluster_quality" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      llm.Kmeans.silhouette(emb, llm.Kmeans.trainModel(emb, k = 8, iters = 3))
        .orderBy(col("cell"))
    }),

    // SemDeDup over NEAR-DUP-GRAPH centroids (vs q_semantic_dedup's
    // k-means codebook): the small-corpus special case — cluster count is
    // data-driven and capped, so cells grow with the corpus; kept as the
    // explicit-codebook variant, identical dedup tail. The centroid frame
    // (one clustering fixpoint) is checkpointed: tiny (clusters × dim)
    // and consumed by the broadcast codebook — without the checkpoint the
    // whole derivation chain re-runs per consumer.
    "q_semantic_dedup_graph" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val centroids = llm.Similarity.centroidVectors(
        llm.Similarity.clusterCentroids(emb,
          llm.Similarity.cosinePairsBlocked(emb, "label", 0.4)))
        .localCheckpoint(eager = false)
      llm.Similarity.semanticDedup(emb, centroids, 0.5)
        .orderBy(col("vec_id"))
    }),

    // ---- LLM data pipeline: similarity search ----
    "q_knn_brute" -> ((s, dir) =>
      llm.Similarity.bruteForceKnn(tWide(s, dir, "embeddings"),
        col("vec_id") < 10, k = 5)),
    // filtered retrieval: metadata gate semi-joins the corpus BEFORE
    // scoring (filter-then-score); queries unfiltered, scoring exact
    "q_knn_filtered" -> ((s, dir) =>
      llm.Similarity.filteredKnn(tWide(s, dir, "embeddings"),
        t(s, dir, "documents").filter(col("n_chars") >= 400).select(col("doc_id")),
        col("vec_id") < 10, k = 5)),
    // contrastive hard negatives: top-5 nearest with a DIFFERENT label —
    // the label-mismatch theta rides the same broadcast nested loop as
    // q_knn_brute (corpus never shuffles)
    "q_knn_hard_negatives" -> ((s, dir) =>
      llm.Similarity.hardNegatives(tWide(s, dir, "embeddings"),
        col("vec_id") < 5, k = 5)),
    // the packaged training stream: nearest same-label positive + top-3
    // hard negatives per anchor — one row per (anchor, negative)
    "q_contrastive_triplets" -> ((s, dir) =>
      llm.Similarity.contrastiveTriplets(tWide(s, dir, "embeddings"),
        col("vec_id") < 5, kNeg = 3)),
    // and the dataset health gauge: per-anchor positive-vs-max-negative
    // margin, micro-floored; one exact-count share published
    "q_triplet_report" -> ((s, dir) =>
      llm.Similarity.tripletReport(
        llm.Similarity.contrastiveTriplets(tWide(s, dir, "embeddings"),
          col("vec_id") < 5, kNeg = 3))),
    // LSH kNN publishes its panel RECALL CONTRACT (the neighbor list is
    // hash-family-specific; per-query recall is bimodal on this
    // near-random corpus — see Similarity.lshKnnRecallPanel). Measured
    // recall@5 at m=4/probes=4: 0.52 (sf0.001) / 0.38 (sf0.01) /
    // 0.54 (sf0.1) — bound 0.25 leaves margin at every SF; deterministic
    // (seeded hyperplanes, fixed corpus), so the margin cannot drift.
    "q_knn_lsh" -> ((s, dir) =>
      llm.Similarity.lshKnnRecallPanel(tWide(s, dir, "embeddings"),
        col("vec_id") < 10, k = 5, m = 4, probes = 4, recallBound = 0.25)),
    // JL random projection, long-form: scan-side ±1 md5-parity matrix,
    // one sequential-fold dot per output coordinate
    "q_embed_rp" -> ((s, dir) =>
      tWide(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(llm.Similarity.randomProjection(col("embedding"), 64, 16))
            .as(Seq("dim", "y")))
        .orderBy(col("vec_id"), col("dim"))),
    // the JL sketch as a two-stage ANN prefilter: does the exact top-5
    // survive a 50-deep projected shortlist? Deterministic (md5 matrix, no
    // RNG): measured panel recall 0.3-0.4 at sf0.1, ≥0.6 at sf0.01 on this
    // near-isotropic synthetic corpus (RpProbe) — bound 0.3
    "q_knn_rp" -> ((s, dir) =>
      llm.Similarity.rpKnnRecallPanel(tWide(s, dir, "embeddings"),
        col("vec_id") < 10, k = 5, kOut = 32, candidates = 50,
        recallBound = 0.3)),
    // full-probe IVF is exact ⇒ shares the brute-force oracle; the plan is
    // the scale path (cell equi-join), the answer provably unchanged.
    "q_knn_ivf" -> ((s, dir) =>
      llm.Similarity.ivfKnn(tWide(s, dir, "embeddings"),
        col("vec_id") < 10, k = 5, nCells = 4, nprobe = 4)),
    // team-draft interleave of the dense (brute cosine) and lexical
    // (TF-IDF more-like-this) rankers: per-round md5 coin picks the
    // first-drafting team — the online-comparison serving list
    "q_team_draft" -> ((s, dir) =>
      llm.Eval.teamDraft(
        llm.Similarity.bruteForceKnn(tWide(s, dir, "embeddings"),
            col("vec_id") < 10, k = 5)
          .select(col("qid"), col("rank"), col("neighbor_id")),
        llm.Search.moreLikeThis(tWide(s, dir, "documents"),
            col("doc_id") < 10, k = 5)
          .select(col("qid"), col("rank"), col("neighbor_id")),
        rounds = 2)),
    // lexical more-like-this: doc-to-doc TF-IDF cosine top-5 over railed
    // postings — micro-floored per-term products, exact integer sums,
    // one pinned division per published similarity
    "q_more_like_this" -> ((s, dir) =>
      llm.Search.moreLikeThis(tWide(s, dir, "documents"),
        col("doc_id") < 10, k = 5)),
    // MMR diversity re-rank: greedy 0.5·rel − 0.5·max-sim-to-picked over
    // the brute top-20 shortlist (λ = 1/2 exactly — portable comparisons
    // with no quantization grid); ids published, scores internal
    "q_mmr_rerank" -> ((s, dir) =>
      llm.Similarity.mmrRerank(tWide(s, dir, "embeddings"),
        col("vec_id") < 10, k = 5, m = 20)),
    // the steady-state serving form: codebook + assignments PREBUILT
    // (artifact-persisted in bench) — zero training or corpus assignment
    // at query time; full probe ⇒ shares q_knn_ivf's exact oracle
    "q_knn_ivf_indexed" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val centers = sources.Artifacts.table(s, "ivf_centers")(
        llm.Similarity.ivfCenters(emb, nCells = 4))
      val index = sources.Artifacts.table(s, "ivf_index",
        partitionBy = Seq("cell"))(
        llm.Similarity.ivfAssignments(emb, centers))
      llm.Similarity.ivfKnnFromIndex(index, centers,
        col("vec_id") < 10, k = 5, nprobe = 4)
    }),
    // STREAMING IVF maintenance: the q_knn_ivf_indexed artifacts kept
    // always-on — codebook persisted once (a BUILD artifact), three
    // micro-batches assign scan-side and append segments, compaction at
    // maxSegments=3 lands the cell-partitioned serving base, vacuum
    // reclaims. Full probe ⇒ exact: shares q_knn_ivf's oracle VERBATIM.
    "q_knn_ivf_stream" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val centers = sources.Artifacts.table(s, "ivf_centers")(
        llm.Similarity.ivfCenters(emb, nCells = 4))
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sivf_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sivf").toString
      }
      streaming.Redrive(s, state, 2L) { b =>
        streaming.StreamingIvf.applyBatch(
          emb.filter(col("vec_id") % 3 === b), state, b, centers,
          maxSegments = 3)
      }
      streaming.StreamingIvf.vacuum(s, state)
      streaming.StreamingIvf.knn(s, state, col("vec_id") < 10, k = 5,
        nprobe = 4)
    }),
    // STREAMING IVF ingest + ERASURE: the tail batch carries the last
    // third's clean vectors WITH tombstones for every already-ingested
    // vec_id ≡ 4 (mod 10); nothing compacts (maxSegments=5), so the
    // probe runs over the version-ordered merge-on-read view with the
    // tombstones live. Full probe ⇒ exact over the survivors.
    "q_knn_ivf_stream_erasure" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val centers = sources.Artifacts.table(s, "ivf_centers")(
        llm.Similarity.ivfCenters(emb, nCells = 4))
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sivf_erasure_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sivfe").toString
      }
      val dc: org.apache.spark.sql.Column = col("vec_id") % 10 === 4
      streaming.Redrive(s, state, 2L) {
        case b if b < 2 =>
          streaming.StreamingIvf.applyBatch(
            emb.filter(col("vec_id") % 3 === b)
              .withColumn("_deleted", lit(false)),
            state, b, centers, deleteCol = Some("_deleted"), maxSegments = 5)
        case b =>
          streaming.StreamingIvf.applyBatch(
            emb.filter(col("vec_id") % 3 === 2 && !dc)
              .withColumn("_deleted", lit(false))
              .unionByName(emb.filter(col("vec_id") % 3 =!= 2 && dc)
                .withColumn("_deleted", lit(true))),
            state, b, centers, deleteCol = Some("_deleted"), maxSegments = 5)
      }
      streaming.StreamingIvf.vacuum(s, state)
      streaming.StreamingIvf.knn(s, state, col("vec_id") < 10, k = 5,
        nprobe = 4)
    }),
    // PQ kNN publishes its RECALL CONTRACT (the approximate list is
    // codebook-specific); oracle predicts TRUE per query. m=32 × 256
    // codes = 8x compression at measured per-query recall ≥ 0.8 on this
    // (near-unclusterable) synthetic corpus — bound 0.6 leaves margin.
    "q_knn_pq" -> ((s, dir) =>
      llm.Similarity.pqKnnRecall(tWide(s, dir, "embeddings"),
        col("vec_id") < 10, k = 5, m = 32, kCodes = 256, recallBound = 0.6)),
    // the int8 serving path end-to-end: scalar-quantized reconstructions
    // rank the corpus, per-query recall contract vs exact (255-level codes
    // preserve cosine ranking — measured recall 1.0 at every SF; bound 0.8)
    "q_knn_int8" -> ((s, dir) =>
      llm.Similarity.int8KnnRecall(tWide(s, dir, "embeddings"),
        col("vec_id") < 10, k = 5, recallBound = 0.8)),
    // the composed billion-scale layout: IVF cells prune candidates, PQ
    // codes stand in for vectors; full probe ⇒ same contract as q_knn_pq
    "q_knn_ivfpq" -> ((s, dir) =>
      llm.Similarity.ivfPqKnnRecall(tWide(s, dir, "embeddings"),
        col("vec_id") < 10, k = 5, nCells = 4, nprobe = 4,
        m = 32, kCodes = 256, recallBound = 0.6)),
    // IR eval closing the retrieval stack: NDCG@10 + MRR@10 of the exact
    // cosine ranking against same-label relevance judgments
    "q_retrieval_metrics" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val ranking = llm.Similarity.bruteForceKnn(emb, col("vec_id") < 10, k = 10)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"))
      val qrels = q.join(
          emb.select(col("vec_id").as("neighbor_id"), col("label")),
          col("qlabel") === col("label") && col("qid") =!= col("neighbor_id"))
        .select(col("qid"), col("neighbor_id"))
      llm.Eval.retrievalMetrics(ranking, qrels, k = 10)
    }),
    // 1-bit binary quantization (sign bits, 32× compression) + a 150-deep
    // Hamming shortlist + exact rerank: panel recall contract vs float32
    // top-5. Deterministic (no RNG): measured panel recall 0.94 at sf0.01,
    // 0.72 at sf0.1 — bound 0.6 leaves margin.
    "q_knn_binary" -> ((s, dir) =>
      llm.Similarity.binaryKnnRecallPanel(tWide(s, dir, "embeddings"),
        col("vec_id") < 10, k = 5, candidates = 150, recallBound = 0.6)),
    // NSW-style GRAPH ANN (the serving structure modern vector stores
    // default to — the r13 verdict's "graph-ANN or justify" gap, built):
    // bounded neighbor graph from capped LSH-bucket candidates + one
    // NN-descent round + reversal (out-degree ≤ 16), beam-walked from
    // digest-ranked entries. Panel recall contract: measured 1.0 at ALL
    // THREE SFs with these params (ProbeGraphAnn; the walk re-finds
    // every exact top-5 on this isotropic corpus) — bound 0.7 leaves
    // margin. Build is bucket-bounded (never all-pairs); the walk's
    // per-round frontier is |Q|·ef bounded driver state.
    "q_knn_graph" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      // materialize the built graph once (lazy checkpoint): the panel's
      // beam walk takes `iters` actions over it, and without this every
      // round re-executed the 2-hop/top-m tail of the build DAG
      // (measured: the walk rounds dominated the row — guide §1/§2.4)
      llm.GraphAnn.knnRecallPanel(emb,
        llm.GraphAnn.buildGraph(emb, m = 16, lshBits = 4, probes = 2)
          .localCheckpoint(eager = false),
        col("vec_id") < 10, k = 5, ef = 96, iters = 5, entries = 24,
        recallBound = 0.7)
    }),
    // … the steady-state form: the graph persists hive-partitioned by
    // source bucket (vectors ride IN the edge rows — the DiskANN layout,
    // so serving never touches the corpus), each beam round probes only
    // its frontier's buckets via static partition pruning + a pushed
    // src-IN filter (GraphAnnSpec pins the byte bound). Same contract,
    // same oracle VERBATIM.
    "q_knn_graph_prebuilt" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val graph = sources.Artifacts.table(s, "gann_graph",
        partitionBy = Seq("b"))(
        llm.GraphAnn.buildGraph(emb, m = 16, lshBits = 4, probes = 2))
      llm.GraphAnn.knnRecallPanel(emb, graph,
        col("vec_id") < 10, k = 5, ef = 96, iters = 5, entries = 24,
        recallBound = 0.7)
    }),
    // INCREMENTAL graph maintenance — NSW bulk insertion (insertion IS a
    // search): the batch (ids ≡ 4 mod 5) beam-walks the persisted corpus
    // graph for its top-m neighbors, gains forward edges + back-edges,
    // and only the touched sources re-cap their degree (broadcast
    // semi/anti gating — the corpus graph never re-bucketed, never
    // re-joined). Contract: the panel walk over the UPDATED graph vs
    // brute force over the UNION — true neighbors that live in the batch
    // are findable only through the maintenance, so the TRUE oracle pins
    // it (measured recall 1.0 at all SFs, bound 0.7).
    "q_knn_graph_incr" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val base = sources.Artifacts.table(s, "gann_incr_base",
        partitionBy = Seq("b"))(
        llm.GraphAnn.buildGraph(emb.filter(col("vec_id") % 5 =!= 4),
          m = 16, lshBits = 4, probes = 2))
      // lazy checkpoint: the panel walks `updated` once per round — the
      // insert's re-cap/union tail must not re-execute per action
      val updated = llm.GraphAnn.insert(base,
        emb.filter(col("vec_id") % 5 === 4), m = 16)
        .localCheckpoint(eager = false)
      llm.GraphAnn.knnRecallPanel(emb, updated, col("vec_id") < 10, k = 5,
        ef = 96, iters = 5, entries = 24, recallBound = 0.7)
    }),
    // DELETE/ERASURE graph maintenance — DiskANN-style consolidation:
    // doomed ids (≡ 3 mod 7) leave physically (every edge row whose src
    // OR dst is doomed drops — erasure IS the operation), and each live
    // in-neighbor re-wires through BRIDGE candidates s → out(doomed)
    // rescored exactly off vectors already carried on the doomed nodes'
    // own out-edge rows, then re-caps to degree ≤ m. Contract: panel walk
    // over the repaired graph vs brute force over the SURVIVORS (the
    // repair is what keeps the survivors reachable — measured recall 1.0
    // at all SFs, bound 0.7). Shares q_knn_graph_prebuilt's artifact:
    // one build, two maintenance probes.
    "q_knn_graph_delete" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val base = sources.Artifacts.table(s, "gann_graph",
        partitionBy = Seq("b"))(
        llm.GraphAnn.buildGraph(emb, m = 16, lshBits = 4, probes = 2))
      val doomed = emb.filter(col("vec_id") % 7 === 3)
        .select(col("vec_id").as("id"))
      // lazy checkpoint: same rationale as q_knn_graph_incr — the panel
      // must not re-run the bridge-repair tail once per walk round
      val repaired = llm.GraphAnn.remove(base, doomed,
        llm.GraphAnn.vecTable(emb), m = 16)
        .localCheckpoint(eager = false)
      llm.GraphAnn.knnRecallPanel(emb.filter(col("vec_id") % 7 =!= 3),
        repaired, col("vec_id") < 10, k = 5, ef = 96, iters = 5,
        entries = 24, recallBound = 0.7)
    }),
    // ALWAYS-ON graph maintenance (StreamingGraphAnn): batch 0 bootstraps
    // the build, later batches fold through insertDelta — supersede-by-src
    // segments (a version's edge rows + a same-version tombstone of the
    // changed srcs = last-writer-wins under the segmented rowView), vec
    // sidecar so serving walks and repairs never touch the corpus,
    // compaction at maxSegments=3 re-partitions the base by bucket (the
    // prebuilt serving layout). Contract: the panel over the MAINTAINED
    // state vs brute force over the live vec view.
    "q_knn_graph_stream" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sgann_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sgann").toString
      }
      streaming.Redrive(s, state, 2L) { b =>
        streaming.StreamingGraphAnn.applyBatch(
          emb.filter(col("vec_id") % 3 === b), state, b,
          m = 16, lshBits = 4, probes = 2, maxSegments = 3)
      }
      streaming.StreamingGraphAnn.knnRecallPanel(s, state,
        col("vec_id") < 10, k = 5, ef = 96, iters = 5, entries = 24,
        recallBound = 0.7)
    }),
    // … and under ERASURE: the tail batch carries tombstones for
    // already-ingested ids ≡ 6 (mod 10) — their vectors leave the edge
    // rows AND the vec sidecar (compaction scrubs, vacuum reclaims), the
    // in-neighbors bridge-repair, and the panel runs over the live view
    // (erased ids are in neither the walk nor the truth).
    "q_knn_graph_stream_erasure" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val dc: org.apache.spark.sql.Column = col("vec_id") % 10 === 6
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sgann_state_erasure"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sganne").toString
      }
      streaming.Redrive(s, state, 2L) {
        case b if b < 2 =>
          streaming.StreamingGraphAnn.applyBatch(
            emb.filter(col("vec_id") % 3 === b)
              .withColumn("_deleted", lit(false)), state, b,
            m = 16, lshBits = 4, probes = 2,
            deleteCol = Some("_deleted"), maxSegments = 3)
        case b =>
          streaming.StreamingGraphAnn.applyBatch(
            emb.filter(col("vec_id") % 3 === 2)
              .withColumn("_deleted", lit(false))
              .unionByName(emb.filter(col("vec_id") % 3 =!= 2 && dc)
                .withColumn("_deleted", lit(true))), state, b,
            m = 16, lshBits = 4, probes = 2,
            deleteCol = Some("_deleted"), maxSegments = 3)
      }
      streaming.StreamingGraphAnn.vacuum(s, state)
      streaming.StreamingGraphAnn.knnRecallPanel(s, state,
        col("vec_id") < 10, k = 5, ef = 96, iters = 5, entries = 24,
        recallBound = 0.7)
    }),
    // HNSW LAYERED hierarchy — the asymptotic entry-navigation fix: node
    // levels digest-drawn with P(level ≥ ℓ) = 8^-ℓ, each upper layer a
    // full (geometrically tiny) graph; search enters at the top layer and
    // descends, handing each layer's surviving beam down as the next
    // layer's entries, so the layer-0 walk starts IN the query's
    // neighborhood and iters stays small as the corpus grows (3 here vs
    // the flat row's 5). Artifact hive-partitioned by (layer, b): a
    // descent round prunes to its layer and its frontier's buckets.
    "q_knn_graph_layered" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val layers = sources.Artifacts.table(s, "gann_layers",
        partitionBy = Seq("layer", "b"))(
        llm.GraphAnn.buildLayers(emb, levels = 2, branching = 8, m = 16,
          lshBits = 4, probes = 2))
      llm.GraphAnn.layeredRecallPanel(emb, layers, col("vec_id") < 10,
        k = 5, levels = 2, ef = 96, iters = 3, efUpper = 16,
        itersUpper = 2, entries = 8, recallBound = 0.7)
    }),
    // … and the ladder's INCREMENTAL form: batch levels come from the
    // SAME digest the build used (layer membership is a property of the
    // id, never of arrival order), each selected layer gains its batch
    // slice via insertDelta over that layer alone — upper layers see
    // |batch|/8^ℓ rows, so maintenance keeps the build's geometric cost
    // shape. Contract: the layered descent over the UPDATED ladder vs
    // brute force over the union.
    "q_knn_graph_layered_incr" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val base = sources.Artifacts.table(s, "gann_layers_incr_base",
        partitionBy = Seq("layer", "b"))(
        llm.GraphAnn.buildLayers(emb.filter(col("vec_id") % 5 =!= 4),
          levels = 2, branching = 8, m = 16, lshBits = 4, probes = 2))
      // base iters = 3 (vs the flat row's 5): insertion descends the
      // ladder for its entry beam — one greedy round per upper layer
      // (the HNSW ef=1 descent analog) — so the base walk starts near
      // home and total beam rounds stay at 5
      val updated = llm.GraphAnn.insertLayers(base,
        emb.filter(col("vec_id") % 5 === 4), levels = 2, branching = 8,
        m = 16, iters = 3, itersUpper = 1)
        .localCheckpoint(eager = false) // ladder maintained once, walked often
      llm.GraphAnn.layeredRecallPanel(emb, updated, col("vec_id") < 10,
        k = 5, levels = 2, ef = 96, iters = 3, efUpper = 16,
        itersUpper = 2, entries = 8, recallBound = 0.7)
    }),
    // FILTERED graph search — the production retrieval shape (metadata
    // predicate + ANN): the walk navigates the FULL graph (restricting
    // navigation to matching nodes fragments it), then the predicate
    // gates the ranked side SCAN-side (pushed filter + broadcast of the
    // ≤|Q|·ef beam — the corpus never shuffles). ef out-provisions
    // k/selectivity (96 ≫ 5/0.4); truth = Similarity.filteredKnn (exact
    // filter-then-score). Shares the prebuilt row's graph artifact.
    "q_knn_graph_filtered" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      val graph = sources.Artifacts.table(s, "gann_graph",
        partitionBy = Seq("b"))(
        llm.GraphAnn.buildGraph(emb, m = 16, lshBits = 4, probes = 2))
      llm.GraphAnn.filteredKnnRecallPanel(emb, graph, col("vec_id") < 10,
        col("label") < 4, k = 5, ef = 96, iters = 5, entries = 24,
        recallBound = 0.7)
    }),
    // Matryoshka prefix truncation (first 16 of 64 dims) as the stage-1
    // shortlist: measured panel recall 0.8 / 0.48 (sf0.01 / sf0.1) on
    // this untrained isotropic corpus — bound 0.35
    "q_knn_matryoshka" -> ((s, dir) =>
      llm.Similarity.matryoshkaKnnRecallPanel(tWide(s, dir, "embeddings"),
        col("vec_id") < 10, k = 5, mdim = 16, candidates = 150,
        recallBound = 0.35)),

    // ---- LLM data pipeline: benchmark decontamination ----
    // every 50th doc plays the benchmark; the near-dup plants in the
    // corpus give real contamination hits. Grams are hashed in Spark,
    // strings in the oracle — identical distinct counts (no collisions
    // in this corpus), same discipline as the Jaccard truths.
    "q_decontam" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Decontam.contamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), n = 5, threshold = 0.3)
        .orderBy(col("doc_id"))
    }),

    // embedding-space decontamination: every 50th-shifted vector plays the
    // benchmark embedding; the corpus keeps those ids (the leak), so the
    // planted rows score max_sim = 1. Broadcast panel, scan-side codegen
    // cosine max — the corpus never shuffles (the q_knn_brute asymmetry).
    "q_semantic_decontam" -> ((s, dir) => {
      val emb = tWide(s, dir, "embeddings")
      llm.Decontam.semanticContamination(emb,
          emb.filter(col("vec_id") % 50 === 7), threshold = 0.4)
        .orderBy(col("vec_id"))
    }),

    // decontaminated eval split — the "build a held-out set" pipeline in
    // one row: contamination gate (benchmark grams broadcast) → clean set
    // → key-pure digest split → per-split accounting. Every stage reuses
    // an audited operator; the composition is the product.
    "q_eval_split" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val clean = llm.Decontam.contamination(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0), n = 5, threshold = 0.3)
        .filter(!col("contaminated")).select(col("doc_id"))
      llm.Sampling.assignSplit(clean, col("doc_id"),
          trainFrac = 0.8, valFrac = 0.1)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("split"))
    }),

    // ---- LLM data pipeline: token-window chunking ----
    // 64-token chunks, 8-token overlap; the oracle re-derives every chunk
    // with list slicing — indices, short tails, and ≤-overlap docs pinned.
    "q_chunk_tokens" -> ((s, dir) =>
      llm.TextAnalysis.chunkByTokens(t(s, dir, "documents"),
          chunk = 64, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // ---- LLM data pipeline: text analysis ----
    // corpus-shape diagnostics: length histogram + per-source mixture table
    "q_length_histogram" -> ((s, dir) =>
      llm.TextAnalysis.lengthHistogram(t(s, dir, "documents"), binWidth = 100)),
    "q_source_profile" -> ((s, dir) =>
      llm.TextAnalysis.sourceProfile(tWide(s, dir, "documents"))),
    "q_text_stats" -> ((s, dir) => {
      import llm.TextAnalysis._
      val txt = col("text")
      tWide(s, dir, "documents").select(
        col("doc_id"),
        length(txt).as("n_chars_computed"),
        tokenCount(txt).as("n_tokens"),
        bpeishTokenCount(txt).as("n_bpeish_tokens"),
        punctCount(txt).as("n_punct"),
        langId(txt).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),
    // lang_pred is projected BEFORE the groupBy: a complex expression as a
    // grouping key disables whole-stage codegen for the aggregate and
    // re-evaluates the regex/array pipeline per comparison.
    "q_lang_breakdown" -> ((s, dir) =>
      tWide(s, dir, "documents")
        .select(llm.TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang_pred"))),
    // language-ID confusion matrix against the labeled lang column — the
    // classifier-evaluation report (per-cell counts + row recall); one
    // partial-aggregated scan, |langs|² rows out
    "q_lang_confusion" -> ((s, dir) => {
      val d = tWide(s, dir, "documents")
        .select(col("lang"), llm.TextAnalysis.langId(col("text")).as("lang_pred"))
      val cells = d.groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
      val totals = d.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      cells.join(broadcast(totals), Seq("lang"))
        .select(col("lang"), col("lang_pred"), col("n"),
          (col("n").cast("double") / col("n_lang").cast("double")).as("frac"))
        .orderBy(col("lang"), col("lang_pred"))
    }),
    // per-language tokenizer fertility (chars per whitespace token) —
    // one partial-agg scan, exact-long ratio
    "q_tokenizer_fertility" -> ((s, dir) =>
      llm.TextAnalysis.tokenizerFertility(tWide(s, dir, "documents"))
        .orderBy(col("lang"))),
    // lexicon topic tagging: per-topic hit counts + first-wins argmax —
    // scan-side HOFs, zero shuffles
    "q_topic_tags" -> ((s, dir) =>
      llm.TextAnalysis.topicTags(tWide(s, dir, "documents"))
        .orderBy(col("doc_id"))),
    // fingerprint emitted as a comma-joined scalar string: the driver's
    // compare sorts columns with pandas, which cannot hash array cells.
    // ---- LLM data pipeline: bigram LM quality score (CCNet-style) ----
    // V passed as the corpus-vocab snapshot (one count-distinct action,
    // like q_tfidf's nDocs); fold order pinned by sorted grams. Published
    // at fixed micro precision: ln() is 1-2 ulp engine-specific (Java
    // intrinsic vs libm), so the raw double hash-mismatches on ~2% of
    // docs; the 1e-6 grid is ~9 orders above that noise (measured min
    // boundary distance 3e-3 grid units on this corpus).
    "q_lm_score" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      // V rides the LM's own unigram count table (vocab-bounded, eagerly
      // checkpointed; row count = V by identical token definition) — the
      // separate distinct-count corpus pass is gone (r13 "What's wrong"
      // #1), values bit-identical.
      llm.TextAnalysis.bigramLmScoreSelfV(docs)
        .select(col("doc_id"), col("n_bigrams"),
          floor(col("lm_score") * 1e6).cast("long").as("lm_score_micro"))
        .orderBy(col("doc_id"))
    }),

    // ---- LLM data pipeline: vocabulary + TF-IDF ----
    "q_vocab_topk" -> ((s, dir) =>
      llm.TextAnalysis.vocabTopK(tWide(s, dir, "documents"), k = 50)),
    // nDocs passed as the corpus-size snapshot; vocab = top-20 terms.
    // ln() parity: both engines' log is correctly rounded on these args
    // (verified at sf0.01) — the idf expression tree is pinned either side.
    // SpaceSaving heavy hitters in the exact regime (capacity ≫ |vocab| ⇒
    // no evictions anywhere ⇒ counts exact, err 0) — the approximate regime
    // is pinned in SpaceSavingSpec, not oracle-able by construction
    "q_heavy_hitters" -> ((s, dir) =>
      llm.TextAnalysis.heavyHitters(tWide(s, dir, "documents"),
        capacity = 4096, k = 20)),
    // per-source SpaceSaving summaries + in-group rank: the per-stratum
    // vocabulary profile; capacity ≥ per-group vocab ⇒ exact (oracle regime)
    "q_heavy_hitters_by_source" -> ((s, dir) =>
      llm.TextAnalysis.heavyHittersByGroup(tWide(s, dir, "documents"),
          "source", capacity = 4096, k = 5)
        .orderBy(col("source"), col("rank"))),
    // Count-Min sketch artifact: depth × width counter table, md5-bucketed
    // (engine-portable), map-side-combined to ≤ d·w rows per task before
    // the one sketch-keyed exchange. Built here as a two-shard MERGE
    // (doc_id < 250 | ≥ 250): the published table doubles as the
    // mergeability proof — it must equal the single-pass build, which is
    // what the oracle computes.
    "q_cms_sketch" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Sketch.cmsMerge(
          llm.Sketch.cmsBuild(docs.filter(col("doc_id") < 250)),
          llm.Sketch.cmsBuild(docs.filter(col("doc_id") >= 250)))
        .orderBy(col("depth"), col("bucket"))
    }),
    // DELETION-aware CMS maintenance: the purged docs' sketch subtracts
    // cell-wise (CMS is linear — the one sketch where erasure is exact),
    // zeroed cells drop. Oracle = a full rebuild over the survivors.
    "q_cms_delete" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Sketch.cmsDelete(
          llm.Sketch.cmsBuild(docs),
          llm.Sketch.cmsBuild(docs.filter(col("doc_id") % 10 === 6)))
        .orderBy(col("depth"), col("bucket"))
    }),
    // CMS inner-product join-size estimate: the pre-shuffle cardinality
    // gauge (one scan per side, sketch-only estimate) published with its
    // one-sided contract next to the exact size
    "q_join_size_est" -> ((s, dir) =>
      llm.Sketch.cmsJoinSize(
        t(s, dir, "events"), col("user_id"),
        t(s, dir, "orders"), col("o_custkey"))),
    // CMS point queries vs exact counts: the one-sided error contract
    // (est ≥ exact, overestimate uniformly true) published per panel term,
    // absent terms included (exact 0)
    "q_cms_counts" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.Sketch.cmsEstimate(llm.Sketch.cmsBuild(docs), docs,
          llm.Sketch.CmsPanel)
        .orderBy(col("term"))
    }),
    // KMV/theta bottom-k distinct sketch: per-source distinct 3-gram
    // estimate from k=256 retained hashes, published as its error
    // contract vs exact (deterministic md5 hashes: measured worst-source
    // error 12.5% at sf0.01, 9.6% at sf0.1 — bound 20%)
    "q_sketch_kmv" -> ((s, dir) => {
      val terms = tWide(s, dir, "documents")
        .select(col("source"), explode(llm.Dedup.shingles(col("text"), 3)).as("h"))
      val est = llm.Sketch.kmvEstimate(
        llm.Sketch.kmvBuild(terms, "source", "h", k = 256), k = 256)
      val exact = terms.groupBy(col("source").as("grp"))
        .agg(count_distinct(col("h")).as("exact_terms"))
      est.join(exact, Seq("grp"))
        .select(col("grp").as("source"), col("exact_terms"),
          (abs(col("est_distinct") / col("exact_terms").cast("double") - 1.0)
            <= 0.20).as("kmv_within_20pct"))
        .orderBy(col("source"))
    }),
    // incremental KMV maintenance: the persisted corpus sketch merged
    // with a new-batch sketch must be indistinguishable from the full
    // rebuild — shares q_sketch_kmv's oracle VERBATIM
    "q_sketch_kmv_incr" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      def terms(d: org.apache.spark.sql.DataFrame) =
        d.select(col("source"), explode(llm.Dedup.shingles(col("text"), 3)).as("h"))
      val merged = llm.Sketch.kmvMerge(
        llm.Sketch.kmvBuild(terms(docs.filter(col("doc_id") < 250)), "source", "h", k = 256),
        llm.Sketch.kmvBuild(terms(docs.filter(col("doc_id") >= 250)), "source", "h", k = 256),
        k = 256)
      val est = llm.Sketch.kmvEstimate(merged, k = 256)
      val exact = terms(docs).groupBy(col("source").as("grp"))
        .agg(count_distinct(col("h")).as("exact_terms"))
      est.join(exact, Seq("grp"))
        .select(col("grp").as("source"), col("exact_terms"),
          (abs(col("est_distinct") / col("exact_terms").cast("double") - 1.0)
            <= 0.20).as("kmv_within_20pct"))
        .orderBy(col("source"))
    }),
    // DELETION-aware KMV maintenance: a distinct sketch is not linear, so
    // erasure removes only values FULLY GONE from the survivors (doomed
    // terms anti-joined against surviving docs' terms — reference-count
    // semantics); groups whose retained bottom-k lost a hash are flagged
    // and rebuilt from the survivors ONLY (group-pruned, not a corpus
    // pass). The maintained sketch estimates against the survivor truth
    // under the same 20% contract — oracle = exact over survivors.
    // Every consumer here (build, gone-set, group-pruned rebuild, exact
    // truth) is a function of the DISTINCT (source, shingle) pairs plus a
    // per-pair survivor reference count, so the corpus is shingle-exploded
    // ONCE and reduced through ONE (source, h) aggregation carrying
    // count(survivor occurrences); "fully gone" is then a filter (n_surv
    // = 0), not an anti-join — the 100 TB shape, vs re-exploding the
    // text per consumer and shuffling a pair-level anti-join.
    "q_kmv_delete" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val dc = col("doc_id") % 10 === 6
      val pairs = docs
        .select(col("source"), dc.as("_doomed"),
          explode(llm.Dedup.shingles(col("text"), 3)).as("h"))
        .groupBy(col("source"), col("h"))
        .agg(count(when(!col("_doomed"), lit(1))).as("_ns"))
        .localCheckpoint(eager = false)  // reused 4× below
      val survTerms = pairs.filter(col("_ns") > 0)
      val gone = pairs.filter(col("_ns") === 0)  // reference count hit 0
      val trimmed = llm.Sketch.kmvDelete(
        llm.Sketch.kmvBuild(pairs, "source", "h", k = 256),
        gone, "source", "h", k = 256)
        .localCheckpoint(eager = false) // flag split consumes it twice
      val rebuilt = llm.Sketch.kmvBuild(
        survTerms.join(
          trimmed.filter(col("needs_rebuild"))
            .select(col("grp").as("source")).distinct(),
          Seq("source"), "left_semi"),
        "source", "h", k = 256)
      val maintained = trimmed.filter(!col("needs_rebuild"))
        .drop("needs_rebuild").unionByName(rebuilt)
      val est = llm.Sketch.kmvEstimate(maintained, k = 256)
      val exact = survTerms.groupBy(col("source").as("grp"))
        .agg(count(lit(1)).as("exact_terms"))
      est.join(exact, Seq("grp"))
        .select(col("grp").as("source"), col("exact_terms"),
          (abs(col("est_distinct") / col("exact_terms").cast("double") - 1.0)
            <= 0.20).as("kmv_within_20pct"))
        .orderBy(col("source"))
    }),
    // theta-sketch set algebra — the capability HLL lacks: union AND
    // intersection distinct estimates between two sources from their
    // bottom-k sketches alone (θ∧-filtered sample counting). Measured:
    // union err ≤ 3.3%, intersection err ≤ 9.5% at both SFs — bounds
    // 10% / 20%.
    "q_sketch_kmv_setops" -> ((s, dir) => {
      val terms = tWide(s, dir, "documents")
        .select(col("source"), explode(llm.Dedup.shingles(col("text"), 3)).as("h"))
      val ops = llm.Sketch.kmvSetOps(
        llm.Sketch.kmvBuild(terms, "source", "h", k = 256), k = 256,
        grpA = "src0", grpB = "src1")
      val exact = terms.filter(col("source").isin("src0", "src1"))
        .groupBy(col("h")).agg(count_distinct(col("source")).as("ns"))
        .agg(count(lit(1)).as("exact_union"),
          count(when(col("ns") === 2, lit(1))).as("exact_intersect"))
      ops.crossJoin(exact) // 1×1
        .select(col("exact_union"), col("exact_intersect"),
          (abs(col("est_union") / col("exact_union").cast("double") - 1.0)
            <= 0.10).as("union_within_10pct"),
          (abs(col("est_intersect") / col("exact_intersect").cast("double") - 1.0)
            <= 0.20).as("intersect_within_20pct"))
    }),
    // ---- bottom-k quantile sketch: the mergeable-quantiles member of the
    // sketch family (CMS=frequencies, SpaceSaving=top, KMV=distincts,
    // HLL=mergeable distincts, bloom=membership). The estimate is an
    // ACTUAL value of the column picked by integer md5-hash ranks, so the
    // DuckDB oracle mirrors the WHOLE chain value-exactly; the statistical
    // claim (sample-quantile rank error ≤ bound at k=256; measured worst
    // 0.049 at sf0.01, 0.046 at sf0.1 — bound 0.12 ≈ the 3σ+discretization
    // envelope at q=0.5) is published as the boolean contract, the
    // kmv_within_20pct discipline. ----
    "q_quantile_sketch" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val est = llm.Sketch.quantileEstimate(
        llm.Sketch.quantileBuild(ev, "event_type", "event_id", "value", k = 256),
        QuantilePanel)
      quantileContract(est,
        ev.select(col("event_type").as("grp"), col("value").as("v_pop")),
        bound = 0.12, okCol = "rank_within_12pct")
    }),
    // incremental maintenance: disjoint shard sketches merged must be
    // BIT-IDENTICAL to the full rebuild (the k smallest hashes of a union
    // are among the k smallest of each side) — shares q_quantile_sketch's
    // oracle VERBATIM, so the row pins the merge algebra at every SF.
    "q_quantile_merge" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      def build(d: org.apache.spark.sql.DataFrame) =
        llm.Sketch.quantileBuild(d, "event_type", "event_id", "value", k = 256)
      val merged = llm.Sketch.quantileMerge(
        build(ev.filter(col("event_id") % 2 === 0)),
        build(ev.filter(col("event_id") % 2 =!= 0)), k = 256)
      quantileContract(llm.Sketch.quantileEstimate(merged, QuantilePanel),
        ev.select(col("event_type").as("grp"), col("value").as("v_pop")),
        bound = 0.12, okCol = "rank_within_12pct")
    }),
    // DELETION-maintained quantile sketch: unique row keys make erasure
    // exact-by-construction (removing doomed hashes leaves EXACTLY the
    // bottom-k′ of the survivors — still uniform, just smaller), so the
    // only rail is SIZE: groups whose sample shrinks below minKeep=200 are
    // flagged and rebuilt from their survivors ONLY (group-pruned, never a
    // corpus pass). At sf0.001 groups (~200 rows, all retained) DO trip the
    // rail after the 10% erasure; at sf0.01+ the trimmed ~230-row samples
    // clear it — both branches of the protocol are exercised across the
    // verified SFs, and the oracle mirrors the WHOLE protocol including
    // the flag split. Estimates hold the (wider) 15% rank contract against
    // the survivor truth.
    "q_quantile_delete" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val doomed = ev.filter(col("event_id") % 10 === 3)
      val surv = ev.filter(col("event_id") % 10 =!= 3)
      val trimmed = llm.Sketch.quantileDelete(
        llm.Sketch.quantileBuild(ev, "event_type", "event_id", "value", k = 256),
        doomed, "event_type", "event_id", k = 256, minKeep = 200)
        .localCheckpoint(eager = false) // flag split consumes it twice
      val rebuilt = llm.Sketch.quantileBuild(
        surv.join(trimmed.filter(col("needs_rebuild"))
            .select(col("grp").as("event_type")).distinct(),
          Seq("event_type"), "left_semi"),
        "event_type", "event_id", "value", k = 256)
      val maintained = trimmed.filter(!col("needs_rebuild"))
        .select(col("grp"), col("h"), col("v"))
        .unionByName(rebuilt.select(col("grp"), col("h"), col("v")))
      quantileContract(llm.Sketch.quantileEstimate(maintained, QuantilePanel),
        surv.select(col("event_type").as("grp"), col("value").as("v_pop")),
        bound = 0.15, okCol = "rank_within_15pct")
    }),
    // percentile BUCKETING off the sketch boundaries — the serving-side
    // application: tag every event with its per-type quartile bucket via
    // a broadcast of the ≤ groups×3 boundary frame into the one scan,
    // where exact ntile pays a global per-group sort/range exchange of
    // the corpus. Boundaries are actual column values, so the whole
    // chain mirrors value-exactly; each bucket holds 25% ± the sample
    // error (predicted bound 0.12; measured worst 0.057 at sf0.01,
    // 0.050 at sf0.1).
    "q_quantile_bucket" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val tagged = llm.Sketch.quantileBucket(ev,
        llm.Sketch.quantileBuild(ev, "event_type", "event_id", "value", k = 256),
        "event_type", "value", Seq(0.25, 0.5, 0.75))
      val counts = tagged.groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n_rows"))
      val totals = counts.groupBy(col("event_type"))
        .agg(sum(col("n_rows")).as("n_tot"))
      counts.join(totals, Seq("event_type"))
        .select(col("event_type"), col("bucket"), col("n_rows"),
          (abs(col("n_rows").cast("double") / col("n_tot").cast("double")
            - 0.25) <= 0.12).as("bucket_within_12pct"))
        .orderBy(col("event_type"), col("bucket"))
    }),
    // WINDOWED quantiles — the canonical "daily latency percentiles" —
    // by composing the sketch with a composite (day|event_type) group:
    // state bounded at k per window×type (the q_cms_windowed discipline
    // for order statistics). Both regimes exercised across the verified
    // SFs: at sf0.01 windows (~67 rows) sit under k=128 and estimates
    // are exact order statistics; at sf0.1 (~667) the sketch genuinely
    // samples. Bound 0.20 = the small-window discretization floor
    // (1/m at sf0.001) over the measured worsts (0.027 sf0.01, 0.115
    // sf0.1).
    "q_quantile_windowed" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("grp", concat(
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"),
          lit("|"), col("event_type")))
      val est = llm.Sketch.quantileEstimate(
        llm.Sketch.quantileBuild(ev, "grp", "event_id", "value", k = 128),
        Seq(("p50", 0.5), ("p90", 0.9)))
      quantileContract(est,
        ev.select(col("grp"), col("value").as("v_pop")),
        bound = 0.20, okCol = "rank_within_20pct")
    }),
    // inverse-quantile (rank-of) estimates off the SAME sketch: the
    // empirical-CDF fraction P(value ≤ x) per group for a literal x panel
    // — the quantile↔rank dual ("what fraction of events are under x"
    // answered by the maintained sample, never a corpus re-scan). The
    // estimate is exact integer comparison counts over the mirrored
    // sample folded by one IEEE division, so DuckDB reproduces it
    // bit-exactly; the additive-error claim vs the population CDF is the
    // predicted boolean (measured worst 0.051 at sf0.01, 0.063 at sf0.1 —
    // bound 0.12, the build row's envelope).
    "q_quantile_rank" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val est = llm.Sketch.quantileRankOf(
        llm.Sketch.quantileBuild(ev, "event_type", "event_id", "value", k = 256),
        Seq(("x10", 10.0), ("x50", 50.0), ("x150", 150.0)))
      val truth = ev.groupBy(col("event_type").as("grp"))
        .agg(count(lit(1)).as("n_pop"),
          count(when(col("value") <= 10.0, lit(1))).as("le10"),
          count(when(col("value") <= 50.0, lit(1))).as("le50"),
          count(when(col("value") <= 150.0, lit(1))).as("le150"))
      est.join(truth, Seq("grp"))
        .select(col("grp"), col("xlabel"), col("x"), col("est_frac_le"),
          (abs(col("est_frac_le") -
            when(col("xlabel") === "x10", col("le10"))
              .when(col("xlabel") === "x50", col("le50"))
              .otherwise(col("le150")).cast("double")
              / col("n_pop").cast("double")) <= 0.12)
            .as("cdf_within_12pct"))
        .orderBy(col("grp"), col("xlabel"))
    }),
    // ALWAYS-ON streamed quantile sketch under the theta discipline: three
    // micro-batches fold into the persisted thresholded state (batch 2
    // carries full-row tombstones for the already-ingested %10==3 rows,
    // erasure applying BEFORE its adds) — the arbitrary ingest/erasure
    // interleaving the plain bottom-k algebra cannot express, exact by
    // the per-group threshold invariant (rows = population with h < tau).
    // The oracle replays the ENTIRE fold value-exactly; estimates hold
    // the 15% rank contract against the survivor truth.
    "q_quantile_stream" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/squant_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_squant").toString
      }
      def apply(b: org.apache.spark.sql.DataFrame, id: Long,
          del: Option[String] = None): Unit =
        streaming.StreamingQuantile.applyBatch(b, state, id,
          "event_type", "event_id", "value", k = 256, deleteCol = del)
      streaming.Redrive(s, state, 2L) {
        case b if b < 2 => apply(ev.filter(col("event_id") % 3 === b), b)
        case b => apply(
          ev.filter(col("event_id") % 3 === 2 && col("event_id") % 10 =!= 3)
            .withColumn("_del", lit(false))
            .unionByName(
              ev.filter(col("event_id") % 10 === 3 && col("event_id") % 3 =!= 2)
                .withColumn("_del", lit(true))),
          b, del = Some("_del"))
      }
      val st = streaming.StreamingQuantile.readState(s, state)
      quantileContract(llm.Sketch.quantileEstimate(st.rows, QuantilePanel),
        ev.filter(col("event_id") % 10 =!= 3)
          .select(col("event_type").as("grp"), col("value").as("v_pop")),
        bound = 0.15, okCol = "rank_within_15pct")
    }),
    // tokenize to vocab ids: top-20 vocab ranked (tf desc, term), OOV → 0,
    // token order preserved through the posexplode/join/sort_array chain.
    // `ids` is published comma-joined (the q_text_quality fingerprint
    // pattern): the driver's comparator sorts columns with pandas, which
    // cannot hash array cells — the library API (tokenizeToIds) still
    // returns the real array<int>.
    "q_tokenize_ids" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      llm.TextAnalysis.tokenizeToIds(docs,
          llm.TextAnalysis.vocabWithIds(llm.TextAnalysis.vocabTopK(docs, k = 20)))
        .select(col("doc_id"), col("n_tokens"),
          array_join(transform(col("ids"), _.cast("string")), ",").as("ids"))
        .orderBy(col("doc_id"))
    }),
    // BPE merge training via the BATCHED trainer (top-B disjoint merges
    // per driver round-trip, provably ≡ the sequential trainer — BpeSpec);
    // the oracle stays the sequential 6-round unrolled CTE, so the row
    // pins the equivalence at every SF. U+001F carrier makes the merge
    // rewrite exactly greedy-leftmost on both engines (see llm.Bpe).
    "q_bpe_merges" -> ((s, dir) =>
      llm.Bpe.mergesDf(s,
          llm.Bpe.trainMergesBatch(
            llm.Bpe.wordFreq(tWide(s, dir, "documents")), 6, batchSize = 3)._1)
        .orderBy(col("rank"))),
    // the inference half: the same 6 merges applied to the word table as a
    // scan-side replace chain; tokens published space-joined (contract #1)
    "q_bpe_encode" -> ((s, dir) => {
      val words = llm.Bpe.wordFreq(tWide(s, dir, "documents"))
      val merges = llm.Bpe.trainMergesBatch(words, 6, batchSize = 3)._1
      llm.Bpe.encode(words, merges)
        .select(col("word"), size(col("tokens")).as("n_tokens"),
          array_join(col("tokens"), " ").as("toks"))
        .orderBy(col("word"))
    }),
    // Unigram-LM (SentencePiece-style) trainer — the EM complement to BPE:
    // seed all 1..4-char substrings, keep chars + top-40 multis, two
    // Viterbi-EM rounds pruning to chars + top-20 after round 1. Nano-
    // log-prob integer DP makes both engines pick bit-identical
    // segmentations; the oracle unrolls the EM rounds as CTE stacks (the
    // q_bpe_merges technique) with the per-word DP as list_reduce folds.
    "q_unigram_train" -> ((s, dir) =>
      llm.Unigram.vocabDf(s,
          llm.Unigram.train(llm.Bpe.wordFreq(tWide(s, dir, "documents")),
            seedMulti = 40, keepMulti = 20, emRounds = 2))
        .orderBy(col("piece"))),
    // the inference half: Viterbi-segment the word table under the trained
    // vocab — a pure scan-side projection (tokens space-joined, contract #1)
    "q_unigram_encode" -> ((s, dir) => {
      val words = llm.Bpe.wordFreq(tWide(s, dir, "documents"))
      val vocab = llm.Unigram.train(words, seedMulti = 40, keepMulti = 20,
        emRounds = 2)
      llm.Unigram.encode(words, vocab)
        .select(col("word"), col("freq"),
          size(col("tokens")).as("n_tokens"),
          array_join(col("tokens"), " ").as("toks"))
        .orderBy(col("word"))
    }),
    // subword REGULARIZATION over the same trained vocab: a SAMPLED
    // segmentation per word, P(x) ∝ (∏p)^α at α=1 — Kudo's training-time
    // augmentation, md5-deterministic draws (salt:word:position) so the
    // DuckDB mirror replays the identical lattice walk. Forward marginals
    // stay on the nano-log grid; the only raw-double decision is the
    // cum>u draw comparison (the q_lm_score accepted noise class).
    "q_unigram_sample" -> ((s, dir) => {
      val words = llm.Bpe.wordFreq(tWide(s, dir, "documents"))
      val vocab = llm.Unigram.train(words, seedMulti = 40, keepMulti = 20,
        emRounds = 2)
      llm.Unigram.sample(words, vocab, alpha = 1.0, salt = "r14")
        .select(col("word"), col("freq"),
          size(col("tokens")).as("n_tokens"),
          array_join(col("tokens"), " ").as("toks"))
        .orderBy(col("word"))
    }),
    // the steady-state form: the trained vocab is a PERSISTED artifact
    // (44 rows — parquet in bench mode, the q_dedup_incr_prebuilt
    // discipline), the probe collects it (codebook-sized, the
    // q_embed_assign pattern) and runs the zero-exchange scan-side
    // encode. Shares q_unigram_encode's oracle VERBATIM: the prebuilt
    // path must be indistinguishable from the inline one.
    "q_unigram_encode_prebuilt" -> ((s, dir) => {
      val words = llm.Bpe.wordFreq(tWide(s, dir, "documents"))
      val vdf = sources.Artifacts.table(s, "unigram_vocab")(
        llm.Unigram.vocabDf(s,
          llm.Unigram.train(words, seedMulti = 40, keepMulti = 20,
            emRounds = 2)))
      val vocab = vdf.orderBy(col("piece")).collect()
        .map(r => llm.Unigram.Piece(r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
      llm.Unigram.encode(words, vocab)
        .select(col("word"), col("freq"),
          size(col("tokens")).as("n_tokens"),
          array_join(col("tokens"), " ").as("toks"))
        .orderBy(col("word"))
    }),
    "q_tfidf" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      // nDocs rides the vocab scan as an observed metric (the bm25
      // discipline); the 20-row vocab's eager checkpoint is the action
      // that fires it — the separate count() corpus pass is gone.
      val obs = org.apache.spark.sql.Observation()
      val vocab = llm.TextAnalysis.vocabTopK(
          docs.observe(obs, count(lit(1)).as("n_docs")), k = 20)
        .localCheckpoint(eager = true)
      val n = obs.get("n_docs").asInstanceOf[Long]
      llm.TextAnalysis.tfidf(docs, vocab, n)
        .orderBy(col("doc_id"), col("term"))
    }),
    // BM25 top-10 per panel query: panel-broadcast postings, idf floored
    // to the 1e-9 grid (the only ln), integer micro-unit score sum
    "q_bm25" -> ((s, dir) => {
      import s.implicits._
      llm.Search.bm25(tWide(s, dir, "documents"),
          llm.Search.DefaultPanel.toDF("query_id", "term"))
        .orderBy(col("query_id"), col("rank"))
    }),
    // RM-style pseudo-relevance feedback: top-5 expansion terms per
    // query from its BM25 top-5 docs, tf x micro-score integer weights
    "q_query_expansion" -> ((s, dir) => {
      import s.implicits._
      llm.Search.expandQueries(tWide(s, dir, "documents"),
          llm.Search.DefaultPanel.toDF("query_id", "term"))
        .orderBy(col("query_id"), col("rank"))
    }),
    // inverted bigram index with df rails: minDf=2 kills the singleton
    // tail (present at sf0.01), maxDf = floor(0.06 N) prunes hot phrases
    // at BOTH SFs; postings row width bounded by maxDf by construction
    "q_inverted_index" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      // n rides the build scan (invertedIndexRawCounted: observe + eager
      // checkpoint), rails apply at READ over the unrailed raw index —
      // the StreamingIndex.readRailedIndex contract in batch form; the
      // separate count() corpus pass is gone.
      val (raw, n) = llm.Search.invertedIndexRawCounted(docs)
      llm.Search.renderIndex(llm.Search.applyRails(raw, 2L,
          math.floor(0.06 * n).toLong))
        .orderBy(col("gram"))
    }),
    // conjunctive AND/phrase lookup over the PREBUILT index, persisted
    // hive-partitioned by gram-hash bucket: the probe reads ONLY the
    // panel grams' buckets (static partition filter on b, literal buckets
    // hashed driver-side with Spark's own xxhash64) plus a pushed
    // gram-IN filter — never the whole index (PlanSpec + SearchScanSpec
    // FS-byte probe). Rarest gram's postings drive, a doc matches iff
    // every phrase bigram is indexed and present; the corpus is never
    // re-scanned. Pruning is the identity restricted to the panel, so the
    // oracle is unchanged.
    "q_index_phrase" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val nb = streaming.StreamingIndex.DefaultBuckets
      // the artifact persists UNRAILED with its 1-row _n sidecar (built
      // in the SAME scan via countedArtifact); rails apply at read after
      // the gram pruning (they commute — df is global on every row).
      // Steady-state probes read only the matched buckets + the sidecar:
      // zero corpus access, and the per-run count() corpus pass is gone.
      val (index, n) = countedArtifact(s, "phrase_index", Seq("b"), docs)(
        d => llm.Search.withBucket(llm.Search.invertedIndexRaw(d), nb))
      val grams = llm.Search.PhrasePanel
        .flatMap(p => llm.Search.phraseGrams(p._2)).distinct
      llm.Search.phraseQuery(
          llm.Search.applyRails(
            llm.Search.pruneToGrams(index, grams, nb),
            2L, math.floor(0.06 * n).toLong),
          llm.Search.PhrasePanel)
        .orderBy(col("phrase_id"), col("doc_id"))
    }),
    // EXACT phrase retrieval over the POSITIONAL index artifact
    // (bucket-partitioned, panel-pruned like q_index_phrase): a doc
    // matches at p iff word k occurs at p+k for every k — the
    // bigram-chain row's over-matching approximation replaced by true
    // chain intersection; phrase_tf = exact occurrence count. Open df
    // rails: a positional phrase probe must not stopword-prune its own
    // words ("the fast scan" contains "the").
    "q_index_phrase_exact" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val nb = streaming.StreamingIndex.DefaultBuckets
      val index = sources.Artifacts.table(s, "pos_index",
        partitionBy = Seq("b"))(
        llm.Search.withBucket(llm.Search.positionalIndexRaw(docs),
          nb, gramCol = "term"))
      val words = llm.Search.PhrasePanel
        .flatMap(p => llm.Search.phraseWords(p._2)).distinct
      llm.Search.phraseQueryExact(
          llm.Search.pruneToGrams(index, words, nb, gramCol = "term"),
          llm.Search.PhrasePanel)
        .orderBy(col("phrase_id"), col("doc_id"))
    }),
    // PROXIMITY (span-near) retrieval over the same positional artifact:
    // doc matches iff some 8-token window contains all the phrase's
    // (distinct) words, order-free — candidate starts are the index
    // positions themselves, so the probe stays a pruned index read.
    "q_index_proximity" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val nb = streaming.StreamingIndex.DefaultBuckets
      val index = sources.Artifacts.table(s, "pos_index",
        partitionBy = Seq("b"))(
        llm.Search.withBucket(llm.Search.positionalIndexRaw(docs),
          nb, gramCol = "term"))
      val words = llm.Search.PhrasePanel
        .flatMap(p => llm.Search.phraseWords(p._2)).distinct
      llm.Search.proximityQuery(
          llm.Search.pruneToGrams(index, words, nb, gramCol = "term"),
          llm.Search.PhrasePanel, window = 8)
        .orderBy(col("phrase_id"), col("doc_id"))
    }),
    // EXACT phrase over a STREAMED positional index — the generalized
    // segmented core instantiated directly from the catalog (builder =
    // positionalIndexRaw, gram column = term): three batches, term-
    // bucketed major at maxSegments=3, vacuum, then the pruned exact
    // probe. Shares q_index_phrase_exact's truth oracle VERBATIM.
    "q_index_phrase_exact_stream" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sposx_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sposx").toString
      }
      streaming.Redrive(s, state, 2L) { b =>
        streaming.StreamingIndex.applyBatch(
          docs.filter(col("doc_id") % 3 === b), state, b, maxSegments = 3,
          gramCol = "term",
          build = d => llm.Search.positionalIndexRaw(d))
      }
      streaming.StreamingIndex.vacuum(s, state)
      val words = llm.Search.PhrasePanel
        .flatMap(p => llm.Search.phraseWords(p._2)).distinct
      llm.Search.phraseQueryExact(
          streaming.StreamingIndex.readIndexPruned(s, state, words,
            gramCol = "term"),
          llm.Search.PhrasePanel)
        .orderBy(col("phrase_id"), col("doc_id"))
    }),
    // the same phrase probe over the STREAMED segmented index: state
    // folded through StreamingIndex.applyBatch (shares q_index_stream's
    // state dir and fold params in bench mode — identical folds, one
    // build), served through readRailedIndexPruned — the base scan takes
    // the panel buckets' static partition filter (modulus from the
    // manifest), segments take the gram-IN filter, and the per-gram fold
    // commutes with the pruning. State == full corpus and rails match
    // q_index_phrase's, so it shares that oracle VERBATIM.
    "q_index_phrase_stream" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sidx_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sidxp").toString
      }
      streaming.Redrive(s, state, 2L) { b =>
        streaming.StreamingIndex.applyBatch(
          docs.filter(col("doc_id") % 3 === b), state, b, maxSegments = 3)
      }
      streaming.StreamingIndex.vacuum(s, state)
      val grams = llm.Search.PhrasePanel
        .flatMap(p => llm.Search.phraseGrams(p._2)).distinct
      llm.Search.phraseQuery(
          streaming.StreamingIndex.readRailedIndexPruned(s, state, grams),
          llm.Search.PhrasePanel)
        .orderBy(col("phrase_id"), col("doc_id"))
    }),
    // incremental index maintenance: the corpus split (< 250 persisted
    // unrailed index, >= 250 batch) merges via broadcast gram gating —
    // untouched grams never shuffle — with df rails applied at READ time.
    // Shares q_inverted_index's oracle VERBATIM: maintained state ≡ full
    // rebuild over the union corpus.
    "q_index_incr" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      // n = persisted old count (the _n sidecar, built in the old index's
      // own scan) + the batch count observed on the batch build scan
      // (whose eager checkpoint also serves its three consumers: two
      // broadcast gram gates + the merge union) — the full-corpus
      // count() pass is gone.
      val (old, nOld) = countedArtifact(s, "index_incr_old", Nil,
        docs.filter(col("doc_id") < 250))(llm.Search.invertedIndexRaw(_))
      val obs = org.apache.spark.sql.Observation()
      val batch = llm.Search.invertedIndexRaw(
          docs.filter(col("doc_id") >= 250)
            .observe(obs, count(lit(1)).as("n_docs")))
        .localCheckpoint(eager = true)
      val n = nOld + obs.get("n_docs").asInstanceOf[Long]
      val merged = llm.Search.indexMerge(old, batch)
      llm.Search.renderIndex(
          llm.Search.applyRails(merged, 2L, math.floor(0.06 * n).toLong))
        .orderBy(col("gram"))
    }),
    // DELETION-aware index maintenance: the purged docs' postings
    // subtract from the persisted unrailed index (broadcast gram gating —
    // untouched grams never shuffle; the posting cut is scan-side), rails
    // re-applied at read over the SURVIVING doc count. Oracle = full
    // rebuild over corpus ∖ deleted.
    "q_index_delete" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      // surviving n = persisted full count (the old index's _n sidecar)
      // − the doomed count observed on the deletion index's own build
      // scan (its eager checkpoint serves the two broadcast consumers) —
      // the separate survivors count() pass is gone.
      val (old, nAll) = countedArtifact(s, "index_del_old", Nil, docs)(
        llm.Search.invertedIndexRaw(_))
      val obs = org.apache.spark.sql.Observation()
      val deletedIdx = llm.Search.invertedIndexRaw(
          docs.filter(col("doc_id") % 10 === 6)
            .observe(obs, count(lit(1)).as("n_docs")))
        .localCheckpoint(eager = true)
      val n = nAll - obs.get("n_docs").asInstanceOf[Long]
      llm.Search.renderIndex(
          llm.Search.applyRails(llm.Search.indexDelete(old, deletedIdx),
            2L, math.floor(0.06 * n).toLong))
        .orderBy(col("gram"))
    }),
    // STREAMING index maintenance, batch-parity form: the corpus arrives
    // as three disjoint foreachBatch micro-batches folded through
    // StreamingIndex.applyBatch (the IDENTICAL code the writer runs) into
    // the SEGMENTED state layout — each batch writes only its own segment
    // (bytes ∝ batch), batch 2 hits maxSegments=3 and compacts into the
    // bucket-partitioned base, vacuum reclaims the compacted segments.
    // Rails apply at read over the live stats sidecar. Shares
    // q_inverted_index's oracle VERBATIM: the streamed index ≡ a full
    // rebuild over the whole corpus.
    "q_index_stream" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      // bench mode: the state dir lives under the artifact root, so the
      // batches fold once (pass 1) and later passes hit the replay-skip
      // pointer — the MIN measures the railed serving read over the
      // compacted base, the q_bm25_indexed discipline. Verify gets a
      // fresh temp dir and folds everything inline every run.
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sidx_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sidx").toString
      }
      // Redrive: a run that died mid-prefix resumes exactly where it
      // stopped (never silently serving a partial index), and a completed
      // fold serves without re-driving — a pass ≥ 2 measures the railed
      // serving read, not a re-drive (and never a replayCheck throw).
      streaming.Redrive(s, state, 2L) { b =>
        streaming.StreamingIndex.applyBatch(
          docs.filter(col("doc_id") % 3 === b), state, b, maxSegments = 3)
      }
      streaming.StreamingIndex.vacuum(s, state)
      llm.Search.renderIndex(
          streaming.StreamingIndex.readRailedIndex(s, state))
        .orderBy(col("gram"))
    }),
    // STREAMING ingest + ERASURE fold: the change stream carries both new
    // docs and full-row tombstones (the StreamingSnapshot convention —
    // erasure postings re-derive from the tombstone row itself); adds
    // merge, tombstones subtract, all inside the same pointer-disciplined
    // applyBatch. Shares q_index_delete's corpus∖deleted oracle VERBATIM:
    // the streamed fold ≡ a rebuild over the survivors.
    "q_index_stream_erasure" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sidx_erasure_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sidxe").toString
      }
      val dc: org.apache.spark.sql.Column = col("doc_id") % 10 === 6
      // Redrive folds the un-applied suffix (resume safety);
      // the tail batch carries the last third's clean docs WITH erasure
      // tombstones for every already-ingested doc_id ≡ 6 (mod 10), and
      // triggers compaction (maxSegments=3) — the tombstones fold into
      // the bucket-partitioned base, then vacuum reclaims the segments
      streaming.Redrive(s, state, 2L) {
        case b if b < 2 =>
          streaming.StreamingIndex.applyBatch(
            docs.filter(col("doc_id") % 3 === b)
              .withColumn("_deleted", lit(false)),
            state, b, deleteCol = Some("_deleted"), maxSegments = 3)
        case b =>
          streaming.StreamingIndex.applyBatch(
            docs.filter(col("doc_id") % 3 === 2 && !dc)
              .withColumn("_deleted", lit(false))
              .unionByName(docs.filter(col("doc_id") % 3 =!= 2 && dc)
                .withColumn("_deleted", lit(true))),
            state, b, deleteCol = Some("_deleted"), maxSegments = 3)
      }
      streaming.StreamingIndex.vacuum(s, state)
      // rails over the LIVE stats sidecar (n_docs already nets out the
      // tombstoned docs — statsDelete in the fold), exactly
      // q_index_stream's serving read: the survivors count() corpus pass
      // is gone and the steady-state serve touches only the state.
      llm.Search.renderIndex(
          streaming.StreamingIndex.readRailedIndex(s, state))
        .orderBy(col("gram"))
    }),
    // STREAMING ingest under MINOR compaction: maxSegments=2 with a
    // forced-minor ratio — the trigger at batch 1 majors (no base yet),
    // the triggers at batches 3 and 4 MINOR (tail-run fold into one
    // segment, base untouched on disk). The serving read is base + the
    // folded segment; shares the full-rebuild oracle VERBATIM, so the
    // driver gate covers the minor path, not just the specs.
    "q_index_stream_minor" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sidx_minor_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sidxm").toString
      }
      streaming.Redrive(s, state, 4L) { b =>
        streaming.StreamingIndex.applyBatch(
          docs.filter(col("doc_id") % 5 === b), state, b,
          maxSegments = 2, majorRatio = 1e9)
      }
      streaming.StreamingIndex.vacuum(s, state)
      llm.Search.renderIndex(
          streaming.StreamingIndex.readRailedIndex(s, state))
        .orderBy(col("gram"))
    }),
    // STREAMING erase → RE-INGEST for the index (update churn): docs ≡ 6
    // (mod 10) from batch 0 are tombstoned in batch 1 (postings re-derive
    // from the tombstone text) and RETURN in batch 2; batch 3 adds the
    // last third. Nothing compacts (maxSegments=5), so the serving read
    // exercises the ORDERED tombstone fold — the del segment subtracts
    // from exactly the state that preceded it, then the returned docs'
    // postings merge on top. Serves the FULL corpus: shares
    // q_index_stream's railed oracle VERBATIM.
    "q_index_stream_reingest" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sidx_reingest_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sidxr").toString
      }
      val dc: org.apache.spark.sql.Column =
        col("doc_id") % 3 === 0 && col("doc_id") % 10 === 6
      def batchOf(b: Long): org.apache.spark.sql.DataFrame = b match {
        case 0L => docs.filter(col("doc_id") % 3 === 0)
          .withColumn("_deleted", lit(false))
        case 1L => docs.filter(col("doc_id") % 3 === 1)
          .withColumn("_deleted", lit(false))
          .unionByName(docs.filter(dc).withColumn("_deleted", lit(true)))
        case 2L => docs.filter(dc).withColumn("_deleted", lit(false))
        case _ => docs.filter(col("doc_id") % 3 === 2)
          .withColumn("_deleted", lit(false))
      }
      streaming.Redrive(s, state, 3L) { b =>
        streaming.StreamingIndex.applyBatch(batchOf(b), state, b,
          deleteCol = Some("_deleted"), maxSegments = 5)
      }
      streaming.StreamingIndex.vacuum(s, state)
      llm.Search.renderIndex(
          streaming.StreamingIndex.readRailedIndex(s, state))
        .orderBy(col("gram"))
    }),
    // BM25 over PREBUILT artifacts (unigram index with dl in postings +
    // 1-row stats sidecar, checkpointed = the persisted stand-in): the
    // steady-state retrieval form — zero corpus reads at query time
    // (SearchScanSpec). Open rails ⇒ shares q_bm25's oracle VERBATIM.
    "q_bm25_indexed" -> ((s, dir) => {
      import s.implicits._
      val docs = tWide(s, dir, "documents")
      // the unigram serving index persists term-bucket-partitioned too:
      // a literal panel's probe statically prunes to its terms' buckets
      // (the q_index_phrase discipline — pruning is the identity
      // restricted to the panel, the probe's first op is a panel join)
      val nb = streaming.StreamingIndex.DefaultBuckets
      val index = sources.Artifacts.table(s, "bm25_index",
        partitionBy = Seq("b"))(
        llm.Search.withBucket(llm.Search.searchIndexRaw(docs),
          nb, gramCol = "term"))
      val stats = sources.Artifacts.table(s, "bm25_stats")(
        llm.Search.corpusStats(docs))
      val terms = llm.Search.DefaultPanel.map(_._2).distinct
      llm.Search.bm25FromIndex(
          llm.Search.pruneToGrams(index, terms, nb, gramCol = "term"),
          stats, llm.Search.DefaultPanel.toDF("query_id", "term"))
        .orderBy(col("query_id"), col("rank"))
    }),
    // snippet windows for the BM25 top-10: the display step served
    // entirely off the persisted artifacts — the ranked set gates the
    // positional probe (broadcast), the best 8-token window per result
    // is an integer argmax over the doc's panel-term offsets (ties →
    // smallest start), zero corpus reads end to end
    "q_snippets" -> ((s, dir) => {
      import s.implicits._
      val docs = tWide(s, dir, "documents")
      val nb = streaming.StreamingIndex.DefaultBuckets
      val index = sources.Artifacts.table(s, "bm25_index",
        partitionBy = Seq("b"))(
        llm.Search.withBucket(llm.Search.searchIndexRaw(docs),
          nb, gramCol = "term"))
      val stats = sources.Artifacts.table(s, "bm25_stats")(
        llm.Search.corpusStats(docs))
      val posIndex = sources.Artifacts.table(s, "pos_index",
        partitionBy = Seq("b"))(
        llm.Search.withBucket(llm.Search.positionalIndexRaw(docs),
          nb, gramCol = "term"))
      val terms = llm.Search.DefaultPanel.map(_._2).distinct
      val panel = llm.Search.DefaultPanel.toDF("query_id", "term")
      val ranked = llm.Search.bm25FromIndex(
        llm.Search.pruneToGrams(index, terms, nb, gramCol = "term"),
        stats, panel)
      llm.Search.snippetWindows(
          llm.Search.pruneToGrams(posIndex, terms, nb, gramCol = "term"),
          ranked, panel, window = 8)
        .orderBy(col("query_id"), col("rank"))
    }),
    // … and the SAME display step served off the STREAMED states: ranked
    // list from the maintained unigram BM25 state (the q_bm25_stream
    // dir + fold params — identical folds, one build in bench mode),
    // windows from the maintained positional state (the
    // q_index_phrase_exact_stream dir), both through bucket-pruned panel
    // reads. State == corpus for both, so it shares q_snippets' truth
    // oracle VERBATIM — every retrieval row's serving symmetry now
    // includes the display step.
    "q_snippets_stream" -> ((s, dir) => {
      import s.implicits._
      val docs = tWide(s, dir, "documents")
      val bmState = sources.Artifacts.root match {
        case Some(r) => s"$r/sbm25_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sbm25sn").toString
      }
      streaming.Redrive(s, bmState, 2L) { b =>
        streaming.StreamingSearchIndex.applyBatch(
          docs.filter(col("doc_id") % 3 === b), bmState, b, maxSegments = 3)
      }
      streaming.StreamingSearchIndex.vacuum(s, bmState)
      val posState = sources.Artifacts.root match {
        case Some(r) => s"$r/sposx_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sposxsn").toString
      }
      streaming.Redrive(s, posState, 2L) { b =>
        streaming.StreamingIndex.applyBatch(
          docs.filter(col("doc_id") % 3 === b), posState, b, maxSegments = 3,
          gramCol = "term",
          build = d => llm.Search.positionalIndexRaw(d))
      }
      streaming.StreamingIndex.vacuum(s, posState)
      val ranked = streaming.StreamingSearchIndex.bm25(s, bmState,
        llm.Search.DefaultPanel)
      val terms = llm.Search.DefaultPanel.map(_._2).distinct
      llm.Search.snippetWindows(
          streaming.StreamingIndex.readIndexPruned(s, posState, terms,
            gramCol = "term"),
          ranked, llm.Search.DefaultPanel.toDF("query_id", "term"),
          window = 8)
        .orderBy(col("query_id"), col("rank"))
    }),
    // Dirichlet query-likelihood ranking over the SAME persisted
    // artifacts as q_bm25_indexed (the cf column in the index is the
    // smoothing mass) — the second classic ranker, zero corpus reads,
    // every ln draw floored to the 1e-9 grid, integer micro scores.
    "q_ql_indexed" -> ((s, dir) => {
      import s.implicits._
      val docs = tWide(s, dir, "documents")
      val nb = streaming.StreamingIndex.DefaultBuckets
      val index = sources.Artifacts.table(s, "bm25_index",
        partitionBy = Seq("b"))(
        llm.Search.withBucket(llm.Search.searchIndexRaw(docs),
          nb, gramCol = "term"))
      val stats = sources.Artifacts.table(s, "bm25_stats")(
        llm.Search.corpusStats(docs))
      val terms = llm.Search.DefaultPanel.map(_._2).distinct
      llm.Search.qlFromIndex(
          llm.Search.pruneToGrams(index, terms, nb, gramCol = "term"),
          stats, llm.Search.DefaultPanel.toDF("query_id", "term"))
        .orderBy(col("query_id"), col("rank"))
    }),
    // ... and the same ranker OFF THE MAINTAINED STREAMING STATE — one
    // artifact family serves both scorers (state == corpus, so it shares
    // q_ql_indexed's oracle verbatim)
    "q_ql_stream" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sbm25_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sbm25q").toString
      }
      streaming.Redrive(s, state, 2L) { b =>
        streaming.StreamingSearchIndex.applyBatch(
          docs.filter(col("doc_id") % 3 === b), state, b, maxSegments = 3)
      }
      streaming.StreamingSearchIndex.vacuum(s, state)
      streaming.StreamingSearchIndex.ql(s, state, llm.Search.DefaultPanel)
        .orderBy(col("query_id"), col("rank"))
    }),
    // ALWAYS-ON BM25: the unigram search index + stats maintained under
    // the segmented-state discipline (StreamingSearchIndex = the
    // StreamingIndex core parameterized on term/searchIndexRaw), scored
    // via the bucket-pruned panel probe — three foreachBatch-parity
    // batches, compaction at maxSegments=3 lands the term-bucketed base,
    // vacuum reclaims, zero corpus reads at query time. Open rails ⇒
    // shares q_bm25's oracle VERBATIM.
    "q_bm25_stream" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sbm25_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sbm25").toString
      }
      streaming.Redrive(s, state, 2L) { b =>
        streaming.StreamingSearchIndex.applyBatch(
          docs.filter(col("doc_id") % 3 === b), state, b, maxSegments = 3)
      }
      streaming.StreamingSearchIndex.vacuum(s, state)
      streaming.StreamingSearchIndex.bm25(s, state, llm.Search.DefaultPanel)
        .orderBy(col("query_id"), col("rank"))
    }),
    // ALWAYS-ON BM25 under ERASURE: the tail batch carries the last
    // third's clean docs WITH full-row tombstones for every already-
    // ingested doc_id ≡ 6 (mod 10) — postings subtract, the stats
    // sidecar shrinks, and the pruned probe scores the SURVIVORS exactly
    // (oracle = inline BM25 over corpus ∖ deleted).
    "q_bm25_stream_erasure" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/sbm25_erasure_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_sbm25e").toString
      }
      val dc: org.apache.spark.sql.Column = col("doc_id") % 10 === 6
      streaming.Redrive(s, state, 2L) {
        case b if b < 2 =>
          streaming.StreamingSearchIndex.applyBatch(
            docs.filter(col("doc_id") % 3 === b)
              .withColumn("_deleted", lit(false)),
            state, b, deleteCol = Some("_deleted"), maxSegments = 3)
        case b =>
          streaming.StreamingSearchIndex.applyBatch(
            docs.filter(col("doc_id") % 3 === 2 && !dc)
              .withColumn("_deleted", lit(false))
              .unionByName(docs.filter(col("doc_id") % 3 =!= 2 && dc)
                .withColumn("_deleted", lit(true))),
            state, b, deleteCol = Some("_deleted"), maxSegments = 3)
      }
      streaming.StreamingSearchIndex.vacuum(s, state)
      streaming.StreamingSearchIndex.bm25(s, state, llm.Search.DefaultPanel)
        .orderBy(col("query_id"), col("rank"))
    }),
    // the maintained search stack end-to-end: unigram index halves merged
    // via broadcast gram gating (indexMerge on "term"), stats sidecars
    // added exactly (statsMerge), then the index-probe scorer — maintained
    // artifacts must score EXACTLY like inline BM25 on the union corpus
    // (shares q_bm25's oracle verbatim)
    "q_bm25_incr" -> ((s, dir) => {
      import s.implicits._
      val docs = tWide(s, dir, "documents")
      val oldD = docs.filter(col("doc_id") < 250)
      val newD = docs.filter(col("doc_id") >= 250)
      val index = llm.Search.indexMerge(
        sources.Artifacts.table(s, "bm25_incr_old_index")(
          llm.Search.searchIndexRaw(oldD)),
        llm.Search.searchIndexRaw(newD).localCheckpoint(eager = false),
        gramCol = "term")
      val stats = llm.Search.statsMerge(
        sources.Artifacts.table(s, "bm25_incr_old_stats")(
          llm.Search.corpusStats(oldD)),
        llm.Search.corpusStats(newD))
      llm.Search.bm25FromIndex(index, stats,
          llm.Search.DefaultPanel.toDF("query_id", "term"))
        .orderBy(col("query_id"), col("rank"))
    }),
    // hybrid retrieval: BM25 (lexical) + brute cosine (dense) fused by
    // reciprocal-rank fusion — rank-based, so no score calibration; both
    // inputs are bounded queries × k candidate lists, never the corpus.
    // Dense queries are the panel's vec_ids (doc_id ≡ vec_id, the
    // q_knn_filtered convention).
    "q_hybrid_rrf" -> ((s, dir) => {
      import s.implicits._
      val docs = tWide(s, dir, "documents")
      val emb = tWide(s, dir, "embeddings")
      val lex = llm.Search.bm25(docs,
          llm.Search.DefaultPanel.toDF("query_id", "term"))
        .select(col("query_id"), col("doc_id"), col("rank"))
      val dense = llm.Similarity.bruteForceKnn(emb,
          col("vec_id") >= 1 && col("vec_id") <= 5, k = 10)
        .select(col("qid").as("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      llm.Search.rrfFuse(Seq(lex, dense))
        .orderBy(col("query_id"), col("rank"))
    }),

    // distributed linear quality probe: full-batch GD with micro-unit
    // integer gradient sums — one job per iteration, driver state = 4
    // doubles (the Kmeans discipline). Features checkpoint once so
    // iterations re-read features, not the corpus.
    "q_quality_probe" -> ((s, dir) => {
      val feat = llm.QualityProbe.features(tWide(s, dir, "documents"))
        .localCheckpoint(eager = false)
      llm.QualityProbe.train(feat, lr = 0.5, iters = 3).orderBy(col("dim"))
    }),
    // the probe applied: scan-side x·w scoring with the trained weights
    // inlined as literals — the model-filter pass over the corpus
    "q_probe_score" -> ((s, dir) => {
      val feat = llm.QualityProbe.features(tWide(s, dir, "documents"))
        .localCheckpoint(eager = false)
      val w = llm.QualityProbe.trainWeights(feat, lr = 0.5, iters = 3)
      llm.QualityProbe.score(feat, w).orderBy(col("doc_id"))
    }),

    // curriculum sharding: corpus laid out in probe-score order, cut into
    // token-budget shards by the two-phase range-partitioned prefix sum
    // (the q_pack_sequences machinery keyed by (score, id) — no global
    // window). ~14 shards at budget 2000 on this corpus.
    "q_curriculum" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val feat = llm.QualityProbe.features(docs).localCheckpoint(eager = false)
      val w = llm.QualityProbe.trainWeights(feat, lr = 0.5, iters = 3)
      llm.Packing.curriculumShards(docs, llm.QualityProbe.score(feat, w),
          budget = 2000L)
        .orderBy(col("doc_id"))
    }),

    // feature-redundancy audit: Pearson r for every feature pair from one
    // pass of exact integer sufficient statistics
    "q_feature_corr" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val words = split(lower(trim(col("text"))), "\\s+")
      llm.Eval.correlationMatrix(docs, Seq(
          "n_chars" -> col("n_chars"),
          "n_stop" -> size(filter(words,
            x => x.isin(llm.TextAnalysis.StopwordsGopher: _*))),
          "n_words" -> llm.TextAnalysis.tokenCount(col("text"))))
        .orderBy(col("feat_a"), col("feat_b"))
    }),

    // probe calibration: tie-corrected Mann-Whitney AUC of the trained
    // probe's score predicting the Gopher keep verdict — the corpus
    // shrinks to one row per distinct score before the global rank window
    "q_probe_auc" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val feat = llm.QualityProbe.features(docs).localCheckpoint(eager = false)
      val w = llm.QualityProbe.trainWeights(feat, lr = 0.5, iters = 3)
      val labels = llm.TextAnalysis.gopherRules(docs)
        .select(col("doc_id"), col("kept"))
      llm.Eval.auc(
        llm.QualityProbe.score(feat, w).join(labels, Seq("doc_id")),
        col("score"), col("kept"))
    }),

    // reliability diagram: probe scores binned 10-wide vs the Gopher keep
    // rate — "do the scores mean anything as probabilities", next to AUC
    "q_probe_calibration" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val feat = llm.QualityProbe.features(docs).localCheckpoint(eager = false)
      val w = llm.QualityProbe.trainWeights(feat, lr = 0.5, iters = 3)
      val labels = llm.TextAnalysis.gopherRules(docs)
        .select(col("doc_id"), col("kept"))
      llm.Eval.calibrationBins(
        llm.QualityProbe.score(feat, w).join(labels, Seq("doc_id")),
        col("score"), col("kept"), nBins = 10)
    }),
    // Gopher rule battery (Rae et al. 2021 App. A): every rule's measured
    // value + the conjunction verdict, scan-side one-pass. On this corpus
    // the mix comes from the word-count and stopword rules; the symbol/
    // bullet/ellipsis columns verify the expressions (uniformly zero here)
    "q_gopher_rules" -> ((s, dir) =>
      llm.TextAnalysis.gopherRules(tWide(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    "q_text_quality" -> ((s, dir) =>
      llm.TextAnalysis.docStats(tWide(s, dir, "documents"))
        .select(col("doc_id"), col("stopword_ratio"), col("quality"),
          array_join(col("fingerprint"), ",").as("fingerprint"))
        .orderBy(col("doc_id"))),
    // per-doc word entropy: scan-side run-length terms on the 1e-9 ln grid,
    // exact integer fold — the diversity axis of quality filtering
    "q_doc_entropy" -> ((s, dir) =>
      llm.TextAnalysis.wordEntropy(tWide(s, dir, "documents"))
        .orderBy(col("doc_id"))),
    // cross-source redundancy matrix: gram-keyed distinct-set Jaccard per
    // source pair — the double-billing diagnostic next to q_source_kl
    "q_source_overlap" -> ((s, dir) =>
      llm.Report.sourceOverlap(tWide(s, dir, "documents"), n = 3)
        .orderBy(col("src_a"), col("src_b"))),
    // Zipf slope of the top-100 vocabulary: ln-grid least squares over one
    // bounded array row — corpus-health report
    "q_zipf_fit" -> ((s, dir) =>
      llm.Report.zipfFit(tWide(s, dir, "documents"), topN = 100)),

    // ---- LLM data pipeline: repetition quality signals (Gopher-style) ----
    // The synthetic docs are single-line, so the line metrics are degenerate
    // here (pinned by RepetitionSpec's multi-line fixtures); the oracle's
    // teeth are the n-gram fractions and the deterministic top-gram pick.
    "q_repetition" -> ((s, dir) =>
      llm.Repetition.profile(tWide(s, dir, "documents"))
        .select(col("doc_id"), col("n_lines"), col("dup_line_frac"),
          col("dup_line_char_frac"), col("top2_gram"), col("top2_char_frac"),
          col("top3_char_frac"), col("dup5_char_frac"))
        .orderBy(col("doc_id"))),

    // ---- LLM data pipeline: PII audit + redaction ----
    // The synthetic corpus is PII-free, so the query PLANTS deterministic
    // PII (same construction in the oracle SQL): docs with id % 3 == 2 stay
    // clean — the false-positive half of the check. Counts cast to long for
    // cross-engine schema parity.
    "q_pii_scrub" -> ((s, dir) => {
      val docs = tWide(s, dir, "documents")
      val planted = docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 2, substring(col("text"), 1, 60))
          .otherwise(concat(
            substring(col("text"), 1, 60),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com via 10.0."),
            (col("doc_id") % 256).cast("string"),
            lit(".7 or tel +1415555"),
            ((col("doc_id") % 9000) + 1000).cast("string"))).as("text"))
      llm.Pii.scrub(planted)
        .select(col("doc_id"),
          col("n_emails").cast("long").as("n_emails"),
          col("n_ips").cast("long").as("n_ips"),
          col("n_phones").cast("long").as("n_phones"),
          col("has_pii"), col("redacted"))
        .orderBy(col("doc_id"))
    }),

    // ---- LLM data pipeline: multimodal columns ----
    // features exploded to (bucket, feature) scalar rows — same pandas
    // array-cell constraint as q_text_quality, and count/n double division
    // is bit-exact cross-engine where a JSON float rendering is not.
    "q_media_features" -> ((s, dir) =>
      llm.Multimodal.extractFeatures(
        llm.Multimodal.mediaFromDocuments(tWide(s, dir, "documents")))
        .select(col("media_id"), col("n_bytes"), col("format"),
          posexplode(col("features")).as(Seq("bucket", "feature")))
        .orderBy(col("media_id"), col("bucket"))),
    // nearest-neighbor resize of each 1×n_chars "image" to 1×32 via the
    // codec boundary; ASCII corpus ⇒ byte grid == char grid, so the oracle
    // mirrors with integer-division substr sampling
    "q_media_resize" -> ((s, dir) =>
      llm.Multimodal.resize(
        llm.Multimodal.mediaFromDocuments(tWide(s, dir, "documents")),
        outW = 32, outH = 1)
        .select(col("media_id"), col("media").cast("string").as("resized"))
        .orderBy(col("media_id"))),
    // exact binary dedup: identical media bytes → one group; the md5 digest
    // is computed scan-side so bytes never shuffle — hence t(), not tWide():
    // the round-robin repartition would itself shuffle the media bytes and
    // break the operator's core claim. ASCII corpus ⇒ DuckDB's md5(text)
    // hashes the same utf8 bytes as Spark's md5(binary).
    "q_media_dedup" -> ((s, dir) =>
      llm.Multimodal.dedupExact(
        llm.Multimodal.mediaFromDocuments(t(s, dir, "documents")))
        .orderBy(col("content_hash"))),
    // PERCEPTUAL near-dup — the re-encode catcher exact digest dedup is
    // blind to: 20 planted re-encodes (content repeated — different
    // bytes/md5, identical byte-histogram features) plus the corpus's
    // own feature-identical duplicate pairs, found via quantized
    // perceptual-hash bands + exact-cosine verify. Media bytes never
    // enter an exchange (plan-pinned in MultimodalSpec); candidates are
    // band-blocked, never all-pairs, hot bands capped with the
    // observe()-surfaced LSH rail.
    "q_media_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val media = llm.Multimodal.mediaFromDocuments(docs)
      val reenc = docs.filter(col("doc_id") < 20).select(
        (col("doc_id") + 1000000L).as("media_id"),
        concat(col("text"), col("text")).cast("binary").as("media"),
        lit("utf8").as("format"),
        (col("n_chars") * 2).cast("int").as("width"),
        lit(1).as("height"))
      llm.Multimodal.dedupNear(media.unionByName(reenc))
        .orderBy(col("id_a"), col("id_b"))
    }),
    // … the pairs composed with the existing cluster machinery: each
    // near-dup group labeled by its min member id (pointer-doubling label
    // propagation — the q_dedup_clusters fixpoint, met by the oracle's
    // independent recursive-CTE closure).
    "q_media_neardup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val media = llm.Multimodal.mediaFromDocuments(docs)
      val reenc = docs.filter(col("doc_id") < 20).select(
        (col("doc_id") + 1000000L).as("media_id"),
        concat(col("text"), col("text")).cast("binary").as("media"),
        lit("utf8").as("format"),
        (col("n_chars") * 2).cast("int").as("width"),
        lit(1).as("height"))
      llm.Dedup.clusters(
          llm.Multimodal.dedupNear(media.unionByName(reenc))
            .select(col("id_a"), col("id_b")))
        .withColumnRenamed("doc_id", "media_id")
        .orderBy(col("media_id"))
    }),
    // … the steady-state INGEST form: the corpus's FEATURES are a
    // persisted artifact (the compact thing to store — an ingest never
    // re-reads or re-decodes the corpus media), the batch's band keys
    // broadcast as a semi-join gate over the scan-side corpus band
    // derivation, and candidate pairs verify by broadcasting into the
    // feature scans — the corpus is scanned, never shuffled. Batch =
    // docs ≡ 3 (mod 4) plus the 20 planted re-encodes; output = pairs
    // involving the batch (corpus-internal pairs are dedupNear's
    // build-time job), oracle = the shared media CTE chain restricted
    // to batch-involving pairs with the batch id left.
    "q_media_neardup_incr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val isBatch = col("doc_id") % 4 === 3
      val reenc = docs.filter(col("doc_id") < 20).select(
        (col("doc_id") + 1000000L).as("media_id"),
        concat(col("text"), col("text")).cast("binary").as("media"),
        lit("utf8").as("format"),
        (col("n_chars") * 2).cast("int").as("width"),
        lit(1).as("height"))
      val corpusFeats = sources.Artifacts.table(s, "media_feats")(
        llm.Multimodal.extractFeatures(
            llm.Multimodal.mediaFromDocuments(docs.filter(!isBatch)))
          .select(col("media_id"), col("features")))
      llm.Multimodal.dedupNearIncremental(
          llm.Multimodal.mediaFromDocuments(docs.filter(isBatch))
            .unionByName(reenc),
          corpusFeats)
        .orderBy(col("id_new"), col("id_other"))
    }),
    // … the ALWAYS-ON form: the features artifact maintained under the
    // segmented-state discipline — three batches decode ONLY their own
    // media (scan-side codec, bytes ∝ batch), compaction at
    // maxSegments=3 lands the id-hash-bucketed base, vacuum reclaims,
    // and near-dup serves off the merge-on-read view with ZERO media
    // access. State == corpus ⇒ shares q_media_neardup's oracle VERBATIM.
    "q_media_neardup_stream" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val reenc = docs.filter(col("doc_id") < 20).select(
        (col("doc_id") + 1000000L).as("media_id"),
        concat(col("text"), col("text")).cast("binary").as("media"),
        lit("utf8").as("format"),
        (col("n_chars") * 2).cast("int").as("width"),
        lit(1).as("height"))
      val media = llm.Multimodal.mediaFromDocuments(docs).unionByName(reenc)
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/smedia_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_smedia").toString
      }
      streaming.Redrive(s, state, 2L) { b =>
        streaming.StreamingMedia.applyBatch(
          media.filter(col("media_id") % 3 === b), state, b, maxSegments = 3)
      }
      streaming.StreamingMedia.vacuum(s, state)
      streaming.StreamingMedia.nearDups(s, state)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // … and under ERASURE: the tail batch carries full-row tombstones for
    // every already-ingested base doc ≡ 6 (mod 10) — tombstone rows are
    // never decoded (per-row artifact: erasure IS the version-ordered
    // anti join) and the served pairs are exactly the survivors'.
    "q_media_neardup_erasure" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val reenc = docs.filter(col("doc_id") < 20).select(
        (col("doc_id") + 1000000L).as("media_id"),
        concat(col("text"), col("text")).cast("binary").as("media"),
        lit("utf8").as("format"),
        (col("n_chars") * 2).cast("int").as("width"),
        lit(1).as("height"))
      val media = llm.Multimodal.mediaFromDocuments(docs).unionByName(reenc)
      val doomed = col("media_id") % 10 === 6 && col("media_id") < 1000000L
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/smedia_erasure_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_smediae").toString
      }
      streaming.Redrive(s, state, 2L) {
        case b if b < 2 =>
          streaming.StreamingMedia.applyBatch(
            media.filter(col("media_id") % 2 === b)
              .withColumn("_deleted", lit(false)),
            state, b, deleteCol = Some("_deleted"), maxSegments = 3)
        case b =>
          streaming.StreamingMedia.applyBatch(
            media.filter(doomed).withColumn("_deleted", lit(true)),
            state, b, deleteCol = Some("_deleted"), maxSegments = 3)
      }
      streaming.StreamingMedia.vacuum(s, state)
      streaming.StreamingMedia.nearDups(s, state)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // FRAME-CONTAINMENT dedup for "video" media: clipped copies share
    // sampled-frame digests even though file digest AND whole-media
    // features both differ. Planted clips: a 64-byte-offset suffix of
    // docs 0-9 (offset ≡ 0 mod frameBytes·everyNth = the sampling grid,
    // so every sampled clip frame lands on the original's grid); the
    // corpus's exact-dup texts share all frames naturally. Digest groups
    // railed by maxFrameDf (the filler-frame stopword cap).
    "q_media_frame_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val media = llm.Multimodal.mediaFromDocuments(docs)
      val clips = docs.filter(col("doc_id") < 10 && col("n_chars") >= 224)
        .select(
          (col("doc_id") + 2000000L).as("media_id"),
          col("text").substr(lit(65), col("n_chars")).cast("binary").as("media"),
          (col("n_chars") - 64).cast("int").as("width"),
          lit("utf8").as("format"),
          lit(1).as("height"))
      llm.Multimodal.frameOverlap(media.unionByName(clips),
          frameBytes = 32, everyNth = 2)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // OFF-GRID clip containment: content-defined chunk boundaries (rolling
    // hash of the content, not byte offsets) re-derive inside a clip cut at
    // ANY offset — the case q_media_frame_overlap's fixed grid provably
    // misses (its spec pins the offset-32 clip at zero shared frames).
    // Planted clips: a 33-byte-offset suffix of docs 0-9 (33 ≢ 0 mod any
    // frame grid); interior chunk digests match exactly, no banding.
    "q_media_clip_offgrid" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val media = llm.Multimodal.mediaFromDocuments(docs)
      val clips = docs.filter(col("doc_id") < 10 && col("n_chars") >= 224)
        .select(
          (col("doc_id") + 3000000L).as("media_id"),
          col("text").substr(lit(34), col("n_chars")).cast("binary").as("media"),
          (col("n_chars") - 33).cast("int").as("width"),
          lit("utf8").as("format"),
          lit(1).as("height"))
      llm.Multimodal.clipContainment(media.unionByName(clips))
        .orderBy(col("id_a"), col("id_b"))
    }),
    // ALWAYS-ON chunk-state maintenance: corpus ∪ clips fold in 3 batches
    // into the segmented chunk table (only adds are chunked; compaction
    // at maxSegments=3); the containment tail served off the maintained
    // state ≡ the inline build — q_media_clip_offgrid's oracle VERBATIM.
    "q_media_clip_stream" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val media = llm.Multimodal.mediaFromDocuments(docs)
        .unionByName(clipBatch(docs))
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/schunk_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_schunk").toString
      }
      streaming.Redrive(s, state, 2L) { b =>
        streaming.StreamingChunks.applyBatch(
          media.filter(col("media_id") % 3 === b), state, b, maxSegments = 3)
      }
      streaming.StreamingChunks.vacuum(s, state)
      streaming.StreamingChunks.clipPairs(s, state)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // … and under ERASURE: tail-batch tombstones for base docs ≡ 7
    // (mod 10) — tombstone rows are never chunked (per-row artifact:
    // erasure IS the version-ordered anti join); served pairs are exactly
    // the survivors'.
    "q_media_clip_stream_erasure" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val media = llm.Multimodal.mediaFromDocuments(docs)
        .unionByName(clipBatch(docs))
      val doomed = col("media_id") % 10 === 7 && col("media_id") < 3000000L
      val state = sources.Artifacts.root match {
        case Some(r) => s"$r/schunk_erasure_state"
        case None =>
          java.nio.file.Files.createTempDirectory("graft_schunke").toString
      }
      streaming.Redrive(s, state, 2L) {
        case b if b < 2 =>
          streaming.StreamingChunks.applyBatch(
            media.filter(col("media_id") % 2 === b)
              .withColumn("_deleted", lit(false)),
            state, b, deleteCol = Some("_deleted"), maxSegments = 3)
        case b =>
          streaming.StreamingChunks.applyBatch(
            media.filter(doomed).withColumn("_deleted", lit(true)),
            state, b, deleteCol = Some("_deleted"), maxSegments = 3)
      }
      streaming.StreamingChunks.vacuum(s, state)
      streaming.StreamingChunks.clipPairs(s, state)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // the clip family's maintenance taxonomy (the dedupNearIncremental
    // discipline): a new-media batch (the planted off-grid clips) probes
    // the corpus CHUNK TABLE — inline here, a persisted Artifacts parquet
    // in the prebuilt form (same oracle VERBATIM), erasure-folded in the
    // delete form. Corpus media are never re-chunked at probe time.
    "q_media_clip_incr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      llm.Multimodal.clipContainmentIncremental(
          clipBatch(docs),
          llm.Multimodal.chunkTable(llm.Multimodal.mediaFromDocuments(docs)))
        .orderBy(col("id_new"), col("id_other"))
    }),
    "q_media_clip_prebuilt" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      llm.Multimodal.clipContainmentIncremental(
          clipBatch(docs),
          sources.Artifacts.table(s, "clip_chunks")(
            llm.Multimodal.chunkTable(llm.Multimodal.mediaFromDocuments(docs))))
        .orderBy(col("id_new"), col("id_other"))
    }),
    "q_media_clip_delete" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val deleted = docs.filter(col("doc_id") % 10 === 7)
        .select(col("doc_id").as("media_id"))
      llm.Multimodal.clipContainmentIncremental(
          clipBatch(docs),
          llm.Multimodal.chunksDelete(
            sources.Artifacts.table(s, "clip_chunks")(
              llm.Multimodal.chunkTable(llm.Multimodal.mediaFromDocuments(docs))),
            deleted))
        .orderBy(col("id_new"), col("id_other"))
    }),
    // frame emitted as hex text: binary column comparators differ across
    // engines/arrow readers (bytes vs bytearray); hex is unambiguous.
    "q_media_frames" -> ((s, dir) =>
      llm.Multimodal.sampleFrames(
        llm.Multimodal.mediaFromDocuments(tWide(s, dir, "documents")))
        .select(col("media_id"), col("frame_idx"), hex(col("frame")).as("frame_hex"))
        .orderBy(col("media_id"), col("frame_idx"))),
  )

  /** DuckDB's direct decimal→double cast converts the int128 unscaled value
    * to double and divides by 10^scale — two roundings, up to 1 ulp off the
    * correctly-rounded value. Spark (java.math.BigDecimal.doubleValue) is
    * correctly rounded. Round-tripping through VARCHAR forces DuckDB's
    * strtod, which is also correctly rounded → bit-exact parity. */
}
