package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation statistics over corpus-sized predictions — the
  * "is the quality probe any good?" step between training a filter and
  * trusting it on 100 TB.
  *
  * AUC is computed as the tie-corrected Mann-Whitney statistic:
  * AUC = (Σ_pos avgrank − P(P+1)/2) / (P·N), with average ranks over tied
  * scores. Scale shape: the corpus first SHRINKS to one row per DISTINCT
  * score (partial-aggregated groupBy); the cumulative count over those
  * rows then comes from [[graft.ops.Prefix.globalOrder]]'s two-phase
  * range-partitioned prefix sum — NEVER a single-partition window. That
  * matters precisely when the shrink doesn't: a model emitting fully
  * continuous doubles (the probe's w·x scores) has |distinct| ≈ |corpus|,
  * and the former global-window layout put the whole corpus on one
  * reducer; the prefix discipline keeps every window bounded by
  * rows-per-range-partition at any distinct count.
  *
  * Portability: rank arithmetic stays EXACT-INTEGER throughout — the
  * numerator is doubled (2·R_pos = Σ p·(2·cum − c + 1)) so average ranks
  * never materialize as halves — and the published AUC is one IEEE
  * division of exact longs. Integer headroom: num2 ~ P·2·(P+N), safe to
  * ~10⁹ positives against ~10⁹ negatives. */
object Eval {

  /** Pearson correlation for every unordered pair of INTEGER-valued
    * feature columns — the feature-redundancy audit run before trusting a
    * probe's feature set. ONE partial-aggregated pass computes all exact
    * sufficient statistics (n, Σx, Σx², Σxy — integer-exact, so the
    * result is partitioning- and engine-portable); each pair's r is then
    * a fixed sequence of IEEE ops on those longs. NULL when either side
    * has zero variance. Headroom: n·Σxy must stay under 2⁶³ — with
    * features ~10³, safe to ~10¹² rows; quantize or sample beyond. */
  def correlationMatrix(df: DataFrame,
      feats: Seq[(String, Column)]): DataFrame = {
    require(feats.size >= 2, "correlationMatrix: at least two features")
    val pairs = for {
      i <- feats.indices; j <- feats.indices if i < j
    } yield (feats(i), feats(j))
    val aggs = (count(lit(1)).as("n") +:
      feats.flatMap { case (nm, c) =>
        val l = c.cast("long")
        Seq(sum(l).as(s"s_$nm"), sum(l * l).as(s"q_$nm"))
      }) ++ pairs.map { case ((na, ca), (nb, cb)) =>
        sum(ca.cast("long") * cb.cast("long")).as(s"p_${na}_$nb")
      }
    // the 1-row stats frame feeds one select per pair — checkpoint so the
    // corpus scan runs once, not once per pair
    val t = df.agg(aggs.head, aggs.tail: _*).localCheckpoint(eager = false)
    pairs.map { case ((na, _), (nb, _)) =>
      val va = col("n") * col(s"q_$na") - col(s"s_$na") * col(s"s_$na")
      val vb = col("n") * col(s"q_$nb") - col(s"s_$nb") * col(s"s_$nb")
      val num = col("n") * col(s"p_${na}_$nb") - col(s"s_$na") * col(s"s_$nb")
      t.select(lit(na).as("feat_a"), lit(nb).as("feat_b"), col("n"),
        when(va > 0 && vb > 0,
          num.cast("double") /
            (sqrt(va.cast("double")) * sqrt(vb.cast("double"))))
          .as("corr"))
    }.reduce(_ unionByName _)
  }

  /** One row: (n_pos, n_neg, auc) of `scoreCol` predicting boolean
    * `labelCol`; auc is NULL when either class is empty. */
  def auc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val agg = df
      .select(scoreCol.as("s"), labelCol.cast("int").cast("long").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    // cumulative count in score order via the two-phase distributed
    // prefix sum (scores are distinct after the shrink, so the order is
    // total); `__cum` is inclusive — exactly the former window's
    // RANGE-to-current-row semantics on a distinct key
    val ranked = graft.ops.Prefix.globalOrder(agg, Seq(col("s")), col("c"))
      .frame.withColumnRenamed("__cum", "cum")
    ranked
      .agg(
        sum(col("p") * (lit(2L) * col("cum") - col("c") + lit(1L))).as("num2"),
        sum(col("p")).as("n_pos"),
        (sum(col("c")) - sum(col("p"))).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("num2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))
  }

  /** Reliability (calibration) bins for a score predicting a boolean
    * label: equal-width bins over [min, max], per bin the count, mean
    * score and positive rate — the diagram that says whether a
    * classifier's scores MEAN anything as probabilities, next to [[auc]]
    * which only ranks. Portability: bin edges derive from the
    * deterministic min/max through one fixed op chain; the mean score
    * sums micro-floored integers (never raw doubles across partitions);
    * rates are single divisions. Degenerate all-equal scores collapse to
    * bin 0 (guarded — no zero-width division). */
  def calibrationBins(df: DataFrame, scoreCol: Column, labelCol: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins >= 2: $nBins")
    val s = df.select(scoreCol.as("s"), labelCol.cast("int").cast("long").as("y"))
    val mm = s.agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    val binned = s.crossJoin(mm) // 1-row
      .withColumn("bin",
        when(col("mx") > col("mn"),
          least(floor((col("s") - col("mn")) /
            ((col("mx") - col("mn")) / lit(nBins.toDouble))).cast("long"),
            lit(nBins - 1L)))
          .otherwise(0L))
    binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("s") * 1e6).cast("long")).as("_sm"),
        sum(col("y")).as("_p"))
      .select(col("bin"), col("n"),
        (col("_sm").cast("double") / col("n").cast("double") / 1e6)
          .as("mean_score"),
        (col("_p").cast("double") / col("n").cast("double")).as("pos_rate"))
      .orderBy(col("bin"))
  }

  /** Per-query retrieval metrics — NDCG@k and MRR@k of a `(qid, rank,
    * neighbor_id)` ranking against binary `(qid, neighbor_id)` relevance
    * judgments — the IR-eval layer that closes the retrieval stack (BM25
    * / kNN / hybrid produce rankings; this scores them).
    *
    * Portability discipline: each DCG term 1/log2(rank+1) floors to the
    * 1e-9 grid BEFORE the exact integer sum; IDCG@m is the same nano-term
    * prefix sum at m = min(n_rel, k); NDCG is ONE integer-ratio double
    * division and MRR is 1/first-relevant-rank exactly — both engines
    * reproduce every published bit (the [[graft.llm.Dsir]] λ
    * discipline). Queries with no relevant documents report NULL NDCG
    * and MRR 0.
    *
    * Scale shape: one broadcast semi-ish join (rankings are |Q|·k rows,
    * qrels per query bounded), one (qid) aggregation, and the IDCG
    * lookup is a k-entry literal array — nothing corpus-sized moves. */
  /** Team-draft interleaving (Radlinski, Kurup & Joachims 2008): merge
    * two rankers' lists per query into the single list an online
    * comparison serves — per round a deterministic md5 coin picks the
    * first-drafting team, each team drafts its highest-ranked not-yet-
    * picked candidate. Clicks attribute to the drafting team; this
    * operator produces the (qid, pos, doc_id, team) assignment that
    * attribution needs. `rounds` rounds ⇒ up to 2·rounds picks.
    *
    * Scale shape: both rankings are bounded (|Q| × k rows); one (qid)
    * aggregation collects each side's list, then the draft unrolls as
    * SCAN-SIDE projection steps (the mmrRerank column-per-step pattern —
    * no expression-tree blowup). Deterministic end-to-end: md5 coins,
    * rank-ordered lists, ties impossible (ids unique per list). */
  def teamDraft(rankA: DataFrame, rankB: DataFrame,
      rounds: Int = 3): DataFrame = {
    def side(r: DataFrame, tag: String) =
      r.groupBy(col("qid")).agg(
        sort_array(collect_list(struct(col("rank"), col("neighbor_id"))))
          .as(s"l$tag"))
    val lists = side(rankA, "a").join(side(rankB, "b"), Seq("qid"))
      .withColumn("la", transform(col("la"), x => x.getField("neighbor_id")))
      .withColumn("lb", transform(col("lb"), x => x.getField("neighbor_id")))
    // first unpicked element of `lst` given already-picked ids
    def draft(lst: Column, picked: Column): Column =
      element_at(filter(lst, x => !array_contains(picked, x)), 1)
    // empty picks array DERIVES its id type from the ranking's own id
    // column (slice(...,1,0) keeps the element type) — string/int ids
    // work, not just bigint
    val emptyPicks = slice(
      transform(col("la"), x => struct(x.as("id"), lit("A").as("team"))),
      1, 0)
    val stepped = (0 until rounds).foldLeft(
      lists.withColumn("picks", emptyPicks)) { (df, r) =>
      val coinA = graft.expr.Md5Prefix(
        concat(col("qid").cast("string"), lit(s":round$r")), 8) % 2 === 0
      val ids = transform(col("picks"), p => p.getField("id"))
      val p1 = when(coinA, draft(col("la"), ids))
        .otherwise(draft(col("lb"), ids))
      val t1 = when(coinA, lit("A")).otherwise(lit("B"))
      df.withColumn(s"p1_$r", p1).withColumn(s"t1_$r", t1)
        .withColumn("picks", concat(col("picks"),
          filter(array(struct(col(s"p1_$r").as("id"), col(s"t1_$r").as("team"))),
            p => p.getField("id").isNotNull)))
        .withColumn(s"p2_$r",
          when(col(s"t1_$r") === "A",
            draft(col("lb"), transform(col("picks"), p => p.getField("id"))))
          .otherwise(
            draft(col("la"), transform(col("picks"), p => p.getField("id")))))
        .withColumn(s"t2_$r",
          when(col(s"t1_$r") === "A", lit("B")).otherwise(lit("A")))
        .withColumn("picks", concat(col("picks"),
          filter(array(struct(col(s"p2_$r").as("id"), col(s"t2_$r").as("team"))),
            p => p.getField("id").isNotNull)))
    }
    stepped.select(col("qid"), posexplode(col("picks")).as(Seq("pos0", "p")))
      .select(col("qid"), (col("pos0") + 1).cast("long").as("pos"),
        col("p.id").as("doc_id"), col("p.team").as("team"))
      .orderBy(col("qid"), col("pos"))
  }

  def retrievalMetrics(ranking: DataFrame, qrels: DataFrame,
      k: Int): DataFrame = {
    val term = (r: Column) => floor(lit(1e9) / log2(r.cast("double") + 1))
      .cast("long")
    // distinct the judgments: a raw judgment log can carry duplicate
    // (qid, neighbor_id) rows, which would fan out the left join
    // (double-counted DCG terms) and inflate n_rel
    val relKeys = qrels.select(col("qid"), col("neighbor_id")).distinct()
    val rel = relKeys.withColumn("rel", lit(1L))
    val scored = ranking.filter(col("rank") <= k)
      .join(rel, Seq("qid", "neighbor_id"), "left")
      .groupBy(col("qid"))
      .agg(
        sum(when(col("rel").isNotNull, term(col("rank"))).otherwise(0L))
          .as("dcg_nano"),
        min(when(col("rel").isNotNull, col("rank"))).as("first_rel"))
    val nRel = qrels.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    // IDCG prefix sums for m = 1..k as a literal array (engine-mirrored:
    // the same floor-then-integer-sum terms, just unrolled)
    val idcgArr = array((1 to k).map(m =>
      (1 to m).map(i => term(lit(i)).cast("long")).reduce(_ + _)): _*)
    scored.join(nRel, Seq("qid"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("idcg_nano",
        when(col("n_rel") > 0,
          element_at(idcgArr, least(col("n_rel"), lit(k.toLong)).cast("int")))
          .otherwise(lit(null)))
      .select(col("qid"), col("n_rel"),
        (col("dcg_nano").cast("double") / col("idcg_nano").cast("double"))
          .as("ndcg"),
        coalesce(lit(1.0) / col("first_rel").cast("double"), lit(0.0))
          .as("mrr"))
      .orderBy(col("qid"))
  }
}
