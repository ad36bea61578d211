package graft

/** DuckDB oracle SQL for every oracle-able entry in [[Queries.all]] —
  * identical column names/aliases and a total deterministic ORDER BY on
  * both sides (the driver sorts columns by name and hashes values).
  * Split from the catalog so the two can grow independently; the shared
  * fragments below mirror the Scala operators they verify, with the
  * mirrored file:line noted where the pairing is not obvious.
  *
  * ETL queries use the round-trip oracle pattern: the envelope branch
  * taken by a row is a pure function of `event_id` (see
  * [[graft.etl.EnvelopeGen]]), so DuckDB predicts the pipeline output
  * arithmetically; the branch predicates are quoted verbatim here.
  */
object Oracles {

  // --- shared SQL fragments (must mirror EnvelopeGen's branch rules) ---
  private val uidAbsentSql = "(event_id % 7 = 0 OR event_id % 19 = 0)"
  /** numeric-uid rows fail `is.nonEmptyString` — no user_id for validation */
  private val uidNonStringSql = s"($uidAbsentSql OR event_id % 23 = 0)"
  private val devAbsentSql = "(event_id % 5 = 0 OR event_id % 19 = 0)"
  private val validSql =
    s"NOT (event_id % 13 = 0) AND NOT (event_id % 17 = 0) AND NOT ($uidNonStringSql AND $devAbsentSql)"
  /** user_properties stays a STRING (no identify split possible): op/data +
    * stringified (id%6=0, B3) or bare + stringified (id%18=13, O5 gated on
    * Fields). */
  private val upStringSql = "(event_id % 6 = 0 OR event_id % 18 = 13)"
  /** identify split triggers: signup AND user_properties actually parsed to
    * an object. */
  private val trigSql = s"(event_type = 'signup' AND NOT $upStringSql)"
  private val tsFmtSql = "'%Y-%m-%dT%H:%M:%S.%gZ'"

  private def viaStr(expr: String) = s"CAST(CAST($expr AS VARCHAR) AS DOUBLE)"
  private val decSum = (c: String) => viaStr(s"sum(CAST($c AS DECIMAL(18,6)))")
  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))"

  // --- LLM-layer shared fragments (mirror graft.llm column semantics) ---
  private val wordsSql = """regexp_split_to_array(lower(trim(text)), '\s+')"""

  /** Unrolled k-core peeling mirror over the label-blocked cosine pair
    * graph (the q_pagerank/q_kmeans fixed-iteration convention). */
  private def kcoreSql(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH pr AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM embeddings a JOIN embeddings b
      |    ON a.label = b.label AND a.vec_id < b.vec_id
      |  WHERE ${dotSql("a.embedding", "b.embedding")} /
      |      (sqrt(${dotSql("a.embedding", "a.embedding")}) *
      |       sqrt(${dotSql("b.embedding", "b.embedding")})) >= 0.4),
      |e0 AS (SELECT id_a AS a, id_b AS b FROM pr)""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s""",
      |d$t AS (
      |  SELECT id, count(*) AS degree FROM (
      |    SELECT a AS id FROM e${t - 1} UNION ALL SELECT b FROM e${t - 1}) z
      |  GROUP BY id),
      |s$t AS (SELECT id FROM d$t WHERE degree >= $k),
      |e$t AS (
      |  SELECT a, b FROM e${t - 1}
      |  WHERE a IN (SELECT id FROM s$t) AND b IN (SELECT id FROM s$t))""".stripMargin
    }
    sb ++= s"""
      |SELECT id AS node_id, count(*) AS degree FROM (
      |  SELECT a AS id FROM e$iters UNION ALL SELECT b FROM e$iters) z
      |GROUP BY id ORDER BY node_id""".stripMargin
    sb.result()
  }

  /** Markov removal-effect attribution mirror: the exact transition
    * extraction windows, then 12 unrolled integer value-iteration rounds
    * (1e-9 grid, floor division — [[llm.Graph.pagerank]] discipline) per
    * variant: base chain + one chain per removed channel. */
  private lazy val markovSql: String = {
    val touch = Seq("view", "click")
    val states = ("START" +: touch) ++ Seq("CONV", "NULL")
    val stList = states.map("'" + _ + "'").mkString(", ")
    val iters = 12
    def chain(tag: String, removedCh: Option[String]): String = {
      val tcDef = removedCh match {
        case None =>
          s"""t$tag AS (
             |  SELECT src, dst, CAST(sum(c) AS BIGINT) AS c
             |  FROM tc GROUP BY 1, 2)""".stripMargin
        case Some(x) =>
          s"""t$tag AS (
             |  SELECT src, CASE WHEN dst = '$x' THEN 'NULL' ELSE dst END AS dst,
             |    CAST(sum(c) AS BIGINT) AS c
             |  FROM tc WHERE src <> '$x' GROUP BY 1, 2)""".stripMargin
      }
      val tot =
        s"""tt$tag AS (
           |  SELECT src, CAST(sum(c) AS BIGINT) AS tot FROM t$tag GROUP BY 1)""".stripMargin
      val v0 =
        s"""v${tag}0 AS (
           |  SELECT state, CAST(CASE WHEN state = 'CONV' THEN 1000000000
           |    ELSE 0 END AS BIGINT) AS v FROM stt)""".stripMargin
      val its = (1 to iters).map { i =>
        s"""v$tag$i AS (
           |  SELECT s.state, CAST(CASE WHEN s.state = 'CONV' THEN 1000000000
           |    WHEN s.state = 'NULL' THEN 0
           |    ELSE coalesce((SELECT CAST(sum(t.c * v.v) AS BIGINT)
           |        FROM t$tag t JOIN v$tag${i - 1} v ON v.state = t.dst
           |        WHERE t.src = s.state), 0)
           |      // coalesce((SELECT tot FROM tt$tag WHERE src = s.state), 1)
           |    END AS BIGINT) AS v
           |  FROM stt s)""".stripMargin
      }
      (Seq(tcDef, tot, v0) ++ its).mkString(",\n")
    }
    val chains = (chain("b", None) +:
      touch.map(x => chain(s"r$x", Some(x)))).mkString(",\n")
    val resRows = touch.sorted.map { x =>
      s"""SELECT '$x' AS channel,
         |    (SELECT v FROM vb$iters WHERE state = 'START') AS vb,
         |    (SELECT v FROM vr$x$iters WHERE state = 'START') AS vx""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN event_type = 'purchase' THEN 'CONV'
       |      ELSE event_type END AS st
       |  FROM events
       |  WHERE event_type IN (${(touch :+ "purchase").map("'" + _ + "'").mkString(", ")})),
       |seg AS (
       |  SELECT *, sum(CASE WHEN st = 'CONV' THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |    - CASE WHEN st = 'CONV' THEN 1 ELSE 0 END AS seg
       |  FROM ev),
       |nx AS (
       |  SELECT *,
       |    lead(st) OVER (PARTITION BY user_id, seg ORDER BY ts, event_id) AS nxt,
       |    row_number() OVER (PARTITION BY user_id, seg ORDER BY ts, event_id) AS rn
       |  FROM seg),
       |tr0 AS (
       |  SELECT st AS src, coalesce(nxt, 'NULL') AS dst FROM nx WHERE st <> 'CONV'
       |  UNION ALL
       |  SELECT 'START', st FROM nx WHERE rn = 1),
       |tc AS (SELECT src, dst, count(*) AS c FROM tr0 GROUP BY 1, 2),
       |stt AS (SELECT unnest([$stList]) AS state),
       |$chains,
       |res AS (
       |  $resRows),
       |r2 AS (
       |  SELECT channel, CAST(CASE WHEN vb = 0 THEN 0
       |    ELSE (greatest(vb - vx, 0) * 1000000) // vb END AS BIGINT)
       |    AS removal_ppm
       |  FROM res)
       |SELECT channel, removal_ppm,
       |  CASE WHEN CAST(sum(removal_ppm) OVER () AS BIGINT) = 0 THEN NULL
       |    ELSE removal_ppm::DOUBLE
       |      / CAST(sum(removal_ppm) OVER () AS BIGINT)::DOUBLE END AS share
       |FROM r2 ORDER BY channel""".stripMargin
  }

  /** SCD2 full-recompute CTE chain (ends at `v`) — shared by q_scd2,
    * q_scd2_incr and the q_scd2_lookup temporal join. */
  private val scd2Ctes =
    """WITH o AS (
      |  SELECT user_id, ts, event_type, event_id,
      |    lag(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |c AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type),
      |v AS (
      |  SELECT user_id, event_type AS state, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS valid_to,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS version
      |  FROM c)""".stripMargin

  /** SCD2 full-recompute mirror — the incrementally-maintained table must
    * be indistinguishable from it. */
  private val scd2Sql =
    s"""$scd2Ctes
      |SELECT user_id, state, valid_from, valid_to,
      |  (valid_to IS NULL) AS is_current, version
      |FROM v ORDER BY user_id, version""".stripMargin
  /** Distinct word w-shingles — DuckDB list comprehension mirroring
    * [[llm.Dedup.shingles]] (slice [i+1, i+w], i ∈ [0, n-w]). */
  /** Shared CTEs for the q_quantile_* mirrors: events rows hashed by the
    * md5-14-hex-prefix idiom ([[graft.expr.Md5Prefix]]) and bottom-k'd per
    * event_type — the exact [[graft.llm.Sketch.quantileBuild]] chain. */
  private val quantileSketchCtes: String =
    """WITH s AS (
      |  SELECT event_type AS grp,
      |    CAST(concat('0x',
      |      substring(md5(CAST(event_id AS VARCHAR)), 1, 14)) AS BIGINT) AS h,
      |    CAST(value AS DOUBLE) AS v
      |  FROM events),
      |b AS (
      |  SELECT grp, h, v,
      |    row_number() OVER (PARTITION BY grp ORDER BY h, v) AS rnk
      |  FROM s),
      |kk AS (SELECT grp, h, v FROM b WHERE rnk <= 256)""".stripMargin

  private val QLongMax = "9223372036854775807"

  /** Thresholded-build mirror ([[graft.llm.Sketch.quantileBuildT]]): the
    * k+1 smallest hashes of `s` rows matching `where`; a saturated group's
    * (k+1)-th hash is the EXCLUSIVE threshold, else Long.MaxValue. Emits
    * CTEs `<p>c`, `<p>tauT`, `<p>rows`, `<p>taus`. */
  private def qtBuildSql(p: String, where: String, k: Int): String =
    s"""${p}c AS (SELECT * FROM (
       |    SELECT grp, h, v,
       |      row_number() OVER (PARTITION BY grp ORDER BY h, v) AS rnk
       |    FROM s WHERE $where) z WHERE rnk <= ${k + 1}),
       |${p}tauT AS (
       |  SELECT grp,
       |    coalesce(max(CASE WHEN rnk = ${k + 1} THEN h END), $QLongMax) AS tau
       |  FROM ${p}c GROUP BY grp),
       |${p}rows AS (SELECT c.grp, c.h, c.v FROM ${p}c c
       |  JOIN ${p}tauT t USING (grp) WHERE c.h < t.tau),
       |${p}taus AS (SELECT grp, tau FROM ${p}tauT)""".stripMargin

  /** Theta-union mirror ([[graft.llm.Sketch.quantileMergeT]]): cut both
    * samples to the pairwise-least threshold, re-trim to k, thresholds
    * compose. Emits `<p>tau0`, `<p>cand`, `<p>c`, `<p>tauT`, `<p>rows`,
    * `<p>taus`. */
  private def qtMergeSql(p: String, lRows: String, lTaus: String,
      rRows: String, rTaus: String, k: Int): String =
    s"""${p}tau0 AS (
       |  SELECT coalesce(l.grp, r.grp) AS grp,
       |    least(coalesce(l.tau, $QLongMax), coalesce(r.tau, $QLongMax)) AS tau0
       |  FROM $lTaus l FULL JOIN $rTaus r ON l.grp = r.grp),
       |${p}cand AS (
       |  SELECT u.grp, u.h, u.v, t.tau0 FROM
       |    (SELECT grp, h, v FROM $lRows
       |     UNION ALL SELECT grp, h, v FROM $rRows) u
       |  JOIN ${p}tau0 t ON t.grp = u.grp WHERE u.h < t.tau0),
       |${p}c AS (SELECT * FROM (
       |    SELECT grp, h, v, tau0,
       |      row_number() OVER (PARTITION BY grp ORDER BY h, v) AS rnk
       |    FROM ${p}cand) z WHERE rnk <= ${k + 1}),
       |${p}tauT AS (
       |  SELECT grp,
       |    coalesce(max(CASE WHEN rnk = ${k + 1} THEN h END), max(tau0)) AS tau
       |  FROM ${p}c GROUP BY grp),
       |${p}rows AS (SELECT c.grp, c.h, c.v FROM ${p}c c
       |  JOIN ${p}tauT t USING (grp) WHERE c.h < t.tau),
       |${p}taus AS (
       |  SELECT t0.grp, coalesce(tt.tau, t0.tau0) AS tau
       |  FROM ${p}tau0 t0 LEFT JOIN ${p}tauT tt ON tt.grp = t0.grp)""".stripMargin

  /** Shared estimate tail for the q_quantile_* mirrors: the order
    * statistic at rank ceil(q·m) (clamped ≥ 1) in (v, h) order over the
    * sample CTE `rowsCte` (grp, h, v), one row per (group, panel entry) —
    * the [[graft.llm.Sketch.quantileEstimate]] chain. The rank
    * arithmetic and the (v, h) tie-break live HERE once; every quantile
    * mirror appends this tail. */
  private def qEstimateSql(rowsCte: String, panel: Seq[(String, String)],
      okCol: String): String = {
    val values = panel
      .map { case (l, q) => s"('$l', CAST($q AS DOUBLE))" }.mkString(",\n  ")
    s"""m AS (SELECT grp, count(*) AS m FROM $rowsCte GROUP BY grp),
       |r AS (SELECT grp, h, v,
       |    row_number() OVER (PARTITION BY grp ORDER BY v, h) AS rv
       |  FROM $rowsCte),
       |p(qlabel, q) AS (VALUES $values)
       |SELECT r.grp, p.qlabel, p.q, r.v AS est_value, TRUE AS $okCol
       |FROM r JOIN m USING (grp)
       |JOIN p ON r.rv = greatest(CAST(1 AS BIGINT),
       |  CAST(ceil(p.q * m.m) AS BIGINT))
       |ORDER BY grp, qlabel""".stripMargin
  }

  private val qPanel3 =
    Seq("p50" -> "0.5", "p90" -> "0.9", "p99" -> "0.99")

  /** q_quantile_sketch's full mirror — q_quantile_merge shares it
    * VERBATIM (merge of disjoint shard sketches ≡ the full rebuild,
    * bit-identical; the shared string IS the stated contract). */
  private val quantileSketchOracle: String =
    s"""$quantileSketchCtes,
       |${qEstimateSql("kk", qPanel3, "rank_within_12pct")}""".stripMargin

  private def shingleWSql(w: Int): String =
    s"""CASE WHEN len($wordsSql) >= $w
       |    THEN [array_to_string(($wordsSql)[i:i+${w - 1}], ' ')
       |          FOR i IN range(1, len($wordsSql) - ${w - 2})]
       |    ELSE [array_to_string($wordsSql, ' ')] END""".stripMargin
  private val shingleSql = shingleWSql(3)

  /** DSIR CTEs mirroring [[llm.Dsir]]: positional unigram+bigram gram
    * stream, md5-prefix buckets mod 256, Laplace(+1) per-bucket log-ratios
    * on the 1e-9 grid, exact integer nano-sums per doc. Target = English
    * docs, raw = full corpus. */
  private val dsirCtes: String =
    s"""WITH w AS (
       |  SELECT doc_id, lang, $wordsSql AS ws FROM documents),
       |g AS (
       |  SELECT doc_id, lang, unnest(list_concat(ws,
       |    CASE WHEN len(ws) >= 2
       |      THEN [array_to_string(ws[i:i+1], ' ') FOR i IN range(1, len(ws))]
       |      ELSE [] END)) AS gram
       |  FROM w),
       |b AS (
       |  SELECT doc_id, lang,
       |    CAST(concat('0x', substring(md5(gram), 1, 8)) AS BIGINT) % 256 AS bucket
       |  FROM g),
       |rcn AS (SELECT bucket, count(*) AS rc FROM b GROUP BY 1),
       |tcn AS (SELECT bucket, count(*) AS tc FROM b WHERE lang = 'en' GROUP BY 1),
       |tot AS (SELECT (SELECT count(*) FROM b) AS rt,
       |               (SELECT count(*) FROM b WHERE lang = 'en') AS tt),
       |lam AS (
       |  SELECT r.range AS bucket,
       |    CAST(floor(ln(
       |      ((coalesce(tc, 0) + 1)::DOUBLE / (coalesce(rc, 0) + 1)::DOUBLE) *
       |      ((rt + 256)::DOUBLE / (tt + 256)::DOUBLE)) * 1e9) AS BIGINT)
       |      AS lam_nano
       |  FROM range(256) r
       |  LEFT JOIN rcn ON rcn.bucket = r.range
       |  LEFT JOIN tcn ON tcn.bucket = r.range, tot),
       |sc AS (
       |  SELECT doc_id, count(*) AS n_grams,
       |    CAST(sum(lam_nano) AS BIGINT) AS score_nano
       |  FROM b JOIN lam USING (bucket) GROUP BY 1)""".stripMargin

  /** Winnowing fingerprint CTEs (k=3, w=4) mirroring
    * [[llm.Fingerprint.winnow]]: positional 3-gram md5-prefix hashes,
    * rightmost window min, fp·2^20+pos encoding for the struct-free
    * distinct. */
  /** Shared CTE chain for the ExactSubstr span mirror
    * ([[llm.Dedup.duplicatedSpans]]): positional 20-token windows →
    * doc-distinct df prune → covered starts → islands (CTE `g`). `tail`
    * is the final SELECT, or further CTEs + SELECT with `extraCte`. */
  private def dedupSpansSql(tail: String, extraCte: Boolean = false,
      pWhere: String = "TRUE",
      dupCte: String =
        """dup AS (SELECT win FROM p GROUP BY win
          |        HAVING count(DISTINCT doc_id) BETWEEN 2 AND 1000)"""
          .stripMargin): String =
    s"""WITH w AS (
       |  SELECT doc_id, $wordsSql AS ws FROM documents),
       |p0 AS (
       |  SELECT doc_id, len(ws) AS n,
       |    unnest(CASE WHEN len(ws) >= 20
       |      THEN [{'pos': i - 1, 'win': array_to_string(ws[i:i+19], ' ')}
       |            FOR i IN range(1, len(ws) - 18)]
       |      ELSE [{'pos': CAST(0 AS BIGINT),
       |             'win': array_to_string(ws, ' ')}] END) AS u
       |  FROM w WHERE $pWhere),
       |p AS (SELECT doc_id, n, u.pos AS pos, u.win AS win FROM p0),
       |$dupCte,
       |h AS (SELECT p.doc_id, p.n, p.pos FROM p JOIN dup USING (win)),
       |isl AS (
       |  SELECT doc_id, n, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |              <= 20 THEN 0 ELSE 1 END AS brk
       |  FROM h),
       |g AS (
       |  SELECT doc_id, n, pos,
       |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM isl)${if (extraCte) "," else ""}
       |$tail""".stripMargin

  /** Benchmark-side distinct window set for the surgical-decontam
    * mirrors: every 20-token window (with the short-doc whole-text
    * fallback) of the benchmark split. */
  private val decontamDupCte: String =
    """bw0 AS (
      |  SELECT unnest(CASE WHEN len(ws) >= 20
      |    THEN [array_to_string(ws[i:i+19], ' ')
      |          FOR i IN range(1, len(ws) - 18)]
      |    ELSE [array_to_string(ws, ' ')] END) AS win
      |  FROM w WHERE doc_id % 50 = 0),
      |dup AS (SELECT DISTINCT win FROM bw0)""".stripMargin

  private val winnowCtes: String =
    s"""WITH wd AS (
       |  SELECT doc_id, $wordsSql AS words FROM documents),
       |g AS (
       |  SELECT doc_id, list_transform(
       |    CASE WHEN len(words) >= 3
       |      THEN [array_to_string(words[i:i+2], ' ')
       |            FOR i IN range(1, len(words) - 1)]
       |      ELSE [array_to_string(words, ' ')] END,
       |    s -> CAST(concat('0x', substring(md5(s), 1, 8)) AS BIGINT)) AS h
       |  FROM wd),
       |f AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [ list_min(h[(CASE WHEN e >= 4 THEN e - 3 ELSE 1 END):e]) * 1048576
       |      + e - list_position(
       |          list_reverse(h[(CASE WHEN e >= 4 THEN e - 3 ELSE 1 END):e]),
       |          list_min(h[(CASE WHEN e >= 4 THEN e - 3 ELSE 1 END):e])) + 1
       |      FOR e IN range(CASE WHEN len(h) >= 4 THEN 4 ELSE len(h) END,
       |                     len(h) + 1) ])) AS sel
       |  FROM g)""".stripMargin

  /** Independent component labeling over the all-pairs exact-Jaccard graph
    * (recursive-CTE transitive closure, label = min reachable id). Shared
    * by q_dedup_clusters and q_dedup_incr_clusters: the incremental path's
    * whole claim is that it matches this full recompute. */
  private def clusterCtesWhere(where: String): String =
    s"""WITH RECURSIVE e AS (
       |  SELECT doc_id, unnest(list_distinct($shingleSql)) AS h
       |  FROM documents $where),
       |sz AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
       |c AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b FROM c
       |  JOIN sz sa ON sa.doc_id = id_a
       |  JOIN sz sb ON sb.doc_id = id_b
       |  WHERE c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE >= 0.6),
       |edges AS (
       |  SELECT id_a AS s, id_b AS d FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT reach.id, e2.d FROM reach JOIN edges e2 ON e2.s = reach.r)""".stripMargin

  private lazy val clusterCtes: String = clusterCtesWhere("")

  private def clustersSqlWhere(where: String): String =
    s"""${clusterCtesWhere(where)}
       |SELECT id AS doc_id, min(r) AS cluster_id
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  private lazy val clustersSql: String = clustersSqlWhere("")

  /** Perceptual media near-dup chain, shared by q_media_neardup and its
    * cluster composition: byte-bucket histogram features (the
    * q_media_features CTE — bit-exact count/n division) over corpus ∪
    * planted re-encodes (text doubled: histogram invariant, digest
    * different), quantized to 8 bits, 4 bands of 4 coords packed
    * radix-65536 in [[graft.llm.Multimodal.dedupNear]]'s fold order,
    * candidates = band-exact matches, scores = sequential-fold cosine.
    * WITH RECURSIVE up front so the cluster tail can extend the chain. */
  private def mediaNearDupCtesWhere(where: String): String = {
    val dot = dotSql("fa.fv", "fb.fv")
    val naa = dotSql("fa.fv", "fa.fv")
    val nbb = dotSql("fb.fv", "fb.fv")
    s"""WITH RECURSIVE c AS (
       |  SELECT doc_id AS media_id, text FROM documents WHERE $where
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || text FROM documents
       |  WHERE doc_id < 20),
       |b AS (
       |  SELECT media_id, hex(encode(text)) AS hx,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM c),
       |e AS (SELECT media_id, unnest(range(0, n_bytes)) AS i, hx FROM b),
       |h AS (
       |  SELECT media_id,
       |    ((strpos('0123456789ABCDEF', substr(hx, CAST(i * 2 + 1 AS INT), 1)) - 1) * 16
       |      + (strpos('0123456789ABCDEF', substr(hx, CAST(i * 2 + 2 AS INT), 1)) - 1)) % 16 AS bucket,
       |    count(*) AS cnt
       |  FROM e GROUP BY 1, 2),
       |g AS (
       |  SELECT media_id, n_bytes, CAST(unnest(range(0, 16)) AS INT) AS bucket
       |  FROM b),
       |f AS (
       |  SELECT g.media_id,
       |    list(COALESCE(h.cnt, 0)::DOUBLE / greatest(g.n_bytes, 1)::DOUBLE
       |      ORDER BY g.bucket) AS fv
       |  FROM g LEFT JOIN h ON g.media_id = h.media_id AND g.bucket = h.bucket
       |  GROUP BY g.media_id),
       |q AS (
       |  SELECT media_id, fv,
       |    list_transform(fv, x -> CAST(floor(x * 256.0) AS BIGINT)) AS qv
       |  FROM f),
       |bands AS (
       |  SELECT media_id, band,
       |    qv[band * 4 + 1] * 281474976710656 + qv[band * 4 + 2] * 4294967296
       |      + qv[band * 4 + 3] * 65536 + qv[band * 4 + 4] AS band_hash
       |  FROM q, (SELECT CAST(unnest(range(0, 4)) AS INT) AS band)),
       |cand AS (
       |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_hash = b.band_hash
       |      AND a.media_id < b.media_id),
       |scored AS (
       |  SELECT cand.id_a, cand.id_b,
       |    $dot / (sqrt($naa) * sqrt($nbb)) AS score
       |  FROM cand
       |  JOIN q fa ON fa.media_id = cand.id_a
       |  JOIN q fb ON fb.media_id = cand.id_b)""".stripMargin
  }

  private lazy val mediaNearDupCtes: String = mediaNearDupCtesWhere("TRUE")

  /** The pair-list tail shared by the batch build and the streamed form
    * (state == corpus ⇒ identical recompute). */
  private lazy val mediaNearDupSql: String =
    s"""$mediaNearDupCtes
       |SELECT id_a, id_b, score FROM scored
       |WHERE score >= 0.9995 ORDER BY id_a, id_b""".stripMargin

  /** Unrolled 3-iteration integer PageRank over the exact-Jaccard ≥ 0.6
    * edge set — mirrors [[llm.Graph.pagerank]]'s floor-division micro-unit
    * updates exactly (no floats on either engine). */
  private lazy val pagerankSql: String = {
    val iters = (1 to 3).map { i =>
      s"""c$i AS (
         |  SELECT ed.dst, CAST(sum(s${i - 1}.s // deg.deg) AS BIGINT) AS inc
         |  FROM ed JOIN s${i - 1} ON s${i - 1}.id = ed.src
         |  JOIN deg ON deg.src = ed.src GROUP BY 1),
         |s$i AS (
         |  SELECT n.id,
         |    CAST(150000 + (85 * coalesce(c$i.inc, 0)) // 100 AS BIGINT) AS s
         |  FROM n LEFT JOIN c$i ON c$i.dst = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT doc_id, unnest(list_distinct($shingleSql)) AS h
       |  FROM documents),
       |sz AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
       |c AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b FROM c
       |  JOIN sz sa ON sa.doc_id = id_a
       |  JOIN sz sb ON sb.doc_id = id_b
       |  WHERE c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE >= 0.6),
       |ed AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |       UNION ALL SELECT id_b, id_a FROM pairs),
       |deg AS (SELECT src, count(*) AS deg FROM ed GROUP BY 1),
       |n AS (SELECT DISTINCT doc_id AS id FROM documents),
       |s0 AS (SELECT id, CAST(1000000 AS BIGINT) AS s FROM n),
       |$iters
       |SELECT n.id AS doc_id, s3.s AS rank_micro,
       |  CAST(coalesce(deg.deg, 0) AS BIGINT) AS degree
       |FROM n JOIN s3 ON s3.id = n.id
       |LEFT JOIN deg ON deg.src = n.id
       |ORDER BY doc_id""".stripMargin
  }

  /** All-pairs exact-Jaccard truth for incremental (batch ≥ 250 vs corpus
    * < 250) near-dup detection — shared by the inline and prebuilt-table
    * catalog forms, which must be indistinguishable. The `where` variant
    * mirrors the deletion-maintained band/shingle tables: the truth over
    * corpus ∖ deleted. */
  private def incrNearTruthSqlWhere(where: String) =
    s"""WITH e AS (
       |  SELECT doc_id, unnest(list_distinct($shingleSql)) AS h
       |  FROM documents $where),
       |sz AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
       |c AS (
       |  SELECT a.doc_id AS id_new, b.doc_id AS id_other, count(*) AS c
       |  FROM e a JOIN e b ON a.h = b.h
       |    AND a.doc_id >= 250
       |    AND (b.doc_id < 250 OR a.doc_id < b.doc_id)
       |    AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_new, id_other,
       |  c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE AS jaccard
       |FROM c
       |JOIN sz sa ON sa.doc_id = id_new
       |JOIN sz sb ON sb.doc_id = id_other
       |WHERE c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE >= 0.6
       |ORDER BY id_new, id_other""".stripMargin

  private lazy val incrNearTruthSql = incrNearTruthSqlWhere("")

  /** Sequential left-to-right double dot product (list_reduce, NOT list_sum,
    * so the fold order matches Spark's aggregate()). */
  private def dotSql(a: String, b: String) =
    s"list_reduce(list_transform(list_zip($a, $b), t -> t[1]::DOUBLE * t[2]::DOUBLE), (x, y) -> x + y)"
  private val dotQv = dotSql("qv", "embedding")
  private val dotQq = dotSql("qv", "qv")
  private val dotVv = dotSql("embedding", "embedding")
  /** MMR mirror: brute top-20 shortlist, then 5 unrolled greedy steps —
    * per step an anti-join against the picked union, the correlated
    * max-cosine to the picked set, and the (0.5·ms − 0.5·rel, nid)
    * argmin (= MMR argmax, Spark's exact key expression). */
  private lazy val mmrSql: String = {
    val simCS = s"${dotSql("c.nvec", "s.nvec")} / (c.nn * s.nn)"
    def selU(t: Int): String =
      (1 until t).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    val steps = (2 to 5).map { t =>
      s"""s${t}pre AS (
         |  SELECT c.qid, c.nid, c.nvec, c.nn, c.rel,
         |    (SELECT max($simCS) FROM (${selU(t)}) s WHERE s.qid = c.qid)
         |      AS ms
         |  FROM cand c ANTI JOIN (${selU(t)}) p
         |    ON p.qid = c.qid AND p.nid = c.nid),
         |s$t AS (
         |  SELECT qid, nid, nvec, nn FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY 0.5 * ms - 0.5 * rel, nid) rn FROM s${t}pre)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to 5)
      .map(t => s"SELECT qid, $t AS t, nid FROM s$t")
      .mkString("\nUNION ALL\n")
    s"""WITH q AS (
       |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |  WHERE vec_id < 10),
       |sc AS (
       |  SELECT qid, vec_id AS nid, embedding AS nvec, sqrt($dotVv) AS nn,
       |    $dotQv / (sqrt($dotQq) * sqrt($dotVv)) AS rel
       |  FROM embeddings, q WHERE qid <> vec_id),
       |cand AS (SELECT * FROM (
       |  SELECT qid, nid, nvec, nn, rel,
       |    row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) rnk
       |  FROM sc) WHERE rnk <= 20),
       |s1 AS (
       |  SELECT qid, nid, nvec, nn FROM (
       |    SELECT c.*, row_number() OVER (PARTITION BY qid
       |      ORDER BY 0.5 * 0.0 - 0.5 * rel, nid) rn
       |    FROM cand c) WHERE rn = 1),
       |$steps
       |SELECT qid, CAST(t AS BIGINT) AS mmr_rank, nid AS neighbor_id
       |FROM ($out)
       |ORDER BY qid, mmr_rank""".stripMargin
  }

  /** TF-IDF more-like-this CTE chain, ending in `mlt`(qid, rank, nid,
    * sim) — shared by q_more_like_this and the team-draft interleave. */
  private lazy val mltCtes: String =
    """w0 AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
      |  FROM documents),
      |ww AS (SELECT * FROM w0 WHERE term <> ''),
      |tfm AS (SELECT doc_id, term, count(*) AS tf FROM ww GROUP BY 1, 2),
      |dfr AS (
      |  SELECT term, count(*) AS df FROM tfm GROUP BY term
      |  HAVING count(*) BETWEEN 2 AND 1000),
      |nn AS (SELECT count(*) AS n_docs FROM documents),
      |wgt AS (
      |  SELECT tfm.doc_id, tfm.term,
      |    tfm.tf::DOUBLE * (ln((nn.n_docs + 1.0) / (dfr.df + 1.0)) + 1.0)
      |      AS w
      |  FROM tfm JOIN dfr USING (term), nn),
      |w2 AS (
      |  SELECT doc_id, term, w,
      |    CAST(floor(w * w * 1e6) AS BIGINT) AS w2m
      |  FROM wgt),
      |norms AS (
      |  SELECT doc_id, sum(w2m)::BIGINT AS n2 FROM w2 GROUP BY doc_id),
      |mp AS (
      |  SELECT a.doc_id AS qid, b.doc_id AS nid,
      |    sum(CAST(floor(a.w * b.w * 1e6) AS BIGINT))::BIGINT AS smicro
      |  FROM w2 a JOIN w2 b
      |    ON a.term = b.term AND a.doc_id <> b.doc_id
      |  WHERE a.doc_id < 10 GROUP BY 1, 2),
      |msc AS (
      |  SELECT qid, nid,
      |    smicro::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE))
      |      AS sim
      |  FROM mp JOIN norms na ON na.doc_id = qid
      |    JOIN norms nb ON nb.doc_id = nid),
      |mlt AS (
      |  SELECT *, row_number() OVER (PARTITION BY qid
      |    ORDER BY sim DESC, nid) AS rank FROM msc)""".stripMargin

  /** Shared CTEs for the contrastive-triplet rows: panel anchors,
    * same-label top-1 positives, label-mismatch top-3 hard negatives. */
  private lazy val tripletCtes: String =
    s"""WITH q AS (
       |  SELECT vec_id AS qid, label AS qlabel, embedding AS qv
       |  FROM embeddings WHERE vec_id < 5),
       |pos AS (
       |  SELECT qid, neighbor_id AS pos_id, score AS pos_score FROM (
       |    SELECT qid, vec_id AS neighbor_id,
       |      $dotQv / (sqrt($dotQq) * sqrt($dotVv)) AS score,
       |      row_number() OVER (PARTITION BY qid
       |        ORDER BY $dotQv / (sqrt($dotQq) * sqrt($dotVv)) DESC,
       |          vec_id) AS rank
       |    FROM embeddings, q
       |    WHERE qlabel = label AND qid <> vec_id)
       |  WHERE rank = 1),
       |neg AS (
       |  SELECT qid, rank AS neg_rank, neighbor_id AS neg_id,
       |    score AS neg_score FROM (
       |    SELECT qid, vec_id AS neighbor_id,
       |      $dotQv / (sqrt($dotQq) * sqrt($dotVv)) AS score,
       |      row_number() OVER (PARTITION BY qid
       |        ORDER BY $dotQv / (sqrt($dotQq) * sqrt($dotVv)) DESC,
       |          vec_id) AS rank
       |    FROM embeddings, q WHERE qlabel <> label)
       |  WHERE rank <= 3)""".stripMargin

  /** Exact brute-force cosine top-k — shared by q_knn_ivf,
    * q_knn_ivf_indexed AND q_knn_ivf_stream (full-probe IVF is exact by
    * construction, inline, served off prebuilt artifacts, or served off
    * the streamed merge-on-read state). `extra` filters BOTH the corpus
    * and the query panel to the live rows (the erasure variant). */
  private def knnIvfSqlWhere(extra: String) =
    s"""WITH live AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE TRUE $extra),
       |q AS (
       |  SELECT vec_id AS qid, embedding AS qv FROM live
       |  WHERE vec_id < 10),
       |scored AS (
       |  SELECT qid, vec_id AS neighbor_id,
       |    $dotQv / (sqrt($dotQq) * sqrt($dotVv)) AS score
       |  FROM live, q WHERE qid <> vec_id),
       |ranked AS (
       |  SELECT qid, neighbor_id, score,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY score DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT qid, rank, neighbor_id, score FROM ranked
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  private lazy val knnIvfSql = knnIvfSqlWhere("")
  private def hitSql(words: Seq[String]) =
    s"len(list_filter($wordsSql, x -> list_contains([${words.map("'" + _ + "'").mkString(", ")}], x)))"
  private val langScoresSql = Seq(
    "en" -> llm.TextAnalysis.StopwordsEn, "fr" -> llm.TextAnalysis.StopwordsFr,
    "es" -> llm.TextAnalysis.StopwordsEs, "de" -> llm.TextAnalysis.StopwordsDe)
    .map { case (l, ws) => s"${hitSql(ws)} AS s_$l" }.mkString(",\n    ")
  private val cjkSql = """len(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g'))"""
  /** Mirrors [[llm.TextAnalysis.langId]]'s fold: earliest language in
    * (en,fr,es,de) order wins ties. */
  private val langCaseSql =
    s"""CASE WHEN $cjkSql > 0 AND $cjkSql * 5 > len(text) THEN 'zh'
       |    WHEN greatest(s_en, s_fr, s_es, s_de) = 0 THEN 'und'
       |    WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
       |    WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
       |    WHEN s_es >= s_de THEN 'es'
       |    ELSE 'de' END""".stripMargin

  /** The curation pipeline's CTE chain (language scores → langId → quality
    * signals → quality score → keep filter) over a given base relation.
    * Shared by q_curation (doubled corpus) and q_curation_neardup. */
  private def curatedCtes(fromRel: String): String =
    s"""sc AS (SELECT doc_id, text, $langScoresSql FROM $fromRel),
       |l AS (SELECT doc_id, text, $langCaseSql AS lang_pred FROM sc),
       |c AS (
       |  SELECT doc_id, text, lang_pred,
       |    CASE WHEN len($wordsSql) = 0 THEN 0.0
       |      ELSE len(list_filter($wordsSql, x -> list_contains([${llm.TextAnalysis.StopwordsEn.map("'" + _ + "'").mkString(", ")}], x)))::DOUBLE
       |        / len($wordsSql)::DOUBLE END AS stopword_ratio,
       |    len(text)::DOUBLE AS len_d,
       |    (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE AS punct_d,
       |    CASE WHEN len(text) = 0 THEN 0.0
       |      ELSE (len(text) - len(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
       |        / len(text)::DOUBLE END AS digit_ratio
       |  FROM l),
       |q AS (
       |  SELECT doc_id, text, lang_pred,
       |    least(len_d / 200.0, 1.0) * (CASE WHEN len_d > 2000 THEN 0.5 ELSE 1.0 END) * 0.3
       |    + (CASE WHEN punct_d / greatest(len_d, 1.0) > 0.2 THEN 0.3
       |        ELSE 1.0 - punct_d / greatest(len_d, 1.0) END) * 0.3
       |    + (1.0 - least(digit_ratio * 2.0, 1.0)) * 0.2
       |    + least(stopword_ratio * 5.0, 1.0) * 0.2 AS quality
       |  FROM c),
       |k AS (SELECT * FROM q WHERE lang_pred = 'en' AND quality >= 0.5)""".stripMargin

  /** [[curatedCtes]] + the near-dup canonical-survivor chain (exact
    * survivors, all-pairs Jaccard ≥ 0.6 graph, recursive-CTE components,
    * component min-id keeps): `nd` is the released corpus — one row per
    * surviving doc with (doc_id, quality, n_copies, text). Shared by
    * q_curation_neardup and q_release_pipeline (the composed release must
    * be byte-identical to the standalone stage). Caller must open with
    * WITH RECURSIVE (reach). */
  private def curationNdCtes(fromRel: String): String =
    s"""${curatedCtes(fromRel)},
       |surv AS (
       |  SELECT min(doc_id) AS doc_id, min(quality) AS quality,
       |    count(*) AS n_copies, min(text) AS text
       |  FROM k GROUP BY md5(text)),
       |se AS (SELECT doc_id, unnest(list_distinct($shingleSql)) AS h FROM surv),
       |ssz AS (SELECT doc_id, count(*) AS sz FROM se GROUP BY doc_id),
       |pc AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS cnt
       |  FROM se a JOIN se b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |prs AS (
       |  SELECT id_a, id_b FROM pc
       |  JOIN ssz sa ON sa.doc_id = id_a
       |  JOIN ssz sb ON sb.doc_id = id_b
       |  WHERE cnt::DOUBLE / (sa.sz + sb.sz - cnt)::DOUBLE >= 0.6),
       |edges AS (
       |  SELECT id_a AS s, id_b AS dd FROM prs
       |  UNION SELECT id_b, id_a FROM prs),
       |reach(id, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT reach.id, e2.dd FROM reach JOIN edges e2 ON e2.s = reach.r),
       |nd AS (
       |  SELECT * FROM surv
       |  WHERE doc_id NOT IN (
       |    SELECT id FROM reach GROUP BY id HAVING min(r) <> id))""".stripMargin

  val all: Map[String, String] = Map(
    "q_etl_decode" ->
      s"""SELECT event_id,
         |  CASE WHEN event_id % 13 = 0 THEN NULL ELSE event_type END AS event_type,
         |  CASE WHEN event_id % 17 = 0 THEN 0 ELSE epoch_ms(ts) END AS time_ms
         |FROM events ORDER BY event_id""".stripMargin,

    "q_etl_validate" ->
      s"""SELECT event_id,
         |  CASE WHEN $uidNonStringSql THEN NULL ELSE CAST(user_id AS VARCHAR) END AS user_id,
         |  CASE WHEN $devAbsentSql THEN NULL ELSE 'dev-' || CAST(user_id AS VARCHAR) END AS device_id
         |FROM events WHERE $validSql ORDER BY event_id""".stripMargin,

    "q_etl_repair_session" ->
      s"""SELECT event_id,
         |  CAST(CASE event_id % 4
         |    WHEN 0 THEN epoch_ms(ts) - 5000
         |    WHEN 1 THEN epoch_ms(ts) - 5000
         |    WHEN 2 THEN -1
         |    ELSE 0 END AS DOUBLE) AS session_id
         |FROM events WHERE $validSql ORDER BY event_id""".stripMargin,

    "q_etl_split_identify" ->
      s"""WITH valid AS (
         |  SELECT event_id, event_type, $trigSql AS trig
         |  FROM events WHERE $validSql)
         |SELECT event_id, '$$identify' AS event_type, TRUE AS is_identify, 0 AS seq
         |FROM valid WHERE trig
         |UNION ALL
         |SELECT event_id, event_type, FALSE AS is_identify,
         |  CASE WHEN trig THEN 1 ELSE 0 END AS seq
         |FROM valid
         |ORDER BY event_id, seq""".stripMargin,

    "q_etl_user_props" ->
      s"""SELECT event_id,
         |  CASE
         |    WHEN event_type = 'signup' AND NOT $upStringSql
         |      THEN '{"flow_id":"f' || CAST(event_id AS VARCHAR) || '"}'
         |    WHEN event_type = 'signup'
         |      THEN '"{\\"$$set\\":{\\"plan\\":\\"pro\\"},\\"flow_id\\":\\"f' || CAST(event_id AS VARCHAR) || '\\"}"'
         |    WHEN event_type = 'error' AND NOT $upStringSql
         |      THEN '{"$$unset":null,"ok":true}'
         |    WHEN event_type = 'error'
         |      THEN '"{\\"$$unset\\":null,\\"ok\\":true}"'
         |    ELSE NULL END AS user_properties
         |FROM events WHERE $validSql ORDER BY event_id""".stripMargin,

    "q_etl_dedup" ->
      s"""WITH valid AS (
         |  SELECT event_id, event_type, $trigSql AS trig
         |  FROM events WHERE $validSql)
         |SELECT event_id, '$$identify' AS event_type, TRUE AS is_identify
         |FROM valid WHERE trig
         |UNION ALL
         |SELECT event_id, event_type, FALSE AS is_identify FROM valid
         |ORDER BY event_id, is_identify DESC""".stripMargin,

    // repaired ⇔ valid AND session_id arrived as a string (id%4 in {1,2});
    // the reference logs the repair only after the validity gate passes.
    "q_etl_metrics" ->
      s"""SELECT count(*) AS input_count,
         |  (SELECT count(*) FROM events WHERE $validSql)
         |    + (SELECT count(*) FROM events WHERE $validSql AND $trigSql) AS output_count,
         |  count(*) - (SELECT count(*) FROM events WHERE $validSql) AS invalid_count,
         |  (SELECT count(*) FROM events WHERE $validSql AND event_id % 4 IN (1, 2))
         |    AS repaired_count,
         |  strftime(min(ts), $tsFmtSql) AS min_publish_time,
         |  strftime(max(ts), $tsFmtSql) AS max_publish_time
         |FROM events""".stripMargin,

    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${decSum("l_quantity")} AS sum_qty,
         |  ${decSum("l_extendedprice")} AS sum_base_price,
         |  ${viaStr("sum(" + discPrice + ")")} AS sum_disc_price,
         |  count(*) AS count_order,
         |  ${decSum("l_quantity")} / count(*) AS avg_qty,
         |  ${decSum("l_extendedprice")} / count(*) AS avg_price
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_top_customers" ->
      s"""SELECT c_custkey, c_name,
         |  ${decSum("o_totalprice")} AS revenue, count(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_custkey, c_name
         |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,

    // correlated scalar subquery written in its native SQL form — DuckDB
    // decorrelates it the same way the Spark side does by hand; the avg
    // threshold divides an exact decimal sum by the count on both engines
    "q_small_order_rev" ->
      s"""WITH pp AS (
         |  SELECT l_partkey AS pk,
         |    ${decSum("l_quantity")} / count(*) AS avg_qty
         |  FROM lineitem GROUP BY 1)
         |SELECT p_brand, ${decSum("l_extendedprice")} AS small_rev,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN pp ON l_partkey = pk
         |JOIN part ON l_partkey = p_partkey
         |WHERE l_quantity < 0.2 * avg_qty
         |GROUP BY 1 ORDER BY p_brand""".stripMargin,

    "q_priority_returns" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    // both sums exact decimal → the one double division is bit-identical
    "q_promo_share" ->
      s"""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         |  100.0 * ${viaStr("sum(CASE WHEN p_type = 'PROMO' THEN " + discPrice +
             " ELSE CAST(0 AS DECIMAL(18,6)) END)")}
         |    / ${viaStr("sum(" + discPrice + ")")} AS promo_share,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1 ORDER BY ship_month""".stripMargin,

    "q_supplier_breadth" ->
      """SELECT p_type, p_brand, count(DISTINCT l_suppkey) AS n_suppliers
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN
        |  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        |GROUP BY 1, 2 ORDER BY p_type, p_brand""".stripMargin,

    "q_region_revenue" ->
      s"""SELECT r_name, ${viaStr("sum(" + discPrice + ")")} AS revenue, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_rollup_revenue" ->
      s"""SELECT r_name, n_name,
         |  ${decSum("o_totalprice")} AS revenue, count(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q_segment_revenue" ->
      s"""SELECT c_mktsegment, o_orderpriority,
         |  ${decSum("o_totalprice")} AS revenue, count(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment, o_orderpriority
         |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,

    // z from single IEEE ops on exact integer sums, same op order as the
    // Spark side: mean = s/nh, msq = sq/nh, z = (n - mean)/sqrt(msq - mean²)
    "q_hourly_anomaly" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events
        |  FROM events GROUP BY 1),
        |s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS nh,
        |    CAST(sum(n_events) AS DOUBLE) AS s,
        |    CAST(sum(n_events * n_events) AS DOUBLE) AS sq
        |  FROM h),
        |zz AS (
        |  SELECT hour, n_events,
        |    CASE WHEN sq/nh - (s/nh)*(s/nh) > 0
        |      THEN (CAST(n_events AS DOUBLE) - s/nh)
        |        / sqrt(sq/nh - (s/nh)*(s/nh))
        |      ELSE 0.0 END AS z
        |  FROM h, s)
        |SELECT hour, n_events, z, (abs(z) > 2.0) AS is_anomaly
        |FROM zz ORDER BY hour""".stripMargin,

    // the streaming operator's batch-parity row: hourlyBaseline replays the
    // identical IEEE op order (mean = s/nh, msq = sq/nh, var, sqrt, one
    // divide), so the same SQL is the truth for both operators
    "q_hourly_anomaly_stream" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events
        |  FROM events GROUP BY 1),
        |s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS nh,
        |    CAST(sum(n_events) AS DOUBLE) AS s,
        |    CAST(sum(n_events * n_events) AS DOUBLE) AS sq
        |  FROM h),
        |zz AS (
        |  SELECT hour, n_events,
        |    CASE WHEN sq/nh - (s/nh)*(s/nh) > 0
        |      THEN (CAST(n_events AS DOUBLE) - s/nh)
        |        / sqrt(sq/nh - (s/nh)*(s/nh))
        |      ELSE 0.0 END AS z
        |  FROM h, s)
        |SELECT hour, n_events, z, (abs(z) > 2.0) AS is_anomaly
        |FROM zz ORDER BY hour""".stripMargin,

    "q_transitions" ->
      """WITH x AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type, count(*) AS n FROM x
        |WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // SCD2 mirror: identical lag-collapse then lead/row_number over the
    // surviving change rows, same (ts, event_id) tie order. q_scd2_incr
    // shares it VERBATIM: the incrementally-maintained table must equal
    // the full recompute over the same (history ∪ batch) event set.
    "q_scd2" -> scd2Sql,
    "q_scd2_incr" -> scd2Sql,
    // segmented streaming fold (closed appends + LWW open rows) ≡ the
    // full recompute — literally the same SQL
    "q_scd2_stream" -> scd2Sql,

    // erasure propagation: the scrubbed history == full recompute minus
    // the requested keys
    "q_delete_propagation" ->
      s"""$scd2Ctes
        |SELECT user_id, state, valid_from, valid_to,
        |  (valid_to IS NULL) AS is_current, version
        |FROM v WHERE user_id % 7 <> 3
        |ORDER BY user_id, version""".stripMargin,

    "q_delete_audit" ->
      s"""$scd2Ctes
        |SELECT
        |  (SELECT count(*) FROM v WHERE user_id % 7 = 3) AS n_deleted_rows,
        |  (SELECT count(DISTINCT user_id) FROM v WHERE user_id % 7 = 3)
        |    AS n_deleted_keys,
        |  (SELECT count(*) FROM v WHERE user_id % 7 <> 3)
        |    AS n_remaining_rows""".stripMargin,

    // expectation-suite mirror: the same NULL-is-violation reading
    // (coalesce(pred, FALSE)), count-minus-distinct uniqueness, anti-join
    // referential count
    "q_expectations" ->
      """WITH c AS (
        |  SELECT 'lineitem_quantity_range' AS check_name,
        |    sum(CASE WHEN coalesce(l_quantity BETWEEN 1 AND 50, FALSE)
        |      THEN 0 ELSE 1 END) AS n_violations FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_returnflag_accepted',
        |    sum(CASE WHEN coalesce(l_returnflag IN ('A','N','R'), FALSE)
        |      THEN 0 ELSE 1 END) FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_shipdate_not_null',
        |    sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_discount_range',
        |    sum(CASE WHEN coalesce(l_discount BETWEEN 0 AND 0.1, FALSE)
        |      THEN 0 ELSE 1 END) FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_pk_unique',
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_orders_fk',
        |    (SELECT count(*) FROM lineitem l
        |     LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |       ON o.o_orderkey = l.l_orderkey
        |     WHERE o.o_orderkey IS NULL))
        |SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
        |  n_violations = 0 AS passed
        |FROM c ORDER BY check_name""".stripMargin,

    // per-hour-of-day baseline: the q_hourly_anomaly op order with the
    // stats partitioned by slot
    "q_seasonal_anomaly" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events
        |  FROM events GROUP BY 1),
        |h2 AS (SELECT *, hour(hour) AS hod FROM h),
        |s AS (
        |  SELECT hod, CAST(count(*) AS DOUBLE) AS nh,
        |    CAST(sum(n_events) AS DOUBLE) AS s,
        |    CAST(sum(n_events * n_events) AS DOUBLE) AS sq
        |  FROM h2 GROUP BY 1),
        |zz AS (
        |  SELECT hour, h2.hod, n_events,
        |    CASE WHEN sq/nh - (s/nh)*(s/nh) > 0
        |      THEN (CAST(n_events AS DOUBLE) - s/nh)
        |        / sqrt(sq/nh - (s/nh)*(s/nh))
        |      ELSE 0.0 END AS z
        |  FROM h2 JOIN s ON s.hod = h2.hod)
        |SELECT hour, hod, n_events, z, (abs(z) > 2.0) AS is_anomaly
        |FROM zz ORDER BY hour""".stripMargin,

    // A/B mirror: the same distinct counts and the identical p̂/pooled/se/z
    // IEEE op sequence
    "q_ab_test" ->
      """WITH u AS (
        |  SELECT user_id % 2 AS arm, count(DISTINCT user_id) AS exposed
        |  FROM events GROUP BY 1),
        |cv AS (
        |  SELECT user_id % 2 AS arm, count(DISTINCT user_id) AS converted
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |a AS (
        |  SELECT u.arm, u.exposed, coalesce(cv.converted, 0) AS converted
        |  FROM u LEFT JOIN cv USING (arm)),
        |j AS (
        |  SELECT c.exposed AS exp_c, c.converted AS conv_c,
        |    t.exposed AS exp_t, t.converted AS conv_t
        |  FROM (SELECT * FROM a WHERE arm = 0) c,
        |       (SELECT * FROM a WHERE arm = 1) t),
        |x AS (
        |  SELECT *,
        |    conv_t::DOUBLE / exp_t::DOUBLE - conv_c::DOUBLE / exp_c::DOUBLE
        |      AS lift,
        |    (conv_c + conv_t)::DOUBLE / (exp_c + exp_t)::DOUBLE AS pooled
        |  FROM j),
        |x2 AS (
        |  SELECT *, sqrt(pooled * (1.0 - pooled)
        |    * (1.0 / exp_c::DOUBLE + 1.0 / exp_t::DOUBLE)) AS se
        |  FROM x)
        |SELECT exp_c, conv_c, exp_t, conv_t, lift,
        |  CASE WHEN se > 0 THEN lift / se ELSE 0.0 END AS z,
        |  abs(CASE WHEN se > 0 THEN lift / se ELSE 0.0 END) > 1.96
        |    AS significant
        |FROM x2""".stripMargin,

    // EWMA mirror: 1-step recursive CTE over the hour index replaying the
    // identical non-negative integer update ((d−1)·s + n·1e9) // d
    "q_ewma_baseline" ->
      """WITH RECURSIVE h AS (
        |  SELECT date_trunc('hour', ts) AS hour, count(*) AS n
        |  FROM events GROUP BY 1),
        |idx AS (
        |  SELECT *, row_number() OVER (ORDER BY hour) AS i FROM h),
        |r(i, f, s) AS (
        |  SELECT 1,
        |    (SELECT n FROM idx WHERE i = 1) * 1000000000,
        |    (7 * ((SELECT n FROM idx WHERE i = 1) * 1000000000)
        |      + (SELECT n FROM idx WHERE i = 1) * 1000000000) // 8
        |  UNION ALL
        |  SELECT r.i + 1, r.s,
        |    (7 * r.s + (SELECT n FROM idx WHERE idx.i = r.i + 1)
        |      * 1000000000) // 8
        |  FROM r WHERE r.i < (SELECT max(i) FROM idx))
        |SELECT idx.hour, idx.n AS n_events,
        |  CAST(r.f AS BIGINT)::DOUBLE / 1e9 AS forecast,
        |  CAST(r.s AS BIGINT)::DOUBLE / 1e9 AS ewma,
        |  idx.n * 2000000000 > 3 * CAST(r.f AS BIGINT) AS spike
        |FROM idx JOIN r ON r.i = idx.i
        |ORDER BY idx.hour""".stripMargin,

    // skew mirror: identical ascending-(count, key) ranking, exact
    // integer sums, the same two divisions + subtract for Gini
    "q_skew_report" ->
      """WITH c AS (
        |  SELECT event_type AS k, count(*) AS c FROM events GROUP BY 1),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY c, k) AS i,
        |    count(*) OVER () AS nk
        |  FROM c)
        |SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
        |  max(c)::DOUBLE / CAST(sum(c) AS BIGINT)::DOUBLE AS max_share,
        |  CAST(sum(CASE WHEN i > nk - 3 THEN c ELSE 0 END) AS BIGINT)::DOUBLE
        |    / CAST(sum(c) AS BIGINT)::DOUBLE AS top3_share,
        |  (2 * CAST(sum(i * c) AS BIGINT))::DOUBLE
        |    / (count(*) * CAST(sum(c) AS BIGINT))::DOUBLE
        |    - (count(*) + 1)::DOUBLE / count(*)::DOUBLE AS gini
        |FROM r""".stripMargin,

    // temporal lookup: purchases enriched with the SCD2 state current at
    // their timestamp (half-open intervals ⇒ exactly one match in range)
    "q_scd2_lookup" ->
      s"""$scd2Ctes
        |SELECT f.event_id, f.user_id, f.ts, v.state, v.valid_from,
        |  v.valid_to, v.version
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') f
        |LEFT JOIN v ON v.user_id = f.user_id AND v.valid_from <= f.ts
        |  AND (v.valid_to IS NULL OR f.ts < v.valid_to)
        |ORDER BY f.event_id""".stripMargin,

    // 30-minute-gap sessions; path = 3 consecutive event types in one
    // session; top-10 by count (ties by path)
    "q_session_paths" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |s AS (
        |  SELECT *, sum(CASE WHEN pts IS NULL
        |      OR epoch_ms(ts) - epoch_ms(pts) > 1800000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
        |  FROM o),
        |p AS (
        |  SELECT event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id, sid
        |      ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id, sid
        |      ORDER BY ts, event_id) AS e3
        |  FROM s)
        |SELECT concat_ws(' > ', e1, e2, e3) AS path,
        |  count(*) AS n_occurrences
        |FROM p WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n_occurrences DESC, path LIMIT 10""".stripMargin,

    // chain debounce = keep rows whose lag-gap is null or beyond the window
    "q_debounce" ->
      """WITH x AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch_ms(ts) - epoch_ms(lag(ts) OVER (
        |      PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap
        |  FROM events)
        |SELECT event_id, user_id, event_type FROM x
        |WHERE gap IS NULL OR gap > 3600000
        |ORDER BY event_id""".stripMargin,

    "q_daily_active" ->
      """SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS dau, count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_topk_events" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY n DESC, event_type LIMIT 5""".stripMargin,

    "q_uniques_exact" ->
      "SELECT count(DISTINCT user_id) AS exact_users FROM events",

    // the HLL error-contract oracle: the estimate must land within 5% of
    // exact (rsd=0.01 requested; 5× margin), predicted as a literal TRUE
    "q_uniques_hll" ->
      """SELECT count(DISTINCT user_id) AS exact_users, TRUE AS hll_within_5pct
        |FROM events""".stripMargin,

    "q_uniques_sketches" ->
      """SELECT count(DISTINCT user_id) AS exact_users,
        |  TRUE AS sketch_within_5pct
        |FROM events""".stripMargin,
    // maintained per-day HLL table (two halves folded by sketch union)
    // must satisfy the identical contract a fresh build does
    "q_hll_incr" ->
      """SELECT count(DISTINCT user_id) AS exact_users,
        |  TRUE AS sketch_within_5pct
        |FROM events""".stripMargin,
    // day-pruned rebuild-on-erasure: the maintained table's estimate
    // holds the contract against the SURVIVORS' exact count
    "q_hll_delete" ->
      """SELECT count(DISTINCT user_id) AS exact_users,
        |  TRUE AS sketch_within_5pct
        |FROM events WHERE user_id % 10 <> 3""".stripMargin,

    // Morton interleave mirror: the identical bit placement, unrolled —
    // OR of disjoint-position terms (bit i of a at 2i+1, of b at 2i)
    "q_zorder" -> {
      val terms = (0 until 12).flatMap(i => Seq(
        s"((((user_id % 4096) >> $i) & 1) << ${2 * i + 1})",
        s"((((event_id % 4096) >> $i) & 1) << ${2 * i})"))
      s"""SELECT event_id, CAST(${terms.mkString(" | ")} AS BIGINT) AS zval
         |FROM events ORDER BY event_id""".stripMargin
    },
    // k = 3 Morton mirror: round-robin placement — bit i of dimension j
    // lands at 3i + (2 − j); day = epoch days of ts (UTC on both engines)
    "q_zorder3" -> {
      val dims = Seq(
        "(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 1024)",
        "(user_id % 1024)", "(event_id % 1024)")
      val terms = for {
        i <- 0 until 10
        (d, j) <- dims.zipWithIndex
      } yield s"((($d >> $i) & 1) << ${3 * i + (2 - j)})"
      s"""SELECT event_id, CAST(${terms.mkString(" | ")} AS BIGINT) AS zval
         |FROM events ORDER BY event_id""".stripMargin
    },

    "q_cube_revenue" ->
      s"""SELECT c_mktsegment, o_orderpriority,
         |  ${decSum("o_totalprice")} AS revenue, count(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY CUBE(c_mktsegment, o_orderpriority)
         |ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_join_semi_anti" ->
      """SELECT c_custkey,
        |  c_custkey IN (SELECT o_custkey FROM orders) AS has_orders
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_set_cohorts" ->
      """SELECT 'view_and_purchase' AS cohort, user_id FROM
        |  (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        |   INTERSECT
        |   SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |UNION ALL
        |SELECT 'view_only' AS cohort, user_id FROM
        |  (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        |   EXCEPT
        |   SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |ORDER BY cohort, user_id""".stripMargin,

    // MERGE mirror: same deterministic batch derivation, then the row-level
    // MERGE outcome — snapshot keys absent from the batch, plus the batch's
    // surviving rows
    // streamed LWW snapshot of per-batch-latest change rows over
    // time-ordered batches ≡ the global per-user argmax (a user's
    // overall latest event lives in their last batch with activity);
    // the tombstone batch removes users ≡ 3 (mod 7)
    "q_snapshot_stream" ->
      s"""SELECT user_id, event_type, ts, event_id FROM (
         |  SELECT user_id, event_type, ts, event_id,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events WHERE user_id % 7 <> 3)
         |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_merge_upsert" ->
      """WITH batch AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate,
        |    o_orderpriority, FALSE AS _deleted
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority, TRUE
        |  FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT -o_orderkey - 1, o_custkey, 'N', o_totalprice, o_orderdate,
        |    o_orderpriority, FALSE
        |  FROM orders WHERE o_orderkey % 11 = 0)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders s
        |WHERE NOT EXISTS (SELECT 1 FROM batch b
        |  WHERE b.o_orderkey = s.o_orderkey)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM batch WHERE NOT _deleted
        |ORDER BY o_orderkey""".stripMargin,

    // rolling-active mirror: per-(user, day) distinct frame, trailing
    // range join over the day list, exact distinct per window
    "q_rolling_active" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day AS d FROM ud),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY day),
        |wau AS (
        |  SELECT d AS day, count(DISTINCT user_id) AS wau
        |  FROM ud JOIN days ON ud.day <= days.d
        |    AND ud.day > days.d - INTERVAL 7 DAY
        |  GROUP BY d)
        |SELECT w.day, dau.dau, w.wau,
        |  CAST(dau.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
        |FROM wau w JOIN dau ON dau.day = w.day
        |ORDER BY w.day""".stripMargin,

    // attribution mirror: identical touch dedupe (max (type, id) per
    // (user, ts)), DuckDB ASOF LEFT JOIN at-or-before, same window test
    "q_attribution_markov" -> markovSql,

    "q_attribution" ->
      """WITH conv AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, ts AS touch_ts,
        |    max(struct_pack(event_type := event_type, event_id := event_id))
        |      .event_type AS touch_type
        |  FROM events WHERE event_type IN ('view', 'click')
        |  GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id, c.ts, t.touch_type, t.touch_ts,
        |  (t.touch_ts IS NOT NULL AND
        |   epoch_ms(c.ts) - epoch_ms(t.touch_ts) <= 86400000) AS attributed
        |FROM conv c ASOF LEFT JOIN t
        |  ON c.user_id = t.user_id AND c.ts >= t.touch_ts
        |ORDER BY event_id""".stripMargin,

    // mirrors the nano-grid decay-weight discipline: floor BEFORE the
    // per-conversion normalization, integer window sum, one division
    "q_attribution_multi" ->
      """WITH conv AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, event_id AS touch_id, ts AS touch_ts,
        |    event_type AS touch_type
        |  FROM events WHERE event_type IN ('view', 'click')),
        |j AS (
        |  SELECT c.event_id, c.user_id, c.ts, t.touch_id, t.touch_type,
        |    t.touch_ts
        |  FROM conv c JOIN t USING (user_id)
        |  WHERE t.touch_ts <= c.ts
        |    AND epoch_ms(c.ts) - epoch_ms(t.touch_ts) <= 86400000),
        |s AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_id
        |      ORDER BY touch_ts, touch_type, touch_id) AS position,
        |    count(*) OVER (PARTITION BY event_id) AS n_touches,
        |    CAST(floor(pow(2.0,
        |      -(epoch_ms(ts) - epoch_ms(touch_ts))::DOUBLE / 21600000.0)
        |      * 1e9) AS BIGINT) AS w_nano
        |  FROM j),
        |s2 AS (
        |  SELECT *,
        |    CASE WHEN n_touches = 1 THEN 1.0
        |      WHEN n_touches = 2 THEN 0.5
        |      WHEN position = 1 OR position = n_touches THEN 0.4
        |      ELSE 0.2 / (n_touches - 2)::DOUBLE END AS credit_u,
        |    w_nano::DOUBLE /
        |      (CAST(sum(w_nano) OVER (PARTITION BY event_id) AS BIGINT))::DOUBLE
        |      AS credit_decay
        |  FROM s)
        |SELECT event_id, user_id, ts, touch_id, touch_type, touch_ts,
        |  n_touches, position, credit_u, credit_decay
        |FROM s2 ORDER BY event_id, position""".stripMargin,

    "q_asof_enrich" ->
      """WITH snap AS (
        |  SELECT user_id, date_trunc('day', ts) AS rts, max(value) AS day_max
        |  FROM events GROUP BY 1, 2)
        |SELECT e.event_id, s.day_max
        |FROM events e ASOF LEFT JOIN snap s
        |  ON e.user_id = s.user_id AND e.ts >= s.rts
        |ORDER BY e.event_id""".stripMargin,

    "q_range_join" ->
      """WITH win AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |w AS (
        |  SELECT user_id,
        |    day + INTERVAL (user_id % 12) HOUR AS w_start,
        |    day + INTERVAL ((user_id % 12) + 6) HOUR AS w_end
        |  FROM win)
        |SELECT e.event_id, w.w_start
        |FROM events e JOIN w ON e.user_id = w.user_id
        |  AND e.ts >= w.w_start AND e.ts < w.w_end
        |ORDER BY e.event_id""".stripMargin,

    "q_json_props" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_by_path,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_typed
        |FROM events ORDER BY event_id""".stripMargin,

    // props is always a 1-entry {"k": n} object; to_json(map_filter(...))
    // renders {} or {"k":n} with no spaces — mirrored by string concat.
    "q_map_ops" ->
      """SELECT event_id,
        |  1 AS m_size,
        |  'k' AS m_keys,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        |  CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) % 2 = 0
        |    THEN '{"k":' || json_extract_string(props, '$.k') || '}'
        |    ELSE '{}' END AS even_entries
        |FROM events ORDER BY event_id""".stripMargin,

    // session_window merges while gap < 30min STRICTLY (new session at
    // diff >= gap) — note the >= vs the lag-sessionization queries' >.
    "q_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800000
        |    THEN 1 ELSE 0 END AS is_new, event_id
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "q_session_stats" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
        |    THEN 1 ELSE 0 END AS is_new
        |  FROM events)
        |SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_session_durations" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
        |    THEN 1 ELSE 0 END AS is_new,
        |    event_id
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM g)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events,
        |  epoch_ms(max(ts)) - epoch_ms(min(ts)) AS span_ms
        |FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,

    "q_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')
        |  GROUP BY user_id)
        |SELECT
        |  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_step1_view,
        |  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL AND t_view < t_click
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_step2_click,
        |  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL AND t_view < t_click
        |    AND t_purchase IS NOT NULL AND t_click < t_purchase
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_step3_purchase
        |FROM f""".stripMargin,

    "q_retention" ->
      """WITH fd AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT cohort_day, date_diff('day', cohort_day, day) AS offset_days,
        |  count(DISTINCT act.user_id) AS n_users
        |FROM act JOIN fd USING (user_id)
        |WHERE date_diff('day', cohort_day, day) BETWEEN 0 AND 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_tumbling_hour" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
         |  ${viaStr("sum(CAST(value AS DECIMAL(18,6)))")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the windowed CMS on the batch-parity path: hour buckets via
    // date_trunc ≡ window().start for aligned 1-hour tumbling windows
    "q_cms_windowed" ->
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS hour, j.range AS depth,
        |    CAST(concat('0x', substring(
        |      md5(CAST(j.range AS VARCHAR) || ':' || event_type), 1, 8))
        |      AS BIGINT) % 64 AS bucket
        |  FROM events, range(4) j)
        |SELECT hour, CAST(depth AS INT) AS depth, bucket, count(*) AS cnt
        |FROM c GROUP BY 1, 2, 3 ORDER BY hour, depth, bucket""".stripMargin,

    // the composed pipeline: same language + quality formulas as
    // q_lang_breakdown / q_text_quality, over the doubled corpus, then the
    // exact-dedup group-by — all shared fragments, bit-exact arithmetic.
    "q_curation" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id, text FROM documents),
         |${curatedCtes("d")}
         |SELECT min(doc_id) AS doc_id, min(quality) AS quality,
         |  count(*) AS n_copies
         |FROM k GROUP BY md5(text) ORDER BY doc_id""".stripMargin,

    // waterfall mirror: the shared curation CTEs' q/k stages counted in
    // gate order over the same doubled corpus
    "q_curation_waterfall" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id, text FROM documents),
         |${curatedCtes("d")},
         |w AS (SELECT
         |  (SELECT count(*) FROM d)::BIGINT AS n0,
         |  (SELECT count(*) FROM q WHERE lang_pred = 'en')::BIGINT AS n1,
         |  (SELECT count(*) FROM k)::BIGINT AS n2,
         |  (SELECT count(DISTINCT md5(text)) FROM k)::BIGINT AS n3)
         |SELECT * FROM (
         |  SELECT '1_language' AS stage, n0 AS n_in, n1 AS n_out,
         |    n0 - n1 AS n_dropped FROM w
         |  UNION ALL SELECT '2_quality', n1, n2, n1 - n2 FROM w
         |  UNION ALL SELECT '3_exact_dedup', n2, n3, n2 - n3 FROM w)
         |ORDER BY stage""".stripMargin,

    // curate + near-dup clustering: exact survivors, then the all-pairs
    // Jaccard graph over them, recursive-CTE components, and only each
    // component's min-id member kept
    "q_curation_neardup" ->
      s"""WITH RECURSIVE ${curationNdCtes("documents")}
         |SELECT doc_id, quality, n_copies FROM nd
         |ORDER BY doc_id""".stripMargin,

    // END-TO-END release: the curation+near-dup chain (shared verbatim
    // with q_curation_neardup) over the non-benchmark corpus, decontam
    // against the benchmark's distinct 5-gram set, top-20 vocab trained
    // on the RELEASED corpus, token counts through the same tokenize
    // chain as q_tokenize_ids, the q_pack_sequences exclusive-cumsum
    // shard assignment, and the manifest + card aggregation — each stage
    // byte-identical to its standalone row's mirror, stacked.
    "q_release_pipeline" -> releasePipelineSql,
    // the always-on composition serves the snapshot through the literal
    // releaseTail over the maintained clean set — same oracle VERBATIM
    "q_release_stream" -> releasePipelineSql,
    // the erasure form ≡ the batch pipeline over the survivors: erased
    // ids (≡ 6 mod 10, ingested in batches 0-1 i.e. ≢ 2 mod 3) excluded
    // from the corpus CTE, everything downstream identical
    "q_release_stream_erasure" -> releasePipelineSqlWhere(
      "doc_id % 50 <> 0 AND NOT (doc_id % 10 = 6 AND doc_id % 3 <> 2)"),


    "q_dedup_exact" ->
      """WITH d AS (SELECT * FROM documents UNION ALL SELECT * FROM documents)
        |SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM d GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "q_pivot_revenue" ->
      s"""SELECT c_mktsegment,
         |  ${decSum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END")} AS "1-URGENT",
         |  ${decSum("CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END")} AS "2-HIGH",
         |  ${decSum("CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END")} AS "3-MEDIUM",
         |  ${decSum("CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END")} AS "4-NOT SPECIFIED",
         |  ${decSum("CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END")} AS "5-LOW"
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_outer" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS custkey, n_orders
        |FROM customer
        |FULL OUTER JOIN (
        |  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1) o
        |ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q_string_fns" ->
      """SELECT doc_id,
        |  levenshtein(substr(text, 1, 12), source) AS lev,
        |  reverse(source) AS rev_source,
        |  lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded,
        |  translate(source, 'src', 'XYZ') AS translated,
        |  repeat('ab', 2) || substr(text, 1, 4) AS combo
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday — mirror
    // with +1
    "q_date_fns" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  quarter(o_orderdate) AS qtr,
        |  month(o_orderdate) AS m,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  last_day(o_orderdate) AS month_end,
        |  o_orderdate::DATE + 30 AS plus30
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // list_distinct preserves first-occurrence order in DuckDB as
    // array_distinct does in Spark; the sorted variant removes any doubt
    "q_array_fns" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |  FROM documents)
        |SELECT doc_id,
        |  len(ws) AS n,
        |  array_to_string(ws[2:4], ' ') AS mid,
        |  len(list_distinct(ws)) AS n_uniq,
        |  list_contains(ws, 'the') AS has_the,
        |  array_to_string(list_sort(list_distinct(ws))[1:5], ',') AS sorted_uniq5
        |FROM w ORDER BY doc_id""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size', p_size::DOUBLE FROM part
        |ORDER BY p_partkey, measure""".stripMargin,

    "q_grouping_sets" ->
      s"""SELECT c_mktsegment, o_orderpriority,
         |  ${decSum("o_totalprice")} AS revenue, count(*) AS n_orders,
         |  GROUPING(c_mktsegment, o_orderpriority) AS gid
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
         |ORDER BY gid, c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    // dense integer duplicates pin the interpolation to exact values —
    // quantile_cont and Spark's exact percentile agree bit-for-bit here
    // robust-stats mirror: identical cents grid, cumulative-over-distinct
    // order statistics with ⌈p·n⌉ integer indices, exact cent sums
    // grouped order-statistics mirror: per-group running counts, same
    // selection thresholds as the global robust stats
    "q_grouped_quantiles" ->
      """WITH a AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |g AS (SELECT grp, c, count(*) AS k FROM a GROUP BY 1, 2),
        |cum AS (SELECT grp, c, k,
        |  CAST(sum(k) OVER (PARTITION BY grp ORDER BY c) AS BIGINT) AS cum
        |  FROM g),
        |tot AS (SELECT grp, CAST(sum(k) AS BIGINT) AS n FROM g GROUP BY grp)
        |SELECT cum.grp, min(tot.n)::BIGINT AS n,
        |  min(CASE WHEN cum >= (n + 1) // 2 THEN c END)::BIGINT AS med_c,
        |  min(CASE WHEN cum >= (n + 9) // 10 THEN c END)::BIGINT AS p10_c,
        |  min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN c END)::BIGINT
        |    AS p90_c
        |FROM cum JOIN tot USING (grp)
        |GROUP BY cum.grp ORDER BY grp""".stripMargin,

    // grouped-MAD mirror: the same two-pass selection with per-group
    // partitioned running counts
    "q_grouped_mad" ->
      """WITH a AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |g AS (SELECT grp, c, count(*) AS k FROM a GROUP BY 1, 2),
        |cum AS (SELECT grp, c, k,
        |  CAST(sum(k) OVER (PARTITION BY grp ORDER BY c) AS BIGINT) AS cum
        |  FROM g),
        |tot AS (SELECT grp, CAST(sum(k) AS BIGINT) AS n FROM g GROUP BY grp),
        |med AS (
        |  SELECT cum.grp, min(tot.n)::BIGINT AS n,
        |    min(CASE WHEN cum >= (n + 1) // 2 THEN c END)::BIGINT AS med_c
        |  FROM cum JOIN tot USING (grp) GROUP BY cum.grp),
        |dv AS (
        |  SELECT g.grp, med.n, med.med_c, abs(g.c - med.med_c) AS d,
        |    CAST(sum(g.k) AS BIGINT) AS k
        |  FROM g JOIN med USING (grp) GROUP BY 1, 2, 3, 4),
        |dcum AS (SELECT grp, n, med_c, d, k,
        |  CAST(sum(k) OVER (PARTITION BY grp ORDER BY d) AS BIGINT) AS cum
        |  FROM dv)
        |SELECT grp, min(n)::BIGINT AS n, min(med_c)::BIGINT AS med_c,
        |  min(CASE WHEN cum >= (n + 1) // 2 THEN d END)::BIGINT AS mad_c
        |FROM dcum GROUP BY grp ORDER BY grp""".stripMargin,

    "q_robust_stats" ->
      """WITH a AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
        |    count(*) AS k
        |  FROM orders GROUP BY 1),
        |cu AS (SELECT c, k, CAST(sum(k) OVER (ORDER BY c) AS BIGINT) AS cum
        |  FROM a),
        |t AS (SELECT CAST(sum(k) AS BIGINT) AS n FROM a),
        |sel AS (
        |  SELECT n,
        |    min(CASE WHEN cum >= (n + 1) // 2 THEN c END) AS med_c,
        |    min(CASE WHEN cum >= (n + 9) // 10 THEN c END) AS p10_c,
        |    min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN c END) AS p90_c
        |  FROM cu, t GROUP BY n),
        |dv AS (
        |  SELECT abs(a.c - sel.med_c) AS d, CAST(sum(a.k) AS BIGINT) AS k
        |  FROM a, sel GROUP BY 1),
        |dcu AS (SELECT d, CAST(sum(k) OVER (ORDER BY d) AS BIGINT) AS cum
        |  FROM dv),
        |md AS (
        |  SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN d END) AS mad_c
        |  FROM dcu, t),
        |mn AS (
        |  SELECT
        |    CAST(sum(CASE WHEN a.c BETWEEN sel.p10_c AND sel.p90_c
        |      THEN a.c * a.k ELSE 0 END) AS BIGINT) AS tsum,
        |    CAST(sum(CASE WHEN a.c BETWEEN sel.p10_c AND sel.p90_c
        |      THEN a.k ELSE 0 END) AS BIGINT) AS tcnt,
        |    CAST(sum(greatest(least(a.c, sel.p90_c), sel.p10_c) * a.k)
        |      AS BIGINT) AS wsum
        |  FROM a, sel)
        |SELECT sel.n,
        |  sel.med_c::DOUBLE / 100.0 AS median,
        |  sel.p10_c::DOUBLE / 100.0 AS p10,
        |  sel.p90_c::DOUBLE / 100.0 AS p90,
        |  md.mad_c::DOUBLE / 100.0 AS mad,
        |  mn.tsum::DOUBLE / mn.tcnt::DOUBLE / 100.0 AS trimmed_mean,
        |  mn.wsum::DOUBLE / sel.n::DOUBLE / 100.0 AS winsorized_mean
        |FROM sel, md, mn""".stripMargin,

    // SQL-surface mirror: distinct 3-shingle count and token count over
    // the same tokenization (hash sets are distinct-by-string absent
    // 64-bit collisions, so the SIZES match exactly). Empty tokens are
    // FILTERED to match md5_token_hashes' empties-dropped semantics —
    // the space-only trim leaves tab/newline-edged splits with '' stubs
    // and empty text would otherwise count 1
    "q_sql_surface" ->
      s"""SELECT doc_id,
         |  len(list_distinct($shingleSql))::BIGINT AS n_shingles,
         |  len(list_filter($wordsSql, x -> x <> ''))::BIGINT AS n_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    // per-column profile mirror: one UNION ALL branch per column, all
    // counts cast to BIGINT
    "q_profile" -> (
      Seq("event_id", "ts", "user_id", "event_type", "value", "props")
        .map(c =>
          s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
             |  (count(*) - count($c))::BIGINT AS n_null,
             |  count(DISTINCT $c)::BIGINT AS n_distinct FROM events"""
            .stripMargin)
        .mkString("WITH p AS (\n", "\nUNION ALL\n", ")\n") +
      "SELECT * FROM p ORDER BY col_name"),

    // mean-test mirror: same hash arms, same moment sums, same Welch
    // expression over the materialized derived columns
    "q_mean_test" -> {
      val t5 = graft.llm.Sampling.digestThreshold(0.5)
      s"""WITH a AS (
         |  SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
         |      < '$t5' THEN 'a' ELSE 'b' END AS arm,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
         |  FROM events),
         |m AS (SELECT
         |  sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END)::BIGINT AS n_a,
         |  sum(CASE WHEN arm = 'a' THEN c ELSE 0 END)::BIGINT AS s_a,
         |  sum(CASE WHEN arm = 'a' THEN c * c ELSE 0 END)::BIGINT AS s2_a,
         |  sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END)::BIGINT AS n_b,
         |  sum(CASE WHEN arm = 'b' THEN c ELSE 0 END)::BIGINT AS s_b,
         |  sum(CASE WHEN arm = 'b' THEN c * c ELSE 0 END)::BIGINT AS s2_b
         |  FROM a),
         |d AS (SELECT n_a, n_b,
         |  s_a::DOUBLE / n_a::DOUBLE AS mean_a,
         |  s_b::DOUBLE / n_b::DOUBLE AS mean_b,
         |  (n_a::DOUBLE * s2_a::DOUBLE - s_a::DOUBLE * s_a::DOUBLE)
         |    / (n_a::DOUBLE * (n_a::DOUBLE - 1.0)) AS var_a,
         |  (n_b::DOUBLE * s2_b::DOUBLE - s_b::DOUBLE * s_b::DOUBLE)
         |    / (n_b::DOUBLE * (n_b::DOUBLE - 1.0)) AS var_b
         |  FROM m)
         |SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
         |  CASE WHEN n_a > 1 AND n_b > 1 AND
         |      (var_a / n_a::DOUBLE + var_b / n_b::DOUBLE) > 0.0 THEN
         |    (mean_b - mean_a)
         |      / sqrt(var_a / n_a::DOUBLE + var_b / n_b::DOUBLE)
         |  ELSE NULL END AS z
         |FROM d""".stripMargin
    },

    // ratio-metric mirror: same cents-grid per-row quantization
    // (floor(v*100 + 0.5) — here 0/1 indicators land on 0/100), same
    // exact moment sums, same pinned delta-method expression
    "q_ratio_metric" ->
      """WITH per AS (
        |  SELECT user_id,
        |    sum(CAST(floor((CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      * 100 + 0.5) AS BIGINT)) AS x,
        |    sum(CAST(floor((CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      * 100 + 0.5) AS BIGINT)) AS y
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |    sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
        |    sum(x * x)::BIGINT AS sx2, sum(y * y)::BIGINT AS sy2
        |  FROM per),
        |c AS (
        |  SELECT n, sx::DOUBLE / sy::DOUBLE AS ratio,
        |    (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |      / (n::DOUBLE * (n::DOUBLE - 1.0)) AS cov,
        |    (n::DOUBLE * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |      / (n::DOUBLE * (n::DOUBLE - 1.0)) AS varx,
        |    (n::DOUBLE * sy2::DOUBLE - sy::DOUBLE * sy::DOUBLE)
        |      / (n::DOUBLE * (n::DOUBLE - 1.0)) AS vary,
        |    sy::DOUBLE / n::DOUBLE AS my
        |  FROM m)
        |SELECT n, ratio,
        |  CASE WHEN n > 1 AND my <> 0.0 THEN
        |    sqrt((varx + ratio * ratio * vary - 2.0 * ratio * cov)
        |      / (n::DOUBLE * (my * my)))
        |  ELSE NULL END AS se
        |FROM c""".stripMargin,

    // SRM mirror: same 16-bit digest split, same literal-unrolled chi2
    "q_srm" -> {
      val t1 = graft.llm.Sampling.digestThreshold(0.5)
      val t2 = graft.llm.Sampling.digestThreshold(0.75)
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |s AS (
         |  SELECT CASE
         |    WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 4) < '$t1'
         |      THEN 'train'
         |    WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 4) < '$t2'
         |      THEN 'val'
         |    ELSE 'test' END AS split
         |  FROM u),
         |c AS (
         |  SELECT count(*)::BIGINT AS n_total,
         |    sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)::BIGINT AS n_train,
         |    sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)::BIGINT AS n_val,
         |    sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)::BIGINT AS n_test
         |  FROM s)
         |SELECT n_total, n_train, n_val, n_test,
         |  (n_train::DOUBLE - n_total::DOUBLE * 0.5)
         |    * (n_train::DOUBLE - n_total::DOUBLE * 0.5)
         |    / (n_total::DOUBLE * 0.5)
         |  + (n_val::DOUBLE - n_total::DOUBLE * 0.25)
         |    * (n_val::DOUBLE - n_total::DOUBLE * 0.25)
         |    / (n_total::DOUBLE * 0.25)
         |  + (n_test::DOUBLE - n_total::DOUBLE * 0.25)
         |    * (n_test::DOUBLE - n_total::DOUBLE * 0.25)
         |    / (n_total::DOUBLE * 0.25) AS chi2,
         |  ((n_train::DOUBLE - n_total::DOUBLE * 0.5)
         |    * (n_train::DOUBLE - n_total::DOUBLE * 0.5)
         |    / (n_total::DOUBLE * 0.5)
         |  + (n_val::DOUBLE - n_total::DOUBLE * 0.25)
         |    * (n_val::DOUBLE - n_total::DOUBLE * 0.25)
         |    / (n_total::DOUBLE * 0.25)
         |  + (n_test::DOUBLE - n_total::DOUBLE * 0.25)
         |    * (n_test::DOUBLE - n_total::DOUBLE * 0.25)
         |    / (n_total::DOUBLE * 0.25)) > 5.991464547107979
         |    AS srm_detected
         |FROM c""".stripMargin
    },

    // CUPED mirror: same cents-grid moment sums, same pinned-order
    // double expressions over their casts
    "q_cuped" ->
      """WITH per AS (
        |  SELECT user_id,
        |    sum(CASE WHEN ts < TIMESTAMP '2024-01-15' THEN
        |      CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS x,
        |    sum(CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN
        |      CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS y
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |    sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
        |    sum(x * x)::BIGINT AS sx2, sum(y * y)::BIGINT AS sy2
        |  FROM per),
        |c AS (
        |  SELECT n,
        |    n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS cov_n2,
        |    n::DOUBLE * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE AS varx_n2,
        |    n::DOUBLE * sy2::DOUBLE - sy::DOUBLE * sy::DOUBLE AS vary_n2
        |  FROM m),
        |t AS (
        |  SELECT n,
        |    CASE WHEN varx_n2 > 0.0 THEN cov_n2 / varx_n2 ELSE 0.0 END
        |      AS theta,
        |    cov_n2, varx_n2, vary_n2 FROM c)
        |SELECT n, theta, vary_n2 AS vary_scaled,
        |  vary_n2 + theta * theta * varx_n2 - 2.0 * theta * cov_n2
        |    AS varyadj_scaled,
        |  CASE WHEN vary_n2 > 0.0
        |    THEN 1.0 - (vary_n2 + theta * theta * varx_n2
        |      - 2.0 * theta * cov_n2) / vary_n2
        |    ELSE 0.0 END AS var_reduction
        |FROM t""".stripMargin,

    // Poisson-bootstrap mirror: identical md5 uniforms and literal
    // Poisson(1) inverse-CDF cutoffs, exact integer weight/value sums
    "q_bootstrap" ->
      """WITH v AS (
        |  SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders),
        |u AS (
        |  SELECT b.range AS rep, v.v,
        |    CAST(concat('0x', substring(md5(CAST(v.k AS VARCHAR) || ':rep'
        |      || CAST(b.range AS VARCHAR)), 1, 14)) AS BIGINT)::DOUBLE
        |      / 72057594037927936.0 AS u
        |  FROM v, range(16) b),
        |r AS (
        |  SELECT rep, v,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.7357588823428847 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238462 THEN 3
        |         WHEN u < 0.9963401531726563 THEN 4
        |         WHEN u < 0.9994058151824183 THEN 5
        |         WHEN u < 0.9999167588507119 THEN 6
        |         ELSE 7 END AS w
        |  FROM u)
        |SELECT CAST(rep AS BIGINT) AS rep, sum(w)::BIGINT AS n_eff,
        |  CASE WHEN sum(w) > 0
        |    THEN (sum(w * v)::BIGINT)::DOUBLE / (sum(w)::BIGINT)::DOUBLE
        |    ELSE NULL END AS mean
        |FROM r GROUP BY rep ORDER BY rep""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity::DOUBLE, 0.25) AS p25,
        |  quantile_cont(l_quantity::DOUBLE, 0.5) AS p50,
        |  quantile_cont(l_quantity::DOUBLE, 0.75) AS p75,
        |  quantile_cont(l_quantity::DOUBLE, 0.95) AS p95,
        |  TRUE AS approx_close,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // the salted two-phase agg's oracle is the PLAIN aggregation
    "q_salted_agg" ->
      s"""SELECT o_custkey, ${decSum("o_totalprice")} AS sum_price,
         |  count(*) AS n_rows
         |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // same all-pairs truth as q_dedup_minhash, restricted to pairs whose
    // left member is in the batch (id >= 250): batch-vs-corpus in (new,
    // other) orientation plus batch-internal with new < other
    "q_dedup_incr_near" -> incrNearTruthSql,
    // the prebuilt-table form answers the SAME question — one truth
    "q_dedup_incr_prebuilt" -> incrNearTruthSql,
    // deletion-maintained band/shingle tables: the probe over the purged
    // tables ≡ the truth over corpus ∖ deleted (deleted = corpus ids
    // ≡ 7 mod 10; the batch side is untouched)
    "q_dedup_prebuilt_delete" ->
      incrNearTruthSqlWhere("WHERE doc_id >= 250 OR doc_id % 10 <> 7"),

    "q_dedup_incremental" ->
      """WITH batch AS (
        |  SELECT md5(text) AS text_hash, min(doc_id) AS doc_id,
        |    count(*) AS n_copies
        |  FROM documents WHERE doc_id >= 250 GROUP BY md5(text))
        |SELECT doc_id, n_copies FROM batch
        |WHERE text_hash NOT IN (
        |  SELECT md5(text) FROM documents WHERE doc_id < 250)
        |ORDER BY doc_id""".stripMargin,

    // the bloom path must be EXACT — identical oracle to the plain form
    "q_dedup_incr_bloom" ->
      """WITH batch AS (
        |  SELECT md5(text) AS text_hash, min(doc_id) AS doc_id,
        |    count(*) AS n_copies
        |  FROM documents WHERE doc_id >= 250 GROUP BY md5(text))
        |SELECT doc_id, n_copies FROM batch
        |WHERE text_hash NOT IN (
        |  SELECT md5(text) FROM documents WHERE doc_id < 250)
        |ORDER BY doc_id""".stripMargin,

    // a STALE pre-erasure bloom must still be exact against the live
    // (survivor) corpus — hits fall through to the anti-join, misses are
    // still no-false-negative; the oracle is the survivors NOT-IN
    "q_dedup_bloom_stale" ->
      """WITH batch AS (
        |  SELECT md5(text) AS text_hash, min(doc_id) AS doc_id,
        |    count(*) AS n_copies
        |  FROM documents WHERE doc_id >= 250 GROUP BY md5(text))
        |SELECT doc_id, n_copies FROM batch
        |WHERE text_hash NOT IN (
        |  SELECT md5(text) FROM documents
        |  WHERE doc_id < 250 AND doc_id % 10 <> 6)
        |ORDER BY doc_id""".stripMargin,

    // digest-predicate mirror of Sampling.sampleByKey: md5 prefix < '4000'
    // (= round(0.25 * 2^16) as 4 hex digits)
    "q_sample_docs" ->
      """SELECT doc_id, source FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
        |ORDER BY doc_id""".stripMargin,

    // 0.8→round(.8·2¹⁶)=0xcccd, 0.9→0xe666 — digest buckets mirrored
    "q_split_assign" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
        |           THEN 'train'
        |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM a GROUP BY split ORDER BY split""".stripMargin,

    "q_split_folds" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
        |      AS BIGINT) % 5 AS INT) AS fold
        |  FROM documents)
        |SELECT fold, count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM a GROUP BY fold ORDER BY fold""".stripMargin,

    // digest-rank cap per source; rank ties broken by doc_id like Spark
    "q_source_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, source FROM r WHERE rk <= 20 ORDER BY doc_id""".stripMargin,

    // per-stratum thresholds: 0.75→'c000', 0.5→'8000', 0.125→'2000',
    // unlisted strata dropped ('0000')
    "q_sample_stratified" ->
      """SELECT doc_id, source FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |  CASE source WHEN 'src0' THEN 'c000' WHEN 'src1' THEN '8000'
        |              WHEN 'src2' THEN '2000' ELSE '0000' END
        |ORDER BY doc_id""".stripMargin,

    "q_topk_per_group" ->
      """SELECT source, rn, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 3 ORDER BY source, rn""".stripMargin,

    // percent_rank/cume_dist are (rank-1)/(n-1) and rows/n — integer-ratio
    // doubles, bit-exact across engines; the bounded frame's empty first
    // window is NULL on both
    "q_window_cume" ->
      """SELECT source, doc_id, n_chars,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS prev3_chars,
        |  first_value(doc_id) OVER w AS first_doc
        |FROM documents
        |WINDOW w AS (PARTITION BY source ORDER BY doc_id)
        |ORDER BY source, doc_id""".stripMargin,

    // mirrors q_stats_moments' discipline: exact integer power sums, then
    // the IDENTICAL double expression tree (operation order pinned) —
    // never the built-in stddev/corr aggregators, whose double merge order
    // is partitioning-dependent
    "q_stats_moments" ->
      """WITH tk AS (
        |  SELECT source, n_chars::BIGINT AS x,
        |    (CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END)::BIGINT AS y
        |  FROM documents),
        |a AS (
        |  SELECT source, count(*) AS n_rows,
        |    (sum(x))::DOUBLE AS sx, (sum(y))::DOUBLE AS sy,
        |    (sum(x*x))::DOUBLE AS sxx, (sum(y*y))::DOUBLE AS syy,
        |    (sum(x*y))::DOUBLE AS sxy
        |  FROM tk GROUP BY source)
        |SELECT source, n_rows,
        |  sx / (n_rows::DOUBLE) AS mean_chars,
        |  sqrt((sxx - sx * sx / (n_rows::DOUBLE)) / ((n_rows::DOUBLE) - 1.0))
        |    AS stddev_chars,
        |  ((n_rows::DOUBLE) * sxy - sx * sy) /
        |    (sqrt((n_rows::DOUBLE) * sxx - sx * sx)
        |      * sqrt((n_rows::DOUBLE) * syy - sy * sy)) AS corr_chars_tokens
        |FROM a ORDER BY source""".stripMargin,

    "q_uniques_per_group" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS hll_within_15pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // list_reduce errors on an empty list — prepend the fold's zero
    "q_hof_fns" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS words
        |  FROM documents)
        |SELECT doc_id,
        |  len(list_filter(words, x -> len(x) > 3)) AS n_long_words,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(words, x -> len(x)::BIGINT)),
        |    (a, b) -> a + b) AS total_word_chars,
        |  list_contains(words, 'the') AS has_the,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(words, x -> (len(x) * len(x))::BIGINT)),
        |    (a, b) -> a + b) AS sum_sq_word_len
        |FROM w ORDER BY doc_id""".stripMargin,

    // WHERE n_chars > 0 mirrors weightedSample's weight-positivity gate:
    // without it a zero weight divides to inf (sorts last — benign) but a
    // NEGATIVE weight would sort FIRST on the oracle side only, so the
    // contract must exclude non-positive weights on BOTH engines to hold
    // on any fixture, not just ones with strictly positive lengths.
    "q_sample_weighted" ->
      """WITH s AS (
        |  SELECT doc_id, n_chars,
        |    -ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) + 1)::DOUBLE / 4294967297.0) / n_chars::DOUBLE AS skey
        |  FROM documents WHERE n_chars::DOUBLE > 0)
        |SELECT doc_id, n_chars FROM
        |  (SELECT * FROM s ORDER BY skey, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin,

    // HRW mirror: the identical w·64+idx encoded argmax, shard looked up
    // by decoded index (ties break to the later shard on both engines)
    "q_shard_assign" -> {
      val shards = Seq("s0", "s1", "s2", "s3", "s4")
      val enc = shards.zipWithIndex.map { case (s, i) =>
        s"CAST(concat('0x', substring(md5('$s:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) * 64 + $i"
      }.mkString(",\n    ")
      s"""SELECT doc_id,
         |  ([${shards.map("'" + _ + "'").mkString(", ")}])[CAST(greatest(
         |    $enc) % 64 AS INT) + 1] AS shard
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // rebalance mirror: both HRW argmaxes recomputed, movement counted
    "q_shard_rebalance" -> {
      def encSql(shards: Seq[String]): String = shards.zipWithIndex
        .map { case (s, i) =>
          s"CAST(concat('0x', substring(md5('$s:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) * 64 + $i" }
        .mkString(",\n      ")
      def pickSql(shards: Seq[String]): String =
        s"([${shards.map("'" + _ + "'").mkString(", ")}])[CAST(greatest(\n      ${encSql(shards)}) % 64 AS INT) + 1]"
      val old5 = Seq("s0", "s1", "s2", "s3", "s4")
      s"""WITH a AS (
         |  SELECT doc_id,
         |    ${pickSql(old5)} AS shard_before,
         |    ${pickSql(old5 :+ "s5")} AS shard_after
         |  FROM documents)
         |SELECT count(*)::BIGINT AS n_total,
         |  sum(CASE WHEN shard_before <> shard_after THEN 1 ELSE 0 END)::BIGINT
         |    AS n_moved,
         |  sum(CASE WHEN shard_before <> shard_after AND shard_after <> 's5'
         |    THEN 1 ELSE 0 END)::BIGINT AS n_moved_between_old,
         |  sum(CASE WHEN shard_before <> shard_after THEN 1 ELSE 0 END)::BIGINT::DOUBLE
         |    / count(*)::BIGINT::DOUBLE AS moved_share,
         |  sum(CASE WHEN shard_before <> shard_after AND shard_after <> 's5'
         |    THEN 1 ELSE 0 END)::BIGINT = 0 AS minimal_disruption
         |FROM a""".stripMargin
    },

    // normalization mirror: identical planted noise, then lower → control
    // chars to spaces → whitespace collapse → trim
    "q_text_normalize" ->
      """WITH noisy AS (
        |  SELECT doc_id,
        |    '  ' || substring(text, 1, 40) || chr(9) || chr(9) ||
        |      substring(text, 41, 1000000) || ' ' || chr(9) AS text
        |  FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g')) AS normalized
        |FROM noisy ORDER BY doc_id""".stripMargin,

    // containment mirror: ngram-jaccard's railed string-shingle frame,
    // each containment one double division, either direction ≥ 0.6
    "q_dedup_containment" ->
      s"""WITH e AS (
         |  SELECT doc_id, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents),
         |keep AS (SELECT h FROM e GROUP BY h HAVING count(*) <= 1000),
         |p AS (SELECT e.doc_id, e.h FROM e JOIN keep USING (h)),
         |sz AS (SELECT doc_id, count(*) AS sz FROM p GROUP BY 1),
         |c AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM p a JOIN p b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |m AS (
         |  SELECT id_a, id_b,
         |    c::DOUBLE / sa.sz::DOUBLE AS containment_a,
         |    c::DOUBLE / sb.sz::DOUBLE AS containment_b
         |  FROM c
         |  JOIN sz sa ON sa.doc_id = id_a
         |  JOIN sz sb ON sb.doc_id = id_b)
         |SELECT id_a, id_b, containment_a, containment_b FROM m
         |WHERE greatest(containment_a, containment_b) >= 0.6
         |ORDER BY id_a, id_b""".stripMargin,

    // paragraph dedup mirror: identical window slicing over the normalized
    // word stream, duplicates grouped by paragraph TEXT (Spark groups by
    // xxhash64 — same equivalence classes, collisions negligible);
    // untouched docs publish their ORIGINAL text, touched docs the
    // re-serialized kept stream
    "q_dedup_paragraph" ->
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |n AS (SELECT doc_id, ws,
         |    greatest(1, CAST(ceil(len(ws)/8.0) AS BIGINT)) AS np FROM w),
         |p AS (
         |  SELECT doc_id, i AS pidx,
         |    array_to_string(ws[i*8+1 : i*8+8], ' ') AS para
         |  FROM n, unnest(range(0, np)) AS gs(i)),
         |d AS (SELECT para FROM p GROUP BY para HAVING count(*) > 1),
         |k AS (SELECT p.*, (d.para IS NOT NULL) AS isdup
         |      FROM p LEFT JOIN d USING (para)),
         |g AS (
         |  SELECT doc_id, count(*) AS n_paras,
         |    count(*) FILTER (WHERE isdup) AS n_dropped,
         |    coalesce(array_to_string(
         |      list(para ORDER BY pidx) FILTER (WHERE NOT isdup), ' '), '')
         |      AS rebuilt
         |  FROM k GROUP BY doc_id)
         |SELECT g.doc_id,
         |  CASE WHEN g.n_dropped = 0 THEN doc.text ELSE g.rebuilt END
         |    AS text_out,
         |  g.n_paras, g.n_dropped
         |FROM g JOIN documents doc USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // per-source KL mirror: the DSIR gram/bucket frame grouped by source,
    // each bucket contribution one fixed (w · ln(ratio) · 1e9) floor,
    // per-source sums exact-integer over the closed 256-bucket frame
    // streaming-PSI batch parity: baseline bands recomputed with the
    // trainer's op order, per-hour grid over the baseline band set,
    // nano-floored summands, exact integer sum
    "q_psi_stream" ->
      """WITH base AS (
        |  SELECT CAST(floor(value / 50.0) AS BIGINT) AS band,
        |    count(*) AS bc
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(bc) AS BIGINT) AS n_tot,
        |  count(*) AS n_bands FROM base),
        |h AS (
        |  SELECT date_trunc('hour', ts) AS hour,
        |    CAST(floor(value / 50.0) AS BIGINT) AS band
        |  FROM events),
        |cell AS (SELECT hour, band, count(*) AS c FROM h GROUP BY 1, 2),
        |hn AS (SELECT hour, CAST(sum(c) AS BIGINT) AS n FROM cell GROUP BY 1),
        |grid AS (
        |  SELECT hn.hour, hn.n, base.band, base.bc,
        |    coalesce(cell.c, 0) AS c
        |  FROM hn CROSS JOIN base
        |  LEFT JOIN cell ON cell.hour = hn.hour AND cell.band = base.band),
        |x AS (
        |  SELECT hour, n, CAST(floor(
        |    ((c + 1)::DOUBLE / (n + n_bands)::DOUBLE
        |      - (bc + 1)::DOUBLE / (n_tot + n_bands)::DOUBLE)
        |    * ln(((c + 1)::DOUBLE / (n + n_bands)::DOUBLE)
        |      / ((bc + 1)::DOUBLE / (n_tot + n_bands)::DOUBLE))
        |    * 1e9) AS BIGINT) AS contrib
        |  FROM grid, tot)
        |SELECT hour, n AS n_inband,
        |  CAST(sum(contrib) AS BIGINT)::DOUBLE / 1e9 AS psi,
        |  CAST(sum(contrib) AS BIGINT)::DOUBLE / 1e9 > 0.25 AS drifted
        |FROM x GROUP BY hour, n ORDER BY hour""".stripMargin,

    // PSI mirror: identical Laplace smoothing, identical (p−q)·ln(p/q)
    // op order, nano-floor per band, exact integer sum per source
    "q_psi_drift" ->
      """WITH b AS (
        |  SELECT source AS grp,
        |    CAST(floor(n_chars / 200.0) AS BIGINT) AS band
        |  FROM documents),
        |cell AS (SELECT grp, band, count(*) AS c FROM b GROUP BY 1, 2),
        |base AS (SELECT band, CAST(sum(c) AS BIGINT) AS bc FROM cell GROUP BY 1),
        |ng AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM cell GROUP BY 1),
        |tot AS (SELECT CAST(sum(bc) AS BIGINT) AS n_tot,
        |  count(*) AS n_bands FROM base),
        |grid AS (
        |  SELECT ng.grp, ng.n, base.band, base.bc,
        |    coalesce(cell.c, 0) AS c
        |  FROM ng CROSS JOIN base
        |  LEFT JOIN cell ON cell.grp = ng.grp AND cell.band = base.band),
        |x AS (
        |  SELECT grp, CAST(floor(
        |    ((c + 1)::DOUBLE / (n + n_bands)::DOUBLE
        |      - (bc + 1)::DOUBLE / (n_tot + n_bands)::DOUBLE)
        |    * ln(((c + 1)::DOUBLE / (n + n_bands)::DOUBLE)
        |      / ((bc + 1)::DOUBLE / (n_tot + n_bands)::DOUBLE))
        |    * 1e9) AS BIGINT) AS contrib
        |  FROM grid, tot)
        |SELECT grp AS source,
        |  CAST(sum(contrib) AS BIGINT)::DOUBLE / 1e9 AS psi
        |FROM x GROUP BY 1 ORDER BY source""".stripMargin,

    // embedding-shift mirror: identical micro-sum centroids (one division
    // per cell), dim-ordered sequential fold of squared diffs
    "q_embed_drift" ->
      """WITH j AS (
        |  SELECT d.source AS grp, e.embedding
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
        |gdim AS (
        |  SELECT grp, g.range AS dim,
        |    count(*) AS n,
        |    CAST(sum(CAST(floor(embedding[g.range + 1]::DOUBLE * 1e6)
        |      AS BIGINT)) AS BIGINT) AS s
        |  FROM j, range(64) g GROUP BY 1, 2),
        |cd AS (
        |  SELECT dim, CAST(sum(n) AS BIGINT) AS n_tot,
        |    CAST(sum(s) AS BIGINT) AS s_tot
        |  FROM gdim GROUP BY 1),
        |df AS (
        |  SELECT grp, gdim.dim, gdim.n,
        |    gdim.s::DOUBLE / (gdim.n::DOUBLE * 1e6)
        |      - cd.s_tot::DOUBLE / (cd.n_tot::DOUBLE * 1e6) AS diff
        |  FROM gdim JOIN cd USING (dim))
        |SELECT grp AS source, CAST(min(n) AS BIGINT) AS n_vecs,
        |  sqrt(list_reduce(list(diff * diff ORDER BY dim),
        |    (a, b) -> a + b)) AS shift
        |FROM df GROUP BY grp ORDER BY source""".stripMargin,

    // Fightin'-Words mirror: exact integer counts, the fixed δ/σ op
    // sequence, z nano-floored before ranking (ties by term)
    "q_distinctive_terms" ->
      """WITH t AS (
        |  SELECT source AS grp,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |t2 AS (SELECT grp, term FROM t WHERE term != ''),
        |cell AS (SELECT grp, term, count(*) AS c FROM t2 GROUP BY 1, 2),
        |tw AS (SELECT term, CAST(sum(c) AS BIGINT) AS cw FROM cell GROUP BY 1),
        |gt AS (SELECT grp, CAST(sum(c) AS BIGINT) AS ng FROM cell GROUP BY 1),
        |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n_tot, count(*) AS v FROM tw),
        |sc AS (
        |  SELECT grp, term, CAST(floor(
        |    (ln((c + 1)::DOUBLE / (ng - c + v - 1)::DOUBLE)
        |     - ln((cw - c + 1)::DOUBLE
        |         / (n_tot - ng - (cw - c) + v - 1)::DOUBLE))
        |    / sqrt(1.0 / (c + 1)::DOUBLE + 1.0 / (cw - c + 1)::DOUBLE)
        |    * 1e9) AS BIGINT) AS z_nano
        |  FROM cell JOIN tw USING (term) JOIN gt USING (grp) CROSS JOIN tot),
        |r AS (
        |  SELECT grp, term, z_nano,
        |    row_number() OVER (PARTITION BY grp
        |      ORDER BY z_nano DESC, term) AS rank
        |  FROM sc)
        |SELECT grp AS source, rank, term, z_nano::DOUBLE / 1e9 AS z
        |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin,

    // PMI mirror: the same (df_ab·N)/(df_a·df_b) product chain into ln,
    // nano-floored before the global (pmi, pair) rank
    "q_collocations" ->
      s"""WITH e AS (
         |  SELECT doc_id, unnest(list_distinct(${shingleWSql(1)})) AS term
         |  FROM documents),
         |dfw AS (SELECT term, count(*) AS dfw FROM e GROUP BY 1),
         |n AS (SELECT count(*) AS nd FROM documents),
         |p AS (
         |  SELECT a.term AS term_a, b.term AS term_b,
         |    da.dfw AS df_a, db.dfw AS df_b, count(*) AS df_pair
         |  FROM e a JOIN e b ON a.doc_id = b.doc_id AND a.term < b.term
         |  JOIN dfw da ON da.term = a.term
         |  JOIN dfw db ON db.term = b.term
         |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 5),
         |sc AS (
         |  SELECT term_a, term_b, df_pair, CAST(floor(
         |    ln((df_pair::DOUBLE * nd::DOUBLE)
         |      / (df_a::DOUBLE * df_b::DOUBLE)) * 1e9) AS BIGINT) AS pmi_nano
         |  FROM p, n),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    ORDER BY pmi_nano DESC, term_a, term_b) AS rank
         |  FROM sc)
         |SELECT rank, term_a, term_b, df_pair, pmi_nano::DOUBLE / 1e9 AS pmi
         |FROM r WHERE rank <= 15 ORDER BY rank""".stripMargin,

    // Naive Bayes mirror: Laplace log-likelihood grid over label × vocab,
    // exact integer nano-sums per (doc, label), argmax ties to min label
    "q_nb_confusion" ->
      s"""WITH t AS (
         |  SELECT doc_id AS id, source AS actual, unnest($wordsSql) AS term
         |  FROM documents),
         |t2 AS (SELECT * FROM t WHERE term != ''),
         |cell AS (
         |  SELECT actual AS label, term, count(*) AS c FROM t2 GROUP BY 1, 2),
         |nl AS (SELECT label, CAST(sum(c) AS BIGINT) AS nl FROM cell GROUP BY 1),
         |vocab AS (SELECT DISTINCT term FROM cell),
         |vv AS (SELECT count(*) AS v FROM vocab),
         |nd AS (SELECT count(*) AS ndocs FROM documents),
         |pri AS (
         |  SELECT label, CAST(floor(ln(cnt::DOUBLE / ndocs::DOUBLE) * 1e9)
         |    AS BIGINT) AS prior_nano
         |  FROM (SELECT source AS label, count(*) AS cnt
         |        FROM documents GROUP BY 1), nd),
         |grid AS (
         |  SELECT nl.label, vocab.term, CAST(floor(
         |    ln((coalesce(cell.c, 0) + 1)::DOUBLE / (nl.nl + v)::DOUBLE)
         |    * 1e9) AS BIGINT) AS ll_nano
         |  FROM nl CROSS JOIN vocab CROSS JOIN vv
         |  LEFT JOIN cell ON cell.label = nl.label AND cell.term = vocab.term),
         |sc AS (
         |  SELECT t2.id, t2.actual, grid.label,
         |    CAST(sum(grid.ll_nano) AS BIGINT) AS tok_nano
         |  FROM t2 JOIN grid ON grid.term = t2.term GROUP BY 1, 2, 3),
         |sc2 AS (
         |  SELECT sc.id, sc.actual, sc.label,
         |    sc.tok_nano + pri.prior_nano AS score_nano
         |  FROM sc JOIN pri USING (label)),
         |r AS (
         |  SELECT id, actual, label, row_number() OVER (
         |    PARTITION BY id ORDER BY score_nano DESC, label) AS rk
         |  FROM sc2)
         |SELECT actual, label AS predicted, count(*) AS n_docs
         |FROM r WHERE rk = 1 GROUP BY 1, 2 ORDER BY actual, predicted""".stripMargin,

    "q_source_kl" ->
      s"""WITH w AS (
         |  SELECT source, $wordsSql AS ws FROM documents),
         |g AS (
         |  SELECT source, unnest(list_concat(ws,
         |    CASE WHEN len(ws) >= 2
         |      THEN [array_to_string(ws[i:i+1], ' ') FOR i IN range(1, len(ws))]
         |      ELSE [] END)) AS gram
         |  FROM w),
         |b AS (
         |  SELECT source,
         |    CAST(concat('0x', substring(md5(gram), 1, 8)) AS BIGINT) % 256 AS bucket
         |  FROM g),
         |sb AS (SELECT source, bucket, count(*) AS csb FROM b GROUP BY 1, 2),
         |cbn AS (SELECT bucket, count(*) AS cb FROM b GROUP BY 1),
         |nsn AS (SELECT source, CAST(sum(csb) AS BIGINT) AS nsrc
         |        FROM sb GROUP BY 1),
         |ntn AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM b),
         |fr AS (
         |  SELECT n.source, n.nsrc, r.range AS bucket,
         |    coalesce(sb.csb, 0) AS csb, coalesce(cbn.cb, 0) AS cb, ntn.ntot
         |  FROM nsn n
         |  CROSS JOIN range(256) r
         |  CROSS JOIN ntn
         |  LEFT JOIN sb ON sb.source = n.source AND sb.bucket = r.range
         |  LEFT JOIN cbn ON cbn.bucket = r.range),
         |co AS (
         |  SELECT source, nsrc,
         |    CAST(floor(((csb + 1)::DOUBLE / (nsrc + 256)::DOUBLE) *
         |      ln(((csb + 1)::DOUBLE / (cb + 1)::DOUBLE) *
         |         ((ntot + 256)::DOUBLE / (nsrc + 256)::DOUBLE)) * 1e9)
         |      AS BIGINT) AS contrib
         |  FROM fr)
         |SELECT source, CAST(min(nsrc) AS BIGINT) AS n_grams,
         |  CAST(sum(contrib) AS BIGINT) AS kl_nano
         |FROM co GROUP BY 1 ORDER BY source""".stripMargin,

    // DSIR per-doc importance scores: exact integer nano-sums over the
    // 256-bucket λ table; λ runs ONE ln over the identical
    // ((tc+1)/(rc+1))·((rt+B)/(tt+B)) op sequence, floored to the 1e-9
    // grid (the BM25 idf discipline)
    "q_dsir_scores" ->
      s"""$dsirCtes
         |SELECT doc_id, n_grams, score_nano FROM sc ORDER BY doc_id""".stripMargin,

    // Gumbel-top-100 resampling: digest-uniform u (the q_sample_weighted
    // construction), Gumbel draw floored to nano-units so the key is an
    // exact integer (raw nested-ln doubles disagree in low bits)
    "q_dsir_sample" ->
      s"""$dsirCtes,
         |ks AS (
         |  SELECT doc_id, score_nano,
         |    score_nano + CAST(floor(
         |      -ln(-ln((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |        AS BIGINT) + 1)::DOUBLE / 4294967297.0)) * 1e9) AS BIGINT)
         |      AS key_nano
         |  FROM sc)
         |SELECT doc_id, score_nano, key_nano FROM
         |  (SELECT * FROM ks ORDER BY key_nano DESC, doc_id LIMIT 100)
         |ORDER BY doc_id""".stripMargin,

    // token-budget mixture: DuckDB recomputes the per-source inclusive
    // running sum as the naive window (fine at oracle scale) — matching
    // proves the grouped two-phase prefix sum IS that window. Window sum
    // is HUGEINT → CAST AS BIGINT (contract #2).
    "q_mix_budget" ->
      """WITH tk AS (
        |  SELECT doc_id, source,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |      AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents
        |  WHERE source IN ('src0', 'src17', 'src3', 'src5', 'src9')),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY k, doc_id)
        |      AS BIGINT) AS cum_tokens
        |  FROM tk)
        |SELECT doc_id, source, n_tokens, cum_tokens
        |FROM c
        |WHERE cum_tokens <= CASE source
        |  WHEN 'src0' THEN 500 WHEN 'src3' THEN 120 WHEN 'src5' THEN 2000
        |  WHEN 'src9' THEN 64 WHEN 'src17' THEN 700 END
        |ORDER BY source, doc_id""".stripMargin,

    // temperature-mixture mirror: budgets re-derived in SQL — sqrt is
    // correctly rounded (bit-equal to the JVM's), the weight floors to
    // the 1e-6 grid, and the budget split is BIGINT multiply + floor
    // division (//) — then the q_mix_budget cumsum/filter with the
    // budget joined per source instead of a literal CASE
    "q_mix_temperature" ->
      """WITH tk AS (
        |  SELECT doc_id, source,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |      AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents),
        |tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t
        |  FROM tk GROUP BY 1),
        |sm AS (SELECT source,
        |    CAST(floor(sqrt(CAST(t AS DOUBLE)) * 1e6) AS BIGINT) AS s_micro
        |  FROM tot),
        |den AS (SELECT CAST(sum(s_micro) AS BIGINT) AS total FROM sm),
        |bud AS (SELECT source,
        |    CAST((8000 * s_micro) // den.total AS BIGINT) AS budget
        |  FROM sm, den),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY k, doc_id)
        |      AS BIGINT) AS cum_tokens
        |  FROM tk)
        |SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens, b.budget
        |FROM c JOIN bud b USING (source)
        |WHERE c.cum_tokens <= b.budget
        |ORDER BY source, doc_id""".stripMargin,

    // all-pairs exact-Jaccard truth for the LSH-candidate + verify pipeline:
    // matching asserts recall = 1 on this corpus and the verify arithmetic.
    // Jaccard over shingle STRINGS here vs distinct xxhash64 keys in Spark —
    // identical set sizes absent 64-bit collisions (none in this corpus).
    "q_dedup_minhash" ->
      s"""WITH e AS (
         |  SELECT doc_id, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents),
         |sz AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
         |c AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE AS jaccard
         |FROM c
         |JOIN sz sa ON sa.doc_id = id_a
         |JOIN sz sb ON sb.doc_id = id_b
         |WHERE c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE >= 0.6
         |ORDER BY id_a, id_b""".stripMargin,

    // all-pairs Hamming truth for the SimHash pipeline (portable md5 hash
    // family — see the catalog entry): signatures recomputed from scratch
    // (token md5 → 64-bit halves → per-bit ±1 voting, ties → 1, exactly
    // the SimHash64 kernel's rule), then EVERY pair at hamming ≤ 3 —
    // matching asserts the combination-block index is pigeonhole-complete.
    // Signatures live as two 32-bit halves (BIGINT-safe: bit 63 would
    // overflow a signed one-word sum); hamming = sum of half xor popcounts.
    "q_dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      x -> x <> '')) AS t
        |  FROM documents),
        |th AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) AS hi,
        |    CAST(concat('0x', substr(md5(t), 9, 8)) AS BIGINT) AS lo
        |  FROM tok),
        |votes AS (
        |  SELECT doc_id, j,
        |    sum((CASE WHEN j >= 32 THEN (hi >> (j - 32)) & 1
        |              ELSE (lo >> j) & 1 END) * 2 - 1) AS v
        |  FROM th CROSS JOIN range(64) r(j)
        |  GROUP BY doc_id, j),
        |bits AS (
        |  SELECT d.doc_id, r.j,
        |    CASE WHEN coalesce(v.v, 0) >= 0 THEN 1::BIGINT ELSE 0::BIGINT END AS bit
        |  FROM documents d CROSS JOIN range(64) r(j)
        |  LEFT JOIN votes v ON v.doc_id = d.doc_id AND v.j = r.j),
        |sig AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN j < 32 THEN bit << j ELSE 0 END) AS sig_lo,
        |    sum(CASE WHEN j >= 32 THEN bit << (j - 32) ELSE 0 END) AS sig_hi
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sig_lo, b.sig_lo))
        |     + bit_count(xor(a.sig_hi, b.sig_hi)) AS INTEGER) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig_lo, b.sig_lo))
        |    + bit_count(xor(a.sig_hi, b.sig_hi)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // independent reconstruction of the component labeling: same pair graph
    // (all-pairs exact Jaccard), transitive closure via recursive CTE,
    // label = min reachable id — vs Spark's iterated label propagation
    "q_dedup_clusters" -> clustersSql,

    // split-parity mirror: the leak-free split CTEs feed the PSI chain
    // with grp = split
    "q_split_parity" -> {
      val t1 = graft.llm.Sampling.digestThreshold(0.8)
      val t2 = graft.llm.Sampling.digestThreshold(0.9)
      s"""$clusterCtes,
         |lab AS (
         |  SELECT id AS doc_id, min(r) AS cluster_id
         |  FROM reach GROUP BY id),
         |sp AS (
         |  SELECT d.doc_id, d.n_chars,
         |    coalesce(l.cluster_id, d.doc_id) AS split_key
         |  FROM documents d LEFT JOIN lab l ON l.doc_id = d.doc_id),
         |b AS (
         |  SELECT CASE WHEN substring(md5(CAST(split_key AS VARCHAR)), 1, 4)
         |           < '$t1' THEN 'train'
         |         WHEN substring(md5(CAST(split_key AS VARCHAR)), 1, 4)
         |           < '$t2' THEN 'val'
         |         ELSE 'test' END AS grp,
         |    CAST(floor(n_chars / 200.0) AS BIGINT) AS band
         |  FROM sp),
         |cell AS (SELECT grp, band, count(*) AS c FROM b GROUP BY 1, 2),
         |base AS (SELECT band, CAST(sum(c) AS BIGINT) AS bc
         |  FROM cell GROUP BY 1),
         |ng AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n
         |  FROM cell GROUP BY 1),
         |tot AS (SELECT CAST(sum(bc) AS BIGINT) AS n_tot,
         |  count(*) AS n_bands FROM base),
         |grid AS (
         |  SELECT ng.grp, ng.n, base.band, base.bc,
         |    coalesce(cell.c, 0) AS c
         |  FROM ng CROSS JOIN base
         |  LEFT JOIN cell ON cell.grp = ng.grp AND cell.band = base.band),
         |x AS (
         |  SELECT grp, CAST(floor(
         |    ((c + 1)::DOUBLE / (n + n_bands)::DOUBLE
         |      - (bc + 1)::DOUBLE / (n_tot + n_bands)::DOUBLE)
         |    * ln(((c + 1)::DOUBLE / (n + n_bands)::DOUBLE)
         |      / ((bc + 1)::DOUBLE / (n_tot + n_bands)::DOUBLE))
         |    * 1e9) AS BIGINT) AS contrib
         |  FROM grid, tot)
         |SELECT grp AS split,
         |  CAST(sum(contrib) AS BIGINT)::DOUBLE / 1e9 AS psi
         |FROM x GROUP BY 1 ORDER BY split""".stripMargin
    },

    // leakage-free split mirror: the same recursive component labels,
    // coalesced onto the doc id, through the 16-bit digest thresholds
    "q_split_leakfree" -> {
      val t1 = graft.llm.Sampling.digestThreshold(0.8)
      val t2 = graft.llm.Sampling.digestThreshold(0.9)
      s"""$clusterCtes,
         |lab AS (
         |  SELECT id AS doc_id, min(r) AS cluster_id
         |  FROM reach GROUP BY id),
         |sp AS (
         |  SELECT d.doc_id,
         |    coalesce(l.cluster_id, d.doc_id) AS split_key
         |  FROM documents d LEFT JOIN lab l ON l.doc_id = d.doc_id)
         |SELECT doc_id, split_key,
         |  CASE WHEN substring(md5(CAST(split_key AS VARCHAR)), 1, 4)
         |           < '$t1' THEN 'train'
         |       WHEN substring(md5(CAST(split_key AS VARCHAR)), 1, 4)
         |           < '$t2' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM sp ORDER BY doc_id""".stripMargin
    },
    "q_pagerank" -> pagerankSql,

    // unrolled 4-round BFS mirror over the exact-Jaccard ≥ 0.6 edge set:
    // round h = (edges ⋈ frontier at d=h−1) ∪ settled, folded by min(d)
    "q_graph_bfs" -> {
      val rounds = (1 to 4).map { h =>
        s"""f$h AS (
           |  SELECT ed.dst AS id, CAST($h AS BIGINT) AS d
           |  FROM ed JOIN d${h - 1} ON d${h - 1}.id = ed.src
           |    AND d${h - 1}.d = ${h - 1}),
           |d$h AS (
           |  SELECT id, min(d) AS d FROM (
           |    SELECT * FROM d${h - 1} UNION ALL SELECT * FROM f$h) z
           |  GROUP BY id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT doc_id, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents),
         |sz AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
         |c AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM c
         |  JOIN sz sa ON sa.doc_id = id_a
         |  JOIN sz sb ON sb.doc_id = id_b
         |  WHERE c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE >= 0.6),
         |ed AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |       UNION ALL SELECT id_b, id_a FROM pairs),
         |n AS (SELECT DISTINCT doc_id AS id FROM documents),
         |d0 AS (SELECT DISTINCT doc_id AS id, CAST(0 AS BIGINT) AS d
         |       FROM documents WHERE doc_id < 20),
         |$rounds
         |SELECT n.id AS doc_id, d4.d AS hops
         |FROM n LEFT JOIN d4 ON d4.id = n.id
         |ORDER BY doc_id""".stripMargin
    },

    // per-cluster source-spread report over the same component labeling;
    // sources rendered as the sorted distinct list (list() aggregate +
    // list_sort — deterministic without relying on ordered string_agg)
    "q_dedup_provenance" ->
      s"""$clusterCtes,
         |lbl AS (SELECT id AS doc_id, min(r) AS cluster_id
         |  FROM reach GROUP BY id)
         |SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
         |  array_to_string(list_sort(list_distinct(list(d.source))), ',')
         |    AS sources
         |FROM lbl l JOIN documents d USING (doc_id)
         |GROUP BY 1 ORDER BY cluster_id""".stripMargin,

    // triangle/LCC mirror over the same label-blocked cosine pair graph:
    // a < b < c triple join counts each triangle once; LCC is one IEEE
    // division of exact integers, NULL below degree 2
    "q_graph_triangles" ->
      s"""WITH pr AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${dotSql("a.embedding", "b.embedding")} /
         |      (sqrt(${dotSql("a.embedding", "a.embedding")}) *
         |       sqrt(${dotSql("b.embedding", "b.embedding")})) >= 0.4),
         |tri AS (
         |  SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z
         |  FROM pr e1
         |  JOIN pr e2 ON e2.id_a = e1.id_b
         |  JOIN pr e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
         |deg AS (
         |  SELECT id, count(*) AS degree FROM (
         |    SELECT id_a AS id FROM pr UNION ALL SELECT id_b FROM pr)
         |  GROUP BY id),
         |tn AS (
         |  SELECT id, count(*) AS triangles FROM (
         |    SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
         |    UNION ALL SELECT z FROM tri)
         |  GROUP BY id)
         |SELECT d.id AS node_id, d.degree,
         |  coalesce(tn.triangles, 0) AS triangles,
         |  CASE WHEN d.degree >= 2
         |    THEN CAST(2 * coalesce(tn.triangles, 0) AS DOUBLE) /
         |         CAST(d.degree * (d.degree - 1) AS DOUBLE)
         |    ELSE NULL END AS lcc
         |FROM deg d LEFT JOIN tn ON tn.id = d.id
         |ORDER BY node_id""".stripMargin,

    // k-core mirror: the same label-blocked pair graph peeled through the
    // identical unrolled rounds (degree count → >= k filter → edge
    // restriction), final degrees over the surviving edges
    "q_graph_kcore" -> kcoreSql(2, 3),

    // unrolled 3-round synchronous LPA mirror over the exact-Jaccard ≥ 0.6
    // edge set: round t = neighbour-label vote counts joined against
    // labels(t−1), winner = (count DESC, label ASC), isolated nodes carry
    "q_graph_lpa" -> {
      val rounds = (1 to 3).map { i =>
        s"""v$i AS (
           |  SELECT ed.src, l.label, count(*) AS c
           |  FROM ed JOIN l${i - 1} l ON l.id = ed.dst GROUP BY 1, 2),
           |b$i AS (
           |  SELECT src AS id, label FROM (
           |    SELECT src, label,
           |      row_number() OVER (PARTITION BY src ORDER BY c DESC, label) AS rn
           |    FROM v$i) z WHERE rn = 1),
           |l$i AS (
           |  SELECT l${i - 1}.id, coalesce(b$i.label, l${i - 1}.label) AS label
           |  FROM l${i - 1} LEFT JOIN b$i USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT doc_id, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents),
         |sz AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
         |c AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM c
         |  JOIN sz sa ON sa.doc_id = id_a
         |  JOIN sz sb ON sb.doc_id = id_b
         |  WHERE c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE >= 0.6),
         |ed AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |       UNION ALL SELECT id_b, id_a FROM pairs),
         |l0 AS (SELECT DISTINCT doc_id AS id, doc_id AS label FROM documents),
         |$rounds
         |SELECT id AS doc_id, label AS community
         |FROM l3 ORDER BY doc_id""".stripMargin
    },

    // snapshot-diff status mirror: same %10 version construction, digest
    // compare via md5 on both engines (ASCII-safe — md5 hashes utf8 bytes
    // identically)
    "q_corpus_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 10 = 7 THEN substring(text, 1, 40)
        |             ELSE text END) AS old_digest
        |  FROM documents WHERE doc_id % 10 <> 3),
        |v2 AS (
        |  SELECT doc_id, md5(text) AS new_digest
        |  FROM documents WHERE doc_id % 10 <> 5)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN old_digest IS NULL THEN 'added'
        |       WHEN new_digest IS NULL THEN 'removed'
        |       WHEN old_digest <> new_digest THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |ORDER BY doc_id""".stripMargin,

    // dataset card: exact longs everywhere (DuckDB int sums cast from
    // HUGEINT), ratios as single IEEE divisions — bit-portable
    "q_dataset_card" ->
      s"""WITH p AS (
         |  SELECT doc_id, lang, source, n_chars,
         |    CAST(len($wordsSql) AS BIGINT) AS n_words, md5(text) AS digest
         |  FROM documents),
         |a AS (
         |  SELECT count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS n_tokens,
         |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |    count(DISTINCT source) AS n_sources,
         |    count(DISTINCT lang) AS n_langs,
         |    count(DISTINCT digest) AS n_unique
         |  FROM p)
         |SELECT n_docs, n_tokens, total_chars, n_sources, n_langs, n_unique,
         |  (n_docs - n_unique)::DOUBLE / n_docs::DOUBLE AS dup_rate,
         |  n_tokens::DOUBLE / n_docs::DOUBLE AS avg_words
         |FROM a""".stripMargin,

    // the incremental maintenance path must be INDISTINGUISHABLE from the
    // full recompute — same truth, literally the same SQL
    "q_dedup_incr_clusters" -> clustersSql,
    // deletion-aware label maintenance: the maintained labeling must be
    // indistinguishable from a full recompute over corpus ∖ deleted
    "q_dedup_incr_delete" -> clustersSqlWhere("WHERE doc_id % 10 <> 3"),

    // streamed fold ≡ full recompute over the whole corpus / survivors
    "q_dedup_stream" -> clustersSql,
    "q_dedup_stream_erasure" -> clustersSqlWhere("WHERE doc_id % 10 <> 6"),
    // erase → re-ingest churn serves the FULL corpus again: the
    // version-ordered erasure join keeps the returned docs' rows alive
    "q_dedup_stream_reingest" -> clustersSql,

    // same recursive-CTE component labeling as q_dedup_clusters, then a
    // window argmax (n_chars desc, doc_id) per cluster + anti-joined
    // singletons
    "q_dedup_canonical" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT doc_id, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents),
         |sz AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
         |c AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM c
         |  JOIN sz sa ON sa.doc_id = id_a
         |  JOIN sz sb ON sb.doc_id = id_b
         |  WHERE c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE >= 0.6),
         |edges AS (
         |  SELECT id_a AS s, id_b AS d FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, s FROM edges
         |  UNION
         |  SELECT reach.id, e2.d FROM reach JOIN edges e2 ON e2.s = reach.r),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
         |best AS (
         |  SELECT d.doc_id, cl.cluster_id,
         |    count(*) OVER (PARTITION BY cl.cluster_id) AS n_members,
         |    d.n_chars,
         |    row_number() OVER (PARTITION BY cl.cluster_id
         |      ORDER BY d.n_chars DESC, d.doc_id) AS rn
         |  FROM documents d JOIN cl ON d.doc_id = cl.doc_id)
         |SELECT doc_id, cluster_id, n_members, n_chars
         |FROM best WHERE rn = 1
         |UNION ALL
         |SELECT doc_id, doc_id AS cluster_id, CAST(1 AS BIGINT) AS n_members,
         |  n_chars
         |FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM cl)
         |ORDER BY doc_id""".stripMargin,

    // value-defined RANGE frame over epoch seconds; decimal-exact sum ⇒
    // tie-order independent on both engines
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w
        |    AS VARCHAR) AS DOUBLE) AS trailing_spend,
        |  count(*) OVER w AS n_orders_window
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    // single global window cumsum — the semantics the distributed two-phase
    // prefix sum must reproduce exactly
    "q_pack_sequences" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |      AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST(floor(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::DOUBLE
        |    / 4096) AS BIGINT) AS shard
        |FROM tk ORDER BY doc_id""".stripMargin,

    // epoch-shuffle mirror: the two-phase distributed rank must equal
    // the single global row_number over the same (md5, key) order
    "q_epoch_shuffle" ->
      """SELECT doc_id AS shuffle_key,
        |  CAST(row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':e1'), doc_id) - 1
        |    AS BIGINT) AS shuffle_pos
        |FROM documents ORDER BY shuffle_key""".stripMargin,

    // fill report mirror: the same exclusive-cumsum shard assignment,
    // aggregated; the share is one IEEE division over exact integer sums
    "q_pack_efficiency" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |sh AS (
        |  SELECT n_tokens,
        |    CAST(floor(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::DOUBLE
        |      / 4096) AS BIGINT) AS shard
        |  FROM tk)
        |SELECT shard, count(*) AS n_docs,
        |  sum(n_tokens)::BIGINT AS shard_tokens,
        |  sum(n_tokens)::BIGINT::DOUBLE / 4096.0 AS fill_share
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,

    // context-window packing mirror: same exclusive global cumsum, then
    // pure integer window math (seq = floor(gpos/context), off = gpos −
    // seq·context)
    "q_pack_windows" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS gpos
        |  FROM tk),
        |w AS (
        |  SELECT doc_id, n_tokens, gpos,
        |    CAST(floor(gpos::DOUBLE / 2048) AS BIGINT) AS seq_id
        |  FROM p)
        |SELECT doc_id, n_tokens, gpos, seq_id,
        |  CAST(gpos - seq_id * 2048 AS BIGINT) AS seq_off
        |FROM w ORDER BY doc_id""".stripMargin,

    // per-vector min/max codebook mirror; expression tree order pinned
    // ((x - vmin) * 255) / (vmax - vmin), floor, clamp — float->double
    // widening is exact on both engines
    "q_embed_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    list_aggregate(embedding, 'min')::DOUBLE AS vmin,
        |    list_aggregate(embedding, 'max')::DOUBLE AS vmax
        |  FROM embeddings)
        |SELECT vec_id, vmin, vmax,
        |  CASE WHEN vmax = vmin
        |    THEN array_to_string([0 FOR x IN embedding], ',')
        |    ELSE array_to_string(list_transform(embedding,
        |      x -> CAST(least(floor(((x::DOUBLE - vmin) * 255) / (vmax - vmin)),
        |        255) AS BIGINT)), ',')
        |  END AS codes
        |FROM q ORDER BY vec_id""".stripMargin,

    // posting-list mirror of ngramJaccardPairs incl. the DF-pruned shingle
    // universe (HAVING count <= maxDf) — J over pruned sets, maxDf=2.
    // MinHash contract mirror: the unblocked exact-Jaccard pair frame (no
    // DF pruning — maxDf above doc count) with the TRUE accuracy
    // prediction; the estimate itself is xxhash-family-specific
    "q_minhash_est" ->
      s"""WITH e AS (
         |  SELECT doc_id, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents),
         |sz AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
         |c AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE AS jaccard,
         |  TRUE AS est_close
         |FROM c
         |JOIN sz sa ON sa.doc_id = id_a
         |JOIN sz sb ON sb.doc_id = id_b
         |WHERE c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,

    "q_ngram_jaccard" ->
      s"""WITH e AS (
         |  SELECT doc_id, source, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents),
         |keep AS (
         |  SELECT source, h FROM e GROUP BY source, h HAVING count(*) <= 2),
         |p AS (SELECT e.doc_id, e.source, e.h FROM e JOIN keep USING (source, h)),
         |sz AS (SELECT doc_id, count(*) AS sz FROM p GROUP BY doc_id),
         |c AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM p a JOIN p b ON a.source = b.source AND a.h = b.h
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE AS jaccard
         |FROM c
         |JOIN sz sa ON sa.doc_id = id_a
         |JOIN sz sb ON sb.doc_id = id_b
         |WHERE c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,

    // all-pairs-within-block truth (the DEFAULT row): blocked linkage
    // only compares records sharing the (lang, source) key, and within a
    // block it is exact
    "q_fuzzy_match" ->
      """WITH r AS (
        |  SELECT doc_id, substring(text, 1, 40) AS rec, lang, source
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.rec, b.rec) AS BIGINT) AS dist
        |FROM r a JOIN r b ON a.doc_id < b.doc_id
        |  AND a.lang = b.lang AND a.source = b.source
        |WHERE abs(len(a.rec) - len(b.rec)) <= 5
        |  AND levenshtein(a.rec, b.rec) <= 5
        |ORDER BY id_a, id_b""".stripMargin,

    // naive all-pairs edit-distance truth (small-SF correctness row) —
    // the banding + thresholded-DP plan must reproduce it exactly
    "q_fuzzy_allpairs" ->
      """WITH r AS (
        |  SELECT doc_id, substring(text, 1, 40) AS rec FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.rec, b.rec) AS BIGINT) AS dist
        |FROM r a JOIN r b ON a.doc_id < b.doc_id
        |WHERE abs(len(a.rec) - len(b.rec)) <= 5
        |  AND levenshtein(a.rec, b.rec) <= 5
        |ORDER BY id_a, id_b""".stripMargin,

    // the naive all-pairs truth: the prefix filter is LOSSLESS, so the
    // Spark side's filtered plan must reproduce this exactly — the oracle
    // match IS the completeness proof
    "q_jaccard_prefix" ->
      s"""WITH e AS (
         |  SELECT doc_id, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents),
         |sz AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
         |c AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE AS jaccard
         |FROM c
         |JOIN sz sa ON sa.doc_id = id_a
         |JOIN sz sb ON sb.doc_id = id_b
         |WHERE c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE >= 0.6
         |ORDER BY id_a, id_b""".stripMargin,

    // list_reduce (not list_sum) pins sequential left-to-right summation —
    // bit-exact parity with Spark's aggregate() fold.
    "q_knn_brute" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id < 10),
         |scored AS (
         |  SELECT qid, vec_id AS neighbor_id,
         |    $dotQv / (sqrt($dotQq) * sqrt($dotVv)) AS score
         |  FROM embeddings, q WHERE qid <> vec_id),
         |ranked AS (
         |  SELECT qid, neighbor_id, score,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT qid, rank, neighbor_id, score FROM ranked
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // q_knn_brute with the corpus gated by the documents metadata filter;
    // queries (vec_id < 10) stay unfiltered
    // q_knn_brute's cosine chain with the label-mismatch theta: negatives
    // must be CLOSE but differently-labeled
    "q_knn_hard_negatives" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, label AS qlabel, embedding AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT qid, vec_id AS neighbor_id,
         |    $dotQv / (sqrt($dotQq) * sqrt($dotVv)) AS score
         |  FROM embeddings, q WHERE qlabel <> label),
         |ranked AS (
         |  SELECT qid, neighbor_id, score,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT qid, rank, neighbor_id, score FROM ranked
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // triplet mirror: same-label top-1 positive joined onto the
    // hard-negative top-3 per anchor
    "q_contrastive_triplets" ->
      s"""$tripletCtes
         |SELECT pos.qid AS qid, pos_id, pos_score, neg_rank, neg_id,
         |  neg_score
         |FROM pos JOIN neg ON pos.qid = neg.qid
         |ORDER BY pos.qid, neg_rank""".stripMargin,

    // triplet-health mirror: pos_score is constant per anchor (max =
    // Spark's first), margins micro-floored, one published division
    "q_triplet_report" ->
      s"""$tripletCtes,
         |per AS (
         |  SELECT pos.qid AS qid, max(pos_score) AS ps,
         |    max(neg_score) AS mn
         |  FROM pos JOIN neg ON pos.qid = neg.qid GROUP BY pos.qid),
         |pp AS (
         |  SELECT qid, ps > mn AS ok,
         |    CAST(floor((ps - mn) * 1e6) AS BIGINT) AS mm
         |  FROM per)
         |SELECT count(*)::BIGINT AS n_anchors,
         |  sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS n_satisfied,
         |  sum(mm)::BIGINT AS margin_micro_sum,
         |  sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT::DOUBLE
         |    / count(*)::BIGINT::DOUBLE AS satisfied_share
         |FROM pp""".stripMargin,

    "q_knn_filtered" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id < 10),
         |c AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id IN (SELECT doc_id FROM documents WHERE n_chars >= 400)),
         |scored AS (
         |  SELECT qid, vec_id AS neighbor_id,
         |    $dotQv / (sqrt($dotQq) * sqrt($dotVv)) AS score
         |  FROM c, q WHERE qid <> vec_id),
         |ranked AS (
         |  SELECT qid, neighbor_id, score,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT qid, rank, neighbor_id, score FROM ranked
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q_mmr_rerank" -> mmrSql,

    // team-draft mirror: both rankers' lists rebuilt, two unrolled
    // rounds with the same md5 coins and first-unpicked drafts
    "q_team_draft" ->
      s"""WITH $mltCtes,
         |bq AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id < 10),
         |bsc AS (
         |  SELECT qid, vec_id AS neighbor_id,
         |    $dotQv / (sqrt($dotQq) * sqrt($dotVv)) AS score
         |  FROM embeddings, bq WHERE qid <> vec_id),
         |brk AS (
         |  SELECT qid, neighbor_id, row_number() OVER (PARTITION BY qid
         |    ORDER BY score DESC, neighbor_id) AS rank FROM bsc),
         |lla AS (SELECT qid, list(neighbor_id ORDER BY rank) AS la
         |  FROM brk WHERE rank <= 5 GROUP BY qid),
         |llb AS (SELECT qid, list(nid ORDER BY rank) AS lb
         |  FROM mlt WHERE rank <= 5 GROUP BY qid),
         |dd AS (
         |  SELECT lla.qid, lla.la, llb.lb,
         |    CAST(concat('0x', substring(md5(CAST(lla.qid AS VARCHAR)
         |      || ':round0'), 1, 8)) AS BIGINT) % 2 = 0 AS c0,
         |    CAST(concat('0x', substring(md5(CAST(lla.qid AS VARCHAR)
         |      || ':round1'), 1, 8)) AS BIGINT) % 2 = 0 AS c1
         |  FROM lla JOIN llb USING (qid)),
         |s1 AS (SELECT *, CASE WHEN c0 THEN la[1] ELSE lb[1] END AS pa1,
         |  CASE WHEN c0 THEN 'A' ELSE 'B' END AS ta1 FROM dd),
         |s2 AS (SELECT *, CASE WHEN ta1 = 'A'
         |    THEN list_filter(lb, x -> x <> pa1)[1]
         |    ELSE list_filter(la, x -> x <> pa1)[1] END AS pa2,
         |  CASE WHEN ta1 = 'A' THEN 'B' ELSE 'A' END AS ta2 FROM s1),
         |s3 AS (SELECT *, CASE WHEN c1
         |    THEN list_filter(la, x -> NOT list_contains([pa1, pa2], x))[1]
         |    ELSE list_filter(lb, x -> NOT list_contains([pa1, pa2], x))[1]
         |    END AS pa3,
         |  CASE WHEN c1 THEN 'A' ELSE 'B' END AS ta3 FROM s2),
         |s4 AS (SELECT *, CASE WHEN ta3 = 'A'
         |    THEN list_filter(lb, x -> NOT list_contains([pa1, pa2, pa3], x))[1]
         |    ELSE list_filter(la, x -> NOT list_contains([pa1, pa2, pa3], x))[1]
         |    END AS pa4,
         |  CASE WHEN ta3 = 'A' THEN 'B' ELSE 'A' END AS ta4 FROM s3)
         |SELECT qid, CAST(p AS BIGINT) AS pos, doc_id, team FROM (
         |  SELECT qid, 1 AS p, pa1 AS doc_id, ta1 AS team FROM s4
         |  UNION ALL SELECT qid, 2, pa2, ta2 FROM s4
         |  UNION ALL SELECT qid, 3, pa3, ta3 FROM s4
         |  UNION ALL SELECT qid, 4, pa4, ta4 FROM s4)
         |ORDER BY qid, pos""".stripMargin,

    // more-like-this mirror: same idf form as q_tfidf, micro-floored
    // per-term products before exact integer sums, same rails
    "q_more_like_this" ->
      s"""WITH $mltCtes
         |SELECT qid, rank, nid AS neighbor_id, sim FROM mlt
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // identical to q_knn_brute: full-probe IVF is exact by construction
    "q_knn_ivf" -> knnIvfSql,
    // streamed IVF state, full probe ⇒ exact over the live corpus; the
    // erasure row serves survivors (queries AND corpus filtered)
    "q_knn_ivf_stream" -> knnIvfSql,
    "q_knn_ivf_stream_erasure" -> knnIvfSqlWhere("AND vec_id % 10 <> 4"),
    // prebuilt-artifact serving form: bit-identical to the inline IVF
    "q_knn_ivf_indexed" -> knnIvfSql,

    // bigram LM mirror: add-one-smoothed P over corpus counts; the per-doc
    // mean folds ln terms in sorted-gram order with a 0.0-prepended
    // list_reduce — exactly Spark's aggregate(terms, 0.0, +) fold
    "q_lm_score" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |    unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w1
         |  FROM documents),
         |c1 AS (SELECT w1, count(*) AS c1 FROM w GROUP BY w1),
         |v AS (SELECT count(DISTINCT w1) AS v FROM w),
         |b AS (
         |  SELECT doc_id, unnest(${shingleWSql(2)}) AS gram
         |  FROM documents WHERE len($wordsSql) >= 2),
         |c2 AS (SELECT gram, count(*) AS c2 FROM b GROUP BY gram),
         |t AS (
         |  SELECT doc_id, b.gram,
         |    ln((c2.c2 + 1.0) / (c1.c1 + v.v::DOUBLE)) AS lnp
         |  FROM b
         |  JOIN c2 USING (gram)
         |  JOIN c1 ON c1.w1 = split_part(b.gram, ' ', 1), v),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_bigrams,
         |    list(lnp ORDER BY gram) AS lnps
         |  FROM t GROUP BY doc_id)
         |SELECT doc_id, n_bigrams,
         |  CAST(floor(list_reduce(list_prepend(0.0::DOUBLE, lnps),
         |    (x, y) -> x + y) / n_bigrams::DOUBLE * 1e6) AS BIGINT)
         |    AS lm_score_micro
         |FROM agg ORDER BY doc_id""".stripMargin,

    "q_media_resize" ->
      """SELECT doc_id AS media_id,
        |  array_to_string([substr(text, ((j * len(text)) // 32)::INT + 1, 1)
        |    FOR j IN range(0, 32)], '') AS resized
        |FROM documents ORDER BY media_id""".stripMargin,

    // exact-regime SpaceSaving ≡ exact counts with zero error bound
    "q_heavy_hitters" ->
      """WITH w AS (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |ww AS (SELECT * FROM w WHERE term <> '')
        |SELECT term, count(*) AS cnt, CAST(0 AS BIGINT) AS err
        |FROM ww GROUP BY term ORDER BY cnt DESC, term LIMIT 20""".stripMargin,

    // per-group mirror: exact per-source counts (capacity ≥ group vocab ⇒
    // the sketch is exact), identical (cnt DESC, term) rank order
    "q_heavy_hitters_by_source" ->
      """WITH w AS (
        |  SELECT source,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |ww AS (SELECT * FROM w WHERE term <> ''),
        |c AS (SELECT source, term, count(*) AS cnt FROM ww GROUP BY 1, 2),
        |r AS (
        |  SELECT source, term, cnt, CAST(0 AS BIGINT) AS err,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY cnt DESC, term) AS INT) AS rank
        |  FROM c)
        |SELECT source, term, cnt, err, rank FROM r
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,

    // single-pass CMS build: the Spark row's two-shard merge must be
    // indistinguishable from this — the mergeability claim IS the oracle.
    // Bucket = md5("j:term") 8-hex prefix mod 64, the Sampling digest
    // convention (engine-portable).
    "q_cms_sketch" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |cells AS (
        |  SELECT j.range AS depth,
        |    CAST(concat('0x', substring(md5(CAST(j.range AS VARCHAR) || ':' || term), 1, 8))
        |      AS BIGINT) % 64 AS bucket
        |  FROM toks, range(4) j)
        |SELECT CAST(depth AS INT) AS depth, bucket, count(*) AS cnt
        |FROM cells GROUP BY 1, 2 ORDER BY depth, bucket""".stripMargin,

    // linear-sketch erasure: maintained sketch ≡ rebuild over survivors
    "q_cms_delete" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |  FROM documents WHERE doc_id % 10 <> 6),
        |cells AS (
        |  SELECT j.range AS depth,
        |    CAST(concat('0x', substring(md5(CAST(j.range AS VARCHAR) || ':' || term), 1, 8))
        |      AS BIGINT) % 64 AS bucket
        |  FROM toks, range(4) j)
        |SELECT CAST(depth AS INT) AS depth, bucket, count(*) AS cnt
        |FROM cells GROUP BY 1, 2 ORDER BY depth, bucket""".stripMargin,

    // inner-product mirror: both sketches rebuilt over stringified keys,
    // per-depth product sums (disjoint depths contribute 0), min, and
    // the exact per-key count join
    "q_join_size_est" ->
      """WITH ka AS (SELECT CAST(user_id AS VARCHAR) AS term FROM events),
        |kb AS (SELECT CAST(o_custkey AS VARCHAR) AS term FROM orders),
        |ca AS (
        |  SELECT j.range AS depth,
        |    CAST(concat('0x', substring(md5(CAST(j.range AS VARCHAR) || ':' || term), 1, 8))
        |      AS BIGINT) % 64 AS bucket, count(*) AS cnt
        |  FROM ka, range(4) j GROUP BY 1, 2),
        |cb AS (
        |  SELECT j.range AS depth,
        |    CAST(concat('0x', substring(md5(CAST(j.range AS VARCHAR) || ':' || term), 1, 8))
        |      AS BIGINT) % 64 AS bucket, count(*) AS cnt
        |  FROM kb, range(4) j GROUP BY 1, 2),
        |ip AS (
        |  SELECT ca.depth, sum(ca.cnt * cb.cnt) AS ip
        |  FROM ca JOIN cb ON ca.depth = cb.depth AND ca.bucket = cb.bucket
        |  GROUP BY ca.depth),
        |est AS (
        |  SELECT min(coalesce(ip.ip, 0))::BIGINT AS est_join_size
        |  FROM range(4) d LEFT JOIN ip ON ip.depth = d.range),
        |fa AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1),
        |fb AS (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1),
        |ex AS (
        |  SELECT coalesce(sum(fa.c * fb.c), 0)::BIGINT AS exact_join_size
        |  FROM fa JOIN fb USING (k))
        |SELECT est_join_size, exact_join_size,
        |  est_join_size >= exact_join_size AS overestimate
        |FROM est, ex""".stripMargin,

    "q_cms_counts" ->
      s"""WITH toks AS (
         |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
         |  FROM documents),
         |cells AS (
         |  SELECT j.range AS depth,
         |    CAST(concat('0x', substring(md5(CAST(j.range AS VARCHAR) || ':' || term), 1, 8))
         |      AS BIGINT) % 64 AS bucket
         |  FROM toks, range(4) j),
         |sk AS (SELECT depth, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
         |p AS (SELECT unnest([${llm.Sketch.CmsPanel.map("'" + _ + "'").mkString(", ")}]) AS term),
         |pc AS (
         |  SELECT p.term, j.range AS depth,
         |    CAST(concat('0x', substring(md5(CAST(j.range AS VARCHAR) || ':' || p.term), 1, 8))
         |      AS BIGINT) % 64 AS bucket
         |  FROM p, range(4) j),
         |est AS (
         |  SELECT term, min(coalesce(sk.cnt, 0)) AS est_count
         |  FROM pc LEFT JOIN sk USING (depth, bucket) GROUP BY term),
         |ex AS (
         |  SELECT term, count(*) AS c FROM toks
         |  WHERE term IN (SELECT term FROM p) GROUP BY term)
         |SELECT est.term, est_count, coalesce(ex.c, 0) AS exact_count,
         |  est_count >= coalesce(ex.c, 0) AS overestimate
         |FROM est LEFT JOIN ex USING (term) ORDER BY term""".stripMargin,

    // deterministic md5-hash KMV sketch ⇒ the error contract is a fact the
    // oracle can predict (measured worst-source error 12.5% << 20% bound)
    "q_sketch_kmv" ->
      s"""WITH e AS (
         |  SELECT source, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents)
         |SELECT source, count(DISTINCT h) AS exact_terms,
         |  TRUE AS kmv_within_20pct
         |FROM e GROUP BY source ORDER BY source""".stripMargin,

    // incremental maintenance must equal the full rebuild — same oracle
    "q_sketch_kmv_incr" ->
      s"""WITH e AS (
         |  SELECT source, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents)
         |SELECT source, count(DISTINCT h) AS exact_terms,
         |  TRUE AS kmv_within_20pct
         |FROM e GROUP BY source ORDER BY source""".stripMargin,

    // deletion-maintained sketch estimates against the SURVIVOR truth
    "q_kmv_delete" ->
      s"""WITH e AS (
         |  SELECT source, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents WHERE doc_id % 10 <> 6)
         |SELECT source, count(DISTINCT h) AS exact_terms,
         |  TRUE AS kmv_within_20pct
         |FROM e GROUP BY source ORDER BY source""".stripMargin,

    "q_sketch_kmv_setops" ->
      s"""WITH e AS (
         |  SELECT source, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents WHERE source IN ('src0', 'src1')),
         |g AS (SELECT h, count(DISTINCT source) AS ns FROM e GROUP BY h)
         |SELECT count(*) AS exact_union,
         |  count(CASE WHEN ns = 2 THEN 1 END) AS exact_intersect,
         |  TRUE AS union_within_10pct,
         |  TRUE AS intersect_within_20pct
         |FROM g""".stripMargin,

    // bottom-k quantile sketch: the md5-prefix row hash is the repo's
    // portability idiom, so DuckDB replays the ENTIRE chain (hash →
    // bottom-k → order statistic) value-exactly; only the rank-error
    // boolean is a predicted contract (TRUE, the kmv_within_20pct
    // discipline). Panel q's cast to DOUBLE so ceil(q·m) is the same
    // IEEE arithmetic Spark runs.
    "q_quantile_sketch" -> quantileSketchOracle,

    // merge of disjoint shard sketches ≡ full rebuild — same oracle
    "q_quantile_merge" -> quantileSketchOracle,

    // deletion-maintained sketch: mirror the WHOLE protocol — anti-join
    // the doomed hashes, flag groups under minKeep=200, rebuild flagged
    // groups from survivors only, estimate over the union
    "q_quantile_delete" ->
      s"""$quantileSketchCtes,
         |del AS (
         |  SELECT DISTINCT event_type AS grp,
         |    CAST(concat('0x',
         |      substring(md5(CAST(event_id AS VARCHAR)), 1, 14)) AS BIGINT) AS h
         |  FROM events WHERE event_id % 10 = 3),
         |tr AS (
         |  SELECT kk.grp, kk.h, kk.v FROM kk
         |  WHERE NOT EXISTS (SELECT 1 FROM del
         |    WHERE del.grp = kk.grp AND del.h = kk.h)),
         |fl AS (
         |  SELECT g.grp, coalesce(t.cnt, 0) < 200 AS needs_rebuild
         |  FROM (SELECT grp FROM kk GROUP BY grp) g
         |  LEFT JOIN (SELECT grp, count(*) AS cnt FROM tr GROUP BY grp) t
         |    USING (grp)),
         |sv AS (
         |  SELECT event_type AS grp,
         |    CAST(concat('0x',
         |      substring(md5(CAST(event_id AS VARCHAR)), 1, 14)) AS BIGINT) AS h,
         |    CAST(value AS DOUBLE) AS v
         |  FROM events WHERE event_id % 10 <> 3),
         |rb0 AS (
         |  SELECT grp, h, v,
         |    row_number() OVER (PARTITION BY grp ORDER BY h, v) AS rnk
         |  FROM sv
         |  WHERE grp IN (SELECT grp FROM fl WHERE needs_rebuild)),
         |mt AS (
         |  SELECT tr.grp, tr.h, tr.v FROM tr JOIN fl USING (grp)
         |  WHERE NOT needs_rebuild
         |  UNION ALL SELECT grp, h, v FROM rb0 WHERE rnk <= 256),
         |${qEstimateSql("mt", qPanel3, "rank_within_15pct")}""".stripMargin,

    // bucketing mirror: quartile boundaries off the mirrored sketch,
    // bucket = CASE chain over the monotone boundaries (≡ the count of
    // boundaries strictly below the value)
    "q_quantile_bucket" ->
      s"""$quantileSketchCtes,
         |m AS (SELECT grp, count(*) AS m FROM kk GROUP BY grp),
         |r AS (SELECT grp, h, v,
         |    row_number() OVER (PARTITION BY grp ORDER BY v, h) AS rv
         |  FROM kk),
         |p(qlabel, q) AS (VALUES ('b0', CAST(0.25 AS DOUBLE)),
         |  ('b1', CAST(0.5 AS DOUBLE)), ('b2', CAST(0.75 AS DOUBLE))),
         |est AS (
         |  SELECT r.grp, p.qlabel, r.v AS ev FROM r JOIN m USING (grp)
         |  JOIN p ON r.rv = greatest(CAST(1 AS BIGINT),
         |    CAST(ceil(p.q * m.m) AS BIGINT))),
         |bd AS (
         |  SELECT grp,
         |    max(CASE WHEN qlabel = 'b0' THEN ev END) AS b0,
         |    max(CASE WHEN qlabel = 'b1' THEN ev END) AS b1,
         |    max(CASE WHEN qlabel = 'b2' THEN ev END) AS b2
         |  FROM est GROUP BY grp),
         |bkt AS (
         |  SELECT s.grp, CASE WHEN s.v > bd.b2 THEN 3
         |    WHEN s.v > bd.b1 THEN 2 WHEN s.v > bd.b0 THEN 1
         |    ELSE 0 END AS bucket
         |  FROM s JOIN bd USING (grp))
         |SELECT grp AS event_type, bucket, count(*) AS n_rows,
         |  TRUE AS bucket_within_12pct
         |FROM bkt GROUP BY grp, bucket
         |ORDER BY event_type, bucket""".stripMargin,

    // windowed-quantile mirror: same chain over the composite
    // (day|event_type) group at k=128
    "q_quantile_windowed" ->
      s"""WITH s AS (
         |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d')
         |      || '|' || event_type AS grp,
         |    CAST(concat('0x',
         |      substring(md5(CAST(event_id AS VARCHAR)), 1, 14)) AS BIGINT) AS h,
         |    CAST(value AS DOUBLE) AS v
         |  FROM events),
         |b AS (
         |  SELECT grp, h, v,
         |    row_number() OVER (PARTITION BY grp ORDER BY h, v) AS rnk
         |  FROM s),
         |kk AS (SELECT grp, h, v FROM b WHERE rnk <= 128),
         |${qEstimateSql("kk", Seq("p50" -> "0.5", "p90" -> "0.9"),
            "rank_within_20pct")}""".stripMargin,

    // rank-of mirror: the sample is replayed exactly, the CDF fraction is
    // integer counts + one division — bit-identical; the additive-error
    // boolean is the predicted contract
    "q_quantile_rank" ->
      s"""$quantileSketchCtes,
         |p(xlabel, x) AS (VALUES ('x10', CAST(10.0 AS DOUBLE)),
         |  ('x150', CAST(150.0 AS DOUBLE)), ('x50', CAST(50.0 AS DOUBLE)))
         |SELECT kk.grp, p.xlabel, p.x,
         |  count(CASE WHEN kk.v <= p.x THEN 1 END)::DOUBLE
         |    / count(*)::DOUBLE AS est_frac_le,
         |  TRUE AS cdf_within_12pct
         |FROM kk CROSS JOIN p
         |GROUP BY kk.grp, p.xlabel, p.x
         |ORDER BY grp, xlabel""".stripMargin,

    // streamed theta-quantile state: replay the whole three-batch fold —
    // build(b0) ∪θ build(b1), minus the doomed hashes, ∪θ build(b2 adds) —
    // then estimate; only the rank boolean is a predicted contract
    "q_quantile_stream" ->
      s"""WITH s AS (
         |  SELECT event_type AS grp, event_id AS eid,
         |    CAST(concat('0x',
         |      substring(md5(CAST(event_id AS VARCHAR)), 1, 14)) AS BIGINT) AS h,
         |    CAST(value AS DOUBLE) AS v
         |  FROM events),
         |${qtBuildSql("a", "eid % 3 = 0", 256)},
         |${qtBuildSql("bb", "eid % 3 = 1", 256)},
         |${qtMergeSql("m1", "arows", "ataus", "bbrows", "bbtaus", 256)},
         |del AS (
         |  SELECT DISTINCT grp, h FROM s
         |  WHERE eid % 10 = 3 AND eid % 3 <> 2),
         |d1rows AS (
         |  SELECT m.grp, m.h, m.v FROM m1rows m
         |  WHERE NOT EXISTS (SELECT 1 FROM del
         |    WHERE del.grp = m.grp AND del.h = m.h)),
         |${qtBuildSql("e", "eid % 3 = 2 AND eid % 10 <> 3", 256)},
         |${qtMergeSql("m2", "d1rows", "m1taus", "erows", "etaus", 256)},
         |${qEstimateSql("m2rows", qPanel3, "rank_within_15pct")}""".stripMargin,

    "q_vocab_topk" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |ww AS (SELECT * FROM w WHERE term <> '')
        |SELECT term, count(*) AS tf_total, count(DISTINCT doc_id) AS df
        |FROM ww GROUP BY term ORDER BY tf_total DESC, term LIMIT 50""".stripMargin,

    // vocab ranked exactly like vocabTopK (tf desc, term), ids 1-based so
    // 0 is OOV; unnest + generate_subscripts zip to (term, pos)
    "q_tokenize_ids" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |ww AS (SELECT doc_id, unnest(toks) AS term FROM w),
        |vt AS (
        |  SELECT term, count(*) AS tf_total FROM ww WHERE term <> ''
        |  GROUP BY term ORDER BY tf_total DESC, term LIMIT 20),
        |v AS (
        |  SELECT term, CAST(row_number()
        |    OVER (ORDER BY tf_total DESC, term) AS INT) AS term_id
        |  FROM vt),
        |e AS (
        |  SELECT doc_id, unnest(toks) AS term,
        |    generate_subscripts(toks, 1) AS pos
        |  FROM w),
        |j AS (
        |  SELECT e.doc_id, e.pos, COALESCE(v.term_id, 0) AS tid
        |  FROM e LEFT JOIN v USING (term))
        |SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
        |  array_to_string(list(tid ORDER BY pos), ',') AS ids
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_tfidf" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |ww AS (SELECT * FROM w WHERE term <> ''),
        |vocab AS (
        |  SELECT term, count(DISTINCT doc_id) AS df
        |  FROM ww GROUP BY term
        |  ORDER BY count(*) DESC, term LIMIT 20),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM ww GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.term, tf.tf, vocab.df,
        |  tf.tf::DOUBLE * (ln((n.n_docs + 1.0) / (vocab.df + 1.0)) + 1.0)
        |    AS tfidf
        |FROM tf JOIN vocab USING (term), n
        |ORDER BY doc_id, term""".stripMargin,

    // BM25 mirror, same panel (interpolated from Search.DefaultPanel) and
    // the same portability discipline as the Spark side: the idf — the
    // only ln() — floors to the 1e-9 grid per (query, term); every
    // expression downstream is IEEE arithmetic written in the identical
    // association order, and the published score is an integer micro sum
    // (HUGEINT → CAST AS BIGINT). avgdl = one division of exact longs —
    // bit-identical to the Scala-side sumDl.toDouble / nDocs.toDouble.
    "q_bm25" -> bm25Sql,

    // RM expansion mirror: the bm25Sql chain's ranked frame at top-5,
    // feedback-doc term counts, tf × micro-score integer weights, original
    // panel terms anti-joined out
    "q_query_expansion" ->
      s"""WITH $bm25Ctes,
         |top5 AS (
         |  SELECT query_id, doc_id, score_micro FROM r WHERE rank <= 5),
         |alltc AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id,
         |      unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
         |    FROM documents
         |    WHERE doc_id IN (SELECT doc_id FROM top5)) z
         |  WHERE term != '' GROUP BY 1, 2),
         |ex AS (
         |  SELECT t.query_id, d.term,
         |    CAST(sum(d.tf * t.score_micro) AS BIGINT) AS w_score
         |  FROM top5 t JOIN alltc d USING (doc_id)
         |  GROUP BY 1, 2),
         |filt AS (
         |  SELECT e.* FROM ex e
         |  LEFT JOIN panel p ON p.query_id = e.query_id AND p.term = e.term
         |  WHERE p.term IS NULL),
         |rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY w_score DESC, term) AS rank
         |  FROM filt)
         |SELECT query_id, rank, term, w_score FROM rk WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // BM25 over the prebuilt unigram index + stats sidecar: with open df
    // rails the index-probe scorer is value-identical to the inline form
    // (the artifacts carry the same tf/df/dl the inline pass derives), so
    // the steady-state row shares the oracle VERBATIM.
    "q_bm25_indexed" -> bm25Sql,

    // the maintained stack (merged index halves + added stats) must be
    // indistinguishable from inline BM25 on the union corpus
    "q_bm25_incr" -> bm25Sql,
    // snippet mirror: the bm25 CTE chain's top-10, then per (query, doc)
    // the integer argmax hits·10^6 − start over candidate starts (the
    // doc's panel-term positions, 0-based like Spark's posexplode),
    // 8-token window, ties to the smallest start by the encoding
    "q_snippets" -> snippetsSql,
    // … and the identical display step served off the STREAMED positional
    // state (state == corpus ⇒ the windows are the same truth recompute)
    "q_snippets_stream" -> snippetsSql,

    // Dirichlet query-likelihood mirror: matching-terms rank-equivalent
    // form, every ln floored to the 1e-9 grid in the SAME IEEE op order
    // as the Spark expressions (mult, mult, div, add, ln), integer
    // micro-unit scores; candidates = docs hit by >= 1 panel term
    "q_ql_indexed" -> qlSql,
    // the maintained streaming state serves the identical ranker
    "q_ql_stream" -> qlSql,
    // ALWAYS-ON BM25: three segmented-state micro-batches + the
    // bucket-pruned panel probe ≡ inline BM25 over the whole corpus
    "q_bm25_stream" -> bm25Sql,
    // ... and with full-row tombstones folded in, ≡ inline BM25 over the
    // survivors (stats sidecar shrinks with the erased docs)
    "q_bm25_stream_erasure" ->
      s"""WITH ${bm25CtesWhere("doc_id % 10 <> 6")}
         |SELECT query_id, rank, doc_id, score_micro FROM r WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    // hybrid RRF mirror: the bm25Sql CTE chain (lexical top-10) + the
    // q_knn_brute cosine chain over qids 1-5 (dense top-10), fused by
    // floor(1e9 / (60 + rank)) integer contributions — rank-based, so
    // the two systems' incomparable score scales never meet.
    "q_hybrid_rrf" ->
      s"""WITH $bm25Ctes,
         |lex AS (
         |  SELECT query_id, doc_id, rank FROM r WHERE rank <= 10),
         |q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id BETWEEN 1 AND 5),
         |scored AS (
         |  SELECT qid, vec_id AS neighbor_id,
         |    $dotQv / (sqrt($dotQq) * sqrt($dotVv)) AS score
         |  FROM embeddings, q WHERE qid <> vec_id),
         |dr AS (
         |  SELECT qid AS query_id, neighbor_id AS doc_id,
         |    CAST(row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, neighbor_id) AS INT) AS rank
         |  FROM scored),
         |den AS (SELECT query_id, doc_id, rank FROM dr WHERE rank <= 10),
         |u AS (
         |  SELECT query_id, doc_id,
         |    CAST(floor(1e9 / (60 + rank)) AS BIGINT) AS c FROM lex
         |  UNION ALL
         |  SELECT query_id, doc_id,
         |    CAST(floor(1e9 / (60 + rank)) AS BIGINT) AS c FROM den),
         |f AS (
         |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro,
         |    CAST(count(*) AS BIGINT) AS n_systems
         |  FROM u GROUP BY 1, 2),
         |fr AS (
         |  SELECT query_id, doc_id, rrf_micro, n_systems,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf_micro DESC, doc_id) AS INT) AS rank
         |  FROM f)
         |SELECT query_id, rank, doc_id, rrf_micro, n_systems
         |FROM fr WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    // inverted bigram index mirror: same bigram construction (1-based
    // DuckDB list lambda ↔ 0-based Spark transform), df rails 2 ≤ df ≤
    // floor(0.06 n) — floor of the identical double product — postings
    // as the doc-ordered doc:tf string
    "q_inverted_index" -> invertedIndexSql,

    // incremental maintenance mirror: merged postings must be
    // indistinguishable from a full rebuild over the union corpus, so the
    // steady-state row shares the rebuild oracle VERBATIM
    "q_index_incr" -> invertedIndexSql,
    // deletion-aware index maintenance: subtracted state ≡ full rebuild
    // over corpus ∖ deleted (rails re-applied at read over the new n)
    "q_index_delete" -> invertedIndexSqlWhere("AND doc_id % 10 <> 6"),
    // streaming (foreachBatch) index maintenance: three micro-batches
    // folded through the pointer-disciplined state ≡ one full rebuild
    "q_index_stream" -> invertedIndexSql,
    // streaming ingest + erasure fold: adds merge, full-row tombstones
    // subtract — shares the deletion row's corpus∖deleted truth verbatim
    "q_index_stream_erasure" -> invertedIndexSqlWhere("AND doc_id % 10 <> 6"),
    // erase → re-ingest churn serves the FULL corpus again: the ordered
    // tombstone fold subtracts the old postings before the new ones merge
    "q_index_stream_reingest" -> invertedIndexSql,
    // minor-compaction serving path (tail-run fold over an untouched
    // base) ≡ the same full rebuild
    "q_index_stream_minor" -> invertedIndexSql,

    // conjunctive phrase lookup over the railed index: same index CTEs as
    // q_inverted_index, panel bigrams interpolated from Search.PhrasePanel
    // (phraseGrams: distinct sorted bigrams), a doc matches iff EVERY
    // phrase bigram survives the rails and appears in the doc
    "q_index_phrase" -> phraseQuerySql,
    // EXACT phrase truth: count sliding-window token-slice equalities per
    // (phrase, doc) — the chain-intersection ground the positional index
    // row must reproduce bit-for-bit (words as literal lists from
    // Search.phraseWords)
    "q_index_phrase_exact" -> phraseExactSql,
    // proximity truth: a start i is valid iff a[i] is a panel word and
    // the 8-token window from it contains ALL the (distinct) words;
    // best_start = the smallest valid start, 0-based like Spark's
    "q_index_proximity" ->
      s"""WITH tok AS (
         |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS a
         |  FROM documents WHERE len(trim(text)) > 0),
         |panel(phrase_id, w) AS (VALUES $proximityPanelSql),
         |m AS (
         |  SELECT p.phrase_id, t.doc_id, CAST(len(p.w) AS BIGINT) AS n_words,
         |    list_filter(range(1, len(t.a) + 1),
         |      i -> list_contains(p.w, t.a[i])
         |        AND list_has_all(t.a[i : i + 7], p.w)) AS valid
         |  FROM panel p CROSS JOIN tok t)
         |SELECT phrase_id, doc_id, n_words,
         |  CAST(valid[1] - 1 AS BIGINT) AS best_start
         |FROM m WHERE len(valid) > 0 ORDER BY phrase_id, doc_id""".stripMargin,
    // streamed positional state (the generalized segmented core) probed
    // exactly — shares the truth verbatim
    "q_index_phrase_exact_stream" -> phraseExactSql,
    // the bucket-pruned probe over the STREAMED segmented index serves
    // the identical panel over the identical corpus (pruning is the
    // identity restricted to the panel; state == full corpus; same
    // rails) — shares the phrase oracle VERBATIM
    "q_index_phrase_stream" -> phraseQuerySql,
    // panel contract: the oracle predicts the panel size and that the
    // aggregate recall@5 clears the published bound (literal TRUE — same
    // error-contract discipline as HLL / approx-percentile / PQ)
    "q_knn_lsh" ->
      """SELECT count(*) AS n_queries, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10""".stripMargin,

    // JL projection mirror: the ±1 matrix rebuilt from the same md5
    // parities, each coordinate the sequential-fold dot over dim order,
    // one correctly-rounded sqrt
    "q_embed_rp" ->
      s"""WITH s AS (
         |  SELECT j, list(CAST(1 - 2 * (CAST(concat('0x',
         |      substring(md5('rp:' || CAST(i AS VARCHAR) || ':'
         |        || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % 2) AS DOUBLE)
         |    ORDER BY i) AS sv
         |  FROM (SELECT unnest(range(0, 64)) AS i),
         |       (SELECT unnest(range(0, 16)) AS j)
         |  GROUP BY j),
         |e0 AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
         |  FROM embeddings)
         |SELECT e0.vec_id, CAST(s.j AS INT) AS dim,
         |  ${dotSql("e0.v", "s.sv")} / sqrt(16.0) AS y
         |FROM e0 CROSS JOIN s
         |ORDER BY vec_id, dim""".stripMargin,

    // JL-prefilter recall contract: panel-aggregate TRUE prediction (the
    // q_knn_lsh publishing pattern)
    "q_knn_rp" ->
      """SELECT count(*) AS n_queries, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10""".stripMargin,

    // verbatim 20-token windows over strings vs Spark's hashed windows —
    // identical sets absent 64-bit collisions; df-pruning mirrored
    // (BETWEEN 2 AND maxDf: singleton windows cannot pair)
    "q_dedup_substring" ->
      s"""WITH e AS (
         |  SELECT doc_id, unnest(list_distinct(${shingleWSql(20)})) AS h
         |  FROM documents),
         |keep AS (SELECT h FROM e GROUP BY h HAVING count(*) BETWEEN 2 AND 1000),
         |p AS (SELECT e.doc_id, e.h FROM e JOIN keep USING (h))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         |FROM p a JOIN p b ON a.h = b.h AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 1
         |ORDER BY id_a, id_b""".stripMargin,

    // ExactSubstr span mirror: positional 20-token windows on STRINGS
    // (vs Spark's xxhash64 keys — identical absent 64-bit collisions),
    // doc-distinct df prune, gaps-and-islands with the q ≤ p + W merge
    // rule; ends clamp to the doc's last token
    "q_dedup_spans" -> dedupSpansSql(
      """SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(least(max(pos) + 19, max(n) - 1) AS BIGINT) AS span_end,
        |  CAST(least(max(pos) + 19, max(n) - 1) - min(pos) + 1 AS BIGINT)
        |    AS n_tokens
        |FROM g GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin),

    // steady-state spans share the FULL-RECOMPUTE mirror, restricted to
    // batch docs — maintained window counts must be indistinguishable
    // from rebuilding over the union corpus
    "q_dedup_spans_incr" -> dedupSpansSql(
      """SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(least(max(pos) + 19, max(n) - 1) AS BIGINT) AS span_end,
        |  CAST(least(max(pos) + 19, max(n) - 1) - min(pos) + 1 AS BIGINT)
        |    AS n_tokens
        |FROM g WHERE doc_id >= 250 GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin),

    // gram-novelty mirror: distinct per-doc 3-gram strings, corpus df,
    // exact counts + one division
    "q_gram_novelty" ->
      s"""WITH e AS (
         |  SELECT doc_id, source, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents),
         |d AS (SELECT h, count(*) AS df FROM e GROUP BY h)
         |SELECT source, count(*) AS n_grams,
         |  sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
         |  sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)::BIGINT::DOUBLE
         |    / count(*)::BIGINT::DOUBLE AS novelty_share
         |FROM e JOIN d USING (h)
         |GROUP BY source ORDER BY source""".stripMargin,

    // single-build duplication histogram — the merged-shard build must
    // reproduce it exactly (mergeability IS the check)
    "q_window_df_hist" -> dedupSpansSql(
      """dfh AS (SELECT count(DISTINCT doc_id) AS ndocs FROM p GROUP BY win)
        |SELECT ndocs::BIGINT AS ndocs, count(*) AS n_windows
        |FROM dfh GROUP BY ndocs ORDER BY ndocs""".stripMargin,
      extraCte = true),

    // deletion-aware window-df maintenance: the subtracted artifact's
    // histogram ≡ a rebuild over corpus ∖ deleted (window hashes are
    // engine-local; the histogram is the portable fingerprint)
    "q_window_df_delete" -> dedupSpansSql(
      """dfh AS (SELECT count(DISTINCT doc_id) AS ndocs FROM p GROUP BY win)
        |SELECT ndocs::BIGINT AS ndocs, count(*) AS n_windows
        |FROM dfh GROUP BY ndocs ORDER BY ndocs""".stripMargin,
      extraCte = true, pWhere = "doc_id % 10 <> 5"),

    // exact integer token sums per source; the published share is one
    // IEEE division on both engines
    "q_span_dup_rate" -> dedupSpansSql(
      """sp AS (
        |  SELECT doc_id,
        |    least(max(pos) + 19, max(n) - 1) - min(pos) + 1 AS n_tokens
        |  FROM g GROUP BY doc_id, island),
        |dt AS (SELECT doc_id, sum(n_tokens) AS dt FROM sp GROUP BY doc_id),
        |base AS (
        |  SELECT d.source, d.doc_id,
        |    len(regexp_split_to_array(lower(trim(d.text)), '\s+')) AS nt,
        |    coalesce(dt.dt, 0) AS dtok
        |  FROM documents d LEFT JOIN dt USING (doc_id))
        |SELECT source, count(*) AS n_docs,
        |  sum(nt)::BIGINT AS total_tokens,
        |  sum(dtok)::BIGINT AS dup_tokens,
        |  sum(dtok)::DOUBLE / sum(nt)::DOUBLE AS dup_share
        |FROM base GROUP BY source ORDER BY source""".stripMargin,
      extraCte = true),

    // surgical-decontam mirror: the duplicated-window set is "appears in
    // the benchmark split" (every 50th doc), corpus = the rest
    "q_decontam_spans" -> dedupSpansSql(
      """SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(least(max(pos) + 19, max(n) - 1) AS BIGINT) AS span_end,
        |  CAST(least(max(pos) + 19, max(n) - 1) - min(pos) + 1 AS BIGINT)
        |    AS n_tokens
        |FROM g GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,
      pWhere = "doc_id % 50 <> 0",
      dupCte = decontamDupCte),

    // leak-report mirror: corpus positional windows inner-join the
    // benchmark's distinct (bench_id, window) pairs on the STRING
    "q_leak_report" -> dedupSpansSql(
      """bw AS (
        |  SELECT DISTINCT doc_id AS bench_id, win FROM (
        |    SELECT doc_id,
        |      unnest(CASE WHEN len(ws) >= 20
        |        THEN [array_to_string(ws[i:i+19], ' ')
        |              FOR i IN range(1, len(ws) - 18)]
        |        ELSE [array_to_string(ws, ' ')] END) AS win
        |    FROM w WHERE doc_id % 50 = 0))
        |SELECT bw.bench_id,
        |  count(DISTINCT p.doc_id)::BIGINT AS n_corpus_docs,
        |  count(*)::BIGINT AS n_window_hits
        |FROM p JOIN bw USING (win)
        |GROUP BY bw.bench_id ORDER BY bench_id""".stripMargin,
      extraCte = true, pWhere = "doc_id % 50 <> 0",
      dupCte = decontamDupCte),

    "q_decontam_surgical" -> dedupSpansSql(
      """sp AS (
        |  SELECT doc_id, min(pos) AS span_start,
        |    least(max(pos) + 19, max(n) - 1) AS span_end
        |  FROM g GROUP BY doc_id, island),
        |rw AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS rws
        |  FROM documents WHERE doc_id % 50 <> 0),
        |tok0 AS (
        |  SELECT doc_id,
        |    unnest([{'pos': i - 1, 't': rws[i]}
        |            FOR i IN range(1, len(rws) + 1)]) AS u
        |  FROM rw),
        |tok AS (SELECT doc_id, u.pos AS pos, u.t AS t FROM tok0),
        |kept AS (
        |  SELECT tok.doc_id, tok.pos, tok.t
        |  FROM tok LEFT JOIN sp ON tok.doc_id = sp.doc_id
        |    AND tok.pos BETWEEN sp.span_start AND sp.span_end
        |  WHERE sp.doc_id IS NULL),
        |agg AS (
        |  SELECT doc_id, string_agg(t, ' ' ORDER BY pos) AS ct
        |  FROM kept GROUP BY doc_id)
        |SELECT rw.doc_id, coalesce(agg.ct, '') AS clean_text
        |FROM rw LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
      extraCte = true, pWhere = "doc_id % 50 <> 0",
      dupCte = decontamDupCte),

    // the cut applied over original-case tokens: covered positions
    // dropped via disjoint-span anti-join, survivors re-joined in order
    "q_dedup_span_removal" -> dedupSpansSql(
      """sp AS (
        |  SELECT doc_id, min(pos) AS span_start,
        |    least(max(pos) + 19, max(n) - 1) AS span_end
        |  FROM g GROUP BY doc_id, island),
        |rw AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS rws
        |  FROM documents),
        |tok0 AS (
        |  SELECT doc_id,
        |    unnest([{'pos': i - 1, 't': rws[i]}
        |            FOR i IN range(1, len(rws) + 1)]) AS u
        |  FROM rw),
        |tok AS (SELECT doc_id, u.pos AS pos, u.t AS t FROM tok0),
        |kept AS (
        |  SELECT tok.doc_id, tok.pos, tok.t
        |  FROM tok LEFT JOIN sp ON tok.doc_id = sp.doc_id
        |    AND tok.pos BETWEEN sp.span_start AND sp.span_end
        |  WHERE sp.doc_id IS NULL),
        |agg AS (
        |  SELECT doc_id, string_agg(t, ' ' ORDER BY pos) AS ct
        |  FROM kept GROUP BY doc_id)
        |SELECT rw.doc_id, coalesce(agg.ct, '') AS clean_text
        |FROM rw LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin, extraCte = true),

    // winnowing mirror: POSITIONAL (non-distinct) 3-gram md5-prefix hashes,
    // window ends e ∈ [w, ng], rightmost min via first-position-in-reversed
    // slice, (fp, pos) deduplicated through the fp·2^20+pos encoding —
    // exactly llm.Fingerprint.winnow
    "q_fingerprint_winnow" ->
      s"""$winnowCtes
         |SELECT doc_id, CAST(sel % 1048576 AS BIGINT) AS pos,
         |  CAST(sel // 1048576 AS BIGINT) AS fp
         |FROM f ORDER BY doc_id, pos""".stripMargin,

    "q_fingerprint_pairs" ->
      s"""$winnowCtes,
         |fp AS (
         |  SELECT DISTINCT doc_id, CAST(sel // 1048576 AS BIGINT) AS fp
         |  FROM f),
         |keep AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 100),
         |p AS (SELECT fp.doc_id, fp.fp FROM fp JOIN keep USING (fp))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         |FROM p a JOIN p b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY id_a, id_b""".stripMargin,

    // gram-set membership over strings mirrors Spark's hashed grams —
    // identical distinct counts absent 64-bit collisions (none here)
    "q_decontam" ->
      s"""WITH $decontamCtes
         |SELECT doc_id, n_grams, n_hits,
         |  (n_hits::DOUBLE / n_grams::DOUBLE) >= 0.3 AS contaminated
         |FROM a ORDER BY doc_id""".stripMargin,

    // embedding-space decontam mirror: cross join against the 10-vector
    // panel, list_reduce sequential-fold cosine (the q_knn_brute
    // discipline), max is order-independent
    "q_semantic_decontam" ->
      s"""WITH b AS (
         |  SELECT embedding AS qv FROM embeddings WHERE vec_id % 50 = 7),
         |s AS (
         |  SELECT vec_id,
         |    max($dotQv / (sqrt($dotQq) * sqrt($dotVv))) AS max_sim
         |  FROM embeddings, b GROUP BY vec_id)
         |SELECT vec_id, max_sim, max_sim >= 0.4 AS contaminated
         |FROM s ORDER BY vec_id""".stripMargin,

    // decontaminated eval-split composition: the clean set (NOT the
    // contamination predicate) hashed into train/val/test by the same
    // digest thresholds as q_split_assign — the "build a held-out set"
    // pipeline in one row
    "q_eval_split" ->
      s"""WITH $decontamCtes,
         |clean AS (
         |  SELECT doc_id FROM a
         |  WHERE NOT ((n_hits::DOUBLE / n_grams::DOUBLE) >= 0.3)),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
         |           < '${graft.llm.Sampling.digestThreshold(0.8)}' THEN 'train'
         |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
         |           < '${graft.llm.Sampling.digestThreshold(0.8 + 0.1)}' THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM clean)
         |SELECT split, count(*) AS n_docs, min(doc_id) AS first_doc
         |FROM sp GROUP BY split ORDER BY split""".stripMargin,

    // chunk i = tokens [i*56, i*56 + 64); short tail; docs of <= 8 tokens
    // still yield one chunk; empty docs none
    "q_chunk_tokens" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> x <> '') AS words
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, words, len(words) AS n,
        |    CASE WHEN len(words) <= 0 THEN 0
        |      ELSE greatest(CAST(ceil((len(words) - 8)::DOUBLE / 56)
        |        AS INTEGER), 1) END AS nc
        |  FROM w),
        |e AS (
        |  SELECT doc_id, words, n, unnest(range(nc)) AS chunk_idx
        |  FROM c WHERE nc > 0)
        |SELECT doc_id, chunk_idx,
        |  least(64, n - chunk_idx * 56) AS n_chunk_tokens,
        |  array_to_string(words[chunk_idx * 56 + 1 : chunk_idx * 56 + 64], ' ')
        |    AS chunk_text
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_knn_int8" ->
      """SELECT vec_id AS qid, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY qid""".stripMargin,

    "q_knn_pq" ->
      """SELECT vec_id AS qid, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY qid""".stripMargin,

    "q_knn_ivfpq" ->
      """SELECT vec_id AS qid, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY qid""".stripMargin,

    // panel contract (q_knn_lsh convention): one row, n_queries + the
    // deterministic recall fact
    "q_knn_binary" ->
      """SELECT count(*) AS n_queries, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10""".stripMargin,

    // NSW graph-ANN panel contracts (measured recall 1.0 at every SF,
    // bound 0.7): the walk's neighbor list is graph-construction-
    // specific; the contract is the cross-engine-stable fact
    "q_knn_graph" ->
      """SELECT count(*) AS n_queries, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10""".stripMargin,
    "q_knn_graph_prebuilt" ->
      """SELECT count(*) AS n_queries, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10""".stripMargin,
    "q_knn_graph_incr" ->
      """SELECT count(*) AS n_queries, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10""".stripMargin,
    // delete repair: queries and truth over the SURVIVORS (≢ 3 mod 7)
    "q_knn_graph_delete" ->
      """SELECT count(*) AS n_queries, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10 AND vec_id % 7 <> 3""".stripMargin,
    "q_knn_graph_stream" ->
      """SELECT count(*) AS n_queries, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10""".stripMargin,
    // streamed erasure: ids ≡ 6 mod 10 ingested in batches 0-1 (≢ 2
    // mod 3) are erased — the live view the panel runs over excludes them
    "q_knn_graph_stream_erasure" ->
      """SELECT count(*) AS n_queries, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10
        |  AND NOT (vec_id % 10 = 6 AND vec_id % 3 <> 2)""".stripMargin,
    "q_knn_graph_layered" ->
      """SELECT count(*) AS n_queries, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10""".stripMargin,
    "q_knn_graph_layered_incr" ->
      """SELECT count(*) AS n_queries, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10""".stripMargin,
    "q_knn_graph_filtered" ->
      """SELECT count(*) AS n_queries, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10""".stripMargin,

    // NDCG@10 + MRR@10 mirror: the q_knn_brute cosine chain at k=10,
    // nano-floored 1/log2(rank+1) terms, integer DCG/IDCG sums, one
    // ratio division; same-label binary qrels
    "q_retrieval_metrics" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, label AS qlabel, embedding AS qv
         |  FROM embeddings WHERE vec_id < 10),
         |scored AS (
         |  SELECT qid, vec_id AS neighbor_id,
         |    $dotQv / (sqrt($dotQq) * sqrt($dotVv)) AS score
         |  FROM embeddings, q WHERE qid <> vec_id),
         |ranked AS (
         |  SELECT qid, neighbor_id,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored),
         |topk AS (SELECT * FROM ranked WHERE rank <= 10),
         |rels AS (
         |  SELECT q.qid, e.vec_id AS neighbor_id FROM q
         |  JOIN embeddings e ON e.label = q.qlabel AND e.vec_id <> q.qid),
         |nr AS (SELECT qid, count(*) AS n_rel FROM rels GROUP BY 1),
         |sc AS (
         |  SELECT t.qid,
         |    CAST(sum(CASE WHEN r.neighbor_id IS NOT NULL
         |      THEN CAST(floor(1e9 / log2(t.rank::DOUBLE + 1)) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS dcg_nano,
         |    min(CASE WHEN r.neighbor_id IS NOT NULL THEN t.rank END)
         |      AS first_rel
         |  FROM topk t LEFT JOIN rels r
         |    ON r.qid = t.qid AND r.neighbor_id = t.neighbor_id
         |  GROUP BY 1),
         |ik AS (
         |  SELECT g.range AS m,
         |    CAST(sum(CAST(floor(1e9 / log2(i.range::DOUBLE + 1)) AS BIGINT))
         |      AS BIGINT) AS idcg_nano
         |  FROM range(1, 11) g JOIN range(1, 11) i ON i.range <= g.range
         |  GROUP BY 1)
         |SELECT sc.qid, coalesce(nr.n_rel, 0) AS n_rel,
         |  dcg_nano::DOUBLE / ik.idcg_nano::DOUBLE AS ndcg,
         |  coalesce(1.0 / first_rel::DOUBLE, 0.0) AS mrr
         |FROM sc LEFT JOIN nr USING (qid)
         |LEFT JOIN ik ON ik.m = least(nr.n_rel, 10)
         |ORDER BY qid""".stripMargin,

    "q_knn_matryoshka" ->
      """SELECT count(*) AS n_queries, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id < 10""".stripMargin,

    // bins [start, start+100); DuckDB sum(int) is HUGEINT → cast back
    "q_length_histogram" ->
      """SELECT CAST(floor(len(text) / 100) * 100 AS BIGINT) AS bin_start,
        |  CAST(floor(len(text) / 100) * 100 + 100 AS BIGINT) AS bin_end,
        |  count(*) AS n_docs, CAST(sum(len(text)) AS BIGINT) AS n_chars
        |FROM documents GROUP BY 1, 2 ORDER BY bin_start""".stripMargin,

    // avg = one IEEE division of exact integer sums — engine-portable
    "q_source_profile" ->
      """WITH d AS (
        |  SELECT source, len(text) AS len,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS toks
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(len) AS BIGINT) AS n_chars,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens,
        |  CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars
        |FROM d GROUP BY source ORDER BY source""".stripMargin,

    "q_text_stats" ->
      s"""WITH sc AS (
         |  SELECT doc_id, text, $langScoresSql
         |  FROM documents)
         |SELECT doc_id,
         |  len(text) AS n_chars_computed,
         |  CASE WHEN len(trim(text)) = 0 THEN 0
         |    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         |  len(regexp_extract_all(text,
         |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpeish_tokens,
         |  len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g'))
         |    AS n_punct,
         |  $langCaseSql AS lang_pred
         |FROM sc ORDER BY doc_id""".stripMargin,

    "q_lang_breakdown" ->
      s"""WITH sc AS (
         |  SELECT doc_id, text, $langScoresSql
         |  FROM documents),
         |p AS (SELECT $langCaseSql AS lang_pred FROM sc)
         |SELECT lang_pred, count(*) AS n_docs FROM p
         |GROUP BY lang_pred ORDER BY lang_pred""".stripMargin,

    // confusion mirror: the same langid case chain against the labeled
    // column; frac = one IEEE division of exact counts
    "q_lang_confusion" ->
      s"""WITH sc AS (
         |  SELECT doc_id, lang, text, $langScoresSql
         |  FROM documents),
         |p AS (SELECT lang, $langCaseSql AS lang_pred FROM sc),
         |cells AS (
         |  SELECT lang, lang_pred, count(*) AS n FROM p GROUP BY 1, 2),
         |tot AS (SELECT lang, count(*) AS n_lang FROM p GROUP BY 1)
         |SELECT c.lang, c.lang_pred, c.n,
         |  CAST(c.n AS DOUBLE) / CAST(t.n_lang AS DOUBLE) AS frac
         |FROM cells c JOIN tot t ON t.lang = c.lang
         |ORDER BY c.lang, c.lang_pred""".stripMargin,

    // tokenizer fertility: exact-long sums (q_mix_budget's token count),
    // one IEEE division
    "q_tokenizer_fertility" ->
      """WITH p AS (
        |  SELECT lang, n_chars,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |a AS (
        |  SELECT lang, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |  FROM p GROUP BY 1)
        |SELECT lang, n_docs, total_chars, total_tokens,
        |  total_chars::DOUBLE / total_tokens::DOUBLE AS chars_per_token
        |FROM a ORDER BY lang""".stripMargin,

    // lexicon hit counts (the langScores machinery) + the identical
    // first-wins CASE as TextAnalysis.topicTags' when-chain
    "q_topic_tags" -> {
      val hits = llm.TextAnalysis.DefaultTopics.map { case (t, lex) =>
        s"CAST(${hitSql(lex)} AS BIGINT) AS s_$t"
      }.mkString(",\n    ")
      s"""WITH s AS (
         |  SELECT doc_id,
         |    $hits
         |  FROM documents)
         |SELECT doc_id, s_commerce, s_perf, s_query,
         |  CASE WHEN s_commerce >= s_perf AND s_commerce >= s_query
         |         THEN 'commerce'
         |       WHEN s_perf >= s_query THEN 'perf'
         |       ELSE 'query' END AS topic
         |FROM s ORDER BY doc_id""".stripMargin
    },

    // linear-probe trainer mirror: fixed-iteration unrolled-CTE gradient
    // descent (the q_bpe_merges / q_kmeans technique) — each iteration's
    // gradient is an exact micro-unit integer sum, each weight update the
    // identical double expression, so all weights are bit-equal
    "q_quality_probe" ->
      s"""WITH $probeCtes
         |SELECT CAST(0 AS INT) AS dim, w0 AS w FROM pw$probeIters
         |UNION ALL SELECT 1, w1 FROM pw$probeIters
         |UNION ALL SELECT 2, w2 FROM pw$probeIters
         |UNION ALL SELECT 3, w3 FROM pw$probeIters
         |ORDER BY dim""".stripMargin,

    // DoReMi-style reweighting mirror: trained-probe scores micro-floored
    // once, the q_mix_budget per-source cumsum computed once, then the 3
    // rounds unrolled (the q_bpe_merges technique) — budgets by integer
    // floor-division split of the weight table, kept set = cumsum ≤
    // budget, kept means by exact integer floor division (zero-kept
    // sources coalesce to 0 through the weight-table left join), and the
    // multiplicative 1e6 + ⌊η·excess/1e6⌋ update — every value BIGINT.
    "q_mix_reweight" -> mixReweightSql(3),

    // the trained probe applied: x·w over the same feature frame with the
    // final iteration's weights — one scan, scores bit-equal
    "q_probe_score" ->
      s"""WITH $probeCtes
         |SELECT f.doc_id,
         |  f.x0 * wp.w0 + f.x1 * wp.w1 + f.x2 * wp.w2 + f.x3 * wp.w3 AS score
         |FROM feat f, pw$probeIters wp
         |ORDER BY f.doc_id""".stripMargin,

    // curriculum mirror: trained-probe scores (unrolled CTEs) + the
    // oracle-side GLOBAL exclusive cumsum in (score, id) order — the
    // single-node luxury the Spark side's two-phase prefix sum replaces;
    // shard = floor(prefix / budget), double division of exact longs
    "q_curriculum" ->
      s"""WITH $probeCtes,
         |ctoks AS (
         |  SELECT doc_id,
         |    CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+'))
         |        AS BIGINT) END AS n_tokens
         |  FROM documents),
         |csc AS (
         |  SELECT f.doc_id,
         |    f.x0 * wp.w0 + f.x1 * wp.w1 + f.x2 * wp.w2 + f.x3 * wp.w3 AS score
         |  FROM feat f, pw$probeIters wp),
         |cj AS (
         |  SELECT s.doc_id, s.score, t.n_tokens
         |  FROM csc s JOIN ctoks t USING (doc_id)),
         |cp AS (
         |  SELECT doc_id, score, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY score, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |  FROM cj)
         |SELECT doc_id, score, n_tokens,
         |  CAST(floor(pre / 2000) AS BIGINT) AS shard
         |FROM cp ORDER BY doc_id""".stripMargin,

    // Gopher rule mirror: every count is exact-integer, every published
    // ratio ONE double division of exact counts, thresholds compared on
    // those exact doubles — the same portability discipline as docStats.
    // DuckDB regexp_replace needs the 'g' flag (first-match default);
    // Spark's replaces all.
    "q_gopher_rules" ->
      s"""WITH $gopherCtes
         |SELECT doc_id, n_words, mean_wlen, symbol_ratio, bullet_frac,
         |  ellipsis_frac, alpha_frac, stop_hits, kept
         |FROM gk ORDER BY doc_id""".stripMargin,

    // correlation-matrix mirror: exact integer sufficient statistics in
    // one pass, each r the identical IEEE op sequence, zero-variance guard
    "q_feature_corr" ->
      s"""WITH cf AS (
         |  SELECT n_chars,
         |    CAST(len(list_filter($wordsSql, x -> list_contains(
         |      ['the','be','to','of','and','that','have','with'], x)))
         |      AS BIGINT) AS n_stop,
         |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |      AS BIGINT) AS n_words
         |  FROM documents),
         |ct AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(n_chars) AS BIGINT) AS s_a,
         |    CAST(sum(n_chars * n_chars) AS BIGINT) AS q_a,
         |    CAST(sum(n_stop) AS BIGINT) AS s_b,
         |    CAST(sum(n_stop * n_stop) AS BIGINT) AS q_b,
         |    CAST(sum(n_words) AS BIGINT) AS s_c,
         |    CAST(sum(n_words * n_words) AS BIGINT) AS q_c,
         |    CAST(sum(n_chars * n_stop) AS BIGINT) AS p_ab,
         |    CAST(sum(n_chars * n_words) AS BIGINT) AS p_ac,
         |    CAST(sum(n_stop * n_words) AS BIGINT) AS p_bc
         |  FROM cf)
         |SELECT * FROM (
         |  SELECT 'n_chars' AS feat_a, 'n_stop' AS feat_b, n,
         |    CASE WHEN n*q_a - s_a*s_a > 0 AND n*q_b - s_b*s_b > 0
         |      THEN (n*p_ab - s_a*s_b)::DOUBLE /
         |        (sqrt((n*q_a - s_a*s_a)::DOUBLE) *
         |         sqrt((n*q_b - s_b*s_b)::DOUBLE)) END AS corr
         |  FROM ct
         |  UNION ALL
         |  SELECT 'n_chars', 'n_words', n,
         |    CASE WHEN n*q_a - s_a*s_a > 0 AND n*q_c - s_c*s_c > 0
         |      THEN (n*p_ac - s_a*s_c)::DOUBLE /
         |        (sqrt((n*q_a - s_a*s_a)::DOUBLE) *
         |         sqrt((n*q_c - s_c*s_c)::DOUBLE)) END
         |  FROM ct
         |  UNION ALL
         |  SELECT 'n_stop', 'n_words', n,
         |    CASE WHEN n*q_b - s_b*s_b > 0 AND n*q_c - s_c*s_c > 0
         |      THEN (n*p_bc - s_b*s_c)::DOUBLE /
         |        (sqrt((n*q_b - s_b*s_b)::DOUBLE) *
         |         sqrt((n*q_c - s_c*s_c)::DOUBLE)) END
         |  FROM ct)
         |ORDER BY feat_a, feat_b""".stripMargin,

    // probe-calibration AUC: trained-probe scores (probeCtes) against the
    // Gopher keep verdict (gopherCtes) through the tie-corrected
    // Mann-Whitney chain — rank arithmetic exact-integer, numerator
    // doubled so average ranks never materialize as halves, ONE double
    // division at the end
    "q_probe_auc" ->
      s"""WITH $probeCtes,
         |$gopherCtes,
         |asc_ AS (
         |  SELECT f.doc_id,
         |    f.x0 * wp.w0 + f.x1 * wp.w1 + f.x2 * wp.w2 + f.x3 * wp.w3 AS s
         |  FROM feat f, pw$probeIters wp),
         |aj AS (
         |  SELECT asc_.s, CASE WHEN gk.kept THEN 1 ELSE 0 END AS y
         |  FROM asc_ JOIN gk USING (doc_id)),
         |aa AS (
         |  SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
         |  FROM aj GROUP BY 1),
         |ar AS (
         |  SELECT s, c, p, CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS cum
         |  FROM aa),
         |at AS (
         |  SELECT CAST(sum(p * (2 * cum - c + 1)) AS BIGINT) AS num2,
         |    CAST(sum(p) AS BIGINT) AS n_pos,
         |    CAST(sum(c) - sum(p) AS BIGINT) AS n_neg
         |  FROM ar)
         |SELECT n_pos, n_neg,
         |  CASE WHEN n_pos > 0 AND n_neg > 0
         |    THEN (num2 - n_pos * (n_pos + 1))::DOUBLE /
         |         (2 * n_pos * n_neg)::DOUBLE END AS auc
         |FROM at""".stripMargin,

    // reliability diagram mirror: trained-probe scores binned equal-width
    // over the deterministic [min, max]; micro-floored integer score sums
    "q_probe_calibration" ->
      s"""WITH $probeCtes,
         |$gopherCtes,
         |sc AS (
         |  SELECT f.doc_id,
         |    f.x0 * wp.w0 + f.x1 * wp.w1 + f.x2 * wp.w2 + f.x3 * wp.w3 AS s
         |  FROM feat f, pw$probeIters wp),
         |aj AS (
         |  SELECT sc.s, CASE WHEN gk.kept THEN 1 ELSE 0 END AS y
         |  FROM sc JOIN gk USING (doc_id)),
         |mm AS (SELECT min(s) AS mn, max(s) AS mx FROM aj),
         |b AS (
         |  SELECT CASE WHEN mx > mn
         |    THEN least(CAST(floor((s - mn) / ((mx - mn) / 10.0)) AS BIGINT), 9)
         |    ELSE 0 END AS bin, s, y
         |  FROM aj, mm)
         |SELECT bin, count(*) AS n,
         |  CAST(sum(CAST(floor(s * 1e6) AS BIGINT)) AS BIGINT)::DOUBLE
         |    / count(*)::DOUBLE / 1e6 AS mean_score,
         |  CAST(sum(y) AS BIGINT)::DOUBLE / count(*)::DOUBLE AS pos_rate
         |FROM b GROUP BY 1 ORDER BY bin""".stripMargin,

    // Mirrors TextAnalysis.docStats: every score is raw int-derived IEEE
    // double arithmetic in the same evaluation order as the Spark columns —
    // bit-exact, no round() anywhere (HALF_UP parity trap). Fingerprint is
    // the k-min md5 sketch, portable by construction.
    "q_text_quality" ->
      s"""WITH w AS (
         |  SELECT doc_id, text, $wordsSql AS words, ${shingleWSql(5)} AS sh5
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, text,
         |    CASE WHEN len(words) = 0 THEN 0.0
         |      ELSE len(list_filter(words, x -> list_contains([${llm.TextAnalysis.StopwordsEn.map("'" + _ + "'").mkString(", ")}], x)))::DOUBLE
         |        / len(words)::DOUBLE END AS stopword_ratio,
         |    len(text)::DOUBLE AS len_d,
         |    (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE AS punct_d,
         |    CASE WHEN len(text) = 0 THEN 0.0
         |      ELSE (len(text) - len(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
         |        / len(text)::DOUBLE END AS digit_ratio,
         |    array_to_string(list_sort(list_distinct(list_transform(sh5, s -> md5(s))))[1:8], ',') AS fingerprint
         |  FROM w),
         |q AS (
         |  SELECT doc_id, stopword_ratio, fingerprint,
         |    least(len_d / 200.0, 1.0) * (CASE WHEN len_d > 2000 THEN 0.5 ELSE 1.0 END) AS len_score,
         |    CASE WHEN punct_d / greatest(len_d, 1.0) > 0.2 THEN 0.3
         |      ELSE 1.0 - punct_d / greatest(len_d, 1.0) END AS punct_score,
         |    1.0 - least(digit_ratio * 2.0, 1.0) AS digit_score,
         |    least(stopword_ratio * 5.0, 1.0) AS sw_score
         |  FROM c)
         |SELECT doc_id, stopword_ratio,
         |  len_score * 0.3 + punct_score * 0.3 + digit_score * 0.2 + sw_score * 0.2 AS quality,
         |  fingerprint
         |FROM q ORDER BY doc_id""".stripMargin,

    // Mirrors Repetition.profile: non-blank lines via string_split(chr(10)),
    // non-distinct word n-grams via the shared shingle fragment, top-gram
    // tie-break pinned to (count DESC, gram DESC) — identical to Spark's
    // max over (cnt, gram) structs. All fractions are int-derived double
    // divisions: bit-exact cross-engine.
    // source-overlap mirror: distinct (source, shingle) sets grouped by
    // TEXT (Spark groups xxhash64 keys — same equivalence classes), full
    // pair matrix off the sizes cross, one IEEE division per pair
    "q_source_overlap" ->
      s"""WITH g AS (
         |  SELECT DISTINCT source AS src, unnest(list_distinct($shingleSql)) AS h
         |  FROM documents),
         |sz AS (SELECT src, count(*) AS sz FROM g GROUP BY src),
         |inter AS (
         |  SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_common
         |  FROM g a JOIN g b ON a.h = b.h AND a.src < b.src
         |  GROUP BY 1, 2)
         |SELECT sa.src AS src_a, sb.src AS src_b, sa.sz AS sz_a, sb.sz AS sz_b,
         |  coalesce(i.n_common, 0) AS n_common,
         |  CAST(coalesce(i.n_common, 0) AS DOUBLE) /
         |    CAST(sa.sz + sb.sz - coalesce(i.n_common, 0) AS DOUBLE) AS jaccard
         |FROM sz sa JOIN sz sb ON sa.src < sb.src
         |LEFT JOIN inter i ON i.src_a = sa.src AND i.src_b = sb.src
         |ORDER BY src_a, src_b""".stripMargin,

    // Zipf mirror: identical top-100 vocabulary (total (c DESC, w) order),
    // ln-grid x/y, rank-order seedless folds (≡ Spark's 0-seeded
    // aggregate), the same fixed scalar op sequence for slope/intercept
    "q_zipf_fit" ->
      s"""WITH v AS (
         |  SELECT w, count(*) AS c FROM (
         |    SELECT unnest($wordsSql) AS w FROM documents)
         |  GROUP BY w ORDER BY c DESC, w LIMIT 100),
         |r AS (SELECT row_number() OVER (ORDER BY c DESC, w) AS rnk, c FROM v),
         |tt AS (
         |  SELECT list(struct_pack(
         |      x := floor(ln(CAST(rnk AS DOUBLE)) * 1e9) / 1e9,
         |      y := floor(ln(CAST(c AS DOUBLE)) * 1e9) / 1e9) ORDER BY rnk)
         |    AS t
         |  FROM r),
         |ss AS (
         |  SELECT CAST(len(t) AS DOUBLE) AS n,
         |    list_reduce(list_transform(t, q -> q.x), (a, b) -> a + b) AS sx,
         |    list_reduce(list_transform(t, q -> q.y), (a, b) -> a + b) AS sy,
         |    list_reduce(list_transform(t, q -> q.x * q.y), (a, b) -> a + b)
         |      AS sxy,
         |    list_reduce(list_transform(t, q -> q.x * q.x), (a, b) -> a + b)
         |      AS sxx
         |  FROM tt)
         |SELECT CAST(n AS BIGINT) AS n_terms,
         |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
         |    AS intercept
         |FROM ss""".stripMargin,

    // word-entropy mirror: sorted-run lengths, each (c/n)·ln(c/n) term
    // floored to the 1e-9 grid (ln low-bit disagreement absorbed), exact
    // integer sum — list_sum's HUGEINT cast back to BIGINT (the
    // q_decontam lesson)
    "q_doc_entropy" ->
      s"""WITH w AS (SELECT doc_id, list_sort($wordsSql) AS sw FROM documents),
         |r AS (
         |  SELECT doc_id, len(sw) AS n_words,
         |    [i FOR i IN range(1, len(sw) + 1)
         |       IF i = 1 OR sw[i] <> sw[i-1]] AS starts,
         |    sw
         |  FROM w),
         |e AS (
         |  SELECT doc_id, n_words, len(starts) AS n_distinct,
         |    CAST(list_sum([CAST(floor(
         |      (CAST(list_concat(starts, [len(sw) + 1])[j + 1] - starts[j]
         |         AS DOUBLE) / CAST(n_words AS DOUBLE))
         |      * ln(CAST(list_concat(starts, [len(sw) + 1])[j + 1] - starts[j]
         |         AS DOUBLE) / CAST(n_words AS DOUBLE))
         |      * 1e9) AS BIGINT)
         |      FOR j IN range(1, len(starts) + 1)]) AS BIGINT) AS neg
         |  FROM r)
         |SELECT doc_id, n_words, n_distinct, -neg AS entropy_nano,
         |  CAST(-neg AS DOUBLE) / 1e9 AS entropy
         |FROM e ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      s"""WITH ln AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split(text, chr(10)), l -> len(trim(l)) > 0)) AS line
         |  FROM documents),
         |lc AS (SELECT doc_id, line, count(*) AS cnt FROM ln GROUP BY 1, 2),
         |ls AS (
         |  SELECT doc_id, sum(cnt) AS n_lines,
         |    (sum(cnt) - count(*))::DOUBLE / sum(cnt)::DOUBLE AS dup_line_frac,
         |    sum(CASE WHEN cnt > 1 THEN cnt * len(line) ELSE 0 END)::DOUBLE
         |      / sum(cnt * len(line))::DOUBLE AS dup_line_char_frac
         |  FROM lc GROUP BY 1),
         |g2 AS (
         |  SELECT doc_id, len(trim(text)) AS n_chars, unnest(${shingleWSql(2)}) AS gram
         |  FROM documents),
         |c2 AS (SELECT doc_id, n_chars, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2, 3),
         |t2 AS (
         |  SELECT doc_id, gram AS top2_gram,
         |    least(1.0, (cnt * len(gram))::DOUBLE / greatest(n_chars, 1)::DOUBLE) AS top2_char_frac,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn
         |  FROM c2),
         |g3 AS (
         |  SELECT doc_id, len(trim(text)) AS n_chars, unnest(${shingleWSql(3)}) AS gram
         |  FROM documents),
         |c3 AS (SELECT doc_id, n_chars, gram, count(*) AS cnt FROM g3 GROUP BY 1, 2, 3),
         |t3 AS (
         |  SELECT doc_id,
         |    least(1.0, (cnt * len(gram))::DOUBLE / greatest(n_chars, 1)::DOUBLE) AS top3_char_frac,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn
         |  FROM c3),
         |g5 AS (SELECT doc_id, unnest(${shingleWSql(5)}) AS gram FROM documents),
         |c5 AS (SELECT doc_id, gram, count(*) AS cnt FROM g5 GROUP BY 1, 2),
         |d5 AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN cnt > 1 THEN cnt * len(gram) ELSE 0 END)::DOUBLE
         |      / greatest(sum(cnt * len(gram)), 1)::DOUBLE AS dup5_char_frac
         |  FROM c5 GROUP BY 1)
         |SELECT d.doc_id, coalesce(ls.n_lines, 0)::BIGINT AS n_lines,
         |  coalesce(ls.dup_line_frac, 0.0) AS dup_line_frac,
         |  coalesce(ls.dup_line_char_frac, 0.0) AS dup_line_char_frac,
         |  t2.top2_gram, t2.top2_char_frac, t3.top3_char_frac, d5.dup5_char_frac
         |FROM documents d
         |LEFT JOIN ls USING (doc_id)
         |JOIN (SELECT doc_id, top2_gram, top2_char_frac FROM t2 WHERE rn = 1) t2 USING (doc_id)
         |JOIN (SELECT doc_id, top3_char_frac FROM t3 WHERE rn = 1) t3 USING (doc_id)
         |JOIN d5 USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Mirrors Pii.scrub over the same planted-PII construction. The regex
    // patterns are byte-identical to Pii.{Email,Ipv4,Phone}Pattern — they
    // live in the dialect-portable subset (no lookaround/backrefs/
    // alternation) so Java regex and RE2 match identically; 'g' flag makes
    // DuckDB's replace global like Spark's.
    "q_pii_scrub" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 2 THEN substr(text, 1, 60)
         |    ELSE substr(text, 1, 60) || ' contact user' || doc_id::VARCHAR
         |      || '@example.com via 10.0.' || (doc_id % 256)::VARCHAR
         |      || '.7 or tel +1415555' || ((doc_id % 9000) + 1000)::VARCHAR
         |    END AS text
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, text,
         |    len(regexp_extract_all(text, '${llm.Pii.EmailPattern}')) AS n_emails,
         |    len(regexp_extract_all(text, '${llm.Pii.Ipv4Pattern}')) AS n_ips,
         |    len(regexp_extract_all(text, '${llm.Pii.PhonePattern}')) AS n_phones
         |  FROM p)
         |SELECT doc_id, n_emails, n_ips, n_phones,
         |  n_emails + n_ips + n_phones > 0 AS has_pii,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '${llm.Pii.EmailPattern}', '<EMAIL>', 'g'),
         |    '${llm.Pii.Ipv4Pattern}', '<IP>', 'g'),
         |    '${llm.Pii.PhonePattern}', '<PHONE>', 'g') AS redacted
         |FROM c ORDER BY doc_id""".stripMargin,

    // Byte-bucket histogram over the utf8 bytes: bytes recovered from
    // hex(encode(text)) two chars at a time; count/greatest(n,1) double
    // division is bit-exact vs the FakeCodec's JVM arithmetic.
    "q_media_features" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |e AS (
        |  SELECT media_id, unnest(range(0, n_bytes)) AS i, hx FROM b),
        |h AS (
        |  SELECT media_id,
        |    ((strpos('0123456789ABCDEF', substr(hx, CAST(i * 2 + 1 AS INT), 1)) - 1) * 16
        |      + (strpos('0123456789ABCDEF', substr(hx, CAST(i * 2 + 2 AS INT), 1)) - 1)) % 16 AS bucket,
        |    count(*) AS c
        |  FROM e GROUP BY 1, 2),
        |g AS (
        |  SELECT media_id, n_bytes, CAST(unnest(range(0, 16)) AS INT) AS bucket FROM b)
        |SELECT g.media_id, g.n_bytes, 'utf8' AS format, g.bucket,
        |  COALESCE(h.c, 0)::DOUBLE / greatest(g.n_bytes, 1)::DOUBLE AS feature
        |FROM g LEFT JOIN h ON g.media_id = h.media_id AND g.bucket = h.bucket
        |ORDER BY g.media_id, g.bucket""".stripMargin,

    // frame-containment mirror: the q_media_frames sampling grid (32-byte
    // frames, every 2nd) over corpus ∪ planted grid-aligned clips,
    // md5 digests, distinct per media, shared-count join ≥ 2
    "q_media_frame_overlap" ->
      """WITH c AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, substring(text, 65) FROM documents
        |  WHERE doc_id < 10 AND len(text) >= 224),
        |x AS (
        |  SELECT media_id, text,
        |    unnest(range(0, greatest(len(text) // 32, 1))) AS i
        |  FROM c),
        |f AS (
        |  SELECT DISTINCT media_id,
        |    md5(substring(text, CAST(i * 32 + 1 AS INT), 32)) AS fh
        |  FROM x WHERE i % 2 = 0)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM f a JOIN f b ON a.fh = b.fh AND a.media_id < b.media_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // off-grid clip containment mirror: the same content-defined chunker
    // (base-31 mod-1048573 rolling hash over 8-byte windows, cut at ≡ 0
    // mod 32) over corpus ∪ planted OFF-grid clips (offset 33), interior
    // chunk md5s, distinct per media, shared-count join ≥ 2. The inner
    // hash is a list_reduce fold — always-append, LIST state (the DuckDB
    // 1.0 fold rules, see uniEstep). The chunk CTE generator is shared
    // with the incremental/prebuilt/delete forms below.
    "q_media_clip_offgrid" -> clipBuildSql(""),
    // streamed chunk state ≡ the inline build (shared VERBATIM); erasure
    // serves exactly the survivors (clips are never tombstoned)
    "q_media_clip_stream" -> clipBuildSql(""),
    "q_media_clip_stream_erasure" -> clipBuildSql("WHERE doc_id % 10 <> 7"),

    // incremental probe: batch = the planted clips, corpus chunk table
    // persisted — batch-vs-corpus AND batch-internal pairs, id_new from
    // the batch; corpus-internal pairs not re-derived. Shared VERBATIM
    // by the prebuilt form (the steady-state path must be
    // indistinguishable from the inline one).
    "q_media_clip_incr" -> clipIncrSql(""),
    "q_media_clip_prebuilt" -> clipIncrSql(""),
    // deletion-aware maintenance: the purged corpus ids fold out of the
    // persisted chunk table; the probe over the maintained artifact must
    // equal the truth over corpus ∖ deleted
    "q_media_clip_delete" -> clipIncrSql("WHERE doc_id % 10 <> 7"),

    "q_media_frames" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, greatest(len(text) // 64, 1))) AS i
        |  FROM documents)
        |SELECT doc_id AS media_id, i AS frame_idx,
        |  hex(encode(substring(text, CAST(i * 64 + 1 AS INT), 64))) AS frame_hex
        |FROM f WHERE i % 4 = 0 ORDER BY media_id, frame_idx""".stripMargin,

    // md5 over the same utf8 bytes on both engines (ASCII corpus); lower-hex
    // rendering matches Spark's md5()
    "q_media_dedup" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_copies,
        |  min(doc_id) AS canonical_id
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,

    // PERCEPTUAL media near-dup mirror: the q_media_features byte-bucket
    // histogram CTE (bit-exact count/n division) over corpus ∪ planted
    // re-encodes (text doubled: histogram invariant, digest different),
    // features quantized to 8 bits, 4 bands of 4 coords packed
    // radix-65536 (the fold order of the Spark aggregate), candidates =
    // band-exact matches, verify = sequential-fold cosine ≥ 0.9995 —
    // the band-match ∧ cosine predicate IS the contract, mirrored whole.
    "q_media_neardup" -> mediaNearDupSql,
    // … over the STREAM-MAINTAINED features state (state == corpus ⇒ the
    // same truth recompute, shared verbatim)
    "q_media_neardup_stream" -> mediaNearDupSql,
    // … with tombstones folded in: pairs among the SURVIVORS (erased base
    // docs drop; the planted re-encodes are not tombstoned)
    "q_media_neardup_erasure" ->
      s"""${mediaNearDupCtesWhere("doc_id % 10 <> 6")}
         |SELECT id_a, id_b, score FROM scored
         |WHERE score >= 0.9995 ORDER BY id_a, id_b""".stripMargin,

    // … the pairs composed with the existing cluster machinery: connected
    // components over the perceptual near-dup graph, label = min reachable
    // id via the recursive-CTE closure (the q_dedup_clusters discipline —
    // an independent algorithm meeting Spark's label propagation at the
    // same fixpoint).
    "q_media_neardup_clusters" ->
      s"""$mediaNearDupCtes,
         |p AS (SELECT id_a, id_b FROM scored WHERE score >= 0.9995),
         |edges AS (
         |  SELECT id_a AS s, id_b AS d FROM p
         |  UNION SELECT id_b, id_a FROM p),
         |reach(id, r) AS (
         |  SELECT s, s FROM edges
         |  UNION
         |  SELECT reach.id, e2.d FROM reach JOIN edges e2 ON e2.s = reach.r)
         |SELECT id AS media_id, min(r) AS cluster_id
         |FROM reach GROUP BY id ORDER BY media_id""".stripMargin,

    // … the incremental ingest form: the same chain restricted to pairs
    // INVOLVING the batch (docs ≡ 3 mod 4 ∪ the planted re-encodes),
    // batch id left; batch-internal pairs keep scored's (min, max)
    // orientation — corpus-internal pairs are the build row's job.
    "q_media_neardup_incr" ->
      s"""$mediaNearDupCtes
         |SELECT CASE WHEN (id_a >= 1000000 OR id_a % 4 = 3)
         |    THEN id_a ELSE id_b END AS id_new,
         |  CASE WHEN (id_a >= 1000000 OR id_a % 4 = 3)
         |    THEN id_b ELSE id_a END AS id_other,
         |  score
         |FROM scored
         |WHERE score >= 0.9995
         |  AND ((id_a >= 1000000 OR id_a % 4 = 3)
         |    OR (id_b >= 1000000 OR id_b % 4 = 3))
         |ORDER BY id_new, id_other""".stripMargin,

    "q_embed_near_dups" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${dotSql("a.embedding", "b.embedding")} /
         |    (sqrt(${dotSql("a.embedding", "a.embedding")}) *
         |     sqrt(${dotSql("b.embedding", "b.embedding")})) AS score
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${dotSql("a.embedding", "b.embedding")} /
         |    (sqrt(${dotSql("a.embedding", "a.embedding")}) *
         |     sqrt(${dotSql("b.embedding", "b.embedding")})) >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,

    // same pair graph as q_embed_near_dups, recursive-CTE component
    // labeling as in q_dedup_clusters, then exact micro-unit sums and ONE
    // IEEE division per (cluster, dim) — mirrors clusterCentroids'
    // portability discipline (floor(v·1e6) on the float's exact double)
    // power-iteration mirror: unrolled per-iteration (gradient, norm,
    // direction) CTEs — micro-unit integer gradient sums, the squared-
    // component fold in DIM ORDER (list_reduce = the Scala reduceLeft),
    // correctly-rounded sqrt ⇒ every iteration's v bit-equal
    "q_pca_direction" ->
      s"""WITH $pcaCtes
         |SELECT CAST(generate_subscripts(vl, 1) - 1 AS INT) AS dim,
         |  unnest(vl) AS v
         |FROM pv$pcaIters ORDER BY dim""".stripMargin,

    // top-k deflation mirror: a second full power chain over the residual
    // CTE (x − (x·v)·v, dot first — the identical expression order), so
    // both components are bit-equal
    "q_pca_topk" ->
      s"""WITH ${pcaChain("embeddings", "p")},
         |e2 AS ($pcaResidual),
         |${pcaChain("e2", "q")}
         |SELECT CAST(0 AS INT) AS component,
         |  CAST(generate_subscripts(vl, 1) - 1 AS INT) AS dim, unnest(vl) AS v
         |FROM pv$pcaIters
         |UNION ALL
         |SELECT 1, CAST(generate_subscripts(vl, 1) - 1 AS INT), unnest(vl)
         |FROM qv$pcaIters
         |ORDER BY component, dim""".stripMargin,

    // whitening mirror: ORIGINAL vectors projected onto both deflated
    // directions, each coordinate divided by the identical
    // sqrt(sqrt(n2)/n) scale — the n2 CTEs are already in the chains
    "q_pca_whiten" ->
      s"""WITH ${pcaChain("embeddings", "p")},
         |e2 AS ($pcaResidual),
         |${pcaChain("e2", "q")},
         |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
         |c0 AS (
         |  SELECT e.vec_id, CAST(0 AS INT) AS component,
         |    ${dotSql("e.embedding", "v.vl")} /
         |      sqrt(sqrt(pn.n2) / CAST(c.n AS DOUBLE)) AS coord
         |  FROM embeddings e, pv$pcaIters v, pn$pcaIters pn, cnt c),
         |c1 AS (
         |  SELECT e.vec_id, 1 AS component,
         |    ${dotSql("e.embedding", "v.vl")} /
         |      sqrt(sqrt(qn.n2) / CAST(c.n AS DOUBLE)) AS coord
         |  FROM embeddings e, qv$pcaIters v, qn$pcaIters qn, cnt c)
         |SELECT * FROM c0 UNION ALL SELECT * FROM c1
         |ORDER BY vec_id, component""".stripMargin,

    // the projection applied with the final direction: x − (x·v)·v on
    // bit-identical operands
    "q_pca_remove" ->
      s"""WITH $pcaCtes
         |SELECT t.vec_id, t.dim, t.xd - t.s * t.vl[t.dim + 1] AS c
         |FROM (
         |  SELECT e.vec_id, ${dotSql("e.embedding", "v.vl")} AS s,
         |    CAST(generate_subscripts(e.embedding, 1) - 1 AS INT) AS dim,
         |    unnest(e.embedding)::DOUBLE AS xd, v.vl AS vl
         |  FROM embeddings e, pv$pcaIters v) t
         |ORDER BY vec_id, dim""".stripMargin,

    // mean-centering mirror: identical micro-unit mean (floor to 1e-6
    // grid, exact integer sum, ONE division) and per-element subtraction
    // on bit-identical doubles
    // outlier mirror: the q_embed_center per-dim micro-mean rebuilt as an
    // ordered list, the identical scan-side squared-diff fold, micro
    // distance quantization, then the hourlyAnomalies z op order
    "q_embed_outliers" ->
      """WITH x AS (
        |  SELECT vec_id,
        |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
        |    unnest(embedding) AS v
        |  FROM embeddings),
        |m AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(v::DOUBLE * 1e6) AS BIGINT)) AS BIGINT) AS s
        |  FROM x GROUP BY dim),
        |mu AS (
        |  SELECT list(s::DOUBLE / (n::DOUBLE * 1e6) ORDER BY dim) AS m
        |  FROM m),
        |d AS (
        |  SELECT vec_id,
        |    CAST(floor(sqrt(list_reduce(
        |      list_transform(list_zip(embedding, m),
        |        t -> (t[1]::DOUBLE - t[2]) * (t[1]::DOUBLE - t[2])),
        |      (x, y) -> x + y)) * 1e6) AS BIGINT) AS dist_micro
        |  FROM embeddings, mu),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nn,
        |    CAST(sum(dist_micro) AS BIGINT) AS sd,
        |    CAST(sum(dist_micro * dist_micro) AS BIGINT) AS sq
        |  FROM d)
        |SELECT vec_id, dist_micro,
        |  CASE WHEN (sq::DOUBLE / nn::DOUBLE)
        |         - (sd::DOUBLE / nn::DOUBLE) * (sd::DOUBLE / nn::DOUBLE) > 0
        |    THEN (dist_micro::DOUBLE - sd::DOUBLE / nn::DOUBLE)
        |      / sqrt((sq::DOUBLE / nn::DOUBLE)
        |             - (sd::DOUBLE / nn::DOUBLE) * (sd::DOUBLE / nn::DOUBLE))
        |    ELSE 0.0 END AS z,
        |  abs(CASE WHEN (sq::DOUBLE / nn::DOUBLE)
        |         - (sd::DOUBLE / nn::DOUBLE) * (sd::DOUBLE / nn::DOUBLE) > 0
        |    THEN (dist_micro::DOUBLE - sd::DOUBLE / nn::DOUBLE)
        |      / sqrt((sq::DOUBLE / nn::DOUBLE)
        |             - (sd::DOUBLE / nn::DOUBLE) * (sd::DOUBLE / nn::DOUBLE))
        |    ELSE 0.0 END) > 2.0 AS outlier
        |FROM d, st ORDER BY vec_id""".stripMargin,

    "q_embed_center" ->
      """WITH x AS (
        |  SELECT vec_id,
        |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
        |    unnest(embedding) AS v
        |  FROM embeddings),
        |m AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(v::DOUBLE * 1e6) AS BIGINT)) AS BIGINT) AS s
        |  FROM x GROUP BY dim)
        |SELECT x.vec_id, x.dim,
        |  x.v::DOUBLE - (m.s::DOUBLE / (m.n::DOUBLE * 1e6)) AS c
        |FROM x JOIN m USING (dim)
        |ORDER BY vec_id, dim""".stripMargin,

    "q_embed_centroids" -> (embedCentroidCtes +
      """
        |SELECT cluster_id, n_members, dim,
        |  s_micro::DOUBLE / (n_members::DOUBLE * 1e6) AS c
        |FROM a ORDER BY cluster_id, dim""".stripMargin),

    // the incremental row's whole claim: maintained sums = the full
    // recompute — oracle shared VERBATIM with q_embed_centroids
    "q_embed_centroids_incr" -> (embedCentroidCtes +
      """
        |SELECT cluster_id, n_members, dim,
        |  s_micro::DOUBLE / (n_members::DOUBLE * 1e6) AS c
        |FROM a ORDER BY cluster_id, dim""".stripMargin),

    // deletion-aware centroid maintenance: maintained (labels, sums)
    // state after an erasure ≡ the full recompute over corpus ∖ deleted
    "q_centroids_delete" -> (embedCentroidCtesWhere("WHERE vec_id % 10 <> 4") +
      """
        |SELECT cluster_id, n_members, dim,
        |  s_micro::DOUBLE / (n_members::DOUBLE * 1e6) AS c
        |FROM a ORDER BY cluster_id, dim""".stripMargin),

    // streamed fold ≡ full recompute over the whole corpus / survivors
    "q_centroids_stream" -> (embedCentroidCtes +
      """
        |SELECT cluster_id, n_members, dim,
        |  s_micro::DOUBLE / (n_members::DOUBLE * 1e6) AS c
        |FROM a ORDER BY cluster_id, dim""".stripMargin),
    "q_centroids_stream_erasure" ->
      (embedCentroidCtesWhere("WHERE vec_id % 10 <> 4") +
      """
        |SELECT cluster_id, n_members, dim,
        |  s_micro::DOUBLE / (n_members::DOUBLE * 1e6) AS c
        |FROM a ORDER BY cluster_id, dim""".stripMargin),
    // erase → re-ingest churn serves the FULL corpus again: the
    // version-ordered erasure join keeps the returned vectors alive
    "q_centroids_stream_reingest" -> (embedCentroidCtes +
      """
        |SELECT cluster_id, n_members, dim,
        |  s_micro::DOUBLE / (n_members::DOUBLE * 1e6) AS c
        |FROM a ORDER BY cluster_id, dim""".stripMargin),

    // nearest-centroid assignment: centroid lists rebuilt dim-ordered, the
    // same sequential-fold cosine, argmax pinned (score desc, cluster_id)
    "q_embed_assign" -> (embedCentroidCtes + s""",
        |cl AS (
        |  SELECT cluster_id,
        |    list(s_micro::DOUBLE / (n_members::DOUBLE * 1e6) ORDER BY dim)
        |      AS centroid
        |  FROM a GROUP BY cluster_id),
        |sc AS (
        |  SELECT e.vec_id, cl.cluster_id,
        |    ${dotSql("e.embedding", "cl.centroid")} /
        |      (sqrt(${dotSql("e.embedding", "e.embedding")}) *
        |       sqrt(${dotSql("cl.centroid", "cl.centroid")})) AS score,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY ${dotSql("e.embedding", "cl.centroid")} /
        |        (sqrt(${dotSql("e.embedding", "e.embedding")}) *
        |         sqrt(${dotSql("cl.centroid", "cl.centroid")})) DESC,
        |        cl.cluster_id) AS rn
        |  FROM embeddings e CROSS JOIN cl)
        |SELECT vec_id, cluster_id, score FROM sc WHERE rn = 1
        |ORDER BY vec_id""".stripMargin),

    // SemDeDup mirror, DEFAULT = k-means codebook (unrolled Lloyd CTEs,
    // k pinned at kmK since the data-driven k = max(8, ⌈n/1024⌉) = 8 at
    // catalog SFs): within-cell ε-pairs, a recursive closure for the
    // duplicate groups, rep = (centroid_sim ASC, vec_id ASC) rank 1.
    // q_semantic_dedup_prebuilt shares it VERBATIM (below): the prebuilt-
    // assignment path must be indistinguishable from the inline one.
    "q_semantic_dedup" -> kmeansSemanticSql,
    "q_semantic_dedup_prebuilt" -> kmeansSemanticSql,

    // distributed Lloyd trainer: fixed-iteration unrolled mirror (the
    // q_bpe_merges technique) — init, argmin assignment, micro-unit
    // centroid updates, and empty-cell carry-forward all pinned
    "q_kmeans" -> kmeansSql,
    // SemDeDup off near-dup-graph centroids: the small-corpus explicit-
    // codebook variant, dedup tail identical to q_semantic_dedup's
    "q_semantic_dedup_graph" -> semanticDedupSql,

    // silhouette mirror over the same unrolled-Lloyd codebook: per-vector
    // (d, cell) rank EXACTLY the assignment expression, a/b shifted by
    // ‖v‖² in one addition, s floored to micro-units before the exact sum
    "q_cluster_quality" -> (kmeansCtes(kmK, kmIters) + s""",
      |sd AS (
      |  SELECT e.vec_id, c.cell,
      |    ${dotSql("c.centroid", "c.centroid")} - ${dotSql("e.v", "c.centroid")} * 2.0 AS d,
      |    ${dotSql("e.v", "e.v")} AS vv
      |  FROM e0 e CROSS JOIN cl$kmIters c),
      |rk AS (
      |  SELECT vec_id, cell, d, vv,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |  FROM sd),
      |ab AS (
      |  SELECT a.vec_id, a.cell, a.d + a.vv AS da, b.d + b.vv AS db
      |  FROM rk a JOIN rk b ON b.vec_id = a.vec_id AND b.rn = 2
      |  WHERE a.rn = 1),
      |sm AS (
      |  SELECT vec_id, cell,
      |    CASE WHEN greatest(da, db) > 0
      |      THEN CAST(floor(((db - da) / greatest(da, db)) * 1e6) AS BIGINT)
      |      ELSE 0 END AS smicro
      |  FROM ab)
      |SELECT cell, count(*) AS n_members, sum(smicro)::BIGINT AS sil_micro_sum,
      |  sum(smicro)::DOUBLE / (count(*)::DOUBLE * 1e6) AS mean_sil
      |FROM sm GROUP BY cell ORDER BY cell""".stripMargin),

    // unigram-LM trainer: unrolled 2-round Viterbi-EM, final vocab with
    // last-round counts and add-1-smoothed nano log-probs (see uniCtes)
    "q_unigram_train" -> (uniCtes(40, 20) + """
      |SELECT piece, cnt, lp AS lp_nano FROM v2 ORDER BY piece""".stripMargin),

    // inference over the trained vocab: one more E-step CTE stack under
    // v2's map, tokens space-joined (contract #1)
    "q_unigram_encode" -> (uniCtes(40, 20) + """,
      |mp3 AS (SELECT map(list(piece ORDER BY piece), list(lp ORDER BY piece)) AS mp FROM v2)""".stripMargin
      + uniEstep("ww", "mp3", "3") + """
      |SELECT word, freq, CAST(len(toks) AS INT) AS n_tokens,
      |  array_to_string(toks, ' ') AS toks
      |FROM tk3 ORDER BY word""".stripMargin),

    // the prebuilt form serves the SAME values as the inline encode
    "q_unigram_encode_prebuilt" -> (uniCtes(40, 20) + """,
      |mp3 AS (SELECT map(list(piece ORDER BY piece), list(lp ORDER BY piece)) AS mp FROM v2)""".stripMargin
      + uniEstep("ww", "mp3", "3") + """
      |SELECT word, freq, CAST(len(toks) AS INT) AS n_tokens,
      |  array_to_string(toks, ' ') AS toks
      |FROM tk3 ORDER BY word""".stripMargin),

    // subword-regularization sampling over the trained vocab — the FFBS
    // mirror (see uniSampleCtes) with alpha=1, salt 'r14'
    "q_unigram_sample" -> (uniCtes(40, 20) + """,
      |mp3 AS (SELECT map(list(piece ORDER BY piece), list(lp ORDER BY piece)) AS mp FROM v2)""".stripMargin
      + uniSampleCtes("mp3", "1.0", "r14") + """
      |SELECT word, freq, CAST(len(toks) AS INT) AS n_tokens,
      |  array_to_string(toks, ' ') AS toks
      |FROM tks ORDER BY word""".stripMargin),

    "q_bpe_merges" -> bpeMergesSql(6),

    // inference over the trained merges: w6's carrier, symbols re-split
    "q_bpe_encode" -> (bpeCtes(6) + """
      |SELECT word,
      |  CAST(len(list_filter(string_split(tok, chr(31)), x -> x <> '')) AS INT)
      |    AS n_tokens,
      |  array_to_string(list_filter(string_split(tok, chr(31)), x -> x <> ''), ' ')
      |    AS toks
      |FROM w6 ORDER BY word""".stripMargin),
  )

  /** SemDeDup oracle body — shared verbatim by q_semantic_dedup and
    * q_semantic_dedup_prebuilt (the steady-state form must be
    * indistinguishable from the inline one). */
  private lazy val semanticDedupSql: String = (embedCentroidCtes + s""",
      |cl AS (
      |  SELECT cluster_id,
      |    list(s_micro::DOUBLE / (n_members::DOUBLE * 1e6) ORDER BY dim)
      |      AS centroid
      |  FROM a GROUP BY cluster_id)""".stripMargin
    + semanticDedupTail)

  /** The SemDeDup chain downstream of a centroid codebook CTE `cl`
    * (cluster_id, centroid): cosine assignment, within-cell ε-pairs,
    * recursive duplicate-group closure, rep = (centroid_sim, vec_id)
    * rank 1. Appended to the label-propagation codebook
    * ([[semanticDedupSql]], q_semantic_dedup_graph) and the k-means codebook
    * alike — the dedup semantics must not depend on where the codebook
    * came from. */
  private lazy val semanticDedupTail: String = (s""",
      |sc2 AS (
      |  SELECT e.vec_id, e.embedding, cl.cluster_id,
      |    ${dotSql("e.embedding", "cl.centroid")} /
      |      (sqrt(${dotSql("e.embedding", "e.embedding")}) *
      |       sqrt(${dotSql("cl.centroid", "cl.centroid")})) AS score,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${dotSql("e.embedding", "cl.centroid")} /
      |        (sqrt(${dotSql("e.embedding", "e.embedding")}) *
      |         sqrt(${dotSql("cl.centroid", "cl.centroid")})) DESC,
      |        cl.cluster_id) AS rn
      |  FROM embeddings e CROSS JOIN cl),
      |asg AS (
      |  SELECT vec_id, embedding, cluster_id AS cell, score AS centroid_sim
      |  FROM sc2 WHERE rn = 1),
      |pr2 AS (
      |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
      |  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id
      |  WHERE ${dotSql("x.embedding", "y.embedding")} /
      |      (sqrt(${dotSql("x.embedding", "x.embedding")}) *
      |       sqrt(${dotSql("y.embedding", "y.embedding")})) >= 0.5),
      |e2 AS (
      |  SELECT id_a AS s, id_b AS d FROM pr2
      |  UNION SELECT id_b, id_a FROM pr2),
      |reach2(id, r) AS (
      |  SELECT s, s FROM e2
      |  UNION
      |  SELECT reach2.id, z.d FROM reach2 JOIN e2 z ON z.s = reach2.r),
      |lbl2 AS (SELECT id, min(r) AS sem_group FROM reach2 GROUP BY id),
      |mem AS (
      |  SELECT g.vec_id, l.sem_group, g.centroid_sim,
      |    row_number() OVER (PARTITION BY l.sem_group
      |      ORDER BY g.centroid_sim, g.vec_id) AS rr
      |  FROM asg g JOIN lbl2 l ON l.id = g.vec_id)
      |SELECT vec_id, sem_group, centroid_sim, (rr = 1) AS kept FROM mem
      |UNION ALL
      |SELECT g2.vec_id, CAST(-1 AS BIGINT) AS sem_group, g2.centroid_sim,
      |  TRUE AS kept
      |FROM asg g2 LEFT JOIN lbl2 ON lbl2.id = g2.vec_id
      |WHERE lbl2.id IS NULL
      |ORDER BY vec_id""".stripMargin)

  /** Unrolled Lloyd k-means CTE chain mirroring [[graft.llm.Kmeans]]:
    * init = first k vectors by id, then per iteration the argmin
    * assignment (d = ||c||² − 2·v·c in the identical association order,
    * ties → smallest cell), exact micro-unit (cell, dim) sums, and the
    * empty-cell carry-forward LEFT JOIN. Ends with cl$iters (cell,
    * centroid list), ct$iters (long form), u$iters (final counts). */
  private def kmeansCtes(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    // RECURSIVE: harmless for the plain unrolled chain, required when the
    // SemDeDup tail (recursive group closure) is appended
    sb ++= s"""WITH RECURSIVE e0 AS (
      |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      |  FROM embeddings),
      |cl0 AS (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
      |    v AS centroid
      |  FROM (SELECT vec_id, v FROM e0 ORDER BY vec_id LIMIT $k) z),
      |ct0 AS (
      |  SELECT cell, CAST(generate_subscripts(centroid, 1) - 1 AS INT) AS dim,
      |    unnest(centroid) AS c
      |  FROM cl0)""".stripMargin
    for (t <- 1 to iters) {
      sb ++= s""",
      |s$t AS (
      |  SELECT e.vec_id, e.v, c.cell,
      |    ${dotSql("c.centroid", "c.centroid")} - ${dotSql("e.v", "c.centroid")} * 2.0 AS d
      |  FROM e0 e CROSS JOIN cl${t - 1} c),
      |a$t AS (
      |  SELECT vec_id, v, cell FROM (
      |    SELECT vec_id, v, cell,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM s$t) z WHERE rn = 1),
      |x$t AS (
      |  SELECT cell, CAST(generate_subscripts(v, 1) - 1 AS INT) AS dim,
      |    unnest(v) AS xv
      |  FROM a$t),
      |u$t AS (
      |  SELECT cell, dim, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(floor(xv * 1e6) AS BIGINT)) AS BIGINT) AS s
      |  FROM x$t GROUP BY 1, 2),
      |ct$t AS (
      |  SELECT p.cell, p.dim,
      |    COALESCE(u.s::DOUBLE / (u.n::DOUBLE * 1e6), p.c) AS c
      |  FROM ct${t - 1} p LEFT JOIN u$t u USING (cell, dim)),
      |cl$t AS (SELECT cell, list(c ORDER BY dim) AS centroid FROM ct$t GROUP BY cell)""".stripMargin
    }
    sb.result()
  }

  private final val kmK = 8
  private final val kmIters = 3

  /** q_kmeans: the final codebook long-form with final-iteration counts. */
  private lazy val kmeansSql: String = kmeansCtes(kmK, kmIters) + s"""
      |SELECT f.cell, CAST(COALESCE(nn.n, 0) AS BIGINT) AS n_members,
      |  f.dim, f.c
      |FROM ct$kmIters f
      |LEFT JOIN (SELECT cell, max(n) AS n FROM u$kmIters GROUP BY cell) nn
      |  USING (cell)
      |ORDER BY cell, dim""".stripMargin

  /** q_semantic_dedup (+_prebuilt): SemDeDup over the k-means codebook — the
    * same dedup tail as [[semanticDedupSql]], codebook swapped. */
  private lazy val kmeansSemanticSql: String = kmeansCtes(kmK, kmIters) + s""",
      |cl AS (SELECT CAST(cell AS BIGINT) AS cluster_id, centroid FROM cl$kmIters)""".stripMargin +
    semanticDedupTail

  /** BM25 constants, interpolated into the oracle so both sides evaluate
    * the literally identical doubles: Scala's Double.toString is the
    * shortest round-tripping decimal, so DuckDB parses back the exact
    * same IEEE value (2.2, 1.2, 0.25, 0.75). Panel shared verbatim with
    * [[graft.llm.Search.DefaultPanel]]. */
  // `final` + literal RHS = compile-time constants: inlined at use sites,
  // immune to object-body initialization order (the oracle map above is
  // initialized first and would read 0.0 from a plain val's field).
  private final val bmK1 = 1.2
  private final val bmB = 0.75
  private lazy val bm25PanelSql: String = graft.llm.Search.DefaultPanel
    .map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  /** Decontamination CTE chain (benchmark gram set → candidate grams →
    * per-doc hit counts), shared by q_decontam and the q_eval_split
    * composition. */
  private lazy val decontamCtes: String =
    s"""bench AS (
       |  SELECT DISTINCT unnest(list_distinct(${shingleWSql(5)})) AS h
       |  FROM documents WHERE doc_id % 50 = 0),
       |cg AS (
       |  SELECT doc_id, unnest(list_distinct(${shingleWSql(5)})) AS h
       |  FROM documents WHERE doc_id % 50 <> 0),
       |a AS (
       |  SELECT doc_id, count(*) AS n_grams,
       |    CAST(sum(CASE WHEN h IN (SELECT h FROM bench) THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_hits
       |  FROM cg GROUP BY doc_id)""".stripMargin

  /** Inverted-bigram-index rebuild: same bigram construction (1-based
    * DuckDB list lambda ↔ 0-based Spark transform), df rails 2 ≤ df ≤
    * floor(0.06 n) — floor of the identical double product — postings as
    * the doc-ordered doc:tf string. Shared by q_inverted_index and
    * q_index_incr (incremental maintenance must equal the rebuild). */
  private def invertedIndexSqlWhere(and: String): String =
    s"""WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS a
      |  FROM documents WHERE len(trim(text)) > 0 $and),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents
      |  WHERE TRUE $and),
      |g AS (
      |  SELECT doc_id, unnest(list_transform(list_slice(a, 1, len(a) - 1),
      |    (x, i) -> x || ' ' || a[i + 1])) AS gram
      |  FROM w WHERE len(a) >= 2),
      |tf AS (SELECT gram, doc_id, CAST(count(*) AS BIGINT) AS tf
      |  FROM g GROUP BY 1, 2),
      |d AS (SELECT gram, CAST(count(*) AS BIGINT) AS df,
      |    CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
      |k AS (SELECT gram, df, cf FROM d, n
      |  WHERE df >= 2 AND df <= CAST(floor(0.06 * n.n) AS BIGINT))
      |SELECT t.gram, k.df, k.cf,
      |  string_agg(t.doc_id || ':' || t.tf, ',' ORDER BY t.doc_id) AS postings
      |FROM tf t JOIN k USING (gram)
      |GROUP BY 1, 2, 3 ORDER BY gram""".stripMargin

  private lazy val invertedIndexSql: String = invertedIndexSqlWhere("")

  /** Unrolled-CTE mirror of [[graft.llm.Pca]] power iteration: init = the
    * min-id vector normalized (sequential-fold self-dot), then per
    * iteration a micro-unit integer gradient sum, a dim-ordered left fold
    * for ‖g‖², and one list_transform division by the correctly-rounded
    * sqrt. */
  private final val pcaIters = 3

  /** One power-iteration chain reading vectors from `src` (a table or
    * CTE with (vec_id, embedding)), CTE names prefixed `p` — so the
    * deflation mirror (q_pca_topk) can stack chains over residual CTEs. */
  private def pcaChain(src: String, p: String): String = {
    val head =
      s"""${p}v0 AS (
         |  SELECT list_transform(e.embedding,
         |    x -> x::DOUBLE / sqrt(${dotSql("e.embedding", "e.embedding")}))
         |    AS vl
         |  FROM $src e
         |  WHERE e.vec_id = (SELECT min(vec_id) FROM $src))""".stripMargin
    val iters = (1 to pcaIters).map { k =>
      s"""${p}g$k AS (
         |  SELECT t.dim,
         |    CAST(sum(CAST(floor((t.s * t.xd) * 1e6) AS BIGINT)) AS BIGINT)
         |      AS g
         |  FROM (
         |    SELECT ${dotSql("e.embedding", "v.vl")} AS s,
         |      CAST(generate_subscripts(e.embedding, 1) - 1 AS INT) AS dim,
         |      unnest(e.embedding)::DOUBLE AS xd
         |    FROM $src e, ${p}v${k - 1} v) t
         |  GROUP BY t.dim),
         |${p}n$k AS (
         |  SELECT gl,
         |    list_reduce(list_transform(gl, x -> x * x), (a, b) -> a + b)
         |      AS n2
         |  FROM (SELECT list(g::DOUBLE / 1e6 ORDER BY dim) AS gl FROM ${p}g$k)),
         |${p}v$k AS (
         |  SELECT list_transform(gl, x -> x / sqrt(n2)) AS vl FROM ${p}n$k)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }

  private lazy val pcaCtes: String = pcaChain("embeddings", "p")

  /** The deflation residual CTE body (x − (x·v)·v over the first chain's
    * final direction) — shared verbatim by q_pca_topk and q_pca_whiten so
    * the two rows can never disagree about what the residual is. */
  private lazy val pcaResidual: String =
    s"""
       |  SELECT e.vec_id,
       |    list_transform(list_zip(e.embedding, v.vl),
       |      t -> t[1]::DOUBLE - ${dotSql("e.embedding", "v.vl")} * t[2])
       |      AS embedding
       |  FROM embeddings e, pv$pcaIters v""".stripMargin

  /** Unrolled-CTE mirror of [[graft.llm.QualityProbe]] training: feature
    * CTEs (exact counts, single divisions) + per-iteration (gradient,
    * weight) CTE pairs. Every expression is written in the Scala side's
    * association order; gradients floor to the 1e-6 grid and sum as exact
    * integers, so each iteration's weights — and everything computed from
    * them — are bit-identical. lr = 0.5 (exact binary repr). */
  private final val probeIters = 3
  /** Gopher rule battery CTEs ending in `gk` (per-doc measured values +
    * the conjunction verdict) — shared by q_gopher_rules and the
    * probe-calibration AUC. Every count exact-integer, every ratio ONE
    * double division. DuckDB regexp_replace needs the 'g' flag
    * (first-match default); Spark's replaces all. */
  private lazy val gopherCtes: String =
    s"""gw AS (
       |  SELECT doc_id, text,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS a,
       |    string_split(text, chr(10)) AS ls
       |  FROM documents),
       |gm AS (
       |  SELECT doc_id,
       |    CASE WHEN len(trim(text)) = 0 THEN 0
       |      ELSE CAST(len(a) AS BIGINT) END AS n_words,
       |    CAST(list_sum(list_transform(a, x -> len(x))) AS BIGINT)
       |      AS sum_wlen,
       |    CAST(len(text) - len(regexp_replace(text, '#', '', 'g'))
       |      AS BIGINT) AS n_hash,
       |    CAST(floor((len(text) - len(replace(text, '...', ''))) / 3.0)
       |        AS BIGINT) +
       |      CAST(len(text) - len(regexp_replace(text, '…', '', 'g'))
       |        AS BIGINT) AS n_ell,
       |    CAST(len(ls) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(ls, l -> starts_with(ltrim(l), '-')
       |      OR starts_with(ltrim(l), '*') OR starts_with(ltrim(l), '•')))
       |      AS BIGINT) AS n_bullet,
       |    CAST(len(list_filter(ls, l -> ends_with(rtrim(l), '...')
       |      OR ends_with(rtrim(l), '…'))) AS BIGINT) AS n_ellline,
       |    CAST(len(list_filter(a, x -> regexp_matches(x, '[a-z]')))
       |      AS BIGINT) AS n_alpha,
       |    CAST(len(list_filter(a, x -> list_contains(
       |      ['the','be','to','of','and','that','have','with'], x)))
       |      AS BIGINT) AS n_stop
       |  FROM gw),
       |gr AS (
       |  SELECT doc_id, n_words,
       |    CASE WHEN n_words > 0
       |      THEN CAST(sum_wlen AS DOUBLE) / CAST(n_words AS DOUBLE)
       |      ELSE 0.0 END AS mean_wlen,
       |    CASE WHEN n_words > 0
       |      THEN CAST(n_hash + n_ell AS DOUBLE) / CAST(n_words AS DOUBLE)
       |      ELSE 0.0 END AS symbol_ratio,
       |    CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE) AS bullet_frac,
       |    CAST(n_ellline AS DOUBLE) / CAST(n_lines AS DOUBLE)
       |      AS ellipsis_frac,
       |    CASE WHEN n_words > 0
       |      THEN CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE)
       |      ELSE 0.0 END AS alpha_frac,
       |    CASE WHEN n_words > 0 THEN n_stop ELSE 0 END AS stop_hits
       |  FROM gm),
       |gk AS (
       |  SELECT doc_id, n_words, mean_wlen, symbol_ratio, bullet_frac,
       |    ellipsis_frac, alpha_frac, stop_hits,
       |    (n_words >= 50 AND n_words <= 100000
       |     AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
       |     AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
       |     AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
       |     AND stop_hits >= 2) AS kept
       |  FROM gr)""".stripMargin

  /** q_mix_reweight mirror: probe scores + per-source cumsum once, then
    * `rounds` unrolled weight-update rounds. η = 0.5 in micro units. */
  private def mixReweightSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH $probeCtes,
      |sc AS (
      |  SELECT f.doc_id,
      |    CAST(floor((f.x0 * wp.w0 + f.x1 * wp.w1 + f.x2 * wp.w2
      |      + f.x3 * wp.w3) * 1e6) AS BIGINT) AS s_micro
      |  FROM feat f, pw$probeIters wp),
      |mtk AS (
      |  SELECT doc_id, source,
      |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
      |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
      |      AS n_tokens,
      |    md5(CAST(doc_id AS VARCHAR)) AS k
      |  FROM documents),
      |cmx AS (
      |  SELECT doc_id, source,
      |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY k, doc_id)
      |      AS BIGINT) AS cum
      |  FROM mtk),
      |wt0 AS (
      |  SELECT DISTINCT source, CAST(1000000 AS BIGINT) AS w
      |  FROM documents)""".stripMargin
    for (k <- 1 to rounds) {
      sb ++= s""",
      |dn$k AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM wt${k - 1}),
      |bd$k AS (
      |  SELECT source, CAST((8000 * w) // dn$k.t AS BIGINT) AS b
      |  FROM wt${k - 1}, dn$k),
      |kp$k AS (
      |  SELECT cmx.doc_id, cmx.source FROM cmx JOIN bd$k b USING (source)
      |  WHERE cmx.cum <= b.b),
      |st$k AS (
      |  SELECT kp$k.source, CAST(count(*) AS BIGINT) AS cnt,
      |    CAST(sum(sc.s_micro) AS BIGINT) AS sm
      |  FROM kp$k JOIN sc USING (doc_id) GROUP BY 1),
      |mm$k AS (
      |  SELECT w.source AS source, COALESCE(s.cnt, 0) AS cnt,
      |    CASE WHEN COALESCE(s.cnt, 0) = 0 THEN CAST(0 AS BIGINT)
      |         ELSE CAST(s.sm // s.cnt AS BIGINT) END AS m
      |  FROM wt${k - 1} w LEFT JOIN st$k s USING (source)),
      |mn$k AS (SELECT CAST(min(m) AS BIGINT) AS mn FROM mm$k),
      |wt$k AS (
      |  SELECT w.source AS source,
      |    CAST((w.w * (1000000 + (500000 * (m.m - mn.mn)) // 1000000))
      |      // 1000000 AS BIGINT) AS w
      |  FROM wt${k - 1} w JOIN mm$k m USING (source), mn$k mn)""".stripMargin
    }
    sb ++= "\nSELECT * FROM (\n"
    sb ++= (1 to rounds).map { k =>
      s"""  SELECT CAST($k AS INT) AS round, b.source, b.b AS budget,
         |    m.cnt AS n_kept, m.m AS mean_score_micro, w.w AS weight_micro
         |  FROM bd$k b JOIN mm$k m USING (source) JOIN wt$k w USING (source)""".stripMargin
    }.mkString("\n  UNION ALL\n")
    sb ++= "\n) z ORDER BY round, source"
    sb.result()
  }

  private lazy val probeCtes: String = {
    val pred = "f.x0 * wp.w0 + f.x1 * wp.w1 + f.x2 * wp.w2 + f.x3 * wp.w3"
    val head =
      s"""pw_raw AS (
         |  SELECT doc_id, lang, text,
         |    regexp_split_to_array(lower(trim(text)), '\\s+') AS a
         |  FROM documents),
         |pm AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE CAST(len(a) AS BIGINT) END AS n_words,
         |    CAST(list_sum(list_transform(a, x -> len(x))) AS BIGINT)
         |      AS sum_wlen,
         |    CAST(len(list_distinct(a)) AS BIGINT) AS n_distinct
         |  FROM pw_raw),
         |feat AS (
         |  SELECT doc_id, 1.0 AS x0,
         |    CAST(n_words AS DOUBLE) / 100.0 AS x1,
         |    CASE WHEN n_words > 0
         |      THEN CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE)
         |      ELSE 0.0 END AS x2,
         |    CASE WHEN n_words > 0
         |      THEN (CAST(sum_wlen AS DOUBLE) / CAST(n_words AS DOUBLE)) / 10.0
         |      ELSE 0.0 END AS x3,
         |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
         |  FROM pm),
         |pn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM feat),
         |pw0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)""".stripMargin
    val iters = (1 to probeIters).map { k =>
      val gCols = (0 to 3).map(j =>
        s"""CAST(sum(CAST(floor((($pred - f.y) * f.x$j) * 1e6) AS BIGINT))
           |      AS BIGINT) AS g$j""".stripMargin).mkString(",\n    ")
      val wCols = (0 to 3).map(j =>
        s"""wp.w$j - 0.5 * (CAST(g.g$j AS DOUBLE) /
           |      (CAST(n.n AS DOUBLE) * 1e6)) AS w$j""".stripMargin)
        .mkString(",\n    ")
      s"""pg$k AS (
         |  SELECT $gCols
         |  FROM feat f, pw${k - 1} wp),
         |pw$k AS (
         |  SELECT $wCols
         |  FROM pw${k - 1} wp, pg$k g, pn n)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }

  /** The BM25 CTE chain (panel → stats → tokenize → tf → df → quantized
    * idf → micro score → rank), shared by q_bm25, q_bm25_indexed (the
    * index-probe scorer is value-identical with open rails), and
    * q_hybrid_rrf (which consumes the ranked CTE `r` as its lexical
    * system). */
  private lazy val bm25Ctes: String = bm25CtesWhere("TRUE")

  /** [[bm25Ctes]] over a filtered corpus — the erasure-row mirror
    * (streamed tombstone subtraction ≡ inline BM25 over the survivors). */
  private def bm25CtesWhere(cond: String): String =
    s"""panel AS (SELECT * FROM (VALUES $bm25PanelSql) v(query_id, term)),
       |st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN len(trim(text)) = 0 THEN 0
       |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)
       |      AS BIGINT) AS s
       |  FROM documents WHERE $cond),
       |tok AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS dl,
       |    unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
       |  FROM documents WHERE len(trim(text)) > 0 AND $cond),
       |m AS (
       |  SELECT p.query_id, p.term, t.doc_id, t.dl, CAST(count(*) AS BIGINT) AS tf
       |  FROM panel p JOIN tok t ON t.term = p.term
       |  GROUP BY 1, 2, 3, 4),
       |d AS (SELECT query_id, term, CAST(count(*) AS BIGINT) AS df
       |  FROM m GROUP BY 1, 2),
       |i AS (
       |  SELECT d.query_id, d.term,
       |    CAST(floor(ln(1.0 + (CAST(st.n AS DOUBLE) - d.df + 0.5) /
       |      (d.df + 0.5)) * 1e9) AS BIGINT) AS idf_micro
       |  FROM d, st),
       |sc AS (
       |  SELECT m.query_id, m.doc_id,
       |    CAST(sum(CAST(floor(CAST(i.idf_micro AS DOUBLE) / 1e3 *
       |      ((m.tf * ${bmK1 + 1}) / (m.tf + $bmK1 * (${1 - bmB} + $bmB *
       |        (m.dl / (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE)))))))
       |      AS BIGINT)) AS BIGINT) AS score_micro
       |  FROM m JOIN i ON i.query_id = m.query_id AND i.term = m.term, st
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT query_id, doc_id, score_micro,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_micro DESC, doc_id) AS INT) AS rank
       |  FROM sc)""".stripMargin

  private lazy val bm25Sql: String =
    s"""WITH $bm25Ctes
       |SELECT query_id, rank, doc_id, score_micro FROM r WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  /** Snippet-window mirror: the BM25 top-10 CTE chain + an INDEPENDENT
    * window recompute from the raw corpus text (token positions via
    * regexp split — not a mirror of the Spark positional-artifact plan),
    * argmax encoded as hits·10^6 − start exactly like
    * [[graft.llm.Search.snippetWindows]]. Shared verbatim by the batch
    * (`q_snippets`) and streamed (`q_snippets_stream`) serving rows. */
  private lazy val snippetsSql: String =
    s"""WITH $bm25Ctes,
       |top AS (SELECT query_id, doc_id, rank FROM r WHERE rank <= 10),
       |ta AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS a
       |  FROM documents WHERE len(trim(text)) > 0),
       |qt AS (SELECT query_id, list(DISTINCT term) AS terms
       |  FROM panel GROUP BY 1),
       |snip AS (
       |  SELECT t.query_id, t.rank, t.doc_id,
       |    list_max(list_transform(
       |      list_filter(range(1, len(k.a) + 1),
       |        i -> list_contains(q.terms, k.a[i])),
       |      s -> CAST(len(list_filter(range(1, len(k.a) + 1),
       |             j -> j >= s AND j <= s + 7
       |               AND list_contains(q.terms, k.a[j]))) AS BIGINT)
       |           * 1000000 - CAST(s - 1 AS BIGINT))) AS best_score
       |  FROM top t
       |  JOIN ta k ON k.doc_id = t.doc_id
       |  JOIN qt q ON q.query_id = t.query_id)
       |SELECT query_id, rank, doc_id,
       |  CAST(floor((best_score + 999999) / 1000000.0) AS BIGINT) * 1000000
       |    - best_score AS best_start,
       |  CAST(floor((best_score + 999999) / 1000000.0) AS BIGINT) AS best_hits
       |FROM snip ORDER BY query_id, rank""".stripMargin

  /** Dirichlet-QL mirror (μ = 2000): the [[graft.llm.Search.qlFromIndex]]
    * rank-equivalent matching-terms form with each ln floored at 1e-9. */
  private lazy val qlSql: String =
    s"""WITH panel AS (SELECT * FROM (VALUES $bm25PanelSql) v(query_id, term)),
       |nq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_terms
       |  FROM panel GROUP BY 1),
       |st AS (
       |  SELECT CAST(sum(CASE WHEN len(trim(text)) = 0 THEN 0
       |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)
       |      AS BIGINT) AS s
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS dl,
       |    unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
       |  FROM documents WHERE len(trim(text)) > 0),
       |tf AS (SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
       |  FROM tok GROUP BY 1, 2, 3),
       |cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
       |m AS (
       |  SELECT p.query_id, t.doc_id, t.dl,
       |    CAST(sum(CAST(floor(ln(1.0 +
       |      (CAST(t.tf AS DOUBLE) * CAST(st.s AS DOUBLE)) /
       |        (2000.0 * CAST(c.cf AS DOUBLE))) * 1e9) AS BIGINT))
       |      AS BIGINT) AS m_sum
       |  FROM panel p JOIN tf t ON t.term = p.term
       |  JOIN cf c ON c.term = p.term, st
       |  GROUP BY 1, 2, 3),
       |sc AS (
       |  SELECT m.query_id, m.doc_id,
       |    m.m_sum + nq.n_terms *
       |      CAST(floor(ln(2000.0 / (CAST(m.dl AS DOUBLE) + 2000.0)) * 1e9)
       |        AS BIGINT) AS score_micro
       |  FROM m JOIN nq USING (query_id)),
       |r AS (
       |  SELECT query_id, doc_id, score_micro,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_micro DESC, doc_id) AS INT) AS rank
       |  FROM sc)
       |SELECT query_id, rank, doc_id, score_micro FROM r WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  /** Phrase panel as (phrase_id, bigram) VALUES rows — the identical
    * distinct-sorted bigram expansion [[graft.llm.Search.phraseQuery]]
    * uses ([[graft.llm.Search.phraseGrams]]). */
  private lazy val phrasePanelSql: String = graft.llm.Search.PhrasePanel
    .flatMap { case (pid, ph) =>
      graft.llm.Search.phraseGrams(ph).map(g => s"($pid, '$g')") }
    .mkString(", ")

  /** Phrase panel as (phrase_id, [word, …]) VALUES rows — the ordered
    * word expansion [[graft.llm.Search.phraseQueryExact]] chains over
    * ([[graft.llm.Search.phraseWords]]). */
  private lazy val phraseWordsPanelSql: String = graft.llm.Search.PhrasePanel
    .map { case (pid, ph) =>
      s"($pid, [${graft.llm.Search.phraseWords(ph).map(w => s"'$w'").mkString(", ")}])" }
    .mkString(", ")

  /** Phrase panel as (phrase_id, [distinct words]) VALUES rows — the
    * order-free word set [[graft.llm.Search.proximityQuery]] windows
    * over. */
  private lazy val proximityPanelSql: String = graft.llm.Search.PhrasePanel
    .map { case (pid, ph) =>
      s"($pid, [${graft.llm.Search.phraseWords(ph).distinct
        .map(w => s"'$w'").mkString(", ")}])" }
    .mkString(", ")

  /** EXACT phrase truth: count sliding-window token-slice equalities per
    * (phrase, doc) — shared VERBATIM by the batch positional-index probe
    * and its streamed segmented-state sibling. */
  private lazy val phraseExactSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS a
       |  FROM documents WHERE len(trim(text)) > 0),
       |panel(phrase_id, w) AS (VALUES $phraseWordsPanelSql),
       |m AS (
       |  SELECT p.phrase_id, t.doc_id, CAST(len(p.w) AS BIGINT) AS n_words,
       |    CAST(len(list_filter(range(1, len(t.a) - len(p.w) + 2),
       |      i -> t.a[i : i + len(p.w) - 1] = p.w)) AS BIGINT) AS phrase_tf
       |  FROM panel p JOIN tok t ON len(t.a) >= len(p.w))
       |SELECT phrase_id, doc_id, n_words, phrase_tf FROM m
       |WHERE phrase_tf > 0 ORDER BY phrase_id, doc_id""".stripMargin

  /** Conjunctive phrase lookup over the railed bigram index — shared
    * VERBATIM by the batch probe (q_index_phrase) and the streamed
    * segmented-state probe (q_index_phrase_stream): the bucket pruning
    * both probes apply is the identity restricted to the panel grams. */
  private lazy val phraseQuerySql: String =
    s"""WITH w AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS a
       |  FROM documents WHERE len(trim(text)) > 0),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(list_transform(list_slice(a, 1, len(a) - 1),
       |    (x, i) -> x || ' ' || a[i + 1])) AS gram
       |  FROM w WHERE len(a) >= 2),
       |tf AS (SELECT gram, doc_id, CAST(count(*) AS BIGINT) AS tf
       |  FROM g GROUP BY 1, 2),
       |d AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |k AS (SELECT gram FROM d, n
       |  WHERE df >= 2 AND df <= CAST(floor(0.06 * n.n) AS BIGINT)),
       |panel(phrase_id, gram) AS (VALUES $phrasePanelSql),
       |need AS (SELECT phrase_id, CAST(count(*) AS BIGINT) AS n_grams
       |  FROM panel GROUP BY 1),
       |hit AS (SELECT p.phrase_id, p.gram FROM panel p JOIN k USING (gram)),
       |m AS (
       |  SELECT h.phrase_id, t.doc_id,
       |    count(DISTINCT h.gram) AS np, min(t.tf) AS phrase_tf
       |  FROM hit h JOIN tf t USING (gram) GROUP BY 1, 2)
       |SELECT m.phrase_id, m.doc_id, need.n_grams, m.phrase_tf
       |FROM m JOIN need USING (phrase_id) WHERE m.np = need.n_grams
       |ORDER BY phrase_id, doc_id""".stripMargin

  /** Shared embedding-centroid CTE chain: label-blocked cosine pairs →
    * recursive component closure → per-(cluster, dim) exact micro sums.
    * q_embed_centroids publishes `a` directly; q_embed_assign rebuilds the
    * centroid lists from it and argmaxes per vector. */
  private def embedCentroidCtesWhere(where: String): String =
    s"""WITH RECURSIVE src AS (SELECT * FROM embeddings $where),
       |pr AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM src a JOIN src b
       |    ON a.label = b.label AND a.vec_id < b.vec_id
       |  WHERE ${dotSql("a.embedding", "b.embedding")} /
       |      (sqrt(${dotSql("a.embedding", "a.embedding")}) *
       |       sqrt(${dotSql("b.embedding", "b.embedding")})) >= 0.4),
       |edges AS (
       |  SELECT id_a AS s, id_b AS d FROM pr
       |  UNION SELECT id_b, id_a FROM pr),
       |reach(id, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT reach.id, e2.d FROM reach JOIN edges e2 ON e2.s = reach.r),
       |lbl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
       |x AS (
       |  SELECT l.cluster_id, e.vec_id,
       |    CAST(generate_subscripts(e.embedding, 1) - 1 AS INT) AS dim,
       |    unnest(e.embedding) AS v
       |  FROM src e JOIN lbl l ON l.id = e.vec_id),
       |a AS (
       |  SELECT cluster_id, dim, CAST(count(*) AS BIGINT) AS n_members,
       |    sum(CAST(floor(v::DOUBLE * 1e6) AS BIGINT)) AS s_micro
       |  FROM x GROUP BY 1, 2)""".stripMargin

  private lazy val embedCentroidCtes: String = embedCentroidCtesWhere("")

  /** Unrolled BPE training CTE chain: `m` merge rounds — pair counting,
    * (cnt desc, pair) argmax, and the delimiter-wrapped greedy rewrite,
    * each mirroring [[graft.llm.Bpe]] exactly (chr(31) = the U+001F
    * carrier; DuckDB's sequential replace = Java's). `word` rides along so
    * the encode oracle can read the final tokenization. */
  private def bpeCtes(m: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH ww AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
      |    FROM documents) z
      |  WHERE word <> '' GROUP BY word),
      |w0 AS (
      |  SELECT word, freq,
      |    array_to_string(list_transform(range(1, len(word) + 1),
      |      i -> chr(31) || substr(word, i, 1) || chr(31)), '')
      |      || chr(31) || '</w>' || chr(31) AS tok
      |  FROM ww)""".stripMargin
    for (k <- 1 to m) {
      sb ++= s""",
      |s$k AS (
      |  SELECT freq, list_filter(string_split(tok, chr(31)), x -> x <> '') AS syms
      |  FROM w${k - 1}),
      |p$k AS (
      |  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
      |    SELECT freq, unnest(list_transform(range(1, len(syms)),
      |      i -> syms[i] || ' ' || syms[i + 1])) AS pair
      |    FROM s$k) z GROUP BY pair),
      |b$k AS (SELECT pair, cnt FROM p$k ORDER BY cnt DESC, pair LIMIT 1),
      |w$k AS (
      |  SELECT w.word, w.freq, replace(w.tok,
      |    chr(31) || split_part(b.pair, ' ', 1) || chr(31)
      |      || chr(31) || split_part(b.pair, ' ', 2) || chr(31),
      |    chr(31) || split_part(b.pair, ' ', 1)
      |      || split_part(b.pair, ' ', 2) || chr(31)) AS tok
      |  FROM w${k - 1} w, b$k b)""".stripMargin
    }
    sb.result()
  }

  /** Unigram-LM trainer mirror — the unrolled-EM complement to
    * [[bpeCtes]]: seed substring counts, then per round one E-step CTE
    * stack (forward DP / predecessor array / pointer chase / piece
    * derivation) and one prune+renormalize pair. The per-word Viterbi DP
    * runs as list_reduce folds over nano-log-prob LONGS (exact integer
    * arithmetic — both engines pick bit-identical segmentations); the
    * vocab rides in as a MAP column off a 1-row CTE, mirroring Spark's
    * literal map.
    *
    * DuckDB 1.0 fold discipline (found the hard way): a lambda branch
    * that returns the accumulator UNCHANGED cross-contaminates rows when
    * list lengths differ, and STRUCT accumulators are broken outright —
    * so both folds append every iteration (the pointer chase appends 0
    * once the walk reaches the origin) and carry LIST(BIGINT) state only.
    * Piece reconstruction therefore happens OUTSIDE the fold: pred[j] is
    * total (the forward max always has a witness), the path is pointer
    * chasing, and pieces fall out of consecutive path pairs. */
  /** Content-defined-chunking CTE chain over a (media_id, text)
    * relation `rel`: per-media cut bounds (the base-31 mod-1048573
    * window hash as an always-append list_reduce fold — see the DuckDB
    * fold rules on [[uniEstep]]), chunk slices, distinct digests as
    * `f$t` (media_id, ch). Shared by every q_media_clip_* mirror. */
  private def clipChunkCtes(rel: String, t: String): String =
    s"""x$t AS (
      |  SELECT media_id, text,
      |    list_sort(list_distinct(list_concat(list_concat([CAST(0 AS BIGINT)],
      |      CASE WHEN len(text) >= 8
      |        THEN list_filter(range(8, len(text) + 1), i ->
      |          list_reduce(list_prepend(CAST(0 AS BIGINT),
      |            list_transform(range(i - 7, i + 1), j ->
      |              CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT))),
      |            (acc, b) -> (acc * 31 + b) % 1048573) % 32 = 0)
      |        ELSE [] END),
      |      [CAST(len(text) AS BIGINT)]))) AS bounds
      |  FROM $rel),
      |k$t AS (
      |  SELECT media_id, unnest(list_transform(range(1, len(bounds)), k ->
      |    substr(text, CAST(bounds[CAST(k AS INT)] AS INT) + 1,
      |      CAST(bounds[CAST(k AS INT) + 1] - bounds[CAST(k AS INT)] AS INT)))) AS chunk
      |  FROM x$t),
      |f$t AS (SELECT DISTINCT media_id, md5(chunk) AS ch FROM k$t)""".stripMargin

  /** Build-form clip-containment mirror over corpus (optionally
    * erasure-filtered) ∪ planted off-grid clips — shared by the inline
    * build, the streamed state, and its erasure form. */
  private def clipBuildSql(where: String): String =
    s"""WITH c AS (
      |  SELECT doc_id AS media_id, text FROM documents $where
      |  UNION ALL
      |  SELECT doc_id + 3000000, substring(text, 34) FROM documents
      |  WHERE doc_id < 10 AND len(text) >= 224),
      |${clipChunkCtes("c", "")}""".stripMargin + """
      |SELECT a.media_id AS id_a, b.media_id AS id_b,
      |  CAST(count(*) AS BIGINT) AS n_shared
      |FROM f a JOIN f b ON a.ch = b.ch AND a.media_id < b.media_id
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY id_a, id_b""".stripMargin

  /** Incremental/prebuilt/delete clip-containment mirror: corpus chunks
    * (optionally erasure-filtered by `where`), batch chunks over the
    * planted off-grid clips, pair counting with the batch orientation. */
  private def clipIncrSql(where: String): String =
    s"""WITH cc AS (
      |  SELECT doc_id AS media_id, text FROM documents $where),
      |${clipChunkCtes("cc", "c")},
      |cb AS (
      |  SELECT doc_id + 3000000 AS media_id, substring(text, 34) AS text
      |  FROM documents WHERE doc_id < 10 AND len(text) >= 224),
      |${clipChunkCtes("cb", "b")},
      |uni AS (
      |  SELECT media_id, ch, FALSE AS fb FROM fc
      |  UNION ALL
      |  SELECT media_id, ch, TRUE AS fb FROM fb)
      |SELECT a.media_id AS id_new, b.media_id AS id_other,
      |  CAST(count(*) AS BIGINT) AS n_shared
      |FROM fb a JOIN uni b ON a.ch = b.ch
      |  AND a.media_id <> b.media_id
      |  AND (NOT b.fb OR a.media_id < b.media_id)
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY id_new, id_other""".stripMargin

  private def uniNeg = "CAST(-1099511627776 AS BIGINT)"

  private def uniEstep(src: String, mpcte: String, out: String): String = s""",
      |bl$out AS (
      |  SELECT word, freq, mp, list_reduce(
      |    list_prepend([CAST(0 AS BIGINT)],
      |      list_transform(range(1, len(word) + 1), i -> [CAST(0 AS BIGINT)])),
      |    (acc, x) -> list_append(acc, list_aggregate(
      |      list_filter(list_transform([1,2,3,4], l ->
      |        CASE WHEN len(acc) >= l THEN acc[len(acc) - l + 1] + coalesce(
      |          map_extract(mp, substr(word, len(acc) - l + 1, l))[1],
      |          CASE WHEN l = 1 THEN $uniNeg END) END),
      |        v -> v IS NOT NULL), 'max'))) AS bl
      |  FROM $src CROSS JOIN $mpcte),
      |pr$out AS (
      |  SELECT word, freq, list_transform(range(1, len(word) + 1), j ->
      |    j - list_aggregate(list_filter(list_transform([1,2,3,4], l ->
      |      CASE WHEN j >= l AND bl[CAST(j AS INT) + 1] = bl[CAST(j AS INT) - l + 1]
      |          + coalesce(map_extract(mp, substr(word, CAST(j AS INT) - l + 1, l))[1],
      |              CASE WHEN l = 1 THEN $uniNeg END)
      |        THEN CAST(l AS BIGINT) END),
      |      v -> v IS NOT NULL), 'min')) AS pr
      |  FROM bl$out),
      |pa$out AS (
      |  SELECT word, freq, list_reduce(
      |    list_prepend([CAST(len(word) AS BIGINT)],
      |      list_transform(range(1, len(word) + 1), i -> [CAST(0 AS BIGINT)])),
      |    (acc, x) -> list_append(acc,
      |      CASE WHEN acc[len(acc)] <= 0 THEN CAST(0 AS BIGINT)
      |           ELSE pr[CAST(acc[len(acc)] AS INT)] END)) AS path
      |  FROM pr$out),
      |tk$out AS (
      |  SELECT word, freq, list_reverse(list_filter(
      |    list_transform(range(1, len(path)), k ->
      |      CASE WHEN path[CAST(k AS INT)] > 0 THEN substr(word,
      |        CAST(path[CAST(k AS INT) + 1] AS INT) + 1,
      |        CAST(path[CAST(k AS INT)] - path[CAST(k AS INT) + 1] AS INT)) END),
      |    x -> x IS NOT NULL)) AS toks
      |  FROM pa$out),
      |c$out AS (
      |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
      |    SELECT freq, unnest(toks) AS piece FROM tk$out) z GROUP BY piece)""".stripMargin

  /** FFBS subword-regularization mirror (q_unigram_sample): forward
    * nano-log marginals via grid-floored logsumexp (candidates in pinned
    * l = 1..4 order), backward sampling with md5-deterministic draws
    * `hex13(md5(salt:word:pos))/2^52` — replays
    * [[graft.expr.UnigramSample]]'s lattice walk op-for-op, then reuses
    * the Viterbi mirror's path-chase/pieces CTE shapes verbatim. */
  private def uniSampleCtes(mpcte: String, alpha: String,
      salt: String): String = {
    val cand = s"""list_transform([1,2,3,4], l ->
      |      CASE WHEN len(acc) >= l THEN acc[len(acc) - l + 1] +
      |        CAST(floor(coalesce(map_extract(mp, substr(word, len(acc) - l + 1, l))[1],
      |          CASE WHEN l = 1 THEN $uniNeg END)::DOUBLE * $alpha) AS BIGINT) END)""".stripMargin
    val plist = s"""list_transform(list_transform([1,2,3,4], l2 ->
      |      CASE WHEN k >= l2 THEN coalesce(
      |        exp(((al[CAST(k AS INT) - l2 + 1] +
      |          CAST(floor(map_extract(mp, substr(word, CAST(k AS INT) - l2 + 1, l2))[1]::DOUBLE * $alpha) AS BIGINT))
      |          - al[CAST(k AS INT) + 1])::DOUBLE * 1e-9),
      |        CASE WHEN l2 = 1 THEN exp(((al[CAST(k AS INT)] + CAST(floor($uniNeg::DOUBLE * $alpha) AS BIGINT)) - al[CAST(k AS INT) + 1])::DOUBLE * 1e-9) ELSE 0.0 END)
      |      ELSE 0.0 END), x -> [x])""".stripMargin
    val uexpr = s"(CAST(concat('0x', substr(md5('$salt:' || word || ':' || k), 1, 13)) AS BIGINT)::DOUBLE / 4503599627370496.0)"
    val chosen = "list_aggregate(list_filter(list_transform([1,2,3,4], l -> " +
      "CASE WHEN list_reduce(list_prepend([0.0], " + plist + "), " +
      "(acc2, x2) -> list_append(acc2, acc2[len(acc2)] + x2[1]))[l + 1] > " +
      uexpr + " THEN CAST(l AS BIGINT) END), v -> v IS NOT NULL), 'min')"
    val fallback = """list_aggregate(list_filter(list_transform([1,2,3,4], l ->
      |      CASE WHEN k >= l AND (l = 1 OR map_extract(mp, substr(word, CAST(k AS INT) - l + 1, l))[1] IS NOT NULL)
      |      THEN CAST(l AS BIGINT) END), v -> v IS NOT NULL), 'max')""".stripMargin
    s""",
      |fls AS (
      |  SELECT word, freq, mp, list_reduce(
      |    list_prepend([CAST(0 AS BIGINT)],
      |      list_transform(range(1, len(word) + 1), i -> [CAST(0 AS BIGINT)])),
      |    (acc, x) -> list_append(acc, (
      |      list_aggregate(list_filter($cand, v -> v IS NOT NULL), 'max')
      |      + CAST(floor(ln(list_aggregate(list_transform(
      |          list_filter($cand, v -> v IS NOT NULL),
      |          c -> exp((c - list_aggregate(list_filter($cand, v -> v IS NOT NULL), 'max'))::DOUBLE * 1e-9)), 'sum')) * 1e9) AS BIGINT)
      |    ))) AS al
      |  FROM ww CROSS JOIN $mpcte),
      |chs AS (
      |  SELECT word, freq, list_transform(range(1, len(word) + 1), k ->
      |    k - coalesce($chosen, $fallback)) AS pr
      |  FROM fls),
      |pas AS (
      |  SELECT word, freq, list_reduce(
      |    list_prepend([CAST(len(word) AS BIGINT)],
      |      list_transform(range(1, len(word) + 1), i -> [CAST(0 AS BIGINT)])),
      |    (acc, x) -> list_append(acc,
      |      CASE WHEN acc[len(acc)] <= 0 THEN CAST(0 AS BIGINT)
      |           ELSE pr[CAST(acc[len(acc)] AS INT)] END)) AS path
      |  FROM chs),
      |tks AS (
      |  SELECT word, freq, list_reverse(list_filter(
      |    list_transform(range(1, len(path)), k ->
      |      CASE WHEN path[CAST(k AS INT)] > 0 THEN substr(word,
      |        CAST(path[CAST(k AS INT) + 1] AS INT) + 1,
      |        CAST(path[CAST(k AS INT)] - path[CAST(k AS INT) + 1] AS INT)) END),
      |    x -> x IS NOT NULL)) AS toks
      |  FROM pas)""".stripMargin
  }

  private def uniCtes(seedMulti: Int, keepMulti: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH ww AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
      |    FROM documents) z
      |  WHERE word <> '' GROUP BY word),
      |sub AS (
      |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
      |    SELECT freq, unnest(flatten(list_transform(range(1, len(word) + 1), i ->
      |      list_filter(list_transform([1,2,3,4], l ->
      |        CASE WHEN i + l - 1 <= len(word) THEN substr(word, CAST(i AS INT), l) END),
      |        x -> x IS NOT NULL)))) AS piece
      |    FROM ww) z GROUP BY piece),
      |v0c AS (
      |  SELECT piece, cnt FROM sub WHERE len(piece) = 1
      |  UNION ALL
      |  SELECT piece, cnt FROM (
      |    SELECT piece, cnt FROM sub WHERE len(piece) >= 2
      |    ORDER BY cnt DESC, piece LIMIT $seedMulti) z),
      |v0 AS (
      |  SELECT piece, cnt, CAST(floor(ln((cnt + 1)::DOUBLE /
      |    (SELECT sum(cnt + 1) FROM v0c)::DOUBLE) * 1e9) AS BIGINT) AS lp
      |  FROM v0c),
      |mp1 AS (SELECT map(list(piece ORDER BY piece), list(lp ORDER BY piece)) AS mp FROM v0)""".stripMargin
    sb ++= uniEstep("ww", "mp1", "1")
    sb ++= s""",
      |k1 AS (
      |  SELECT v.piece AS piece, coalesce(c.cnt, 0) AS cnt
      |  FROM v0 v LEFT JOIN c1 c ON c.piece = v.piece WHERE len(v.piece) = 1
      |  UNION ALL
      |  SELECT piece, cnt FROM (
      |    SELECT v.piece AS piece, coalesce(c.cnt, 0) AS cnt
      |    FROM v0 v LEFT JOIN c1 c ON c.piece = v.piece WHERE len(v.piece) >= 2
      |    ORDER BY cnt DESC, piece LIMIT $keepMulti) z),
      |v1 AS (
      |  SELECT piece, cnt, CAST(floor(ln((cnt + 1)::DOUBLE /
      |    (SELECT sum(cnt + 1) FROM k1)::DOUBLE) * 1e9) AS BIGINT) AS lp
      |  FROM k1),
      |mp2 AS (SELECT map(list(piece ORDER BY piece), list(lp ORDER BY piece)) AS mp FROM v1)""".stripMargin
    sb ++= uniEstep("ww", "mp2", "2")
    sb ++= """,
      |k2 AS (
      |  SELECT v.piece AS piece, coalesce(c.cnt, 0) AS cnt
      |  FROM v1 v LEFT JOIN c2 c ON c.piece = v.piece),
      |v2 AS (
      |  SELECT piece, cnt, CAST(floor(ln((cnt + 1)::DOUBLE /
      |    (SELECT sum(cnt + 1) FROM k2)::DOUBLE) * 1e9) AS BIGINT) AS lp
      |  FROM k2)""".stripMargin
    sb.result()
  }

  private def bpeMergesSql(m: Int): String = {
    val sb = new StringBuilder
    sb ++= bpeCtes(m)
    sb ++= "\nSELECT * FROM (\n"
    sb ++= (1 to m).map { k =>
      s"""  SELECT $k AS "rank", split_part(pair, ' ', 1) AS "left",
         |    split_part(pair, ' ', 2) AS "right",
         |    split_part(pair, ' ', 1) || split_part(pair, ' ', 2) AS merged,
         |    cnt FROM b$k""".stripMargin
    }.mkString("\n  UNION ALL\n")
    sb ++= "\n) z ORDER BY \"rank\""
    sb.result()
  }

  /** The composed release's mirror — every stage byte-identical to
    * its standalone row's mirror, stacked (see the q_release_pipeline
    * entry comment). Shared VERBATIM by q_release_pipeline and
    * q_release_stream (a `def`, not a `val`: see the object-init-order
    * trap note). */
  private def releasePipelineSql: String =
    releasePipelineSqlWhere("doc_id % 50 <> 0")

  /** [[releasePipelineSql]] with a parametrized corpus predicate — the
    * erasure form's mirror is the batch pipeline over the SURVIVORS. */
  private def releasePipelineSqlWhere(pred: String): String =
      s"""WITH RECURSIVE d0 AS (
         |  SELECT * FROM documents WHERE $pred),
         |${curationNdCtes("d0")},
         |bench AS (
         |  SELECT DISTINCT unnest(list_distinct(${shingleWSql(5)})) AS h
         |  FROM documents WHERE doc_id % 50 = 0),
         |cg AS (
         |  SELECT doc_id, unnest(list_distinct(${shingleWSql(5)})) AS h
         |  FROM nd),
         |ca AS (
         |  SELECT doc_id, count(*) AS n_grams,
         |    CAST(sum(CASE WHEN h IN (SELECT h FROM bench) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_hits
         |  FROM cg GROUP BY doc_id),
         |clean AS (
         |  SELECT doc_id FROM ca
         |  WHERE NOT ((n_hits::DOUBLE / n_grams::DOUBLE) >= 0.3)),
         |w AS (
         |  SELECT n.doc_id,
         |    regexp_split_to_array(lower(trim(n.text)), '\\s+') AS toks
         |  FROM nd n JOIN clean USING (doc_id)),
         |ww AS (SELECT doc_id, unnest(toks) AS term FROM w),
         |vt AS (
         |  SELECT term, count(*) AS tf_total FROM ww WHERE term <> ''
         |  GROUP BY term ORDER BY tf_total DESC, term LIMIT 20),
         |v AS (
         |  SELECT term, CAST(row_number()
         |    OVER (ORDER BY tf_total DESC, term) AS INT) AS term_id
         |  FROM vt),
         |e AS (
         |  SELECT doc_id, unnest(toks) AS term,
         |    generate_subscripts(toks, 1) AS pos
         |  FROM w),
         |j AS (
         |  SELECT e.doc_id, e.pos, COALESCE(v.term_id, 0) AS tid
         |  FROM e LEFT JOIN v USING (term)),
         |tk AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
         |  FROM j GROUP BY doc_id),
         |pk AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(floor(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::DOUBLE
         |      / 4096) AS BIGINT) AS shard
         |  FROM tk),
         |mt AS (
         |  SELECT p.shard, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
         |    CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs
         |  FROM pk p JOIN documents d USING (doc_id) GROUP BY p.shard)
         |SELECT * FROM (
         |  SELECT 'shard' AS kind, shard, n_docs, n_tokens, n_sources, n_langs
         |  FROM mt
         |  UNION ALL
         |  SELECT 'card', CAST(-1 AS BIGINT), CAST(count(*) AS BIGINT),
         |    CAST(sum(p.n_tokens) AS BIGINT),
         |    CAST(count(DISTINCT d.source) AS BIGINT),
         |    CAST(count(DISTINCT d.lang) AS BIGINT)
         |  FROM pk p JOIN documents d USING (doc_id)) z
         |ORDER BY kind, shard""".stripMargin

}
