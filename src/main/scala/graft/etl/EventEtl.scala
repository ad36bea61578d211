package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.expr.HmacSha256
import graft.model.AmplitudeEvent

/** The reference's per-record transform chain (`utils.js:37-90`,
  * `synchronous-pull.js:56-72`) re-expressed as composable narrow
  * `DataFrame => DataFrame` stages — no shuffle anywhere in the chain, so
  * Catalyst fuses the whole thing into one stage regardless of input size
  * (the 100 TB path is embarrassingly parallel).
  *
  * Design choices vs the reference (SURVEY.md §1.4):
  *   - the dynamic JSON payload is parsed once into a Spark 4 `VARIANT`
  *     column (`parse_json`) instead of per-field string probing. Variant
  *     preserves JSON value *types*, which the semantics need: session_id is
  *     repaired only when it arrives as a *string* (`utils.js:58-68`), and
  *     validation requires `time` to be a *number* (`utils.js:34`).
  *   - absent `user_properties` is treated as an empty map rather than
  *     crashing (reference bug B2, SURVEY.md §2.6 — deliberate fix).
  *   - stringified `event_properties`/`user_properties` are re-parsed only in
  *     the non-op/data branch, matching reference behavior B3 exactly.
  *
  * PLAN-SIZE INVARIANT (load-bearing): every stage computes its new columns
  * from plain *attributes* of the previous stage, and the expensive parse
  * (`try_parse_json`) sits exactly one projection below the stage that
  * extracts ALL fields from it. Catalyst's scan-planning collapses
  * Project/Filter chains over a relation by inlining aliases; if derived
  * columns reference derived columns across many levels, the inlined tree
  * multiplies per level (the fan-outs compound multiplicatively) and plan
  * construction explodes. Keeping each expensive column's consumers one
  * level deep bounds the fully-inlined plan to linear size, and codegen
  * subexpression elimination dedups the repeated subtrees at runtime.
  *
  * Internal working columns are prefixed `_g_` and dropped by `flatten`;
  * caller passthrough columns (e.g. a test-fixture `event_id`) survive the
  * whole chain.
  */
object EventEtl {

  val IdentifyVerbs: Seq[String] = AmplitudeEvent.IdentifyVerbs

  /** Untyped variant extraction (the Scala API only exposes the typed
    * 3-arg form; target "variant" = SQL `variant_get(v, path)`). */
  private def vget(v: Column, path: String): Column =
    variant_get(v, path, "variant")

  /** JSON-number variant types (`schema_of_variant` output). */
  private def isNumericVariant(st: Column): Column =
    st.isin("TINYINT", "SMALLINT", "INT", "BIGINT", "FLOAT", "DOUBLE") ||
      st.startsWith("DECIMAL")

  /** Append derived columns in one projection over the current attributes. */
  private def addCols(df: DataFrame, cols: (String, Column)*): DataFrame =
    df.select(df.columns.map(col) ++ cols.map { case (n, c) => c.as(n) }: _*)

  /** JS `parseInt(s, 10)`: leading whitespace skipped, longest leading
    * digit run parsed, otherwise null (caller maps null → -1 per
    * `utils.js:61-65`). Stricter than JS only outside the data domain
    * (no 0x hex, no >2^63 precision-loss parse — documented divergence,
    * SURVEY.md §7.4.2). */
  def parseIntCol(s: Column): Column = {
    val tok = regexp_extract(s, "^\\s*([+-]?[0-9]+)", 1)
    when(length(tok) > 0, tok.cast(LongType)).otherwise(lit(null).cast(LongType))
  }

  /** O2 — base64 → JSON text (reference `synchronous-pull.js:57`). */
  def decode(df: DataFrame, inputCol: String = "value"): DataFrame =
    addCols(df, "_g_decoded" -> unbase64(col(inputCol)).cast("string"))

  /** O3+O4 — envelope unwrap: `.jsonPayload`, the optional `Fields` layer
    * (`utils.js:38-39`), the op/data re-parse (`utils.js:41-42`), plus the
    * publish-time message attribute (`synchronous-pull.js:59-63`). Produces
    * `_g_event` (variant), `_g_opdata` (bool), `_g_publish_time` (string).
    *
    * Two projections: (1) parse the envelope once into `_g_env`; (2) derive
    * `_g_event`/`_g_opdata` from the `_g_env` attribute. The local vals
    * below are expression *trees* (repeated per use site), but every leaf is
    * the `_g_env` attribute, so the fully-inlined size stays linear. */
  def unwrapEnvelope(df: DataFrame): DataFrame = {
    val parsed = addCols(df,
      "_g_env" -> try_parse_json(col("_g_decoded")),
      "_g_publish_time" -> get_json_object(col("_g_decoded"),
        "$['attributes']['logging.googleapis.com/timestamp']"))

    val payload = vget(col("_g_env"), "$.jsonPayload")
    val fieldsV = vget(col("_g_env"), "$.jsonPayload.Fields")
    // `if (event.Fields)` — JSON null is falsy too, so guard both SQL null
    // and variant null before descending.
    val f = when(fieldsV.isNotNull && !is_variant_null(fieldsV), fieldsV)
      .otherwise(payload)
    val op = vget(f, "$.op")
    val data = vget(f, "$.data")
    // coalesce → false: an absent op/data field yields NULL from
    // schema_of_variant, and a NULL `_g_opdata` would poison every
    // `!_g_opdata` guard downstream (three-valued logic).
    val opdata = coalesce(
      schema_of_variant(op) === "STRING" &&
        length(variant_get(op, "$", "string")) > 0 &&
        schema_of_variant(data) === "STRING" &&
        length(variant_get(data, "$", "string")) > 0,
      lit(false))

    addCols(parsed,
      "_g_opdata" -> opdata,
      "_g_event" -> when(opdata, try_parse_json(variant_get(data, "$", "string")))
        .otherwise(f))
      .drop("_g_env")
  }

  /** O5 — parse stringified `event_properties`/`user_properties` in place,
    * flat-form branch only (`utils.js:44-50`; op/data payloads are assumed
    * fully structured — reference behavior B3). Produces `_g_ep`, `_g_up`
    * variant columns (each references only the `_g_event` attribute). */
  def parseStringifiedProps(df: DataFrame): DataFrame = {
    def parsed(field: String): Column = {
      val v = vget(col("_g_event"), s"$$.$field")
      val asStr = variant_get(v, "$", "string")
      when(!col("_g_opdata") && schema_of_variant(v) === "STRING" && length(asStr) > 0,
        try_parse_json(asStr)).otherwise(v)
    }
    addCols(df, "_g_ep" -> parsed("event_properties"), "_g_up" -> parsed("user_properties"))
  }

  /** O6 — the validation gate (`utils.js:28-35`, gate at L54-56): keep rows
    * with (non-empty-string device_id OR non-empty-string user_id) AND
    * non-empty-string event_type AND positive numeric time. Type checks are
    * strict (a numeric user_id fails `is.nonEmptyString`, a string time fails
    * `is.positive`), exactly as `check-types` does.
    * Extracts ALL scalar fields in one projection (`_g_user_id`,
    * `_g_device_id`, `_g_event_type`, `_g_time_d`), then MARKS validity as
    * `_g_valid` instead of filtering. Deliberately no `Filter` node: Catalyst
    * pushes filter predicates down through every Project, substituting the
    * aliased variant-extraction trees into the predicate at each level —
    * the predicate inflates to MB-scale task binaries. The marker keeps the
    * plan tiny; invalid rows are dropped structurally by [[splitIdentify]]
    * emitting a null row-array (posexplode of null = zero rows), so invalid
    * rows still cost nothing downstream of the explode. Callers who need a
    * filtered relation use [[validOnly]]. */
  def validate(df: DataFrame): DataFrame = {
    def strField(field: String): Column = {
      val v = vget(col("_g_event"), s"$$.$field")
      when(schema_of_variant(v) === "STRING", variant_get(v, "$", "string"))
    }
    val timeV = vget(col("_g_event"), "$.time")
    val s1 = addCols(df,
      "_g_user_id" -> strField("user_id"),
      "_g_device_id" -> strField("device_id"),
      "_g_event_type" -> strField("event_type"),
      "_g_time_d" -> when(isNumericVariant(schema_of_variant(timeV)),
        variant_get(timeV, "$", "double")))
    addCols(s1, "_g_valid" ->
      ((coalesce(length(col("_g_device_id")), lit(0)) > 0 ||
        coalesce(length(col("_g_user_id")), lit(0)) > 0) &&
        coalesce(length(col("_g_event_type")), lit(0)) > 0 &&
        coalesce(col("_g_time_d") > 0, lit(false))))
  }

  /** [[validate]] + an actual row filter — for inspection/staged queries.
    * The pipeline itself never filters (see validate's scaladoc). */
  def validOnly(df: DataFrame): DataFrame =
    validate(df).filter(col("_g_valid"))

  /** O7 — session_id repair (`utils.js:58-68`): strings get JS-`parseInt`
    * semantics with un-parseable → -1; numbers (including floats) pass
    * through untouched; absent stays absent. Produces `_g_session` (double —
    * double because numeric passthrough may be fractional). */
  def repairSessionId(df: DataFrame): DataFrame = {
    val sv = vget(col("_g_event"), "$.session_id")
    val st = schema_of_variant(sv)
    addCols(df, "_g_session" ->
      when(st === "STRING",
        coalesce(parseIntCol(variant_get(sv, "$", "string")).cast(DoubleType), lit(-1.0)))
        .when(isNumericVariant(st), variant_get(sv, "$", "double"))
        .otherwise(lit(null).cast(DoubleType)))
  }

  /** O8 — pseudonymize: `user_id := HMAC-SHA256(key, user_id)` hex, only when
    * present (`utils.js:70-72`). */
  def pseudonymize(df: DataFrame, hmacKey: String): DataFrame =
    df.withColumn("_g_user_id",
      when(coalesce(length(col("_g_user_id")), lit(0)) > 0,
        HmacSha256(lit(hmacKey), col("_g_user_id"))))

  /** O9 — dedup key: `insert_id = hmac(key, hashed_user_id, device_id,
    * session_id, event_type, time)` (`utils.js:74`). Must run AFTER
    * [[pseudonymize]] — the preimage contains the HMAC hex of the uid, not
    * the raw uid (hash-of-hash, SURVEY.md §2.3.1). Falsy components (absent
    * device_id, session_id = 0) are skipped inside the expression. */
  def deriveInsertId(df: DataFrame, hmacKey: String): DataFrame =
    addCols(df, "_g_insert_id" ->
      HmacSha256(lit(hmacKey), col("_g_user_id"), col("_g_device_id"),
        col("_g_session"), col("_g_event_type"), col("_g_time_d")))

  /** O10 — identify split (`utils.js:76-84,105-116`,
    * `synchronous-pull.js:65-72`): when any identify verb is *assigned*
    * (present, non-null) in `user_properties`, emit a synthetic `$identify`
    * record carrying exactly the verb keys, before the original event which
    * keeps exactly the non-verb keys (disjoint partition of the map). The
    * identify record has no time/session_id/insert_id (`utils.js:78-83`).
    * Ordering is preserved structurally: both records stay in ONE array cell
    * until [[flatten]] explodes them with their position — no reliance on
    * cross-partition row order (SURVEY.md §7.4.3).
    *
    * Three projections (map materialize → verb partition → row array), each
    * referencing only the previous stage's attributes. */
  def splitIdentify(df: DataFrame): DataFrame = {
    val verbCol = (k: Column) => k.isin(IdentifyVerbs: _*)

    // 1. user_properties as map<string,variant> when it is a JSON object.
    val s1 = addCols(df, "_g_up_map" ->
      when(schema_of_variant(col("_g_up")).startsWith("OBJECT"),
        col("_g_up").cast("map<string,variant>")))

    // 2. disjoint verb / non-verb partition + the `is.assigned` trigger
    //    (JSON-null verbs do NOT trigger, `utils.js:77`).
    val s2 = addCols(s1,
      "_g_up_verbs" -> map_filter(col("_g_up_map"), (k, _) => verbCol(k)),
      "_g_up_rest" -> map_filter(col("_g_up_map"), (k, _) => !verbCol(k)),
      "_g_has_identify" -> coalesce(
        size(map_filter(col("_g_up_map"), (k, v) => verbCol(k) && !is_variant_null(v))) > 0,
        lit(false)))

    // 3. the 1→{1,2} row array (identify first).
    val nullS = lit(null).cast("string")
    val identify = struct(
      col("_g_user_id").as("user_id"),
      col("_g_device_id").as("device_id"),
      lit("$identify").as("event_type"),
      lit(null).cast(LongType).as("time"),
      lit(null).cast(DoubleType).as("session_id"),
      nullS.as("insert_id"),
      nullS.as("event_properties"),
      to_json(col("_g_up_verbs")).as("user_properties"),
      lit(true).as("is_identify"))
    val httpapi = struct(
      col("_g_user_id").as("user_id"),
      col("_g_device_id").as("device_id"),
      col("_g_event_type").as("event_type"),
      col("_g_time_d").cast(LongType).as("time"),
      col("_g_session").as("session_id"),
      col("_g_insert_id").as("insert_id"),
      to_json(col("_g_ep")).as("event_properties"),
      // Verb keys are stripped from the original event ONLY when the split
      // triggers (`splitIdentifyPayload` is called inside the identify
      // branch, `utils.js:76-84`): an all-JSON-null verb map stays intact.
      when(col("_g_has_identify"), to_json(col("_g_up_rest")))
        .otherwise(to_json(col("_g_up"))).as("user_properties"),
      lit(false).as("is_identify"))

    // Invalid rows (O6) get a NULL array — posexplode of null emits zero
    // rows, which drops them without any Filter node in the plan.
    addCols(s2, "_g_rows" ->
      when(col("_g_valid"),
        when(col("_g_has_identify"), array(identify, httpapi))
          .otherwise(array(httpapi))))
  }

  /** Explode the per-input record array into flattened output rows, keeping
    * intra-pair order as `seq` (identify first — SURVEY.md §2.3.3) and
    * dropping all `_g_` working columns. Caller columns pass through. */
  def flatten(df: DataFrame, inputCol: String = "value"): DataFrame = {
    val keep = df.columns.filter(c => !c.startsWith("_g_") && c != inputCol)
    val exploded = df.select(
      (keep.map(col) :+ col("_g_publish_time") :+ posexplode(col("_g_rows"))): _*)
    exploded.select(
      (keep.map(col) :+
        col("col.user_id") :+ col("col.device_id") :+ col("col.event_type") :+
        col("col.time") :+ col("col.session_id") :+ col("col.insert_id") :+
        col("col.event_properties") :+ col("col.user_properties") :+
        col("col.is_identify") :+ col("_g_publish_time").as("publish_time") :+
        col("pos").as("seq")): _*)
  }

  /** The full O2→O10 chain. One narrow stage; whole-stage-codegen-friendly
    * except the variant parse and HMAC (both JVM-native, no Python boundary). */
  def pipeline(raw: DataFrame, hmacKey: String, inputCol: String = "value"): DataFrame = {
    val chained =
      splitIdentify(
        deriveInsertId(
          pseudonymize(
            repairSessionId(
              validate(
                parseStringifiedProps(
                  unwrapEnvelope(
                    decode(raw, inputCol))))), hmacKey), hmacKey))
    flatten(chained, inputCol)
  }

  /** O12-adjacent — effectively-once: drop redelivered duplicates on the
    * deterministic `insert_id` (identify records have none — they are
    * inherently idempotent upserts, keep them all). At scale this is a
    * hash-partitioned shuffle on a 64-hex key — uniform by construction, no
    * skew. In streaming mode use `dropDuplicatesWithinWatermark` instead
    * (unbounded state otherwise — SURVEY.md §7.4.5). */
  def dedupByInsertId(flat: DataFrame): DataFrame = {
    // One derived key, one hash-partitioned dropDuplicates, one branch of
    // the (large) upstream plan — a two-branch filter/union variant would
    // duplicate the whole pipeline subtree in the plan and shuffle twice.
    val key = when(col("is_identify"),
      concat_ws("\u0001", lit("I"), col("user_id"), col("device_id"),
        col("user_properties")))
      .otherwise(concat_ws("\u0001", lit("E"), col("insert_id")))
    flat.withColumn("_g_dedup_key", key)
      .dropDuplicates("_g_dedup_key")
      .drop("_g_dedup_key")
  }

  /** O11+O14 — per-batch observability metrics: input count, output count,
    * true min/max publish time. Publish-time min/max runs over ALL input
    * messages — the reference accumulates before the validity gate is
    * consulted (`synchronous-pull.js:59-63`). Reference bug B1's `else if`
    * (a message can move min or max, never both) is deliberately NOT
    * replicated — SURVEY.md §2.6. */
  def batchMetrics(raw: DataFrame, flat: DataFrame, inputCol: String = "value"): DataFrame = {
    val in = unwrapEnvelope(decode(raw, inputCol)).agg(
      count(lit(1)).as("input_count"),
      min(col("_g_publish_time")).as("min_publish_time"),
      max(col("_g_publish_time")).as("max_publish_time"))
    val out = flat.agg(count(lit(1)).as("output_count"))
    in.crossJoin(out)
      .select(col("input_count"), col("output_count"),
        col("min_publish_time"), col("max_publish_time"))
  }
}
