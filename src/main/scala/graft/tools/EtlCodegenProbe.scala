package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc probe (not part of the driver contract): the r9-advice spike
  * measuring whether the O2→O6 head of the ETL chain is faster as pure
  * Catalyst expressions (`parse_json` variant probes + `when` chains —
  * whole-stage-codegen'd, column-prunable) than as the shipped
  * Jackson-in-`mapPartitions` typed chain ([[graft.etl.EventParser]]).
  *
  * The Catalyst arm implements decode (unbase64), envelope unwrap
  * (Fields / op-data / bare, with the JS-truthy Fields gate) and the O6
  * validation gate (`event_type` non-empty STRING, `time` a NUMBER > 0,
  * string `user_id` or `device_id`) over variant type probes —
  * `try_variant_get(v, path, 'string'|'double')` is the only Catalyst
  * form that preserves the runtime JSON types the reference's semantics
  * branch on. Both arms run the same consume (count of valid + a field
  * fold), several passes, MIN reported.
  *
  * Decision record (2026-08-15, local[8], 3-pass MIN, parity-checked
  * valid counts — 79,348 / 793,409 on both arms): sf0.01 envelopes ×10
  * (100k rows) — typed 0.24 s vs variant 0.36 s (1.5×); sf0.1 ×10 (1M
  * rows) — typed 1.02 s vs variant 2.17 s (2.1× slower), and the
  * variant arm covers ONLY O2→O6 while the typed number includes the
  * full O2→O9 + identify trigger. WholeStageCodegen does span this
  * subset-sized variant plan (no 64 KB fallback), but type-faithful
  * semantics force TWO variant traversals per field (schema probe +
  * coercing get — a bare variant_get coerces numbers to strings and
  * broke O6 parity by 610 rows until guarded), so `parse_json` +
  * per-field probing loses to the single Jackson traversal that
  * extracts every field at once, and the gap widens with corpus size.
  * Conclusion: KEEP the typed chain (SURVEY.md §1.4 position, now held
  * by measurement at two scales; the earlier full-chain expression
  * attempt additionally blew the codegen method limit once O7–O9
  * joined the tree). */
object EtlCodegenProbe {

  /** Catalyst arm: O2→O6 over variant probes. Returns (valid, event_type,
    * time_ms, user_id_raw, device_id_raw) per message. */
  def catalystParsed(raw: DataFrame): DataFrame = {
    val json = col("value").cast("string")
    val v = parse_json(unbase64(json).cast("string"))
    // envelope unwrap: Fields-wrapped when truthy (objects are truthy;
    // the decoy op/data keys of BARE payloads must be ignored)
    val fields = expr("try_variant_get(v, '$.jsonPayload.Fields')")
    val opData = expr("try_variant_get(v, '$.jsonPayload.Fields.data', 'string')")
    val hasFields = fields.isNotNull &&
      expr("schema_of_variant(try_variant_get(v, '$.jsonPayload.Fields'))") =!= lit("VOID")
    val payload = when(hasFields,
      when(expr("try_variant_get(v, '$.jsonPayload.Fields.op', 'string')") === "event" &&
          opData.isNotNull,
        expr("parse_json(try_variant_get(v, '$.jsonPayload.Fields.data', 'string'))"))
        .otherwise(fields))
      .otherwise(expr("try_variant_get(v, '$.jsonPayload')"))
    // STRICT type probes: variant_get COERCES (a JSON number fetches as
    // its string rendering), but the reference's is.nonEmptyString /
    // number checks branch on the runtime JSON type — so every probe
    // pays a second schema_of_variant traversal. This is the honest
    // Catalyst price of schema-on-read type semantics.
    def s(path: String) =
      when(expr(s"schema_of_variant(try_variant_get(payload, '$$.$path'))")
          === "STRING",
        expr(s"try_variant_get(payload, '$$.$path', 'string')"))
    def num(path: String) =
      when(expr(s"schema_of_variant(try_variant_get(payload, '$$.$path'))")
          =!= "STRING",
        expr(s"try_variant_get(payload, '$$.$path', 'double')"))
    raw.withColumn("v", v).withColumn("payload", payload)
      .select(
        s("event_type").as("event_type"),
        num("time").as("time_num"),
        s("user_id").as("user_id_raw"),
        s("device_id").as("device_id_raw"))
      .withColumn("valid",
        col("event_type").isNotNull && length(col("event_type")) > 0 &&
          col("time_num").isNotNull && col("time_num") > 0 &&
          (col("user_id_raw").isNotNull && length(col("user_id_raw")) > 0 ||
            col("device_id_raw").isNotNull && length(col("device_id_raw")) > 0))
      .withColumn("time_ms", col("time_num").cast("long"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val events = graft.sources.Tables.load(spark, dir, "events")
    // ×10 the corpus so per-row cost dominates fixed overheads
    val raw = (0 until 10).map(i =>
        graft.etl.EnvelopeGen.fromEvents(
          events.withColumn("event_id", col("event_id") + lit(i * 1000000L))))
      .reduce(_ unionByName _)
      .repartition(8).localCheckpoint()
    println(s"[etlprobe] rows=${raw.count()}")

    def time(tag: String)(df: => DataFrame): Long = {
      var nValid = 0L
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        nValid = df.select(count(when(col("valid"), 1)).as("n_valid"),
          count(col("event_type")).as("n_et"),
          sum(col("time_ms")).as("t")).collect().head.getLong(0)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[etlprobe] $tag min=${times.min}%.2fs n_valid=$nValid passes=${times.map(t => f"$t%.2f").mkString(",")}")
      nValid
    }
    val vTyped = time("typed-jackson") {
      graft.etl.EventEtl.parsed(raw, graft.SparkEntry.HmacKey)
    }
    val vVariant = time("catalyst-variant") { catalystParsed(raw) }
    // the comparison is only meaningful if the two arms agree on O6
    println(s"[etlprobe] parity=${if (vTyped == vVariant) "OK" else s"MISMATCH $vTyped != $vVariant"}")
    // honesty note: the typed arm also ran O7-O9 (repair, hmac,
    // insert_id, identify trigger) — its number is an upper bound of the
    // comparable subset and it still must win for the decision to hold.
    spark.stop()
  }
}
