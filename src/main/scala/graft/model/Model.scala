package graft.model

import org.apache.spark.sql.types._

/** Flattened Amplitude-shaped event — the engine's typed core record, the
  * output of the ETL chain (SURVEY.md §1.3/§1.4; reference `utils.js:37-90`).
  *
  * `is_identify` marks the synthetic `$identify` record emitted by the
  * identify split (reference `utils.js:76-84`): such records carry only
  * `user_id`/`device_id`/`user_properties` — no `time`, no `session_id`, no
  * `insert_id` (reference `utils.js:78-83`, SURVEY.md §2.3.5).
  *
  * `event_properties`/`user_properties` are kept as JSON text: the payload is
  * schema-on-read/open-keyed in the reference, and JSON text round-trips
  * nested values faithfully where `map<string,string>` would not.
  */
case class AmplitudeEvent(
    user_id: Option[String],
    device_id: Option[String],
    event_type: String,
    time: Option[Long],
    session_id: Option[Double],
    insert_id: Option[String],
    event_properties: Option[String],
    user_properties: Option[String],
    is_identify: Boolean,
    publish_time: Option[String],
    seq: Int)

object AmplitudeEvent {
  /** The five Amplitude identify verbs (reference `utils.js:105`). */
  val IdentifyVerbs: Seq[String] = Seq("$set", "$setOnce", "$add", "$append", "$unset")
}

/** Schemas for the raw envelope layers (SURVEY.md §1.2). The payload itself
  * is deliberately NOT given a closed struct schema — the reference is
  * schema-on-read (`check-types` probes), and the engine mirrors that with
  * `VariantType` parsing (Spark 4 `parse_json`), which preserves JSON value
  * types (needed to replicate "repair session_id only when it is a string",
  * reference `utils.js:58-68`). */
object Schemas {
  /** Raw source rows as pulled off the wire: one base64(JSON envelope)
    * string per message (reference `synchronous-pull.js:57`). */
  val rawSchema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false)))
}
