package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic synthesis of raw reference-shaped envelopes
  * (base64(JSON), SURVEY.md §1.2) from the harness `events` table, covering
  * every envelope/payload branch of the reference (`utils.js:38-51`) plus
  * every validity/repair edge (FIXTURES.md §B).
  *
  * The branch a row takes is a PURE FUNCTION of `event_id`, so the DuckDB
  * oracle can predict the pipeline's output with plain arithmetic — the
  * "round-trip oracle" pattern: Spark encodes → decodes → transforms, the
  * oracle computes the expected fixed point directly from the source table.
  *
  * Branch rules (id = event_id, uid = user_id, tms = epoch millis of ts):
  *   - user_id absent   when id%7==0 or id%19==0; emitted as a bare NUMBER
  *     when id%23==0 (fails `is.nonEmptyString` for validation but IS
  *     hashed — JS truthiness, `utils.js:70`); else String(uid)
  *   - device_id absent when id%5==0 or id%19==0; else "dev-"+uid
  *   - event_type absent when id%13==0                      → invalid (O6)
  *   - time = 0         when id%17==0                       → invalid (O6)
  *   - valid  ⇔  event_type present AND time>0 AND (string user_id or
  *     device_id) — numeric-uid rows (id%23==0) need the device_id
  *   - session_id by id%4: 0 → number (tms-5000); 1 → string "tms-5000"
  *     (parseInt repair path); 2 → string "oops" (→ -1); 3 → number 0
  *     (numeric passthrough; falsy-skipped in the insert_id preimage)
  *   - event_properties: the `props` JSON column — stringified when
  *     `strf` = (id%2==0 or id%9==4), inline object otherwise
  *   - user_properties: signup → {"$set":{"plan":"pro"},"flow_id":"f<id>"}
  *     (identify trigger); error → {"$unset":null,"ok":true} (JSON-null verb
  *     — must NOT trigger identify, `is.assigned` fails); others absent.
  *     Stringified when `strf`, object otherwise.
  *   - envelope: id%3==0 → op/data inside Fields (no prop re-parse — B3!);
  *     else id%2==0 → Fields-wrapped flat; else bare payload. Bare rows with
  *     id%9==2 (≡ id%18==11) additionally carry decoy "op"/"data" keys that
  *     must be IGNORED (the unwrap is gated on Fields, `utils.js:38-51`).
  *     Consequences the oracle must replicate: signup rows with id%6==0 are
  *     op/data AND stringified → user_properties stays a string → NO
  *     identify split (faithful B3); bare rows with id%9==4 (≡ id%18==13)
  *     are stringified and NOT re-parsed (O5 gated on Fields) → string
  *     user_properties, NO identify split either.
  */
object EnvelopeGen {

  /** JSON string literal with escaping (backslash first, then quote). */
  private def jsonStr(c: Column): Column =
    concat(lit("\""),
      regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
      lit("\""))

  /** events(event_id, ts, user_id, event_type, value, props) →
    * (event_id, value) where value = base64(JSON envelope). */
  def fromEvents(events: DataFrame): DataFrame = {
    val id = col("event_id")
    val idS = col("event_id").cast("string")
    val uid = col("user_id").cast("string")
    val tms = unix_millis(col("ts"))
    val sess = (tms - 5000).cast("string")

    val uidAbsent = id % 7 === 0 || id % 19 === 0
    val uidNumeric = id % 23 === 0
    val devAbsent = id % 5 === 0 || id % 19 === 0
    val etAbsent = id % 13 === 0
    val timeZero = id % 17 === 0
    // id%9==4 adds stringified props to BARE rows (id ≡ 13 mod 18 is odd and
    // ≢ 0 mod 3) — the O5-gating probe; on even ids it is a no-op subset.
    val stringified = id % 2 === 0 || id % 9 === 4
    // decoy op/data keys inside a BARE payload (id ≡ 11 mod 18): a faithful
    // parser must treat them as ordinary event fields, not an unwrap.
    val bareOpData = id % 2 === 1 && id % 9 === 2

    val upJson = when(col("event_type") === "signup",
        concat(lit("{\"$set\":{\"plan\":\"pro\"},\"flow_id\":\"f"), idS, lit("\"}")))
      .when(col("event_type") === "error", lit("{\"$unset\":null,\"ok\":true}"))

    val sessionPart = when(id % 4 === 0, concat(lit("\"session_id\":"), sess))
      .when(id % 4 === 1, concat(lit("\"session_id\":\""), sess, lit("\"")))
      .when(id % 4 === 2, lit("\"session_id\":\"oops\""))
      .otherwise(lit("\"session_id\":0"))

    val parts = array(
      when(!uidAbsent,
        when(uidNumeric, concat(lit("\"user_id\":"), uid))
          .otherwise(concat(lit("\"user_id\":\""), uid, lit("\"")))),
      when(bareOpData, lit("\"op\":\"decoy\",\"data\":\"not-json\"")),
      when(!devAbsent, concat(lit("\"device_id\":\"dev-"), uid, lit("\""))),
      when(!etAbsent, concat(lit("\"event_type\":\""), col("event_type"), lit("\""))),
      concat(lit("\"time\":"),
        when(timeZero, lit("0")).otherwise(tms.cast("string"))),
      sessionPart,
      concat(lit("\"event_properties\":"),
        when(stringified, jsonStr(col("props"))).otherwise(col("props"))),
      when(upJson.isNotNull, concat(lit("\"user_properties\":"),
        when(stringified, jsonStr(upJson)).otherwise(upJson))))

    val event = concat(lit("{"),
      array_join(filter(parts, p => p.isNotNull), ","), lit("}"))

    val payload = when(id % 3 === 0,
        concat(lit("{\"Fields\":{\"op\":\"event\",\"data\":"), jsonStr(event), lit("}}")))
      .when(id % 2 === 0, concat(lit("{\"Fields\":"), event, lit("}")))
      .otherwise(event)

    val publishTime = date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    val envelope = concat(
      lit("{\"jsonPayload\":"), payload,
      lit(",\"attributes\":{\"logging.googleapis.com/timestamp\":\""),
      publishTime, lit("\"}}"))

    events.select(id, base64(envelope.cast("binary")).as("value"))
  }
}
