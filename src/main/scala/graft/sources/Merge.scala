package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed MERGE (upsert) into a snapshot table — the table-maintenance
  * companion to [[Io.compactParquet]] and [[Io.overwritePartitions]]: a
  * lakehouse ingestion pipeline lands a change batch (inserts, full-row
  * updates, delete tombstones) and produces the next snapshot. Semantics
  * are the standard three-clause MERGE (update-all on match, insert-all on
  * no-match, delete on tombstone), expressed as Spark relational ops
  * instead of a table-format transaction log:
  *
  *   next = (snapshot ANTI-JOIN batch keys) ∪ (batch WHERE NOT deleted)
  *
  * which is exactly MERGE's row-level outcome when batch keys are unique
  * (enforced — classic MERGE errors on multiple matches too, because the
  * result would be nondeterministic).
  *
  * Scale shape (the steady-state ingestion case: batch ≪ snapshot):
  *   - the snapshot is consumed through ONE broadcast anti-join against
  *     the batch's key projection — the bulk never shuffles, mirroring the
  *     anti-join-bulk discipline of `Dedup.canonical`;
  *   - the batch union is batch-sized;
  *   - at 100 TB the physical rewrite pairs this with
  *     [[Io.overwritePartitions]]: derive the touched partitions from the
  *     batch's keys and rewrite only those (partition-pruned MERGE), or
  *     with a bucketed snapshot ([[Io.writeBucketed]]) where the anti-join
  *     is co-located even for a huge batch.
  */
object Merge {

  /** Apply `batch` to `snapshot`. `batch` must carry every snapshot column
    * plus a boolean `deleteCol` (true = tombstone: remove the key). Batch
    * keys must be unique; a duplicate key in the batch makes the merge
    * outcome order-dependent, so it fails the job inside the plan (the
    * same scan-side `assert_true` rail used by the fingerprint encoder)
    * rather than silently picking a winner. */
  def upsert(snapshot: DataFrame, batch: DataFrame, keyCols: Seq[String],
      deleteCol: String = "_deleted"): DataFrame = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val outCols = snapshot.columns.toSeq
    require(batch.columns.contains(deleteCol),
      s"batch must carry tombstone column $deleteCol")
    outCols.foreach(c => require(batch.columns.contains(c),
      s"batch missing snapshot column $c"))
    val keys = keyCols.map(col)
    // In-plan uniqueness rail (the winnow assert_true idiom): an ambiguous
    // key is one that matched more than one batch row with at least one
    // survivor (update+update or update+tombstone — the outcomes MERGE
    // refuses); duplicate pure tombstones pass, deleting twice is
    // idempotent. The rail is a keys-only aggregation (narrow shuffle:
    // keys + two counters, never payload rows) broadcast back onto the
    // surviving batch rows, where any hit fails the job loudly.
    val applied = railUniqueKeys(batch, keyCols, deleteCol)
      .filter(!col(deleteCol))
      .select(outCols.map(col): _*)
    // The anti-join build side is the RAW key projection (set semantics —
    // duplicates are harmless there), so the broadcast stays a pure scan.
    val kept = snapshot.join(
      broadcast(batch.select(keys: _*)), keyCols, "left_anti")
    kept.unionByName(applied)
  }

  /** The [[upsert]] key-uniqueness rail as a standalone wrapper: returns
    * `batch` unchanged except that consuming any row of an AMBIGUOUS key
    * (more than one batch row with at least one survivor — the outcomes
    * MERGE refuses; duplicate pure tombstones pass, deleting twice is
    * idempotent) fails the job loudly inside the plan. The rail is a
    * keys-only aggregation (narrow shuffle: keys + two counters, never
    * payload rows) broadcast back onto the batch — attach it to whatever
    * job materializes the batch (the upsert itself, or a segment write in
    * [[graft.streaming.StreamingSnapshot]]). */
  def railUniqueKeys(batch: DataFrame, keyCols: Seq[String],
      deleteCol: String = "_deleted"): DataFrame = {
    val keys = keyCols.map(col)
    val ambiguous = batch
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("_kn"),
        sum(when(col(deleteCol), 0L).otherwise(1L)).as("_ks"))
      .filter(col("_kn") > 1L && col("_ks") >= 1L)
      .select((keys :+ lit(true).as("_dup")): _*)
    val guardedKey = when(
      assert_true(col("_dup").isNull, lit("merge: duplicate batch key")).isNull,
      col(keyCols.head)).as(keyCols.head)
    batch.join(broadcast(ambiguous), keyCols, "left")
      .select(batch.columns.toSeq
        .map(c => if (c == keyCols.head) guardedKey else col(c)): _*)
  }

  /** Right-to-erasure delete propagation: remove EVERY row of `table`
    * whose key appears in `deleteKeys` — the GDPR/CCPA maintenance pass a
    * warehouse runs against the live snapshot AND all history tables
    * (SCD2, event archives); unlike [[upsert]]'s tombstones this is a
    * key-set purge with no batch payload. One broadcast anti-join: the
    * bulk never shuffles, the key set is request-sized. Pair with
    * [[Io.overwritePartitions]] to rewrite only the partitions the keys
    * touch. */
  def applyDeletes(table: DataFrame, deleteKeys: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "delete propagation needs at least one key column")
    val keys = deleteKeys.select(keyCols.map(col): _*).distinct()
    table.join(broadcast(keys), keyCols, "left_anti")
  }

  /** The compliance evidence for [[applyDeletes]]: one row —
    * (n_deleted_rows, n_deleted_keys, n_remaining_rows) — the audit
    * record an erasure request closes with. Semi/anti joins against the
    * same broadcast key set; counts are exact. */
  def deleteAudit(table: DataFrame, deleteKeys: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val keys = deleteKeys.select(keyCols.map(col): _*).distinct()
      .localCheckpoint(eager = false)
    val hit = table.join(broadcast(keys), keyCols, "left_semi")
      .agg(count(lit(1)).as("n_deleted_rows"),
        count_distinct(col(keyCols.head)).as("n_deleted_keys"))
    val kept = table.join(broadcast(keys), keyCols, "left_anti")
      .agg(count(lit(1)).as("n_remaining_rows"))
    hit.crossJoin(kept) // 1×1
  }
}
