package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.llm.Search

/** Always-on inverted-index ingest: each micro-batch of NEW documents
  * folds into a persisted (unrailed index, stats sidecar) pair via
  * [[Search.indexMerge]]/[[Search.statsMerge]] inside `foreachBatch` —
  * the streaming form of the batch `q_index_incr` maintenance path, so
  * the search stack has an always-on ingest story like dedup
  * ([[StreamingCuration]]), SCD2 ([[StreamingScd2]]) and snapshots
  * ([[StreamingSnapshot]]) already do.
  *
  * State layout follows the [[StreamingSnapshot]] pointer discipline:
  * each batch writes NEW `idx/v=<batchId>` + `stats/v=<batchId>`
  * directories, then advances a single `_LATEST` pointer — readers never
  * observe a half-written index, and crash-replays of an applied batch
  * are detected by the pointer and SKIPPED (unlike a snapshot upsert,
  * re-merging postings would double df/cf, so the pointer check is the
  * exactly-once mechanism here, exactly as `foreachBatch`'s batchId
  * contract intends).
  *
  * The state is UNRAILED on disk (df rails are a read decision —
  * [[Search.applyRails]] — because maintenance can move a gram across
  * either rail); [[readRailedIndex]] is the consumer form. At 100 TB the
  * per-batch cost is the [[Search.indexMerge]] shape: the batch's gram
  * list broadcasts, untouched grams pass one anti join unshuffled, and
  * only touched ∪ batch grams re-aggregate. */
object StreamingIndex {

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    StatePointer.read(spark, dir)

  /** The current unrailed index (empty-schema error until a batch lands). */
  def readIndex(spark: SparkSession, dir: String): DataFrame =
    latestVersion(spark, dir) match {
      case Some(v) => spark.read.parquet(s"$dir/idx/v=$v")
      case None => throw new IllegalStateException(s"no index at $dir yet")
    }

  /** The current stats sidecar (n_docs, sum_dl). */
  def readStats(spark: SparkSession, dir: String): DataFrame =
    latestVersion(spark, dir) match {
      case Some(v) => spark.read.parquet(s"$dir/stats/v=$v")
      case None => throw new IllegalStateException(s"no stats at $dir yet")
    }

  /** Consumer view: rails applied over the LIVE doc count, the
    * [[Search.applyRails]] read-time contract (minDf, maxDfFrac·n). */
  def readRailedIndex(spark: SparkSession, dir: String, minDf: Long = 2L,
      maxDfFrac: Double = 0.06): DataFrame = {
    val n = readStats(spark, dir).collect().head.getAs[Long]("n_docs")
    Search.applyRails(readIndex(spark, dir), minDf,
      math.floor(maxDfFrac * n).toLong)
  }

  /** Fold one batch into the persisted state. Public so the batch-parity
    * catalog rows drive the IDENTICAL code `foreachBatch` runs.
    *
    * With `deleteCol` set, the batch is a CHANGE stream in the
    * [[StreamingSnapshot]] full-row-tombstone convention: rows with the
    * flag false are new docs (merged in), rows with it true are erasure
    * tombstones CARRYING THE DOC TEXT (the [[Search.indexDelete]]
    * ordering — erasure runs while the doomed rows are still readable,
    * so their postings re-derive from the tombstone row itself and
    * subtract exactly). Preconditions: adds are new docs
    * ([[Search.indexMerge]] disjointness), tombstones reference
    * previously-ingested docs, and a doc is not added and erased in the
    * same batch. */
  def applyBatch(batch: DataFrame, dir: String, batchId: Long,
      deleteCol: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    latestVersion(spark, dir) match {
      case Some(v) if v >= batchId => () // replay of an applied batch: skip
      case prev =>
        val adds = deleteCol.fold(batch)(dc =>
          batch.filter(!org.apache.spark.sql.functions.col(dc)).drop(dc))
        val dels = deleteCol.map(dc =>
          batch.filter(org.apache.spark.sql.functions.col(dc)).drop(dc))
        val batchIdx = Search.invertedIndexRaw(adds)
        val batchStats = Search.corpusStats(adds)
        val (merged, stats0) = prev match {
          case Some(v) => (
            Search.indexMerge(spark.read.parquet(s"$dir/idx/v=$v"), batchIdx),
            Search.statsMerge(spark.read.parquet(s"$dir/stats/v=$v"), batchStats))
          case None => (batchIdx, batchStats)
        }
        val (idx, stats) = dels match {
          case Some(d) =>
            val delIdx = Search.invertedIndexRaw(d)
              .localCheckpoint(eager = false) // two broadcast consumers
            (Search.indexDelete(merged, delIdx),
              Search.statsDelete(stats0, Search.corpusStats(d)))
          case None => (merged, stats0)
        }
        idx.write.mode("overwrite").parquet(s"$dir/idx/v=$batchId")
        stats.write.mode("overwrite").parquet(s"$dir/stats/v=$batchId")
        StatePointer.advance(spark, dir, batchId)
    }
  }

  /** Wire a doc (or change) stream to the maintained index. Caller
    * starts/stops the returned writer. */
  def writer(docs: DataFrame, dir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      deleteCol: Option[String] = None): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        applyBatch(df, dir, batchId, deleteCol)
      }
}
