package graft

import org.apache.hadoop.fs.FileSystem
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.llm.Search

/** Scan-count contracts for the search layer, measured at the filesystem
  * (Hadoop `file:` scheme statistics): task-level inputMetrics also count
  * BlockManager reads of checkpointed partitions, so FS bytes are the only
  * ground truth for "how many times was the corpus READ". Measured shape
  * on sf0.001 documents: one 2-column scan = 2977 bytes, the old
  * two-pass bm25 = exactly 2×.
  *
  *  - bm25 reads the corpus ONCE: the (N, Σdl) stats ride the tokenize
  *    scan as observed metrics instead of a second stats aggregate.
  *  - phraseQuery over a persisted (here checkpointed) index touches no
  *    corpus file at all: the plan scans the index RDD, never parquet.
  */
class SearchScanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def fsBytes: Long = {
    val s = FileSystem.getGlobalStorageStatistics.get("file")
    if (s == null) 0L else s.getLong("bytesRead")
  }

  private def fsBytesOf(f: => Unit): Long = {
    val b0 = fsBytes; f; fsBytes - b0
  }

  test("bm25: one corpus scan — stats observed on the tokenize pass") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    // baseline: exactly one materializing read of the columns bm25 uses
    val baseline = fsBytesOf {
      docs.select(col("doc_id"), col("text")).write
        .format("noop").mode("overwrite").save()
    }
    val panel = Search.DefaultPanel.toDF("query_id", "term")
    val b = fsBytesOf {
      Search.bm25(docs, panel).write.format("noop").mode("overwrite").save()
    }
    assert(baseline > 0, "FS statistics captured no baseline bytes")
    // two corpus passes sit at exactly 2× the one-scan baseline (the old
    // shape, measured); footer noise stays well under 50%
    assert(b < baseline * 3 / 2,
      s"bm25 read $b file bytes vs one-scan baseline $baseline — second corpus pass?")
  }

  test("phraseQuery over a checkpointed index: no corpus (parquet) scan") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val index = Search.invertedIndexRaw(docs, minDf = 2L, maxDf = 30L)
      .localCheckpoint(eager = true) // the persisted-index stand-in
    val q = Search.phraseQuery(index, Search.PhrasePanel)
    val b = fsBytesOf { q.collect() }
    val executed = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val plan = executed.toString
    assert(!plan.contains("Scan parquet"),
      s"phrase lookup re-scanned the corpus:\n$plan")
    assert(b == 0, s"phrase lookup read $b file bytes — corpus re-scan?")
  }

  test("bm25FromIndex over checkpointed artifacts: no corpus (parquet) scan") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val index = Search.searchIndexRaw(docs)
      .localCheckpoint(eager = true) // the persisted-index stand-in
    val stats = Search.corpusStats(docs).localCheckpoint(eager = true)
    val panel = Search.DefaultPanel.toDF("query_id", "term")
    val q = Search.bm25FromIndex(index, stats, panel)
    val b = fsBytesOf { q.collect() }
    val executed = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val plan = executed.toString
    assert(!plan.contains("Scan parquet"),
      s"index-probe bm25 re-scanned the corpus:\n$plan")
    assert(b == 0, s"index-probe bm25 read $b file bytes — corpus re-scan?")
  }

  test("bucket-pruned phrase probe reads only the matched buckets' bytes") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("prunedfs").toString
    Search.withBucket(Search.invertedIndexRaw(docs), 16)
      .write.mode("overwrite").partitionBy("b").parquet(tmp)
    // a small panel so the matched-bucket set is a strict minority of the
    // layout — the probe's read bound is then genuinely discriminating
    val panel = Search.PhrasePanel.take(2)
    val grams = panel.flatMap(p => Search.phraseGrams(p._2)).distinct
    val buckets = Search.gramBuckets(grams, 16)
    def du(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).fold(0L)(_.map(du).sum)
      else f.length()
    val total = du(new java.io.File(tmp))
    val matched = buckets
      .map(b => du(new java.io.File(s"$tmp/b=$b"))).sum
    assert(matched < total / 2,
      s"panel not discriminating: matched=$matched total=$total")
    val idx = spark.read.parquet(tmp)
    val q = Search.phraseQuery(Search.pruneToGrams(idx, grams, 16), panel)
    val b = fsBytesOf { q.collect() }
    // static partition pruning: unmatched buckets' files are never
    // opened, so the probe's FS reads stay within the matched buckets'
    // bytes plus listing/footer slack — reads ∝ matched buckets, never
    // ∝ the index
    assert(b <= matched + total / 10,
      s"pruned probe read $b bytes vs matched-bucket bytes $matched (index total $total)")
  }

  test("moreLikeThis: one corpus scan — N observed on the tokenize pass") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val baseline = fsBytesOf {
      docs.select(col("doc_id"), col("text")).write
        .format("noop").mode("overwrite").save()
    }
    val b = fsBytesOf {
      Search.moreLikeThis(docs, col("doc_id") < 10L, k = 5)
        .write.format("noop").mode("overwrite").save()
    }
    assert(baseline > 0, "FS statistics captured no baseline bytes")
    // the pre-r12 shape paid a SEPARATE docs.count() action plus up to
    // three re-derivations of the scan→tf chain (one per consumer of the
    // weights frame); with N observed and tf checkpointed the whole
    // operator reads the corpus once
    assert(b < baseline * 3 / 2,
      s"moreLikeThis read $b file bytes vs one-scan baseline $baseline — second corpus pass?")
  }

  test("more-like-this: shared rare term outweighs shared common term") {
    import spark.implicits._
    val docs = Seq(
      (0L, "rare common x1 x2"),
      (1L, "rare y1 y2 y3"),      // shares the df=2 term with the anchor
      (2L, "common z1 z2 z3"),    // shares the df=5 term
      (3L, "common a1 a2 a3"),
      (4L, "common b1 b2 b3"),
      (5L, "common c1 c2 c3")).toDF("doc_id", "text")
    val got = graft.llm.Search.moreLikeThis(docs, col("doc_id") === 0L, k = 3)
      .select($"rank", $"neighbor_id", $"sim")
      .as[(Int, Long, Double)].collect()
    assert(got.head._2 === 1L, s"rare-term neighbor must rank first: ${got.toSeq}")
    assert(got.map(_._2).contains(2L))
    val sims = got.map(r => r._2 -> r._3).toMap
    assert(sims(1L) > sims(2L), "higher idf overlap => higher cosine")
  }
}
