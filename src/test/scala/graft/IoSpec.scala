package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Io

/** Source/sink round-trips and the partition-pruning contract. */
class IoSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.sources.Tables.load(spark, sf, "documents")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv round-trip preserves rows under an explicit schema") {
    val out = tmp("graft-csv")
    // CSV has no nested types; documents is flat — a faithful round-trip
    Io.writeCsv(docs, out)
    val back = Io.readCsv(spark, out, docs.schema)
    assert(back.schema === docs.schema)
    assert(back.count() === docs.count())
    assert(back.join(docs, Seq("doc_id"), "left_anti").count() === 0)
  }

  test("jsonl round-trip preserves rows under an explicit schema") {
    val out = tmp("graft-jsonl")
    Io.writeJsonl(docs, out)
    val back = Io.readJsonl(spark, out, docs.schema)
    assert(back.count() === docs.count())
    assert(back.join(docs, Seq("doc_id"), "left_anti").count() === 0)
  }

  test("exportShards: shard partitions on disk, budget respected, prunable") {
    val out = tmp("graft-shards")
    graft.llm.Packing.exportShards(docs, out, budget = 2048L)
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    // every shard's token total stays under budget + its last doc's tokens
    val tk = graft.llm.TextAnalysis.tokenCount($"text").cast("long")
    val perShard = back.groupBy($"shard")
      .agg(sum(tk).as("toks"), max(tk).as("max_doc"))
      .select($"toks", $"max_doc").as[(Long, Long)].collect()
    assert(perShard.nonEmpty)
    perShard.foreach { case (toks, maxDoc) => assert(toks <= 2048L + maxDoc) }
    // loader-side pruning on the shard column
    val one = spark.read.parquet(out).filter($"shard" === 0)
    val plan = one.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [isnotnull(shard"), plan)
  }

  test("partitioned write prunes partitions at scan time") {
    val out = tmp("graft-part")
    Io.writePartitioned(docs, out, "source")
    val one = spark.read.parquet(out).filter($"source" === "src1")
    val plan = one.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the source predicate must land in PartitionFilters (file pruning),
    // not PushedFilters (row-group pruning) — and certainly not a Filter op
    assert(plan.contains("PartitionFilters: [isnotnull(source"), plan)
    assert(one.count() === docs.filter($"source" === "src1").count())
  }
}
