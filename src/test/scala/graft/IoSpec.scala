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
