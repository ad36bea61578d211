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

  test("orc round-trip preserves rows; pushdown and pruning reach the scan") {
    val out = tmp("graft-orc")
    Io.writeOrc(docs, out)
    val back = Io.readOrc(spark, out)
    assert(back.count() === docs.count())
    assert(back.join(docs, Seq("doc_id"), "left_anti").count() === 0)
    // filter pushdown + column pruning work on ORC exactly as on parquet
    val q = back.filter(org.apache.spark.sql.functions.col("doc_id") < 10)
      .select("doc_id", "source")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(doc_id,10)"),
      s"ORC scan lost the pushed filter:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      s"ORC scan read more than the projected columns:\n$plan")
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

  test("zValue: bit interleave correct, curve order non-negative") {
    val got = Seq((3, 0), (0, 3), (1, 1), (0, 0))
      .toDF("a", "b")
      .select(Io.zValue($"a", $"b").as("z")).as[Long].collect().toSeq
    // a→even bits, b→odd bits: (3,0)=0b0101, (0,3)=0b1010, (1,1)=0b11
    assert(got === Seq(5L, 10L, 3L, 0L))
    val top = Seq((Int.MaxValue, Int.MaxValue)).toDF("a", "b")
      .select(Io.zValue($"a", $"b")).as[Long].head()
    assert(top > 0L) // 62 bits used — ordering never crosses the sign bit
  }

  test("z-ordered layout: per-file bounding boxes shrink on BOTH columns") {
    // 64×64 grid, shuffled: a doc_id-style sort would give perfect x
    // locality and none on y; z-order must bound both
    val n = 64
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).cast("int").as("x"),
      (col("id") / n).cast("int").as("y"))
    def fileBoxes(path: String): Seq[(Int, Int, Int, Int)] =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min($"x").as("x0"), max($"x").as("x1"),
          min($"y").as("y0"), max($"y").as("y1"))
        .select($"x0", $"x1", $"y0", $"y1")
        .as[(Int, Int, Int, Int)].collect().toSeq
    val zOut = tmp("graft-zorder")
    Io.writeZOrdered(grid, "x", "y", zOut, nFiles = 16)
    val xOut = tmp("graft-xsort")
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xOut)
    def spanSum(boxes: Seq[(Int, Int, Int, Int)], dim: String): Long =
      boxes.map(b => if (dim == "x") (b._2 - b._1).toLong else (b._4 - b._3).toLong).sum
    val (zB, xB) = (fileBoxes(zOut), fileBoxes(xOut))
    // the x-sorted layout leaves y unbounded (~full range per file);
    // z-order must cut the summed y-span at least in half while keeping
    // x-spans bounded (each z file covers a ≤quarter-range x window)
    assert(spanSum(zB, "y") * 2 <= spanSum(xB, "y"),
      s"z y-spans ${spanSum(zB, "y")} vs x-sort ${spanSum(xB, "y")}")
    assert(zB.forall(b => b._2 - b._1 <= n / 2), zB.toString)
  }

  test("compactParquet: many small files collapse to the size-derived count, rows intact") {
    val fragmented = tmp("graft-frag")
    docs.repartition(40).write.mode("overwrite").parquet(fragmented)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(fragmented) === 40)

    val compacted = tmp("graft-compact")
    // target far above total size -> everything folds into ONE file
    val n = Io.compactParquet(spark, fragmented, compacted, 1L << 30)
    assert(n === 1)
    assert(parquetFiles(compacted) === 1)
    // content parity, not just counts
    assert(spark.read.parquet(compacted).orderBy($"doc_id").collect().toSeq
      === docs.orderBy($"doc_id").collect().toSeq)

    // a small target derives multiple files: ceil(total/target) honored
    val total = new java.io.File(fragmented).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val multi = tmp("graft-compact-multi")
    val n2 = Io.compactParquet(spark, fragmented, multi, total / 3)
    assert(n2 >= 3 && parquetFiles(multi) === n2)
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

  test("dynamic partition overwrite replaces only the partitions written") {
    val out = tmp("graft-upsert")
    Io.writePartitioned(docs, out, "source")
    val before = spark.read.parquet(out)
    val untouched = before.filter($"source" =!= "src1")
      .select($"doc_id").as[Long].collect().toSet
    // day-2 re-ingest of src1 only: a strict subset (src1 ids are
    // =1 mod 20, so halve via mod 40), text revised
    val revised = docs.filter($"source" === "src1")
      .filter($"doc_id" % 40 === 1)
      .withColumn("text", concat($"text", lit(" v2")))
    Io.overwritePartitions(revised, out, "source")
    val after = spark.read.parquet(out)
    // src1 fully replaced by the smaller revision...
    val src1 = after.filter($"source" === "src1")
    assert(src1.count() === revised.count())
    assert(src1.filter(!$"text".endsWith(" v2")).count() === 0)
    // ...every other partition byte-identical (same doc set, no v2 rows)
    assert(after.filter($"source" =!= "src1")
      .select($"doc_id").as[Long].collect().toSet === untouched)
    assert(after.filter($"source" =!= "src1")
      .filter($"text".endsWith(" v2")).count() === 0)
  }

  test("binaryFile ingestion: glob prunes, content round-trips, size cap holds") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("binio").toString
    val payload = Array.tabulate[Byte](257)(i => (i % 251).toByte)
    Files.write(Paths.get(dir, "a.jpg"), payload)
    Files.write(Paths.get(dir, "b.jpg"), Array.fill[Byte](64)(7))
    Files.write(Paths.get(dir, "skip.txt"), Array.fill[Byte](8)(1))
    val got = graft.sources.Io.readBinaryFiles(spark, dir, glob = "*.jpg")
      .select($"path", $"length", $"content")
      .as[(String, Long, Array[Byte])].collect()
      .map(r => r._1.split('/').last -> ((r._2, r._3))).toMap
    assert(got.keySet === Set("a.jpg", "b.jpg"))
    assert(got("a.jpg")._1 === 257L && got("a.jpg")._2.toSeq === payload.toSeq)
    // cap: the big file filters out
    assert(graft.sources.Io.readBinaryFiles(spark, dir, glob = "*.jpg",
      maxFileBytes = 100L).count() === 1)
  }

  test("artifacts: bench mode builds once then probes files; values identical") {
    val dir = java.nio.file.Files.createTempDirectory("artifacts").toString
    var builds = 0
    def build() = { builds += 1
      Seq((1L, "x"), (2L, "y")).toDF("id", "v") }
    // no root configured: every call builds inline (the verify-gate mode)
    graft.sources.Artifacts.table(spark, "t1")(build()).count()
    graft.sources.Artifacts.table(spark, "t1")(build()).count()
    assert(builds === 2)
    sys.props("graft.artifact.dir") = dir
    try {
      val first = graft.sources.Artifacts.table(spark, "t1")(build())
      assert(builds === 3)
      // second call must read the files back WITHOUT invoking the builder
      val second = graft.sources.Artifacts.table(spark, "t1")(build())
      assert(builds === 3)
      assert(second.orderBy($"id").as[(Long, String)].collect().toSeq ===
        first.orderBy($"id").as[(Long, String)].collect().toSeq)
      assert(second.queryExecution.executedPlan.toString.contains("FileScan"),
        "probe must start at a file scan")
    } finally sys.props.remove("graft.artifact.dir")
  }

  test("text ingestion: per-line and whole-file document shapes") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("textio").toString
    Files.write(Paths.get(dir, "d1.txt"), "line one\nline two\n".getBytes)
    Files.write(Paths.get(dir, "d2.txt"), "solo doc\n".getBytes)
    assert(graft.sources.Io.readText(spark, dir).count() === 3)
    val whole = graft.sources.Io.readText(spark, dir, wholetext = true)
      .select(input_file_name(), $"value").as[(String, String)].collect()
      .map(r => r._1.split('/').last -> r._2).toMap
    assert(whole("d1.txt") === "line one\nline two\n")
    assert(whole("d2.txt") === "solo doc\n")
  }
}
