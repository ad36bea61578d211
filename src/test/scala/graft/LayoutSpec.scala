package graft

import org.apache.hadoop.fs.FileSystem
import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Z-order layout contracts: the Morton mapping's bit placement, its
  * locality property, and the thing the layout exists for — a predicate
  * on the SECOND dimension skips most of a z-clustered table's bytes
  * while a single-column-sorted layout must read all of it (parquet
  * min/max row-group stats; FS `file:` scheme byte counters, the
  * SearchScanSpec ground truth). */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def fsBytes: Long = {
    val s = FileSystem.getGlobalStorageStatistics.get("file")
    if (s == null) 0L else s.getLong("bytesRead")
  }
  private def fsBytesOf(f: => Unit): Long = { val b0 = fsBytes; f; fsBytes - b0 }

  test("zValue2: exact bit placement and locality monotonicity") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (5L, 9L))
      .toDF("a", "b")
      .select($"a", $"b", Layout.zValue2($"a", $"b", bits = 8).as("z"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, z) => (a, b) -> z }.toMap
    def ref(a: Long, b: Long): Long =
      (0 until 8).map(i => (((a >> i) & 1L) << (2 * i + 1)) |
        (((b >> i) & 1L) << (2 * i))).reduce(_ | _)
    for (((a, b), z) <- got) assert(z === ref(a, b), s"($a, $b)")
    // quadrant locality: both dims' high bits dominate the key, so the
    // four quadrants of the (a, b) square occupy disjoint z ranges
    val q = (for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)).toDF("a", "b")
      .select(($"a" / 8).cast("int").as("qa"), ($"b" / 8).cast("int").as("qb"),
        Layout.zValue2($"a", $"b", bits = 4).as("z"))
      .groupBy($"qa", $"qb").agg(min($"z").as("lo"), max($"z").as("hi"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    for (x <- q; y <- q; if x != y)
      assert(x._3 > y._4 || y._3 > x._4,
        s"quadrants ${(x._1, x._2)} and ${(y._1, y._2)} overlap in z")
  }

  test("zValueN: k=3 round-robin bit placement; k=2 instance equals zValue2") {
    val rows = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (5L, 9L, 3L), (255L, 1L, 128L))
    val got = rows.toDF("a", "b", "c")
      .select($"a", $"b", $"c",
        Layout.zValueN(Seq($"a", $"b", $"c"), bits = 8).as("z"),
        Layout.zValueN(Seq($"a", $"b"), bits = 8).as("z2n"),
        Layout.zValue2($"a", $"b", bits = 8).as("z2"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // bit i of dim j lands at 3i + (2 - j): earlier columns take the more
    // significant slot within each round
    def ref(a: Long, b: Long, c: Long): Long =
      (0 until 8).map(i =>
        (((a >> i) & 1L) << (3 * i + 2)) |
        (((b >> i) & 1L) << (3 * i + 1)) |
        (((c >> i) & 1L) << (3 * i))).reduce(_ | _)
    for ((a, b, c, z, z2n, z2) <- got) {
      assert(z === ref(a, b, c), s"($a, $b, $c)")
      // the generalization is EXACTLY the 2-dim layout at k=2 — the
      // q_zorder oracle pin survives the refactor
      assert(z2n === z2, s"($a, $b)")
    }
    intercept[IllegalArgumentException](Layout.zValueN(Seq($"a"), 8))
    intercept[IllegalArgumentException](Layout.zValueN(Seq($"a", $"b", $"c"), 22))
  }

  test("k=3 z-clustered layout: second- and third-dimension predicates both skip bytes a one-dimension sort must read") {
    val n = 40000
    // 64 files: the z prefix pinned by file boundaries then carries ~2
    // bits of EACH dimension, so the ideal skip for a [100,160] predicate
    // (top-2 bits 0) is ~75% — far from the assertion bound, where 16
    // files left ~1 bit per dim and the sampled range cuts could land a
    // marginal 33% skip (the measured full-suite flake: RangePartitioner
    // seeds vary with rdd ids, so boundaries drift run-to-run). The pad
    // is md5 hex (incompressible) so data bytes dwarf the per-file
    // footers both layouts pay equally.
    val df = spark.range(n.toLong).select(
      (col("id") * 2654435761L % 1024).as("a"),
      (col("id") * 40503L % 1024).as("b"),
      (col("id") * 69069L % 1024).as("c"),
      concat(md5(col("id").cast("string")),
        md5((col("id") + 1).cast("string"))).as("pad"))
      .localCheckpoint(eager = true)
    val root = java.nio.file.Files.createTempDirectory("zorder3").toString
    df.repartitionByRange(64, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(s"$root/bya")
    Layout.zOrderWriteN(df, Seq("a", "b", "c"), s"$root/byz", nFiles = 64,
      bits = 10)
    def readBytes(path: String, dim: String): Long = {
      val r = spark.read.parquet(path)
        .filter(col(dim) >= 100 && col(dim) <= 160)
        .agg(count(lit(1)).as("n"))
      var n0 = 0L
      val bytes = fsBytesOf { n0 = r.collect().head.getLong(0) }
      assert(n0 > 0, "predicate matched nothing — test data broken")
      bytes
    }
    for (dim <- Seq("b", "c")) {
      val linear = readBytes(s"$root/bya", dim)
      val z = readBytes(s"$root/byz", dim)
      // at k=3 each dimension's per-file value range widens vs k=2 (fewer
      // interleaved bits per dim land in the file-boundary prefix), so the
      // bound is a skip of at least a third, not half
      assert(z * 3 < linear * 2,
        s"$dim-predicate: z-ordered read $z bytes, expected < 2/3 of the a-sorted $linear")
    }
  }

  test("z-clustered layout: a second-dimension predicate reads a fraction of the bytes a one-dimension sort must") {
    val n = 40000
    // two independent-ish bounded dims + padding so data dwarfs footers
    val df = spark.range(n.toLong).select(
      (col("id") * 2654435761L % 4096).as("a"),
      (col("id") * 40503L % 4096).as("b"),
      concat(md5(col("id").cast("string")),
        md5((col("id") + 1).cast("string"))).as("pad"))
      .localCheckpoint(eager = true)
    val root = java.nio.file.Files.createTempDirectory("zorder").toString
    // layout 1: sorted/ranged on `a` alone — perfect for a-predicates,
    // blind for b-predicates (b spreads uniformly through every file).
    // 64 files + incompressible pad: see the k=3 test's de-flake note.
    df.repartitionByRange(64, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(s"$root/bya")
    // layout 2: z-ordered on (a, b)
    Layout.zOrderWrite(df, "a", "b", s"$root/byz", nFiles = 64, bits = 12)
    def readBytes(path: String): Long = {
      val r = spark.read.parquet(path).filter(col("b") >= 100 && col("b") <= 150)
        .agg(count(lit(1)).as("n"))
      var n0 = 0L
      val bytes = fsBytesOf { n0 = r.collect().head.getLong(0) }
      assert(n0 > 0, "predicate matched nothing — test data broken")
      bytes
    }
    val linear = readBytes(s"$root/bya")
    val z = readBytes(s"$root/byz")
    // the a-sorted layout cannot skip anything for a b-predicate; the
    // z-clustered one reads only the files/row-groups whose b stats
    // overlap [100, 150] — a small fraction
    assert(z * 2 < linear,
      s"z-ordered read $z bytes, expected < half of the a-sorted $linear")
  }
}
