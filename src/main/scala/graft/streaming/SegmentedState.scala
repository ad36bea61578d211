package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The shared SEGMENTED-state discipline behind [[StreamingIndex]] and
  * [[StreamingSnapshot]] (and any future maintained stream state): each
  * micro-batch appends an immutable `seg/v=<batchId>` directory (bytes ∝
  * batch), reads are merge-on-read over the live segment list, compaction
  * folds the segments into a `base/v=<id>` directory, and [[vacuum]]
  * deletes everything the latest manifest no longer references. The
  * manifest (`manifest/v=<batchId>`) records the base version and the
  * live segments; `_LATEST` ([[StatePointer]]) is the commit point.
  *
  * Write protocol per batch: segment dirs → manifest file → pointer.
  * Readers resolve pointer → manifest → dirs, so a half-written batch is
  * invisible; a crash before the pointer advance replays the batch into
  * the same dirs (overwrite) and commits once. Manifest files are written
  * via temp + rename so an in-place rewrite (out-of-band compaction)
  * never exposes a truncated file. */
private[streaming] object SegmentedState {

  /** `base`: compacted-base version, if one exists. `segments`: live
    * segment versions in fold order. `dels`: the subset of segments that
    * carry a tombstone side (state-specific; empty where unused). */
  case class Manifest(base: Option[Long], segments: Seq[Long], dels: Set[Long])

  def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def readManifest(spark: SparkSession, dir: String, v: Long): Manifest = {
    val f = fs(spark, dir)
    val in = f.open(new Path(s"$dir/manifest/v=$v"))
    val text = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    val kv = text.linesIterator.map(_.trim).filter(_.nonEmpty)
      .map { l => val Array(k, rest) = l.split("=", 2); (k, rest) }.toMap
    def longs(s: String): Seq[Long] =
      s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toLong)
    Manifest(
      kv.get("base").filter(_ != "-").map(_.toLong),
      longs(kv.getOrElse("segments", "")),
      longs(kv.getOrElse("dels", "")).toSet)
  }

  def writeManifest(spark: SparkSession, dir: String, v: Long,
      m: Manifest): Unit = {
    val f = fs(spark, dir)
    val text = s"base=${m.base.getOrElse("-")}\n" +
      s"segments=${m.segments.mkString(",")}\n" +
      s"dels=${m.dels.toSeq.sorted.mkString(",")}\n"
    val tmp = new Path(s"$dir/manifest/.v=$v.tmp")
    val out = f.create(tmp, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
    val dst = new Path(s"$dir/manifest/v=$v")
    if (!f.rename(tmp, dst)) {
      f.delete(dst, false)
      if (!f.rename(tmp, dst))
        throw new java.io.IOException(s"manifest rename failed: $dst")
    }
  }

  /** Delete every state dir the LATEST manifest no longer references:
    * superseded bases, compacted-away segments, stale manifests, and —
    * when `withStats` — stale `stats/v=*` sidecars. Bounded disk is this
    * call; safety is the pointer: a replay of any batchId ≤ `_LATEST` is
    * skipped before any state dir is touched, so vacuuming cannot strand
    * a replay. */
  def vacuum(spark: SparkSession, dir: String, withStats: Boolean): Unit =
    StatePointer.read(spark, dir).foreach { v =>
      val m = readManifest(spark, dir, v)
      val f = fs(spark, dir)
      def children(sub: String): Seq[Path] = {
        val p = new Path(s"$dir/$sub")
        if (!f.exists(p)) Nil else f.listStatus(p).toSeq.map(_.getPath)
      }
      def ver(p: Path): Option[Long] =
        p.getName.split("=", 2) match {
          case Array("v", n) => scala.util.Try(n.toLong).toOption
          case _ => None
        }
      val live = m.segments.toSet
      for (p <- children("seg"); sv <- ver(p); if !live.contains(sv))
        f.delete(p, true)
      for (p <- children("base"); bv <- ver(p); if !m.base.contains(bv))
        f.delete(p, true)
      for (p <- children("manifest"); mv <- ver(p); if mv != v)
        f.delete(p, true)
      if (withStats)
        for (p <- children("stats"); sv <- ver(p); if sv != v)
          f.delete(p, true)
    }
}
