package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The `_LATEST` version-pointer discipline shared by every maintained
  * streaming state ([[StreamingSnapshot]], [[StreamingIndex]],
  * [[StreamingScd2]]): a batch writes its output under version
  * directories, then atomically advances one small pointer file — readers
  * never observe a half-written version, and a crash-replay of an
  * already-applied `foreachBatch` batchId is detected by the pointer and
  * skipped (the exactly-once mechanism for non-idempotent folds). */
private[streaming] object StatePointer {

  def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The committed version, None before the first batch lands. */
  def read(spark: SparkSession, dir: String): Option[Long] = {
    val p = new Path(dir, "_LATEST")
    val f = fs(spark, dir)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Commit `batchId` as the latest version. Written to a temp file and
    * RENAMED over `_LATEST`, so a concurrent [[read]] never observes a
    * truncated pointer (an in-place overwrite exposes a zero-length
    * window that crashes the reader's `toLong`). Where the filesystem
    * refuses a clobbering rename, the fallback delete+rename narrows the
    * race to a missing-file window, which readers already handle as a
    * clean `None` rather than a parse crash. */
  def advance(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val f = fs(spark, dir)
    val tmp = new Path(dir, s"_LATEST.tmp-$batchId")
    val out = f.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    val dst = new Path(dir, "_LATEST")
    if (!f.rename(tmp, dst)) {
      f.delete(dst, false)
      if (!f.rename(tmp, dst))
        throw new java.io.IOException(s"pointer rename failed: $tmp -> $dst")
    }
  }
}
