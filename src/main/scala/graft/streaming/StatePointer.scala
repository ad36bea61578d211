package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The `_LATEST` version-pointer discipline shared by every maintained
  * streaming state ([[StreamingSnapshot]], [[StreamingIndex]],
  * [[StreamingBands]]): a batch writes its output under version
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

  /** Commit `batchId` as the latest version (overwrites the pointer). */
  def advance(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val out = fs(spark, dir).create(new Path(dir, "_LATEST"), true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
  }
}
