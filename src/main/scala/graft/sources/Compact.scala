package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — rewrite a parquet directory into files of
  * ≈`targetBytes`. The small-file problem is THE operational failure
  * mode of streaming/partitioned ingest at scale: a table written by
  * 32-partition micro-batches every minute accumulates millions of
  * KB-sized files, and every subsequent reader pays
  * list + open + footer-parse per file while the metadata layer
  * (NameNode / object-store listing) absorbs the rest. Compaction is
  * the periodic maintenance job that restores scan efficiency.
  *
  * Plan shape: one read, `coalesce(n)` (NO shuffle — input splits are
  * merged onto fewer tasks; `repartition` would move every byte
  * through a full exchange for nothing, since output file boundaries
  * don't need hash placement), one write into a fresh directory, then
  * a swap. n = ceil(on-disk bytes / targetBytes), from the
  * FileSystem listing — not a row count, because compaction targets
  * BYTES per file. The rewrite lands in `<path>.compacting` and is
  * renamed into place only after success, so a crashed compaction
  * never loses the DATA (the original survives at `<path>.old` until
  * the new copy is installed). The swap itself is TWO renames, not
  * one atomic operation: there is a window in which nothing exists at
  * `path`, so a concurrent reader can fail with path-not-found, and a
  * crash between the renames leaves the table recoverable only by
  * manually renaming `.old` back. Do NOT run compaction concurrently
  * with readers of the same path; a production deployment should
  * instead write each compaction into a versioned directory and flip
  * a pointer/manifest (the Iceberg/Delta snapshot pattern) so readers
  * always resolve a complete snapshot.
  */
object Compact {

  /** Total bytes + file count of the parquet data files under path. */
  def layoutStats(spark: SparkSession, path: String): (Long, Int) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listFiles(p, true)
    var bytes = 0L
    var n = 0
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) { bytes += f.getLen; n += 1 }
    }
    (bytes, n)
  }

  /** Compact `path` in place; returns (files before, files after). */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0)
    val (bytes, before) = layoutStats(spark, path)
    val n = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".compacting")
    fs.delete(tmp, true)
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: old table out, compacted one in; the .old directory is
    // removed last so a failure mid-swap leaves a recoverable copy
    val old = new Path(path + ".old")
    fs.delete(old, true)
    if (!fs.rename(p, old)) sys.error(s"compact: could not stage $path aside")
    if (!fs.rename(tmp, p)) {
      // roll back: put the original table back before failing
      fs.rename(old, p)
      sys.error(s"compact: could not install compacted data at $path")
    }
    fs.delete(old, true)
    val (_, after) = layoutStats(spark, path)
    (before, after)
  }

  /** Write `df` aiming at ≈`targetBytes` files by first writing, then
    * compacting — the helper for jobs that cannot size partitions up
    * front (dynamic filters, skewed input).
    */
  def writeCompacted(df: DataFrame, path: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    df.write.mode("overwrite").parquet(path)
    compact(df.sparkSession, path, targetBytes)
  }
}
