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

  // ------------------------------------------------------------------
  // q119: the compaction maintenance job driven through the oracle
  // gate (the q_bucketed_join pattern: the LAYOUT changes the file
  // count and the scan plan, never the answer). The small-file
  // pathology is CONSTRUCTED (the testdata's own tables are
  // well-laid-out, like the skew-profile's planted hot key): the
  // events table is exported as a 64-file micro-batch-shaped write,
  // compacted in place down to ≈targetBytes files — the require
  // proves the job actually collapsed the layout — and the gate query
  // is a full-table rollup over the COMPACTED files that must
  // hash-match the oracle computed over the ORIGINAL parquet
  // (count / distinct-user / exact-cents invariants: any row lost,
  // duplicated or mangled by the rewrite breaks the hash).
  // ------------------------------------------------------------------

  /** Per-event-type rollup over the compacted copy of `events` — the
    * export + compact pair runs once per JVM (Scratch; itemized as
    * `scratch_compacted_events` in the bench's build line).
    */
  def eventsViaCompacted(spark: SparkSession, dir: String): DataFrame = {
    val path = Scratch.materialize("compacted_events", dir) { out =>
      graft.Tables.events(spark, dir)
        .repartition(64)
        .write.mode("overwrite").parquet(out)
      val (before, after) = compact(spark, out, targetBytes = 4L * 1024 * 1024)
      require(after < before,
        s"compaction must collapse the 64-file layout, got $before -> $after")
    }
    import org.apache.spark.sql.functions._
    spark.read.parquet(path)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(graft.Det.cents(col("value"))).as("total_cents"))
  }

  /** DuckDB twin over the ORIGINAL events parquet. */
  def sqlCompactedRollup: String =
    s"""SELECT event_type,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
       |FROM events GROUP BY 1""".stripMargin
}
