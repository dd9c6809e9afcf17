package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the storage-side half of the 100 TB join
  * strategy.
  *
  * A fact-fact join (orders ⋈ lineitem) shuffles BOTH sides on the
  * join key every time it runs. Writing the tables bucketed (and
  * sorted) by that key moves the shuffle to write time, once: a join
  * between two tables bucketed the same way on their join keys needs
  * NO exchange at read time — the scan itself is the required hash
  * partitioning, and the per-bucket sort feeds sort-merge join without
  * a sort. For a table joined in every pipeline run (the reference
  * joins orders⋈lineitem in etl.py:42-51 and again per feature pass),
  * this converts O(runs) shuffles of the biggest tables into O(1).
  *
  * Sizing at 100 TB: pick numBuckets so one bucket ≈ 100-500 MB of
  * parquet (e.g. 4096 buckets for a 1 TB table); too few buckets caps
  * join parallelism, too many makes small files. Bucket counts on the
  * two sides should be equal (or integer multiples, which Spark can
  * coalesce via spark.sql.bucketing.coalesceBucketsInJoin.enabled).
  *
  * Exchange elimination is unconditional; eliminating the SMJ Sort as
  * well additionally needs one file per bucket and
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (since
  * 3.0 Spark skips the per-bucket file-count check by default).
  * BucketingSpec asserts the zero-exchange, zero-sort plan.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. Bucketing
    * requires the table catalog (`saveAsTable`) — a plain
    * `.parquet(path)` write cannot record bucket metadata.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Read a bucketed table back (the bucket metadata rides with the
    * catalog entry, so this is just a catalog lookup).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
