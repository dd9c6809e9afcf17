package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned layout — the storage-side half of the
  * 100 TB SCAN strategy, as [[Bucketing]] is of the join strategy.
  *
  * A date-partitioned fact table turns every time-ranged query from a
  * full-table scan into a directory listing: the partition predicate
  * prunes at PLANNING time (`PartitionFilters` in the scan node), so
  * a "last 7 days" query over a 3-year, 100 TB event store opens only
  * ~0.6% of its files. Rules that hold at scale:
  *
  *   - partition on LOW-cardinality slice keys queries actually
  *     filter by (event date, region) — a high-cardinality key
  *     (user_id) makes millions of tiny directories and kills the
  *     listing;
  *   - one partition should hold ≥ a few files of ≥ ~100 MB;
  *     partition-count growth is bounded (dates grow by 1/day);
  *   - the partition column is REDUNDANTLY derived from the row (ts →
  *     event_date) at write time; readers filter on the derived
  *     column to get pruning, and row-level predicates still push
  *     down within the opened files.
  */
object Partitioned {

  /** Write events Hive-partitioned by event date (derived from ts).
    * The partition value is formatted as a yyyy-MM-dd string — stable
    * lexicographic directory names, range-filterable as strings.
    */
  def writeEventsByDay(events: DataFrame, outPath: String): Unit =
    events
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("event_date").parquet(outPath)

  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** events via the partitioned layout ([[Scratch]] discipline). */
  def eventsViaPartitioned(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, Scratch.materialize("events_by_day", dir) { out =>
      writeEventsByDay(graft.Tables.events(spark, dir), out)
    })

  /** Daily rollup over a pruned date range: the range predicate on the
    * partition column resolves against directory names at planning
    * time — files outside [from, to] are never opened (asserted in
    * PartitionedSpec via the scan's PartitionFilters).
    */
  def dailyPruned(
      spark: SparkSession,
      dir: String,
      from: String = "2024-01-08",
      to: String = "2024-01-14"): DataFrame =
    eventsViaPartitioned(spark, dir)
      .filter(col("event_date") >= from && col("event_date") <= to)
      .groupBy(col("event_date").cast("string").as("event_date"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"))

  /** Oracle: the same rollup over the unpartitioned events table. */
  def sqlDailyPruned(from: String = "2024-01-08", to: String = "2024-01-14"): String =
    s"""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
       |FROM events
       |WHERE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') >= ${graft.Det.sqlStr(from)}
       |  AND strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') <= ${graft.Det.sqlStr(to)}
       |GROUP BY 1""".stripMargin
}
