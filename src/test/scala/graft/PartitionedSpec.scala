package graft

import org.apache.spark.sql.functions._

import graft.sources.Partitioned

class PartitionedSpec extends SparkSpec {

  test("partitioned write creates one directory per event date") {
    val df = Partitioned.eventsViaPartitioned(spark, sf)
    val dirs = df.inputFiles
      .map(f => new java.io.File(new java.net.URI(f).getPath).getParentFile.getName)
      .filter(_.startsWith("event_date=")).distinct.sorted
    assert(dirs.length >= 28, s"expected ~30 daily partitions, got ${dirs.toSeq}")
    assert(dirs.head.startsWith("event_date=2024-01-"))
  }

  test("range filter prunes partitions at planning time") {
    val df = Partitioned.eventsViaPartitioned(spark, sf)
      .filter(col("event_date") >= "2024-01-08" && col("event_date") <= "2024-01-14")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    val meta = scan.toString
    assert(meta.contains("PartitionFilters"), meta)
    assert(meta.contains("event_date"), meta)
    // the scan's selected partitions really shrink: count distinct
    // dates that survive — 7 of ~30
    val dates = df.select(col("event_date").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(dates.length === 7, dates.toSeq)
    assert(dates.head === "2024-01-08" && dates.last === "2024-01-14")
  }

  test("pruned rollup matches the unpartitioned computation") {
    val viaPart = Partitioned.dailyPruned(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val direct = Tables.events(spark, sf)
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .filter(col("event_date") >= "2024-01-08" && col("event_date") <= "2024-01-14")
      .groupBy("event_date")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(viaPart === direct)
    assert(viaPart.size === 7)
  }
}
