package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Compact

class CompactSpec extends SparkSpec {

  test("compact merges a fragmented table without changing its contents") {
    val tmp = Files.createTempDirectory("graft-compact").toString + "/events"
    // fragment: 64 partitions of a small table => 64 tiny files
    Tables.events(spark, sf).repartition(64)
      .write.mode("overwrite").parquet(tmp)
    def checksum() = spark.read.parquet(tmp).agg(
      count(lit(1)), expr("bit_xor(xxhash64(event_id, user_id, event_type))")
    ).head()
    val beforeRows = checksum()
    val (before, after) = Compact.compact(spark, tmp, targetBytes = 128L * 1024 * 1024)
    assert(before >= 64)
    assert(after < before && after >= 1)
    // content identical (count + order-free xor hash), schema preserved
    val afterRows = checksum()
    assert(afterRows === beforeRows)
    // no leftover staging directories
    assert(!new java.io.File(tmp + ".compacting").exists())
    assert(!new java.io.File(tmp + ".old").exists())
  }

  test("gate query over the compacted layout equals the rollup over the original table") {
    val viaCompacted = Compact.eventsViaCompacted(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val original = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)), countDistinct(col("user_id")), sum(graft.Det.cents(col("value"))))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(viaCompacted === original, "compaction changed the answer")
    assert(viaCompacted.nonEmpty)
  }

  test("compact splits into multiple files when bytes exceed the target") {
    val tmp = Files.createTempDirectory("graft-compact2").toString + "/li"
    Tables.lineitem(spark, sf).repartition(16)
      .write.mode("overwrite").parquet(tmp)
    val (bytes, _) = Compact.layoutStats(spark, tmp)
    val target = math.max(1L, bytes / 4)
    val (_, after) = Compact.compact(spark, tmp, targetBytes = target)
    val expected = ((bytes + target - 1) / target).toInt
    // coalesce produces at most the requested partitions; sizes drift
    // after re-encoding, so pin the ballpark, not the exact count
    assert(after >= 2 && after <= expected + 1, s"after=$after expected≈$expected")
  }
}
