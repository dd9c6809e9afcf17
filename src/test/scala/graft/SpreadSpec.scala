package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins [[Spread]]'s decision contract: widen single-partition
  * sources before heavy per-row expression work, stay a no-op when
  * the scan already splits, and NEVER silently no-op on relations
  * whose statistics are the defaultSizeInBytes sentinel (RDD-backed
  * frames — the regression where a stat-less single-partition source
  * read as "plenty of partitions" and kept all expression work on
  * one thread).
  */
class SpreadSpec extends SparkSpec {

  private val target = 4 // GraftSession test fixture shuffle.partitions

  test("stat-less RDD-backed single-partition frames are widened to the session parallelism") {
    val rdd = spark.sparkContext.parallelize((1L to 100L).map(Row(_)), 1)
    val df = spark.createDataFrame(rdd, StructType(Seq(StructField("x", LongType))))
    assert(df.rdd.getNumPartitions === 1)
    val out = Spread(df)
    assert(out.rdd.getNumPartitions === target,
      "defaultSizeInBytes sentinel must fall through to a repartition, not a no-op")
  }

  test("small parquet scans widen; large-estimate scans pass through untouched") {
    val docs = Tables.documents(spark, sf)
    assert(Spread(docs).rdd.getNumPartitions === target)
    // shrink maxPartitionBytes so the SAME scan estimates >= target
    // partitions: Spread must return the input frame itself (no-op)
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      assert(Spread(docs) eq docs, "well-split scan must pass through identically")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }

  test("local relations carry real stats and still widen (they are never 'plenty of partitions')") {
    import spark.implicits._
    val local = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Spread(local).rdd.getNumPartitions === target)
  }
}
