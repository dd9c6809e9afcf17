package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins [[Spread]]'s decision contract: widen single-partition
  * sources before heavy per-row expression work with an INPUT-SIZE-
  * DERIVED target (round 16: ceil(bytes / spread.bytesPerTask),
  * floor 2, capped at shuffle.partitions — never a blanket
  * repartition to the session width, which the round-15 driver bench
  * measured as pure task-scheduling overhead at bench scale), stay a
  * no-op when the scan already splits, and NEVER silently no-op on
  * relations whose statistics are the defaultSizeInBytes sentinel
  * (RDD-backed frames — the regression where a stat-less
  * single-partition source read as "plenty of partitions" and kept
  * all expression work on one thread).
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

  test("small parquet scans widen to the size-derived target, not the session width") {
    val docs = Tables.documents(spark, sf)
    // sf0.001 documents is ~64 KB: ceil(bytes / 64k-per-task) = 1,
    // floored at 2 — the width the data justifies, NOT the cap of 4
    assert(Spread(docs).rdd.getNumPartitions === 2)
    // shrink maxPartitionBytes so the SAME scan estimates >= target
    // partitions: Spread must return the input frame itself (no-op)
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      assert(Spread(docs) eq docs, "well-split scan must pass through identically")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }

  test("the size-derived target scales with input bytes up to the shuffle-partition cap") {
    val docs = Tables.documents(spark, sf)
    try {
      // 1 byte per task => target = min(bytes, cap) = cap
      spark.conf.set("spark.graft.spread.bytesPerTask", "1")
      assert(Spread(docs).rdd.getNumPartitions === target,
        "a per-task byte goal far below the input size must saturate the cap")
      // a goal far above the input size => the 2-task floor
      spark.conf.set("spark.graft.spread.bytesPerTask", "1g")
      assert(Spread(docs).rdd.getNumPartitions === 2)
    } finally spark.conf.unset("spark.graft.spread.bytesPerTask")
  }

  test("local relations carry real stats and widen to the floor (never 'plenty of partitions')") {
    import spark.implicits._
    val local = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Spread(local).rdd.getNumPartitions === 2)
  }
}
