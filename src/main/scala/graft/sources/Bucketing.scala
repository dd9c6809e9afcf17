package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Drop a managed table AND its warehouse directory. `saveAsTable`
    * can only overwrite what the catalog knows about: after a dead JVM
    * the in-memory catalog is empty while the warehouse dir survives,
    * and a fresh CREATE then fails on the stale location — so reruns
    * must clear both.
    */
  private def resetTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    val wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
      .stripPrefix("file:")
    // the catalog lowercases managed-table identifiers, so the
    // warehouse directory is the LOWERCASED name — deleting by the
    // case-preserving name would miss the stale dir when the data-dir
    // suffix contains uppercase and the post-crash rerun would still
    // fail on the existing location
    val dir = new java.io.File(s"$wh/${table.toLowerCase(java.util.Locale.ROOT)}")
    if (dir.exists()) rm(dir)
  }

  /** Memoized once-per-(session, dir, buckets) write of the
    * orders/lineitem pair as co-bucketed managed tables — the
    * write-once-shuffle-never layout. The `repartition(numBuckets,
    * key)` before each write uses the SAME murmur3 hash partitioning
    * as the bucket spec, so every task holds exactly one bucket's rows
    * and each bucket lands as ONE file — the precondition for Spark
    * trusting per-bucket sortedness at planning (no re-Sort under
    * `legacy.bucketedTableScan.outputOrdering`).
    */
  private val bucketedMemo = graft.Memo[(String, Int), (String, String)]()

  private def ensureBucketedFacts(
      spark: SparkSession, dir: String, numBuckets: Int): (String, String) =
    bucketedMemo.getOrElseUpdate(spark, (dir, numBuckets)) {
      val suffix = dir.replaceAll("[^A-Za-z0-9]", "_") + s"_b$numBuckets"
      val (ot, lt) = (s"orders$suffix", s"lineitem$suffix")
      resetTable(spark, ot); resetTable(spark, lt)
      writeBucketed(
        graft.Tables.orders(spark, dir).repartition(numBuckets, col("o_orderkey")),
        ot, "o_orderkey", numBuckets)
      writeBucketed(
        graft.Tables.lineitem(spark, dir).repartition(numBuckets, col("l_orderkey")),
        lt, "l_orderkey", numBuckets)
      (ot, lt)
    }

  /** Force the one-time bucketed write (the "write once" half of
    * write-once-shuffle-never) into the bench's `build` line item, so
    * q_bucketed_join times the zero-Exchange JOIN the layout exists
    * for, not the layout construction.
    */
  def prewarm(spark: SparkSession, dir: String, numBuckets: Int = 8): Seq[(String, Double)] = {
    val t0 = System.nanoTime()
    ensureBucketedFacts(spark, dir, numBuckets)
    Seq("bucketed_facts" -> (System.nanoTime() - t0) / 1e9)
  }

  /** The co-bucketed orders⋈lineitem join subtree — exposed so the
    * spec can assert the scale claim on exactly this plan: ZERO
    * Exchange (the bucketed scans ARE the required hash partitioning).
    * The `merge` hint pins sort-merge — the shape the fact-fact join
    * takes at 100 TB, where neither side broadcasts; without it the
    * small-sf driver run would elect a broadcast join and the layout
    * would prove nothing.
    */
  def bucketedFactJoin(spark: SparkSession, dir: String, numBuckets: Int = 8): DataFrame = {
    val (ot, lt) = ensureBucketedFacts(spark, dir, numBuckets)
    readBucketed(spark, ot).hint("merge")
      .join(readBucketed(spark, lt), col("o_orderkey") === col("l_orderkey"))
  }

  /** q_bucketed_join: per-priority revenue rollup THROUGH the bucketed
    * layout — hash-equal to the plain-join oracle over the raw parquet,
    * proving the storage layout changes the plan (no join Exchange),
    * never the answer. The only Exchange in the whole query is the
    * final ≤|priorities|-row aggregate's.
    */
  def bucketedJoinRollup(spark: SparkSession, dir: String, numBuckets: Int = 8): DataFrame =
    bucketedFactJoin(spark, dir, numBuckets)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        graft.Det.fromCents(sum(graft.Det.cents(col("l_extendedprice")))).as("revenue"))

  /** DuckDB twin of [[bucketedJoinRollup]]: the PLAIN join over the
    * raw parquet — the whole point is that the bucketed path must
    * hash-match it.
    */
  def sqlBucketedJoinRollup: String =
    """SELECT o.o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
      |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1""".stripMargin
}
