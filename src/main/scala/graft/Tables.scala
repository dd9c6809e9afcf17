package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Column-pruned parquet loaders for the driver testdata layout:
  * `<dir>/<table>.parquet`. Keeping the read behind one helper makes
  * every query's scan benefit from Catalyst pushdown (filters and
  * projections land in the parquet reader — verify via
  * `.explain("formatted")` → `PushedFilters`/`ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    * default; read nanos as long and convert with integer division
    * (a double roundtrip would lose precision above 2^53 ns).
    * Truncation ns→µs composes with any later µs→ms floor, so
    * epoch-millis outputs stay bit-identical to engines that read the
    * nanos natively.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session builders (Verify/Bench/tests) set this at construction;
    // the set here is a defensive no-op for externally-built sessions
    // that call `SparkEntry.queries` directly. It is scoped to the
    // nanos-typed events read — other tables never carry nanos.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
