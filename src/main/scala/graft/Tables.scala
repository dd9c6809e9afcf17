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
  /** events.parquet has shipped with two physical `ts` encodings
    * across testdata generations: TIMESTAMP(NANOS) (which Spark 4
    * rejects by default — read nanos as long and convert with integer
    * division; a double roundtrip would lose precision above 2^53 ns)
    * and plain TIMESTAMP(MICROS) (which Spark 4 reads natively as
    * TIMESTAMP_NTZ under parquet NTZ inference). Branch on the READ
    * schema so both land on the same logical column: a session-zone
    * TimestampType instant. The session runs UTC (GraftSession), so
    * the NTZ cast maps the generator's naive-UTC wall-clock to the
    * identical epoch the nanos path produced — every downstream
    * unix_millis/window/date_trunc is value-identical either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session builders (Verify/Bench/tests) set this at construction;
    // the set here is a defensive no-op for externally-built sessions
    // that call `SparkEntry.queries` directly. It is scoped to the
    // nanos-typed events read — other tables never carry nanos.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
