package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-CSV ingestion (reference pipeline/etl.py:13-30): a header CSV
  * read with NO schema inference, column standardization (raw export
  * headers -> engine names, the reference's
  * `'Customer ID' -> 'CustomerID'` / `'Price' -> 'UnitPrice'` step),
  * and explicit typecasts (`to_timestamp`, int/double/string casts).
  *
  * The standardized output is schema-identical to the parquet loaders
  * in [[graft.Tables]], so every downstream operator runs unchanged on
  * raw CSV drops. At 100 TB the reader consumes a directory of
  * splittable CSV parts; Spark parallelizes by file split, and the
  * select() prunes unreferenced raw columns at the scan.
  */
object Csv {

  /** Raw export header -> (standardized column, target type) for the
    * lineitem shape — the analog of the reference's rename+cast table.
    */
  val lineitemMapping: Seq[(String, String, String)] = Seq(
    ("Order Key", "l_orderkey", "bigint"),
    ("Line Number", "l_linenumber", "int"),
    ("Part Key", "l_partkey", "bigint"),
    ("Supplier Key", "l_suppkey", "bigint"),
    ("Quantity", "l_quantity", "double"),
    ("Extended Price", "l_extendedprice", "double"),
    ("Discount", "l_discount", "double"),
    ("Tax", "l_tax", "double"),
    ("Return Flag", "l_returnflag", "string"),
    ("Line Status", "l_linestatus", "string"),
    // timestamp_ntz: the parquet tables carry TIMESTAMP(ms) without a
    // zone; the session runs UTC, so parse-then-strip is value-exact
    ("Ship Date", "l_shipdate", "timestamp_ntz"))

  /** Fixed timestamp wire format (written and parsed with the same
    * pattern, so the round-trip is exact at millisecond precision).
    */
  private val tsFmt = "yyyy-MM-dd HH:mm:ss.SSS"

  /** Read a raw lineitem CSV: header row, every field a string (the
    * reference reads without inferSchema, etl.py:15), then rename and
    * typecast per [[lineitemMapping]].
    */
  def readLineitem(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val standardized = lineitemMapping.foldLeft(raw) { case (df, (rawName, name, typ)) =>
      val c = typ match {
        case "timestamp_ntz" => to_timestamp(col(rawName), tsFmt).cast("timestamp_ntz")
        case t               => col(rawName).cast(t)
      }
      df.withColumn(name, c)
    }
    standardized.select(lineitemMapping.map { case (_, name, _) => col(name) }: _*)
  }

  /** Export a standardized lineitem frame in the RAW export shape
    * (raw headers, string-formatted values) — the inverse of
    * [[readLineitem]], used for round-trip tests and the
    * q_csv_clean ingestion gate.
    */
  def writeRawLineitem(lineitem: DataFrame, outPath: String): Unit =
    lineitem
      .select(lineitemMapping.map { case (rawName, name, _) => col(name).as(rawName) }: _*)
      .write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", tsFmt)
      .option("timestampNTZFormat", tsFmt)
      .csv(outPath)

  /** lineitem via a full CSV round-trip (parquet -> raw-header CSV ->
    * standardized read). This is the driver-gated entry for the CSV
    * ingestion path; library users call [[readLineitem]] directly on
    * their raw drops. One materialization per data dir per JVM
    * ([[Scratch]]); doubles survive the round-trip exactly
    * (Double.toString is the shortest representation that parses back
    * to the same bits).
    */
  def lineitemViaCsv(spark: SparkSession, dir: String): DataFrame =
    readLineitem(spark, Scratch.materialize("csv_lineitem", dir) { out =>
      // Spread: the string-formatting encode of a single-file source
      // would otherwise run on one thread (round 16; q_csv_clean's
      // values are per-row, order-free under the sorted oracle compare)
      writeRawLineitem(graft.Spread(graft.Tables.lineitem(spark, dir)), out)
    })
}
