package graft.sources

import scala.collection.concurrent.TrieMap

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

  // One raw-CSV materialization per data directory per JVM: the
  // ingestion gate needs a CSV twin of the parquet table to read back;
  // doubles survive the round-trip exactly (Double.toString is the
  // shortest representation that parses back to the same bits).
  private val exported = TrieMap.empty[String, String]

  // Scratch paths are per-JVM: the TrieMap only guards THIS process,
  // and two JVMs (a bench run next to a test run) sharing one fixed
  // /tmp path would race an overwrite against a read. The shutdown
  // hook reclaims the scratch dir so repeated runs don't accumulate
  // CSV exports in /tmp.
  private val jvmId = java.util.UUID.randomUUID().toString.take(8)
  private lazy val scratchRoot: String = {
    val root = System.getProperty("java.io.tmpdir") + s"/graft_csv/$jvmId"
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(root))
    }))
    root
  }

  /** lineitem via a full CSV round-trip (parquet -> raw-header CSV ->
    * standardized read). This is the driver-gated entry for the CSV
    * ingestion path; library users call [[readLineitem]] directly on
    * their raw drops.
    */
  def lineitemViaCsv(spark: SparkSession, dir: String): DataFrame = {
    val path = exported.getOrElseUpdate(dir, {
      val out = scratchRoot + "/" + dir.replaceAll("[^A-Za-z0-9._-]", "_") + "/lineitem"
      writeRawLineitem(graft.Tables.lineitem(spark, dir), out)
      out
    })
    readLineitem(spark, path)
  }
}
