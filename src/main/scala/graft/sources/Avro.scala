package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Avro ingestion — the row-oriented wire format next to the columnar
  * [[Orc]] and the text [[Csv]]/[[Jsonl]]. Avro is self-describing
  * (schema travels in the file header) and is what event buses and
  * CDC streams actually deliver, so the ingestion gate matters even
  * though a columnar scan beats it for analytics: land Avro, convert
  * to parquet once, query columnar after.
  *
  * No declared schema or typecast standardization is needed; the gate
  * proves VALUE fidelity through the round-trip. Timestamps:
  * Spark writes TIMESTAMP_NTZ as the Avro `local-timestamp-micros`
  * logical type, so wall-clock values survive with no zone shear —
  * proven by hash-matching the parquet-path clean output.
  */
object Avro {

  /** The short name `avro` resolves through the DataSourceRegister
    * service registry, which not every deployment ships even when the
    * implementation classes are present (they live in spark-sql since
    * the module merge); the fully-qualified provider class is the
    * documented registry-independent spelling and works on both.
    */
  val Format = "org.apache.spark.sql.avro.AvroFileFormat"

  def writeLineitem(lineitem: DataFrame, outPath: String): Unit =
    lineitem.write.mode("overwrite").format(Format).save(outPath)

  def readLineitem(spark: SparkSession, path: String): DataFrame =
    spark.read.format(Format).load(path)

  /** lineitem via a full Avro round-trip (parquet → Avro → read);
    * driver-gated entry for the Avro path ([[Scratch]] discipline).
    */
  def lineitemViaAvro(spark: SparkSession, dir: String): DataFrame =
    readLineitem(spark, Scratch.materialize("avro_lineitem", dir) { out =>
      // Spread: parallel encode for a single-file source (round 16)
      writeLineitem(graft.Spread(graft.Tables.lineitem(spark, dir)), out)
    })
}
