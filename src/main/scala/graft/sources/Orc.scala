package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC ingestion — the third wire format next to [[Csv]] and
  * [[Jsonl]]. Unlike those, ORC is SELF-DESCRIBING (schema and types
  * travel in the file footer), so no declared schema or typecast
  * standardization is needed: the read is a columnar scan with the
  * same predicate/projection pushdown story as parquet, and the
  * ingestion gate only has to prove value fidelity through the
  * round-trip (timestamps included — Spark writes TIMESTAMP_NTZ
  * natively to ORC).
  */
object Orc {

  def writeLineitem(lineitem: DataFrame, outPath: String): Unit =
    lineitem.write.mode("overwrite").orc(outPath)

  def readLineitem(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** lineitem via a full ORC round-trip (parquet → ORC → read);
    * driver-gated entry for the ORC path ([[Scratch]] discipline).
    */
  def lineitemViaOrc(spark: SparkSession, dir: String): DataFrame =
    readLineitem(spark, Scratch.materialize("orc_lineitem", dir) { out =>
      // Spread: a single-file source would otherwise encode the whole
      // export on one thread (round 16; values per row unchanged, the
      // consumers are row-order-independent)
      writeLineitem(graft.Spread(graft.Tables.lineitem(spark, dir)), out)
    })
}
