package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL (newline-delimited JSON) ingestion — the wire format most
  * LLM training corpora actually arrive in (one JSON object per line,
  * UTF-8, text fields with embedded newlines/quotes escaped per JSON).
  *
  * Read discipline mirrors [[Csv]]: an EXPLICIT schema, never
  * inference — at 100 TB schema inference is an extra full pass over
  * the data, and a drifting inferred type (a numeric-looking id
  * column, say) silently corrupts downstream joins. JSONL is
  * line-splittable, so Spark parallelizes by file split exactly like
  * CSV; the schema-driven reader prunes unreferenced fields during
  * parsing.
  *
  * Malformed lines surface in `_corrupt_record` under the default
  * PERMISSIVE mode; [[readDocuments]] keeps the strict columns only,
  * so a production caller that wants quarantine semantics selects the
  * corrupt column before this projection.
  */
object Jsonl {

  /** The documents-table schema, declared (not inferred). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Read a documents JSONL drop with the declared schema. */
  def readDocuments(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.schema(documentsSchema).json(path)
      .select(documentsSchema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Export a documents frame as JSONL — the inverse of
    * [[readDocuments]], used for the round-trip ingestion gate.
    */
  def writeDocuments(documents: DataFrame, outPath: String): Unit =
    documents.write.mode("overwrite").json(outPath)

  /** documents via a full JSONL round-trip (parquet → JSONL →
    * schema-declared read). Driver-gated entry for the JSONL ingestion
    * path; library users call [[readDocuments]] on their drops
    * (materialization discipline: [[Scratch]]). The gate query hashes
    * md5(text), so the round-trip must preserve the text BYTES exactly
    * (JSON string escaping of newlines/quotes included).
    */
  def documentsViaJsonl(spark: SparkSession, dir: String): DataFrame =
    readDocuments(spark, Scratch.materialize("jsonl_documents", dir) { out =>
      writeDocuments(graft.Tables.documents(spark, dir), out)
    })
}
