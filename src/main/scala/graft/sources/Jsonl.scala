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
  * Malformed lines: Spark's PERMISSIVE mode only materializes the
  * offending line when `_corrupt_record` is DECLARED in the read
  * schema — without it, a corrupt line silently becomes an all-null
  * row. [[readDocuments]] with `quarantine = true` declares it and
  * keeps the column so callers can split good rows from quarantined
  * ones; the default strict read drops it after parsing.
  */
object Jsonl {

  /** The documents-table schema, declared (not inferred). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val corruptCol = "_corrupt_record"

  /** Read a documents JSONL drop with the declared schema. With
    * `quarantine`, malformed lines come back as rows whose
    * `_corrupt_record` holds the raw line (all data fields null) —
    * filter on its nullity to split the stream.
    */
  def readDocuments(
      spark: SparkSession, path: String, quarantine: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (quarantine)
      spark.read
        .schema(documentsSchema.add(StructField(corruptCol, StringType)))
        .json(path)
        .select((documentsSchema.fieldNames :+ corruptCol).map(col).toIndexedSeq: _*)
    else
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
      // Spread: parallel encode for a single-file source (round 16)
      writeDocuments(graft.Spread(graft.Tables.documents(spark, dir)), out)
    })
}
