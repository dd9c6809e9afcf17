package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic TEXT→VECTOR featurizer — the hash-kernel (signed
  * random projection) document embedding: v_j = Σ_tokens sign_j(t)
  * where sign_j is bit j of a portable token hash. This is the
  * embedding a pipeline computes when no model is available (the
  * SimHash construction BEFORE the sign compression — SimHash is
  * exactly `sign(v)` of this vector), and it bridges the text corpus
  * into the vector family: the derived vectors feed brute/ANN search
  * and semantic dedup unchanged (composability pinned in the spec).
  *
  * The PORTABILITY trick: Spark's xxhash64 has no DuckDB twin, so the
  * token hash is the first 8 hex chars of md5 (identical lowercase
  * hex in both engines) decoded to an integer by EIGHT UNROLLED
  * hex-digit terms (strpos into a constant alphabet — no lookarounds,
  * no engine-private functions), making every vector component an
  * exact integer both engines agree on ⇒ hash-exact oracle for a
  * FEATURIZER, which model-derived embeddings can never have.
  *
  * Scale shape: one tokenize scan + explode + ONE doc_id-keyed
  * aggregate with map-side partial sums (the q_token_stats family
  * shape); the md5+decode work is per TOKEN OCCURRENCE, scan-side,
  * codegen.
  */
object DocEmbed {

  val dims = 8
  private val hexAlphabet = "0123456789abcdef"

  /** First 8 md5 hex chars of the token column `t` as an integer:
    * Σ hexval(c_i)·16^(8-i), eight unrolled terms (locate into the
    * constant alphabet — Spark's `locate(substr, str)` wants a
    * literal needle, so the digit is the haystack probe).
    */
  private def h32: Column =
    (1 to 8).map { i =>
      (expr(s"locate(substring(md5(cast(t as binary)), $i, 1), '$hexAlphabet')") -
        lit(1L)) * lit(1L << (4 * (8 - i)))
    }.reduce(_ + _)

  /** q164: the per-doc signed-projection embedding. */
  def docEmbed(documents: DataFrame): DataFrame = {
    val toks = documents
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), explode(col("toks")).as("t"))
      .withColumn("h", h32)
    val sums = (0 until dims).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        .as(s"e$j"))
    toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sums: _*)
      .select(col("doc_id") +: col("n_tokens") +:
        (0 until dims).map(j => col(s"e$j")): _*)
  }

  /** q166: the RAG indexing core — CHUNK the corpus (#72's overlapping
    * stride windows) and embed EVERY CHUNK with the same hash-kernel
    * projection, producing the (doc_id, chunk_id) → vector table a
    * retrieval index is built over. Composition of two hash-exact
    * operators stays hash-exact; plan shape is #72's chunk fan-out
    * with a second scan-side explode of each chunk's tokens (the
    * generator input IS the slice — no sibling-projection
    * re-evaluation hazard) and ONE (doc, chunk)-keyed aggregate.
    */
  def chunkEmbed(
      documents: DataFrame, chunkTokens: Int = 64, stride: Int = 32): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    val chunks = documents
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("start",
        explode(sequence(lit(0L), col("n_tokens") - 1L, lit(stride.toLong))))
      .select(col("doc_id"), expr(s"start DIV $stride").as("chunk_id"),
        explode(slice(col("toks"), (col("start") + 1L).cast("int"), lit(chunkTokens)))
          .as("t"))
      .withColumn("h", h32)
    val sums = (0 until dims).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        .as(s"e$j"))
    chunks.groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("chunk_len"), sums: _*)
      .select(col("doc_id") +: col("chunk_id") +: col("chunk_len") +:
        (0 until dims).map(j => col(s"e$j")): _*)
  }

  def sqlChunkEmbed(chunkTokens: Int = 64, stride: Int = 32): String = {
    val toks = Text.sqlTokens("text")
    val h = (1 to 8).map { i =>
      s"(strpos('$hexAlphabet', substr(md5(t), $i, 1)) - 1) * ${1L << (4 * (8 - i))}"
    }.mkString("(", " + ", ")")
    val sums = (0 until dims).map(j =>
      s"CAST(sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS e$j")
      .mkString(",\n       |  ")
    s"""WITH cet AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), cen AS (
       |  SELECT doc_id, toks, len(toks) AS n FROM cet WHERE len(toks) > 0
       |), ces AS (
       |  SELECT doc_id, toks, unnest(range(0, n, $stride)) AS start FROM cen
       |), cex AS (
       |  SELECT doc_id, CAST(start // $stride AS BIGINT) AS chunk_id,
       |    unnest(toks[start + 1 : start + $chunkTokens]) AS t
       |  FROM ces
       |), ceh AS (
       |  SELECT doc_id, chunk_id, $h AS h FROM cex
       |)
       |SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS chunk_len,
       |  $sums
       |FROM ceh GROUP BY doc_id, chunk_id""".stripMargin
  }

  def sqlDocEmbed: String = {
    val toks = Text.sqlTokens("text")
    val h = (1 to 8).map { i =>
      s"(strpos('$hexAlphabet', substr(md5(t), $i, 1)) - 1) * ${1L << (4 * (8 - i))}"
    }.mkString("(", " + ", ")")
    val sums = (0 until dims).map(j =>
      s"CAST(sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS e$j")
      .mkString(",\n       |  ")
    s"""WITH det AS (
       |  SELECT doc_id, unnest($toks) AS t FROM documents
       |), deh AS (
       |  SELECT doc_id, $h AS h FROM det
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  $sums
       |FROM deh GROUP BY doc_id""".stripMargin
  }
}
