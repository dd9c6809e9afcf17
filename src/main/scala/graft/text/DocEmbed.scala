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
