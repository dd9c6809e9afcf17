package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Det
import graft.text.Text

/** Deduplication operators for LLM-training-data pipelines: exact
  * content-hash dedup, n-gram Jaccard near-dup pairs with length-band
  * blocking, MinHash+LSH banding, 64-bit SimHash with Hamming bands,
  * and embedding-cosine near-dup pairs.
  *
  * Scale design (SURVEY.md §5): nothing here materializes an O(n²)
  * all-pairs comparison except the explicitly-labelled brute-force
  * embedding baseline. The text paths generate candidates through
  * equi-joins on blocking keys (length band / LSH band hash / SimHash
  * band value), then verify only the candidates with the exact
  * similarity — at 100 TB the shuffles are keyed, skew-handled by AQE,
  * and the verified candidate set is many orders of magnitude smaller
  * than n². All expression work is pure Catalyst `Column` code (higher
  * order functions, no UDFs) so it stays inside whole-stage codegen.
  */
object Dedup {

  /** Distinct 3-token shingles (the Jaccard universe for q23/q24).
    * Reuses Text.shingles so the fingerprint (q21), near-dup (q23) and
    * MinHash (q24) operators all agree on the shingle definition.
    */
  def shingleSet(c: Column): Column = array_distinct(Text.shingles(c))

  def sqlShingleSet(x: String): String = s"list_distinct(${Text.sqlShingles(x)})"

  // ------------------------------------------------------------------
  // q22: exact dedup — one row per distinct content hash with the
  // kept (minimum) doc_id and the number of copies. Single groupBy
  // with map-side partial aggregation; the classic first-pass dedup.
  // ------------------------------------------------------------------
  def exact(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))

  def sqlExact: String =
    """SELECT md5(text) AS content_hash,
      |  CAST(count(*) AS BIGINT) AS n_copies,
      |  min(doc_id) AS keep_id
      |FROM documents GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q23: n-gram Jaccard near-dup pairs with length-band blocking.
  //
  // Band = bit-length of the shingle-set size. For a pair with
  // Jaccard >= 0.5 the set sizes differ by at most 2x, so their
  // bit-length bands differ by at most 1 — probing {band-1, band,
  // band+1} on one side of the equi-join is therefore LOSSLESS at
  // tau >= 0.5 (each qualifying pair matches on exactly one key, so no
  // distinct pass is needed). Blocking keys are few => band skew is
  // real; the MinHash path (q24) is the 100-TB candidate generator,
  // this operator is the exactly-verifiable baseline of the same
  // semantics.
  // ------------------------------------------------------------------
  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  def ngramPairs(documents: DataFrame, tau: Double = 0.5): DataFrame = {
    val base = documents
      .select(col("doc_id"), shingleSet(col("text")).as("sh"))
      .withColumn("band", length(bin(size(col("sh")).cast("long"))))
    val left = base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("band").as("k"))
    val right = base
      .select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        explode(array(col("band") - 1, col("band"), col("band") + 1)).as("k"))
    left.join(right, Seq("k"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= tau)
      .select(col("doc_a"), col("doc_b"), Det.r(col("jac"), 6).as("jaccard"))
  }

  def sqlNgramPairs(tau: Double = 0.5): String = {
    val jac = "CAST(len(list_intersect(a.sh, r.sh)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.sh, r.sh))) AS DOUBLE)"
    s"""WITH s AS (
       |  SELECT doc_id, ${sqlShingleSet("text")} AS sh FROM documents
       |), b AS (
       |  SELECT doc_id, sh, length(bin(len(sh))) AS band FROM s
       |), r AS (
       |  SELECT doc_id, sh, unnest([band - 1, band, band + 1]) AS k FROM b
       |)
       |SELECT a.doc_id AS doc_a, r.doc_id AS doc_b,
       |  floor(($jac) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
       |FROM b a JOIN r ON a.band = r.k AND a.doc_id < r.doc_id
       |WHERE ($jac) >= $tau""".stripMargin
  }

  // ------------------------------------------------------------------
  // q24: MinHash signatures + LSH band-bucket join.
  //
  // numHashes independent min-hashes (xxhash64 with the permutation
  // index mixed in), grouped into `bands` bands of `rowsPerBand`
  // signatures; a pair is a candidate iff some band hashes equal.
  // With (32, 8, 4): P(candidate) = 1-(1-j^4)^8 — ~1 for j >= 0.75,
  // ~1e-6 for j ~ 0.02 — so the equi-join on (band, bandHash)
  // produces a candidate set near-linear in the number of true
  // near-dups, never n². Candidates are then verified with the exact
  // shingle Jaccard. Model-dependent => rows-only driver gate; the
  // ScalaTest asserts no cartesian in the plan and agreement with
  // ngramPairs at tau=0.5.
  // ------------------------------------------------------------------
  def minhashSignatures(documents: DataFrame, numHashes: Int = 32): DataFrame =
    documents
      .select(col("doc_id"), shingleSet(col("text")).as("sh"))
      .withColumn("sigs",
        transform(sequence(lit(0), lit(numHashes - 1)),
          i => array_min(transform(col("sh"), s => xxhash64(i, s)))))

  def minhashLshPairs(
      documents: DataFrame,
      numHashes: Int = 32,
      bands: Int = 8,
      tau: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignatures(documents, numHashes)
    val banded = sigs
      .select(col("doc_id"), explode(sequence(lit(0), lit(bands - 1))).as("b"), col("sigs"))
      .select(col("doc_id"), col("b"),
        xxhash64(col("b"), slice(col("sigs"), col("b") * lit(rowsPerBand) + lit(1), lit(rowsPerBand)))
          .as("bkey"))
    val cands = banded.as("x")
      .join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct() // a true near-dup pair collides in many bands
    val sets = documents.select(col("doc_id"), shingleSet(col("text")).as("sh"))
    cands
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= tau)
      .select(col("doc_a"), col("doc_b"), Det.r(col("jac"), 6).as("jaccard"))
  }

  // ------------------------------------------------------------------
  // q25: 64-bit SimHash + Hamming-band near-dup pairs.
  //
  // SimHash: per token-hash bit j, accumulate +1/-1; bit j of the
  // fingerprint is 1 iff the weighted sum is positive. Near-identical
  // token multisets => small Hamming distance. Banding: 4 bands of 16
  // bits — any pair with Hamming distance <= 3 agrees exactly on at
  // least one band (pigeonhole), so the equi-join on (band, value) is
  // lossless for maxHamming <= 3. Expression-only: the fold runs in
  // `aggregate` over the token-hash array inside codegen.
  // ------------------------------------------------------------------
  def simhashTable(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .withColumn("hs", expr("transform(toks, t -> xxhash64(t))"))
      .withColumn("bits", expr(
        """transform(
          |  aggregate(hs, array_repeat(0L, 64),
          |    (acc, h) -> zip_with(acc,
          |       transform(sequence(0, 63), j -> if(((shiftright(h, j)) % 2) != 0, 1L, -1L)),
          |       (a, b) -> a + b)),
          |  c -> if(c > 0, 1L, 0L))""".stripMargin))
      .withColumn("bands", expr(
        "transform(sequence(0, 3), k -> aggregate(slice(bits, k * 16 + 1, 16), 0L, (a, b) -> a * 2L + b))"))
      .select(col("doc_id"), col("bits"), col("bands"))

  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4 bands of 16 bits are lossless only up to Hamming distance 3")
    val base = simhashTable(documents)
    val exploded = base.select(col("doc_id"), posexplode(col("bands")).as(Seq("k", "bval")))
    val cands = exploded.as("x")
      .join(exploded.as("y"),
        col("x.k") === col("y.k") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(base.select(col("doc_id").as("doc_a"), col("bits").as("bits_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("bits").as("bits_b")), "doc_b")
      .withColumn("hamming",
        expr("aggregate(zip_with(bits_a, bits_b, (a, b) -> abs(a - b)), 0L, (a, b) -> a + b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  // ------------------------------------------------------------------
  // q26: embedding-cosine near-dup pairs — the brute-force baseline.
  //
  // All-pairs cosine >= tau over the embeddings table. This is the
  // CORRECTNESS baseline (exactly SQL-expressible => DuckDB oracle);
  // the scale path for the same semantics is the LSH-bucketed ANN
  // (graft.sim.Similarity.lshAnn) whose candidates avoid n². Floats
  // are widened to double element-wise BEFORE any arithmetic so Spark
  // and the oracle run the identical IEEE operation sequence.
  // ------------------------------------------------------------------
  def embeddingPairs(embeddings: DataFrame, tau: Double = 0.35): DataFrame = {
    val e = embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, 0.0D, (acc, x) -> acc + x * x))"))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos",
        expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)") /
          (col("na") * col("nb")))
      .filter(col("cos") >= tau)
      .select(col("vec_a"), col("vec_b"), Det.r(col("cos"), 6).as("cosine"))
  }

  def sqlEmbeddingPairs(tau: Double = 0.35): String = {
    val dot = "list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))"
    val cos = s"($dot) / (a.nrm * b.nrm)"
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
       |)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  floor(($cos) * 1000000.0 + 0.5) / 1000000.0 AS cosine
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE ($cos) >= $tau""".stripMargin
  }
}
