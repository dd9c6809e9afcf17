package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Ckpt.CkptOps

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

  /** Memoized, materialized [[chunkEmbed]] (default geometry) — the
    * chunk-vector table is the input of FOUR multi-pass consumers
    * (semantic dedup's count + Lloyd training + cell assignment +
    * scored join, and the ANN search's index build + re-score side),
    * and every uncached evaluation re-runs the tokenize + per-token
    * md5 scan. One materialization per corpus per session (the
    * pairsCached discipline); consumers derive their vec_id packings
    * as cheap projections over the cached table. Measured: the
    * round-13 q_semdedup_chunks first landed at 9.96 s on the sf0.1
    * bench — the slowest query in the fleet — with ~6 full chunk-scan
    * re-evaluations inside one query; the seam removes all but one.
    */
  private val ceMemo =
    graft.Memo[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame]()

  def chunkEmbedCached(documents: DataFrame): DataFrame =
    ceMemo.getOrElseUpdate(documents.sparkSession,
      documents.queryExecution.analyzed.canonicalized)(
      chunkEmbed(documents).boundedCheckpoint())

  /** Bench seam itemization (the MediaCodec.prewarm discipline): the
    * chunk-vector table, then the chunk-level semantic-dedup k-means
    * index over it (q_semdedup_chunks' fit — 3 memo misses inside its
    * sf1 timing before this line existed).
    */
  def prewarm(documents: DataFrame): Seq[(String, Double)] = {
    val t0 = System.nanoTime()
    chunkEmbedCached(documents)
    val t1 = System.nanoTime()
    // ONE index warms the whole chunk family since round 15: the
    // semdedup and the ANN search share the annChunkEmb frame and the
    // semCells-adaptive kmeans/assignment memo keys
    graft.dedup.Dedup.semPrewarm(annChunkEmb(documents))
    val t2 = System.nanoTime()
    Seq(
      "text_chunk_embed" -> ((t1 - t0) / 1e9),
      "text_chunk_index" -> ((t2 - t1) / 1e9))
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

  /** q167: retrieval over the chunk index — the RAG loop's READ half
    * (#166 builds the chunk-vector table; this searches it): the
    * first `nQueries` docs' #164 embeddings probe every OTHER doc's
    * chunks by cosine, top-k per query. The brute-kNN shape (#27):
    * chunk table scanned ONCE against the broadcast query set.
    * Integer dots + IEEE sqrt/divide + 6-dp fixing keep both engines
    * bit-identical; zero-norm vectors are excluded on both sides (a
    * perfectly sign-balanced token multiset has no direction — the
    * unitCorpus convention).
    *
    * Top-k is TWO-PHASE (the bm25Search/#81 bounded-window
    * discipline): phase 1 takes per-(query, shard) top-k under a
    * doc_id shard key — nQueries·`shards` window partitions, so the
    * corpus-sized candidate mass never funnels into nQueries
    * partitions — and phase 2 ranks only the ≤ nQueries·shards·k
    * survivors. The global top-k is a subset of the union of
    * per-shard top-ks and the order (cosine desc, doc_id, chunk_id)
    * is total, so ranks are IDENTICAL to the single-window form —
    * same oracle, same hash. [[chunkSearchAnn]] is the index-served
    * sibling; this stays the labeled exact truth it is recall-gated
    * against.
    */
  def chunkSearch(
      documents: DataFrame, nQueries: Int = 3, k: Int = 5,
      shards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def normsq(prefix: String) =
      (0 until dims).map(j => col(s"$prefix$j") * col(s"$prefix$j"))
        .reduce(_ + _)
    val chunks = chunkEmbed(documents)
      .withColumn("nsq", normsq("e")).filter(col("nsq") > 0L)
    val queries = docEmbed(documents)
      .filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_doc") +:
        (0 until dims).map(j => col(s"e$j").as(s"q$j")): _*)
      .withColumn("qsq", normsq("q")).filter(col("qsq") > 0L)
    val dot = (0 until dims).map(j => col(s"e$j") * col(s"q$j")).reduce(_ + _)
    val order = Seq(col("cosine").desc, col("doc_id").asc, col("chunk_id").asc)
    val w1 = Window
      .partitionBy(col("query_doc"), pmod(col("doc_id"), lit(shards.toLong)))
      .orderBy(order: _*)
    val w2 = Window.partitionBy(col("query_doc")).orderBy(order: _*)
    chunks.join(broadcast(queries), col("doc_id") =!= col("query_doc"))
      .withColumn("cosine", graft.Det.r(
        dot.cast("double") / (sqrt(col("nsq").cast("double")) *
          sqrt(col("qsq").cast("double"))), 6))
      .withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= k)
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_doc"), col("rank"), col("doc_id"), col("chunk_id"),
        col("cosine"))
  }

  /** Chunk-id-major vec_id packing for the chunk-vector corpus —
    * shared by BOTH chunk-index consumers (the ANN search and the
    * chunk semdedup) since round 15, so one trained k-means index
    * serves the family (the q_semdedup ↔ q_ann_ivf_kmeans discipline
    * at chunk granularity). Chunk-major because operators SEED by low
    * vec_id ([[graft.sim.Similarity.kmeansCentroids]] seeds cells from
    * vec_id < nCells): chunk_id·2^40 + doc_id puts the first nCells
    * DOCS' first chunks in the seed set (a spread across documents)
    * instead of one document's first chunks, and on a single-chunk
    * corpus vec_id == doc_id exactly — which is what makes the
    * chunk↔doc semdedup equivalence in SemDedupSpec an identity, not
    * an isomorphism. Invertible for doc_id < 2^40 and chunk_id < 2^22
    * (a 2^22-chunk doc would be ~134M tokens).
    */
  private val SemChunkSpan = 1L << 40

  /** q176: CHUNK-level semantic dedup — the SemDeDup paper's other
    * operand (the paper dedups both whole documents and passages; the
    * doc-level form is q_semdedup): the #166 chunk-vector table runs
    * through the SAME trained-k-means + within-cell-pairs + CC +
    * keep-the-least-central recipe ([[graft.dedup.Dedup.semDedup]] —
    * pure composition, zero new mechanics), so a PASSAGE duplicated
    * across otherwise-different documents (boilerplate, quoted blocks,
    * license headers — invisible to doc-level semdedup because the
    * surrounding text drags the doc embeddings apart) lands in one
    * cluster and all but one chunk copy is dropped. Output one row per
    * chunk: (doc_id, chunk_id, cell, cluster_id, n_chunks,
    * centroid_cos, keep) — cluster_id stays the packed min-vec_id
    * group label (opaque, deterministic). Model-dependent (trained
    * centroids) ⇒ rows-only; SemDedupSpec pins the single-chunk-doc
    * identity to doc-level semdedup and the shared-passage recovery
    * case.
    *
    * tau default 0.99, NOT the doc-level 0.35: the hash-kernel chunk
    * embedding is [[dims]]=8-dimensional AND the corpus vocabulary is
    * shared-token-heavy, so two UNRELATED chunks' cosine is large
    * (measured at sf0.1: median 0.44, 1% of random pairs ≥ 0.9) — at
    * any low τ the within-cell τ-graph PERCOLATES into giant
    * components (τ=0.35 collapsed 10,813 chunks to 16 keepers;
    * τ=0.9 to 316 — a dedup that keeps 3% is a corpus deleter, not a
    * deduplicator). At 0.99 the background rate is ~1e-4 ≪ 1/cell
    * size, the graph stays subcritical, and only near-identical token
    * multisets (true passage copies) cluster.
    */
  /** The chunk-vector table in the family's index shape ([[SemChunkSpan]]
    * vec_id packing, columns carried for the re-score join) —
    * extracted so the bench prewarm warms the SAME canonicalized plan
    * the queries key their memoized k-means on.
    */
  private[graft] def annChunkVecs(documents: DataFrame): DataFrame =
    chunkEmbedCached(documents)
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * lit(SemChunkSpan) + col("doc_id")).as("vec_id"),
        array((0 until dims).map(j => col(s"e$j").cast("double")): _*)
          .as("embedding"))

  /** [[annChunkVecs]] projected to the IVF-build shape. Zero-norm
    * chunks (a perfectly sign-balanced token multiset) are excluded
    * BEFORE the build — the brute sibling's `nsq > 0` convention:
    * they are unrankable on both paths, and a zero norm in the
    * cell-assignment divide is an ANSI DIVIDE_BY_ZERO (the round-12
    * sf0.1 crash). Similarity.prepared now also drops them at the
    * family seam; the filter here keeps the INDEX corpus itself (the
    * memoized cell table a 100 TB deployment persists) free of
    * undirectioned rows.
    */
  private[graft] def annChunkEmb(documents: DataFrame): DataFrame = {
    val vdot = graft.functions.GraftFunctions.vecDot _
    annChunkVecs(documents).select(col("vec_id"), col("embedding"))
      .filter(vdot(col("embedding"), col("embedding")) > 0.0)
  }

  def semDedupChunks(
      documents: DataFrame, nCells: Int = 16, iters: Int = 5,
      tau: Double = 0.99): DataFrame =
    // the UNIFIED chunk frame ([[annChunkEmb]] — the same canonicalized
    // plan q_chunk_search_ann builds its IVF index over), so the chunk
    // family trains ONE k-means index per session for both the dedup
    // and the search path
    graft.dedup.Dedup.semDedup(annChunkEmb(documents), nCells, iters, tau)
      .select(pmod(col("vec_id"), lit(SemChunkSpan)).as("doc_id"),
        expr(s"vec_id DIV ${SemChunkSpan}L").as("chunk_id"),
        col("cell"), col("cluster_id"), col("n_docs").as("n_chunks"),
        col("centroid_cos"), col("keep"))

  /** q168: ANN-SERVED chunk retrieval — the 100 TB shape of #167 (the
    * VERDICT's top item: the brute scan was the only baseline in the
    * fleet without an approximate sibling). Composes the #166
    * chunk-vector table with the section-E IVF machinery exactly as
    * q_semdedup composes with the k-means index: the chunk vectors
    * become a (vec_id, embedding) corpus (vec_id packs (doc_id,
    * chunk_id) — deterministic, invertible), Lloyd centroids train
    * once per session ([[graft.sim.Similarity.kmeansCached]]), every
    * chunk lands in one cell ([[graft.sim.Similarity.assignCellsCached]]
    * — the memoized table IS the index; at 100 TB it is what you
    * persist + bucket by cell), and each #164 query embedding probes
    * its nProbe best cells. Candidates come from the cell equi-join
    * (never an n×n compare), are re-scored EXACTLY and top-k'd per
    * query — the family invariant: approximate paths generate
    * candidates, exact arithmetic ranks them, so emitted cosines are
    * bit-identical to #167's and only the candidate SET is
    * approximate. Model-dependent (trained centroids) ⇒ rows-only
    * gate; recall@k vs the #167 brute truth is floor-pinned in
    * DocEmbedSpec, the SimilaritySpec discipline.
    */
  def chunkSearchAnn(
      documents: DataFrame, nQueries: Int = 3, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4, iters: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.sim.Similarity
    val vdot = graft.functions.GraftFunctions.vecDot _
    val chunkVecs = annChunkVecs(documents)
    val embFrame = annChunkEmb(documents)
    // corpus-adaptive cell count under the SAME memo keys as the chunk
    // semdedup (Dedup.semCells — identical frame, identical tag), so
    // search and dedup serve from one trained index at every scale
    val cells0 = graft.dedup.Dedup.semCells(embFrame, nCells)
    val cents = Similarity.kmeansCached(embFrame, cells0, iters)
      .select(col("cell"), col("cv"), lit(1.0).as("cn"))
    val assigned =
      Similarity.assignCellsCached(embFrame, cents, s"kmeans:$cells0:$iters")
    // queries: the #164 doc embeddings, unit-prepared; zero-norm
    // excluded (no direction), bounded at nQueries rows
    val queries = docEmbed(documents)
      .filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_doc"),
        array((0 until dims).map(j => col(s"e$j").cast("double")): _*).as("qv"))
      .withColumn("qn", sqrt(vdot(col("qv"), col("qv"))))
      .filter(col("qn") > 0.0)
    // probe selection: nQueries × nCells rows, entirely broadcast-side
    val wp = Window.partitionBy(col("query_doc"))
      .orderBy(col("ccos").desc, col("cell").asc)
    val qProbes = queries.crossJoin(broadcast(cents))
      .withColumn("ccos", vdot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(wp))
      .filter(col("rk") <= nProbe)
      .select(col("query_doc"), col("cell"), col("qv"), col("qn"))
    // candidates: cell equi-join against the persisted-shape index,
    // then ONE exact re-score pass over the probed fraction only
    val wr = Window.partitionBy(col("query_doc"))
      .orderBy(col("cosine").desc, col("c_doc").asc, col("c_chunk").asc)
    assigned.join(broadcast(qProbes), Seq("cell"))
      .join(chunkVecs.withColumnRenamed("doc_id", "c_doc")
        .withColumnRenamed("chunk_id", "c_chunk"), Seq("vec_id"))
      .filter(col("c_doc") =!= col("query_doc"))
      .withColumn("nrm", sqrt(vdot(col("embedding"), col("embedding"))))
      .filter(col("nrm") > 0.0)
      .withColumn("cosine", graft.Det.r(
        vdot(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 6))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_doc"), col("rank"), col("c_doc").as("doc_id"),
        col("c_chunk").as("chunk_id"), col("cosine"))
  }

  def sqlChunkSearch(nQueries: Int = 3, k: Int = 5): String = {
    def nsq(p: String) = (0 until dims).map(j => s"$p$j * $p$j").mkString(" + ")
    val dot = (0 until dims).map(j => s"c.e$j * q.q$j").mkString(" + ")
    val qcols = (0 until dims).map(j => s"e$j AS q$j").mkString(", ")
    s"""WITH csc AS (
       |  SELECT * FROM (
       |${sqlChunkEmbed()}
       |  ) WHERE ${nsq("e")} > 0
       |), csq AS (
       |  SELECT doc_id AS query_doc, $qcols FROM (
       |$sqlDocEmbed
       |  ) WHERE doc_id < $nQueries AND ${nsq("e")} > 0
       |), csj AS (
       |  SELECT q.query_doc, c.doc_id, c.chunk_id,
       |    floor(CAST($dot AS DOUBLE)
       |      / (sqrt(CAST(${nsq("c.e")} AS DOUBLE)) * sqrt(CAST(${nsq("q.q")} AS DOUBLE)))
       |      * 1000000.0 + 0.5) / 1000000.0 AS cosine
       |  FROM csc c JOIN csq q ON c.doc_id != q.query_doc
       |), csr AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_doc
       |    ORDER BY cosine DESC, doc_id ASC, chunk_id ASC) AS "rank"
       |  FROM csj
       |)
       |SELECT query_doc, CAST("rank" AS BIGINT) AS "rank", doc_id, chunk_id, cosine
       |FROM csr WHERE "rank" <= $k""".stripMargin
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

  // ------------------------------------------------------------------
  // q180: MMR-diversified retrieval.
  // ------------------------------------------------------------------

  // NOT private: the typed-Dataset DESERIALIZER (SafeProjection) is
  // generated code in another package constructing MmrCand — a private
  // constructor fails janino compilation at runtime (PackBinRow gets
  // away with private because it is serializer-side only)
  final case class MmrCand(
      query_doc: Long, doc_id: Long, chunk_id: Long, cosine: Double,
      uv: Array[Double])
  final case class MmrPick(
      query_doc: Long, mmr_rank: Long, doc_id: Long, chunk_id: Long,
      cosine: Double, max_sim: Double, mmr_score: Double)

  /** q180: MMR-DIVERSIFIED chunk retrieval — the re-rank a RAG stack
    * runs between retrieval and the context window (Carbonell &
    * Goldstein 1998): plain top-k (#167) happily fills all k slots
    * with near-copies of the same passage (and a deduplicated corpus
    * still retrieves paraphrase clusters); maximal marginal relevance
    * picks greedily by `λ·rel(q,c) − (1−λ)·max_{s∈picked} sim(c,s)`,
    * so each slot is charged for redundancy against what is already
    * in the context. At λ=1 the charge vanishes and MMR IS the brute
    * top-k — the equivalence DocEmbedSpec pins, next to the
    * diversification case (duplicate chunks tie in #167's list; at
    * λ=0.7 at most one of a duplicate pair survives).
    *
    * Scale shape: candidates are the EXACT top-`kPool` per query from
    * the #167 two-phase scan (same windows, same zero-norm exclusion,
    * vectors carried through); the greedy selection — sequential by
    * nature, like FFD packing — is then an in-memory O(kPool²·dims)
    * pass per QUERY GROUP inside flatMapGroups: ≤ kPool rows each,
    * embarrassingly parallel across queries, no global state. Both
    * relevance (the #167 6-dp cosine — emitted ranks stay comparable
    * to the brute list) and pairwise sims (unit-vector dots of exact
    * integer embeddings) are deterministic, ties break (doc_id,
    * chunk_id) — but the MODEL choice (λ, pool) makes the output a
    * ranking artifact, not a corpus fact ⇒ rows-only gate, invariants
    * in DocEmbedSpec.
    */
  def chunkSearchMmr(
      documents: DataFrame, nQueries: Int = 3, k: Int = 5,
      kPool: Int = 32, lambda: Double = 0.7, shards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0,1]")
    val spark = documents.sparkSession
    import spark.implicits._
    def normsq(prefix: String) =
      (0 until dims).map(j => col(s"$prefix$j") * col(s"$prefix$j"))
        .reduce(_ + _)
    val chunks = chunkEmbedCached(documents)
      .withColumn("nsq", normsq("e")).filter(col("nsq") > 0L)
    val queries = docEmbed(documents)
      .filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_doc") +:
        (0 until dims).map(j => col(s"e$j").as(s"q$j")): _*)
      .withColumn("qsq", normsq("q")).filter(col("qsq") > 0L)
    val dot = (0 until dims).map(j => col(s"e$j") * col(s"q$j")).reduce(_ + _)
    val order = Seq(col("cosine").desc, col("doc_id").asc, col("chunk_id").asc)
    val w1 = Window
      .partitionBy(col("query_doc"), pmod(col("doc_id"), lit(shards.toLong)))
      .orderBy(order: _*)
    val w2 = Window.partitionBy(col("query_doc")).orderBy(order: _*)
    val pool = chunks.join(broadcast(queries), col("doc_id") =!= col("query_doc"))
      .withColumn("cosine", graft.Det.r(
        dot.cast("double") / (sqrt(col("nsq").cast("double")) *
          sqrt(col("qsq").cast("double"))), 6))
      .withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= kPool)
      .withColumn("r2", row_number().over(w2))
      .filter(col("r2") <= kPool)
      .select(col("query_doc"), col("doc_id"), col("chunk_id"), col("cosine"),
        array((0 until dims).map(j =>
          col(s"e$j").cast("double") / sqrt(col("nsq").cast("double"))): _*)
          .as("uv"))
      .as[MmrCand]
    pool
      .groupByKey(_.query_doc)
      .flatMapGroups { (_, it) =>
        val cands = it.toArray
          .sortBy(c => (-c.cosine, c.doc_id, c.chunk_id))
        val picked = scala.collection.mutable.ArrayBuffer.empty[MmrCand]
        val used = new Array[Boolean](cands.length)
        val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
        var rank = 1L
        while (rank <= k && picked.length < cands.length) {
          var bestI = -1
          var bestScore = Double.NegativeInfinity
          var bestSim = 0.0
          var i = 0
          while (i < cands.length) {
            if (!used(i)) {
              val c = cands(i)
              var ms = 0.0
              picked.foreach { p =>
                var d = 0.0
                var j = 0
                while (j < c.uv.length) { d += c.uv(j) * p.uv(j); j += 1 }
                if (d > ms) ms = d
              }
              val score = lambda * c.cosine - (1.0 - lambda) * ms
              // strictly-better wins; the candidate order is already
              // (cosine desc, doc_id, chunk_id), so first-seen ties
              // keep the brute order — the λ=1 identity
              if (score > bestScore) { bestI = i; bestScore = score; bestSim = ms }
            }
            i += 1
          }
          val c = cands(bestI)
          used(bestI) = true
          picked += c
          out += MmrPick(c.query_doc, rank, c.doc_id, c.chunk_id, c.cosine,
            math.floor(bestSim * 1e6 + 0.5) / 1e6,
            math.floor(bestScore * 1e6 + 0.5) / 1e6)
          rank += 1
        }
        out
      }
      .toDF()
  }
}
