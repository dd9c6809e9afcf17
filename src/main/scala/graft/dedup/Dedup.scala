package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Det
import graft.Ckpt.CkptOps
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

  /** (doc_id, sh) where sh = the doc's distinct 3-token shingles,
    * xxhash64-mapped to longs. The Jaccard of two hashed sets equals
    * the Jaccard of the string sets (the hash is injective on any
    * realistic corpus; a 64-bit collision would need ~2^32 distinct
    * shingles per document pair), and long set-intersection is ~an
    * order of magnitude cheaper than string set-intersection — at
    * 100 TB the candidate-verification pass is exactly where that
    * factor lands. Tokens and shingles are materialized as columns so
    * the regex split runs once per document (CollapseProject keeps
    * non-cheap projections separate).
    *
    * The DuckDB twin applies DuckDB's own hash() — the hash VALUES
    * differ from Spark's, but set sizes, and therefore Jaccard, agree.
    */
  private def spread(documents: DataFrame): DataFrame = graft.Spread(documents)

  def hashedShingleSets(documents: DataFrame): DataFrame =
    spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("shs", Text.shinglesFrom(col("toks"), col("text")))
      // sorted so pair verification can use the zero-allocation merge
      // walk (graft.functions.SortedIntersectSize)
      .select(col("doc_id"),
        array_sort(array_distinct(transform(col("shs"), s => xxhash64(s)))).as("sh"),
        // the exact-dup content hash rides the same scan: the
        // incremental screen needs BOTH the shingle set and the md5,
        // and carrying ch here means one corpus read feeds both
        // screens instead of a second full pass over `documents`
        md5(col("text").cast("binary")).as("ch"))

  def sqlHashedShingleSet(x: String): String =
    s"list_distinct(list_transform(${Text.sqlShingles(x)}, s -> hash(s)))"

  /** Memoized, materialized [[hashedShingleSets]] — the dedup family's
    * single most re-derived artifact. Before this seam, q_dedup_ngram
    * (via pairsCached), q_dedup_minhash and q_dedup_eval each paid the
    * tokenize+shingle+hash corpus scan themselves (localCheckpoint'd
    * within a query only) — the family's last redundant corpus scan at
    * 100 TB. Same key/materialization discipline as [[pairsCached]] /
    * [[winsCached]]: keyed on the canonicalized analyzed input plan,
    * session-scoped, blocks freed by the ContextCleaner.
    */
  private val setsMemo =
    graft.Memo[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame]()

  def setsCached(documents: DataFrame): DataFrame =
    setsMemo.getOrElseUpdate(documents.sparkSession,
      documents.queryExecution.analyzed.canonicalized)(
      hashedShingleSets(documents).boundedCheckpoint())

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
  // q177: NORMALIZED exact dedup (canonicalize-then-hash).
  // ------------------------------------------------------------------

  /** The deterministic RE-ENCODING each doc receives before the
    * normalized dedup measures it (the Pii planting discipline: this
    * corpus is already canonical lowercase single-spaced ASCII, so
    * trivially-re-encoded duplicates — the #22 exact hash's blind
    * spot — are planted from doc_id arithmetic and the DuckDB twin
    * replays the same transform):
    *   - doc_id % 3 == 0 → verbatim;
    *   - doc_id % 3 == 1 → UPPERCASED (a case re-encode);
    *   - doc_id % 3 == 2 → double-spaced + a trailing " !!" (a
    *     whitespace/punctuation re-encode).
    * Each variant is content-preserving under [[normText]], so two
    * docs share a normalized group iff their ORIGINAL texts match —
    * but their raw md5s differ whenever their variant classes do.
    */
  private def reencoded(text: Column, docId: Column): Column =
    when(pmod(docId, lit(3L)) === 1L, upper(text))
      .when(pmod(docId, lit(3L)) === 2L,
        concat(regexp_replace(text, " ", "  "), lit(" !!")))
      .otherwise(text)

  /** Canonical text: lowercase, every run of non-alphanumerics
    * collapsed to one space, ends trimmed — the normalization layer
    * crawl pipelines put in front of the exact hash so case flips,
    * whitespace reflows, and stray punctuation don't defeat it.
    */
  private def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** q177: exact dedup after text CANONICALIZATION — catches the
    * trivially re-encoded duplicates (case flips, whitespace reflow,
    * punctuation dressing) that the raw content hash (#22) treats as
    * distinct documents. Same single-shuffle shape as [[exact]]: one
    * groupBy on the normalized hash with map-side partial aggregation;
    * the normalization itself is pure scan-side codegen (lower +
    * regexp_replace + trim). `n_exact_variants` counts the distinct
    * RAW hashes inside each normalized group — rows with
    * n_exact_variants > 1 are precisely the duplicates raw exact
    * dedup misses (guaranteed non-degenerate here by [[reencoded]]'s
    * planted variants; pinned in DedupSpec).
    */
  def exactNormalized(documents: DataFrame): DataFrame = {
    val enc = reencoded(col("text"), col("doc_id"))
    spread(documents)
      .select(col("doc_id"),
        md5(enc.cast("binary")).as("raw_hash"),
        md5(normText(enc).cast("binary")).as("norm_hash"))
      .groupBy(col("norm_hash"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("raw_hash")).as("n_exact_variants"),
        min(col("doc_id")).as("keep_id"))
  }

  def sqlExactNormalized: String =
    """WITH ne AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 1 THEN upper(text)
      |         WHEN doc_id % 3 = 2 THEN replace(text, ' ', '  ') || ' !!'
      |         ELSE text END AS enc
      |  FROM documents
      |)
      |SELECT md5(trim(regexp_replace(lower(enc), '[^a-z0-9]+', ' ', 'g'))) AS norm_hash,
      |  CAST(count(*) AS BIGINT) AS n_copies,
      |  CAST(count(DISTINCT md5(enc)) AS BIGINT) AS n_exact_variants,
      |  min(doc_id) AS keep_id
      |FROM ne GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q185: LINE-level exact dedup (the sub-document screen).
  // ------------------------------------------------------------------

  /** Tokens per derived line. This corpus is single-line token
    * streams, so the "line" a crawl pipeline would dedup on (a
    * newline-delimited run) is derived as consecutive fixed-width
    * token windows — the same move the span family makes for its
    * k-token windows, here non-overlapping because a LINE partitions
    * its document.
    */
  private val LineW = 12

  /** Two boilerplate lines planted from doc_id arithmetic (the
    * [[reencoded]] discipline — this corpus has no natural nav/footer
    * boilerplate, so the structure line-dedup exists to remove is
    * planted deterministically and the DuckDB twin replays it):
    * doc_id % 4 == 0 prepends [[BoilerA]], doc_id % 4 == 2 appends
    * [[BoilerB]]. Each lands in ~a quarter of the corpus, so the line
    * table carries two corpus-scale heavy-hitter hashes — exactly the
    * skew profile real boilerplate has (and what AQE's skew handling
    * sees at the keep-verdict join).
    */
  private val BoilerA =
    "subscribe to the data stream newsletter and follow for more updates"
  private val BoilerB =
    "click here to read the full archive of spark query reports"

  /** One row per (doc, line): doc_id, line_no (0-based), line text.
    * Lines are [[LineW]]-token windows of the whitespace token stream
    * plus the planted boilerplate; derivation is pure scan-side
    * codegen (split + transform/slice/array_join + posexplode).
    */
  private def lineFrame(documents: DataFrame): DataFrame = {
    val toks = Text.tokens(col("text"))
    val body = transform(
      sequence(lit(0), ((size(col("toks")) + lit(LineW - 1)) / lit(LineW)).cast("int") - lit(1)),
      i => array_join(slice(col("toks"), i * LineW + 1, lit(LineW)), " "))
    spread(documents)
      .withColumn("toks", toks)
      // an empty token stream must yield zero lines, not sequence(0,-1)
      // (which Spark evaluates as the DESCENDING sequence [0,-1])
      .withColumn("body",
        when(size(col("toks")) === 0, array().cast("array<string>")).otherwise(body))
      .withColumn("lines",
        when(pmod(col("doc_id"), lit(4L)) === 0L, concat(array(lit(BoilerA)), col("body")))
          .when(pmod(col("doc_id"), lit(4L)) === 2L, concat(col("body"), array(lit(BoilerB))))
          .otherwise(col("body")))
      .select(col("doc_id"), posexplode(col("lines")).as(Seq("line_no", "line")))
  }

  /** q185: corpus-wide LINE-level exact dedup, keep-first — the
    * sub-document modality (C4 / RefinedWeb's repeated-line removal)
    * between whole-document exact dedup (#22, blind to a duplicated
    * line inside distinct docs) and duplicated-SPAN scrubbing (#89,
    * which only fires on k-token windows shared across near-dup
    * pairs): EVERY line occurrence corpus-wide except the first
    * (minimum (doc_id, line_no), packed into one BIGINT so the winner
    * is a plain min — engine-portable, no struct-min semantics seam)
    * is dropped, and each document is reassembled from its surviving
    * lines in order.
    *
    * Plan (all linear, three bounded shuffles): scan-side line
    * derivation → one groupBy(line hash) with map-side partial agg for
    * the winners (heavy hitters collapse map-side — a boilerplate line
    * that appears in a quarter of a 100 TB corpus is ONE row per map
    * task) → hash-join lines against winners (line-count-sized, AQE
    * skew-split handles the boilerplate keys) → one groupBy(doc_id) to
    * reassemble. Nothing is ever all-pairs; text crosses the wire only
    * for the line table itself.
    *
    * Packed winner key: doc_id · 2^20 + line_no (line_no < 2^20 — a
    * million lines per document — by corpus contract; doc_id headroom
    * 2^43).
    */
  def lineDedup(documents: DataFrame): DataFrame = {
    // the documented packing contract, ENFORCED in-plan (the require()
    // discipline at row granularity): a doc past ~12.6M tokens (or an
    // out-of-range doc_id) would silently bleed into a neighboring
    // doc's key space and corrupt keep-first verdicts — fail loudly
    // instead. assert_true returns NULL when the contract holds, so
    // the when() wrapper keeps the packing inside codegen.
    val packOk = assert_true(
      col("line_no") < lit(1048576L) &&
        col("doc_id") >= 0L && col("doc_id") < lit(1L << 43),
      concat(lit("lineDedup winner-key packing requires 0 <= doc_id < 2^43 and "),
        lit("line_no < 2^20; got doc_id="), col("doc_id"),
        lit(" line_no="), col("line_no")))
    val lines = lineFrame(documents)
      .withColumn("lh", md5(col("line").cast("binary")))
      .withColumn("wk",
        when(packOk.isNull, col("doc_id") * lit(1048576L) + col("line_no")))
    val winners = lines.groupBy(col("lh")).agg(min(col("wk")).as("w"))
    lines.join(winners, Seq("lh"))
      .withColumn("kept", col("wk") === col("w"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("kept"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("kept"), struct(col("line_no"), col("line"))))),
            s => s.getField("line")),
          "\n").as("kept_text"))
  }

  def sqlLineDedup: String =
    s"""WITH tk AS (
       |  SELECT doc_id, ${graft.text.Text.sqlTokens("text")} AS toks FROM documents
       |), body AS (
       |  SELECT doc_id,
       |    CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE list_transform(range(0, (len(toks) + ${LineW - 1}) // $LineW),
       |                i -> array_to_string(list_slice(toks, i * $LineW + 1, i * $LineW + $LineW), ' '))
       |    END AS body
       |  FROM tk
       |), ln AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 4 = 0 THEN list_prepend('$BoilerA', body)
       |         WHEN doc_id % 4 = 2 THEN list_append(body, '$BoilerB')
       |         ELSE body END AS lines
       |  FROM body
       |), ex AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS line_no, lines[i] AS line
       |  FROM ln, UNNEST(range(1, len(lines) + 1)) AS t(i)
       |), h AS (
       |  SELECT doc_id, line_no, line, md5(line) AS lh,
       |         doc_id * 1048576 + line_no AS wk
       |  FROM ex
       |), w AS (
       |  SELECT lh, min(wk) AS w FROM h GROUP BY 1
       |)
       |SELECT h.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(sum(CASE WHEN h.wk = w.w THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  coalesce(array_to_string(
       |    list(CASE WHEN h.wk = w.w THEN h.line END ORDER BY h.line_no)
       |      FILTER (WHERE h.wk = w.w), chr(10)), '') AS kept_text
       |FROM h JOIN w USING (lh)
       |GROUP BY h.doc_id""".stripMargin

  // ------------------------------------------------------------------
  // q23: exact n-gram Jaccard near-dup pairs (inverted index).
  // ------------------------------------------------------------------
  /** Jaccard via inclusion-exclusion: |A∪B| = |A|+|B|-|A∩B|, so only
    * the intersection is materialized — array_union would allocate an
    * (m+n)-element array per candidate pair for a number we can get
    * from sizes.
    */
  private def withJaccard(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("inter",
        graft.functions.GraftFunctions.sortedIntersectSize(col("sh_a"), col("sh_b")).cast("double"))
      .withColumn("jac",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))

  /** Necessary size condition for jac >= tau: |A∩B| <= min(|A|,|B|)
    * implies jac <= min/max, so any qualifying pair has min >= tau*max.
    * Filtering on the (already materialized) sizes before the merge
    * walk prunes candidates for free without changing the output.
    * The epsilon guards the exact-boundary case against FP error in
    * tau*max (0.55*100 = 55.00000000000001 in doubles, so the true
    * boundary pair 55 >= 0.55*100 evaluates FALSE); it can only admit
    * extra candidates for verification, never drop a qualifying pair.
    */
  private def sizeRatioFilter(tau: Double): Column =
    size(col("sh_a")).cast("double") >= lit(tau) * size(col("sh_b")).cast("double") - lit(1e-9) &&
      size(col("sh_b")).cast("double") >= lit(tau) * size(col("sh_a")).cast("double") - lit(1e-9)

  /** Exact n-gram Jaccard pairs via a PREFIX-FILTERED inverted-index
    * join (the all-pairs-similarity shape of Chaudhuri et al.'s SSJoin
    * / Bayardo et al. WWW'07): rank every document's shingle hashes by
    * global document frequency ascending (rarest first, ties by hash —
    * one consistent total order), index only the first
    * n - ceil(tau*n) + 1 of them, equi-join the prefix index with
    * itself on the hash, and verify the surviving candidates with the
    * exact merge-walk intersection over the full sorted sets.
    *
    * Losslessness (any tau > 0): jac(A,B) >= tau implies
    * |A∩B| >= ceil(tau*max(|A|,|B|)) =: α, and for sets sorted by one
    * global order the smallest common element must sit within the
    * first |A|-α+1 positions of A (else all α common elements would
    * fit in A's last α-1 slots) — and likewise within B's first
    * |B|-α+1. Each side's indexed prefix n-ceil(tau*n)+1 is at least
    * that long, so every qualifying pair collides on >= 1 indexed
    * hash. Precision is 1 because candidates are re-scored exactly.
    *
    * This is what bounds the stop-phrase blowup at 100 TB: the join
    * volume is Σ_h p_h² over PREFIX frequencies, and a shingle shared
    * by a million documents lands in a document's prefix only when the
    * document has almost nothing rarer — df-ascending ordering is the
    * document-frequency cap, without the recall loss of hard-dropping
    * frequent shingles.
    */
  def ngramPairs(documents: DataFrame, tau: Double = 0.5): DataFrame = {
    // materialize the hashed sets ONCE: four consumers below (the df
    // aggregate, the prefix index, both verify-side joins) would each
    // re-run the tokenize+shingle+hash scan otherwise — per the perf
    // notes that per-row expression work dominates this operator.
    // Since round 9 the materialization is the family-shared memo
    // (setsCached), so the minhash/audit queries and this one pay the
    // corpus's tokenize+shingle scan once per session, not once each.
    val sets = setsCached(documents)
    val inv = sets
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("h"))
    val dfreq = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // rarest-first rank within each document; the window partitions by
    // doc_id, so partition size is bounded by shingles-per-document
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("h").asc)
    val prefix = inv
      .join(dfreq.hint("shuffle_hash"), Seq("h"))
      .withColumn("rk", row_number().over(wDoc))
      // ceil over an epsilon-lowered product: tau*n can carry +1e-14
      // representation error (0.55*100 = 55.00000000000001, first at
      // n=100), and over-ceiling SHORTENS the prefix below the
      // losslessness bound — silently dropping qualifying pairs
      // (DedupSpec constructs that exact boundary). Under-ceiling
      // merely lengthens the prefix (a candidate superset), so the
      // epsilon only ever errs toward extra verification work, never
      // recall.
      .filter(col("rk") <=
        col("n_sh") - ceil(lit(tau) * col("n_sh") - lit(1e-9)).cast("int") + 1)
      .select(col("doc_id"), col("h"))
    val x = prefix.select(col("doc_id").as("doc_a"), col("h"))
    val y = prefix.select(col("doc_id").as("doc_b"), col("h"))
    // force a shuffled hash join: BOTH sides are corpus-sized, so a
    // broadcast of the inverted index is wrong at scale, and it also
    // serializes the probe+aggregate work onto the (single-file) scan's
    // one partition. The shuffle on h gives full parallelism (AQE still
    // handles skewed shingles), and hashing beats sort-merge here —
    // equi-join on a long key with small per-key groups needs no order.
    val cands = x.join(y.hint("shuffle_hash"), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    withJaccard(
      cands
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .filter(sizeRatioFilter(tau)))
      .filter(col("jac") >= tau)
      .select(col("doc_a"), col("doc_b"), Det.r(col("jac"), 6).as("jaccard"))
  }

  /** Memoized, materialized [[ngramPairs]] — the "materialize the pair
    * graph once" production move the cost notes below describe, as a
    * library seam. The curation tail (q_dedup_clusters, q_dedup_best,
    * q_corpus_curation) all consume the SAME exact pair graph; run as
    * independent end-to-end queries they would each re-derive it (the
    * persistent #1 bench-tail block). The memo is keyed on the
    * CANONICALIZED analyzed input plan plus tau — the same key
    * discipline Spark's own CacheManager uses for `sameResult` — so
    * any semantically-equal `documents` frame at the same threshold
    * shares one localCheckpoint'd derivation, while different inputs
    * (another sf dir, a filtered corpus) key separately. Session
    * scoping, compute-once racing, and the invalidation hook live in
    * [[graft.Memo]]; blocks free when the session (or JVM) exits.
    */
  private val pairsMemo =
    graft.Memo[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Double), DataFrame]()

  def pairsCached(documents: DataFrame, tau: Double = 0.5): DataFrame =
    pairsMemo.getOrElseUpdate(documents.sparkSession,
      (documents.queryExecution.analyzed.canonicalized, tau))(
      ngramPairs(documents, tau).boundedCheckpoint())

  // ------------------------------------------------------------------
  // q181: the dedup-threshold SWEEP.
  // ------------------------------------------------------------------

  /** q181: what each candidate Jaccard CUTOFF would do — the #178
    * ablation-ladder discipline applied to the near-dup decision: for
    * every τ_k = tau + k·step (micro-integer rungs, 0.5→1.0 in 0.025
    * steps) the pairs surviving `jaccard ≥ τ_k` and the distinct
    * documents they implicate. This is the table that catches
    * PERCOLATION before it deletes a corpus: n_docs exploding as τ
    * drops means the τ-graph is going supercritical (the q_semdedup τ
    * lesson, institutionalized).
    *
    * One pass over the MEMOIZED #23 pair graph — no per-threshold
    * re-join: rung membership is integer-exact in jaccard MICROS
    * (floor(jac·1e6 + 0.5) recovers the 6-dp fixed point exactly;
    * k ≤ (jm − base) DIV step — no float boundary can misfile a
    * pair), each pair explodes to its rungs × its two endpoints
    * (≤ 2·(rungs+1) rows per pair), and one groupBy(rung) computes
    * both counts: n_pairs = rows/2, n_docs = the distinct endpoints.
    * Empty rungs drop (the #178 convention). DuckDB twin composes the
    * #23 CTE chain with the same explode ⇒ hash-exact.
    */
  def dedupSweep(
      documents: DataFrame, tau: Double = 0.5, stepMicro: Long = 25000L): DataFrame = {
    val base = math.round(tau * 1e6)
    val maxK = (1000000L - base) / stepMicro
    pairsCached(documents, tau)
      .withColumn("jm", floor(col("jaccard") * lit(1e6) + lit(0.5)).cast("long"))
      .select(explode(sequence(lit(0L),
        least(expr(s"(jm - ${base}L) DIV ${stepMicro}L"), lit(maxK)))).as("rung"),
        col("doc_a"), col("doc_b"))
      .select(col("rung"), explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .groupBy(col("rung"))
      .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
        countDistinct(col("d")).as("n_docs"))
      .select(col("rung"),
        ((lit(base) + col("rung") * stepMicro).cast("double") / lit(1e6))
          .as("threshold"),
        col("n_pairs"), col("n_docs"))
  }

  def sqlDedupSweep(tau: Double = 0.5, stepMicro: Long = 25000L): String = {
    val base = math.round(tau * 1e6)
    val maxK = (1000000L - base) / stepMicro
    val (ctes, select) = sqlNgramCtes(tau)
    s"""WITH $ctes, dsp AS (
       |$select
       |), dsr AS (
       |  SELECT doc_a, doc_b,
       |    unnest(generate_series(0, least(
       |      (CAST(floor(jaccard * 1000000.0 + 0.5) AS BIGINT) - $base) // $stepMicro,
       |      $maxK))) AS rung
       |  FROM dsp
       |), dsd AS (
       |  SELECT rung, unnest([doc_a, doc_b]) AS d FROM dsr
       |)
       |SELECT rung,
       |  CAST($base + rung * $stepMicro AS DOUBLE) / 1000000.0 AS threshold,
       |  CAST(count(*) // 2 AS BIGINT) AS n_pairs,
       |  CAST(count(DISTINCT d) AS BIGINT) AS n_docs
       |FROM dsd GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // q127: asymmetric CONTAINMENT pairs — the near-dup modality
  // symmetric Jaccard is blind to.
  // ------------------------------------------------------------------
  /** Directional n-gram containment pairs: C(A→B) = |A∩B| / |A| ≥ τ —
    * a SHORT document living inside a LONG one (quotes, aggregator
    * pages, boilerplate-plus-article rewraps). Symmetric Jaccard
    * misses exactly this case: A ⊂ B with |B| = 10·|A| has jac ≤ 0.1
    * at full containment. Emits (doc_a, doc_b, containment) with doc_a
    * the CONTAINED side; both directions can appear (exact twins
    * contain each other).
    *
    * Candidate generation is the ONE-SIDED prefix filter (the
    * [[screenAgainst]] bound): C(A→B) ≥ τ forces |A∩B| ≥ ⌈τ·|A|⌉ =: α,
    * so under any fixed total order a common shingle sits in A's first
    * |A|−α+1 positions — the probe side indexes only prefixes, while
    * the B side needs its FULL inverted index (containment puts no
    * bound on where the shared shingles sit in B; that asymmetry is
    * the operator). The fixed order is df-ascending (rarest first,
    * the [[ngramPairs]] SSJoin order), so prefixes hold each
    * document's rarest shingles and the join volume is Σ_h df_h ×
    * prefix_h — a stop shingle's full posting list is probed only by
    * documents with almost nothing rarer, the same blowup cap as the
    * symmetric join. Candidates verified exactly (merge-walk
    * intersection over the memoized [[setsCached]] seam ⇒ precision
    * 1); a necessary size pre-filter (|B| ≥ α − handled implicitly by
    * the intersection) is skipped because the full-index side carries
    * no size column — verification is the existing duplicates-sized
    * pass. Shingle-hash collisions argument as [[hashedShingleSets]]:
    * sizes (and therefore C) agree across engines.
    */
  def containmentPairs(documents: DataFrame, tau: Double = 0.8): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1], got $tau")
    val sets = setsCached(documents)
    val inv = sets
      .filter(size(col("sh")) >= 1)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("h"))
    val dfreq = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("h").asc)
    // prefix bound |A| − ⌈τ·|A|⌉ + 1 with the same epsilon-lowered
    // ceil as ngramPairs (over-ceiling would shorten the prefix below
    // the losslessness bound; under-ceiling only adds verification)
    val prefix = inv
      .join(dfreq.hint("shuffle_hash"), Seq("h"))
      .withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") <=
        col("n_sh") - ceil(lit(tau) * col("n_sh") - lit(1e-9)).cast("int") + 1)
      .select(col("doc_id").as("doc_a"), col("h"))
    val full = inv.select(col("doc_id").as("doc_b"), col("h"))
    val cands = prefix.join(full.hint("shuffle_hash"), Seq("h"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    cands
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter",
        graft.functions.GraftFunctions.sortedIntersectSize(col("sh_a"), col("sh_b")).cast("double"))
      .withColumn("cont", col("inter") / size(col("sh_a")).cast("double"))
      .filter(col("cont") >= tau)
      .select(col("doc_a"), col("doc_b"), Det.r(col("cont"), 6).as("containment"))
  }

  /** Memoized, materialized [[containmentPairs]] — shared by the pair
    * query and the [[containedDrop]] verdict (the pairsCached
    * discipline).
    */
  private val containMemo =
    graft.Memo[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Double), DataFrame]()

  def containmentCached(documents: DataFrame, tau: Double = 0.8): DataFrame =
    containMemo.getOrElseUpdate(documents.sparkSession,
      (documents.queryExecution.analyzed.canonicalized, tau))(
      containmentPairs(documents, tau).boundedCheckpoint())

  /** q131: the ACTION for [[containmentPairs]] — a per-document keep
    * verdict: DROP a document iff it is contained (C ≥ τ) in a
    * BIGGER document (more distinct shingles; equal sizes — the
    * mutual-containment twin case — tie to the LOWER doc_id, the
    * first-wins convention). The rule is deliberately PAIRWISE, not
    * transitive-closed: at the high τ this screen runs at, containment
    * chains a ⊑ b ⊑ c keep their maximal container c, and a's content
    * survives through the chain head — the SemDeDup argument; a
    * cluster pass ([[clusters]]) is the tool when τ is low enough for
    * that to matter. Output (doc_id, n_containers, keep) over every
    * document, so the artifact shows WHY a doc was dropped.
    *
    * PURE COMPOSITION off the memoized [[containmentCached]] graph +
    * the setsCached size projection: the verdict adds one
    * duplicates-sized join + a corpus-sized left join — zero new
    * corpus scans alongside the pair query.
    */
  def containedDrop(documents: DataFrame, tau: Double = 0.8): DataFrame = {
    val sizes = setsCached(documents).select(col("doc_id"), size(col("sh")).as("n_sh"))
    val droppers = containmentCached(documents, tau)
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .filter(col("nb") > col("na") || (col("nb") === col("na") && col("doc_b") < col("doc_a")))
      .groupBy(col("doc_a")).agg(count(lit(1)).as("nc"))
    documents.select(col("doc_id"))
      .join(droppers.withColumnRenamed("doc_a", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nc"), lit(0L)).as("n_containers"),
        when(col("nc").isNull, lit(1L)).otherwise(lit(0L)).as("keep"))
  }

  // ------------------------------------------------------------------
  // q139: the INCREMENTAL form of the containment screen — the
  // modality the round-10 verdict flagged as missing from the ingest
  // verdict: a landed doc FULLY CONTAINED in a stored doc passes the
  // near screen whenever |B| ≫ |A| (jac ≤ |A|/|B| — the #127
  // argument), so a crawl that re-lands a quote, an aggregator
  // fragment, or a boilerplate-wrapped excerpt of stored content
  // sails through Jaccard at any realistic τ. The screen is the
  // one-sided prefix probe AGAIN — C(A→B) ≥ τ forces |A∩B| ≥ ⌈τ|A|⌉,
  // so a common shingle sits in A's first |A|−⌈τ|A|⌉+1 positions
  // under any fixed order — probing the store's FULL inverted index
  // (containment puts no bound on where the shared shingles sit in
  // B; that asymmetry IS the operator). Cost ∝ batch, store scanned
  // never crossed.
  // ------------------------------------------------------------------
  /** The containment-screen core over prepared set-frames with the
    * store's inverted index SUPPLIED (the [[screenSetsWithIndex]]
    * seam shape — [[ShingleIndex.containmentProbe]] plugs the
    * persisted postings in): per batch doc (doc_id, n_containers,
    * keep) where n_containers counts store docs with C(batch→store)
    * ≥ τ and keep = 1 iff none.
    */
  private[dedup] def containSetsWithIndex(
      batchSets: DataFrame, exSets: DataFrame, exIndex: DataFrame,
      tau: Double, dfT: Option[DataFrame] = None): DataFrame =
    containSetsFromCounts(batchSets,
      interCountsBounded(batchSets, exSets, exIndex, tau, dfT), tau)

  /** The containment verdict from a prepared counts table —
    * C(A→B) = |A∩B| / |A| needs only the intersection COUNT and the
    * batch side's sizes, so the decision paths derive it from the
    * SAME shared counts aggregate as the near screen (`counts` at any
    * candidate alphaFrac ≤ tau — C ≥ τ forces |A∩B| ≥ ⌈τ·|A|⌉, the
    * [[screenCandidates]] bound, so the verdict is unchanged under
    * candidate supersets). Empty-set batch docs produce no exploded
    * rows, hence no counts row, hence keep = 1 through the left join
    * — identical to the pre-round-15 explicit size ≥ 1 filter.
    */
  private[dedup] def containSetsFromCounts(
      batchSets: DataFrame, counts: DataFrame, tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1], got $tau")
    val contained = counts
      // identical arithmetic to the round-11 array walk: double count
      // over double batch size (both exact integers; n_a rides the
      // counts rows — no size-attach join)
      .filter(col("inter").cast("double") / col("n_a").cast("double") >= tau)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_containers"))
    batchSets.select(col("doc_id"))
      .join(contained, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_containers"), lit(0L)).as("n_containers"),
        when(coalesce(col("n_containers"), lit(0L)) === 0L, lit(1L))
          .otherwise(lit(0L)).as("keep"))
  }

  /** Screen ARBITRARY new documents for containment in an ARBITRARY
    * existing store — the [[screenAgainst]] contract for the
    * containment modality: per landed doc, how many store docs
    * contain it at τ, and the keep verdict.
    */
  def containmentAgainst(
      newDocs: DataFrame, existingDocs: DataFrame, tau: Double = 0.8): DataFrame = {
    val exSets = setsCached(existingDocs)
    val exIndex = storeIndex(exSets)
    // static store by contract: the memoized df is the right source
    containSetsWithIndex(hashedShingleSets(newDocs), exSets, exIndex,
      tau, Some(storeDfCached(exIndex)))
  }

  /** q139: [[containmentAgainst]] in the mod-split batch convention
    * (batch = doc_id % batchMod == 0, the #107 shape).
    */
  def containedIncremental(
      documents: DataFrame, batchMod: Long = 10, tau: Double = 0.8): DataFrame = {
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    val sets = setsCached(documents)
    // candidate alphaFrac at the FAMILY floor, not this screen's tau:
    // containSetsFromCounts is exact under any candidate alphaFrac
    // ≤ tau (supersets only add rows the C ≥ τ filter rejects), and
    // probing at min(tau, near default) makes this the SAME memo entry
    // q_dedup_incremental / q_ingest_decision derive — one store-facing
    // counts materialization per session instead of one per threshold
    containSetsFromCounts(sets.filter(isBatch),
      storeCountsSeam(documents, batchMod, math.min(tau, ScreenAlphaDefault)),
      tau)
  }

  /** DuckDB twin of [[containedIncremental]]: brute directional
    * batch × store cross comparison.
    */
  def sqlContainedIncremental(batchMod: Long = 10, tau: Double = 0.8): String =
    s"""WITH cis AS (
       |  SELECT doc_id, ${sqlHashedShingleSet("text")} AS sh FROM documents
       |), cib AS (
       |  SELECT doc_id, sh FROM cis WHERE doc_id % $batchMod = 0
       |), cie AS (
       |  SELECT doc_id, sh FROM cis WHERE doc_id % $batchMod <> 0
       |), cic AS (
       |  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_containers
       |  FROM cib b JOIN cie e
       |    ON len(b.sh) >= 1
       |   AND CAST(len(list_intersect(b.sh, e.sh)) AS DOUBLE)
       |     / CAST(len(b.sh) AS DOUBLE) >= $tau
       |  GROUP BY 1
       |)
       |SELECT cib.doc_id,
       |  CAST(COALESCE(cic.n_containers, 0) AS BIGINT) AS n_containers,
       |  CAST(CASE WHEN COALESCE(cic.n_containers, 0) = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM cib LEFT JOIN cic USING (doc_id)""".stripMargin

  /** DuckDB twin of [[containedDrop]]: the brute containment cross
    * with the same bigger-or-lower-id dropper predicate.
    */
  def sqlContainedDrop(tau: Double = 0.8): String =
    s"""WITH cds AS (
       |  SELECT doc_id, ${sqlHashedShingleSet("text")} AS sh FROM documents
       |), cdd AS (
       |  SELECT a.doc_id AS doc_a, count(*) AS nc
       |  FROM cds a JOIN cds b ON a.doc_id <> b.doc_id
       |  WHERE len(a.sh) >= 1
       |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / CAST(len(a.sh) AS DOUBLE) >= $tau
       |    AND (len(b.sh) > len(a.sh)
       |         OR (len(b.sh) = len(a.sh) AND b.doc_id < a.doc_id))
       |  GROUP BY 1
       |)
       |SELECT cds.doc_id,
       |  CAST(COALESCE(cdd.nc, 0) AS BIGINT) AS n_containers,
       |  CASE WHEN cdd.nc IS NULL THEN CAST(1 AS BIGINT)
       |       ELSE CAST(0 AS BIGINT) END AS keep
       |FROM cds LEFT JOIN cdd ON cds.doc_id = cdd.doc_a""".stripMargin

  /** DuckDB twin of [[containmentPairs]]: the brute directional cross
    * comparison (the incremental-screen oracle shape) — the gate
    * cross-checks the prefix-filtered plan against an algorithm with
    * no blocking at all.
    */
  def sqlContainmentPairs(tau: Double = 0.8): String =
    s"""WITH cps AS (
       |  SELECT doc_id, ${sqlHashedShingleSet("text")} AS sh FROM documents
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  floor(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / CAST(len(a.sh) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS containment
       |FROM cps a JOIN cps b ON a.doc_id <> b.doc_id
       |WHERE len(a.sh) >= 1
       |  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / CAST(len(a.sh) AS DOUBLE) >= $tau""".stripMargin

  /** Shared CTE body + pair select for the ngram oracle, so the
    * cluster oracle can splice the identical pair derivation into its
    * own recursive query.
    */
  private def sqlNgramCtes(tau: Double): (String, String) = {
    // the oracle uses band/band±1 length blocking, which is lossless
    // ONLY for tau >= 0.5 (set-size ratio <= 2 => adjacent bit-length
    // bands); the Spark side's inverted index is exact for any tau > 0
    require(tau >= 0.5, "the band-blocked oracle is only lossless for tau >= 0.5")
    val jac = "CAST(len(list_intersect(a.sh, r.sh)) AS DOUBLE) / CAST(len(a.sh) + len(r.sh) - len(list_intersect(a.sh, r.sh)) AS DOUBLE)"
    val ctes =
      s"""s AS (
         |  SELECT doc_id, ${sqlHashedShingleSet("text")} AS sh FROM documents
         |), b AS (
         |  SELECT doc_id, sh, length(bin(len(sh))) AS band FROM s
         |), r AS (
         |  SELECT doc_id, sh, unnest([band - 1, band, band + 1]) AS k FROM b
         |)""".stripMargin
    val select =
      s"""SELECT a.doc_id AS doc_a, r.doc_id AS doc_b,
         |  floor(($jac) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
         |FROM b a JOIN r ON a.band = r.k AND a.doc_id < r.doc_id
         |WHERE ($jac) >= $tau""".stripMargin
    (ctes, select)
  }

  def sqlNgramPairs(tau: Double = 0.5): String = {
    val (ctes, select) = sqlNgramCtes(tau)
    s"WITH $ctes\n$select"
  }

  // ------------------------------------------------------------------
  // q38: near-dup cluster resolution (connected components + keep-id).
  //
  // Finding pairs is only half of dedup — the pipeline must then pick
  // ONE survivor per duplicate GROUP, and near-dup relations are not
  // transitive-closed (a~b, b~c but not a~c), so groups are the
  // connected components of the pair graph. cluster_id = min doc_id of
  // the component; keep the doc where doc_id = cluster_id.
  //
  // Algorithm: iterative min-label propagation with pointer jumping
  // (label(x) <- min(label(x), min label of neighbors, label(label(x)))),
  // the standard Spark-joins formulation of connected components.
  // Pointer jumping halves the remaining diameter every round, so
  // convergence is O(log diameter) shuffles; near-dup components have
  // tiny diameters, so 2-3 rounds in practice. The driver loop reads
  // ONE scalar per round (the count of labels that changed — zero at
  // fixpoint, overflow-proof unlike a label-sum comparison) to decide
  // termination; the data never leaves the cluster. Output covers
  // every doc that appears in a pair; singletons are trivially their
  // own cluster and are not emitted.
  // ------------------------------------------------------------------
  def clusters(pairs: DataFrame, maxIters: Int = 50,
      contractWidth: Option[Int] = None): DataFrame = {
    val session = pairs.sparkSession
    import session.implicits._
    // Phase 1 (round 15): partition-LOCAL union-find contraction —
    // exact for connected components (merging any subset of edges
    // first is a valid CC prefix), one narrow pass, no shuffle. Each
    // partition's edges collapse to node→local-min-root STARS, so the
    // iterative phase below starts from per-partition diameter ≤ 2
    // and needs rounds ∝ how many partitions a component spans —
    // not ∝ the raw graph diameter (measured: the tau=0.35 embedding
    // pair graph's chains cost 4+ rounds ≈ 2.5 s at bench scale;
    // contracted, the loop converges in 1-2).
    // Materialize the slim (16 B/row) edge list once: it feeds the
    // contraction pass AND the star union below (which otherwise
    // recomputes the pair derivation per union branch), and its exact
    // count sizes the contraction width SCALE-ADAPTIVELY — one
    // union-find task per ~4M edges (≈64 MB), so a bench-scale graph
    // contracts in ONE task (the local pass IS the full component
    // resolution and the loop below converges on its first check),
    // while a 100 TB pair graph keeps its parallel width. Contracting
    // any edge subset first is a valid CC prefix, so the width only
    // moves WORK, never a label.
    val slim = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .boundedCheckpoint()
    val nEdges = slim.count()
    // contractWidth overrides the adaptive sizing (tests use it to
    // keep a chain spread across tasks so the iterative phase — and
    // its maxIters guard — stays exercisable at spec scale)
    val width = contractWidth.getOrElse(math.max(1L, math.min(
      slim.rdd.getNumPartitions.toLong, (nEdges + 3999999L) / 4000000L)).toInt)
    val stars = slim.coalesce(width)
      .as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        parent.keysIterator.map(x => (x, find(x))).toArray.iterator
      }
      .toDF("node", "root")
    val edges = stars.select(col("node").as("src"), col("root").as("dst"))
      .union(stars.select(col("root").as("src"), col("node").as("dst")))
      .distinct()
      .persist()
    // each round references the previous labels THREE times (neighbor
    // join, pointer join, carry-through), so lineage grows 3^rounds —
    // localCheckpoint truncates it to the materialized blocks every
    // round (the standard move for iterative DataFrame algorithms; on
    // a real cluster with a checkpoint dir you would use the reliable
    // checkpoint() instead for fault tolerance)
    // `ckpt` is the frame actually holding checkpoint blocks (so
    // unpersist targets the right one); `labels` is at most a cheap
    // projection over it
    var ckpt = edges
      .groupBy(col("src").as("doc_id"))
      .agg(min(least(col("src"), col("dst"))).as("cluster_id"))
      .boundedCheckpoint()
    // edges' persist was just materialized by the aggregate above, so
    // slim's checkpoint blocks are dead weight from here (edges is
    // MEMORY_AND_DISK: eviction spills, never recomputes through slim)
    slim.dropCheckpoint()
    var labels = ckpt
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val viaNeighbors = edges
        .join(labels.select(col("doc_id").as("dst"), col("cluster_id").as("nb_label")), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("nb_label")).as("nb_label"))
      val viaPointer = labels
        .select(col("doc_id").as("cluster_id"), col("cluster_id").as("pj_label"))
      // labels only ever decrease, so "changed" == "strictly smaller";
      // convergence = a round with ZERO changed labels. (A label-sum
      // comparison would be one job cheaper to think about but can in
      // principle alias across rounds once sums exceed Long range at
      // full scale — non-ANSI sum wraps silently.) coalesce: sum over
      // an EMPTY label table is NULL — an empty pair set must converge
      // to an empty result, not throw.
      val next = labels
        .join(viaNeighbors, Seq("doc_id"))
        .join(viaPointer, Seq("cluster_id"))
        .select(col("doc_id"),
          least(col("cluster_id"), col("nb_label"), col("pj_label")).as("new_label"),
          (least(col("cluster_id"), col("nb_label"), col("pj_label")) < col("cluster_id"))
            .cast("long").as("chg"))
        .boundedCheckpoint()
      val changed = next.agg(coalesce(sum(col("chg")), lit(0L))).head().getLong(0)
      // Ckpt.drop, not Dataset.unpersist: the latter only knows
      // CacheManager entries and silently leaked every round's
      // checkpoint blocks (round 16 fix, verified in CkptSpec)
      ckpt.dropCheckpoint()
      ckpt = next
      labels = next.select(col("doc_id"), col("new_label").as("cluster_id"))
      converged = changed == 0L
      i += 1
    }
    edges.unpersist()
    if (sys.env.contains("GRAFT_CLUSTERS_DEBUG"))
      System.err.println(s"[clusters] rounds=$i")
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge in $maxIters rounds — pathological graph diameter")
    labels
  }

  /** Session-scoped memo of the MATERIALIZED component labels — the
    * setsCached discipline applied to [[clusters]]: the exact ngram
    * pair graph's labels are consumed by FIVE driver-gated queries
    * (q_dedup_clusters, q_dedup_best, q_dedup_report,
    * q_curation_verdicts, q_corpus_curation), and each used to re-run
    * the whole iterative label propagation (contraction pass + 1-2
    * pointer-jumping rounds, each with a checkpoint and a driver
    * convergence read) over the identical memoized pairs. Labels are
    * deterministic (min doc_id per component), so sharing the
    * materialization cannot move a verdict. Keyed on the canonicalized
    * pairs plan — a different graph (embedding, audio, image) gets its
    * own entry. Memoizing also closes a block leak: every un-memoized
    * call left its final round's checkpoint blocks persisted.
    */
  private val clustersMemo = graft.Memo[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame]()

  // no maxIters parameter: the memo key is the pairs plan alone, so a
  // caller-specific iteration guard would silently not apply on a memo
  // hit — every consumer gets clusters()' default
  def clustersCached(pairs: DataFrame): DataFrame =
    clustersMemo.getOrElseUpdate(pairs.sparkSession,
      pairs.queryExecution.analyzed.canonicalized)(
      // clusters() already returns a projection over its final
      // checkpointed round — stable blocks, no extra copy needed
      clusters(pairs))

  /** Connected components of a pair graph whose edges never cross a
    * bounded GROUP — the semdedup within-(cell, subcell) case: the
    * pair emitter is an equi-join on the group key, so a component
    * cannot span groups and labels are computable per group in ONE
    * typed pass (the bounded-group seam discipline: per-group FFD,
    * MMR, lattice DP) instead of [[clusters]]' O(log diameter)
    * iterative join rounds with a driver convergence read per round.
    * Contract identical to [[clusters]] on such a pair set: one row
    * per doc appearing in a pair, cluster_id = min doc_id of its
    * component (pinned equal in SemDedupSpec). Union-by-smaller-root
    * keeps every tree's root at the component minimum; group size is
    * bounded by the emitter (SemMaxCellRows), so per-group state is
    * bounded and edges stream through the iterator without
    * accumulating.
    */
  private[graft] def groupedComponents(
      pairs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val session = pairs.sparkSession
    import session.implicits._
    pairs
      .select(
        groupCols.map(c => col(c).cast("long")) ++
          Seq(col("doc_a").cast("long"), col("doc_b").cast("long")): _*)
      .as[(Long, Long, Long, Long)]
      .groupByKey { case (g1, g2, _, _) => (g1, g2) }
      .flatMapGroups { (_, rows) =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        rows.foreach { case (_, _, a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        parent.keysIterator.map(x => (x, find(x))).toArray.iterator
      }
      .toDF("doc_id", "cluster_id")
  }

  /** Driver-gated cluster query: components of the exact ngram pair
    * graph (oracle: recursive transitive closure over the same pairs).
    *
    * This, [[bestSurvivors]], and [[graft.text.Corpus.curate]] all
    * consume [[pairsCached]], so the pair graph derives ONCE per
    * (corpus, tau) even when the driver gate runs them as independent
    * end-to-end queries — the composition downstream of the pairs is
    * cheap.
    */
  def clustersQuery(documents: DataFrame, tau: Double = 0.5): DataFrame =
    clustersCached(pairsCached(documents, tau).select(col("doc_a"), col("doc_b")))

  /** All oracle CTEs through `labels` (doc_id, cluster_id) — exposed
    * so composed oracles (corpus curation) reuse the exact same
    * component derivation. The result must be prefixed with
    * `WITH RECURSIVE`.
    */
  def sqlClusterCtes(tau: Double = 0.5): String = {
    val (ctes, select) = sqlNgramCtes(tau)
    s"""$ctes, p AS (
       |  $select
       |), e AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM p
       |  UNION
       |  SELECT doc_b, doc_a FROM p
       |), reach(src, x) AS (
       |  SELECT src, src FROM (SELECT DISTINCT src FROM e)
       |  UNION
       |  SELECT w.src, e.dst FROM reach w JOIN e ON w.x = e.src
       |), labels AS (
       |  SELECT src AS doc_id, min(x) AS cluster_id FROM reach GROUP BY 1
       |)""".stripMargin
  }

  def sqlClusters(tau: Double = 0.5): String =
    s"WITH RECURSIVE ${sqlClusterCtes(tau)}\nSELECT doc_id, cluster_id FROM labels"

  /** Quality-priority survivor selection: within each near-dup cluster
    * keep the HIGHEST-quality copy — what a curation pass actually
    * wants (the min-id convention of [[clustersQuery]] keeps whichever
    * copy happened to crawl first; this keeps the cleanest, with
    * doc_id as the deterministic tie-break). Cluster labels join to
    * the quality scores on doc_id (the cluster table is
    * duplicates-only, ≪ corpus — AQE sizes the join), and the
    * survivor comes from ONE `max(struct)` aggregate with map-side
    * partial agg (the latestSnapshot shape), never a per-cluster
    * window sort.
    */
  def bestSurvivors(documents: DataFrame, tau: Double = 0.5): DataFrame =
    // checkpoint: labels feed the member prune AND the final join —
    // without it the whole iterative clustering would re-run per
    // consumer
    // labels come memoized + materialized from clustersCached — the
    // double consumption below reads stable checkpoint blocks
    survivorsFromLabels(documents, clustersQuery(documents, tau))

  /** The survivor tail shared by [[bestSurvivors]] (ngram clusters)
    * and [[embedDedupBest]] (embedding clusters): quality-score ONLY
    * cluster members (left-semi prune BEFORE the quality projection —
    * the expensive per-row expressions run on the duplicates-sized
    * slice, not the 100 TB corpus), then one max(struct) per cluster.
    * `labels` must be checkpointed/cheap — it is consumed twice.
    */
  private def survivorsFromLabels(documents: DataFrame, labels: DataFrame): DataFrame = {
    val members = documents.join(labels.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val quality = graft.text.Text.quality(members)
      .select(col("doc_id"), col("quality_score"))
    labels
      .join(quality, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(struct(col("quality_score"), (-col("doc_id")).as("neg_id"),
          col("doc_id").as("keep"))).as("w"))
      .select(col("cluster_id"), col("n_docs"),
        col("w.keep").as("keep_id"), col("w.quality_score").as("keep_score"))
  }

  /** Oracle: rank inside the recursive-closure clusters by
    * (quality DESC, doc_id ASC). */
  def sqlBestSurvivors(tau: Double = 0.5): String =
    // CTE names prefixed bs_ — the cluster CTEs already use the short
    // names (q, r, ...) and DuckDB rejects duplicates
    s"""WITH RECURSIVE ${sqlClusterCtes(tau)}, bs_q AS (
       |  SELECT doc_id, quality_score FROM (${graft.text.Text.sqlQuality})
       |), bs_r AS (
       |  SELECT labels.cluster_id, labels.doc_id, bs_q.quality_score,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY quality_score DESC, doc_id ASC) AS rn,
       |    count(*) OVER (PARTITION BY cluster_id) AS n_docs
       |  FROM labels JOIN bs_q USING (doc_id)
       |)
       |SELECT cluster_id, CAST(n_docs AS BIGINT) AS n_docs,
       |  doc_id AS keep_id, quality_score AS keep_score
       |FROM bs_r WHERE rn = 1""".stripMargin

  // ------------------------------------------------------------------
  // q96: corpus dedup dashboard — the ONE-ROW summary a curation run
  // reports before/after dedup (the artifact an operator reads to
  // size the dedup problem and validate a pass): exact-duplicate
  // volume, near-dup pair/cluster volume, and the affected-document
  // fraction. Composes the memoized seams, so on top of the other
  // dedup queries it costs three tiny aggregates — the pair graph and
  // clustering derive once per (corpus, tau) per JVM.
  // ------------------------------------------------------------------
  /** (n_docs, n_exact_groups, n_exact_dup_docs, n_near_pairs,
    * n_clusters, n_cluster_docs, near_dup_doc_frac) — one row.
    * n_exact_groups counts content hashes with ≥2 copies;
    * n_exact_dup_docs counts the documents inside those groups;
    * cluster figures come from the connected components of the exact
    * ngram pair graph ([[clustersQuery]]). Scalars combine via
    * [[graft.Det.attachScalar]] broadcast equi-joins (1-row frames —
    * never a BroadcastNestedLoopJoin).
    */
  def dedupReport(documents: DataFrame, tau: Double = 0.5): DataFrame = {
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val ex = exact(documents).filter(col("n_copies") >= 2)
      .agg(count(lit(1)).as("n_exact_groups"),
        coalesce(sum(col("n_copies")), lit(0L)).as("n_exact_dup_docs"))
    val pr = pairsCached(documents, tau).agg(count(lit(1)).as("n_near_pairs"))
    val cl = clustersQuery(documents, tau)
      .agg(countDistinct(col("cluster_id")).as("n_clusters"),
        count(lit(1)).as("n_cluster_docs"))
    Det.attachScalar(Det.attachScalar(Det.attachScalar(nDocs, ex), pr), cl)
      .select(col("n_docs"), col("n_exact_groups"), col("n_exact_dup_docs"),
        col("n_near_pairs"), col("n_clusters"), col("n_cluster_docs"),
        Det.r(col("n_cluster_docs").cast("double") /
          greatest(col("n_docs"), lit(1L)).cast("double"), 6).as("near_dup_doc_frac"))
  }

  def sqlDedupReport(tau: Double = 0.5): String =
    s"""WITH RECURSIVE ${sqlClusterCtes(tau)}, dr_n AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
       |), dr_ex AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_exact_groups,
       |    CAST(COALESCE(sum(n_copies), 0) AS BIGINT) AS n_exact_dup_docs
       |  FROM (SELECT count(*) AS n_copies FROM documents GROUP BY md5(text)) g
       |  WHERE n_copies >= 2
       |), dr_p AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_near_pairs FROM p
       |), dr_c AS (
       |  SELECT CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       |    CAST(count(*) AS BIGINT) AS n_cluster_docs
       |  FROM labels
       |)
       |SELECT n_docs, n_exact_groups, n_exact_dup_docs, n_near_pairs,
       |  n_clusters, n_cluster_docs,
       |  floor(CAST(n_cluster_docs AS DOUBLE) /
       |    CAST(CASE WHEN n_docs > 0 THEN n_docs ELSE 1 END AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
       |    AS near_dup_doc_frac
       |FROM dr_n, dr_ex, dr_p, dr_c""".stripMargin

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
  /** (doc_id, sig0..sigN-1): numHashes independent min-hash
    * permutations, computed by EXPLODING the hashed shingle set and
    * running numHashes plain `min(xxhash64(i, h))` aggregate columns —
    * whole-stage codegen with map-side partial aggregation, vs an
    * interpreted per-shingle-per-permutation lambda for the
    * higher-order-function formulation (~10x at sf0.1). The string
    * shingle is hashed exactly once (in hashedShingleSets); each
    * permutation re-mixes the LONG.
    */
  def minhashSignatures(documents: DataFrame, numHashes: Int = 32): DataFrame =
    minhashSignaturesFrom(hashedShingleSets(documents), numHashes)

  private def minhashSignaturesFrom(sets: DataFrame, numHashes: Int): DataFrame = {
    val sigCols = (0 until numHashes).map(i => min(xxhash64(lit(i), col("h"))).as(s"sig$i"))
    sets
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .groupBy(col("doc_id"))
      .agg(sigCols.head, sigCols.tail: _*)
  }

  /** Memoized, materialized minhash signature table — consumed by both
    * q_dedup_minhash and the q_dedup_eval band sweep, which would
    * otherwise each run the numHashes-min aggregation over the exploded
    * shingle sets. Forces [[setsCached]] (an acyclic memo chain — see
    * [[graft.Memo]]), so the shingle scan underneath is also shared.
    */
  private val sigsMemo =
    graft.Memo[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int), DataFrame]()

  def sigsCached(documents: DataFrame, numHashes: Int = 32): DataFrame =
    sigsMemo.getOrElseUpdate(documents.sparkSession,
      (documents.queryExecution.analyzed.canonicalized, numHashes))(
      minhashSignaturesFrom(setsCached(documents), numHashes).boundedCheckpoint())

  def minhashLshPairs(
      documents: DataFrame,
      numHashes: Int = 32,
      bands: Int = 8,
      tau: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rowsPerBand = numHashes / bands
    // family-shared memoized seams: ONE tokenize+shingle+hash scan
    // (setsCached) feeds the signature and verification paths here AND
    // q_dedup_ngram/q_dedup_eval; the signature table (sigsCached) is
    // likewise shared with the audit — and materialized, since the
    // band self-join references it from BOTH sides (the 32-min
    // aggregation would otherwise run twice)
    val sets = setsCached(documents)
    val sigs = sigsCached(documents, numHashes)
    val bandKeys = (0 until bands).map { b =>
      xxhash64((lit(b) +: (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}"))): _*)
    }
    val banded = sigs
      .select(col("doc_id"), posexplode(array(bandKeys: _*)).as(Seq("b", "bkey")))
    val cands = banded.as("x")
      .join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct() // a true near-dup pair collides in many bands
    withJaccard(
      cands
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .filter(sizeRatioFilter(tau)))
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
  /** (doc_id, band0..band3): the 64-bit SimHash as four 16-bit band
    * values. Tokens are EXPLODED and the per-bit +1/-1 sums run as 64
    * plain conditional-sum aggregate columns: unlike a higher-order
    * `aggregate` fold (interpreted, one closure call per token*bit),
    * every op here is whole-stage-codegen primitive arithmetic with
    * map-side partial aggregation — the shuffle carries 64 longs per
    * DOCUMENT, not per token. The four band values together encode all
    * 64 fingerprint bits, so downstream Hamming math needs no bit
    * array.
    */
  def simhashTable(documents: DataFrame): DataFrame = {
    val tokenHashes = spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { j =>
      sum(when(expr(s"(shiftright(h, $j) % 2) != 0"), 1L).otherwise(-1L)).as(s"c$j")
    }
    val sums = tokenHashes.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val bandCols = (0 until 4).map { k =>
      (0 until 16).map { i =>
        val j = k * 16 + i
        when(col(s"c$j") > 0, lit(1L << (15 - i))).otherwise(lit(0L))
      }.reduce(_ + _).as(s"band$k")
    }
    sums.select(col("doc_id") +: bandCols: _*)
  }

  /** Memoized, materialized [[simhashTable]] — q_dedup_simhash and the
    * q_dedup_eval Hamming sweep both need the fingerprint table (and
    * each references it from both sides of a band self-join); with the
    * memo the 64-conditional-sum corpus aggregation runs once per
    * (corpus) per session instead of once per consumer.
    */
  private val simhashMemo =
    graft.Memo[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame]()

  def simhashCached(documents: DataFrame): DataFrame =
    simhashMemo.getOrElseUpdate(documents.sparkSession,
      documents.queryExecution.analyzed.canonicalized)(
      simhashTable(documents).boundedCheckpoint())

  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4 bands of 16 bits are lossless only up to Hamming distance 3")
    // the memoized fingerprint table (shared with q_dedup_eval); the
    // band self-join references it from both sides, so it must be a
    // materialization, not a plan
    val base = simhashCached(documents)
    val bandArr = array(col("band0"), col("band1"), col("band2"), col("band3"))
    val exploded = base.select(
      col("doc_id"), col("band0"), col("band1"), col("band2"), col("band3"),
      posexplode(bandArr).as(Seq("k", "bval")))
    // band values ride along through the candidate join, so Hamming
    // needs no re-join against the base table
    val cands = exploded.as("x")
      .join(exploded.as("y"),
        col("x.k") === col("y.k") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.band0").as("a0"), col("x.band1").as("a1"),
        col("x.band2").as("a2"), col("x.band3").as("a3"),
        col("y.band0").as("b0"), col("y.band1").as("b1"),
        col("y.band2").as("b2"), col("y.band3").as("b3"))
      .dropDuplicates("doc_a", "doc_b")
    cands
      .withColumn("hamming",
        (bit_count(expr("a0 ^ b0")) + bit_count(expr("a1 ^ b1")) +
          bit_count(expr("a2 ^ b2")) + bit_count(expr("a3 ^ b3"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  // ------------------------------------------------------------------
  // q98: near-dup AGREEMENT AUDIT — recall of the approximate dedup
  // paths (MinHash-LSH band sweep, SimHash Hamming sweep) against the
  // EXACT n-gram pair set at matched tau, as a queryable artifact (the
  // q_ann_eval pattern: the evaluation that DECIDES which operating
  // point the approximate path may run at, emitted as a query so the
  // decision input is itself a gated artifact).
  //
  // One row per (method, level): for minhash, level = number of LSH
  // bands over the fixed 32-hash signature (more bands = shorter
  // bands = more candidates = higher recall); for simhash, level =
  // the Hamming cutoff. Both sweeps are NESTED, so recall is monotone
  // non-decreasing in level (DedupSpec pins it):
  //   - minhash: band levels are aligned refinements (each coarse
  //     band is a union of finer bands, ratios divide), and a pair
  //     agreeing on a coarse band agrees on all its sub-bands — so
  //     the candidate set only grows with the band count. The sweep
  //     derives every level from ONE finest-level self-join: per pair
  //     the agreeing finest bands form a <=32-bit mask, and "candidate
  //     at b bands" = the mask contains a full aligned run of
  //     maxBands/b finest bands — a literal bit test, no extra joins.
  //   - simhash: hamming <= h is a filter on the one banded pair set.
  // Candidates are verified with the exact Jaccard ONCE (minhash
  // verified pairs are therefore a subset of the exact set: precision
  // 1, recall = count ratio); simhash pairs intersect the exact set
  // explicitly (its Hamming metric is not Jaccard-comparable).
  // Hash-model-dependent => rows-only driver gate.
  // ------------------------------------------------------------------
  /** (method, level, n_exact, n_pairs, recall, n_cands, n_standalone)
    * — see block comment. `bandSweep` must be ascending, each dividing
    * numHashes and the max (so band levels nest); `hammingSweep`
    * ascending within the lossless 0..3 range. `n_cands` is the COST
    * axis: candidate pairs the method surfaces at that operating point
    * (minhash: entrants to exact verification; simhash: banded pairs
    * within the Hamming cutoff) — monotone in level like the recall.
    * `n_standalone` is non-null only on the (minhash, crossCheckBands)
    * row: the standalone [[minhashLshPairs]] count recomputed
    * independently, so the sweep/standalone agreement is auditable in
    * the artifact.
    */
  def dedupEval(
      documents: DataFrame,
      tau: Double = 0.5,
      numHashes: Int = 32,
      bandSweep: Seq[Int] = Seq(2, 4, 8, 16),
      hammingSweep: Seq[Int] = Seq(0, 1, 2, 3),
      crossCheckBands: Int = 8): DataFrame = {
    // validate BEFORE .max — an empty sweep must fail with the intended
    // message, not `empty.max`'s UnsupportedOperationException
    require(bandSweep.nonEmpty, "band sweep must be non-empty")
    require(hammingSweep.nonEmpty, "hamming sweep must be non-empty")
    require(bandSweep.contains(crossCheckBands),
      s"cross-check band count $crossCheckBands must be a sweep level: $bandSweep")
    val maxBands = bandSweep.max
    require(bandSweep == bandSweep.sorted && bandSweep.distinct == bandSweep &&
      bandSweep.forall(b => b > 0 && numHashes % b == 0 && maxBands % b == 0),
      s"band sweep must strictly ascend and nest into $numHashes hashes: $bandSweep")
    require(maxBands <= 32, "the per-pair band mask is a 32-bit literal test")
    require(hammingSweep == hammingSweep.sorted && hammingSweep.distinct == hammingSweep &&
      hammingSweep.forall(h => h >= 0 && h <= 3),
      s"hamming sweep must strictly ascend within [0, 3]: $hammingSweep")

    val exact = pairsCached(documents, tau)
    val nExact = exact.agg(count(lit(1)).as("n_exact"))

    // ---- minhash: one finest-level band self-join -> per-pair mask
    // (shingle sets + signature table are the family-shared memoized
    // seams — the audit re-derives NOTHING the standalone queries use)
    val sets = setsCached(documents)
    val sigs = sigsCached(documents, numHashes)
    val rowsPerBand = numHashes / maxBands
    val bandKeys = (0 until maxBands).map { b =>
      xxhash64((lit(b) +: (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}"))): _*)
    }
    val banded = sigs.select(col("doc_id"), posexplode(array(bandKeys: _*)).as(Seq("b", "bkey")))
    val masks = banded.as("x")
      .join(banded.as("y").hint("shuffle_hash"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"), col("x.b").as("b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(expr("bit_or(shiftleft(1L, b))").as("mask"))
      // consumed twice (the verification path and the n_cands cost
      // aggregate) — materialize so the band self-join runs once, the
      // same reason shPairs below is checkpointed
      .boundedCheckpoint()
    def candAt(bands: Int): Column = {
      val run = maxBands / bands
      (0 until bands).map { i =>
        val m = ((1L << run) - 1) << (i * run)
        col("mask").bitwiseAND(lit(m)) === lit(m)
      }.reduce(_ || _)
    }
    // smallest band count whose aligned-run test passes (mask != 0 =>
    // the finest level always passes, so lvl is never null)
    val lvl = least(bandSweep.map(b => when(candAt(b), lit(b))): _*)
    val mhVerified = withJaccard(
      masks.select(col("doc_a"), col("doc_b"), lvl.as("lvl"))
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .filter(sizeRatioFilter(tau)))
      .filter(col("jac") >= tau)
      .select(col("doc_a"), col("doc_b"), col("lvl"))
    val mhWide = mhVerified.agg(
      bandSweep.map(b => sum(when(col("lvl") <= b, 1L).otherwise(0L)).as(s"n$b")).head,
      bandSweep.map(b => sum(when(col("lvl") <= b, 1L).otherwise(0L)).as(s"n$b")).tail: _*)
    // the COST axis: candidate pairs that enter exact verification at
    // each operating point (nested band levels ⇒ lvl ≤ b is exactly
    // candAt(b)) — the verification work the banding choice buys or
    // saves, next to the recall it achieves
    val mhCands = masks.select(lvl.as("lvl")).agg(
      bandSweep.map(b => sum(when(col("lvl") <= b, 1L).otherwise(0L)).as(s"c$b")).head,
      bandSweep.map(b => sum(when(col("lvl") <= b, 1L).otherwise(0L)).as(s"c$b")).tail: _*)
    val mhRows = Det.attachScalar(mhWide, mhCands)
      .select(explode(array(bandSweep.map(b =>
        struct(lit("minhash").as("method"), lit(b).cast("long").as("level"),
          coalesce(col(s"n$b"), lit(0L)).as("n_pairs"),
          coalesce(col(s"c$b"), lit(0L)).as("n_cands"))): _*)).as("r"))
      .select(col("r.method"), col("r.level"), col("r.n_pairs"), col("r.n_cands"))

    // ---- simhash: hamming rides along; intersect the exact set.
    // Materialized: both the candidate-count aggregate (cost axis)
    // and the exact-set intersection read the banded pair table.
    val shPairs = simhashPairs(documents, maxHamming = hammingSweep.max).boundedCheckpoint()
    val shHits = shPairs
      .join(exact.select(col("doc_a"), col("doc_b")), Seq("doc_a", "doc_b"))
    val shWide = shHits.agg(
      hammingSweep.map(h => sum(when(col("hamming") <= h, 1L).otherwise(0L)).as(s"n$h")).head,
      hammingSweep.map(h => sum(when(col("hamming") <= h, 1L).otherwise(0L)).as(s"n$h")).tail: _*)
    val shCands = shPairs.agg(
      hammingSweep.map(h => sum(when(col("hamming") <= h, 1L).otherwise(0L)).as(s"c$h")).head,
      hammingSweep.map(h => sum(when(col("hamming") <= h, 1L).otherwise(0L)).as(s"c$h")).tail: _*)
    val shRows = Det.attachScalar(shWide, shCands)
      .select(explode(array(hammingSweep.map(h =>
        struct(lit("simhash").as("method"), lit(h).cast("long").as("level"),
          coalesce(col(s"n$h"), lit(0L)).as("n_pairs"),
          coalesce(col(s"c$h"), lit(0L)).as("n_cands"))): _*)).as("r"))
      .select(col("r.method"), col("r.level"), col("r.n_pairs"), col("r.n_cands"))

    // ---- cross-check column: the STANDALONE q_dedup_minhash pair
    // count at its operating point, recomputed through the standalone
    // code path (an independent derivation — only the memoized
    // signature seam is shared) and emitted on the matching sweep row.
    // The sweep's mask trick PROVES that row equals the standalone;
    // this makes the agreement visible in the queryable artifact
    // itself, mirroring pq@refine == pqAnn in the ANN audit.
    val standalone = minhashLshPairs(documents, numHashes, crossCheckBands, tau)
      .agg(count(lit(1)).as("n_standalone"))

    val base = Det.attachScalar(mhRows.unionAll(shRows), nExact)
    Det.attachScalar(base, standalone)
      .select(col("method"), col("level"), col("n_exact"), col("n_pairs"),
        Det.r(col("n_pairs").cast("double") /
          greatest(col("n_exact"), lit(1L)).cast("double"), 6).as("recall"),
        col("n_cands"),
        when(col("method") === lit("minhash") && col("level") === lit(crossCheckBands.toLong),
          col("n_standalone")).as("n_standalone"))
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
    val spark = embeddings.sparkSession
    val dot = graft.functions.GraftFunctions.vecDot _
    val e = embeddings
      // native array cast, not an interpreted transform() lambda —
      // see Similarity.prepared
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    // the nested-loop stream side inherits the scan's partitioning (a
    // single file => a single partition => one thread does all n^2/2
    // work); spread it across the session's shuffle parallelism
    val a = e.repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= tau)
      .select(col("vec_a"), col("vec_b"), Det.r(col("cos"), 6).as("cosine"))
  }

  /** Memoized, materialized [[embeddingPairs]] — the [[pairsCached]]
    * discipline for the embedding pair graph: q_dedup_embedding and
    * q_embed_dedup_best consume the SAME brute graph, so the n²
    * scoring pass runs once per (corpus, tau) per JVM.
    */
  private val embPairsMemo =
    graft.Memo[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Double), DataFrame]()

  def embeddingPairsCached(embeddings: DataFrame, tau: Double = 0.35): DataFrame =
    embPairsMemo.getOrElseUpdate(embeddings.sparkSession,
      (embeddings.queryExecution.analyzed.canonicalized, tau))(
      embeddingPairs(embeddings, tau).boundedCheckpoint())

  /** q108: INCREMENTAL semantic dedup — the [[incrementalDedup]]
    * contract for the embedding modality: per BATCH vector (the
    * deterministic doc_id % batchMod == 0 slice standing in for a
    * landed micro-batch), the count of EXISTING vectors with cosine
    * ≥ tau and the keep flag.
    *
    * Scale shape — the reason this is not just a filtered
    * [[embeddingPairs]]: the batch is SMALL by construction, so it
    * BROADCASTS and the whole screen is ONE map-side pass over the
    * existing corpus scan followed by a batch-sized rollup — no n²
    * pair materialization, no corpus shuffle (contrast the all-pairs
    * baseline, which must compare everything to everything). Exactly
    * SQL-expressible ⇒ DuckDB brute batch×existing oracle, like the
    * other incremental screen.
    *
    * `useLsh = true` swaps the dot-everything screen for the
    * hyperplane-LSH BLOCKED variant — the 100 TB path, mirroring how
    * [[embeddingPairsLsh]] backs [[embeddingPairs]]: both sides bucket
    * under the same deterministic hyperplanes, the (tables × probes)
    * batch bucket table broadcasts, and the existing scan computes the
    * exact cosine ONLY for rows whose bucket matches a batch probe —
    * still one map-side corpus pass (an equi-join on (t, bkt), no
    * BNLJ), but each existing row now pays a hash-set probe instead of
    * |batch| dot products. Candidates are exactly re-scored at the
    * join, so precision is 1 and only recall is approximate
    * (recall-gated vs the brute default in DedupSpec).
    */
  def embedIncremental(
      embeddings: DataFrame, batchMod: Long = 10, tau: Double = 0.35,
      useLsh: Boolean = false, tables: Int = 8, bits: Int = 8): DataFrame = {
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    val isBatch = pmod(col("vec_id"), lit(batchMod)) === 0
    embedScreenAgainst(
      embeddings.filter(isBatch), embeddings.filter(!isBatch), tau, useLsh, tables, bits)
  }

  /** Screen ARBITRARY new vectors against an ARBITRARY existing store
    * — the [[embedIncremental]] contract without the mod-split
    * convention (the [[screenAgainst]] shape for the embedding
    * modality), and the entry the streaming form
    * ([[graft.streaming.Events.embedScreenStream]]) calls per
    * micro-batch. vec_ids must be unique across batch ∪ store (the
    * same id-space contract as the text screen's doc_ids).
    *
    * Both paths are one map-side pass over the store scan: brute
    * broadcasts the (batch × vector) table and dots everything; the
    * LSH path broadcasts the multi-probe bucket table and dots only
    * bucket-matching rows. The model side (dimensionality, and the
    * deterministic hyperplanes derived from it) is defined by the
    * STORE — the batch buckets under the store's dimensionality, so
    * every micro-batch of a streaming ingest probes the same index
    * geometry.
    */
  def embedScreenAgainst(
      newVecs: DataFrame, existingVecs: DataFrame, tau: Double = 0.35,
      useLsh: Boolean = false, tables: Int = 8, floorBits: Int = 8): DataFrame = {
    // the STORE defines the geometry, including the adaptive width —
    // every micro-batch of a streaming ingest probes the same index
    val bits = if (useLsh) lshBits(existingVecs, floorBits) else floorBits
    val dot = graft.functions.GraftFunctions.vecDot _
    // zero-norm guard (the Similarity-family `nrm > 0` discipline):
    // without it cos = 0/0 = NaN, and Spark ORDERS NaN above all
    // doubles so `cos >= tau` would count a zero vector as a
    // near-dup of everything
    def prep(df: DataFrame): DataFrame = df
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .filter(col("nrm") > 0)
    val near =
      if (!useLsh) {
        val batch = prep(newVecs)
          .select(col("vec_id"), col("v").as("bv"), col("nrm").as("bn"))
        val existing = prep(existingVecs)
          .select(col("vec_id").as("ex_id"), col("v").as("ev"), col("nrm").as("en"))
        existing.join(broadcast(batch), col("ex_id") =!= col("vec_id"))
          .withColumn("cos", dot(col("ev"), col("bv")) / (col("en") * col("bn")))
          .filter(col("cos") >= tau)
          .groupBy(col("vec_id"))
          .agg(count(lit(1)).as("n_near_dups"))
      } else {
        // the STORE defines the index geometry: its modal
        // dimensionality seeds the shared deterministic hyperplanes
        val d = graft.sim.Similarity.detectDim(existingVecs)
        def bucketed(df: DataFrame): DataFrame =
          graft.sim.Similarity.bucketedCorpus(df, tables, bits, d)
            .filter(col("nrm") > 0)
        // batch side: exact bucket + every 1-bit flip per table (the
        // multi-probe recall knob), vector carried for the re-score —
        // a (batch × tables × (bits+1))-row broadcast table
        val probe = bucketed(newVecs)
          .select(col("vec_id"), col("v").as("bv"), col("nrm").as("bn"),
            posexplode(col("buckets")).as(Seq("t", "qbkt")))
          .select(col("vec_id"), col("bv"), col("bn"), col("t"),
            explode(expr(
              s"transform(sequence(-1, ${bits - 1}), j -> if(j < 0, qbkt, qbkt ^ shiftleft(1L, j)))"))
              .as("bkt"))
        // existing side: exact buckets only; v/nrm ride the map-side
        // pipeline (the join is broadcast — nothing here shuffles, so
        // the carried vector never crosses the network)
        val ex = bucketed(existingVecs)
          .select(col("vec_id").as("ex_id"), col("v").as("ev"), col("nrm").as("en"),
            posexplode(col("buckets")).as(Seq("t", "bkt")))
        ex.join(broadcast(probe), Seq("t", "bkt"))
          .withColumn("cos", dot(col("ev"), col("bv")) / (col("en") * col("bn")))
          .filter(col("cos") >= tau)
          .groupBy(col("vec_id"))
          // the same (batch, existing) pair can collide in several
          // tables/probes — countDistinct dedups inside the one
          // candidate-sized aggregate instead of a pre-join distinct
          .agg(countDistinct(col("ex_id")).as("n_near_dups"))
      }
    prep(newVecs).select(col("vec_id"))
      .join(near, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
        when(coalesce(col("n_near_dups"), lit(0L)) === 0L, lit(1L)).otherwise(lit(0L)).as("keep"))
  }

  /** DuckDB twin of [[embedIncremental]]: the brute batch × existing
    * cosine comparison with the identical IEEE sequence.
    */
  def sqlEmbedIncremental(batchMod: Long = 10, tau: Double = 0.35): String = {
    val dot = "list_sum(list_transform(range(1, len(b.v) + 1), i -> b.v[i] * e.v[i]))"
    s"""WITH p AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM p
       |  WHERE sqrt(list_sum(list_transform(v, x -> x * x))) > 0
       |), b AS (
       |  SELECT vec_id, v, nrm FROM n WHERE vec_id % $batchMod = 0
       |), e AS (
       |  SELECT vec_id, v, nrm FROM n WHERE vec_id % $batchMod <> 0
       |), nearp AS (
       |  SELECT b.vec_id, CAST(count(*) AS BIGINT) AS n_near_dups
       |  FROM b JOIN e ON ($dot) / (b.nrm * e.nrm) >= $tau
       |  GROUP BY 1
       |)
       |SELECT b.vec_id,
       |  CAST(coalesce(nearp.n_near_dups, 0) AS BIGINT) AS n_near_dups,
       |  CAST(CASE WHEN coalesce(nearp.n_near_dups, 0) = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM b LEFT JOIN nearp USING (vec_id)""".stripMargin
  }

  // ------------------------------------------------------------------
  // q188: SEMANTIC decontamination — the embedding modality of #48.
  // ------------------------------------------------------------------
  /** q188: semantic eval-set decontamination — the embedding-space
    * analog of the lexical [[decontaminate]] ladder: a train document
    * that PARAPHRASES an eval item shares no 8-gram (the lexical
    * screens are blind to it) but its embedding sits next to the eval
    * embedding; per train vector this emits how many eval vectors are
    * within cosine τ, the worst (max) cosine, and the keep verdict.
    * Eval slice is the [[decontaminate]] convention (vec_id % evalMod
    * == 0, the stand-in for a benchmark table).
    *
    * Scale shape — the [[decontaminateSpans]] broadcast argument, in
    * the embedding modality: eval BENCHMARKS are constant-sized (MBs
    * of vectors — they do not grow with the crawl), so the eval side
    * broadcasts and the screen is ONE map-side pass over the train
    * corpus scan, O(n_train · n_eval · d) work with ZERO shuffles —
    * linear in the corpus at fixed eval suite, never a corpus-side
    * hash exchange. (A corpus-scale "eval" side would instead take the
    * [[embedScreenAgainst]] LSH form — same verdict, bucketed
    * candidates; this operator IS that screen with the roles fixed by
    * the decontamination contract.) Exact arithmetic end to end ⇒
    * shares the brute DuckDB oracle hash-exactly (cosines 6-dp via
    * [[graft.Det.r]], the q_chunk_search discipline); zero-norm
    * vectors are excluded by the Similarity-family `nrm > 0`
    * convention (unrankable on both sides).
    */
  def decontaminateSemantic(
      embeddings: DataFrame, evalMod: Long = 50, tau: Double = 0.35,
      maxEvalRows: Long = 1000000L): DataFrame = {
    require(evalMod >= 2, "evalMod must carve an eval slice out of the corpus")
    // the broadcast below is justified by the constant-sized-benchmark
    // contract — but the mod-split CONVENTION makes the slice 1/evalMod
    // of the corpus, which grows with it. Guard the contract instead of
    // assuming it: past a broadcast-safe bound, fail loudly and point
    // at the bucketed form (a silent driver OOM is the alternative).
    // The count is a column-pruned scan of the slice's id column only.
    val nEval = embeddings.filter(pmod(col("vec_id"), lit(evalMod)) === 0)
      .select(col("vec_id")).count()
    require(nEval <= maxEvalRows,
      s"decontaminateSemantic broadcasts the eval slice, but it has $nEval rows " +
        s"(> $maxEvalRows): not an eval-suite-sized side — route it through " +
        "embedScreenAgainst(useLsh = true) with the roles swapped instead")
    val dot = graft.functions.GraftFunctions.vecDot _
    def prep(df: DataFrame): DataFrame = df
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .filter(col("nrm") > 0)
    val isEval = pmod(col("vec_id"), lit(evalMod)) === 0
    val eval = prep(embeddings.filter(isEval))
      .select(col("vec_id").as("ev_id"), col("v").as("ev"), col("nrm").as("en"))
    val train = prep(embeddings.filter(!isEval))
    val hits = train.join(broadcast(eval), lit(true))
      .withColumn("cos", dot(col("v"), col("ev")) / (col("nrm") * col("en")))
      .filter(col("cos") >= tau)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("cos")).as("mc"))
    train.select(col("vec_id"))
      .join(hits, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        Det.r(coalesce(col("mc"), lit(0.0)), 6).as("max_cos"),
        when(coalesce(col("n_eval_hits"), lit(0L)) === 0L, lit(1L))
          .otherwise(lit(0L)).as("keep"))
  }

  /** DuckDB twin of [[decontaminateSemantic]]: the same brute
    * train × eval cosine comparison with the identical IEEE sequence
    * (ordered list_sum = the vecDot accumulation order).
    */
  def sqlDecontaminateSemantic(evalMod: Long = 50, tau: Double = 0.35): String = {
    val dot = "list_sum(list_transform(range(1, len(t.v) + 1), i -> t.v[i] * e.v[i]))"
    s"""WITH dsp AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
       |), dsn AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM dsp
       |  WHERE sqrt(list_sum(list_transform(v, x -> x * x))) > 0
       |), e AS (
       |  SELECT vec_id, v, nrm FROM dsn WHERE vec_id % $evalMod = 0
       |), t AS (
       |  SELECT vec_id, v, nrm FROM dsn WHERE vec_id % $evalMod <> 0
       |), hits AS (
       |  SELECT t.vec_id, CAST(count(*) AS BIGINT) AS n_eval_hits,
       |    max(($dot) / (t.nrm * e.nrm)) AS mc
       |  FROM t JOIN e ON ($dot) / (t.nrm * e.nrm) >= $tau
       |  GROUP BY 1
       |)
       |SELECT t.vec_id,
       |  CAST(coalesce(hits.n_eval_hits, 0) AS BIGINT) AS n_eval_hits,
       |  floor(coalesce(hits.mc, 0.0) * 1000000.0 + 0.5) / 1000000.0 AS max_cos,
       |  CAST(CASE WHEN coalesce(hits.n_eval_hits, 0) = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM t LEFT JOIN hits USING (vec_id)""".stripMargin
  }

  /** The SCALE PATH for embeddingPairs' semantics: random-hyperplane
    * LSH blocking (one exact bucket per table on one side, that bucket
    * plus every 1-bit flip on the other) generates candidates through
    * equi-joins on (table, bucket); candidates are re-scored with the
    * EXACT cosine, so precision is 1 and only recall is approximate
    * (~0.5-0.7 near tau=0.35 on random vectors, rising toward 1 for
    * true near-duplicates). Never materializes n² — this is what
    * replaces the brute baseline at 100 TB.
    */
  def embeddingPairsLsh(
      embeddings: DataFrame,
      tau: Double = 0.35,
      tables: Int = 8,
      floorBits: Int = 8,
      dims: Int = -1): DataFrame = {
    // corpus-adaptive width (floorBits is the floor) — see [[lshBits]]
    val bits = lshBits(embeddings, floorBits)
    // both collision sides read the bucket projection — checkpoint so
    // the scan + hyperplane hashing run once
    val e = graft.sim.Similarity.bucketedCorpus(embeddings, tables, bits, dims).boundedCheckpoint()
    // SCORE AT THE JOIN (round 15): both sides carry their vector
    // through the bucket shuffle and every collision is scored +
    // τ-filtered INSIDE the join stage, so only true near-dup pairs
    // ever shuffle again (the final distinct over survivors). The
    // round-14 shape was candidates-then-verify: a candidate-scale
    // distinct over the raw collision pairs, then TWO corpus joins
    // re-attaching both vectors — the intermediate (pairs + first
    // vector) re-shuffled dims·8 bytes per CANDIDATE by vec_b, and
    // the collision-pair distinct was the sf3 ladder's biggest spill
    // source (57 s / exp3 2.25). Carrying vectors through the bucket
    // shuffle is the standard distributed LSH-join layout: shuffle
    // volume is n·tables·(1+bits)·dims — linear in the corpus at
    // bounded occupancy — duplicate collisions re-score (identical
    // IEEE arithmetic ⇒ identical 6-dp value, so the survivor
    // distinct collapses them exactly), and nothing candidate-scale
    // is ever aggregated or re-shuffled.
    val left = e.select(col("vec_id"), col("v"), col("nrm"),
      posexplode(col("buckets")).as(Seq("t", "bkt")))
    val right = e
      .select(col("vec_id").as("vid_b"), col("v").as("vb"), col("nrm").as("nb"),
        posexplode(col("buckets")).as(Seq("t", "qbkt")))
      .select(col("vid_b"), col("vb"), col("nb"), col("t"),
        explode(expr(
          s"transform(sequence(-1, ${bits - 1}), j -> if(j < 0, qbkt, qbkt ^ shiftleft(1L, j)))"))
          .as("bkt"))
    // NO join-strategy hint: both sides are corpus-scale and carry
    // vectors, so the safe strategy is the planner's spillable
    // sort-merge (a forced shuffle-hash build of the multi-probe side
    // is gigabytes of unspillable hash map — it OOMed the sf3 bench
    // under the session's pinned memo blocks)
    left.join(right, Seq("t", "bkt"))
      .filter(col("vec_id") < col("vid_b"))
      .withColumn("cos",
        graft.sim.Similarity.cosineExpr("v", "vb") / (col("nrm") * col("nb")))
      .filter(col("cos") >= tau)
      .select(col("vec_id").as("vec_a"), col("vid_b").as("vec_b"),
        Det.r(col("cos"), 6).as("cosine"))
      .distinct()
  }

  /** Memoized, materialized [[embeddingPairsLsh]] at its query
    * defaults — the [[embeddingPairsCached]] discipline for the SCALE
    * pair graph: q_dedup_embedding_lsh and the modality-agreement
    * audit consume the SAME blocked+rescored graph, so the bucket
    * join runs once per (corpus, tau) per session.
    */
  private val embPairsLshMemo =
    graft.Memo[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Double), DataFrame]()

  def embeddingPairsLshCached(embeddings: DataFrame, tau: Double = 0.35): DataFrame =
    embPairsLshMemo.getOrElseUpdate(embeddings.sparkSession,
      (embeddings.queryExecution.analyzed.canonicalized, tau))(
      embeddingPairsLsh(embeddings, tau).boundedCheckpoint())

  // ------------------------------------------------------------------
  // q86: SemDeDup-style semantic dedup end-to-end — embedding-cosine
  // pair graph -> connected components -> highest-quality DOCUMENT
  // survivor per semantic cluster (vec_id keys the corresponding
  // documents row; the survivor rule is the same quality-priority
  // max(struct) as q_dedup_best, so "semantically duplicated content
  // keeps its cleanest copy").
  //
  // The default (brute pair graph) is the oracle-checked correctness
  // baseline, exactly like q_dedup_embedding; `useLsh = true` swaps in
  // the hyperplane-LSH blocked pair generation with the identical
  // downstream composition — the 100 TB path, recall-gated against the
  // brute composition in DedupSpec (LSH pairs are exact-rescored, so
  // its pair set is a SUBSET of brute: clusters can only split, never
  // falsely merge).
  // ------------------------------------------------------------------
  def embedDedupBest(
      documents: DataFrame,
      embeddings: DataFrame,
      tau: Double = 0.35,
      useLsh: Boolean = false): DataFrame = {
    val pairs =
      (if (useLsh) embeddingPairsLshCached(embeddings, tau)
       else embeddingPairsCached(embeddings, tau))
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    survivorsFromLabels(documents, clustersCached(pairs))
  }

  /** Oracle: recursive transitive closure over the brute cosine pair
    * graph, then (quality DESC, doc_id ASC) rank inside each
    * component — the embedding twin of [[sqlBestSurvivors]].
    */
  def sqlEmbedDedupBest(tau: Double = 0.35): String = {
    val dot = "list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))"
    val cos = s"($dot) / (a.nrm * b.nrm)"
    s"""WITH RECURSIVE ed_e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
       |), ed_n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM ed_e
       |), ed_p AS (
       |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM ed_n a JOIN ed_n b ON a.vec_id < b.vec_id
       |  WHERE ($cos) >= $tau
       |), ed_g AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM ed_p
       |  UNION
       |  SELECT doc_b, doc_a FROM ed_p
       |), ed_reach(src, x) AS (
       |  SELECT src, src FROM (SELECT DISTINCT src FROM ed_g)
       |  UNION
       |  SELECT w.src, ed_g.dst FROM ed_reach w JOIN ed_g ON w.x = ed_g.src
       |), ed_labels AS (
       |  SELECT src AS doc_id, min(x) AS cluster_id FROM ed_reach GROUP BY 1
       |), ed_q AS (
       |  SELECT doc_id, quality_score FROM (${graft.text.Text.sqlQuality})
       |), ed_r AS (
       |  SELECT ed_labels.cluster_id, ed_labels.doc_id, ed_q.quality_score,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY quality_score DESC, doc_id ASC) AS rn,
       |    count(*) OVER (PARTITION BY cluster_id) AS n_docs
       |  FROM ed_labels JOIN ed_q USING (doc_id)
       |)
       |SELECT cluster_id, CAST(n_docs AS BIGINT) AS n_docs,
       |  doc_id AS keep_id, quality_score AS keep_score
       |FROM ed_r WHERE rn = 1""".stripMargin
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

  // ------------------------------------------------------------------
  // q150: SemDeDup — cluster-scoped semantic dedup (Abbas et al. 2023)
  // ------------------------------------------------------------------

  /** SemDeDup (Abbas et al. 2023): the PUBLISHED recipe for semantic
    * dedup at pretraining scale — k-means-cluster the embeddings, find
    * duplicate groups ONLY within each cluster (the paper's answer to
    * the all-pairs blowup: the quadratic is bounded by the cell, and
    * nCells grows with the corpus so cell size stays bounded), then
    * keep per duplicate group the item with the LOWEST cosine to its
    * cluster centroid (the paper's diversity-preserving survivor rule
    * — the opposite instinct to quality-keeps-best, which is why it's
    * worth having both this and [[embedDedupBest]]).
    *
    * Composition over the session's shared seams: the k-means model is
    * [[graft.sim.Similarity.kmeansCached]] and the cell table is
    * [[graft.sim.Similarity.assignCellsCached]] under the SAME memo
    * tags as q_ann_ivf_kmeans — the dedup and the ANN serve from ONE
    * trained index per session, exactly what a production pipeline
    * does. Duplicate groups are connected components ([[clusters]])
    * of the within-cell tau-graph, so every group lives inside one
    * cell by construction.
    *
    * Emits one row per RANKABLE vector — zero-norm vectors are
    * excluded at the family seam ([[graft.sim.Similarity.prepared]]'s
    * nrm > 0 filter, the round-12 convention: a zero vector has no
    * cosine to anything and appears in no index or verdict): (vec_id,
    * cell, cluster_id, n_docs, centroid_cos, keep). Model-dependent
    * (Lloyd float order) ⇒
    * rows-only gate; SemDedupSpec pins the survivor rule, the
    * one-keep-per-group invariant, within-cell grouping, dropped-doc
    * justification, and that every pair missed vs the global brute
    * graph is cross-cell (the approximation's exact boundary).
    */
  def semDedup(
      embeddings: DataFrame,
      nCells: Int = 16,
      iters: Int = 5,
      tau: Double = 0.35): DataFrame = {
    import graft.sim.Similarity
    val cells0 = semCells(embeddings, nCells)
    val cents = Similarity.kmeansCached(embeddings, cells0, iters)
      .select(col("cell"), col("cv"), lit(1.0).as("cn"))
    val cells = Similarity.assignCellsCached(embeddings, cents, s"kmeans:$cells0:$iters")
    semDedupFrom(embeddings, cents, cells, tau)
  }

  /** Corpus-ADAPTIVE cell count — the docstring's scaling argument
    * ("nCells grows with the corpus so cell size stays bounded") made
    * real: cells = max(floor, ⌈n / targetCellSize⌉), so the
    * within-cell all-pairs stage is O(n · targetCellSize) — LINEAR in
    * the corpus — instead of O(n²/floor). Below floor·targetCellSize
    * vectors (every local test scale up to sf0.1) the derived count
    * equals the ANN family's 16 and the session SHARES one trained
    * index with q_ann_ivf_kmeans; past it, semantic dedup fits its own
    * right-sized index (the fit's one extra Lloyd run is O(n·cells)
    * scan-side arms — at true production scale you'd train those
    * centroids on a bounded sample, the faiss discipline the PQ
    * codebooks already follow). The corpus count is memoized per plan
    * (one cheap parquet-metadata count per session, the *Cached seam
    * discipline).
    */
  private val semNMemo =
    graft.Memo[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long]()

  private[graft] def semCells(
      embeddings: DataFrame, floorCells: Int, targetCellSize: Long = 1024L): Int = {
    val n = semNMemo.getOrElseUpdate(embeddings.sparkSession,
      embeddings.queryExecution.analyzed.canonicalized)(embeddings.count())
    math.max(floorCells, ((n + targetCellSize - 1L) / targetCellSize).toInt)
  }

  /** Corpus-ADAPTIVE hyperplane count for the LSH blocking — the
    * [[semCells]] discipline on the bucket geometry: at a FIXED bit
    * width the per-bucket occupancy grows linearly with the corpus,
    * so the banded candidate mass is quadratic (measured: the 8-bit
    * default carried ~0.7B candidate rows at sf1 and ~6B at sf3,
    * where the distinct() aggregation died in SPILL_OUT_OF_MEMORY).
    * bits = max(floor, ⌈log2(n / targetBucket)⌉) bounds occupancy at
    * ~targetBucket, making candidates O(n · tables · probes ·
    * targetBucket) — linear. The cost is recall at the LOW-cosine end
    * (collision probability per table is p^bits, p = 1 − θ/π): true
    * near-duplicates (cos ≳ 0.9, p ≳ 0.9) keep high recall at any
    * realistic width — and near-dup discovery is the operator's
    * contract — while marginal tau≈0.35 pairs degrade; the brute
    * baseline (q_dedup_embedding) and the cluster-scoped semdedup
    * remain the exact/recall-priority paths. Below floor-width
    * corpora (every spec scale) the derived width equals the floor,
    * so the recall gate pins unchanged behavior.
    */
  /** Corpus-adaptive hyperplane count. Candidate volume for the pair
    * emitters is n · tables · probes · OCCUPANCY with occupancy =
    * n / 2^bits, so the target occupancy is the direct cost knob: the
    * round-13 value (64) left the sf3 corpus emitting ~570M candidate
    * rows through the bucket join (266 s); 8 cuts that ~6× while the
    * collision arithmetic keeps true near-dup recall high (cos 0.9 ⇒
    * per-bit agreement 0.857; at the sf3-derived 15 bits, P[Hamming≤1,
    * one table] ≈ 0.35 ⇒ ≈ 0.97 across 8 OR-tables — and the exact
    * re-score keeps precision 1 regardless). Every gate scale
    * (n ≤ floor·target) stays on floorBits, byte-identical.
    */
  private[graft] def lshBits(
      embeddings: DataFrame, floorBits: Int, targetBucket: Long = 8L): Int = {
    val n = semNMemo.getOrElseUpdate(embeddings.sparkSession,
      embeddings.queryExecution.analyzed.canonicalized)(embeddings.count())
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(24, math.max(floorBits, needed))
  }

  /** Session-scoped registry of persisted k-means IVF index dirs per
    * corpus (the phashIndexDirCached discipline) — the disk-served
    * semantic dedup reads ONE persisted index per session.
    */
  private val semIdxMemo =
    graft.Memo[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String]()

  private[graft] def semIndexDirCached(
      embeddings: DataFrame, nCells: Int, iters: Int): String =
    semIdxMemo.getOrElseUpdate(embeddings.sparkSession,
      embeddings.queryExecution.analyzed.canonicalized)({
      val dir = Files.createTempDirectory("graft_sem_ivf_").toString
      graft.sim.IvfIndex.write(embeddings, dir, nCells, kmeans = true, iters)
      dir
    })

  /** q165: [[semDedup]] served from the PERSISTED k-means IVF index
    * (the layout q_ann_ivf_kmeans also persists through PqIndexTool
    * --family ivf_kmeans): centroids round-trip bit-exact through the
    * index JSON and the assignment parquet IS the in-session cell
    * table materialized, so the disk path is row-equal to the
    * in-session dedup (pinned in SemDedupSpec). The production shape:
    * the cluster index is built once and BOTH the ANN serving path
    * and the semantic dedup read it from disk.
    */
  def semDedupDisk(
      embeddings: DataFrame,
      nCells: Int = 16,
      iters: Int = 5,
      tau: Double = 0.35): DataFrame = {
    val dir = semIndexDirCached(embeddings, semCells(embeddings, nCells), iters)
    val (cents, assigned) = graft.sim.IvfIndex.read(embeddings.sparkSession, dir)
    semDedupFrom(embeddings, cents, assigned, tau)
  }

  /** Rows above which a trained cell is SALTED into sub-cells for the
    * within-cell pair stage. k-means guarantees nothing about balance:
    * on the sf3 chunk corpus one cell absorbed a corpus-scale share
    * and its self-join funneled ~10^9 candidate evaluations into ONE
    * task (observed: a single thread spilling an UnsafeExternalSorter
    * for 20+ min while 31 sat idle). Salting by vec_id mod
    * ⌈rows/cap⌉ bounds every join partition at ~cap rows; the cost is
    * the cells approximation getting coarser INSIDE oversized cells
    * only (pairs across sub-cells of one salted cell are not
    * examined — the same accepted boundary as cross-cell pairs, and
    * only above the cap, so every gate/spec scale is byte-identical).
    */
  private val SemMaxCellRows = 4096L

  private def semDedupFrom(
      embeddings: DataFrame, cents: DataFrame, cells: DataFrame,
      tau: Double): DataFrame = {
    import graft.sim.Similarity
    // prepared() excludes zero-norm vectors at the family seam (the
    // round-12 convention: unrankable on every path), so every nrm
    // here is strictly positive — no guard on the division
    val scored = Similarity.prepared(embeddings)
      .join(cells, "vec_id")
      .join(broadcast(cents), "cell")
      .select(col("vec_id"), col("cell"), col("v"), col("nrm"),
        Det.r(graft.functions.GraftFunctions.vecDot(col("v"), col("cv")) /
          (col("nrm") * col("cn")), 6).as("centroid_cos"))
      .boundedCheckpoint()
    val cellSizes = scored.groupBy(col("cell"))
      .agg(count(lit(1)).as("cell_rows"))
    val salted = scored.join(broadcast(cellSizes), "cell")
      .withColumn("splits", greatest(lit(1L),
        ceil(col("cell_rows").cast("double") / lit(SemMaxCellRows.toDouble))
          .cast("long")))
      .withColumn("subcell", pmod(col("vec_id"), col("splits")))
    val l = salted.select(col("cell"), col("subcell"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("nrm").as("na"))
    val r = salted.select(col("cell"), col("subcell"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    // pairs keep their (cell, subcell) group key: the emitter is an
    // equi-join on it, so a component can never span groups and the
    // labels come from the ONE-PASS grouped union-find instead of
    // [[clusters]]' iterative join rounds (measured: the label loop
    // was 3.1 s of the 3.7 s per-invocation cost at bench scale)
    val pairs = l.join(r, Seq("cell", "subcell"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(graft.functions.GraftFunctions.vecDot(col("va"), col("vb")) /
        (col("na") * col("nb")) >= tau)
      .select(col("cell"), col("subcell"),
        col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val labels = groupedComponents(pairs, Seq("cell", "subcell"))
      .withColumnRenamed("doc_id", "vec_id")
    val wN = Window.partitionBy(col("cluster_id"))
    val wR = Window.partitionBy(col("cluster_id"))
      .orderBy(col("centroid_cos").asc, col("vec_id").asc)
    scored.join(labels, Seq("vec_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("vec_id")))
      .select(col("vec_id"), col("cell"), col("cluster_id"), col("centroid_cos"))
      .withColumn("n_docs", count(lit(1)).over(wN))
      .withColumn("keep", row_number().over(wR) === 1)
      .select(col("vec_id"), col("cell"), col("cluster_id"),
        col("n_docs").cast("long").as("n_docs"), col("centroid_cos"), col("keep"))
  }

  // ------------------------------------------------------------------
  // q130: cross-MODALITY dedup agreement — does semantic dedup add
  // anything over lexical on THIS corpus?
  // ------------------------------------------------------------------
  /** One-row agreement audit between the lexical (n-gram Jaccard ≥
    * tauText) and semantic (embedding cosine ≥ tauCos) near-dup pair
    * graphs: (n_text_pairs, n_embed_pairs, n_both, pair_jaccard). The
    * artifact behind the "do we need SemDeDup here" decision: high
    * overlap says the embedding pass mostly re-finds lexical dups
    * (run the cheap one), low overlap with a large embed-only count
    * says paraphrase-level duplication that shingles cannot see.
    * vec_id keys the documents row (the [[embedDedupBest]] contract),
    * so the two graphs share one id space.
    *
    * PURE COMPOSITION off two memoized pair seams ([[pairsCached]] +
    * an embedding pair graph — alongside the dedup family this adds
    * ZERO corpus scans): both graphs are duplicates-sized, the
    * intersection is one equi-join on the ordered pair key (both emit
    * a<b), and the three counts combine via [[Det.attachScalar]]
    * broadcast joins. pair_jaccard divides two exact longs once, 6 dp.
    *
    * The embedding side defaults to the LSH pair graph
    * ([[embeddingPairsLshCached]] — the 100 TB path, since round 15;
    * the round-14 ladder's worst exponent was this audit inheriting
    * the labeled n² brute build). LSH candidates are exact-rescored,
    * so its pair set is a SUBSET of brute: n_embed_pairs and n_both
    * are recall-bounded underestimates, never overcounts — DedupSpec
    * pins the subset relation and a recall floor against the brute
    * composition (`useLsh = false`, which keeps the gate-only exact
    * form available and remains the DuckDB-twin-expressible shape).
    */
  def modalityAgreement(
      documents: DataFrame, embeddings: DataFrame,
      tauText: Double = 0.5, tauCos: Double = 0.35,
      useLsh: Boolean = true): DataFrame = {
    val t = pairsCached(documents, tauText).select(col("doc_a"), col("doc_b"))
    val e = (if (useLsh) embeddingPairsLshCached(embeddings, tauCos)
             else embeddingPairsCached(embeddings, tauCos))
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val both = t.join(e, Seq("doc_a", "doc_b"), "left_semi")
    val counts = Det.attachScalar(
      Det.attachScalar(t.agg(count(lit(1)).as("n_text_pairs")),
        e.agg(count(lit(1)).as("n_embed_pairs"))),
      both.agg(count(lit(1)).as("n_both")))
    counts.select(col("n_text_pairs"), col("n_embed_pairs"), col("n_both"),
      when(col("n_text_pairs") + col("n_embed_pairs") - col("n_both") > 0,
        Det.r(col("n_both").cast("double") /
          (col("n_text_pairs") + col("n_embed_pairs") - col("n_both")).cast("double"), 6))
        .otherwise(lit(0.0)).as("pair_jaccard"))
  }

  /** DuckDB twin of [[modalityAgreement]] at its QUERY DEFAULTS
    * (useLsh = true) — restores the hash gate the round-15
    * re-declaration dropped: the hyperplane-LSH blocking is
    * deterministic integer hashing, so the oracle replays it exactly.
    *
    *   - bits: [[lshBits]]'s min(24, max(8, ceil(log2(n/8)))) from
    *     count(embeddings) (the gated SFs sit at the floor, so the
    *     ln-boundary ulp risk is theoretical there);
    *   - planes: `XXH64.hashInt(t*1000003 + b*1009 + j, 42)` replayed
    *     in pure SQL over HUGEINT — 64-bit wrapping multiply as a
    *     32×64 split, rotl as shift-halves added (disjoint bits), the
    *     final signed reinterpretation, `/ 2^63` — verified term-equal
    *     to Spark's XXH64 on reference values;
    *   - buckets: sign of the j-ORDERED dot (list order = the
    *     HyperplaneBuckets accumulation order), bit (bits-1-b);
    *   - candidates: exact bucket × (exact + all 1-bit flips), scored
    *     with the ordered-dot cosine ≥ tauCos, DISTINCT pairs.
    *
    * Plane generation caps: 24 bits (lshBits' own cap) and 8192 dims
    * (range() in FROM needs constants; raise alongside any corpus with
    * wider embeddings).
    */
  def sqlModalityAgreementLsh(
      tauText: Double = 0.5, tauCos: Double = 0.35): String = {
    val (ngramCtes, ngramSelect) = sqlNgramCtes(tauText)
    // XXH64 primes; H0 = seed 42 + PRIME64_5 + 4 (the int-input path)
    val P1 = java.lang.Long.toUnsignedString(0x9E3779B185EBCA87L)
    val P2 = java.lang.Long.toUnsignedString(0xC2B2AE3D27D4EB4FL)
    val P3 = java.lang.Long.toUnsignedString(0x165667B19E3779F9L)
    val H0 = java.lang.Long.toUnsignedString(42L + 0x27D4EB2F165667C5L + 4L)
    val M64 = "18446744073709551616"
    def mul64(a: String, b: String) =
      s"( (($a) // 4294967296 * $b) % 4294967296 * 4294967296 + (($a) % 4294967296) * $b ) % $M64"
    val dotAB =
      "list_sum(list_transform(range(1, len(la.v) + 1), k -> la.v[k] * rb.v[k]))"
    s"""WITH $ngramCtes, ma_t AS (
       |  SELECT doc_a, doc_b FROM ($ngramSelect)
       |), ma2_n AS (SELECT count(*) AS n FROM embeddings),
       |ma2_bits AS (SELECT least(24, greatest(8,
       |    CAST(ceil(ln(greatest(1.0, CAST(n AS DOUBLE) / 8.0)) / ln(2.0)) AS INT))) AS bits FROM ma2_n),
       |ma2_p AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |ma2_dim AS (SELECT coalesce((SELECT d FROM (
       |    SELECT len(v) AS d, count(*) AS cnt FROM ma2_p WHERE len(v) > 0 GROUP BY 1)
       |    ORDER BY cnt DESC, d ASC LIMIT 1), 0) AS d),
       |ma2_prep AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |  FROM ma2_p, ma2_dim
       |  WHERE len(v) = d AND len(list_filter(v, x -> x IS NULL)) = 0
       |    AND sqrt(list_sum(list_transform(v, x -> x * x))) > 0),
       |ma2_h0 AS (
       |  SELECT t, b, j, CAST($H0 AS HUGEINT) AS h0,
       |    CAST(t * 1000003 + b * 1009 + j AS HUGEINT) AS k1
       |  FROM range(0, 8) tt(t), range(0, 24) bb(b), range(0, 8192) jj(j), ma2_bits, ma2_dim
       |  WHERE b < bits AND j < d),
       |ma2_h1 AS (SELECT t, b, j, xor(h0, ${mul64("k1", P1)}) AS h1 FROM ma2_h0),
       |ma2_h2 AS (SELECT t, b, j, ((h1 * 8388608) % $M64 + h1 // 2199023255552) AS hr FROM ma2_h1),
       |ma2_h3 AS (SELECT t, b, j, (${mul64("hr", P2)} + $P3) % $M64 AS h2 FROM ma2_h2),
       |ma2_f1 AS (SELECT t, b, j, xor(h2, h2 // 8589934592) AS fa FROM ma2_h3),
       |ma2_f2 AS (SELECT t, b, j, ${mul64("fa", P2)} AS fb FROM ma2_f1),
       |ma2_f3 AS (SELECT t, b, j, xor(fb, fb // 536870912) AS fc FROM ma2_f2),
       |ma2_f4 AS (SELECT t, b, j, ${mul64("fc", P3)} AS fd FROM ma2_f3),
       |ma2_f5 AS (SELECT t, b, j, xor(fd, fd // 4294967296) AS u FROM ma2_f4),
       |ma2_planes AS (
       |  SELECT t, b, list(CAST(CASE WHEN u >= 9223372036854775808 THEN u - $M64 ELSE u END AS DOUBLE)
       |                    / 9.223372036854776e18 ORDER BY j) AS pl
       |  FROM ma2_f5 GROUP BY t, b),
       |ma2_bkt AS (
       |  SELECT e.vec_id, p.t,
       |    sum(CASE WHEN list_sum(list_transform(range(1, len(e.v) + 1), k -> e.v[k] * p.pl[k])) > 0.0
       |        THEN (CAST(1 AS BIGINT) << (bits - 1 - CAST(p.b AS INT))) ELSE 0 END) AS bkt
       |  FROM ma2_prep e, ma2_planes p, ma2_bits
       |  GROUP BY 1, 2),
       |ma2_right AS (
       |  SELECT b.vec_id, b.t,
       |    CASE WHEN f.j < 0 THEN b.bkt ELSE xor(b.bkt, CAST(1 AS BIGINT) << CAST(f.j AS INT)) END AS probe
       |  FROM ma2_bkt b, range(-1, 24) f(j), ma2_bits WHERE f.j < bits),
       |ma_e AS (
       |  SELECT DISTINCT l.vec_id AS doc_a, r.vec_id AS doc_b
       |  FROM ma2_bkt l
       |  JOIN ma2_right r ON l.t = r.t AND l.bkt = r.probe AND l.vec_id < r.vec_id
       |  JOIN ma2_prep la ON la.vec_id = l.vec_id
       |  JOIN ma2_prep rb ON rb.vec_id = r.vec_id
       |  WHERE ($dotAB) / (la.nrm * rb.nrm) >= $tauCos),
       |ma_b AS (
       |  SELECT count(*) AS n_both FROM ma_t JOIN ma_e USING (doc_a, doc_b)
       |)
       |SELECT CAST((SELECT count(*) FROM ma_t) AS BIGINT) AS n_text_pairs,
       |  CAST((SELECT count(*) FROM ma_e) AS BIGINT) AS n_embed_pairs,
       |  CAST(ma_b.n_both AS BIGINT) AS n_both,
       |  CASE WHEN (SELECT count(*) FROM ma_t) + (SELECT count(*) FROM ma_e) - ma_b.n_both > 0
       |       THEN floor(CAST(ma_b.n_both AS DOUBLE)
       |         / CAST((SELECT count(*) FROM ma_t) + (SELECT count(*) FROM ma_e) - ma_b.n_both AS DOUBLE)
       |         * 1000000.0 + 0.5) / 1000000.0
       |       ELSE 0.0 END AS pair_jaccard
       |FROM ma_b""".stripMargin
  }

  /** DuckDB twin of [[modalityAgreement]] with the BRUTE embedding
    * side (useLsh = false): the two pair oracles composed as CTEs,
    * intersected on the ordered pair key — the spec-scale gate for the
    * LSH twin's subset relation.
    */
  def sqlModalityAgreement(tauText: Double = 0.5, tauCos: Double = 0.35): String = {
    val (ngramCtes, ngramSelect) = sqlNgramCtes(tauText)
    val dot = "list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))"
    val cos = s"($dot) / (a.nrm * b.nrm)"
    s"""WITH $ngramCtes, ma_t AS (
       |  SELECT doc_a, doc_b FROM ($ngramSelect)
       |), ma_e0 AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
       |), ma_en AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM ma_e0
       |), ma_e AS (
       |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM ma_en a JOIN ma_en b ON a.vec_id < b.vec_id
       |  WHERE ($cos) >= $tauCos
       |), ma_b AS (
       |  SELECT count(*) AS n_both FROM ma_t JOIN ma_e USING (doc_a, doc_b)
       |)
       |SELECT CAST((SELECT count(*) FROM ma_t) AS BIGINT) AS n_text_pairs,
       |  CAST((SELECT count(*) FROM ma_e) AS BIGINT) AS n_embed_pairs,
       |  CAST(ma_b.n_both AS BIGINT) AS n_both,
       |  CASE WHEN (SELECT count(*) FROM ma_t) + (SELECT count(*) FROM ma_e) - ma_b.n_both > 0
       |       THEN floor(CAST(ma_b.n_both AS DOUBLE)
       |         / CAST((SELECT count(*) FROM ma_t) + (SELECT count(*) FROM ma_e) - ma_b.n_both AS DOUBLE)
       |         * 1000000.0 + 0.5) / 1000000.0
       |       ELSE 0.0 END AS pair_jaccard
       |FROM ma_b""".stripMargin
  }

  // ------------------------------------------------------------------
  // q89: exact duplicated-SPAN detection (the Lee et al. 2022
  // "Deduplicating Training Data Makes Language Models Better" exact-
  // substring modality — the gap between exact-doc dedup (#22) and
  // near-doc dedup (#23-26): two mostly-different documents sharing
  // one long verbatim passage, which document-level Jaccard never
  // reaches and which inflates memorization).
  //
  // Definition: a k-token window (stride 1) is DUPLICATED iff the
  // identical token sequence occurs in >= 2 distinct documents. Per
  // document: total windows, duplicated-window positions, and the
  // duplicated fraction — the per-doc signal a span-dedup/filter pass
  // cuts on. (Within-doc repetition is deliberately excluded — that
  // is q_text_repetition's job.)
  //
  // Scale shape: the reference implementation of this idea is a
  // single-node suffix array; the distributed form is hash grouping —
  // windows reduce to 8-byte xxhash64 values AT THE SCAN, so the two
  // shuffles (by window hash for the cross-doc count + the count-back
  // join, then by doc_id for the per-doc rollup) carry ~tokens x 8
  // bytes, never text. The window->count join reuses the hash
  // partitioning of the aggregate side. The window table feeds BOTH
  // the per-window count and the probe/cut branch — and all THREE
  // span queries (report / scrub / span report) need the identical
  // table — so it is localCheckpoint'd AND memoized per (corpus, k)
  // via winsCached (the pairsCached discipline): the tokenize+explode
  // scan — the family's most expensive pass — runs ONCE per corpus,
  // and every consumer reads the materialized 8-byte-hash blocks.
  // ------------------------------------------------------------------
  /** The (doc_id, pos, h) k-token stride-1 window table all three span
    * queries derive from: pos is the 1-based window start, h the
    * xxhash64 of the space-joined window. Documents shorter than k
    * tokens carry no windows.
    */
  private[graft] def spanWindows(documents: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"span window must be >= 2 tokens, got $k")
    spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(toks) - ${k - 1}), i -> xxhash64(concat_ws(' ', slice(toks, i, $k))))"))
        .as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))
  }

  /** Memoized, materialized [[spanWindows]] — a curation pass that
    * runs the span REPORT and the span SCRUB (the normal workflow)
    * would otherwise pay the corpus's most expensive scan once per
    * query; with the memo it pays it once per (corpus, k) per
    * session. Same key/materialization discipline as [[pairsCached]].
    */
  private val winsMemo =
    graft.Memo[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int), DataFrame]()

  def winsCached(documents: DataFrame, k: Int = 10): DataFrame =
    winsMemo.getOrElseUpdate(documents.sparkSession,
      (documents.queryExecution.analyzed.canonicalized, k))(
      spanWindows(documents, k).boundedCheckpoint())

  /** Force every memoized derivation the dedup family shares — the
    * shingle sets, minhash signatures, simhash fingerprints, the exact
    * pair graph, the span-window table, and the embedding pair graph —
    * at the family's default operating parameters (the same memo keys
    * the queries read), returning (seam, seconds) per build. The bench
    * calls this so shared-scan cost lands in its own `build` line item
    * instead of inflating whichever consumer runs first.
    */
  def prewarm(documents: DataFrame, embeddings: DataFrame): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      out += name -> ((System.nanoTime() - t0) / 1e9)
    }
    timed("dedup_shingle_sets") { setsCached(documents); () }
    timed("dedup_minhash_sigs") { sigsCached(documents); () }
    timed("dedup_simhash_table") { simhashCached(documents); () }
    timed("dedup_ngram_pairs") { pairsCached(documents); () }
    // the ngram graph's component LABELS — five driver-gated queries
    // consume them (see clustersCached); the construction mirrors
    // clustersQuery's exactly so the memo key matches
    timed("dedup_ngram_clusters") {
      clustersCached(pairsCached(documents).select(col("doc_a"), col("doc_b"))); ()
    }
    timed("dedup_containment_pairs") { containmentCached(documents); () }
    timed("dedup_span_windows") { winsCached(documents); () }
    timed("dedup_embedding_pairs") { embeddingPairsCached(embeddings); () }
    timed("dedup_shingle_index") {
      shingleIndexDirCached(documents.filter(!(pmod(col("doc_id"), lit(10L)) === 0))); ()
    }
    // the ADAPTIVE cell count — semDedupDisk's actual memo key; the
    // raw floor (16) warmed a different index above the floor regime,
    // so at sf1+ every semdedup query re-fit its own k-means inside
    // its timing (memo_misses named it)
    timed("dedup_sem_ivf_index") {
      semIndexDirCached(embeddings, semCells(embeddings, 16), 5); ()
    }
    timed("dedup_sem_kmeans") { semPrewarm(embeddings); () }
    // The round-15 screen-family memos — the exact entries the
    // mod-split screen queries share (q_dedup_incremental,
    // q_contained_incremental, q_ingest_decision read ONE in-session
    // counts aggregate; the _disk twins one postings-served aggregate;
    // q_dedup_batch + both ingest decisions one self-screen aggregate).
    // Without these the FIRST family member paid the shared build
    // inline (memo_misses named q_contained_incremental with 2,
    // q_dedup_batch and q_dedup_incremental_disk with 1 each).
    // the seam helpers ARE the query-side constructions (storeCountsSeam
    // / diskCountsSeam / selfCountsSeam), so the memo keys match
    // structurally — drift in a query's construction cannot silently
    // orphan a prewarm entry
    timed("dedup_screen_counts") { storeCountsSeam(documents); () }
    timed("dedup_screen_counts_disk") { diskCountsSeam(documents); () }
    timed("dedup_self_counts") { selfCountsSeam(documents); () }
    // the memoized LSH pair graph (q_dedup_embedding_lsh + the
    // modality-agreement audit) and the store-slice count behind the
    // adaptive LSH width (q_embed_incremental_lsh)
    timed("dedup_embedding_pairs_lsh") { embeddingPairsLshCached(embeddings); () }
    timed("dedup_store_vec_count") {
      lshBits(embeddings.filter(!(pmod(col("vec_id"), lit(10L)) === 0)), 8); ()
    }
    out.toSeq
  }

  /** Warm the IN-SESSION semantic-dedup k-means seams for `embeddings`
    * at the family defaults — the exact memo keys [[semDedup]] reads
    * (corpus count, trained centroids at the ADAPTIVE cell count, cell
    * assignment). Callers with a derived vector table (the chunk-level
    * semdedup) pass it here so the fit lands in the bench's build line
    * instead of the first consumer's timing.
    */
  def semPrewarm(embeddings: DataFrame, nCells: Int = 16, iters: Int = 5): Unit = {
    import graft.sim.Similarity
    val cells0 = semCells(embeddings, nCells)
    val cents = Similarity.kmeansCached(embeddings, cells0, iters)
      .select(col("cell"), col("cv"), lit(1.0).as("cn"))
    Similarity.assignCellsCached(embeddings, cents, s"kmeans:$cells0:$iters")
    ()
  }

  /** Per-document duplicated-span report: (doc_id, n_windows,
    * n_dup_windows, dup_fraction) over k-token stride-1 windows;
    * documents with fewer than k tokens carry no windows and are
    * excluded. Counts are over window HASHES on the Spark side and
    * window STRINGS in the oracle — equal modulo 64-bit collisions
    * (the [[hashedShingleSets]] argument).
    */
  def dupSpans(documents: DataFrame, k: Int = 10): DataFrame = {
    val wins = winsCached(documents, k)
    val perWindow = wins
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    wins
      .join(perWindow, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        Det.r(col("n_dup_windows").cast("double") / col("n_windows").cast("double"), 6)
          .as("dup_fraction"))
  }

  /** The ACTION for [[dupSpans]] (the report): rewrite each document
    * with its cross-doc duplicated spans REMOVED, keeping the copy in
    * the LOWEST doc_id that contains each window (so exactly one
    * verbatim copy of every duplicated passage survives corpus-wide —
    * dedup, not destruction; the Lee et al. remove-all-but-one rule
    * with a deterministic owner).
    *
    * A token index is cut iff some duplicated non-owner window covers
    * it: the per-doc cut set is built SCAN-SIDE from the collected dup
    * positions (`flatten(transform(ps, p -> sequence(p, p+k-1)))`) —
    * the expansion happens on the ≤windows-per-doc array inside the
    * row, never as exploded shuffle rows, so the wire carries one
    * position per dup window, not k. Rebuilt text is SPACE-JOINED
    * tokens (tokenizer-normalized, identical in both engines); the
    * gate compares md5 of the rebuilt text plus the cut counts.
    * Membership is array_contains over the per-doc cut array — cost
    * n_tokens·|cut| per row, bounded by document length, independent
    * of corpus size.
    */
  def dupSpanScrub(documents: DataFrame, k: Int = 10): DataFrame = {
    val wins = winsCached(documents, k)
    val perWindow = wins
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), min(col("doc_id")).as("owner"))
    // `cut` is computed on THIS side of the join (one evaluation per
    // cut document); downstream it is a join-output ATTRIBUTE, so the
    // per-token membership lambda cannot inline and re-evaluate the
    // flatten/distinct expression (the collapsed-projection trap
    // caught on decontaminateFrac)
    val cutLists = wins
      .join(perWindow.filter(col("n_docs") >= 2), Seq("h"))
      .filter(col("doc_id") =!= col("owner"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("ps"))
      .select(col("doc_id"),
        expr(s"array_distinct(flatten(transform(ps, p -> sequence(p, p + ${k - 1}))))").as("cut0"))
    // spread BEFORE the join: cutLists is duplicates-sized and
    // broadcasts, so without it the tokenize+scrub transform below
    // runs on the raw scan's task layout
    spread(documents)
      .join(cutLists, Seq("doc_id"), "left")
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("cut", coalesce(col("cut0"), expr("array()")))
      .withColumn("kept",
        expr("filter(transform(toks, (t, i) -> if(array_contains(cut, i + 1), null, t)), x -> x IS NOT NULL)"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("cut")).cast("long").as("n_cut"),
        md5(concat_ws(" ", col("kept")).cast("binary")).as("clean_md5"))
  }

  /** The INSPECTION artifact for [[dupSpans]]: merged MAXIMAL
    * duplicated spans per document — one row per (doc_id, span_start,
    * span_len) where the span is a maximal run of token positions
    * covered by cross-doc duplicated k-token windows (owner included:
    * the report shows every document containing the passage; the
    * remove-all-but-one policy is [[dupSpanScrub]]'s job). A reviewer
    * reads THIS — "tokens 17..96 of doc 42 are verbatim elsewhere" —
    * not 70 overlapping window rows.
    *
    * Scale shape: identical keyed shuffles to [[dupSpans]] (window
    * hash count + per-doc rollup); the merge itself is a SCAN-SIDE
    * fold over each document's sorted dup positions (windows share
    * length k, so coverage ends ascend with starts and a span breaks
    * exactly when the next start exceeds last_end + 1) — no extra
    * shuffle, no per-token row explosion. The DuckDB twin uses the
    * independent gaps-and-islands formulation (explode covered
    * indexes, idx − row_number() islands), so the gate cross-checks
    * two different span-merge algorithms.
    */
  def dupSpanReport(documents: DataFrame, k: Int = 10): DataFrame = {
    val wins = winsCached(documents, k)
    val perWindow = wins
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    val spanFold =
      s"""aggregate(
         |  ps,
         |  cast(array() as array<struct<st:int,en:int>>),
         |  (acc, p) -> if(size(acc) > 0 and p <= element_at(acc, -1).en + 1,
         |    concat(slice(acc, 1, size(acc) - 1),
         |      array(named_struct('st', element_at(acc, -1).st, 'en', p + ${k - 1}))),
         |    concat(acc, array(named_struct('st', p, 'en', p + ${k - 1})))))""".stripMargin
    wins
      .join(perWindow.filter(col("n_docs") >= 2), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("ps"))
      // spans computed BEFORE the explode so the fold runs once per
      // document, not once per emitted span (the CollapseProject trap)
      .select(col("doc_id"), expr(spanFold).as("spans"))
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"),
        col("s.st").cast("long").as("span_start"),
        (col("s.en") - col("s.st") + 1).cast("long").as("span_len"))
  }

  def sqlDupSpanReport(k: Int = 10): String = {
    val toks = graft.text.Text.sqlTokens("text")
    s"""WITH t AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), w0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - ${k - 1} + 1),
       |    i -> {'pos': i, 'h': hash(array_to_string(toks[i:i + ${k - 1}], ' '))})) AS s
       |  FROM t WHERE len(toks) >= $k
       |), w AS (
       |  SELECT doc_id, s.pos AS pos, s.h AS h FROM w0
       |), pw AS (
       |  SELECT h, count(DISTINCT doc_id) AS n_docs FROM w GROUP BY 1
       |), d AS (
       |  SELECT DISTINCT w.doc_id, w.pos FROM w JOIN pw USING (h) WHERE pw.n_docs >= 2
       |), cov AS (
       |  SELECT DISTINCT doc_id, unnest(range(pos, pos + $k)) AS idx FROM d
       |), isl AS (
       |  SELECT doc_id, idx,
       |    idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS grp
       |  FROM cov
       |)
       |SELECT doc_id, CAST(min(idx) AS BIGINT) AS span_start,
       |  CAST(count(*) AS BIGINT) AS span_len
       |FROM isl GROUP BY doc_id, grp""".stripMargin
  }

  def sqlDupSpanScrub(k: Int = 10): String = {
    val toks = graft.text.Text.sqlTokens("text")
    s"""WITH t AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), w0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - ${k - 1} + 1),
       |    i -> {'pos': i, 'h': hash(array_to_string(toks[i:i + ${k - 1}], ' '))})) AS s
       |  FROM t WHERE len(toks) >= $k
       |), w AS (
       |  SELECT doc_id, s.pos AS pos, s.h AS h FROM w0
       |), pw AS (
       |  SELECT h, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS owner FROM w GROUP BY 1
       |), cl AS (
       |  SELECT w.doc_id,
       |    list_distinct(flatten(list_transform(list(DISTINCT w.pos), p -> range(p, p + $k)))) AS cut0
       |  FROM w JOIN pw USING (h)
       |  WHERE pw.n_docs >= 2 AND w.doc_id <> pw.owner
       |  GROUP BY 1
       |), x AS (
       |  SELECT t.doc_id, t.toks, COALESCE(cl.cut0, []) AS cut
       |  FROM t LEFT JOIN cl USING (doc_id)
       |)
       |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(cut) AS BIGINT) AS n_cut,
       |  -- COALESCE: DuckDB array_to_string([]) is NULL where Spark's
       |  -- concat_ws of an empty array is '' (fully-scrubbed docs)
       |  md5(COALESCE(array_to_string(
       |    list_filter(list_transform(range(1, len(toks) + 1),
       |      i -> CASE WHEN list_contains(cut, i) THEN NULL ELSE toks[i] END),
       |      x -> x IS NOT NULL), ' '), '')) AS clean_md5
       |FROM x""".stripMargin
  }

  def sqlDupSpans(k: Int = 10): String = {
    val toks = graft.text.Text.sqlTokens("text")
    s"""WITH t AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), w AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - ${k - 1} + 1),
       |    i -> hash(array_to_string(toks[i:i + ${k - 1}], ' ')))) AS h
       |  FROM t WHERE len(toks) >= $k
       |), pw AS (
       |  SELECT h, count(DISTINCT doc_id) AS n_docs FROM w GROUP BY 1
       |)
       |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
       |  CAST(sum(CASE WHEN pw.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       |  floor(CAST(sum(CASE WHEN pw.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS dup_fraction
       |FROM w JOIN pw USING (h) GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // q47/q48: benchmark decontamination (the GPT-3/PaLM-style n-gram
  // overlap check): a TRAINING document is contaminated iff it shares
  // at least one shingle with any EVAL-set document. The eval set here
  // is the deterministic slice doc_id % evalMod == 0 — a stand-in for
  // the held-out benchmark suite a production run loads separately.
  //
  // Scale shape: the eval side is, by construction, tiny relative to
  // the corpus (benchmarks are MBs against TBs), so its distinct
  // shingle-hash set BROADCASTS and contamination detection is one
  // map-side hash-join pass over the exploded training shingles plus
  // one keyed count — the corpus is never shuffled by shingle. Each
  // side tokenizes only its own slice (the filters run before the
  // shingle expressions), so total expression work is one corpus pass.
  // ------------------------------------------------------------------
  /** Contamination report: (doc_id, n_shared_grams) for every training
    * document sharing >= 1 distinct shingle with the eval slice.
    * Counts are over HASHED shingles on the Spark side and shingle
    * STRINGS in the oracle — equal modulo 64-bit collisions (same
    * argument as [[hashedShingleSets]]).
    */
  /** q120: the BLOOM form of the incremental EXACT screen — the
    * membership path a 100 TB store actually serves: instead of
    * semi-joining every landed batch against the store's full
    * content-hash index (a store-sized shuffle-side, however well
    * partitioned), the store publishes a COMPACT summary — a Bloom
    * filter over its content hashes, bitsPerKey bits per stored doc
    * regardless of key size, built in ONE map-side pass by the native
    * [[graft.functions.BloomBuild]] aggregate (partials are bit
    * arrays, merge is byte-wise OR — order-independent, so the filter
    * bytes are DETERMINISTIC for a given store) — and each batch doc
    * probes it SCAN-SIDE via the codegen'd
    * [[graft.functions.BloomMightContain]]. No false negatives ever
    * (every true exact-dup flags); false positives at the standard
    * (1−e^(−k/bitsPerKey))^k rate (~0.8% at 10 bits / 7 hashes) — the
    * artifact carries BOTH verdicts per batch doc (bloom_hit,
    * is_exact_dup) so the FP behavior is in the output, and a real
    * pipeline verifies only the maybe-set exactly (Spark's own
    * runtime bloom-join move, made explicit and persistable: the
    * filter bytes are what a store would SHIP to ingest workers).
    *
    * The filter is a bounded driver artifact (bitsPerKey·|store|/8
    * bytes — 1e9 stored docs ≈ 1.2 GB at the defaults; beyond that a
    * production store shards the filter by key range, documented, not
    * implemented) embedded as a literal, the centroid-table move.
    * Hash-model-dependent (splitmix64 probe positions — deliberately
    * not SQL-replicated) ⇒ rows-only; DedupSpec gates zero false
    * negatives, the FP-rate ceiling, filter determinism, and
    * single-vs-many-partition build equality (true mergeability).
    */
  def bloomScreen(
      documents: DataFrame, batchMod: Long = 10,
      bitsPerKey: Int = 10, numHashes: Int = 7): DataFrame = {
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    require(bitsPerKey >= 1 && numHashes >= 1)
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    val sets = setsCached(documents)
    val storeKeys = sets.filter(!isBatch).select(xxhash64(col("ch")).as("v"))
    val nStore = storeKeys.count()
    val rawBits = math.max(64L, bitsPerKey.toLong * nStore)
    require(rawBits <= Int.MaxValue - 8,
      s"bloom filter of $rawBits bits exceeds the single-filter limit; shard by key range")
    val bits = (((rawBits + 7) / 8) * 8).toInt
    val filter = storeKeys
      .agg(graft.functions.GraftFunctions.bloomBuild(col("v"), bits, numHashes).as("f"))
      .head().getAs[Array[Byte]](0)
    val batch = sets.filter(isBatch).select(col("doc_id"), col("ch"))
    val exactDup = batch
      .join(sets.filter(!isBatch).select(col("ch")).distinct(), Seq("ch"), "left_semi")
      .select(col("doc_id")).withColumn("e", lit(1L))
    batch
      .select(col("doc_id"),
        when(graft.functions.GraftFunctions.bloomMightContain(lit(filter), xxhash64(col("ch"))),
          lit(1L)).otherwise(lit(0L)).as("bloom_hit"))
      .join(exactDup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("bloom_hit"), coalesce(col("e"), lit(0L)).as("is_exact_dup"))
  }

  /** q118: the SPAN modality of the incremental ingest screen — how
    * much of a LANDED batch document is already VERBATIM in the store
    * (q_dedup_incremental answers "is this doc a near-twin of a
    * stored doc"; this answers the passage-level question that
    * doc-level Jaccard never reaches: a new doc that is 40% stored
    * boilerplate should be span-scrubbed or downweighted even though
    * no single stored doc resembles it). Per batch doc with ≥1
    * window: (doc_id, n_windows, n_dup_windows, dup_fraction) where a
    * window is DUP iff its identical k-token sequence occurs anywhere
    * in the store — the [[dupSpans]] output shape pointed across the
    * batch/store boundary.
    *
    * Scale shape — the incremental contract: the batch's distinct
    * window hashes are batch-sized and BROADCAST into one map-side
    * pass over the store's window scan (the memoized [[winsCached]]
    * seam — alongside the span family this adds zero scans); the
    * matched-hash set that comes back is ≤ batch windows and
    * broadcasts again onto the batch side. The store is scanned, never
    * shuffled by hash, and nothing pair-materializes.
    */
  def incrementalSpans(
      documents: DataFrame, batchMod: Long = 10, k: Int = 10): DataFrame = {
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    val wins = winsCached(documents, k)
    val batchWins = wins.filter(isBatch)
    val batchH = batchWins.select(col("h")).distinct()
    // one map-side pass over the store scan; output bounded by the
    // batch's own distinct windows
    val matched = wins.filter(!isBatch)
      .join(broadcast(batchH), Seq("h"))
      .select(col("h")).distinct()
      .withColumn("hit", lit(1L))
    batchWins
      .join(broadcast(matched), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(coalesce(col("hit"), lit(0L))).as("n_dup_windows"))
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        Det.r(col("n_dup_windows").cast("double") / col("n_windows").cast("double"), 6)
          .as("dup_fraction"))
  }

  /** q129: the ACTION for [[incrementalSpans]] — scrub each LANDED
    * batch document's store-duplicated spans before it is appended:
    * every k-token window of a batch doc whose identical sequence
    * already exists in the store is cut, and only the novel text
    * survives (NO owner rule — the store's copy survives by already
    * being stored; the [[decontaminateSpans]] policy pointed at the
    * store instead of an eval slice). Output is the scrub shape
    * (doc_id, n_tokens, n_cut, clean_md5) over every batch doc.
    *
    * Scale shape — the [[incrementalSpans]] contract with the
    * broadcast direction it forces: [[decontaminateSpans]] broadcasts
    * the EVAL hashes because benchmarks are MBs; here the STORE is
    * the 100 TB side, so the batch's distinct window hashes broadcast
    * INTO the store's one memoized window scan, and the ≤batch-windows
    * matched set broadcasts back onto the batch side to build the cut
    * lists — the store is scanned once, never shuffled by hash, and
    * both screen (#118) and scrub read the same [[winsCached]] seam.
    */
  def ingestSpanScrub(
      documents: DataFrame, batchMod: Long = 10, k: Int = 10): DataFrame = {
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    val wins = winsCached(documents, k)
    val batchWins = wins.filter(isBatch)
    val batchH = batchWins.select(col("h")).distinct()
    val matched = wins.filter(!isBatch)
      .join(broadcast(batchH), Seq("h"))
      .select(col("h")).distinct()
    val cutLists = batchWins
      .join(broadcast(matched), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("ps"))
      .select(col("doc_id"),
        expr(s"array_distinct(flatten(transform(ps, p -> sequence(p, p + ${k - 1}))))").as("cut0"))
    documents.filter(isBatch)
      .join(cutLists, Seq("doc_id"), "left")
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("cut", coalesce(col("cut0"), expr("array()")))
      .withColumn("kept",
        expr("filter(transform(toks, (t, i) -> if(array_contains(cut, i + 1), null, t)), x -> x IS NOT NULL)"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("cut")).cast("long").as("n_cut"),
        md5(concat_ws(" ", col("kept")).cast("binary")).as("clean_md5"))
  }

  /** DuckDB twin of [[ingestSpanScrub]]: the [[sqlDecontaminateSpans]]
    * pipeline with the batch/store roles.
    */
  def sqlIngestSpanScrub(batchMod: Long = 10, k: Int = 10): String = {
    val toks = graft.text.Text.sqlTokens("text")
    s"""WITH iss_t AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), iss_w0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - ${k - 1} + 1),
       |    i -> {'pos': i, 'h': hash(array_to_string(toks[i:i + ${k - 1}], ' '))})) AS s
       |  FROM iss_t WHERE len(toks) >= $k
       |), iss_w AS (
       |  SELECT doc_id, s.pos AS pos, s.h AS h FROM iss_w0
       |), iss_sh AS (
       |  SELECT DISTINCT h FROM iss_w WHERE doc_id % $batchMod <> 0
       |), iss_cl AS (
       |  SELECT iss_w.doc_id,
       |    list_distinct(flatten(list_transform(list(DISTINCT iss_w.pos), p -> range(p, p + $k)))) AS cut0
       |  FROM iss_w JOIN iss_sh USING (h)
       |  WHERE iss_w.doc_id % $batchMod = 0
       |  GROUP BY 1
       |), iss_x AS (
       |  SELECT iss_t.doc_id, iss_t.toks, COALESCE(iss_cl.cut0, []) AS cut
       |  FROM iss_t LEFT JOIN iss_cl USING (doc_id)
       |  WHERE iss_t.doc_id % $batchMod = 0
       |)
       |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(cut) AS BIGINT) AS n_cut,
       |  md5(COALESCE(array_to_string(
       |    list_filter(list_transform(range(1, len(toks) + 1),
       |      i -> CASE WHEN list_contains(cut, i) THEN NULL ELSE toks[i] END),
       |      x -> x IS NOT NULL), ' '), '')) AS clean_md5
       |FROM iss_x""".stripMargin
  }

  /** DuckDB twin of [[incrementalSpans]]: plain batch-window ∈
    * store-window-set formulation.
    */
  def sqlIncrementalSpans(batchMod: Long = 10, k: Int = 10): String = {
    val toks = graft.text.Text.sqlTokens("text")
    s"""WITH is_t AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), is_w AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - ${k - 1} + 1),
       |    i -> hash(array_to_string(toks[i:i + ${k - 1}], ' ')))) AS h
       |  FROM is_t WHERE len(toks) >= $k
       |), is_sh AS (
       |  SELECT DISTINCT h FROM is_w WHERE doc_id % $batchMod <> 0
       |)
       |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
       |  CAST(sum(CASE WHEN is_sh.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       |  floor(CAST(sum(CASE WHEN is_sh.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS dup_fraction
       |FROM is_w w LEFT JOIN is_sh ON w.h = is_sh.h
       |WHERE w.doc_id % $batchMod = 0
       |GROUP BY 1""".stripMargin
  }

  /** q117: SPAN-level decontamination — the surgical form of
    * [[decontaminate]]: instead of DROPPING every training document
    * that overlaps the eval slice (which discards a long document for
    * quoting one benchmark sentence) or keeping it whole, rewrite each
    * training document with exactly the eval-overlapping k-token
    * windows REMOVED — benchmark text never survives into training
    * data, the surrounding document does. [[dupSpanScrub]]'s cut
    * machinery pointed at the contamination problem (no owner
    * concept: unlike corpus-internal span dedup, NO copy of an eval
    * span may survive on the training side).
    *
    * Scale shape — strictly better than the span-dedup queries':
    * benchmarks are MBs against TBs, so the eval slice's distinct
    * window hashes BROADCAST and the training corpus is never
    * shuffled by window hash (the [[contamination]] discipline); the
    * window table is the memoized [[winsCached]] seam (one scan feeds
    * the whole span family), cut sets travel as one position per
    * contaminated window and expand scan-side, membership reads the
    * cut array as a join attribute (the CollapseProject trap
    * documented on [[dupSpanScrub]]). Output is the scrub shape:
    * (doc_id, n_tokens, n_cut, clean_md5) over every training doc.
    */
  def decontaminateSpans(
      documents: DataFrame, evalMod: Long = 50, k: Int = 10): DataFrame = {
    require(evalMod >= 2, "evalMod must carve an eval slice out of the corpus")
    val isEval = pmod(col("doc_id"), lit(evalMod)) === 0
    val wins = winsCached(documents, k)
    val evalH = wins.filter(isEval).select(col("h")).distinct()
    val cutLists = wins.filter(!isEval)
      .join(broadcast(evalH), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("ps"))
      .select(col("doc_id"),
        expr(s"array_distinct(flatten(transform(ps, p -> sequence(p, p + ${k - 1}))))").as("cut0"))
    documents.filter(!isEval)
      .join(cutLists, Seq("doc_id"), "left")
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("cut", coalesce(col("cut0"), expr("array()")))
      .withColumn("kept",
        expr("filter(transform(toks, (t, i) -> if(array_contains(cut, i + 1), null, t)), x -> x IS NOT NULL)"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("cut")).cast("long").as("n_cut"),
        md5(concat_ws(" ", col("kept")).cast("binary")).as("clean_md5"))
  }

  /** DuckDB twin of [[decontaminateSpans]]: the [[sqlDupSpanScrub]]
    * window pipeline with the eval/train split and no owner rule.
    */
  def sqlDecontaminateSpans(evalMod: Long = 50, k: Int = 10): String = {
    val toks = graft.text.Text.sqlTokens("text")
    s"""WITH ds_t AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), ds_w0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - ${k - 1} + 1),
       |    i -> {'pos': i, 'h': hash(array_to_string(toks[i:i + ${k - 1}], ' '))})) AS s
       |  FROM ds_t WHERE len(toks) >= $k
       |), ds_w AS (
       |  SELECT doc_id, s.pos AS pos, s.h AS h FROM ds_w0
       |), ds_eh AS (
       |  SELECT DISTINCT h FROM ds_w WHERE doc_id % $evalMod = 0
       |), ds_cl AS (
       |  SELECT ds_w.doc_id,
       |    list_distinct(flatten(list_transform(list(DISTINCT ds_w.pos), p -> range(p, p + $k)))) AS cut0
       |  FROM ds_w JOIN ds_eh USING (h)
       |  WHERE ds_w.doc_id % $evalMod <> 0
       |  GROUP BY 1
       |), ds_x AS (
       |  SELECT ds_t.doc_id, ds_t.toks, COALESCE(ds_cl.cut0, []) AS cut
       |  FROM ds_t LEFT JOIN ds_cl USING (doc_id)
       |  WHERE ds_t.doc_id % $evalMod <> 0
       |)
       |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(cut) AS BIGINT) AS n_cut,
       |  md5(COALESCE(array_to_string(
       |    list_filter(list_transform(range(1, len(toks) + 1),
       |      i -> CASE WHEN list_contains(cut, i) THEN NULL ELSE toks[i] END),
       |      x -> x IS NOT NULL), ' '), '')) AS clean_md5
       |FROM ds_x""".stripMargin
  }

  def contamination(documents: DataFrame, evalMod: Long = 50): DataFrame = {
    val evalGrams = hashedShingleSets(documents.filter(pmod(col("doc_id"), lit(evalMod)) === 0))
      .select(explode(col("sh")).as("h")).distinct()
    val trainGrams = hashedShingleSets(documents.filter(pmod(col("doc_id"), lit(evalMod)) =!= 0))
      .select(col("doc_id"), explode(col("sh")).as("h"))
    trainGrams
      .join(broadcast(evalGrams), Seq("h"))
      .groupBy(col("doc_id"))
      // sh is per-doc distinct, so this count is distinct shared grams
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** The kept corpus: training docs with zero eval overlap (the eval
    * slice itself is excluded — it is not training data). Anti-join on
    * doc_id against the (duplicates-sized, tiny) contaminated set.
    */
  def decontaminate(documents: DataFrame, evalMod: Long = 50): DataFrame =
    documents
      .filter(pmod(col("doc_id"), lit(evalMod)) =!= 0)
      .join(contamination(documents, evalMod).select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  /** Fractional decontamination (the PaLM/production form): drop a
    * training document only when the SHARE of its distinct shingles
    * found in the eval set reaches `minSharedFrac` — any-overlap
    * ([[decontaminate]]) throws away long documents that merely quote
    * one benchmark sentence; the fractional rule drops only documents
    * that substantially ARE eval content.
    *
    * Same broadcast shape as [[contamination]] (eval shingles
    * broadcast; corpus never shuffled by shingle) with the per-doc
    * distinct-shingle count carried through the overlap count, shingle
    * sets computed ONCE. The threshold test is exact integer
    * cross-multiplication — n_shared·1e6 >= fracMicros·n_grams with
    * fracMicros = round(minSharedFrac·1e6) — so the τ boundary cuts
    * identically in both engines (no float division anywhere).
    * Documents with zero eval overlap never enter the drop set, so
    * shingle-less documents are always kept, like [[decontaminate]].
    */
  def decontaminateFrac(
      documents: DataFrame,
      minSharedFrac: Double = 0.2,
      evalMod: Long = 50): DataFrame = {
    require(minSharedFrac > 0.0 && minSharedFrac <= 1.0,
      s"minSharedFrac must be in (0, 1], got $minSharedFrac")
    val fracMicros = math.floor(minSharedFrac * 1e6 + 0.5).toLong
    val evalGrams = hashedShingleSets(documents.filter(pmod(col("doc_id"), lit(evalMod)) === 0))
      .select(explode(col("sh")).as("h")).distinct()
    // ONE explode, then count total vs shared grams in the SAME
    // aggregation via a broadcast LEFT join hit marker. (Projecting
    // size(sh) next to explode(sh) instead re-evaluates the whole
    // shingle-set expression once per exploded row — the collapsed
    // Generate projection runs per OUTPUT row — which benched 10x
    // slower at sf0.1.)
    val drops = hashedShingleSets(documents.filter(pmod(col("doc_id"), lit(evalMod)) =!= 0))
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .join(broadcast(evalGrams.withColumn("hit", lit(1L))), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
      .filter(col("n_shared") * lit(1000000L) >= lit(fracMicros) * col("n_grams"))
      .select(col("doc_id"))
    documents
      .filter(pmod(col("doc_id"), lit(evalMod)) =!= 0)
      .join(drops, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  def sqlDecontaminateFrac(minSharedFrac: Double = 0.2, evalMod: Long = 50): String = {
    val fracMicros = math.floor(minSharedFrac * 1e6 + 0.5).toLong
    s"""WITH s AS (
       |  SELECT doc_id, list_distinct(${graft.text.Text.sqlShingles("text")}) AS sh FROM documents
       |), e AS (
       |  SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % $evalMod = 0
       |), t AS (
       |  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_grams, unnest(sh) AS g
       |  FROM s WHERE doc_id % $evalMod <> 0
       |), drops AS (
       |  SELECT doc_id FROM (
       |    SELECT t.doc_id, t.n_grams, CAST(count(*) AS BIGINT) AS n_shared
       |    FROM t JOIN e USING (g) GROUP BY 1, 2
       |  ) WHERE n_shared * 1000000 >= $fracMicros * n_grams
       |)
       |SELECT d.doc_id, d.lang, d.source, d.n_chars
       |FROM documents d
       |WHERE d.doc_id % $evalMod <> 0
       |  AND NOT EXISTS (SELECT 1 FROM drops WHERE drops.doc_id = d.doc_id)""".stripMargin
  }

  /** Shared oracle CTEs: `t` = per-training-doc exploded distinct
    * shingles, `e` = the distinct eval shingle set, `c` = the
    * contamination report.
    */
  private def sqlContaminationCtes(evalMod: Long): String =
    s"""s AS (
       |  SELECT doc_id, list_distinct(${graft.text.Text.sqlShingles("text")}) AS sh FROM documents
       |), e AS (
       |  SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % $evalMod = 0
       |), t AS (
       |  SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % $evalMod <> 0
       |), c AS (
       |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
       |  FROM t JOIN e USING (g) GROUP BY 1
       |)""".stripMargin

  def sqlContamination(evalMod: Long = 50): String =
    s"WITH ${sqlContaminationCtes(evalMod)}\nSELECT doc_id, n_shared_grams FROM c"

  def sqlDecontaminate(evalMod: Long = 50): String =
    s"""WITH ${sqlContaminationCtes(evalMod)}
       |SELECT d.doc_id, d.lang, d.source, d.n_chars
       |FROM documents d
       |WHERE d.doc_id % $evalMod <> 0
       |  AND NOT EXISTS (SELECT 1 FROM c WHERE c.doc_id = d.doc_id)""".stripMargin

  // ------------------------------------------------------------------
  // q107: INCREMENTAL dedup — dedupe a NEW batch against the EXISTING
  // corpus (the production crawl-ingest shape: the corpus is an
  // immutable store, today's batch must be screened against it before
  // appending). The batch here is the deterministic slice
  // doc_id % batchMod == 0, standing in for a landed micro-batch.
  //
  // The scale contract is what distinguishes this from the all-pairs
  // operators: incremental cost is ∝ BATCH × (matching existing
  // candidates), NEVER existing × existing — the existing corpus
  // contributes only its inverted shingle index (at 100 TB, the
  // persisted index the store maintains; here derived in-query from
  // the shared setsCached seam). Candidate generation uses a
  // ONE-SIDED prefix filter: jac(A,B) >= tau implies |A∩B| >=
  // ceil(tau·|A|) =: α, and for A sorted under any fixed total order
  // the smallest common element must sit within A's first |A|−α+1
  // positions (all α common elements cannot fit in the last α−1
  // slots) — so probing the existing index with only the batch doc's
  // prefix is lossless; the store contributes only the per-hash df
  // used as the order (see [[screenCandidates]] — store-df ascending,
  // so a boilerplate shingle shared corpus-wide sorts LAST and never
  // probes its own full posting list). Intersection sizes for the
  // bounded candidate pairs come from the pair-restricted count-join
  // ([[interCountsFor]]): slim 16-byte rows, no array re-attach.
  // ------------------------------------------------------------------
  /** (doc_id, is_exact_dup, n_near_dups, keep) for every BATCH doc:
    * is_exact_dup = 1 iff some existing doc has identical content
    * (md5); n_near_dups = existing docs with shingle Jaccard >= tau;
    * keep = 1 iff neither. Flags are BIGINT 0/1 (cross-engine dtype
    * stability). Batch-INTERNAL duplicates are deliberately out of
    * this operator's contract — that is [[batchDedup]]'s first-wins
    * screen, and [[ingestDecision]] emits the conjunction of the two;
    * this operator screens against the immutable store only.
    */
  def incrementalDedup(
      documents: DataFrame, batchMod: Long = 10, tau: Double = 0.5): DataFrame = {
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    // ONE corpus scan feeds both screens: the memoized shingle seam
    // carries the md5 content hash alongside the shingle set, so the
    // exact screen reads the same materialized table as the near
    // screen instead of a second pass over `documents`
    val sets = setsCached(documents)
    // memoized counts: q_ingest_decision's store screen derives the
    // identical (batch, index, tau) aggregate — one screen per session
    screenSetsFromCounts(sets.filter(isBatch), sets.filter(!isBatch),
      storeCountsSeam(documents, batchMod, tau),
      tau)
  }

  /** The family-shared STORE-FACING counts seam over the mod-split
    * corpus at a candidate alpha — ONE construction used by the
    * screen queries AND Bench's prewarm, so the interCounts memo keys
    * match STRUCTURALLY (round 16, ADVICE item: the prewarm previously
    * rebuilt the split + index shape inline, and any drift in the
    * query-side construction would have silently turned the prewarm
    * into a wasted build plus an inline rebuild in the first query).
    */
  private[graft] def storeCountsSeam(
      documents: DataFrame, batchMod: Long = 10,
      alphaFrac: Double = ScreenAlphaDefault): DataFrame = {
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    val sets = setsCached(documents)
    interCountsCached(sets.filter(isBatch), sets.filter(!isBatch),
      storeIndex(sets.filter(!isBatch)), alphaFrac)
  }

  /** [[storeCountsSeam]]'s disk-served twin: the counts aggregate over
    * the PERSISTED postings layout — shared by q_dedup_incremental_disk,
    * q_ingest_decision_disk and the prewarm.
    */
  private[graft] def diskCountsSeam(
      documents: DataFrame, batchMod: Long = 10,
      alphaFrac: Double = ScreenAlphaDefault): DataFrame = {
    val spark = documents.sparkSession
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    val dir = shingleIndexDirCached(documents.filter(!isBatch))
    val batchSets = setsCached(documents).filter(isBatch)
    interCountsCached(batchSets, ShingleIndex.readSets(spark, dir),
      ShingleIndex.probeIndex(spark, dir), alphaFrac,
      Some(ShingleIndex.dfTable(spark, dir)))
  }

  /** The batch SELF-screen counts seam at the family defaults — shared
    * by q_dedup_batch, both ingest decisions and the prewarm.
    */
  private[graft] def selfCountsSeam(
      documents: DataFrame, batchMod: Long = 10,
      alphaFrac: Double = ScreenAlphaDefault): DataFrame =
    selfCountsCached(
      setsCached(documents).filter(pmod(col("doc_id"), lit(batchMod)) === 0), alphaFrac)

  /** The screen core over prepared (doc_id, sh, ch) set-frames — the
    * [[incrementalDedup]] semantics with the batch/store split made
    * explicit, so the mod-split batch query, the [[screenAgainst]]
    * library entry and the per-micro-batch streaming form
    * ([[graft.streaming.Events.incrementalScreenStream]]) all run the
    * IDENTICAL plan: exact screen on `ch`, one-sided prefix probe into
    * the store's inverted index, exact Jaccard verification.
    */
  private def screenSets(batchSets: DataFrame, exSets: DataFrame, tau: Double): DataFrame = {
    val exIndex = storeIndex(exSets)
    // [[screenAgainst]]'s store is static by contract (the streaming
    // form screens every micro-batch against the SAME store), so the
    // memoized df is the right source here
    screenSetsWithIndex(batchSets, exSets, exIndex, tau, Some(storeDfCached(exIndex)))
  }

  /** The store's inverted index derived from a prepared set-frame —
    * ONE canonical expression shared by every in-session screen, so
    * the df/counts memo keys (canonicalized index plans) line up
    * across queries instead of near-missing on formulation drift.
    */
  private[dedup] def storeIndex(exSets: DataFrame): DataFrame =
    exSets.select(col("doc_id").as("ex_id"), explode(col("sh")).as("h"))
      .hint("shuffle_hash")

  /** CANDIDATE stage of the store screens: the lossless one-sided
    * prefix probe, DF-ORDERED. For any pair with |A∩B| ≥ α :=
    * ⌈alphaFrac·|A|⌉, sorting A under ANY fixed total order on the
    * hash universe puts at least one common element inside A's first
    * |A|−α+1 positions (all α common elements cannot fit in the last
    * α−1 slots) — so probing the store's inverted index with only
    * that prefix finds every qualifying pair, with no ordering or
    * statistics needed from the store side. jac ≥ τ forces
    * |A∩B| ≥ ⌈τ·|A|⌉ and C(A→B) ≥ τ forces the same bound, so ONE
    * candidate stage at alphaFrac = min of the screens' thresholds
    * covers the near screen and the containment screen together.
    *
    * The fixed order is STORE-df ascending (rarest first, ties by
    * hash — df(h) is a global per-hash value, so (df, h) is a fixed
    * total order; batch hashes absent from the store take df = 0,
    * which sorts them first and costs nothing since they match no
    * posting). This is what bounds the hot-posting blowup the
    * round-14 verdict flagged: a boilerplate shingle shared by every
    * document has MAXIMAL df, lands LAST in every document's order,
    * and therefore inside no prefix (for any doc with α ≥ 2) — its
    * df_batch × df_store fan-out never reaches the join. Join volume
    * is Σ_{h ∈ prefixes} df_store(h), prefixes holding each batch
    * doc's rarest shingles (the ngramPairs SSJoin argument, one-sided).
    * Probe-side epsilon-lowered ceil as ngramPairs: over-ceiling would
    * shorten the prefix below the losslessness bound; under-ceiling
    * only admits extra candidates.
    */
  /** The incremental family's default near-screen threshold — the
    * candidate-stage floor the memoized counts entries share: every
    * store-facing screen at a threshold ≥ this probes at this
    * alphaFrac (lossless — candidate supersets only add rows the
    * verdict filters reject) so the family derives ONE counts table
    * per (batch, store) per session.
    */
  private[dedup] val ScreenAlphaDefault = 0.5

  /** The store's per-hash document frequency (h, df) — the prefix
    * probe's ordering key. df is a STORE-ONLY property, so deriving it
    * inside every candidate stage re-aggregated the store's full
    * posting list once per screen (the round-15 baseline's largest
    * fixed cost at bench scale). Derivations now come from one of
    * three places, cheapest available first: the PERSISTED df table a
    * [[ShingleIndex]] writes at build time, this session memo for
    * in-session stores (one aggregate per store per session), or the
    * inline aggregate for the growing-store streaming path (a fresh
    * union plan per micro-batch would only pile up dead memo entries).
    *
    * Correctness does not depend on WHICH df the order uses: the
    * prefix bound holds under ANY fixed total order on the hash
    * universe (see [[screenCandidates]]), so a stale df — e.g. after
    * an index [[ShingleIndex.append]] — only shifts candidate volume,
    * never a verdict (candidate supersets are filtered exactly).
    */
  private[dedup] def inlineDf(exIndex: DataFrame): DataFrame =
    exIndex.groupBy(col("h")).agg(count(lit(1)).as("df"))

  private val dfMemo = graft.Memo[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame]()

  private[dedup] def storeDfCached(exIndex: DataFrame): DataFrame =
    dfMemo.getOrElseUpdate(exIndex.sparkSession,
      exIndex.queryExecution.analyzed.canonicalized)(
      inlineDf(exIndex).boundedCheckpoint())

  private[graft] def screenCandidates(
      batchSets: DataFrame, exIndex: DataFrame, alphaFrac: Double,
      dfT: Option[DataFrame] = None): DataFrame = {
    require(alphaFrac > 0 && alphaFrac <= 1, s"alphaFrac must be in (0,1], got $alphaFrac")
    val inv = batchSets
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("h"))
    val dfreq = dfT.getOrElse(inlineDf(exIndex))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("h").asc)
    val prefix = inv
      .join(dfreq.hint("shuffle_hash"), Seq("h"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") <=
        col("n_sh") - ceil(lit(alphaFrac) * col("n_sh") - lit(1e-9)).cast("int") + 1)
      .select(col("doc_id"), col("h"))
    prefix.join(exIndex.hint("shuffle_hash"), Seq("h"))
      .select(col("doc_id"), col("ex_id"))
      .distinct()
  }

  /** SCORING stage over a prepared candidate pair set: exact
    * per-(batch doc, store doc) shingle-intersection sizes, plus both
    * set sizes, by re-attaching the two SORTED-DISTINCT shingle arrays
    * to each candidate pair and intersecting them in one codegen
    * expression. |A∩B| = size(array_intersect(A, B)) exactly (both
    * arrays are distinct by construction), and carrying n_a/n_b here
    * means every downstream verdict is a pure filter+rollup over this
    * one slim table — no size-attach joins remain in the family.
    *
    * Why arrays are safe HERE when the round-13 lesson banned them:
    * that regression re-attached arrays to the UNRESTRICTED candidate
    * set (|batch|×|store| under a dense corpus — 21 GB shuffled at
    * sf3); this stage runs strictly AFTER the lossless prefix probe,
    * so rows are candidate-bounded (∝ true near-dup pairs by the
    * prefix argument) and the shuffled bytes are Σ_cand(|A|+|B|) —
    * the same order as the count-join's exploded intersection rows,
    * in far fewer rows and two fewer exchanges (measured 3.5 s → 1.6 s
    * per derivation at bench scale). The store side still shrinks to
    * candidate docs via a BROADCAST left-semi before its arrays move
    * (candidate ex_ids are batch-proportional and 8 bytes each; the
    * store is scanned, never shuffled in full).
    */
  private[dedup] def interCountsFor(
      batchSets: DataFrame, exSets: DataFrame, cands: DataFrame): DataFrame = {
    val bArr = batchSets.select(col("doc_id"), col("sh").as("sh_a"))
    val eArr = exSets.select(col("doc_id").as("ex_id"), col("sh").as("sh_b"))
      .join(broadcast(cands.select(col("ex_id")).distinct()), Seq("ex_id"), "left_semi")
    cands
      .join(bArr.hint("shuffle_hash"), Seq("doc_id"))
      .join(eArr.hint("shuffle_hash"), Seq("ex_id"))
      .select(col("doc_id"), col("ex_id"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
  }

  /** [[screenCandidates]] → [[interCountsFor]]: the full bounded
    * two-stage counts derivation at one threshold.
    */
  private[dedup] def interCountsBounded(
      batchSets: DataFrame, exSets: DataFrame, exIndex: DataFrame,
      alphaFrac: Double, dfT: Option[DataFrame] = None): DataFrame =
    // checkpoint the candidate pairs: [[interCountsFor]] consumes them
    // TWICE (the broadcast ex_id semi-join AND the pair-restriction
    // join land on different exchanges, so ReuseExchange cannot merge
    // them) — without the seam the whole multi-exchange probe subtree
    // executes twice per counts derivation. The pair set is slim
    // (16 B/row) and candidate-bounded by the prefix argument.
    interCountsFor(batchSets, exSets,
      screenCandidates(batchSets, exIndex, alphaFrac, dfT).boundedCheckpoint())

  /** Session-scoped memo of the MATERIALIZED counts table — the
    * setsCached discipline applied to the screen aggregate: the
    * mod-split queries q_dedup_incremental and q_ingest_decision's
    * store+containment screens (and their _disk twins against the
    * persisted postings) all derive the identical (batch, index,
    * alpha) counts, so the screen family pays the candidate probe +
    * count-join once per session, not once per query. Keyed on the
    * canonicalized batch and index plans plus alpha micros. The
    * per-micro-batch STREAMING paths deliberately bypass this memo
    * (every micro-batch is a fresh plan — memoizing them would only
    * accumulate dead entries) and checkpoint inline instead.
    */
  private val interMemo = graft.Memo[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
     org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long), DataFrame]()

  private[dedup] def interCountsCached(
      batchSets: DataFrame, exSets: DataFrame, exIndex: DataFrame,
      alphaFrac: Double, dfT: Option[DataFrame] = None): DataFrame =
    interMemo.getOrElseUpdate(batchSets.sparkSession,
      (batchSets.queryExecution.analyzed.canonicalized,
        exIndex.queryExecution.analyzed.canonicalized,
        math.round(alphaFrac * 1e6)))(
      interCountsBounded(batchSets, exSets, exIndex, alphaFrac,
        dfT.orElse(Some(storeDfCached(exIndex)))).boundedCheckpoint())

  /** The near-dup rollup from a prepared counts table: (doc_id,
    * n_near_dups) for batch docs with ≥ 1 store doc at jac ≥ tau.
    * Set sizes ride the counts rows ([[interCountsFor]] carries
    * n_a/n_b), so the rollup is a pure filter + per-doc aggregate —
    * no join. `counts` must come from a candidate stage at
    * alphaFrac ≤ tau (candidate SUPERSETS only ever add rows the
    * filters below reject — the verdict is threshold-determined, not
    * candidate-determined).
    */
  private def nearCountsRollup(counts: DataFrame, tau: Double): DataFrame =
    counts
      // the same size-ratio prune as ngramPairs (epsilon toward
      // keeping: only ever admits extra pairs to the jac test)
      .filter(col("n_a").cast("double") >= lit(tau) * col("n_b").cast("double") - lit(1e-9) &&
        col("n_b").cast("double") >= lit(tau) * col("n_a").cast("double") - lit(1e-9))
      // identical arithmetic to withJaccard: double intersection over
      // int size sum (the sort-merge walk computed the same integer)
      .withColumn("interd", col("inter").cast("double"))
      .withColumn("jac", col("interd") / (col("n_a") + col("n_b") - col("interd")))
      .filter(col("jac") >= tau)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_near_dups"))

  /** The full [[incrementalDedup]]-shaped verdict from a prepared
    * counts table (exact screen + near rollup + verdict spine) — the
    * seam the shared-counts decision paths plug [[interCountsCached]]
    * into.
    */
  private def screenSetsFromCounts(
      batchSets: DataFrame, exSets: DataFrame, counts: DataFrame,
      tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1], got $tau")
    // ---- exact screen: batch content hashes vs the existing store's
    val exactDups = batchSets.select(col("doc_id"), col("ch"))
      .join(exSets.select(col("ch")).distinct(), Seq("ch"), "left_semi")
      .select(col("doc_id"))
    val near = nearCountsRollup(counts, tau)
    batchSets.select(col("doc_id"))
      .join(exactDups.withColumn("e", lit(1L)), Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("e"), lit(0L)).as("is_exact_dup"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
        when(coalesce(col("e"), lit(0L)) === 0L && coalesce(col("n_near_dups"), lit(0L)) === 0L,
          lit(1L)).otherwise(lit(0L)).as("keep"))
  }

  /** [[screenSets]] with the store's inverted index SUPPLIED rather
    * than derived — the seam [[ShingleIndex.probe]] plugs a persisted
    * postings table into: `exIndex` must be (ex_id, h) covering
    * exactly `exSets`'s exploded shingles (the in-session derivation
    * IS that, so the two paths are provably hash-equal — pinned in
    * DedupSpec). The caller owns the index side's join strategy: the
    * in-session/parquet paths hint shuffle_hash, the BUCKETED
    * persisted layout arrives pre-partitioned so its scan IS the
    * required distribution (no hint, no store-side Exchange).
    */
  private[dedup] def screenSetsWithIndex(
      batchSets: DataFrame, exSets: DataFrame, exIndex: DataFrame,
      tau: Double, dfT: Option[DataFrame] = None): DataFrame =
    screenSetsFromCounts(batchSets, exSets,
      interCountsBounded(batchSets, exSets, exIndex, tau, dfT), tau)

  /** Screen ARBITRARY new documents against an ARBITRARY existing
    * store — the [[incrementalDedup]] contract without the mod-split
    * convention: `newDocs` is whatever landed (a crawl drop, one
    * streaming micro-batch), `existingDocs` the immutable corpus. The
    * store's shingle+hash seam is memoized ([[setsCached]]), so
    * repeated screens against the same store — every micro-batch of a
    * streaming ingest — derive the store index ONCE per session; the
    * batch side is batch-sized and derived fresh. Per-doc results
    * depend only on (doc, store), which is what makes the streaming
    * form's micro-batched union provably equal to one big screen.
    */
  def screenAgainst(
      newDocs: DataFrame, existingDocs: DataFrame, tau: Double = 0.5): DataFrame =
    screenSets(hashedShingleSets(newDocs), setsCached(existingDocs), tau)

  // ------------------------------------------------------------------
  // q137: the DISK-SERVED form of q107 — the production lifecycle the
  // in-session screen stands in for: the store's shingle index is
  // PERSISTED ([[ShingleIndex]]: sets + postings parquet, the
  // BloomIndex discipline the near screen lacked until round 11) and
  // the landed batch probes the read-back layout. Verdicts depend only
  // on (batch doc, store content) — hash-independent 0/1 flags and
  // counts — so the disk path shares q107's DuckDB oracle verbatim:
  // the full hash-exact gate, not just rows-only.
  // ------------------------------------------------------------------
  /** Session-scoped registry of store-index directories, keyed on the
    * canonicalized store plan — the [[setsCached]] discipline applied
    * to the on-disk artifact: every screen against the same store
    * reads ONE persisted index (at 100 TB the index simply exists;
    * here the first touch builds it, itemized in the bench build line
    * via [[prewarm]]).
    */
  private val shingleIdxMemo =
    graft.Memo[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String]()

  private[graft] def shingleIndexDirCached(storeDocs: DataFrame): String =
    shingleIdxMemo.getOrElseUpdate(storeDocs.sparkSession,
      storeDocs.queryExecution.analyzed.canonicalized)({
      val dir = Files.createTempDirectory("graft_shingle_idx_").toString
      ShingleIndex.write(storeDocs, dir)
      dir
    })

  /** [[incrementalDedup]] served from the PERSISTED store index —
    * identical contract and oracle; the store side is two columnar
    * parquet scans of the [[ShingleIndex]] layout instead of an
    * in-session derivation.
    */
  def incrementalDedupDisk(
      documents: DataFrame, batchMod: Long = 10, tau: Double = 0.5): DataFrame = {
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    val dir = shingleIndexDirCached(documents.filter(!isBatch))
    // batch side from the family-shared materialized seam (the
    // in-memory twin's source): the _disk twin exists to price the
    // LAYOUT, and a per-call batch re-tokenize would land in its
    // timing instead (ShingleIndex.probe keeps the fresh derivation
    // for arbitrary landed docs). Counts memoized: at the default tau
    // this is the SAME (batch, postings, alpha) entry
    // q_ingest_decision_disk's store screen derives.
    val spark = documents.sparkSession
    val batchSets = setsCached(documents).filter(isBatch)
    screenSetsFromCounts(batchSets, ShingleIndex.readSets(spark, dir),
      diskCountsSeam(documents, batchMod, tau),
      tau)
  }

  /** The FULL ingest decision served from the persisted store index —
    * [[decisionSets]]'s three screens with both store-facing halves
    * ([[ShingleIndex.probe]] + [[ShingleIndex.containmentProbe]])
    * reading the on-disk layout; the batch self-screen is batch-only
    * by contract and derives in-session. Verdicts are store-content-
    * determined, so the composition shares [[sqlIngestDecision]]'s
    * oracle verbatim — and this is the screen core the DISK-BACKED
    * streaming ingest ([[graft.streaming.Events.ingestStreamPersisted]])
    * runs per micro-batch before appending its keepers to the same
    * index.
    */
  def decisionFromIndex(
      spark: org.apache.spark.sql.SparkSession, newDocs: DataFrame, dir: String,
      tau: Double = 0.5, tauContain: Double = 0.8): DataFrame =
    // ONE batch-seam derivation feeds all three screens (the
    // decisionSets discipline, here with the store side on disk)
    decisionFromIndexSets(
      spark, hashedShingleSets(newDocs).boundedCheckpoint(), dir, tau, tauContain)

  /** [[decisionFromIndex]] over a PREPARED batch set-frame — the seam
    * the mod-split query plugs the family-shared [[setsCached]] slice
    * into (see [[incrementalDedupDisk]]).
    */
  private[graft] def decisionFromIndexSets(
      spark: org.apache.spark.sql.SparkSession, batchSets: DataFrame, dir: String,
      tau: Double, tauContain: Double): DataFrame =
    // [[decisionSets]] with the store side read from the persisted
    // layout — the same single shared-counts aggregate feeds both
    // store-facing screens (inline checkpoint: this entry serves the
    // per-micro-batch streaming ingest, so no memo — see decisionSets)
    decisionFromCounts(batchSets, ShingleIndex.readSets(spark, dir),
      interCountsBounded(batchSets, ShingleIndex.readSets(spark, dir),
        ShingleIndex.probeIndex(spark, dir),
        math.min(tau, tauContain),
        Some(ShingleIndex.dfTable(spark, dir))).boundedCheckpoint(),
      tau, tauContain)

  /** q141: [[ingestDecision]] in its disk-served form (the #137/#140
    * lifecycle applied to the composed verdict) — same contract, same
    * oracle.
    */
  def ingestDecisionDisk(
      documents: DataFrame, batchMod: Long = 10, tau: Double = 0.5,
      tauContain: Double = 0.8): DataFrame = {
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    val dir = shingleIndexDirCached(documents.filter(!isBatch))
    // batch side from the shared seam (the incrementalDedupDisk note);
    // counts memoized at min(tau, tauContain) — shared with
    // q_dedup_incremental_disk at the family defaults
    val spark = documents.sparkSession
    val batchSets = setsCached(documents).filter(isBatch)
    decisionFromCounts(batchSets, ShingleIndex.readSets(spark, dir),
      diskCountsSeam(documents, batchMod, math.min(tau, tauContain)),
      tau, tauContain, memoSelf = true)
  }

  /** DuckDB twin of [[incrementalDedup]]: brute batch × existing cross
    * comparison (exactly the shape the Spark side must avoid at scale
    * — which is the point of the cross-check).
    */
  def sqlIncrementalDedup(batchMod: Long = 10, tau: Double = 0.5): String = {
    val jac = "CAST(len(list_intersect(b.sh, e.sh)) AS DOUBLE) / CAST(len(b.sh) + len(e.sh) - len(list_intersect(b.sh, e.sh)) AS DOUBLE)"
    s"""WITH s AS (
       |  SELECT doc_id, ${sqlHashedShingleSet("text")} AS sh, md5(text) AS ch FROM documents
       |), b AS (
       |  SELECT doc_id, sh, ch FROM s WHERE doc_id % $batchMod = 0
       |), e AS (
       |  SELECT doc_id, sh, ch FROM s WHERE doc_id % $batchMod <> 0
       |), nearp AS (
       |  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_near_dups
       |  FROM b JOIN e ON ($jac) >= $tau
       |  GROUP BY 1
       |), exd AS (
       |  SELECT DISTINCT b.doc_id FROM b JOIN e ON b.ch = e.ch
       |)
       |SELECT b.doc_id,
       |  CAST(CASE WHEN exd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_exact_dup,
       |  CAST(coalesce(nearp.n_near_dups, 0) AS BIGINT) AS n_near_dups,
       |  CAST(CASE WHEN exd.doc_id IS NULL AND coalesce(nearp.n_near_dups, 0) = 0
       |       THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM b
       |LEFT JOIN exd USING (doc_id)
       |LEFT JOIN nearp USING (doc_id)""".stripMargin
  }

  // ------------------------------------------------------------------
  // q109: BATCH-INTERNAL dedup — the screen [[incrementalDedup]]
  // deliberately leaves out of contract: a real crawl batch
  // self-duplicates heavily, so after screening against the immutable
  // store the batch must also be screened against ITSELF before
  // appending. First-wins convention: a doc is a duplicate iff an
  // EARLIER batch doc (smaller doc_id — the fixed arrival order) is an
  // exact or near twin, so every duplicate cluster keeps exactly its
  // first member and the two screens compose: append the docs BOTH
  // screens keep.
  //
  // Same machinery as the incremental screen — the memoized shingle+
  // hash seam feeds both sub-screens, candidates come from the
  // df-ordered one-sided prefix probe (lossless for the LATER doc of
  // any qualifying pair; the earlier-only filter keeps each unordered
  // pair exactly once) — just pointed at the batch slice on both
  // sides. Cost ∝ batch × batch-candidates, never corpus-sized.
  // ------------------------------------------------------------------
  /** (doc_id, is_exact_dup, n_near_dups, keep) for every BATCH doc,
    * screened against EARLIER batch docs only: is_exact_dup = 1 iff an
    * earlier batch doc has identical content (md5); n_near_dups =
    * earlier batch docs with shingle Jaccard >= tau; keep = 1 iff
    * neither. Flags are BIGINT 0/1 like [[incrementalDedup]].
    */
  def batchDedup(
      documents: DataFrame, batchMod: Long = 10, tau: Double = 0.5): DataFrame = {
    require(batchMod >= 2, "batchMod must carve a batch slice out of the corpus")
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    val sets = setsCached(documents).filter(isBatch)
    // memoized self-counts: q_ingest_decision(+_disk) compose the
    // identical batch self-screen — one batch×batch aggregate/session
    selfScreenFromCounts(sets, selfCountsSeam(documents, batchMod, tau), tau)
  }

  /** The first-wins self-screen core over a prepared (doc_id, sh, ch)
    * set-frame — [[batchDedup]] with the batch slice made explicit, so
    * the mod-split query and the per-micro-batch streaming ingest
    * ([[graft.streaming.Events.ingestStream]]) run the identical plan.
    */
  private[graft] def selfScreenSets(sets: DataFrame, tau: Double): DataFrame =
    selfScreenFromCounts(sets, selfCounts(sets, tau), tau)

  /** The first-wins self-screen's COUNTS derivation — the store-screen
    * machinery pointed at the batch's own inverted index: df-ordered
    * prefix probe (bounded under batch-internal boilerplate exactly as
    * the store screen is), candidates restricted to earlier-only
    * BEFORE the count-join so each unordered pair is counted once,
    * credited to the LATER doc (whose prefix the losslessness bound
    * covers — the probe side is every batch doc, so pair (e, a) with
    * e < a surfaces via a's probe).
    */
  private def selfCounts(sets: DataFrame, tau: Double): DataFrame = {
    val exIndex = storeIndex(sets)
    // checkpointed for the same double-consumption reason as
    // [[interCountsBounded]]; inline df — the batch side is fresh per
    // screen by nature (and per micro-batch in the streaming form), so
    // there is no cross-query reuse for a memo to capture
    val cands = screenCandidates(sets, exIndex, tau)
      .filter(col("ex_id") < col("doc_id"))
      .boundedCheckpoint()
    interCountsFor(sets, sets, cands)
  }

  /** Session-scoped memo of the MATERIALIZED self-screen counts — the
    * [[interCountsCached]] discipline applied to the batch-internal
    * screen: q_dedup_batch, q_ingest_decision AND q_ingest_decision_disk
    * all run the identical first-wins self-screen over the identical
    * batch slice (the disk twins differ only in the STORE side), so the
    * batch×batch candidate probe + count-join materializes once per
    * session instead of once per query. The per-micro-batch STREAMING
    * ingest deliberately bypasses this memo (fresh plan per
    * micro-batch — entries would only accumulate dead) via the inline
    * [[selfScreenSets]] entry.
    */
  private val selfMemo = graft.Memo[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long), DataFrame]()

  private def selfCountsCached(sets: DataFrame, tau: Double): DataFrame =
    selfMemo.getOrElseUpdate(sets.sparkSession,
      (sets.queryExecution.analyzed.canonicalized, math.round(tau * 1e6)))(
      selfCounts(sets, tau).boundedCheckpoint())

  /** The first-wins verdict from a prepared self-counts table: exact
    * screen + the shared size-ratio + exact-Jaccard rollup over slim
    * count rows — no shingle array is ever re-attached.
    */
  private def selfScreenFromCounts(
      sets: DataFrame, counts: DataFrame, tau: Double): DataFrame = {
    // ---- exact screen: an earlier batch doc with the same md5
    val exactDups = sets.as("a")
      .join(sets.as("e").hint("shuffle_hash"),
        col("a.ch") === col("e.ch") && col("e.doc_id") < col("a.doc_id"), "left_semi")
      .select(col("a.doc_id").as("doc_id"))
    val near = nearCountsRollup(counts, tau)
    sets.select(col("doc_id"))
      .join(exactDups.withColumn("e", lit(1L)), Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("e"), lit(0L)).as("is_exact_dup"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
        when(coalesce(col("e"), lit(0L)) === 0L && coalesce(col("n_near_dups"), lit(0L)) === 0L,
          lit(1L)).otherwise(lit(0L)).as("keep"))
  }

  /** q111: the INGEST DECISION — the verdict the pipeline actually
    * acts on: a batch doc is appended to the store iff BOTH screens
    * keep it ([[incrementalDedup]]: no exact/near twin in the
    * existing store; [[batchDedup]]: no earlier twin within the
    * batch). One row per batch doc with both verdicts and their
    * conjunction, so the artifact shows WHY a doc was dropped, not
    * just that it was. Both screens read the same memoized
    * shingle+hash seam, so the composition costs two batch-sized
    * screens over ONE corpus scan.
    */
  def ingestDecision(
      documents: DataFrame, batchMod: Long = 10, tau: Double = 0.5,
      tauContain: Double = 0.8): DataFrame = {
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    val sets = setsCached(documents)
    // memoized shared counts: at the defaults min(0.5, 0.8) = 0.5 this
    // is the SAME (batch, index, alpha) entry q_dedup_incremental
    // derives, so the decision's two store-facing screens ride one
    // session-wide aggregate
    decisionFromCounts(sets.filter(isBatch), sets.filter(!isBatch),
      storeCountsSeam(documents, batchMod, math.min(tau, tauContain)),
      tau, tauContain, memoSelf = true)
  }

  /** The decision core over prepared set-frames — all three screens
    * ([[screenSets]] against the store, [[selfScreenSets]] within the
    * batch, and since round 11 [[containSetsWithIndex]] for
    * contained-in-store — the modality the near screen is blind to at
    * \|B\| ≫ \|A\|) plus their conjunction, the shape
    * [[ingestDecision]] and the per-micro-batch streaming ingest
    * ([[graft.streaming.Events.ingestStream]]) share. All three
    * screens read the same prepared set-frames — one corpus scan.
    */
  private[graft] def decisionSets(
      batchSets: DataFrame, exSets: DataFrame, tau: Double,
      tauContain: Double = 0.8): DataFrame =
    // streaming-safe entry: per-micro-batch plans would only pile up
    // dead memo entries, so the shared counts checkpoint inline here
    decisionFromCounts(batchSets, exSets,
      // inline df: this entry serves the GROWING-store streaming
      // ingest (a fresh union plan per micro-batch), where a memoized
      // df would only pile up dead entries
      interCountsBounded(batchSets, exSets, storeIndex(exSets),
        math.min(tau, tauContain)).boundedCheckpoint(),
      tau, tauContain)

  /** The decision composition over a SHARED counts table: since both
    * store-facing screens (near Jaccard at τ and containment at
    * τ_contain) are threshold filters over the SAME exact
    * intersection-count aggregate, ONE candidate probe + count-join
    * at alphaFrac = min(τ, τ_contain) prices both — the round-14
    * verdict's "share the interCounts aggregate between
    * q_ingest_decision's two screens". The batch self-screen is
    * batch-only by contract and keeps its own (batch-sized) pass.
    */
  private def decisionFromCounts(
      batchSets: DataFrame, exSets: DataFrame, counts: DataFrame,
      tau: Double, tauContain: Double,
      memoSelf: Boolean = false): DataFrame = {
    val store = screenSetsFromCounts(batchSets, exSets, counts, tau)
      .select(col("doc_id"), col("keep").as("store_keep"))
    // memoSelf: the mod-split queries share the batch self-screen's
    // counts session-wide (q_dedup_batch runs the identical screen);
    // the per-micro-batch streaming entries keep the inline derivation
    val intra = selfScreenFromCounts(batchSets,
        if (memoSelf) selfCountsCached(batchSets, tau) else selfCounts(batchSets, tau),
        tau)
      .select(col("doc_id"), col("keep").as("batch_keep"))
    val contain = containSetsFromCounts(batchSets, counts, tauContain)
      .select(col("doc_id"), col("keep").as("contain_keep"))
    store.join(intra, Seq("doc_id")).join(contain, Seq("doc_id"))
      .select(col("doc_id"), col("store_keep"), col("batch_keep"), col("contain_keep"),
        (col("store_keep") * col("batch_keep") * col("contain_keep")).as("keep"))
  }

  /** DuckDB twin of [[ingestDecision]]: the three screen twins
    * composed as FROM-subqueries (each carries its own WITH chain).
    */
  def sqlIngestDecision(
      batchMod: Long = 10, tau: Double = 0.5, tauContain: Double = 0.8): String =
    s"""SELECT s.doc_id,
       |  s.keep AS store_keep,
       |  i.keep AS batch_keep,
       |  c.keep AS contain_keep,
       |  s.keep * i.keep * c.keep AS keep
       |FROM (
       |${sqlIncrementalDedup(batchMod, tau)}
       |) s JOIN (
       |${sqlBatchDedup(batchMod, tau)}
       |) i ON s.doc_id = i.doc_id
       |JOIN (
       |${sqlContainedIncremental(batchMod, tauContain)}
       |) c ON s.doc_id = c.doc_id""".stripMargin

  /** DuckDB twin of [[batchDedup]]: brute batch × batch earlier-only
    * cross comparison.
    */
  def sqlBatchDedup(batchMod: Long = 10, tau: Double = 0.5): String = {
    val jac = "CAST(len(list_intersect(a.sh, e.sh)) AS DOUBLE) / CAST(len(a.sh) + len(e.sh) - len(list_intersect(a.sh, e.sh)) AS DOUBLE)"
    s"""WITH s AS (
       |  SELECT doc_id, ${sqlHashedShingleSet("text")} AS sh, md5(text) AS ch FROM documents
       |), b AS (
       |  SELECT doc_id, sh, ch FROM s WHERE doc_id % $batchMod = 0
       |), nearp AS (
       |  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_near_dups
       |  FROM b a JOIN b e ON e.doc_id < a.doc_id AND ($jac) >= $tau
       |  GROUP BY 1
       |), exd AS (
       |  SELECT DISTINCT a.doc_id FROM b a JOIN b e ON e.doc_id < a.doc_id AND e.ch = a.ch
       |)
       |SELECT b.doc_id,
       |  CAST(CASE WHEN exd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_exact_dup,
       |  CAST(coalesce(nearp.n_near_dups, 0) AS BIGINT) AS n_near_dups,
       |  CAST(CASE WHEN exd.doc_id IS NULL AND coalesce(nearp.n_near_dups, 0) = 0
       |       THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM b
       |LEFT JOIN exd USING (doc_id)
       |LEFT JOIN nearp USING (doc_id)""".stripMargin
  }
}
