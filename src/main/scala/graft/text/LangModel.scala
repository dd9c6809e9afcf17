package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Det
import graft.Ckpt.CkptOps

/** Unigram language-model scoring — the perplexity-style quality
  * signal (CCNet/Gopher filter on LM bits-per-token; the unigram form
  * is the engine-native analog: no external model, one extra
  * vocabulary aggregate over the corpus).
  *
  * score(doc) = mean over token occurrences of −ln p(token), with
  * p = corpus count / corpus total (self-estimated). Low = templated /
  * ubiquitous wording, high = rare-token soup — both tails are what a
  * curation pass inspects or drops.
  *
  * Scale shape: term frequencies are the same single (doc_id, token)
  * keyed shuffle as [[Search.tfidfTop]]; the unigram table is a
  * vocabulary-sized rollup of it; the corpus-total scalar rides a
  * [[Det.attachScalar]] broadcast join onto the VOCABULARY (never the
  * data-sized tf table); the doc score is a second groupBy over tf.
  * Determinism: per-(doc, token) surprisal is fixed to integer
  * MICRO-NATS before the per-doc sum — a double sum over an unordered
  * group rounds differently per engine/partitioning, a long sum is
  * exact and order-free. ln's ≤2-ulp cross-libm skew sits ~9 orders
  * of magnitude below the 0.5-micro-nat floor boundary (same policy
  * as TF-IDF's 6-dp rounded score).
  */
object LangModel {

  def surprisal(documents: DataFrame): DataFrame = {
    // tf feeds both the vocabulary rollup and the scoring join —
    // checkpoint so the tokenize+explode scan and the (doc, token)
    // shuffle run once (the ngramPairs lesson)
    // Spread: the raw scan is one task per 128 MB of input — on a
    // compact bench table that serializes the tokenize+explode work;
    // on a well-split production table it is a no-op. Counts are
    // exact integer aggregations, so partitioning never moves a value.
    val tf = graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .boundedCheckpoint()
    val vocab = tf.groupBy(col("token")).agg(sum(col("tf")).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("n_total"))
    tf.join(Det.attachScalar(vocab, total), Seq("token"))
      .withColumn("micro_nats",
        floor(col("tf").cast("double") *
          log(col("n_total").cast("double") / col("cnt").cast("double")) *
          lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"), sum(col("micro_nats")).as("micro"))
      .select(col("doc_id"), col("n_tokens"),
        Det.r(col("micro").cast("double") / lit(1000000.0) / col("n_tokens").cast("double"), 6)
          .as("avg_nats"))
  }

  /** Memoized, materialized [[surprisal]] — the seam shared by
    * q_surprisal and the [[pplFilter]] band cut (the pairsCached
    * discipline: one tokenize+explode scan and one (doc, token)
    * shuffle per corpus per session).
    */
  private val surprisalMemo = graft.Memo[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame]()

  def surprisalCached(documents: DataFrame): DataFrame =
    surprisalMemo.getOrElseUpdate(documents.sparkSession,
      documents.queryExecution.analyzed.canonicalized)(
      surprisal(documents).boundedCheckpoint())

  /** Bench prewarm: the surprisal seam, itemized like the dedup/sim
    * builds so q_surprisal and q_ppl_filter time pure query cost.
    */
  def prewarm(documents: DataFrame): Seq[(String, Double)] = {
    val t0 = System.nanoTime()
    surprisalCached(documents)
    val t1 = System.nanoTime()
    // the incremental screen's store-side LM at the driver-gated
    // defaults — the filter expression must match pplIncremental's
    // exactly (same canonicalized plan = same memo key)
    storeLm(documents.filter(!(pmod(col("doc_id"), lit(10L)) === 0)), 100000L)
    val t2 = System.nanoTime()
    lmIndexDirCached(documents.filter(!(pmod(col("doc_id"), lit(10L)) === 0)), 100000L)
    val t3 = System.nanoTime()
    Seq("text_surprisal" -> ((t1 - t0) / 1e9),
      "text_store_lm" -> ((t2 - t1) / 1e9),
      "text_lm_index" -> ((t3 - t2) / 1e9))
  }

  /** q126: the CCNet perplexity-BAND filter — the consumer of the
    * surprisal family: CCNet splits a corpus into head/middle/tail
    * TERCILES of LM perplexity and keeps the head+middle (low
    * perplexity = fluent, well-edited text; the tail is rare-token
    * soup). Per scored doc: (doc_id, avg_nats, band, keep) with band
    * the tercile of its unigram surprisal and keep = band ≠ tail —
    * band in the artifact (not just the verdict) because mixture
    * design samples DIFFERENT rates per band, not only a hard cut.
    *
    * Scale shape: the per-doc scores are the memoized [[surprisalCached]]
    * seam (zero extra corpus scans alongside q_surprisal); the tercile
    * cuts are EXACT percentile_disc over the integer micro-nat domain
    * via the priceQuantiles two-level cumulative (distinct micro
    * values bucket by `micro DIV bucketMicros`; bounded constKey
    * window over bucket totals + bucket-partitioned within-bucket
    * windows + broadcast offsets — no window sees the score table in
    * one task); the cuts broadcast back onto the doc table as a
    * scan-side CASE. Integer micro-nats recover exactly from the 6-dp
    * avg_nats in both engines, and the rank convention (smallest value
    * whose cumulative count reaches ceil(p·n)) matches the oracle's
    * row_number selection ⇒ hash-exact.
    */
  def pplFilter(documents: DataFrame, bucketMicros: Long = 100000L): DataFrame = {
    val s = surprisalCached(documents)
    val m = s.select(col("doc_id"), col("avg_nats"),
      floor(col("avg_nats") * lit(1000000.0) + lit(0.5)).cast("long").as("micro"))
    Det.attachScalar(m, microTerciles(m, bucketMicros))
      .select(col("doc_id"), col("avg_nats"),
        when(col("micro") <= col("t1"), lit("head"))
          .when(col("micro") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("band"),
        when(col("micro") <= col("t2"), lit(1L)).otherwise(lit(0L)).as("keep"))
  }

  /** EXACT tercile cuts (t1, t2) over a (…, micro) frame via the
    * priceQuantiles two-level cumulative — one 1-row result, no
    * window over the score table in one task. Shared by [[pplFilter]]
    * and [[pplIncremental]] (where the cuts are the STORE's shipped
    * operating point).
    */
  private[text] def microTerciles(m: DataFrame, bucketMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = m.groupBy(col("micro")).agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", expr(s"micro DIV $bucketMicros"))
      .boundedCheckpoint()
    // ONE window spec (round 16, the priceQuantiles merge): the total
    // rides the SAME asc sort as the prefix via an unbounded frame —
    // same integer sums, one Window node + one Sort instead of two
    val wSpec = Window.partitionBy(Det.constKey(col("bucket"))).orderBy(col("bucket").asc)
    val wB = wSpec.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = wSpec.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = vals
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("btot"))
      .withColumn("offset", coalesce(sum(col("btot")).over(wB), lit(0L)))
      .withColumn("n", sum(col("btot")).over(wAll))
      .select(col("bucket"), col("offset"), col("n"))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("micro").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum", col("offset") + sum(col("cnt")).over(wIn))
    def cut(p: Double): Column =
      min(when(col("cum") >= ceil(lit(p) * col("n")).cast("long"), col("micro")))
    cum.agg(cut(1.0 / 3.0).as("t1"), cut(2.0 / 3.0).as("t2"))
  }

  /** DuckDB twin of [[pplFilter]]: the shared surprisal formulation
    * feeding plain row_number rank-selection cuts.
    */
  def sqlPplFilter(): String =
    s"""WITH ${sqlPplCtes()}
       |SELECT pm.doc_id, pm.avg_nats,
       |  CASE WHEN pm.micro <= pc.t1 THEN 'head'
       |       WHEN pm.micro <= pc.t2 THEN 'middle'
       |       ELSE 'tail' END AS band,
       |  CASE WHEN pm.micro <= pc.t2 THEN CAST(1 AS BIGINT)
       |       ELSE CAST(0 AS BIGINT) END AS keep
       |FROM pm, pc""".stripMargin

  /** The [[sqlPplFilter]] CTE chain through `pm` (per-doc micro-nat
    * scores) and `pc` (the tercile cuts) — exposed so composed
    * oracles (curation verdicts) reuse the identical derivation.
    */
  def sqlPplCtes(): String = {
    val toks = Text.sqlTokens("text")
    s"""ptok AS (
       |  SELECT doc_id, unnest($toks) AS token FROM documents
       |), ptf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM ptok GROUP BY 1, 2
       |), pv AS (
       |  SELECT token, sum(tf) AS cnt FROM ptf GROUP BY 1
       |), pn AS (
       |  SELECT sum(cnt) AS n_total FROM pv
       |), ps AS (
       |  SELECT ptf.doc_id, ptf.tf,
       |    CAST(floor(CAST(ptf.tf AS DOUBLE) *
       |      ln(CAST(pn.n_total AS DOUBLE) / CAST(pv.cnt AS DOUBLE)) *
       |      1000000.0 + 0.5) AS BIGINT) AS micro_nats
       |  FROM ptf JOIN pv USING (token), pn
       |), pd AS (
       |  SELECT doc_id,
       |    floor(CAST(sum(micro_nats) AS DOUBLE) / 1000000.0 / CAST(sum(tf) AS DOUBLE)
       |          * 1000000.0 + 0.5) / 1000000.0 AS avg_nats
       |  FROM ps GROUP BY 1
       |), pm AS (
       |  SELECT doc_id, avg_nats,
       |    CAST(floor(avg_nats * 1000000.0 + 0.5) AS BIGINT) AS micro
       |  FROM pd
       |), pr AS (
       |  SELECT micro, row_number() OVER (ORDER BY micro) AS rk,
       |         count(*) OVER () AS n
       |  FROM pm
       |), pc AS (
       |  SELECT
       |    max(CASE WHEN rk = CAST(ceil(${1.0 / 3.0} * n) AS BIGINT) THEN micro END) AS t1,
       |    max(CASE WHEN rk = CAST(ceil(${2.0 / 3.0} * n) AS BIGINT) THEN micro END) AS t2
       |  FROM pr
       |)""".stripMargin
  }

  /** q135: the INCREMENTAL perplexity screen — the [[pplFilter]]
    * contract in its crawl-ingest form, closing the last screen
    * without one (exact #107 / span #118 / embedding #108 /
    * self-screen #109 all have incremental forms; the LM screen was
    * corpus-self-estimated only): a LANDED batch doc is scored under
    * the STORE-estimated unigram LM and kept against the STORE's own
    * tercile operating point — the store ships its model (vocabulary
    * counts + cuts), the batch never re-estimates anything, exactly
    * how a production perplexity filter runs (CCNet scores crawl
    * slices under a FIXED pretrained LM).
    *
    * The store LM is add-one (Laplace) smoothed — the batch contains
    * tokens the store has never seen, where the self-estimated
    * [[surprisal]]'s raw relative frequency would be −ln 0:
    * p(w) = (c(w)+1)/(N+V+1) with c = store count (0 for OOV), N =
    * store tokens, V = store vocabulary (the +1 funds the OOV mass).
    * The cuts are terciles of the STORE's own docs scored under the
    * same smoothed LM, so keep = "would have landed in the store's
    * head/middle" — the shipped operating point, not a batch-relative
    * one. Per batch doc: (doc_id, n_tokens, avg_nats, keep).
    *
    * Scale shape: one (doc, token) keyed shuffle over each slice (the
    * store's feeds both its vocabulary rollup and its cut scoring —
    * checkpointed), the vocabulary joins token-keyed (never broadcast
    * — a 100 TB store's vocabulary is not a literal), N/V/cuts ride
    * [[Det.attachScalar]] broadcast joins, and the tercile derivation
    * is the bounded [[microTerciles]] two-level. Identical IEEE
    * smoothing sequence + micro-nat fixed point in both engines ⇒
    * hash-exact.
    */
  def pplIncremental(
      documents: DataFrame, batchMod: Long = 10,
      bucketMicros: Long = 100000L): DataFrame = {
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    pplScreenAgainst(documents.filter(isBatch), documents.filter(!isBatch), bucketMicros)
  }

  /** The screen CORE without the mod-split convention (the
    * [[graft.dedup.Dedup.screenAgainst]] shape): score an arbitrary
    * landed batch under an arbitrary store's smoothed LM and shipped
    * cut. The store-side model (vocabulary, totals, t2) is a memoized
    * seam, so a streaming caller
    * ([[graft.streaming.Events.pplScreenStream]]) pays the store's two
    * passes once and per-micro-batch cost ∝ batch. A store with no
    * tokens cannot score anything and yields an empty result (the
    * empty-corpus convention).
    */
  def pplScreenAgainst(
      newDocs: DataFrame, storeDocs: DataFrame,
      bucketMicros: Long = 100000L): DataFrame = {
    val session = newDocs.sparkSession
    import session.implicits._
    val (sv, n, v, t2) = storeLm(storeDocs, bucketMicros)
    if (v == 0L)
      return Seq.empty[(Long, Long, Double, Long)]
        .toDF("doc_id", "n_tokens", "avg_nats", "keep")
    lmScore(lmTf(newDocs), sv, n, v)
      .select(col("doc_id"), col("n_tokens"), col("avg_nats"),
        when(col("micro") <= lit(t2), lit(1L)).otherwise(lit(0L)).as("keep"))
  }

  private[text] def lmTf(slice: DataFrame): DataFrame = graft.Spread(slice)
    .withColumn("toks", Text.tokens(col("text")))
    .select(col("doc_id"), explode(col("toks")).as("token"))
    .groupBy(col("doc_id"), col("token"))
    .agg(count(lit(1)).as("tf"))

  /** Per-doc micro-nat scores under the (sv, n, v) smoothed store LM.
    * n+v+1 embeds as a literal double — identical to the computed
    * CAST the oracle runs for any realistic store (< 2^53 tokens).
    */
  private[text] def lmScore(tfFrame: DataFrame, sv: DataFrame, n: Long, v: Long): DataFrame =
    tfFrame.join(sv, Seq("token"), "left")
      .withColumn("p",
        (coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) /
          lit((n + v + 1L).toDouble))
      .withColumn("micro_nats",
        floor(col("tf").cast("double") * -log(col("p")) * lit(1000000.0) + lit(0.5))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"), sum(col("micro_nats")).as("micro_sum"))
      .select(col("doc_id"), col("n_tokens"),
        Det.r(col("micro_sum").cast("double") / lit(1000000.0) /
          col("n_tokens").cast("double"), 6).as("avg_nats"))
      .withColumn("micro",
        floor(col("avg_nats") * lit(1000000.0) + lit(0.5)).cast("long"))

  /** The memoized store-side LM model: smoothed vocabulary
    * (checkpointed), totals and the t2 cut — bounded driver scalars
    * beyond the vocabulary table. Keyed on the canonicalized store
    * plan (the setsCached discipline).
    */
  private val storeLmMemo = graft.Memo[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long),
    (DataFrame, Long, Long, Long)]()

  private def storeLm(
      storeDocs: DataFrame, bucketMicros: Long): (DataFrame, Long, Long, Long) =
    storeLmMemo.getOrElseUpdate(storeDocs.sparkSession,
      (storeDocs.queryExecution.analyzed.canonicalized, bucketMicros)) {
      val storeTf = lmTf(storeDocs).boundedCheckpoint()
      val sv = storeTf.groupBy(col("token")).agg(sum(col("tf")).as("c")).boundedCheckpoint()
      val row = sv.agg(sum(col("c")), count(lit(1))).head()
      if (row.isNullAt(0)) (sv, 0L, 0L, 0L)
      else {
        val n = row.getLong(0)
        val v = row.getLong(1)
        val t2 = microTerciles(lmScore(storeTf, sv, n, v).select(col("micro")), bucketMicros)
          .head().getLong(1)
        (sv, n, v, t2)
      }
    }

  // ------------------------------------------------------------------
  // q140: the DISK-SERVED form of q135 — the production lifecycle:
  // the store's LM is a PERSISTED artifact ([[LmIndex]] — the CCNet
  // shipped-KenLM shape, generalized to orders 1–3) and the landed
  // batch scores under the read-back model + operating point.
  // Order-1 scoring is the identical smoothing arithmetic, so the
  // disk path shares q135's DuckDB oracle verbatim: full hash-exact
  // gate.
  // ------------------------------------------------------------------
  /** Session-scoped registry of store LM artifact dirs — the
    * [[graft.dedup.Dedup.shingleIndexDirCached]] discipline: every
    * screen against the same store reads ONE persisted model (first
    * touch builds it, itemized in the bench build line).
    */
  private val lmIndexMemo = graft.Memo[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long), String]()

  private[graft] def lmIndexDirCached(
      storeDocs: DataFrame, bucketMicros: Long): String =
    lmIndexMemo.getOrElseUpdate(storeDocs.sparkSession,
      (storeDocs.queryExecution.analyzed.canonicalized, bucketMicros))({
      val dir = java.nio.file.Files.createTempDirectory("graft_lm_idx_").toString
      LmIndex.write(storeDocs, dir, order = 1, bucketMicros = bucketMicros)
      dir
    })

  /** [[pplIncremental]] served from the PERSISTED store LM — identical
    * contract and oracle; the model is the read-back [[LmIndex]]
    * artifact instead of the in-session seam.
    */
  def pplIncrementalDisk(
      documents: DataFrame, batchMod: Long = 10,
      bucketMicros: Long = 100000L): DataFrame = {
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    val dir = lmIndexDirCached(documents.filter(!isBatch), bucketMicros)
    LmIndex.score(documents.sparkSession, documents.filter(isBatch), dir)
  }

  /** DuckDB twin of [[pplIncremental]]: identical smoothed-LM scoring
    * for both slices, rank-selection store cut.
    */
  def sqlPplIncremental(batchMod: Long = 10): String = {
    val toks = Text.sqlTokens("text")
    s"""WITH pi_tok AS (
       |  SELECT doc_id, unnest($toks) AS token FROM documents
       |), pi_tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM pi_tok GROUP BY 1, 2
       |), pi_sv AS (
       |  SELECT token, sum(tf) AS c FROM pi_tf
       |  WHERE doc_id % $batchMod <> 0 GROUP BY 1
       |), pi_n AS (
       |  SELECT sum(c) AS n_store, count(*) AS v_store FROM pi_sv
       |), pi_sc AS (
       |  SELECT pi_tf.doc_id,
       |    CAST(sum(pi_tf.tf) AS BIGINT) AS n_tokens,
       |    floor(CAST(sum(CAST(floor(CAST(pi_tf.tf AS DOUBLE) *
       |        -ln((CAST(COALESCE(pi_sv.c, 0) AS DOUBLE) + 1.0)
       |            / CAST(pi_n.n_store + pi_n.v_store + 1 AS DOUBLE))
       |        * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0
       |      / CAST(sum(pi_tf.tf) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS avg_nats
       |  FROM pi_tf LEFT JOIN pi_sv USING (token), pi_n
       |  GROUP BY 1
       |), pi_m AS (
       |  SELECT doc_id, n_tokens, avg_nats,
       |    CAST(floor(avg_nats * 1000000.0 + 0.5) AS BIGINT) AS micro
       |  FROM pi_sc
       |), pi_r AS (
       |  SELECT micro, row_number() OVER (ORDER BY micro) AS rk,
       |         count(*) OVER () AS n
       |  FROM pi_m WHERE doc_id % $batchMod <> 0
       |), pi_c AS (
       |  SELECT max(CASE WHEN rk = CAST(ceil(${2.0 / 3.0} * n) AS BIGINT)
       |             THEN micro END) AS t2
       |  FROM pi_r
       |)
       |SELECT pi_m.doc_id, pi_m.n_tokens, pi_m.avg_nats,
       |  CASE WHEN pi_m.micro <= pi_c.t2 THEN CAST(1 AS BIGINT)
       |       ELSE CAST(0 AS BIGINT) END AS keep
       |FROM pi_m, pi_c WHERE pi_m.doc_id % $batchMod = 0""".stripMargin
  }

  /** Bigram-LM surprisal with unigram interpolation — the next rung of
    * the perplexity-filter ladder above [[surprisal]] (CCNet uses a
    * 5-gram KenLM; the self-estimated interpolated bigram is the
    * engine-native step in that direction and already separates
    * templated word ORDER from merely common words):
    *
    *   score(doc) = mean over bigram positions of −ln P(w2|w1),
    *   P(w2|w1)   = λ·c(w1w2)/c(w1) + (1−λ)·c(w2)/N
    *
    * Scale shape: ONE (doc, w1, w2) keyed shuffle for the per-doc
    * bigram frequencies (checkpointed — it feeds the corpus bigram
    * rollup AND the scoring join, the ngramPairs lesson); the bigram
    * and unigram tables are vocabulary-sized rollups; the corpus
    * total attaches to the VOCABULARY (p2 = c2/N computed on the
    * unigram table), never to the data-sized stream. Documents with
    * fewer than 2 tokens carry no bigrams and are excluded.
    * Determinism: the interpolation is the identical IEEE sequence in
    * both engines (integer counts, literal λ), and each per-(doc,
    * bigram) surprisal fixes to integer MICRO-NATS before the
    * order-free long per-doc sum — the [[surprisal]] policy.
    */
  def surprisalBigram(documents: DataFrame, lambda: Double = 0.75): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    // Spread: see surprisal() — the tokenize work behind BOTH rollups
    // otherwise runs on the raw scan's (single at bench scale) tasks
    val toks = graft.Spread(documents).withColumn("toks", Text.tokens(col("text")))
    val uni = toks.select(explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .boundedCheckpoint()
    val total = uni.agg(sum(col("cnt")).as("n_total"))
    val bf = toks
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> named_struct('w1', element_at(toks, i), 'w2', element_at(toks, i + 1)))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("bf"))
      .boundedCheckpoint()
    val big = bf.groupBy(col("w1"), col("w2")).agg(sum(col("bf")).as("c12"))
    val u1 = uni.select(col("token").as("w1"), col("cnt").as("c1"))
    val u2 = Det.attachScalar(uni, total)
      .select(col("token").as("w2"),
        (col("cnt").cast("double") / col("n_total").cast("double")).as("p2"))
    val p = lit(lambda) * (col("c12").cast("double") / col("c1").cast("double")) +
      lit(1.0 - lambda) * col("p2")
    // same shape as the trigram scorer: stats ride the distinct-bigram
    // table, the doc-level table shuffles once
    val bigP = big.join(u1, "w1").join(u2, "w2")
    bf.join(bigP, Seq("w1", "w2"))
      .withColumn("micro_nats",
        floor(col("bf").cast("double") * -log(p) * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("bf")).as("n_bigrams"), sum(col("micro_nats")).as("micro"))
      .select(col("doc_id"), col("n_bigrams"),
        Det.r(col("micro").cast("double") / lit(1000000.0) / col("n_bigrams").cast("double"), 6)
          .as("avg_nats"))
  }

  /** q125: interpolated TRIGRAM-LM surprisal — the last self-estimated
    * rung before an external KenLM (CCNet's 5-gram): score(doc) = mean
    * −ln P(w3|w1,w2) over trigram positions with
    *
    *   P(w3|w1,w2) = λ1·c123/c12 + λ2·c23/c2 + λ3·c3/N,  λ3 = 1−λ1−λ2
    *
    * where ALL orders are estimated over the TRIGRAM EVENT SPACE (c12
    * = count of (w1,w2) as a trigram CONTEXT, c23/c2 the suffix-pair
    * conditional, c3/N the final-token marginal — every interpolation
    * term is a proper conditional/marginal of one distribution, and
    * every table derives from the ONE checkpointed (doc,w1,w2,w3)
    * rollup: a single data-sized keyed shuffle, the [[surprisalBigram]]
    * scale discipline, with three vocabulary-sized rollups behind it).
    * Docs with <3 tokens carry no trigrams and are excluded.
    *
    * Determinism: integer counts, literal λs (λ3's shortest-repr
    * round-trips the 1−λ1−λ2 double exactly into the oracle), the
    * identical IEEE interpolation sequence in both engines, and each
    * per-(doc, trigram) surprisal fixed to integer MICRO-NATS before
    * the order-free per-doc long sum ⇒ hash-exact.
    */
  def surprisalTrigram(
      documents: DataFrame, l1: Double = 0.5, l2: Double = 0.3): DataFrame = {
    require(l1 > 0 && l2 > 0 && l1 + l2 < 1, s"lambdas must be positive and sum below 1")
    val l3 = 1.0 - l1 - l2
    // Spread: see surprisal() — parallelize the tokenize+explode scan
    val tf3 = graft.Spread(documents).withColumn("toks", Text.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 2), " +
          "i -> named_struct('w1', element_at(toks, i), 'w2', element_at(toks, i + 1), " +
          "'w3', element_at(toks, i + 2)))")).as("tg"))
      .select(col("doc_id"), col("tg.w1").as("w1"), col("tg.w2").as("w2"), col("tg.w3").as("w3"))
      .groupBy(col("doc_id"), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("tf"))
      .boundedCheckpoint()
    val tri = tf3.groupBy(col("w1"), col("w2"), col("w3")).agg(sum(col("tf")).as("c123"))
      .boundedCheckpoint()
    val ctx12 = tri.groupBy(col("w1"), col("w2")).agg(sum(col("c123")).as("c12"))
    val suf23 = tri.groupBy(col("w2"), col("w3")).agg(sum(col("c123")).as("c23"))
      .boundedCheckpoint()
    val mid2 = suf23.groupBy(col("w2")).agg(sum(col("c23")).as("c2"))
    val u3 = tri.groupBy(col("w3")).agg(sum(col("c123")).as("c3"))
    val total = u3.agg(sum(col("c3")).as("n_total"))
    val p3 = Det.attachScalar(u3, total)
      .select(col("w3"), (col("c3").cast("double") / col("n_total").cast("double")).as("p3"))
    val p = lit(l1) * (col("c123").cast("double") / col("c12").cast("double")) +
      lit(l2) * (col("c23").cast("double") / col("c2").cast("double")) +
      lit(l3) * col("p3")
    // attach every count table to the DISTINCT-trigram side first and
    // join the doc-level table ONCE: the previous shape re-shuffled
    // the (doc, trigram) table through five consecutive join keys
    // ((w1,w2,w3), (w1,w2), (w2,w3), w2, w3); the model tables are
    // vocabulary-sized, the doc table is corpus-sized (guide §2.3 —
    // shuffle the small proxy, not the payload). Same five counts meet
    // the same p expression, so values are bit-identical.
    val triP = tri.join(ctx12, Seq("w1", "w2"))
      .join(suf23, Seq("w2", "w3")).join(mid2, "w2").join(p3, "w3")
    tf3.join(triP, Seq("w1", "w2", "w3"))
      .withColumn("micro_nats",
        floor(col("tf").cast("double") * -log(p) * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_trigrams"), sum(col("micro_nats")).as("micro"))
      .select(col("doc_id"), col("n_trigrams"),
        Det.r(col("micro").cast("double") / lit(1000000.0) / col("n_trigrams").cast("double"), 6)
          .as("avg_nats"))
  }

  /** DuckDB twin of [[surprisalTrigram]] — identical trigram event
    * space, interpolation sequence and micro-nat fixed point.
    */
  def sqlSurprisalTrigram(l1: Double = 0.5, l2: Double = 0.3): String = {
    val toks = Text.sqlTokens("text")
    val l3 = 1.0 - l1 - l2
    s"""WITH t3 AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), tg0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
       |    i -> {'w1': toks[i], 'w2': toks[i + 1], 'w3': toks[i + 2]})) AS s
       |  FROM t3 WHERE len(toks) >= 3
       |), tf3 AS (
       |  SELECT doc_id, s.w1 AS w1, s.w2 AS w2, s.w3 AS w3, count(*) AS tf
       |  FROM tg0 GROUP BY 1, 2, 3, 4
       |), tri AS (
       |  SELECT w1, w2, w3, sum(tf) AS c123 FROM tf3 GROUP BY 1, 2, 3
       |), ctx12 AS (
       |  SELECT w1, w2, sum(c123) AS c12 FROM tri GROUP BY 1, 2
       |), suf23 AS (
       |  SELECT w2, w3, sum(c123) AS c23 FROM tri GROUP BY 1, 2
       |), mid2 AS (
       |  SELECT w2, sum(c23) AS c2 FROM suf23 GROUP BY 1
       |), u3 AS (
       |  SELECT w3, sum(c123) AS c3 FROM tri GROUP BY 1
       |), n AS (
       |  SELECT sum(c3) AS n_total FROM u3
       |), p3 AS (
       |  SELECT u3.w3, CAST(u3.c3 AS DOUBLE) / CAST(n.n_total AS DOUBLE) AS p3 FROM u3, n
       |), s AS (
       |  SELECT tf3.doc_id, tf3.tf,
       |    CAST(floor(CAST(tf3.tf AS DOUBLE) *
       |      -ln($l1 * (CAST(tri.c123 AS DOUBLE) / CAST(ctx12.c12 AS DOUBLE))
       |          + $l2 * (CAST(suf23.c23 AS DOUBLE) / CAST(mid2.c2 AS DOUBLE))
       |          + $l3 * p3.p3)
       |      * 1000000.0 + 0.5) AS BIGINT) AS micro_nats
       |  FROM tf3
       |  JOIN tri USING (w1, w2, w3)
       |  JOIN ctx12 USING (w1, w2)
       |  JOIN suf23 USING (w2, w3)
       |  JOIN mid2 USING (w2)
       |  JOIN p3 ON tf3.w3 = p3.w3
       |)
       |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_trigrams,
       |  floor(CAST(sum(micro_nats) AS DOUBLE) / 1000000.0 / CAST(sum(tf) AS DOUBLE)
       |        * 1000000.0 + 0.5) / 1000000.0 AS avg_nats
       |FROM s GROUP BY 1""".stripMargin
  }

  def sqlSurprisalBigram(lambda: Double = 0.75): String = {
    val toks = Text.sqlTokens("text")
    val oneMinus = 1.0 - lambda
    s"""WITH t AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), tok AS (
       |  SELECT doc_id, unnest(toks) AS token FROM t
       |), uni AS (
       |  SELECT token, count(*) AS cnt FROM tok GROUP BY 1
       |), n AS (
       |  SELECT sum(cnt) AS n_total FROM uni
       |), bg0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |    i -> {'w1': toks[i], 'w2': toks[i + 1]})) AS s
       |  FROM t WHERE len(toks) >= 2
       |), bf AS (
       |  SELECT doc_id, s.w1 AS w1, s.w2 AS w2, count(*) AS bf FROM bg0 GROUP BY 1, 2, 3
       |), big AS (
       |  SELECT w1, w2, sum(bf) AS c12 FROM bf GROUP BY 1, 2
       |), u2 AS (
       |  SELECT uni.token AS w2, CAST(uni.cnt AS DOUBLE) / CAST(n.n_total AS DOUBLE) AS p2
       |  FROM uni, n
       |), s AS (
       |  SELECT bf.doc_id, bf.bf,
       |    CAST(floor(CAST(bf.bf AS DOUBLE) *
       |      -ln($lambda * (CAST(big.c12 AS DOUBLE) / CAST(u1.cnt AS DOUBLE)) + $oneMinus * u2.p2)
       |      * 1000000.0 + 0.5) AS BIGINT) AS micro_nats
       |  FROM bf
       |  JOIN big USING (w1, w2)
       |  JOIN uni u1 ON bf.w1 = u1.token
       |  JOIN u2 ON bf.w2 = u2.w2
       |)
       |SELECT doc_id, CAST(sum(bf) AS BIGINT) AS n_bigrams,
       |  floor(CAST(sum(micro_nats) AS DOUBLE) / 1000000.0 / CAST(sum(bf) AS DOUBLE)
       |        * 1000000.0 + 0.5) / 1000000.0 AS avg_nats
       |FROM s GROUP BY 1""".stripMargin
  }

  /** DuckDB oracle — same micro-nat fixed-point formulation. */
  def sqlSurprisal(): String = {
    val toks = Text.sqlTokens("text")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($toks) AS token FROM documents
       |), tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
       |), v AS (
       |  SELECT token, sum(tf) AS cnt FROM tf GROUP BY 1
       |), n AS (
       |  SELECT sum(cnt) AS n_total FROM v
       |), s AS (
       |  SELECT tf.doc_id, tf.tf,
       |    CAST(floor(CAST(tf.tf AS DOUBLE) *
       |      ln(CAST(n.n_total AS DOUBLE) / CAST(v.cnt AS DOUBLE)) *
       |      1000000.0 + 0.5) AS BIGINT) AS micro_nats
       |  FROM tf JOIN v USING (token), n
       |)
       |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       |  floor(CAST(sum(micro_nats) AS DOUBLE) / 1000000.0 / CAST(sum(tf) AS DOUBLE)
       |        * 1000000.0 + 0.5) / 1000000.0 AS avg_nats
       |FROM s GROUP BY 1""".stripMargin
  }
}
