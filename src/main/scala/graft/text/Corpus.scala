package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Det

/** Corpus-level reporting and sampling — the two operations a
  * training-data pipeline runs between cleaning and mixing: per-slice
  * statistics (how big/long is each language slice?) and
  * deterministic stratified sampling (rebalance slices by keeping a
  * fixed per-slice fraction).
  */
object Corpus {

  /** Per-language corpus statistics with EXACT discrete percentiles
    * (value at rank ceil(p*n) in n_tokens order — a pure selection, no
    * interpolation, so the DuckDB oracle matches hash-exactly).
    *
    * Scale shape: documents first roll up to (lang, n_tokens) COUNTS —
    * one keyed shuffle with map-side partial agg — and the cumulative
    * rank runs over that rollup, whose per-language size is bounded by
    * the number of DISTINCT token counts (≤ the longest document's
    * length, independent of corpus size). The exact percentile is then
    * the smallest value whose cumulative count reaches ceil(p·n) —
    * identical to ranking every document (equal values are
    * interchangeable at a rank boundary), without the per-language
    * whole-slice sort that made the row_number formulation a one-task
    * bottleneck for the dominant language at 100 TB. [[statsApprox]]
    * remains the single-aggregation sketch alternative.
    */
  def stats(documents: DataFrame): DataFrame = {
    val rollup = graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("lang"),
        size(col("toks")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("lang"), col("n_tokens"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
    // ONE window spec (round 16): the per-language total rides the
    // SAME asc sort as the cumulative via an unbounded frame — same
    // exact integer sums, one Window node + one Sort instead of two
    val wSpec = Window.partitionBy(col("lang")).orderBy(col("n_tokens").asc)
    val wCum = wSpec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLang = wSpec.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = rollup
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wLang))
    def pct(p: Double): Column =
      min(when(col("cum") >= ceil(lit(p) * col("n")).cast("long"), col("n_tokens")))
    cum.groupBy(col("lang"))
      .agg(
        max(col("n")).as("n_docs"),
        sum(col("n_tokens") * col("cnt")).as("total_tokens"),
        Det.r(sum(col("chars")).cast("double") / max(col("n")).cast("double"), 4)
          .as("avg_chars"),
        pct(0.5).as("p50_tokens"),
        pct(0.9).as("p90_tokens"),
        pct(0.99).as("p99_tokens"))
  }

  def sqlStats: String = {
    val toks = Text.sqlTokens("text")
    def pct(p: String, as: String) =
      s"CAST(max(CASE WHEN rk = CAST(ceil($p * cnt) AS BIGINT) THEN n_tokens END) AS BIGINT) AS $as"
    s"""WITH b AS (
       |  SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n_tokens,
       |    CAST(length(text) AS BIGINT) AS n_chars
       |  FROM documents
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rk,
       |    count(*) OVER (PARTITION BY lang) AS cnt
       |  FROM b
       |)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  floor(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS avg_chars,
       |  ${pct("0.5", "p50_tokens")},
       |  ${pct("0.9", "p90_tokens")},
       |  ${pct("0.99", "p99_tokens")}
       |FROM r GROUP BY 1""".stripMargin
  }

  /** Per-language Shannon entropy of the token unigram distribution —
    * the vocabulary-concentration diagnostic next to [[stats]]'s size
    * percentiles: low entropy = templated/repetitive slice (a few
    * tokens dominate), entropy near ln(n_types) = flat vocabulary.
    * Drives mixture design and flags boilerplate-heavy slices before
    * they reach the samplers. Emits (lang, n_tokens, n_types,
    * entropy_nats).
    *
    * H = ln N − (Σ_t c_t·ln c_t)/N over token counts c_t — the
    * algebraic form whose only data-sized work is the same
    * (lang, token) keyed count rollup [[graft.text.Search.tfidfTop]]
    * and [[LangModel]] use: one shuffle with map-side partial agg,
    * then a ≤|langs|-row rollup of the vocabulary table. Window-free.
    * Determinism: each c·ln c term fixes to integer MICRO units
    * before the order-free long sum (the LangModel micro-nat policy —
    * a double sum over an unordered vocabulary rounds differently per
    * partitioning); the final expression is then one fixed IEEE
    * sequence over exact integers, identical in DuckDB.
    */
  def tokenEntropy(documents: DataFrame): DataFrame =
    // NOT Spread (round 16): tokenize + explode feed a keyed count
    // whose map-side partial agg already runs inside the scan stage —
    // per-row work too light for a repartition exchange (driver bench
    // r15: the Spread'd form was 2.1x slower at bench scale)
    documents
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("lang"), explode(col("toks")).as("token"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("micro_clnc",
        floor(col("cnt").cast("double") * log(col("cnt").cast("double")) *
          lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_types"),
        sum(col("cnt")).as("n_tokens"),
        sum(col("micro_clnc")).as("micro"))
      .select(col("lang"), col("n_tokens"), col("n_types"),
        Det.r(
          log(col("n_tokens").cast("double")) -
            col("micro").cast("double") / lit(1000000.0) / col("n_tokens").cast("double"),
          6).as("entropy_nats"))

  def sqlTokenEntropy: String = {
    val toks = Text.sqlTokens("text")
    s"""WITH tok AS (
       |  SELECT lang, unnest($toks) AS token FROM documents
       |), c AS (
       |  SELECT lang, token, count(*) AS cnt FROM tok GROUP BY 1, 2
       |), m AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
       |    CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |    CAST(sum(CAST(floor(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS micro
       |  FROM c GROUP BY 1
       |)
       |SELECT lang, n_tokens, n_types,
       |  floor((ln(CAST(n_tokens AS DOUBLE)) - CAST(micro AS DOUBLE) / 1000000.0 / CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS entropy_nats
       |FROM m""".stripMargin
  }

  /** Per-SOURCE corpus health profile — the "which crawl/source is
    * dirty" report that decides whether a source is kept, downweighted
    * or cut before mixing: (source, n_docs, total_tokens, avg_quality,
    * n_exact_dup_docs, exact_dup_frac), where a doc counts as an exact
    * dup iff its md5(text) occurs ≥2 times CORPUS-wide (cross-source
    * aware — a mirror site shows up in both sources' fractions).
    *
    * Plan: one documents scan computes tokens/quality/md5 per doc; the
    * copies table is a content-hash groupBy whose branch Catalyst
    * prunes to md5(text) only; the join back is keyed on the hash
    * (distinct-texts-sized right side, AQE-managed) and the final
    * groupBy(source) partial-aggregates to ≤|sources| rows. The mean
    * quality stages each already-6dp-rounded score to integer micro
    * units before the order-free long sum (the labelCentroids mean
    * policy) ⇒ hash-exact vs the DuckDB twin.
    */
  def sourceProfile(documents: DataFrame): DataFrame = {
    val q = Text.qualityColumns(col("toks"), col("text"))
    // NOT Spread (round 16): base is consumed TWICE (groupBy + join
    // back), so a repartition exchange would run twice per query for
    // per-row work (tokenize + quality + md5) that the driver bench
    // measured as too light to pay for it (r15: 1.6x slower Spread'd)
    val base = documents.withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), col("source"),
        q.nTokens.as("n_tokens"), q.score.as("quality_score"),
        md5(col("text").cast("binary")).as("h"))
    val copies = base.groupBy(col("h")).agg(count(lit(1)).as("n_copies"))
    base.join(copies, Seq("h"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(floor(col("quality_score") * lit(1000000.0) + lit(0.5)).cast("long")).as("micro_q"),
        sum(when(col("n_copies") >= 2, 1L).otherwise(0L)).as("n_exact_dup_docs"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        Det.r(col("micro_q").cast("double") / lit(1000000.0) / col("n_docs").cast("double"), 6)
          .as("avg_quality"),
        col("n_exact_dup_docs"),
        Det.r(col("n_exact_dup_docs").cast("double") / col("n_docs").cast("double"), 6)
          .as("exact_dup_frac"))
  }

  def sqlSourceProfile: String =
    s"""WITH sp_q AS (
       |  SELECT doc_id, n_tokens, quality_score FROM (${Text.sqlQuality})
       |), sp_b AS (
       |  SELECT doc_id, source, md5(text) AS h FROM documents
       |), sp_c AS (
       |  SELECT h, count(*) AS n_copies FROM sp_b GROUP BY 1
       |)
       |SELECT sp_b.source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(sp_q.n_tokens) AS BIGINT) AS total_tokens,
       |  floor(CAST(sum(CAST(floor(sp_q.quality_score * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
       |    / 1000000.0 / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS avg_quality,
       |  CAST(sum(CASE WHEN sp_c.n_copies >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup_docs,
       |  floor(CAST(sum(CASE WHEN sp_c.n_copies >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS exact_dup_frac
       |FROM sp_b JOIN sp_c USING (h) JOIN sp_q USING (doc_id)
       |GROUP BY 1""".stripMargin

  /** q115: the cross-source OVERLAP matrix — WHICH pairs of crawls
    * mirror each other, the diagnostic one level finer than
    * [[sourceProfile]]'s corpus-wide dup flag: before mixing, a
    * curation review wants "crawl A and crawl B share N near-dup
    * pairs touching M of A's docs" (drop one source, or dedup the
    * union — different actions). One row per unordered source pair
    * with any near-duplication across (or within — the diagonal) it:
    * (source_a ≤ source_b, n_pairs, n_docs_a, n_docs_b), endpoints
    * counted on the canonicalized side they belong to.
    *
    * Pure composition off the memoized exact n-gram pair graph
    * ([[graft.dedup.Dedup.pairsCached]] — alongside the dedup family
    * this adds zero corpus scans): the duplicates-sized pair table
    * joins the (doc_id, source) projection twice on doc_id, then a
    * ≤|sources|²-row rollup. Hash-exact vs the composed DuckDB twin
    * (the shared pair-oracle as a subquery).
    */
  def sourceOverlap(documents: DataFrame, tau: Double = 0.5): DataFrame = {
    val src = documents.select(col("doc_id"), col("source"))
    graft.dedup.Dedup.pairsCached(documents, tau)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .select(
        least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"),
        when(col("sa") <= col("sb"), col("doc_a")).otherwise(col("doc_b")).as("da"),
        when(col("sa") <= col("sb"), col("doc_b")).otherwise(col("doc_a")).as("db"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("da")).as("n_docs_a"),
        countDistinct(col("db")).as("n_docs_b"))
  }

  /** DuckDB twin of [[sourceOverlap]]: the shared n-gram pair oracle
    * as a FROM-subquery, sources joined on, identical
    * canonicalization.
    */
  def sqlSourceOverlap(tau: Double = 0.5): String =
    s"""WITH so_p AS (
       |  SELECT * FROM (
       |${graft.dedup.Dedup.sqlNgramPairs(tau)}
       |  )
       |), so_j AS (
       |  SELECT so_p.doc_a, so_p.doc_b, x.source AS sa, y.source AS sb
       |  FROM so_p
       |  JOIN documents x ON so_p.doc_a = x.doc_id
       |  JOIN documents y ON so_p.doc_b = y.doc_id
       |)
       |SELECT
       |  CASE WHEN sa <= sb THEN sa ELSE sb END AS source_a,
       |  CASE WHEN sa <= sb THEN sb ELSE sa END AS source_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(count(DISTINCT CASE WHEN sa <= sb THEN doc_a ELSE doc_b END) AS BIGINT) AS n_docs_a,
       |  CAST(count(DISTINCT CASE WHEN sa <= sb THEN doc_b ELSE doc_a END) AS BIGINT) AS n_docs_b
       |FROM so_j GROUP BY 1, 2""".stripMargin

  /** Sketch-based variant for 100 TB: single aggregation, no sort;
    * approximate percentiles (accuracy 1/relativeError). Not
    * oracle-checkable (sketch) — covered by ScalaTest against the
    * exact variant.
    */
  def statsApprox(documents: DataFrame): DataFrame =
    graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("lang"),
        size(col("toks")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        Det.r(sum(col("n_chars")).cast("double") / count(lit(1)).cast("double"), 4)
          .as("avg_chars"),
        percentile_approx(col("n_tokens"), lit(0.5), lit(10000)).as("p50_tokens"),
        percentile_approx(col("n_tokens"), lit(0.9), lit(10000)).as("p90_tokens"),
        percentile_approx(col("n_tokens"), lit(0.99), lit(10000)).as("p99_tokens"))

  /** Deterministic stratified (systematic) sampling: keep a document
    * iff doc_id % 100 < rate(lang). Reproducible across engines,
    * cluster sizes, and retries — at 100 TB a seeded random sample is
    * re-drawn per task attempt, a modulo filter is not. The filter is
    * a pure scan-side predicate (no shuffle at all).
    */
  def stratifiedSample(documents: DataFrame, pctByLang: Map[String, Int], defaultPct: Int = 10): DataFrame = {
    val rate = pctByLang.foldLeft(lit(defaultPct): Column) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    documents
      .filter(pmod(col("doc_id"), lit(100)) < rate)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** Default mix: downsample the majority language, keep the rest. */
  val defaultMix: Map[String, Int] = Map("en" -> 20, "zh" -> 60, "es" -> 60, "de" -> 60, "fr" -> 60)

  def sqlStratifiedSample(pctByLang: Map[String, Int] = defaultMix, defaultPct: Int = 10): String = {
    val cases = pctByLang.map { case (l, r) => s"WHEN lang = ${Det.sqlStr(l)} THEN $r" }.mkString(" ")
    s"""SELECT doc_id, lang, source, n_chars
       |FROM documents
       |WHERE doc_id % 100 < (CASE $cases ELSE $defaultPct END)""".stripMargin
  }

  /** Token-budget corpus mixing — sample each language slice down to
    * ≈ a target TOKEN budget (how mixtures are actually specified),
    * with a DATA-DEPENDENT rate: pass 1 aggregates per-language total
    * tokens (one tiny aggregate), pass 2 broadcasts the 5-row rate
    * table and keeps `doc_id % granularity < keep_q` — a pure
    * scan-side predicate, so the operator is two linear passes with no
    * data-sized shuffle at any scale.
    *
    * keep_q = min(granularity, (budget * granularity) DIV total) in
    * INTEGER arithmetic — exact and identical in both engines (a
    * double division could round differently at a boundary).
    *
    * granularity sets the rate resolution AND must be far smaller
    * than the per-language doc_id span — `doc_id % granularity` is
    * only a uniform systematic sample when every residue class is
    * populated many times over (granularity 100 = percent resolution;
    * raise it on corpora with billions of docs for finer rates).
    */
  def tokenBudgetSample(
      documents: DataFrame,
      budgetByLang: Map[String, Long] = defaultBudgets,
      defaultBudget: Long = 3000L,
      granularity: Int = 100): DataFrame = {
    val budget = budgetByLang.foldLeft(lit(defaultBudget): Column) { case (acc, (l, b)) =>
      when(col("lang") === l, lit(b)).otherwise(acc)
    }
    // NOT Spread (round 16): both passes are tokenize + size() into a
    // keyed/scan-side consumer — per-row work too light for the
    // repartition exchange (driver bench r15: 1.7x slower Spread'd)
    val rates = documents
      .withColumn("toks", Text.tokens(col("text")))
      .groupBy(col("lang"))
      .agg(sum(size(col("toks")).cast("long")).as("total_tokens"))
      .withColumn("budget", budget)
      .withColumn("keep_q",
        least(lit(granularity.toLong),
          expr(s"(budget * CAST($granularity AS BIGINT)) DIV total_tokens")))
      .select(col("lang"), col("keep_q"))
    documents
      .join(broadcast(rates), Seq("lang"))
      .filter(pmod(col("doc_id"), lit(granularity.toLong)) < col("keep_q"))
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), col("lang"), size(col("toks")).cast("long").as("n_tokens"))
  }

  /** Default per-language token budgets: cap the majority language
    * hard, give the rest a smaller uniform budget.
    */
  val defaultBudgets: Map[String, Long] = Map("en" -> 10000L)

  /** Temperature-based language mixing — the XLM/mBERT multilingual
    * sampling scheme: language l gets a share of the token budget
    * ∝ share_l^(1/T). T = 1 reproduces natural proportions; T > 1
    * flattens the mix (upsamples tail languages' SHARE); the explicit
    * budgets of [[tokenBudgetSample]] are the fully-manual
    * alternative. Keep rates then apply as the same pure scan-side
    * modulo predicate.
    *
    * Engine determinism: `pow` is the one op here with cross-libm ulp
    * skew — each weight is fixed to an integer MICRO-WEIGHT (6-dp
    * floor, the surprisal/ln policy) BEFORE the weight sum, and the
    * sum + keep-rate derivation is pure integer arithmetic (exact,
    * order-free, DIV), so both engines cut identically. All
    * data-dependent aggregates are over the ≤|langs|-row table
    * (constKey windows); the corpus sees one tokenize pass + one
    * broadcast-join-filtered pass.
    */
  def temperatureMix(
      documents: DataFrame,
      temperature: Double = 2.0,
      budgetTokens: Long = 20000L,
      // granularity must stay well under the id range actually present
      // (doc_id % g == doc_id when g > max id, and the predicate stops
      // sampling); 100 matches the other samplers
      granularity: Int = 100): DataFrame = {
    require(temperature > 0 && budgetTokens > 0 && granularity > 0)
    val alpha = 1.0 / temperature
    val w = Window.partitionBy(Det.constKey(col("lang")))
    val rates = graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .groupBy(col("lang"))
      .agg(sum(size(col("toks")).cast("long")).as("n_l"))
      .filter(col("n_l") > 0)
      .withColumn("n_total", sum(col("n_l")).over(w))
      .withColumn("w_int",
        floor(pow(col("n_l").cast("double") / col("n_total").cast("double"), lit(alpha)) *
          lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("sum_w", sum(col("w_int")).over(w))
      // Products staged through DECIMAL(38,0): budgetTokens*w_int*granularity
      // wraps a Long once budgetTokens exceeds ~9e10 (w_int up to 1e6,
      // granularity 100), and sum_w*n_l wraps once a language nears 1e12
      // tokens. Catalyst's IntegralDivide is exact on decimals and returns
      // LONG, so the quotient is identical to the DuckDB HUGEINT `//` twin.
      .withColumn("keep_q",
        least(lit(granularity.toLong),
          expr(s"(CAST($budgetTokens AS DECIMAL(38,0)) * w_int * $granularity) DIV " +
            "(CAST(sum_w AS DECIMAL(38,0)) * n_l)")))
      .select(col("lang"), col("keep_q"))
    graft.Spread(documents)
      .join(broadcast(rates), Seq("lang"))
      .filter(pmod(col("doc_id"), lit(granularity.toLong)) < col("keep_q"))
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), col("lang"), size(col("toks")).cast("long").as("n_tokens"))
  }

  /** q113: the DATA-RECIPE EPOCHS table — what the temperature mixture
    * of [[temperatureMix]] IMPLIES per language slice before anyone
    * samples a document: each language's token budget share
    * (∝ share^(1/T), the identical micro-weight arithmetic), the
    * EPOCHS that share demands over the tokens actually available
    * (target/avail — the "epochs" column of a LLaMA-style data-mix
    * table), and the repeat cap verdict: a language whose target
    * exceeds `maxEpochs` passes over its data is CAPPED at
    * maxEpochs·avail effective tokens (repeating a tiny slice forever
    * degrades training — the standard ≤~4-epoch guidance), leaving
    * the shortfall visible in the artifact (Σ effective < budget).
    * This is the table a recipe review reads BEFORE committing a
    * training run; [[temperatureMix]] then materializes the sample.
    *
    * One row per language: (lang, n_avail, target_tokens,
    * epochs_micro = min(target/avail, maxEpochs) in integer
    * micro-epochs, capped 0/1, effective_tokens). All data-sized work
    * is the one tokenize scan + ≤|langs|-row rollup; every ratio is
    * integer arithmetic staged through DECIMAL(38,0) (the
    * temperatureMix policy: pow fixed to micro-weights BEFORE any
    * sum, quotients via exact IntegralDivide) ⇒ hash-exact vs the
    * DuckDB twin.
    */
  def mixEpochs(
      documents: DataFrame,
      temperature: Double = 2.0,
      budgetTokens: Long = 20000L,
      maxEpochs: Int = 4): DataFrame = {
    require(temperature > 0 && budgetTokens > 0 && maxEpochs > 0)
    val alpha = 1.0 / temperature
    val w = Window.partitionBy(Det.constKey(col("lang")))
    graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .groupBy(col("lang"))
      .agg(sum(size(col("toks")).cast("long")).as("n_avail"))
      .filter(col("n_avail") > 0)
      .withColumn("n_total", sum(col("n_avail")).over(w))
      .withColumn("w_int",
        floor(pow(col("n_avail").cast("double") / col("n_total").cast("double"), lit(alpha)) *
          lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("sum_w", sum(col("w_int")).over(w))
      // the same DECIMAL(38,0) staging as temperatureMix: exact
      // products, exact integral quotients, LONG results
      .withColumn("target_tokens",
        expr(s"(CAST($budgetTokens AS DECIMAL(38,0)) * w_int) DIV sum_w"))
      .withColumn("epochs_raw",
        expr("(CAST(target_tokens AS DECIMAL(38,0)) * 1000000) DIV n_avail"))
      .withColumn("capped",
        when(col("epochs_raw") > lit(maxEpochs * 1000000L), lit(1L)).otherwise(lit(0L)))
      .select(
        col("lang"),
        col("n_avail"),
        col("target_tokens"),
        least(col("epochs_raw"), lit(maxEpochs * 1000000L)).as("epochs_micro"),
        col("capped"),
        when(col("capped") === 1L, col("n_avail") * lit(maxEpochs.toLong))
          .otherwise(col("target_tokens")).as("effective_tokens"))
  }

  /** DuckDB twin of [[mixEpochs]]: identical micro-weight + HUGEINT
    * integral arithmetic over the per-language token rollup.
    */
  def sqlMixEpochs(
      temperature: Double = 2.0,
      budgetTokens: Long = 20000L,
      maxEpochs: Int = 4): String = {
    val toks = Text.sqlTokens("text")
    val alpha = 1.0 / temperature
    val capMicro = maxEpochs * 1000000L
    s"""WITH t AS (
       |  SELECT lang, CAST(sum(len($toks)) AS BIGINT) AS n_avail
       |  FROM documents GROUP BY 1
       |), wt AS (
       |  SELECT lang, n_avail,
       |    CAST(floor(pow(CAST(n_avail AS DOUBLE) / CAST(sum(n_avail) OVER () AS DOUBLE), $alpha)
       |      * 1000000.0 + 0.5) AS BIGINT) AS w_int
       |  FROM t WHERE n_avail > 0
       |), r AS (
       |  SELECT lang, n_avail, w_int, sum(w_int) OVER () AS sum_w FROM wt
       |), tt AS (
       |  SELECT lang, n_avail,
       |    CAST((CAST($budgetTokens AS HUGEINT) * w_int) // sum_w AS BIGINT) AS target_tokens
       |  FROM r
       |), ep AS (
       |  SELECT lang, n_avail, target_tokens,
       |    CAST((CAST(target_tokens AS HUGEINT) * 1000000) // n_avail AS BIGINT) AS epochs_raw
       |  FROM tt
       |)
       |SELECT lang, n_avail, target_tokens,
       |  CAST(least(epochs_raw, $capMicro) AS BIGINT) AS epochs_micro,
       |  CAST(CASE WHEN epochs_raw > $capMicro THEN 1 ELSE 0 END AS BIGINT) AS capped,
       |  CAST(CASE WHEN epochs_raw > $capMicro THEN n_avail * $maxEpochs
       |       ELSE target_tokens END AS BIGINT) AS effective_tokens
       |FROM ep""".stripMargin
  }

  def sqlTemperatureMix(
      temperature: Double = 2.0,
      budgetTokens: Long = 20000L,
      granularity: Int = 100): String = {
    val toks = Text.sqlTokens("text")
    val alpha = 1.0 / temperature
    s"""WITH t AS (
       |  SELECT lang, CAST(sum(len($toks)) AS BIGINT) AS n_l
       |  FROM documents GROUP BY 1
       |), wt AS (
       |  SELECT lang, n_l,
       |    CAST(floor(pow(CAST(n_l AS DOUBLE) / CAST(sum(n_l) OVER () AS DOUBLE), $alpha)
       |      * 1000000.0 + 0.5) AS BIGINT) AS w_int
       |  FROM t WHERE n_l > 0
       |), r AS (
       |  SELECT lang, n_l, w_int, sum(w_int) OVER () AS sum_w FROM wt
       |), q AS (
       |  SELECT lang, CAST(least(CAST($granularity AS HUGEINT),
       |    (CAST($budgetTokens AS HUGEINT) * w_int * $granularity)
       |      // (CAST(sum_w AS HUGEINT) * n_l)) AS BIGINT) AS keep_q
       |  FROM r
       |)
       |SELECT d.doc_id, d.lang, CAST(len($toks) AS BIGINT) AS n_tokens
       |FROM documents d JOIN q ON d.lang = q.lang
       |WHERE d.doc_id % $granularity < q.keep_q""".stripMargin
  }

  def sqlTokenBudgetSample(
      budgetByLang: Map[String, Long] = defaultBudgets,
      defaultBudget: Long = 3000L,
      granularity: Int = 100): String = {
    val toks = Text.sqlTokens("text")
    val cases = budgetByLang.map { case (l, b) => s"WHEN lang = ${Det.sqlStr(l)} THEN $b" }.mkString(" ")
    s"""WITH t AS (
       |  SELECT lang, CAST(sum(len($toks)) AS BIGINT) AS total_tokens FROM documents GROUP BY 1
       |), r AS (
       |  SELECT lang, least(CAST($granularity AS BIGINT),
       |    (CAST((CASE $cases ELSE $defaultBudget END) AS BIGINT) * $granularity) // total_tokens) AS keep_q
       |  FROM t
       |)
       |SELECT d.doc_id, d.lang, CAST(len($toks) AS BIGINT) AS n_tokens
       |FROM documents d JOIN r ON d.lang = r.lang
       |WHERE d.doc_id % $granularity < r.keep_q""".stripMargin
  }

  /** Quality-WEIGHTED (soft) sampling: keep each document with
    * probability equal to its quality score — the soft alternative to
    * a hard τ cutoff (a cutoff discards borderline documents
    * entirely; weighting keeps them at a reduced rate, the usual
    * recipe compromise). One scan, pure scan-side predicate.
    *
    * The keep draw is deterministic and PORTABLE integer arithmetic:
    * u = (doc_id · 48271) mod 1e6 (the MINSTD multiplier — id-stable,
    * engine-stable, no floats) compared against the score fixed to
    * integer micro-units (the score is already 6-dp rounded, so the
    * micro conversion is exact). A float `rand() < score` would be
    * neither reproducible nor cross-engine checkable.
    */
  def qualityWeightedSample(documents: DataFrame): DataFrame = {
    val q = Text.qualityColumns(col("toks"), col("text"))
    // deliberately NOT Spread: the zero-Exchange scan-side plan is
    // this operator's pinned contract (CorpusSpec) — the draw must
    // compose into other scans without forcing a shuffle
    documents
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), col("lang"), q.score.as("quality_score"))
      .filter(pmod(col("doc_id") * lit(48271L), lit(1000000L)) <
        floor(col("quality_score") * lit(1000000.0) + lit(0.5)).cast("long"))
  }

  def sqlQualityWeightedSample(): String =
    s"""WITH q AS (
       |  SELECT doc_id, quality_score FROM (${Text.sqlQuality})
       |)
       |SELECT d.doc_id, d.lang, q.quality_score
       |FROM documents d JOIN q USING (doc_id)
       |WHERE (d.doc_id * 48271) % 1000000
       |      < CAST(floor(q.quality_score * 1000000.0 + 0.5) AS BIGINT)""".stripMargin

  /** End-to-end corpus curation — the composed pipeline a
    * training-data run actually executes, as ONE declarative plan:
    *
    *   1. language allow-list + deterministic mixture sample — both
    *      pure scan-side predicates, so they prune BEFORE any
    *      expression work (at 100 TB this is most of the win: the
    *      expensive per-row quality expressions only run on the kept
    *      slice);
    *   2. quality scoring on the surviving rows (pure Column
    *      expressions, no self-join — [[Text.qualityColumns]]);
    *   3. near-dup survivor selection: left-anti join against the
    *      losers of the GLOBAL dedup clustering
    *      ([[graft.dedup.Dedup.clusters]] over the exact ngram pair
    *      graph — global, because a kept doc's duplicate may sit
    *      outside the sampled slice, and the survivor set must not
    *      depend on the mixture).
    *
    * The anti-join shuffles on doc_id; the loser set is duplicates
    * only (≪ corpus) so AQE usually broadcasts it.
    *
    * Cost note: the pair graph comes from
    * [[graft.dedup.Dedup.pairsCached]], the per-JVM memoized
    * materialization shared with `q_dedup_clusters` and `q_dedup_best`
    * — the graph derives ONCE per (corpus, tau) even when the driver
    * gate runs all three as independent end-to-end queries.
    */
  def curate(
      documents: DataFrame,
      qualityTau: Double = 0.6,
      allowedLangs: Seq[String] = Seq("en", "es", "de", "zh"),
      mix: Map[String, Int] = defaultMix,
      defaultPct: Int = 10,
      dedupTau: Double = 0.5): DataFrame = {
    import graft.dedup.Dedup
    val losers = Dedup
      .clustersCached(Dedup.pairsCached(documents, dedupTau).select(col("doc_a"), col("doc_b")))
      .filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id"))
    val rate = mix.foldLeft(lit(defaultPct): Column) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    val q = Text.qualityColumns(col("toks"), col("text"))
    graft.Spread(documents)
      .filter(col("lang").isInCollection(allowedLangs) && pmod(col("doc_id"), lit(100)) < rate)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), col("lang"),
        q.nTokens.as("n_tokens"), q.score.as("quality_score"))
      .filter(col("quality_score") >= qualityTau)
      .join(losers, Seq("doc_id"), "left_anti")
  }

  /** q134: the full curation FUNNEL with per-stage verdicts — the
    * q_ingest_decision pattern applied to whole-corpus curation: one
    * row per document with every screen's verdict and the conjunction
    * (doc_id, keep_quality, keep_ppl, keep_dedup, keep_containment,
    * keep), so the artifact shows WHY each document was dropped and a
    * mixture designer can relax one gate without re-running the rest.
    * The four stages are the library's own operators: heuristic
    * quality (#19) at qualityTau, the CCNet perplexity band (#126 —
    * tail drops; a document with no tokens has no LM score and FAILS
    * CLOSED), near-dup cluster survivorship (#38 — min-id keeps), and
    * containment (#131 — contained-in-bigger drops).
    *
    * Scale shape: PURE COMPOSITION off the memoized seams (surprisal
    * scores, ngram pair graph, containment graph) — alongside the
    * standalone queries this adds one quality scan plus
    * duplicates-sized joins; all verdict joins key on doc_id. The
    * DuckDB twin composes the four stage oracles (recursive cluster
    * CTEs + the ppl chain + the containment cross + the quality
    * expression) ⇒ hash-exact.
    */
  def curationVerdicts(
      documents: DataFrame, qualityTau: Double = 0.6): DataFrame = {
    import graft.dedup.Dedup
    import graft.text.LangModel
    val q = Text.qualityColumns(col("toks"), col("text"))
    val base = graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"),
        when(q.score >= lit(qualityTau), lit(1L)).otherwise(lit(0L)).as("keep_quality"))
    val ppl = LangModel.pplFilter(documents).select(col("doc_id"), col("keep").as("kp"))
    val losers = Dedup.clustersQuery(documents)
      .filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id")).withColumn("lose", lit(1L))
    val cont = Dedup.containedDrop(documents).select(col("doc_id"), col("keep").as("kc"))
    base
      .join(ppl, Seq("doc_id"), "left")
      .join(losers, Seq("doc_id"), "left")
      .join(cont, Seq("doc_id"), "left")
      .select(col("doc_id"), col("keep_quality"),
        coalesce(col("kp"), lit(0L)).as("keep_ppl"),
        when(col("lose").isNull, lit(1L)).otherwise(lit(0L)).as("keep_dedup"),
        coalesce(col("kc"), lit(1L)).as("keep_containment"))
      .withColumn("keep",
        when(col("keep_quality") === 1L && col("keep_ppl") === 1L &&
          col("keep_dedup") === 1L && col("keep_containment") === 1L, lit(1L))
          .otherwise(lit(0L)))
  }

  /** DuckDB twin of [[curationVerdicts]]: the four stage oracles
    * composed — the containment cross reuses the cluster chain's `s`
    * shingle-set CTE.
    */
  def sqlCurationVerdicts(qualityTau: Double = 0.6): String =
    s"""WITH RECURSIVE ${graft.dedup.Dedup.sqlClusterCtes()},
       |${graft.text.LangModel.sqlPplCtes()}, cv_q AS (
       |  SELECT doc_id,
       |    CASE WHEN quality_score >= $qualityTau THEN CAST(1 AS BIGINT)
       |         ELSE CAST(0 AS BIGINT) END AS keep_quality
       |  FROM (${Text.sqlQuality})
       |), cv_ppl AS (
       |  SELECT pm.doc_id,
       |    CASE WHEN pm.micro <= pc.t2 THEN CAST(1 AS BIGINT)
       |         ELSE CAST(0 AS BIGINT) END AS kp
       |  FROM pm, pc
       |), cv_lose AS (
       |  SELECT doc_id FROM labels WHERE cluster_id <> doc_id
       |), cv_drop AS (
       |  SELECT DISTINCT a.doc_id
       |  FROM s a JOIN s b ON a.doc_id <> b.doc_id
       |  WHERE len(a.sh) >= 1
       |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / CAST(len(a.sh) AS DOUBLE) >= 0.8
       |    AND (len(b.sh) > len(a.sh)
       |         OR (len(b.sh) = len(a.sh) AND b.doc_id < a.doc_id))
       |)
       |SELECT cv_q.doc_id, cv_q.keep_quality,
       |  CAST(COALESCE(cv_ppl.kp, 0) AS BIGINT) AS keep_ppl,
       |  CASE WHEN cv_lose.doc_id IS NULL THEN CAST(1 AS BIGINT)
       |       ELSE CAST(0 AS BIGINT) END AS keep_dedup,
       |  CASE WHEN cv_drop.doc_id IS NULL THEN CAST(1 AS BIGINT)
       |       ELSE CAST(0 AS BIGINT) END AS keep_containment,
       |  CASE WHEN cv_q.keep_quality = 1 AND COALESCE(cv_ppl.kp, 0) = 1
       |        AND cv_lose.doc_id IS NULL AND cv_drop.doc_id IS NULL
       |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS keep
       |FROM cv_q
       |LEFT JOIN cv_ppl ON cv_q.doc_id = cv_ppl.doc_id
       |LEFT JOIN cv_lose ON cv_q.doc_id = cv_lose.doc_id
       |LEFT JOIN cv_drop ON cv_q.doc_id = cv_drop.doc_id""".stripMargin

  /** Sequence packing — the concat-and-chunk layout LLM training
    * actually uses: documents are concatenated in deterministic
    * doc_id order and chunked into fixed `seqLen`-token training
    * sequences; each document is tagged with the sequence it STARTS in
    * and its token offset inside it (a document may span a boundary —
    * that is the point of chunk packing: zero padding waste).
    *
    * The global running token offset is computed TWO-LEVEL, exactly
    * like the AUC cumulative stats: documents carry a coarse block key
    * (doc_id DIV blockSize); block totals roll up to a frame whose
    * prefix sums run under a constant key; the within-block running
    * sums are windows PARTITIONED BY block (bounded by blockSize rows)
    * with the block's global offset joined back in via broadcast. No
    * window ever sees more than max(blockSize, #blocks) rows in one
    * partition — a single global `orderBy(doc_id)` cumsum would funnel
    * the entire corpus through one task.
    *
    * blockSize balances the two levels (the sqrt trade): the default
    * 65536 keeps BOTH the per-block windows and the block rollup /
    * broadcast ≤ ~65k rows for corpora up to ~4·10^9 docs over the
    * doc_id span; beyond that, raise blockSize (or add a third level)
    * so the rollup stays bounded.
    *
    * All offset arithmetic is integer (DIV / %), bit-identical in both
    * engines.
    */
  def packSequences(
      documents: DataFrame,
      seqLen: Long = 2048,
      blockSize: Long = 65536): DataFrame =
    packByCounts(
      graft.Spread(documents)
        .withColumn("toks", Text.tokens(col("text")))
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens")),
      seqLen, blockSize)

  /** q_pack_bpe: sequence packing under the TOKENIZER's budget — the
    * production shape: a training-data layout packs by the model
    * tokenizer's counts ([[graft.text.Bpe.bpeTokenize]], the shipped
    * merges), not whitespace words (a merge-heavy document occupies
    * fewer sequence slots than its word count suggests). Same
    * two-level cumsum as [[packSequences]]; only the count column's
    * derivation changes — zero extra shuffles, the tokenize pass is
    * pure scan-side.
    */
  def packSequencesBpe(
      documents: DataFrame,
      seqLen: Long = 2048,
      blockSize: Long = 65536): DataFrame =
    packByCounts(
      graft.text.Bpe.bpeTokenize(documents)
        .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens")),
      seqLen, blockSize)

  /** q121: packing under a deterministic document SHUFFLE — the
    * training-data layout's missing half: production pipelines shuffle
    * documents BEFORE concat-and-chunk so one training sequence mixes
    * unrelated documents instead of a contiguous run of one crawl/
    * source (doc_id order IS ingestion order — packing it bakes
    * source-correlated batches into every epoch). The shuffle key is
    * the portable md5 of the doc_id string (the [[groupSample]] key:
    * engine-stable, id-correlation-free), so the "random" permutation
    * is deterministic, reproducible, and oracle-checkable.
    *
    * Same two-level global cumsum as [[packSequences]]; only the
    * ORDER changes: the coarse block key becomes the first 4 hex
    * chars of the shuffle key (65536 order-PRESERVING buckets — equal
    * hex-length means numeric prefix order == lexicographic key
    * order, so block asc + in-block (key, doc_id) asc IS the global
    * shuffle order), block offsets broadcast, in-block windows
    * bounded ~N/65536. The md5 key also load-balances the blocks by
    * construction — unlike doc_id blocks, no ingestion-time hot range
    * survives into a window partition.
    */
  def packSequencesShuffled(
      documents: DataFrame, seqLen: Long = 2048): DataFrame = {
    val counts = graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string").cast("binary")).as("okey"))
      .withColumn("blk", conv(substring(col("okey"), 1, 4), 16, 10).cast("long"))
    packCore(counts, seqLen)
  }

  /** The packing core over a provided (doc_id, n_tokens) table — the
    * two-level global cumsum (block rollup + block-partitioned
    * windows + broadcast offsets) shared by the whitespace and BPE
    * budget variants.
    */
  private def packByCounts(
      counts: DataFrame, seqLen: Long, blockSize: Long): DataFrame =
    packCore(
      counts.select(col("doc_id"), col("n_tokens"),
        col("doc_id").as("okey"), expr(s"doc_id DIV ${blockSize}L").as("blk")),
      seqLen)

  /** Shared core: concat in (blk asc, okey asc, doc_id asc) order —
    * callers must derive `blk` as an order-preserving coarsening of
    * `okey` so that order equals the global (okey, doc_id) order —
    * and chunk into seqLen-token sequences via the two-level cumsum.
    */
  private def packCore(base: DataFrame, seqLen: Long): DataFrame = {
    val wBlk = Window.partitionBy(Det.constKey(col("blk"))).orderBy(col("blk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkOffsets = base
      .groupBy(col("blk"))
      .agg(sum(col("n_tokens")).as("blk_tokens"))
      .withColumn("blk_offset", coalesce(sum(col("blk_tokens")).over(wBlk), lit(0L)))
      .select(col("blk"), col("blk_offset"))
    val wIn = Window.partitionBy(col("blk")).orderBy(col("okey").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(blkOffsets), Seq("blk"))
      .withColumn("start_off",
        col("blk_offset") + coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .select(
        col("doc_id"),
        col("n_tokens"),
        expr(s"start_off DIV ${seqLen}L").as("seq_id"),
        pmod(col("start_off"), lit(seqLen)).as("seq_offset"))
  }

  def sqlPackSequences(seqLen: Long = 2048): String = {
    // the oracle is the straightforward single-window formulation — it
    // validates the two-level decomposition against the plain cumsum
    val toks = Text.sqlTokens("text")
    s"""WITH b AS (
       |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens FROM documents
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
       |  FROM b
       |)
       |SELECT doc_id, n_tokens,
       |  start_off // $seqLen AS seq_id,
       |  start_off % $seqLen AS seq_offset
       |FROM c""".stripMargin
  }

  /** DuckDB twin of [[packSequencesBpe]]: the shared BPE token-count
    * CTE chain ([[graft.text.Bpe.sqlBpeCountCtes]]) feeding the plain
    * single-window cumsum — the same oracle shape as
    * [[sqlPackSequences]], with the budget column swapped.
    */
  def sqlPackSequencesBpe(seqLen: Long = 2048): String =
    s"""WITH ${graft.text.Bpe.sqlBpeCountCtes()}, pb AS (
       |  SELECT doc_id, CAST(n_bpe_tokens AS BIGINT) AS n_tokens FROM t
       |), pc AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
       |  FROM pb
       |)
       |SELECT doc_id, n_tokens,
       |  start_off // $seqLen AS seq_id,
       |  start_off % $seqLen AS seq_offset
       |FROM pc""".stripMargin

  private[text] final case class PackBinRow(
      doc_id: Long, n_tokens: Long, bin_id: Long, bin_offset: Long)

  /** q175: FIXED-BIN whole-document packing — first-fit-decreasing
    * (FFD) into `cap`-token bins, the layout between #49's
    * concat-and-chunk (zero waste, documents span boundaries) and
    * #124's batch-by-length (whole docs, power-of-two padding bill):
    * every training sequence holds WHOLE documents (no cross-boundary
    * attention/loss masking) and FFD keeps the padding near-optimal
    * (≤ 11/9·OPT + 6/9 bins per group; structurally, at most ONE bin
    * per group can end ≤ half full — any two would have merged).
    *
    * Packing is greedy-sequential by nature, so the 100 TB shape
    * BOUNDS the sequential scope: documents pack within PACKING GROUPS
    * of `groupSize` consecutive doc_ids (ONE shuffle on the group key;
    * each group's FFD is an in-memory O(g log g + g·bins) pass over
    * ≤ groupSize (id, count) pairs — embarrassingly parallel across
    * groups, no global state, and bin ids are globally unique by
    * construction: grp·groupSize + local index). A document longer
    * than `cap` opens its own over-full bin (nothing else fits there —
    * the no-special-case FFD convention). Empty docs hold no slot
    * (the #124 rule). Fully deterministic (sort by n_tokens desc,
    * doc_id asc) ⇒ HASH-EXACT against a DuckDB twin that replays FFD
    * as a recursive CTE over a per-group bin-load LIST — the
    * placement-for-placement same algorithm, so the oracle validates
    * the distributed decomposition, not a re-derivation.
    *
    * Output: (doc_id, n_tokens, bin_id, bin_offset) — bin_offset is
    * the token offset where the doc lands inside its bin (docs laid
    * out in placement order).
    */
  def packBins(
      documents: DataFrame, cap: Long = 512, groupSize: Long = 128): DataFrame = {
    require(cap > 0 && groupSize > 0, "cap and groupSize must be positive")
    val spark = documents.sparkSession
    import spark.implicits._
    graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .select(expr(s"doc_id DIV ${groupSize}L").as("grp"),
        col("doc_id"), col("n_tokens"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (grp, it) =>
        val docs = it.map { case (_, id, n) => (id, n) }.toArray
          .sortBy { case (id, n) => (-n, id) }
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        docs.iterator.map { case (id, n) =>
          var i = 0
          while (i < loads.length && loads(i) + n > cap) i += 1
          val off = if (i < loads.length) loads(i) else 0L
          if (i < loads.length) loads(i) += n else loads += n
          PackBinRow(id, n, grp * groupSize + i, off)
        }
      }
      .toDF()
  }

  /** DuckDB twin of [[packBins]]: the SAME FFD, replayed as a
    * recursive CTE advancing every group in rank lockstep with the
    * bin-load list as carried state (list_position over a lambda is
    * the first-fit probe; it returns 0, not NULL, on no-fit).
    */
  def sqlPackBins(cap: Long = 512, groupSize: Long = 128): String = {
    val toks = Text.sqlTokens("text")
    s"""WITH RECURSIVE pbd AS (
       |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens,
       |    doc_id // $groupSize AS grp
       |  FROM documents WHERE len($toks) >= 1
       |), pbr AS MATERIALIZED (
       |  SELECT doc_id, n_tokens, grp,
       |    CAST(row_number() OVER (PARTITION BY grp
       |      ORDER BY n_tokens DESC, doc_id ASC) AS BIGINT) AS rk
       |  FROM pbd
       |), pfd(grp, rk, loads, bin_idx) AS (
       |  SELECT grp, rk, [n_tokens], CAST(1 AS BIGINT) FROM pbr WHERE rk = 1
       |  UNION ALL
       |  SELECT grp, rk,
       |    CASE WHEN fit = 0 THEN list_append(loads, n_tokens)
       |         ELSE loads[1:fit-1] || [loads[fit] + n_tokens] || loads[fit+1:] END,
       |    CAST(CASE WHEN fit = 0 THEN len(loads) + 1 ELSE fit END AS BIGINT)
       |  FROM (
       |    SELECT p.grp, r.rk, p.loads, r.n_tokens,
       |      coalesce(list_position(
       |        list_transform(p.loads, x -> x + r.n_tokens <= $cap),
       |        true), 0) AS fit
       |    FROM pfd p JOIN pbr r ON r.grp = p.grp AND r.rk = p.rk + 1
       |  )
       |), pasn AS (
       |  SELECT b.doc_id, b.n_tokens, b.grp, b.rk, f.bin_idx
       |  FROM pbr b JOIN pfd f ON b.grp = f.grp AND b.rk = f.rk
       |)
       |SELECT doc_id, n_tokens,
       |  CAST(grp * $groupSize + bin_idx - 1 AS BIGINT) AS bin_id,
       |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY grp, bin_idx ORDER BY rk
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS bin_offset
       |FROM pasn""".stripMargin
  }

  // ------------------------------------------------------------------
  // q179: the export-shard MANIFEST.
  // ------------------------------------------------------------------

  /** q179: the export-shard manifest — the table the WRITE side of the
    * pipeline reads: documents in ingestion order (doc_id) cut into
    * output shards of ~`targetTokens` tokens each (a doc belongs to
    * the shard its running-total START falls in — whole docs, shard
    * sizes within ±1 doc of target), rolled up to one row per shard:
    * doc count, token/char totals, the [first_doc, last_doc] id range
    * a reader needs to locate a document without an index, and the
    * fill fraction against target (the skew audit: a fill_frac far
    * from 1.0 means one giant document blew through its boundary).
    *
    * The running total is the SAME two-level cumsum as [[packSequences]]
    * (per-block sums broadcast as offsets + a within-block window) —
    * never a single global sort partition — followed by one ≤
    * corpus_tokens/targetTokens-row groupBy. The DuckDB twin replays
    * the plain single-window cumsum, so the oracle validates the
    * two-level decomposition against the textbook formulation,
    * hash-exactly (integer tokens, one IEEE divide, 6-dp fixing).
    */
  def shardManifest(
      documents: DataFrame,
      targetTokens: Long = 4096,
      blockSize: Long = 65536): DataFrame = {
    require(targetTokens > 0, "targetTokens must be positive")
    val counts = graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        expr(s"doc_id DIV ${blockSize}L").as("blk"))
    val wBlk = Window.partitionBy(Det.constKey(col("blk")))
      .orderBy(col("blk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkOffsets = counts
      .groupBy(col("blk"))
      .agg(sum(col("n_tokens")).as("blk_tokens"))
      .withColumn("blk_offset", coalesce(sum(col("blk_tokens")).over(wBlk), lit(0L)))
      .select(col("blk"), col("blk_offset"))
    val wIn = Window.partitionBy(col("blk")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .join(broadcast(blkOffsets), Seq("blk"))
      .withColumn("start_off",
        col("blk_offset") + coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .withColumn("shard_id", expr(s"start_off DIV ${targetTokens}L"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .withColumn("fill_frac",
        Det.r(col("n_tokens").cast("double") / targetTokens, 6))
  }

  /** DuckDB twin of [[shardManifest]]: the plain one-window running
    * total (what the two-level form decomposes) + the same rollup.
    */
  def sqlShardManifest(targetTokens: Long = 4096): String = {
    val toks = Text.sqlTokens("text")
    s"""WITH smb AS (
       |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens,
       |    CAST(len(text) AS BIGINT) AS n_chars
       |  FROM documents
       |), smc AS (
       |  SELECT doc_id, n_tokens, n_chars,
       |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS start_off
       |  FROM smb
       |)
       |SELECT start_off // $targetTokens AS shard_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       |  floor(CAST(sum(n_tokens) AS DOUBLE) / $targetTokens
       |    * 1000000.0 + 0.5) / 1000000.0 AS fill_frac
       |FROM smc GROUP BY 1""".stripMargin
  }

  /** q124: the PADDING BILL of batch-by-length serving — the layout
    * decision packing competes with: SFT and inference batch documents
    * of similar length and pad to the bucket cap instead of
    * concatenating across boundaries (loss masking / per-example
    * attention make chunk packing awkward there), and every bucket
    * pays (cap − n_tokens) wasted positions per doc. This artifact is
    * the table that decision reads: per power-of-two bucket the doc
    * count, real tokens, padded tokens and waste fraction.
    *
    * The bucket cap is INTEGER-exact in both engines: cap = n rounded
    * up to a power of two via the BINARY-STRING length (length(bin(n))
    * = floor(log2 n)+1 — a float ceil(log2 n) can land exact powers of
    * two differently per libm). One scan + a ≤64-row groupBy (caps are
    * powers of two of a long); empty docs hold no batch slot and are
    * excluded. waste_frac = padded/capacity is one IEEE division of
    * two exact longs + 6-dp rounding ⇒ hash-exact.
    */
  def lengthBuckets(documents: DataFrame): DataFrame =
    graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .select(size(col("toks")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .withColumn("fl", expr("shiftleft(1L, length(bin(n_tokens)) - 1)"))
      .withColumn("bucket_cap",
        when(col("n_tokens") === col("fl"), col("n_tokens")).otherwise(col("fl") * 2))
      .groupBy(col("bucket_cap"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .select(col("bucket_cap"), col("n_docs"), col("total_tokens"),
        (col("bucket_cap") * col("n_docs") - col("total_tokens")).as("padded_tokens"),
        Det.r((col("bucket_cap") * col("n_docs") - col("total_tokens")).cast("double") /
          (col("bucket_cap") * col("n_docs")).cast("double"), 6).as("waste_frac"))

  /** DuckDB twin of [[lengthBuckets]]: identical binary-string cap. */
  def sqlLengthBuckets(): String = {
    val toks = Text.sqlTokens("text")
    s"""WITH lb AS (
       |  SELECT CAST(len($toks) AS BIGINT) AS n_tokens FROM documents
       |  WHERE len($toks) >= 1
       |), lc AS (
       |  SELECT n_tokens,
       |    CASE WHEN n_tokens = (CAST(1 AS BIGINT) << (length(bin(n_tokens)) - 1))
       |         THEN n_tokens
       |         ELSE (CAST(1 AS BIGINT) << length(bin(n_tokens))) END AS bucket_cap
       |  FROM lb
       |)
       |SELECT bucket_cap,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(bucket_cap * count(*) - sum(n_tokens) AS BIGINT) AS padded_tokens,
       |  floor(CAST(bucket_cap * count(*) - sum(n_tokens) AS DOUBLE)
       |    / CAST(bucket_cap * count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS waste_frac
       |FROM lc GROUP BY 1""".stripMargin
  }

  /** DuckDB twin of [[packSequencesShuffled]]: the plain single-window
    * cumsum over the (md5 key, doc_id) order — validating both the
    * two-level decomposition AND the hex-prefix block coarsening.
    */
  def sqlPackSequencesShuffled(seqLen: Long = 2048): String = {
    val toks = Text.sqlTokens("text")
    s"""WITH shb AS (
       |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens,
       |    md5(CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents
       |), shc AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
       |  FROM shb
       |)
       |SELECT doc_id, n_tokens,
       |  start_off // $seqLen AS seq_id,
       |  start_off % $seqLen AS seq_offset
       |FROM shc""".stripMargin
  }

  /** Per-language n-gram vocabulary: the k most frequent bigrams of
    * every language slice (corpus drift / boilerplate reporting).
    *
    * Exact TWO-PHASE top-k: bigram counts (one keyed shuffle with
    * map-side partial agg) are first reduced to the top k per
    * (lang, hash-bucket) — every gram lives in exactly one bucket, so
    * the global per-language top k is a subset of the union of bucket
    * top-ks — and only then ranked per language over <= buckets*k
    * rows. The dominant language's full distinct-gram table never
    * sorts in one window partition (the q_corpus_stats weakness, fixed
    * by construction here).
    */
  // ------------------------------------------------------------------
  // q182: the vocabulary COVERAGE ladder.
  // ------------------------------------------------------------------

  /** q182: token-occurrence coverage at every power-of-two vocabulary
    * size — the tokenizer-sizing table (what share of the corpus does
    * a top-N vocab cover? where does coverage flatten?): one row per
    * vocab_size ∈ {1, 2, 4, …, V} with the occurrences covered by the
    * top-vocab_size types (frequency desc, token asc ties) and the
    * 6-dp coverage fraction.
    *
    * The scale trick: NEVER rank the vocabulary globally (a 100 TB
    * corpus has ~10⁸ types; a global rank window is a single-partition
    * sort — the q_corpus_stats weakness). Within a frequency CLASS
    * (all types with count c) every member contributes identically, so
    * exact top-N coverage is a function of the COUNT HISTOGRAM alone:
    * cum_mass_before(class) + (N − cum_types_before(class))·c for the
    * class the Nth rank falls in. The histogram (distinct count
    * values — thousands, not the vocabulary) takes one extra tf
    * groupBy; the cumsums ride a window over that tiny frame; each
    * class EMITS the ladder rungs 2^j that land inside it (integer
    * log2 via the #124 binary-string-length trick — no float log, no
    * range join, no BNLJ), and the exact-V full-vocab row unions in
    * from the last class (distinct() absorbs the V-is-a-power-of-two
    * overlap, where both rows are identical by the algebra above).
    * Integer masses + one IEEE divide + 6-dp ⇒ hash-exact.
    */
  def vocabCoverage(documents: DataFrame): DataFrame = {
    val hist = graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .select(explode(col("toks")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("n_types"))
    // ONE window spec (round 16): the totals are full-frame SUMS of the
    // base columns over the SAME desc sort (= the max of the cumulative
    // they replaced — equal by exact integer algebra), so the four
    // window expressions share one Window node + one Sort instead of
    // two dependent nodes with separate sorts
    val wSpec = Window.partitionBy(Det.constKey(col("c"))).orderBy(col("c").desc)
    val w = wSpec.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = wSpec.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("ctb", coalesce(sum(col("n_types")).over(w), lit(0L)))
      .withColumn("mtb", coalesce(sum(col("n_types") * col("c")).over(w), lit(0L)))
      .withColumn("ct", col("ctb") + col("n_types"))
      .withColumn("mt", col("mtb") + col("n_types") * col("c"))
      .withColumn("v_total", sum(col("n_types")).over(wAll))
      .withColumn("m_total", sum(col("n_types") * col("c")).over(wAll))
    val pow2 = (c: String) => expr(s"shiftleft(1L, CAST($c AS INT))")
    val rungs = cum
      .withColumn("jmin",
        when((col("ctb") + 1) === expr("shiftleft(1L, length(bin(ctb + 1)) - 1)"),
          expr("length(bin(ctb + 1)) - 1"))
          .otherwise(expr("length(bin(ctb + 1))")).cast("long"))
      .withColumn("jmax", expr("length(bin(ct)) - 1").cast("long"))
      .filter(col("jmin") <= col("jmax"))
      .select(explode(sequence(col("jmin"), col("jmax"))).as("j"),
        col("ctb"), col("mtb"), col("c"), col("m_total"))
      .select(pow2("j").as("vocab_size"),
        (col("mtb") + (pow2("j") - col("ctb")) * col("c"))
          .as("covered_occurrences"),
        col("m_total").as("total_occurrences"))
    val full = cum.filter(col("ct") === col("v_total"))
      .select(col("v_total").as("vocab_size"),
        col("mt").as("covered_occurrences"),
        col("m_total").as("total_occurrences"))
    rungs.union(full).distinct()
      .withColumn("coverage_frac",
        Det.r(col("covered_occurrences").cast("double") /
          col("total_occurrences"), 6))
  }

  /** DuckDB twin of [[vocabCoverage]]: the same histogram → cumsum →
    * per-class rung emission, bin()-length log2 and all.
    */
  def sqlVocabCoverage(): String = {
    val toks = Text.sqlTokens("text")
    s"""WITH vtf AS (
       |  SELECT t, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest($toks) AS t FROM documents) GROUP BY 1
       |), vh AS (
       |  SELECT c, CAST(count(*) AS BIGINT) AS n_types FROM vtf GROUP BY 1
       |), vc AS (
       |  SELECT c, n_types,
       |    CAST(coalesce(sum(n_types) OVER (ORDER BY c DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS ctb,
       |    CAST(coalesce(sum(n_types * c) OVER (ORDER BY c DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS mtb
       |  FROM vh
       |), vx AS (
       |  SELECT *, ctb + n_types AS ct, mtb + n_types * c AS mt,
       |    CASE WHEN (ctb + 1) = (CAST(1 AS BIGINT) << (length(bin(ctb + 1)) - 1))
       |         THEN length(bin(ctb + 1)) - 1
       |         ELSE length(bin(ctb + 1)) END AS jmin,
       |    length(bin(ctb + n_types)) - 1 AS jmax,
       |    max(ctb + n_types) OVER () AS v_total,
       |    max(mtb + n_types * c) OVER () AS m_total
       |  FROM vc
       |), vr AS (
       |  SELECT CAST(CAST(1 AS BIGINT) << CAST(j AS INT) AS BIGINT) AS vocab_size,
       |    CAST(mtb + ((CAST(1 AS BIGINT) << CAST(j AS INT)) - ctb) * c AS BIGINT)
       |      AS covered_occurrences,
       |    CAST(m_total AS BIGINT) AS total_occurrences
       |  FROM (SELECT *, unnest(generate_series(jmin, jmax)) AS j
       |        FROM vx WHERE jmin <= jmax)
       |  UNION
       |  SELECT CAST(v_total AS BIGINT), CAST(mt AS BIGINT), CAST(m_total AS BIGINT)
       |  FROM vx WHERE ct = v_total
       |)
       |SELECT DISTINCT vocab_size, covered_occurrences, total_occurrences,
       |  floor(CAST(covered_occurrences AS DOUBLE) / CAST(total_occurrences AS DOUBLE)
       |    * 1000000.0 + 0.5) / 1000000.0 AS coverage_frac
       |FROM vr""".stripMargin
  }

  def ngramVocab(documents: DataFrame, k: Int = 10, buckets: Int = 64): DataFrame = {
    val grams = graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .select(col("lang"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1))))
          .as("gram"))
    val counts = grams
      .groupBy(col("lang"), col("gram"))
      .agg(count(lit(1)).as("n_occurrences"))
    val wBucket = Window
      .partitionBy(col("lang"), pmod(xxhash64(col("gram")), lit(buckets)))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
    val wLang = Window.partitionBy(col("lang"))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
    counts
      .withColumn("brk", row_number().over(wBucket))
      .filter(col("brk") <= k)
      .withColumn("rank", row_number().over(wLang).cast("long"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("gram"), col("n_occurrences"))
  }

  def sqlNgramVocab(k: Int = 10): String = {
    val toks = Text.sqlTokens("text")
    s"""WITH t AS (
       |  SELECT lang, $toks AS toks FROM documents
       |), g AS (
       |  SELECT lang,
       |    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS gram
       |  FROM t WHERE len(toks) >= 2
       |), c AS (
       |  SELECT lang, gram, CAST(count(*) AS BIGINT) AS n_occurrences FROM g GROUP BY 1, 2
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY lang
       |    ORDER BY n_occurrences DESC, gram ASC) AS "rank"
       |  FROM c
       |)
       |SELECT lang, "rank", gram, n_occurrences FROM r WHERE "rank" <= $k""".stripMargin
  }

  /** Exact corpus-wide heavy hitters (tokens with frequency share
    * above 1/t) via the classic TWO-PASS sketch-then-recount design:
    *
    *   pass 1 — a single global [[graft.functions.MisraGries]]
    *   aggregate over the exploded token stream. Each partition
    *   reduces to a ≤ k-counter summary, so the only thing crossing
    *   the network is one tiny sketch per partition (vs a plain
    *   `groupBy(token)` that shuffles the full distinct-token table —
    *   data-sized for an open vocabulary at 100 TB). The MG guarantee
    *   (freq > n/(k+1) ⇒ present) with k+1 ≥ t makes the candidate
    *   set a SUPERSET of the true heavy hitters.
    *
    *   pass 2 — exact recount restricted to candidates: the ≤ k-row
    *   candidate list broadcasts, the corpus streams through the
    *   semi-join filter map-side, and the recount groupBy shuffles
    *   ≤ k distinct keys. Exact counts ⇒ exact final threshold filter
    *   ⇒ the output equals the naive full groupBy (oracle-checkable)
    *   with no approximation surviving.
    *
    * Threshold is the integer predicate `cnt · t > n` — no floating
    * division at the decision boundary in either engine.
    */
  def heavyHitters(documents: DataFrame, t: Int = 200, k: Int = 400): DataFrame = {
    require(k + 1 >= t,
      s"k=$k counters cannot guarantee freq > n/$t heavy hitters (need k+1 >= t)")
    val tokens = graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .select(explode(col("toks")).as("token"))
    val sketch = tokens.agg(
      graft.functions.GraftFunctions.misraGries(col("token"), k).as("cands"),
      count(lit(1)).as("n"))
    val candidates = sketch
      .select(explode(col("cands")).as("c"), col("n"))
      .select(col("c").getField("item").as("token"), col("n"))
    tokens
      .join(broadcast(candidates), Seq("token"))
      .groupBy(col("token"), col("n"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * lit(t.toLong) > col("n"))
      .select(col("token"), col("n_occurrences"),
        Det.r(col("n_occurrences").cast("double") / col("n").cast("double"), 6)
          .as("share"))
  }

  /** Oracle: the naive exact formulation — full token groupBy +
    * HAVING over the same integer threshold predicate.
    */
  def sqlHeavyHitters(t: Int = 200): String = {
    val toks = Text.sqlTokens("text")
    s"""WITH tok AS (
       |  SELECT unnest($toks) AS token FROM documents
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n FROM tok
       |)
       |SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences,
       |  floor(CAST(count(*) AS DOUBLE) / CAST(tot.n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS share
       |FROM tok, tot
       |GROUP BY token, tot.n
       |HAVING count(*) * $t > tot.n""".stripMargin
  }

  /** Exact k-docs-per-language sample — the fixed-size counterpart of
    * [[stratifiedSample]]'s rate predicate (eval sets, human-review
    * batches, per-slice debugging need exactly-k, not ≈rate).
    *
    * Selection order is a PORTABLE deterministic hash — md5 of the
    * decimal doc_id string (same bytes in any engine), never
    * xxhash64/rand (Spark-internal / nondeterministic) — so the
    * chosen set is stable across engines and runs, and any id-range
    * correlation in the data (doc_id ordered by crawl date) can't
    * bias it the way `doc_id % q` can.
    *
    * Scale: the same two-phase exact top-k as [[ngramVocab]] — rank
    * inside (lang, internal-hash bucket) first and only the
    * ≤ buckets·k survivors rank per language, so the dominant
    * language never sorts in one window task. The bucket key may be
    * Spark-internal (it only PRUNES — a doc in the language's global
    * hash-order top-k is in its bucket's top-k a fortiori); the
    * decisive order is the portable md5.
    */
  def groupSample(documents: DataFrame, k: Int = 25, buckets: Int = 16): DataFrame = {
    val keyed = documents.select(col("doc_id"), col("lang"), col("source"),
      md5(col("doc_id").cast("string").cast("binary")).as("h"))
    val wBucket = Window
      .partitionBy(col("lang"), pmod(xxhash64(col("doc_id")), lit(buckets)))
      .orderBy(col("h").asc, col("doc_id").asc)
    val w = Window.partitionBy(col("lang")).orderBy(col("h").asc, col("doc_id").asc)
    keyed
      .withColumn("brk", row_number().over(wBucket))
      .filter(col("brk") <= k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("doc_id"), col("source"))
  }

  def sqlGroupSample(k: Int = 25): String =
    s"""WITH r AS (
       |  SELECT lang, doc_id, source,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
       |  FROM documents
       |)
       |SELECT lang, CAST(rn AS BIGINT) AS "rank", doc_id, source
       |FROM r WHERE rn <= $k""".stripMargin

  /** Overlapping token-window chunking — the retrieval/embedding
    * layout step (RAG pipelines index fixed-size overlapping chunks,
    * not whole documents). Chunk starts are every `stride` tokens
    * while < n_tokens, each chunk spanning ≤ `chunkTokens` tokens
    * (trailing chunks run short, never dropped).
    *
    * Scale shape: pure SCAN-SIDE fan-out — tokens materialized once
    * per doc, starts generated by `sequence()` + explode inside the
    * scan stage, chunk content by `slice` on the materialized array.
    * No shuffle, no window, no join: the operator is
    * embarrassingly parallel at any scale, like [[packSequences]]'s
    * fan-out half. Chunk identity = portable md5 of the
    * space-joined token slice (what a downstream embedder/indexer
    * would key on).
    */
  def chunk(documents: DataFrame, chunkTokens: Int = 64, stride: Int = 32): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    documents
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("start", explode(sequence(lit(0L), col("n_tokens") - 1L, lit(stride.toLong))))
      .select(
        col("doc_id"),
        expr(s"start DIV $stride").as("chunk_id"),
        col("start").as("start_tok"),
        size(slice(col("toks"), (col("start") + 1L).cast("int"), lit(chunkTokens)))
          .cast("long").as("chunk_len"),
        md5(array_join(slice(col("toks"), (col("start") + 1L).cast("int"), lit(chunkTokens)), " ")
          .cast("binary")).as("chunk_md5"))
  }

  def sqlChunk(chunkTokens: Int = 64, stride: Int = 32): String = {
    val toks = Text.sqlTokens("text")
    s"""WITH t AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), n AS (
       |  SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
       |), s AS (
       |  SELECT doc_id, toks, unnest(range(0, n, $stride)) AS start FROM n
       |)
       |SELECT doc_id,
       |  CAST(start // $stride AS BIGINT) AS chunk_id,
       |  CAST(start AS BIGINT) AS start_tok,
       |  CAST(len(toks[start + 1 : start + $chunkTokens]) AS BIGINT) AS chunk_len,
       |  md5(array_to_string(toks[start + 1 : start + $chunkTokens], ' ')) AS chunk_md5
       |FROM s""".stripMargin
  }

  // ------------------------------------------------------------------
  // q186: the deterministic TRAINING-ORDER shuffle (shard + position).
  // ------------------------------------------------------------------

  /** q186: the global training-order shuffle, decomposed the only way
    * it scales — a training run wants every epoch to read the corpus
    * in a fixed pseudo-random order, but a literal ORDER BY
    * hash(doc_id) over 100 TB is a global sort into one ordered
    * output. The standard decomposition (what data loaders actually
    * consume): hash every doc to a SHARD (read order across shards is
    * the loader's round-robin), and order within the shard by the
    * same hash — so the only wide operations are ONE hash partition
    * and a per-shard sort bounded to corpus/nShards (pick nShards so
    * a shard is file-sized; the exponent is in the operator, not the
    * plan). Output is the manifest a loader reads: (doc_id, shard,
    * pos).
    *
    * Determinism is engine-portable md5 arithmetic, no engine RNG:
    * order key = md5('<seed>:' || doc_id) (hex strings compare
    * identically in both engines on lowercase hex); shard = the key's
    * first 6 nibbles as an integer mod nShards (the
    * [[graft.streaming.Events]] arrival-delay convention: conv() on
    * the Spark side, strpos-nibble arithmetic in DuckDB). Re-keying
    * with a new seed re-shuffles; same seed replays bit-identically —
    * exactly the epoch-reshuffle contract (#113's mixEpochs reads
    * this operator's keys at epoch granularity).
    */
  def corpusShuffle(
      documents: DataFrame, nShards: Int = 64, seed: String = "shuf1"): DataFrame = {
    require(nShards >= 1, "corpusShuffle needs at least one shard")
    val keyed = documents
      .select(col("doc_id"),
        md5(concat(lit(seed), lit(":"), col("doc_id").cast("string")).cast("binary")).as("okey"))
      .withColumn("shard",
        pmod(expr("CAST(conv(substring(okey, 1, 6), 16, 10) AS BIGINT)"), lit(nShards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col("okey"), col("doc_id"))
    keyed.select(col("doc_id"), col("shard"),
      (row_number().over(w) - 1).cast("long").as("pos"))
  }

  def sqlCorpusShuffle(nShards: Int = 64, seed: String = "shuf1"): String = {
    val hexAlphabet = "0123456789abcdef"
    val nib6 = (1 to 6).map { i =>
      s"(strpos('$hexAlphabet', substr(okey, $i, 1)) - 1) * ${1L << (4 * (6 - i))}"
    }.mkString("(", " + ", ")")
    s"""WITH k AS (
       |  SELECT doc_id, md5('$seed:' || CAST(doc_id AS VARCHAR)) AS okey FROM documents
       |), s AS (
       |  SELECT doc_id, okey, $nib6 % $nShards AS shard FROM k
       |)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY okey, doc_id) - 1 AS BIGINT) AS pos
       |FROM s""".stripMargin
  }

  def sqlCurate(
      qualityTau: Double = 0.6,
      allowedLangs: Seq[String] = Seq("en", "es", "de", "zh"),
      mix: Map[String, Int] = defaultMix,
      defaultPct: Int = 10,
      dedupTau: Double = 0.5): String = {
    val langs = allowedLangs.map(Det.sqlStr).mkString(", ")
    val cases = mix.map { case (l, r) => s"WHEN d.lang = ${Det.sqlStr(l)} THEN $r" }.mkString(" ")
    s"""WITH RECURSIVE ${graft.dedup.Dedup.sqlClusterCtes(dedupTau)}, q AS (
       |${Text.sqlQuality}
       |)
       |SELECT d.doc_id, d.lang, q.n_tokens, q.quality_score
       |FROM documents d JOIN q ON d.doc_id = q.doc_id
       |WHERE d.lang IN ($langs)
       |  AND d.doc_id % 100 < (CASE $cases ELSE $defaultPct END)
       |  AND q.quality_score >= $qualityTau
       |  AND NOT EXISTS (SELECT 1 FROM labels l
       |                  WHERE l.doc_id = d.doc_id AND l.cluster_id <> l.doc_id)""".stripMargin
  }
}
