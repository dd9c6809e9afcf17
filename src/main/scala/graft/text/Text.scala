package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Det

/** Text-analysis operators for LLM-data pipelines: tokenization,
  * quality scoring, language ID, document fingerprinting.
  *
  * Everything is pure `Column` expression code (zero UDFs): splits,
  * regexes, and higher-order array functions all stay inside
  * whole-stage codegen, and each operator has an exact DuckDB twin
  * (the `sql*` builders) generated from the SAME constants so the
  * oracle can never drift from the Spark plan.
  */
object Text {

  /** Whitespace tokens, empties dropped (so leading/trailing/double
    * spaces cannot skew counts). array_remove (a native codegen
    * collection expression) drops the empties a leading separator or
    * empty string produces — identical output to the
    * filter(length > 0) lambda form, without dispatching an
    * interpreted closure per token on every text scan.
    */
  def tokens(c: Column): Column =
    array_remove(split(c, "\\s+"), "")

  def sqlTokens(x: String): String =
    s"list_filter(regexp_split_to_array($x, '\\s+'), t -> len(t) > 0)"

  /** BPE-ish lexer tokens: letter runs, digit runs, single other
    * non-space chars — the classic pre-tokenization regex.
    */
  val bpeFragment = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokens(c: Column): Column = regexp_extract_all(c, lit(bpeFragment), lit(0))
  def sqlBpeTokens(x: String): String = s"regexp_extract_all($x, '$bpeFragment')"

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")
  private def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Per-document token statistics (whitespace + BPE-ish counts,
    * mean word length).
    */
  def tokenStats(documents: DataFrame): DataFrame =
    // toks materialized once — the expression is referenced three
    // times below and an inlined regex split would run per reference.
    // NOT Spread (round 16): one whitespace split + size() per row is
    // too light to pay for a repartition exchange — the round-15
    // driver bench measured the Spread'd form 1.5x SLOWER at bench
    // scale, and a well-split production scan parallelizes the map-
    // side partial agg anyway.
    documents.withColumn("toks", tokens(col("text"))).select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens"),
      size(bpeTokens(col("text"))).cast("long").as("n_bpe_tokens"),
      Det.r(
        // Σ token lengths == length of the zero-separator concatenation
        // — concat_ws/length are native codegen, vs an interpreted
        // aggregate() fold dispatching a closure per token; length()
        // returns int, so cast long BEFORE anything could overflow
        length(concat_ws("", col("toks"))).cast("long").cast("double") /
          greatest(size(col("toks")), lit(1)).cast("double"), 4).as("mean_token_len"))

  def sqlTokenStats: String = {
    val toks = sqlTokens("text")
    s"""SELECT doc_id,
       |  len($toks) AS n_tokens,
       |  len(${sqlBpeTokens("text")}) AS n_bpe_tokens,
       |  floor(CAST(list_sum(list_transform($toks, t -> len(t))) AS DOUBLE)
       |        / CAST(greatest(len($toks), 1) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS mean_token_len
       |FROM documents""".stripMargin
  }

  /** Quality scoring: stopword ratio, alpha-char ratio, punctuation
    * ratio, length credit — combined into one deterministic [0,1]
    * score (the usual cheap pre-filter before expensive dedup).
    */
  /** The quality expressions over a MATERIALIZED token column — the
    * reusable core of [[quality]], exposed so composed pipelines
    * (corpus curation) can compute the score alongside other columns
    * without a self-join. All values are rounded to 6 dp identically
    * to the SQL twin.
    */
  final case class QualityCols(
      nTokens: Column, stopwordRatio: Column, alphaRatio: Column,
      punctRatio: Column, score: Column)

  def qualityColumns(toks: Column, text: Column): QualityCols = {
    val nToks    = greatest(size(toks), lit(1)).cast("double")
    val nChars   = greatest(length(text), lit(1)).cast("double")
    val stopHits = size(filter(toks, t => t.isInCollection(stopwords))).cast("double")
    val alpha    = size(regexp_extract_all(text, lit("[a-zA-Z]"), lit(0))).cast("double")
    val punct    = size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double")
    val swRatio    = stopHits / nToks
    val alphaRatio = alpha / nChars
    val punctRatio = punct / nChars
    val lenCredit  = least(size(toks).cast("double") / lit(50.0), lit(1.0))
    QualityCols(
      size(toks).cast("long"),
      Det.r(swRatio, 6),
      Det.r(alphaRatio, 6),
      Det.r(punctRatio, 6),
      Det.r(swRatio * lit(0.3) + alphaRatio * lit(0.3) + lenCredit * lit(0.2) +
        (lit(1.0) - punctRatio) * lit(0.2), 6))
  }

  def quality(documents: DataFrame): DataFrame = {
    val q = qualityColumns(col("toks"), col("text"))
    graft.Spread(documents).withColumn("toks", tokens(col("text"))).select(
      col("doc_id"),
      q.nTokens.as("n_tokens"),
      q.stopwordRatio.as("stopword_ratio"),
      q.alphaRatio.as("alpha_ratio"),
      q.punctRatio.as("punct_ratio"),
      q.score.as("quality_score"))
  }

  def sqlQuality: String = {
    val toks = sqlTokens("text")
    val r6   = (x: String) => s"floor(($x) * 1000000.0 + 0.5) / 1000000.0"
    val sw    = s"CAST(len(list_filter($toks, t -> list_contains(${sqlList(stopwords)}, t))) AS DOUBLE) / CAST(greatest(len($toks), 1) AS DOUBLE)"
    val alpha = s"CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) / CAST(greatest(len(text), 1) AS DOUBLE)"
    val punct = s"CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) / CAST(greatest(len(text), 1) AS DOUBLE)"
    val cred  = s"least(CAST(len($toks) AS DOUBLE) / 50.0, 1.0)"
    s"""SELECT doc_id,
       |  len($toks) AS n_tokens,
       |  ${r6(sw)} AS stopword_ratio,
       |  ${r6(alpha)} AS alpha_ratio,
       |  ${r6(punct)} AS punct_ratio,
       |  ${r6(s"($sw) * 0.3 + ($alpha) * 0.3 + ($cred) * 0.2 + (1.0 - ($punct)) * 0.2")} AS quality_score
       |FROM documents""".stripMargin
  }

  // ------------------------------------------------------------------
  // q178: the quality-threshold ABLATION ladder.
  // ------------------------------------------------------------------

  /** q178: what each candidate quality CUTOFF would cost — the table a
    * curation decision actually reads before anyone picks the #19
    * score's filter threshold: for every threshold τ = k/steps, the
    * documents and tokens that survive `quality_score ≥ τ` and the
    * surviving fraction of each. One pass computes the whole ladder —
    * no per-threshold re-scan: each doc EXPLODES to the thresholds it
    * passes (score ∈ [0,1] by construction ⇒ k ≤ floor(score·steps),
    * ≤ `steps` rows per doc, integer-exact membership), and a single
    * groupBy(k) with map-side partial aggregation collapses the
    * blow-up to ≤ steps rows per task before the one shuffle — at
    * 100 TB the exchange carries ≤ steps × tasks tiny rows. Totals
    * ride a window over the ≤ steps-row result (τ=0 keeps everything,
    * so max over the ladder IS the corpus total). Fractions are one
    * IEEE divide + 6-dp fixing ⇒ hash-exact.
    */
  def filterAblation(documents: DataFrame, steps: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = qualityColumns(col("toks"), col("text"))
    val wAll = Window.partitionBy(Det.constKey(col("th_step")))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    graft.Spread(documents)
      .withColumn("toks", tokens(col("text")))
      .select(q.nTokens.as("n_tokens"), q.score.as("score"))
      .select(col("n_tokens"),
        explode(sequence(lit(0L),
          least(floor(col("score") * steps).cast("long"), lit(steps - 1L))))
          .as("th_step"))
      .groupBy(col("th_step"))
      .agg(count(lit(1)).as("docs_kept"), sum(col("n_tokens")).as("tokens_kept"))
      .withColumn("total_docs", max(col("docs_kept")).over(wAll))
      .withColumn("total_tokens", max(col("tokens_kept")).over(wAll))
      .select(col("th_step"),
        (col("th_step").cast("double") / steps).as("threshold"),
        col("docs_kept"), col("tokens_kept"),
        Det.r(col("docs_kept").cast("double") / col("total_docs"), 6)
          .as("docs_frac"),
        Det.r(col("tokens_kept").cast("double") / col("total_tokens"), 6)
          .as("tokens_frac"))
  }

  /** DuckDB twin of [[filterAblation]]: the #19 score CTE, the same
    * generate_series explode, and window-max totals.
    */
  def sqlFilterAblation(steps: Int = 20): String =
    s"""WITH faq AS (${sqlQuality.replace("\n", "\n  ")}
       |), fae AS (
       |  SELECT n_tokens,
       |    unnest(generate_series(0, least(CAST(floor(quality_score * $steps) AS BIGINT), ${steps - 1}))) AS th_step
       |  FROM faq
       |), faa AS (
       |  SELECT th_step, CAST(count(*) AS BIGINT) AS docs_kept,
       |    CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
       |  FROM fae GROUP BY 1
       |)
       |SELECT th_step, CAST(th_step AS DOUBLE) / $steps AS threshold,
       |  docs_kept, tokens_kept,
       |  floor(CAST(docs_kept AS DOUBLE) / CAST(max(docs_kept) OVER () AS DOUBLE)
       |    * 1000000.0 + 0.5) / 1000000.0 AS docs_frac,
       |  floor(CAST(tokens_kept AS DOUBLE) / CAST(max(tokens_kept) OVER () AS DOUBLE)
       |    * 1000000.0 + 0.5) / 1000000.0 AS tokens_frac
       |FROM faa""".stripMargin

  /** The Gopher rule-set stop words (Rae et al. 2021, Appendix A13:
    * "contains at least two of the following English words: the, be,
    * to, of, and, that, have, with").
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-rule bundle (Rae et al. 2021, Appendix A13) — the
    * named per-rule FILTER next to #19's blended score: one row per
    * document with every rule's verdict and the conjunction, so the
    * curation artifact shows WHICH rule dropped a doc (the published
    * pipeline discipline: rules are reported individually, tuned
    * individually).
    *
    * Word-level rules (the line-level bullet/ellipsis rules live at a
    * line seam this corpus doesn't have — documents are single-line by
    * construction, TESTDATA.md):
    *   1. word count in [minWords, maxWords]        (published 50..100k)
    *   2. mean word length in [3, 10] chars         (published values)
    *   3. symbol-to-word ratio ('#' or '...') ≤ 0.1 (published value)
    *   4. ≥ 80% of words contain an alphabetic char (published value)
    *   5. ≥ minStopwords DISTINCT [[gopherStopwords]] present
    *      (published 2; the query entry pins 1 — this synthetic corpus
    *      tops out at one distinct stop word per doc, so the published
    *      cut would degenerate to keep=false corpus-wide)
    *
    * Every rule is evaluated in INTEGER arithmetic (3·n ≤ Σlen ≤ 10·n,
    * 10·symbols ≤ n, 5·alpha ≥ 4·n) so the DuckDB twin is hash-exact
    * with no float rounding seam. One corpus scan, all expressions
    * codegen (split + higher-order array functions), no shuffle at
    * all — the 100 TB shape for a per-doc filter.
    */
  def gopherFilter(
      documents: DataFrame,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minStopwords: Long = 2L): DataFrame = {
    val toks = col("toks")
    graft.Spread(documents).withColumn("toks", tokens(col("text"))).select(
      col("doc_id"),
      size(toks).cast("long").as("n_words"),
      length(concat_ws("", toks)).cast("long").as("sum_word_chars"),
      size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("long").as("n_alpha_words"),
      size(array_intersect(toks, lit(gopherStopwords.toArray))).cast("long")
        .as("n_stop_distinct"),
      size(regexp_extract_all(col("text"), lit("#|\\.\\.\\."), lit(0))).cast("long")
        .as("n_symbols"))
      .select(
        col("*"),
        (col("n_words") >= minWords && col("n_words") <= maxWords).as("ok_word_count"),
        (col("sum_word_chars") >= col("n_words") * 3L &&
          col("sum_word_chars") <= col("n_words") * 10L).as("ok_mean_word_len"),
        (col("n_symbols") * 10L <= col("n_words")).as("ok_symbol_ratio"),
        (col("n_alpha_words") * 5L >= col("n_words") * 4L).as("ok_alpha_words"),
        (col("n_stop_distinct") >= minStopwords).as("ok_stopwords"))
      .withColumn("keep",
        col("ok_word_count") && col("ok_mean_word_len") && col("ok_symbol_ratio") &&
          col("ok_alpha_words") && col("ok_stopwords"))
  }

  def sqlGopherFilter(
      minWords: Long = 50L, maxWords: Long = 100000L,
      minStopwords: Long = 2L): String = {
    val toks = sqlTokens("text")
    s"""WITH gt AS (
       |  SELECT doc_id,
       |    CAST(len($toks) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform($toks, t -> len(t))), 0) AS BIGINT) AS sum_word_chars,
       |    CAST(len(list_filter($toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
       |    CAST(len(list_intersect($toks, ${sqlList(gopherStopwords)})) AS BIGINT) AS n_stop_distinct,
       |    CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT) AS n_symbols
       |  FROM documents
       |), gr AS (
       |  SELECT *,
       |    (n_words >= $minWords AND n_words <= $maxWords) AS ok_word_count,
       |    (sum_word_chars >= n_words * 3 AND sum_word_chars <= n_words * 10) AS ok_mean_word_len,
       |    (n_symbols * 10 <= n_words) AS ok_symbol_ratio,
       |    (n_alpha_words * 5 >= n_words * 4) AS ok_alpha_words,
       |    (n_stop_distinct >= $minStopwords) AS ok_stopwords
       |  FROM gt
       |)
       |SELECT *,
       |  (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
       |   AND ok_alpha_words AND ok_stopwords) AS keep
       |FROM gr""".stripMargin
  }

  /** C4 quality-rule bundle (Raffel et al. 2020 §2.2; per-rule
    * provenance documented by Dodge et al. 2021) — the OTHER canonical
    * named filter next to [[gopherFilter]], with the same per-rule
    * verdict discipline: one row per document, every rule's verdict
    * plus the conjunction, so the curation artifact shows WHICH rule
    * dropped a doc.
    *
    * C4's rules are line- and page-level; this corpus is single-line
    * by construction (TESTDATA.md) so line==doc==page and every rule
    * lands at the one seam:
    *   1. ≥ minWords words               (published: 5 per line)
    *   2. ends in terminal punctuation   (published: `.` `!` `?` `"`)
    *   3. ≥ minSentences sentences       (published: 3 per page;
    *      counted as sentence-terminal marks)
    *   4. no curly brace                 (the code screen)
    *   5. no "lorem ipsum"               (placeholder-text screen)
    *   6. no "javascript" word           (cookie/JS-boilerplate screen)
    *   7. no blocklist word              (the published list is the
    *      LDNOOBW "bad words" list — shipped here as a parameterized
    *      seam; the list itself is data, not code)
    *
    * Rules 2 and 3 read punctuation this synthetic corpus does not
    * contain (zero `.`/`!`/`?` corpus-wide) — enforcing them would
    * degenerate keep to false on every row, so the query entry pins
    * `enforceTerminal = enforceSentences = false`: the verdict columns
    * are still computed and emitted (a real corpus flips the flags
    * back on), they just don't gate `keep` here. The remaining rules
    * are exact string/array predicates ⇒ the DuckDB twin is hash-exact
    * with no float seam. One corpus scan, all codegen expressions,
    * shuffle-free — the 100 TB shape for a per-doc filter.
    */
  def c4Filter(
      documents: DataFrame,
      minWords: Long = 5L, minSentences: Long = 3L,
      blocklist: Seq[String] = Seq.empty,
      enforceTerminal: Boolean = true,
      enforceSentences: Boolean = true): DataFrame = {
    val low = col("low_toks")
    val base = graft.Spread(documents)
      .withColumn("low_toks", tokens(lower(col("text"))))
      .select(
        col("doc_id"),
        size(col("low_toks")).cast("long").as("n_words"),
        size(regexp_extract_all(col("text"), lit("[.!?]"), lit(0))).cast("long")
          .as("n_sentences"),
        col("text").rlike("[.!?\"]$").as("ok_terminal_punct"),
        (!col("text").contains("{")).as("ok_no_brace"),
        (!lower(col("text")).contains("lorem ipsum")).as("ok_no_lorem"),
        (!array_contains(low, "javascript")).as("ok_no_javascript"),
        (if (blocklist.isEmpty) lit(true)
         else size(array_intersect(low, lit(blocklist.toArray))) === 0)
          .as("ok_no_badwords"))
      .select(
        col("doc_id"), col("n_words"), col("n_sentences"),
        (col("n_words") >= minWords).as("ok_min_words"),
        col("ok_terminal_punct"),
        (col("n_sentences") >= minSentences).as("ok_min_sentences"),
        col("ok_no_brace"), col("ok_no_lorem"), col("ok_no_javascript"),
        col("ok_no_badwords"))
    base.withColumn("keep",
      col("ok_min_words") && col("ok_no_brace") && col("ok_no_lorem") &&
        col("ok_no_javascript") && col("ok_no_badwords") &&
        (if (enforceTerminal) col("ok_terminal_punct") else lit(true)) &&
        (if (enforceSentences) col("ok_min_sentences") else lit(true)))
  }

  def sqlC4Filter(
      minWords: Long = 5L, minSentences: Long = 3L,
      blocklist: Seq[String] = Seq.empty,
      enforceTerminal: Boolean = true,
      enforceSentences: Boolean = true): String = {
    val low = sqlTokens("lower(text)")
    val badw =
      if (blocklist.isEmpty) "TRUE"
      else s"len(list_intersect($low, ${sqlList(blocklist)})) = 0"
    val term = if (enforceTerminal) " AND ok_terminal_punct" else ""
    val sent = if (enforceSentences) " AND ok_min_sentences" else ""
    s"""WITH ct AS (
       |  SELECT doc_id,
       |    CAST(len($low) AS BIGINT) AS n_words,
       |    CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_sentences,
       |    regexp_matches(text, '[.!?"]$$') AS ok_terminal_punct,
       |    NOT contains(text, '{') AS ok_no_brace,
       |    NOT contains(lower(text), 'lorem ipsum') AS ok_no_lorem,
       |    NOT list_contains($low, 'javascript') AS ok_no_javascript,
       |    $badw AS ok_no_badwords
       |  FROM documents
       |), cr AS (
       |  SELECT doc_id, n_words, n_sentences,
       |    (n_words >= $minWords) AS ok_min_words,
       |    ok_terminal_punct,
       |    (n_sentences >= $minSentences) AS ok_min_sentences,
       |    ok_no_brace, ok_no_lorem, ok_no_javascript, ok_no_badwords
       |  FROM ct
       |)
       |SELECT *,
       |  (ok_min_words AND ok_no_brace AND ok_no_lorem
       |   AND ok_no_javascript AND ok_no_badwords$term$sent) AS keep
       |FROM cr""".stripMargin
  }

  /** Stopword-hit language ID: hit counts per language's marker set,
    * argmax with a fixed tie-break order. A cheap n-gram-free heuristic
    * that is exactly reproducible in SQL (real systems plug a model in
    * at this seam; the Spark plumbing is identical).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
    "zh" -> Seq("shi", "bu", "wo", "zhe", "ge"))

  /** Language-ID evaluation against the declared ground truth — the
    * confusion matrix + per-truth-language accuracy that tells you
    * whether the heuristic is trustworthy enough to drive the
    * allow-list/mixture samplers. One ≤|langs|²-row aggregate over
    * the langId scan; accuracy rides a per-truth-language bounded
    * window (never a data-sized partition).
    */
  def langIdEval(documents: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("declared_lang"))
    langId(documents)
      .groupBy(col("declared_lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_truth", sum(col("n")).over(w))
      .select(col("declared_lang"), col("predicted_lang"), col("n"),
        Det.r(col("n").cast("double") / col("n_truth").cast("double"), 6).as("share"),
        when(col("declared_lang") === col("predicted_lang"), lit(1L)).otherwise(0L)
          .as("is_correct"))
  }

  def sqlLangIdEval: String =
    s"""WITH p AS ($sqlLangId), c AS (
       |  SELECT declared_lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
       |  FROM p GROUP BY 1, 2
       |)
       |SELECT declared_lang, predicted_lang, n,
       |  floor(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY declared_lang) AS DOUBLE)
       |        * 1000000.0 + 0.5) / 1000000.0 AS share,
       |  CAST(CASE WHEN declared_lang = predicted_lang THEN 1 ELSE 0 END AS BIGINT) AS is_correct
       |FROM c""".stripMargin

  def langId(documents: DataFrame): DataFrame = {
    // The hit counts are MATERIALIZED as columns before the argmax
    // fold (round 16): folding over the count EXPRESSIONS expanded
    // each size(filter(...)) combinatorially inside the nested CASE —
    // a ~30 KB expression tree per output column (slow analysis +
    // codegen, and interpreted fallback risk), where folding over
    // column REFERENCES keeps the tree ~100 nodes. Values are
    // identical: same counts, same strictly-greater fold.
    val hitCols = langMarkers.map { case (lang, ws) =>
      size(filter(col("toks"), t => t.isInCollection(ws))).as(s"h_$lang")
    }
    val best = langMarkers.tail.foldLeft(
      struct(col(s"h_${langMarkers.head._1}").as("h"), lit(langMarkers.head._1).as("l"))) {
      case (acc, (lang, _)) =>
        when(col(s"h_$lang") > acc.getField("h"),
          struct(col(s"h_$lang").as("h"), lit(lang).as("l"))).otherwise(acc)
    }
    graft.Spread(documents).withColumn("toks", tokens(col("text")))
      .select(col("doc_id") +: col("lang") +: hitCols: _*)
      .select(
        col("doc_id"),
        col("lang").as("declared_lang"),
        best.getField("l").as("predicted_lang"),
        best.getField("h").cast("long").as("marker_hits"))
  }

  def sqlLangId: String = {
    val toks = sqlTokens("text")
    val hits = langMarkers.map { case (lang, ws) =>
      lang -> s"len(list_filter($toks, t -> list_contains(${sqlList(ws)}, t)))"
    }
    // same left fold as the Spark plan: strictly-greater replaces
    val bestExpr = hits.tail.foldLeft(s"struct_pack(h := ${hits.head._2}, l := '${hits.head._1}')") {
      case (acc, (lang, h)) =>
        s"CASE WHEN $h > ($acc).h THEN struct_pack(h := $h, l := '$lang') ELSE $acc END"
    }
    s"""WITH b AS (SELECT doc_id, lang, $bestExpr AS best FROM documents)
       |SELECT doc_id, lang AS declared_lang, best.l AS predicted_lang,
       |  CAST(best.h AS BIGINT) AS marker_hits
       |FROM b""".stripMargin
  }

  /** Shingle fingerprint: minimum md5 over 3-token shingles (a
    * content-defined fingerprint stable under doc reordering of
    * surrounding corpus; md5-hex string min is exactly portable across
    * engines). Docs shorter than 3 tokens fall back to md5(text).
    */
  val shingleSize = 3

  /** Shingles from an ALREADY-MATERIALIZED token column. Callers must
    * bind `toks` to a real column (withColumn), not pass the tokens()
    * expression inline: this expression references `toks` four times
    * (size + three element_at), and an inlined regex split would be
    * re-evaluated for every reference — the difference is ~40x on the
    * minhash path at sf0.1.
    */
  def shinglesFrom(toks: Column, full: Column): Column =
    when(size(toks) >= shingleSize,
      transform(sequence(lit(1), size(toks) - lit(shingleSize - 1)),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array(full))

  def shingles(c: Column): Column = shinglesFrom(tokens(c), c)

  def sqlShingles(x: String): String = {
    val toks = sqlTokens(x)
    s"""CASE WHEN len($toks) >= $shingleSize
       | THEN list_transform(range(1, len($toks) - ${shingleSize - 2}),
       |        i -> $toks[i] || ' ' || $toks[i + 1] || ' ' || $toks[i + 2])
       | ELSE [$x] END""".stripMargin.replace("\n", "")
  }

  /** Scrub regexes — raw strings valid in BOTH Java regex and RE2
    * (DuckDB), so one constant feeds both engines.
    */
  val emailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  val urlRe   = """https?://[^\s]+"""

  /** Normalization + redaction scrub — the standard pre-tokenization
    * cleaning pass of a training-data pipeline: lowercase, redact
    * emails and URLs to fixed placeholder tokens (with counts kept as
    * signals), collapse whitespace runs, trim. Pure per-row Column
    * expressions: scan-side, no shuffle at all.
    */
  def scrub(documents: DataFrame): DataFrame = {
    val lowered = lower(col("text"))
    val scrubbed = trim(regexp_replace(
      regexp_replace(regexp_replace(lowered, emailRe, "<email>"), urlRe, "<url>"),
      """\s+""", " "))
    graft.Spread(documents).select(
      col("doc_id"),
      size(regexp_extract_all(lowered, lit(emailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(lowered, lit(urlRe), lit(0))).cast("long").as("n_urls"),
      scrubbed.as("scrub_text"))
  }

  def sqlScrub: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(lower(text), '$emailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(lower(text), '$urlRe')) AS BIGINT) AS n_urls,
       |  trim(regexp_replace(
       |    regexp_replace(regexp_replace(lower(text), '$emailRe', '<email>', 'g'), '$urlRe', '<url>', 'g'),
       |    '\\s+', ' ', 'g')) AS scrub_text
       |FROM documents""".stripMargin

  /** Repetition scoring (the Gopher/C4-style repetitiousness filters):
    * per document, the fraction of all bigrams taken by the single most
    * frequent bigram (`top_bigram_frac`) and the fraction of trigram
    * occurrences that are repeats (`dup_trigram_frac` = 1 −
    * distinct/total). High values flag boilerplate, keyword stuffing,
    * and degenerate generations — the standard cheap repetition signal
    * on corpora with no line structure.
    *
    * Shape: n-grams are EXPLODED and counted with plain codegen
    * aggregates (two keyed shuffles with map-side partial agg), never
    * folded with interpreted higher-order lambdas — same lesson as the
    * MinHash path. Short docs (no bigrams/trigrams) score 0 via the
    * left join back to the doc list.
    */
  /** Per-doc repetition signals as a PURE SCAN-SIDE PROJECTION: the
    * native [[graft.functions.RepetitionStats]] expression computes
    * all four gram statistics in one local pass per row, so the query
    * has ZERO exchanges on a real multi-file table (the [[graft.Spread]]
    * guard only round-robins when a single-file scan under-parallelizes
    * local runs; the former explode → two gram-table shuffles →
    * join-back formulation moved ~2× the corpus over the network — for
    * numbers every row can compute by itself). Division-by-zero
    * edges (docs under 2/3 tokens) collapse to 0.0 exactly as the
    * oracle's COALESCE does: 0/0 is null, coalesced before rounding.
    */
  def repetition(documents: DataFrame): DataFrame = {
    val rs = graft.functions.GraftFunctions.repetitionStats(tokens(col("text")))
    graft.Spread(documents)
      .select(col("doc_id"), rs.as("rs"))
      .select(
        col("doc_id"),
        col("rs.tot2").as("n_bigrams"),
        Det.r(coalesce(
          col("rs.top2").cast("double") /
            when(col("rs.tot2") > 0, col("rs.tot2").cast("double")),
          lit(0.0)), 6).as("top_bigram_frac"),
        Det.r(coalesce(
          lit(1.0) - col("rs.dis3").cast("double") /
            when(col("rs.tot3") > 0, col("rs.tot3").cast("double")),
          lit(0.0)), 6).as("dup_trigram_frac"))
  }

  def sqlRepetition: String = {
    val toks = sqlTokens("text")
    def gramSel(n: Int) = {
      val parts = (0 until n).map(k => s"toks[i + $k]").mkString(" || ' ' || ")
      s"""SELECT doc_id, $n AS n,
         |  unnest(list_transform(range(1, len(toks) - ${n - 2}), i -> $parts)) AS gram
         |FROM t WHERE len(toks) >= $n""".stripMargin
    }
    s"""WITH t AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), g AS (
       |${gramSel(2)}
       |UNION ALL
       |${gramSel(3)}
       |), c AS (
       |  SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3
       |), a AS (
       |  SELECT doc_id,
       |    max(CASE WHEN n = 2 THEN cnt END) AS top2,
       |    sum(CASE WHEN n = 2 THEN cnt END) AS tot2,
       |    count(CASE WHEN n = 3 THEN 1 END) AS dis3,
       |    sum(CASE WHEN n = 3 THEN cnt END) AS tot3
       |  FROM c GROUP BY 1
       |)
       |SELECT d.doc_id,
       |  CAST(COALESCE(tot2, 0) AS BIGINT) AS n_bigrams,
       |  floor(COALESCE(CAST(top2 AS DOUBLE) / CAST(tot2 AS DOUBLE), 0.0) * 1000000.0 + 0.5) / 1000000.0 AS top_bigram_frac,
       |  floor(COALESCE(1.0 - CAST(dis3 AS DOUBLE) / CAST(tot3 AS DOUBLE), 0.0) * 1000000.0 + 0.5) / 1000000.0 AS dup_trigram_frac
       |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id""".stripMargin
  }

  def fingerprint(documents: DataFrame): DataFrame =
    graft.Spread(documents)
      .withColumn("toks", tokens(col("text")))
      .withColumn("sh", shinglesFrom(col("toks"), col("text")))
      .select(
        col("doc_id"),
        size(col("sh")).cast("long").as("n_shingles"),
        array_min(transform(col("sh"), s => md5(s.cast("binary")))).as("fingerprint"))

  def sqlFingerprint: String =
    s"""SELECT doc_id,
       |  len(${sqlShingles("text")}) AS n_shingles,
       |  list_aggregate(list_transform(${sqlShingles("text")}, s -> md5(s)), 'min') AS fingerprint
       |FROM documents""".stripMargin

  // ------------------------------------------------------------------
  // q187: main-content EXTRACTION from markup (the boilerplate strip).
  // ------------------------------------------------------------------

  /** The deterministic MARKUP each doc receives before the extractor
    * measures it (the planting discipline — this corpus is plain
    * canonical text, so the crawl-HTML structure the extractor exists
    * to remove is planted from doc_id arithmetic and the DuckDB twin
    * replays it):
    *   - doc_id % 3 == 0 → plain (the extractor must pass it through);
    *   - doc_id % 3 == 1 → a full HTML page: head with script+style
    *     blocks, body wrapping the text in <h1>, a nav div and a
    *     footer paragraph AFTER it (tags stripped, script/style/nav
    *     CONTENT removed, body text kept);
    *   - doc_id % 3 == 2 → an entity-dressed paragraph: the text plus
    *     a suffix exercising the &amp;/&lt;/&gt;/&nbsp; decodes.
    * Every pattern below is shared Java-regex/RE2 syntax: lazy
    * quantifiers and inline (?s), NO backreferences (RE2 has none —
    * script and style are two separate replaces, not <(script|style)>
    * ...</\1>).
    */
  private def plantedMarkup(text: Column, docId: Column): Column =
    when(pmod(docId, lit(3L)) === 1L,
      concat(
        lit("<html><head><title>doc</title><script type=\"text/javascript\">var x = 1; track();</script>" +
          "<style>.nav { color: red; }</style></head><body><h1>"),
        text,
        lit("</h1><div class=\"nav\">home about contact</div></body></html>")))
      .when(pmod(docId, lit(3L)) === 2L,
        concat(lit("<p>"), text, lit(" &amp; more &lt;soon&gt;&nbsp;</p><br/>")))
      .otherwise(text)

  private val headPat = "(?s)<head[^>]*>.*?</head>"
  private val scriptPat = "(?s)<script[^>]*>.*?</script>"
  private val stylePat = "(?s)<style[^>]*>.*?</style>"
  private val navPat = "(?s)<div class=\"(nav|footer)\">.*?</div>"
  private val tagPat = "<[^>]+>"

  private def extractText(raw: Column): Column = {
    // the whole head goes first (title/meta are chrome, not content);
    // script/style repeat AFTER it for their in-body occurrences
    val noHead = regexp_replace(raw, headPat, " ")
    val noScript = regexp_replace(noHead, scriptPat, " ")
    val noStyle = regexp_replace(noScript, stylePat, " ")
    val noNav = regexp_replace(noStyle, navPat, " ")
    val noTags = regexp_replace(noNav, tagPat, " ")
    // entity decode order: named entities first, the bare ampersand
    // LAST (the classic double-decode pitfall: "&amp;lt;" must become
    // "&lt;" the TEXT, not "<")
    val decoded =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&nbsp;", " "),
            "&lt;", "<"),
          "&gt;", ">"),
        "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** q187: main-content extraction — the markup strip every crawl
    * pipeline runs BEFORE any quality/dedup operator sees the text
    * (the trafilatura/resiliparse stage, in its deterministic
    * regex-pipeline form): script/style blocks dropped WITH their
    * content, declared-boilerplate containers (nav/footer divs)
    * dropped with theirs, remaining tags stripped to whitespace, the
    * four core entities decoded, whitespace collapsed. Markup is
    * planted per [[plantedMarkup]] (this corpus is plain text);
    * extraction is ONE chain of scan-side regexp_replace calls —
    * zero shuffles, whole-stage codegen end to end, linear at any
    * corpus size. Invariants (pinned in TextSpec): variants 0 and 1
    * recover the original text EXACTLY; variant 2 recovers it as a
    * prefix with the decoded entity tail.
    */
  def extract(documents: DataFrame): DataFrame = {
    val raw = plantedMarkup(col("text"), col("doc_id"))
    graft.Spread(documents)
      .withColumn("raw", raw)
      .select(
        col("doc_id"),
        pmod(col("doc_id"), lit(3L)).as("variant"),
        length(col("raw")).cast("long").as("n_raw_chars"),
        extractText(col("raw")).as("extracted"))
      .withColumn("n_extracted_chars", length(col("extracted")).cast("long"))
  }

  def sqlExtract: String = {
    // the SAME pattern constants, escaped for SQL string literals
    def lit(p: String) = p.replace("\\", "\\\\").replace("'", "''")
    s"""WITH raw AS (
       |  SELECT doc_id, doc_id % 3 AS variant,
       |    CASE WHEN doc_id % 3 = 1 THEN
       |      '<html><head><title>doc</title><script type="text/javascript">var x = 1; track();</script>' ||
       |      '<style>.nav { color: red; }</style></head><body><h1>' || text ||
       |      '</h1><div class="nav">home about contact</div></body></html>'
       |    WHEN doc_id % 3 = 2 THEN '<p>' || text || ' &amp; more &lt;soon&gt;&nbsp;</p><br/>'
       |    ELSE text END AS raw
       |  FROM documents
       |), ex AS (
       |  SELECT doc_id, variant, raw,
       |    trim(regexp_replace(
       |      replace(replace(replace(replace(
       |        regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
       |          '${lit(headPat)}', ' ', 'g'),
       |          '${lit(scriptPat)}', ' ', 'g'),
       |          '${lit(stylePat)}', ' ', 'g'),
       |          '${lit(navPat)}', ' ', 'g'),
       |          '${lit(tagPat)}', ' ', 'g'),
       |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
       |      '\\s+', ' ', 'g')) AS extracted
       |  FROM raw
       |)
       |SELECT doc_id, CAST(variant AS BIGINT) AS variant,
       |  CAST(length(raw) AS BIGINT) AS n_raw_chars,
       |  extracted,
       |  CAST(length(extracted) AS BIGINT) AS n_extracted_chars
       |FROM ex""".stripMargin
  }
}
