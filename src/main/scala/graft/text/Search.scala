package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Det
import graft.Ckpt.CkptOps

/** Relevance scoring over the corpus: per-document TF-IDF keyterms and
  * BM25 keyword search — the two standard lexical-relevance operators a
  * corpus pipeline needs (salient-term extraction for reporting /
  * clustering labels, and search for corpus inspection).
  *
  * Everything is exact and engine-deterministic: integer term counts,
  * one transcendental (ln) absorbed by [[Det.r]] 6-dp rounding, ties
  * broken on the rounded score then token/doc id, and multi-term sums
  * associated in a FIXED explicit order (a float `sum()` over an
  * unordered group would round differently per engine/partitioning).
  */
object Search {

  /** Per-document top-k salient terms by TF-IDF.
    *
    * Scale shape: term frequencies are one `groupBy(doc_id, token)`
    * keyed shuffle with map-side partial agg; document frequencies
    * roll up from the tf table (vocabulary-sized aggregate — AQE
    * broadcasts it when small, shuffle-joins on token otherwise, and
    * stop-token df skew is AQE-split); the corpus-size scalar rides a
    * [[Det.attachScalar]] broadcast hash join onto the vocabulary
    * table, NOT the data-sized tf table; the final rank window
    * partitions by doc_id,
    * so no partition exceeds one document's distinct-term count.
    * idf = ln(N/df) ≥ 0, zero for ubiquitous terms — ranking then
    * falls back to token order, deterministically in both engines.
    */
  def tfidfTop(documents: DataFrame, k: Int = 5): DataFrame = {
    // tf feeds BOTH the df rollup and the scored join — without the
    // checkpoint each consumer re-plans the tokenize+explode scan and
    // the (doc, token) shuffle (the ngramPairs lesson: materialize
    // once, blocks free on GC)
    val tf = documents
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .boundedCheckpoint()
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n"))
    val scored = tf
      .join(Det.attachScalar(df, n), Seq("token"))
      .withColumn("score",
        Det.r(col("tf").cast("double") *
          log(col("n").cast("double") / col("df").cast("double")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("score"))
  }

  def sqlTfidfTop(k: Int = 5): String = {
    val toks = Text.sqlTokens("text")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($toks) AS token FROM documents
       |), tf AS (
       |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
       |), df AS (
       |  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
       |), n AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
       |), s AS (
       |  SELECT tf.doc_id, tf.token, tf.tf,
       |    floor(CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE))
       |      * 1000000.0 + 0.5) / 1000000.0 AS score
       |  FROM tf JOIN df USING (token), n
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, token ASC) AS "rank"
       |  FROM s
       |)
       |SELECT doc_id, "rank", token, tf, score FROM r WHERE "rank" <= $k""".stripMargin
  }

  /** Default search terms — mid-frequency words of the synthetic
    * vocabulary, so scores spread and the top-k cut is stable.
    */
  val defaultQuery: Seq[String] = Seq("vector", "hash", "merge")

  /** BM25 keyword search: global top-k documents for a fixed term set
    * (Robertson k1/b defaults).
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len_d/avgdl))
    *   idf(t)   = ln((N − df + 0.5)/(df + 0.5) + 1)
    *
    * Scale shape: the explode output is filtered to the query terms
    * BEFORE any shuffle (scan-side `isin` — the only rows that ever
    * shuffle are query-term hits); per-doc length rides along the
    * exploded rows instead of joining a corpus-sized length table
    * back in; df/idf live in a ≤ |terms|-row broadcast; per-term
    * contributions are pivoted to fixed columns and added in query
    * order (deterministic float association); the global top-k is
    * `orderBy().limit(k)` — per-partition top-k + driver merge
    * (TakeOrdered), never a full sort. The rank window runs over the
    * ≤ k survivors under a non-foldable constant key.
    */
  def bm25Search(
      documents: DataFrame,
      terms: Seq[String] = defaultQuery,
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, "bm25Search wants 1-8 fixed terms")
    val stats = documents
      .withColumn("toks", Text.tokens(col("text")))
      .agg(count(lit(1)).as("n"),
        (sum(size(col("toks")).cast("long")).cast("double") /
          count(lit(1)).cast("double")).as("avgdl"))
    // tf (already scan-side-filtered to query-term hits, so it is
    // tiny) feeds both the df rollup and the contribution join —
    // checkpoint so the corpus tokenize scan runs once, not twice
    val tf = documents
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), size(col("toks")).cast("long").as("len"),
        explode(col("toks")).as("token"))
      .filter(col("token").isInCollection(terms))
      .groupBy(col("doc_id"), col("len"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .boundedCheckpoint()
    val idf = Det.attachScalar(
      tf.groupBy(col("token")).agg(count(lit(1)).as("df")), stats)
      .withColumn("idf",
        log((col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))
      .select(col("token"), col("idf"), col("avgdl"))
    val contrib = tf
      .join(broadcast(idf), Seq("token"))
      .withColumn("c",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("len").cast("double") / col("avgdl"))))
    // fixed-order association: coalesce(c_t1,0)+coalesce(c_t2,0)+... —
    // a bare sum() over the group would add in partition order
    val pivoted = contrib.groupBy(col("doc_id"), col("len"))
      .agg(terms.map(t => max(when(col("token") === t, col("c"))).as(s"c_$t")).head,
        terms.tail.map(t => max(when(col("token") === t, col("c"))).as(s"c_$t")): _*)
    val total = terms.map(t => coalesce(col(s"c_$t"), lit(0.0)))
      .reduceLeft[Column]((a, x) => a + x)
    val w = Window.partitionBy(Det.constKey(col("doc_id")))
      .orderBy(col("score").desc, col("doc_id").asc)
    pivoted
      .withColumn("score", Det.r(total, 6))
      .withColumn("n_hit_terms",
        terms.map(t => when(col(s"c_$t").isNotNull, 1L).otherwise(0L))
          .reduceLeft[Column](_ + _))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_hit_terms"), col("score"))
  }

  def sqlBm25Search(
      terms: Seq[String] = defaultQuery,
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75): String = {
    val toks = Text.sqlTokens("text")
    val termList = terms.map(Det.sqlStr).mkString(", ")
    val fixedSum = terms.map(t =>
      s"coalesce(max(CASE WHEN token = ${Det.sqlStr(t)} THEN c END), 0.0)")
      .mkString(" + ")
    val hitCount = terms.map(t =>
      s"CASE WHEN max(CASE WHEN token = ${Det.sqlStr(t)} THEN c END) IS NOT NULL THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id, $toks AS toks FROM documents
       |), st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(len(toks)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
       |  FROM d
       |), tok AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS len, unnest(toks) AS token FROM d
       |), tf AS (
       |  SELECT doc_id, len, token, CAST(count(*) AS BIGINT) AS tf
       |  FROM tok WHERE token IN ($termList) GROUP BY 1, 2, 3
       |), idf AS (
       |  SELECT token,
       |    ln((CAST(st.n AS DOUBLE) - CAST(count(*) AS DOUBLE) + 0.5) /
       |       (CAST(count(*) AS DOUBLE) + 0.5) + 1.0) AS idf,
       |    st.avgdl AS avgdl
       |  FROM tf, st GROUP BY token, st.n, st.avgdl
       |), contrib AS (
       |  SELECT tf.doc_id, tf.token,
       |    idf.idf * (CAST(tf.tf AS DOUBLE) * ${k1 + 1.0}) /
       |      (CAST(tf.tf AS DOUBLE) +
       |        $k1 * (${1.0 - b} + $b * CAST(tf.len AS DOUBLE) / idf.avgdl)) AS c
       |  FROM tf JOIN idf USING (token)
       |), scored AS (
       |  SELECT doc_id,
       |    floor(($fixedSum) * 1000000.0 + 0.5) / 1000000.0 AS score,
       |    CAST($hitCount AS BIGINT) AS n_hit_terms
       |  FROM contrib GROUP BY doc_id
       |), r AS (
       |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS "rank"
       |  FROM scored
       |)
       |SELECT CAST("rank" AS BIGINT) AS "rank", doc_id, n_hit_terms, score
       |FROM r WHERE "rank" <= $k""".stripMargin
  }

  /** q161: HYBRID retrieval — the RAG-stack discipline (BM25 + vector
    * search fused by Reciprocal Rank Fusion, Cormack et al. 2009):
    * the lexical ranking ([[bm25Search]] under the fixed term query)
    * and the semantic ranking (the memoized brute-kNN neighbors of
    * query vector `queryVec` — doc_id and vec_id share the corpus
    * entity space) merge by RRF score Σ 1/(rrfK + rank), fixed to
    * INTEGER MICROS via `1000000 div (rrfK + rank)` so the fusion has
    * zero float seams (the rounding IS the score contract, documented
    * — at rrfK=60 the micro grid still separates every rank pair ≤
    * 900). Lists are k-bounded, so the fusion join, the full-outer
    * merge, and the final rank window all run over ≤2k rows; absent
    * ranks carry the -1 sentinel, never NULL. Both constituent
    * rankings are oracle-gated queries already (#59, #27) ⇒ the twin
    * composes their SQL and the hash gate covers the FUSION
    * arithmetic end to end.
    */
  def hybridSearch(
      documents: DataFrame,
      embeddings: DataFrame,
      terms: Seq[String] = defaultQuery,
      queryVec: Long = 0L,
      k: Int = 20,
      rrfK: Long = 60L): DataFrame = {
    val text = bm25Search(documents, terms, k)
      .select(col("doc_id"), col("rank").as("text_rank"))
    val vec = graft.sim.Similarity.bruteKnnCached(embeddings)
      .filter(col("query_id") === queryVec)
      .select(col("vec_id").as("doc_id"), col("rank").cast("long").as("vec_rank"))
    val fused = text.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("text_rank"), lit(-1L)).as("text_rank"),
        coalesce(col("vec_rank"), lit(-1L)).as("vec_rank"))
      .withColumn("rrf_micros",
        when(col("text_rank") > 0, expr(s"1000000 div ($rrfK + text_rank)"))
          .otherwise(lit(0L)) +
          when(col("vec_rank") > 0, expr(s"1000000 div ($rrfK + vec_rank)"))
            .otherwise(lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(Det.constKey(col("doc_id")))
      .orderBy(col("rrf_micros").desc, col("doc_id").asc)
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("text_rank"), col("vec_rank"),
        col("rrf_micros"))
  }

  def sqlHybridSearch(
      terms: Seq[String] = defaultQuery,
      queryVec: Long = 0L,
      k: Int = 20,
      rrfK: Long = 60L): String =
    s"""WITH hst AS (
       |  SELECT doc_id, "rank" AS text_rank FROM (
       |${sqlBm25Search(terms, k)}
       |  )
       |), hsv AS (
       |  SELECT vec_id AS doc_id, CAST("rank" AS BIGINT) AS vec_rank FROM (
       |${graft.sim.Similarity.sqlBruteKnn()}
       |  ) WHERE query_id = $queryVec
       |), hsf AS (
       |  SELECT coalesce(hst.doc_id, hsv.doc_id) AS doc_id,
       |    coalesce(text_rank, -1) AS text_rank,
       |    coalesce(vec_rank, -1) AS vec_rank
       |  FROM hst FULL OUTER JOIN hsv ON hst.doc_id = hsv.doc_id
       |), hsg AS (
       |  SELECT *,
       |    (CASE WHEN text_rank > 0 THEN 1000000 // ($rrfK + text_rank) ELSE 0 END)
       |    + (CASE WHEN vec_rank > 0 THEN 1000000 // ($rrfK + vec_rank) ELSE 0 END)
       |      AS rrf_micros
       |  FROM hsf
       |)
       |SELECT CAST(row_number() OVER (ORDER BY rrf_micros DESC, doc_id ASC) AS BIGINT) AS "rank",
       |  doc_id, CAST(text_rank AS BIGINT) AS text_rank,
       |  CAST(vec_rank AS BIGINT) AS vec_rank, CAST(rrf_micros AS BIGINT) AS rrf_micros
       |FROM hsg""".stripMargin
}
