package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Det

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
    val tf = documents
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
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
    val toks = documents.withColumn("toks", Text.tokens(col("text")))
    val uni = toks.select(explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val total = uni.agg(sum(col("cnt")).as("n_total"))
    val bf = toks
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> named_struct('w1', element_at(toks, i), 'w2', element_at(toks, i + 1)))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("bf"))
      .localCheckpoint()
    val big = bf.groupBy(col("w1"), col("w2")).agg(sum(col("bf")).as("c12"))
    val u1 = uni.select(col("token").as("w1"), col("cnt").as("c1"))
    val u2 = Det.attachScalar(uni, total)
      .select(col("token").as("w2"),
        (col("cnt").cast("double") / col("n_total").cast("double")).as("p2"))
    val p = lit(lambda) * (col("c12").cast("double") / col("c1").cast("double")) +
      lit(1.0 - lambda) * col("p2")
    bf.join(big, Seq("w1", "w2")).join(u1, "w1").join(u2, "w2")
      .withColumn("micro_nats",
        floor(col("bf").cast("double") * -log(p) * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("bf")).as("n_bigrams"), sum(col("micro_nats")).as("micro"))
      .select(col("doc_id"), col("n_bigrams"),
        Det.r(col("micro").cast("double") / lit(1000000.0) / col("n_bigrams").cast("double"), 6)
          .as("avg_nats"))
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
