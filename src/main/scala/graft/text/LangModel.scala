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
