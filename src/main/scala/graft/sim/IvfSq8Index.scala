package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted-index serving for the IVF-SQ8 composition — the
  * [[IvfPqIndex]] discipline for the scalar-quantized family:
  * deliberately NO artifacts of its own. IVF-SQ8 is a pure
  * composition of its two parents ([[Similarity.ivfSq8Ann]] builds
  * nothing the standalone queries don't), so its persisted form is
  * exactly an [[IvfIndex]] (centroids + cell assignment) and an
  * [[Sq8Index]] (bounds + uint8 codes) read back from disk and
  * composed through the SAME search phase
  * ([[Similarity.ivfSq8SearchWith]]).
  *
  * Search over the two read-back indexes is proven hash-EQUAL to the
  * in-session q_ann_ivf_sq8 in SimilaritySpec; corrupt parents fail
  * loudly through their own readers. Both parents support no-retrain
  * `append`, so the composition inherits the crawl-ingest lifecycle.
  */
object IvfSq8Index {

  /** Search the composition of a persisted IVF index (`ivfDir`) and a
    * persisted SQ8 index (`sq8Dir`). `embeddings` supplies the query
    * vectors and the exact-refine store.
    */
  def search(
      spark: SparkSession,
      ivfDir: String,
      sq8Dir: String,
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      nProbe: Int = 4,
      refine: Int = 4): DataFrame = {
    import spark.implicits._
    val (cents, assigned) = IvfIndex.read(spark, ivfDir)
    val (d, bounds, codes) = Sq8Index.read(spark, sq8Dir)
    (bounds.isEmpty, codes) match {
      case (false, Some(c)) =>
        Similarity.ivfSq8SearchWith(
          embeddings, bounds, c, cents, assigned, nQueries, k, nProbe, refine, d)
      case _ =>
        Seq.empty[(Long, Int, Long, Double)].toDF("query_id", "rank", "vec_id", "cosine")
    }
  }
}
