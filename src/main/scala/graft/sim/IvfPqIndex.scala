package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted-index serving for the IVF-PQ composition — deliberately
  * NO artifacts of its own: IVF-PQ is a pure composition of its two
  * parents ([[Similarity.ivfPqAnn]] builds nothing the standalone
  * queries don't), so its persisted form is exactly an [[IvfIndex]]
  * (coarse quantizer: centroids + cell assignment) and a [[PqIndex]]
  * (codebooks + codes) read back from disk and composed through the
  * SAME search phase ([[Similarity.ivfPqSearchWith]]). Writing a
  * third redundant layout would just duplicate both artifacts.
  *
  * Search over the two read-back indexes is proven hash-EQUAL to the
  * in-session q_ann_ivfpq in SimilaritySpec; corrupt parents fail
  * loudly through their own readers. Both parents also support
  * no-retrain `append`, so the composed index inherits the
  * crawl-ingest lifecycle: screen the batch, append its cell
  * assignments and PQ codes, serve.
  */
object IvfPqIndex {

  /** Search the composition of a persisted IVF index (`ivfDir`, the
    * seed-centroid variant q_ann_ivfpq composes) and a persisted PQ
    * index (`pqDir`). `embeddings` supplies the query vectors and the
    * exact-refine store, as with every family search.
    */
  def search(
      spark: SparkSession,
      ivfDir: String,
      pqDir: String,
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      nProbe: Int = 4,
      refine: Int = 4): DataFrame = {
    import spark.implicits._
    val (cents, assigned) = IvfIndex.read(spark, ivfDir)
    val (d, books, codes) = PqIndex.read(spark, pqDir)
    (books.isEmpty, codes) match {
      case (false, Some(c)) =>
        Similarity.ivfPqSearchWith(
          embeddings, books, c, cents, assigned, nQueries, k, nProbe, refine, d)
      case _ =>
        Seq.empty[(Long, Int, Long, Double)].toDF("query_id", "rank", "vec_id", "cosine")
    }
  }
}
