package graft.sim

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persistence for the SQ8 index — completing the family's
  * persistence story ([[PqIndex]], [[IvfIndex]], this): every index
  * the ANN family serves from is a write-once artifact.
  *
  * Layout under `dir`:
  *   - `codes/`      the uint8-encoded unit corpus (vec_id, qc
  *                   array<int>) as parquet — the 4×-compressed
  *                   data-sized artifact.
  *   - `bounds.json` the per-dimension (lo, hi) quantization bounds —
  *                   2·dim doubles, bit-exact through JSON via
  *                   shortest-repr toString/parseDouble (the PqIndex
  *                   argument), so the per-query weight arrays built
  *                   from a read-back index are the identical IEEE
  *                   computation.
  *
  * Search over a read-back index drives [[Similarity.sq8SearchWith]] —
  * the identical scoring, two-phase top-m, and exact-refine pipeline —
  * and SimilaritySpec proves it hash-EQUAL to the in-session
  * [[Similarity.sq8Ann]].
  */
object Sq8Index {

  private val mapper = new ObjectMapper()

  /** Train (memoized — the same seams q_ann_sq8 reads) and persist. */
  def write(embeddings: DataFrame, dir: String, dim: Int = -1): Unit = {
    val (d, bounds, codes) = Similarity.sq8Artifacts(embeddings, dim)
    val root = mapper.createObjectNode()
    root.put("dim", d)
    val lo = root.putArray("lo")
    val hi = root.putArray("hi")
    bounds.foreach { case (l, h) => lo.add(l); hi.add(h); () }
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "bounds.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
        .getBytes(StandardCharsets.UTF_8))
    codes.foreach(_.write.mode(SaveMode.Overwrite).parquet(s"$dir/codes"))
  }

  /** Append a NEW batch against the PERSISTED bounds without
    * retraining (the [[PqIndex.append]] contract for the scalar
    * family): scan-side uint8 encoding — values outside the trained
    * bounds clamp to the code range, so appended codes stay valid
    * uint8 — appended to `codes/`. Fails loudly on an empty index.
    */
  def append(spark: SparkSession, batch: DataFrame, dir: String): Unit = {
    val (d, bounds, _) = read(spark, dir)
    require(bounds.nonEmpty,
      s"cannot append to the empty SQ8 index at $dir: no trained bounds to encode against")
    Similarity.requireBatchDim(batch, d, s"the SQ8 index at $dir")
    Similarity.sq8Encode(Similarity.unitCorpus(batch, d), bounds)
      .write.mode(SaveMode.Append).parquet(s"$dir/codes")
  }

  /** Read the persisted bounds and lazily the codes parquet; a bounds
    * file with no codes directory is a corrupt index and fails loudly
    * (write emits both).
    */
  def read(spark: SparkSession, dir: String)
      : (Int, Array[(Double, Double)], Option[DataFrame]) = {
    val root = mapper.readTree(Files.readString(Paths.get(dir, "bounds.json")))
    val d = root.get("dim").asInt()
    val (lo, hi) = (root.get("lo"), root.get("hi"))
    val bounds = Array.tabulate(lo.size())(i => (lo.get(i).asDouble(), hi.get(i).asDouble()))
    val codesDir = Paths.get(dir, "codes")
    require(bounds.isEmpty || Files.exists(codesDir),
      s"corrupt SQ8 index at $dir: bounds.json has ${bounds.length} dims but codes/ is missing")
    val codes =
      if (bounds.nonEmpty) Some(spark.read.parquet(codesDir.toString))
      else None
    (d, bounds, codes)
  }

  /** Search a READ-BACK index — identical pipeline to the in-session
    * [[Similarity.sq8Ann]]; `embeddings` supplies the query vectors
    * and the exact-refine store.
    */
  def search(
      spark: SparkSession,
      dir: String,
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      refine: Int = 4): DataFrame = {
    import spark.implicits._
    val (d, bounds, codes) = read(spark, dir)
    (bounds.isEmpty, codes) match {
      case (false, Some(c)) =>
        Similarity.sq8SearchWith(embeddings, bounds, c, nQueries, k, refine, d)
      case _ =>
        Seq.empty[(Long, Int, Long, Double)].toDF("query_id", "rank", "vec_id", "cosine")
    }
  }
}
