package graft.sim

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persistence for the PCA transform index — the faiss PCAMatrix
  * artifact joining [[PqIndex]]/[[IvfIndex]]/[[Sq8Index]]: every index
  * the ANN family serves from is a write-once artifact.
  *
  * Layout under `dir`:
  *   - `codes/`      the projected unit corpus (vec_id, p
  *                   array<double> length m) as parquet — the
  *                   d/m-compressed data-sized artifact.
  *   - `model.json`  the trained model: dim, m, the FULL eigenvalue
  *                   spectrum (the q_embed_pca artifact — what
  *                   justified m), and the top-m basis rows — bounded
  *                   (m·d + d doubles), bit-exact through JSON via
  *                   shortest-repr toString/parseDouble (the PqIndex
  *                   argument), so a read-back projection is the
  *                   identical IEEE computation.
  *
  * Search over a read-back index drives [[Similarity.pcaSearchWith]] —
  * the identical scoring, two-phase top-m, and exact-refine pipeline —
  * and SimilaritySpec proves it hash-EQUAL to the in-session
  * [[Similarity.pcaAnn]]. Append projects a NEW batch with the
  * persisted basis (scan-side, no retrain) — the train/add split.
  */
object PcaIndex {

  private val mapper = new ObjectMapper()

  /** Train (memoized — the same seams q_ann_pca reads) and persist. */
  def write(embeddings: DataFrame, dir: String, dim: Int = -1,
      m: Int = Similarity.PcaM): Unit = {
    val (d, evs, basis, codes) = Similarity.pcaArtifacts(embeddings, dim, m)
    val root = mapper.createObjectNode()
    root.put("dim", d)
    root.put("m", m)
    val evArr = root.putArray("eigenvalues")
    evs.foreach { ev => evArr.add(ev); () }
    val bArr = root.putArray("basis")
    basis.take(m).foreach { row =>
      val r = bArr.addArray()
      row.foreach { x => r.add(x); () }
    }
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "model.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
        .getBytes(StandardCharsets.UTF_8))
    codes.foreach(_.write.mode(SaveMode.Overwrite).parquet(s"$dir/codes"))
  }

  /** Append a NEW batch against the PERSISTED basis without
    * retraining: scan-side projection appended to `codes/`. Fails
    * loudly on an empty index or a dimensionality-mismatched batch.
    */
  def append(spark: SparkSession, batch: DataFrame, dir: String): Unit = {
    val (d, _, basis, _) = read(spark, dir)
    require(basis.nonEmpty,
      s"cannot append to the empty PCA index at $dir: no trained basis to project against")
    Similarity.requireBatchDim(batch, d, s"the PCA index at $dir")
    Similarity.pcaProject(Similarity.unitCorpus(batch, d), basis, basis.length)
      .write.mode(SaveMode.Append).parquet(s"$dir/codes")
  }

  /** Read the persisted model and lazily the codes parquet; a model
    * file with a basis but no codes directory is a corrupt index and
    * fails loudly (write emits both).
    */
  def read(spark: SparkSession, dir: String)
      : (Int, Array[Double], Array[Array[Double]], Option[DataFrame]) = {
    val root = mapper.readTree(Files.readString(Paths.get(dir, "model.json")))
    val d = root.get("dim").asInt()
    val evNode = root.get("eigenvalues")
    val evs = Array.tabulate(evNode.size())(i => evNode.get(i).asDouble())
    val bNode = root.get("basis")
    val basis = Array.tabulate(bNode.size()) { i =>
      val row = bNode.get(i)
      Array.tabulate(row.size())(j => row.get(j).asDouble())
    }
    val codesDir = Paths.get(dir, "codes")
    require(basis.isEmpty || Files.exists(codesDir),
      s"corrupt PCA index at $dir: model.json has ${basis.length} basis rows but codes/ is missing")
    val codes =
      if (basis.nonEmpty) Some(spark.read.parquet(codesDir.toString))
      else None
    (d, evs, basis, codes)
  }

  /** Search a READ-BACK index — identical pipeline to the in-session
    * [[Similarity.pcaAnn]]; `embeddings` supplies the query vectors
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
    val (d, _, basis, codes) = read(spark, dir)
    (basis.isEmpty, codes) match {
      case (false, Some(c)) =>
        Similarity.pcaSearchWith(embeddings, c, nQueries, k, refine, d)
      case _ =>
        Seq.empty[(Long, Int, Long, Double)].toDF("query_id", "rank", "vec_id", "cosine")
    }
  }
}
