package graft.sim

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

/** Persistence for the IVF index — the [[PqIndex]] story for the
  * cell-probe family ("at 100 TB the cell table is what you'd persist
  * + bucket by cell", Similarity.assignCellsCached).
  *
  * Layout under `dir`:
  *   - `assigned/`       the corpus cell assignment (vec_id, cell) as
  *                       parquet — the data-sized artifact.
  *   - `centroids.json`  the bounded centroid table (cell, cv, cn):
  *                       id-seeded centroids carry the seed vector +
  *                       its norm; k-means-trained centroids are unit
  *                       (cn = 1.0). Doubles round-trip bit-exactly
  *                       (shortest-repr toString/parseDouble — the
  *                       PqIndex argument), so probe ranking over a
  *                       read-back index is the identical IEEE
  *                       computation.
  *
  * Search over a read-back index drives the identical
  * [[Similarity.ivfSearch]] tail the in-session queries use;
  * SimilaritySpec proves write→read→search hash-EQUAL to the
  * in-session q_ann_ivf / q_ann_ivf_kmeans searches.
  */
object IvfIndex {

  private val mapper = new ObjectMapper()

  /** Train (memoized — the same seams the standalone queries read)
    * and persist: `kmeans = false` persists the id-seeded index
    * (q_ann_ivf's), `true` the Lloyd-trained one (q_ann_ivf_kmeans').
    */
  def write(
      embeddings: DataFrame,
      dir: String,
      nCells: Int = 16,
      kmeans: Boolean = false,
      iters: Int = 5): Unit = {
    val cents = centroids(embeddings, nCells, kmeans, iters)
    val tag = if (kmeans) s"kmeans:$nCells:$iters" else s"seed:$nCells"
    val assigned = Similarity.assignCellsCached(embeddings, cents, tag)
    val root = mapper.createObjectNode()
    root.put("nCells", nCells)
    root.put("kmeans", kmeans)
    root.put("iters", iters)
    val cn = root.putArray("centroids")
    cents.collect().sortBy(_.getLong(0)).foreach { r =>
      val c = cn.addObject()
      c.put("cell", r.getLong(0))
      val cv = c.putArray("cv")
      r.getSeq[Double](1).foreach { x => cv.add(x); () }
      c.put("cn", r.getDouble(2))
    }
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "centroids.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
        .getBytes(StandardCharsets.UTF_8))
    assigned.write.mode(SaveMode.Overwrite).parquet(s"$dir/assigned")
  }

  /** The centroid recipe shared by write-time and the in-session
    * queries: lowest-id seed vectors (with their norms) or the
    * memoized k-means model (unit centroids).
    */
  private def centroids(
      embeddings: DataFrame, nCells: Int, kmeans: Boolean, iters: Int): DataFrame =
    if (kmeans)
      Similarity.kmeansCached(embeddings, nCells, iters)
        .select(col("cell"), col("cv"), lit(1.0).as("cn"))
    else
      Similarity.prepared(embeddings).filter(col("vec_id") < nCells)
        .select(col("vec_id").as("cell"), col("v").as("cv"), col("nrm").as("cn"))

  /** Append a NEW batch against the PERSISTED centroids without
    * retraining (the [[PqIndex.append]] contract for the cell-probe
    * family): each batch vector is assigned to its nearest persisted
    * centroid — the same scan-side argmax [[Similarity.assignCells]]
    * runs at write time, per-vector deterministic — and the
    * assignments append to `assigned/`. Fails loudly on an empty
    * index (no centroids to assign against).
    */
  def append(spark: SparkSession, batch: DataFrame, dir: String): Unit = {
    val (cents, _) = read(spark, dir)
    // one bounded read answers both "is the index empty" and "what
    // dimensionality did it train at" (the centroid vector's length)
    val first = cents.select(size(col("cv"))).head(1)
    require(first.nonEmpty,
      s"cannot append to the empty IVF index at $dir: no centroids to assign against")
    Similarity.requireBatchDim(batch, first.head.getInt(0), s"the IVF index at $dir")
    Similarity.assignCells(Similarity.prepared(batch), cents)
      .write.mode(SaveMode.Append).parquet(s"$dir/assigned")
  }

  /** Read the persisted centroid table (driver-built bounded frame)
    * and the lazily-scanned assignment parquet. Fails loudly on a
    * centroid file with no assignment directory (write emits both).
    */
  def read(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val root = mapper.readTree(Files.readString(Paths.get(dir, "centroids.json")))
    val cn = root.get("centroids")
    val rows = (0 until cn.size()).map { i =>
      val c = cn.get(i)
      val cv = c.get("cv")
      Row(c.get("cell").asLong(),
        (0 until cv.size()).map(j => cv.get(j).asDouble()),
        c.get("cn").asDouble())
    }
    val schema = StructType(Seq(
      StructField("cell", LongType),
      StructField("cv", ArrayType(DoubleType)),
      StructField("cn", DoubleType)))
    val cents = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val assignedDir = Paths.get(dir, "assigned")
    require(cn.size() == 0 || Files.exists(assignedDir),
      s"corrupt IVF index at $dir: centroids.json has ${cn.size()} cells but assigned/ is missing")
    val assigned =
      if (cn.size() == 0) cents.select(col("cell").as("vec_id"), col("cell")).limit(0)
      else spark.read.parquet(assignedDir.toString)
    (cents, assigned)
  }

  /** Search a READ-BACK index — the identical
    * [[Similarity.ivfSearch]] probe-rank → candidate-join →
    * exact-re-score tail the in-session queries run. `embeddings`
    * supplies the query vectors and the exact-refine store.
    */
  def search(
      spark: SparkSession,
      dir: String,
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      nProbe: Int = 2): DataFrame = {
    val (cents, assigned) = read(spark, dir)
    Similarity.ivfSearch(Similarity.prepared(embeddings), assigned, cents, nQueries, k, nProbe)
  }
}
