package graft.sim

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persistence for the PQ index — the artifact a serving pipeline
  * trains ONCE and searches from forever after.
  *
  * Layout under `dir`:
  *   - `codes/`          the encoded corpus (vec_id, codes array<int>)
  *                       as parquet — the data-sized artifact ("at
  *                       100 TB THIS is the persisted index"): nSub
  *                       small ints per vector instead of dim floats.
  *   - `codebooks.json`  the trained codebooks — bounded
  *                       (nSub × nCodes × dim/nSub doubles) so JSON is
  *                       the right wire format; code identity is the
  *                       POSITION in each sub-list (the dense re-label
  *                       invariant of [[Similarity.pqCodebooks]]), and
  *                       ‖centroid‖² is recomputed on read with the
  *                       identical IEEE sum, so only centroids ship.
  *
  * Doubles round-trip bit-exactly through JSON: Jackson writes
  * `Double.toString` (the shortest representation that parses back to
  * the same IEEE-754 value) and reads `Double.parseDouble`. That makes
  * the identity in SimilaritySpec possible: search over a read-back
  * index is hash-EQUAL to the in-session train→search, not just close.
  */
object PqIndex {

  private val mapper = new ObjectMapper()

  /** Train (memoized) and persist the index for `embeddings`. No-op
    * write of an empty index (no valid vectors) produces a codebooks
    * file with zero books — [[search]] then returns an empty frame
    * rather than failing, matching [[Similarity.pqAnn]] on the same
    * corpus.
    */
  def write(
      embeddings: DataFrame,
      dir: String,
      nSub: Int = Similarity.PqSub,
      nCodes: Int = Similarity.PqCodes,
      iters: Int = Similarity.PqIters,
      trainN: Int = Similarity.PqTrainN,
      dim: Int = -1): Unit = {
    val (d, books, codes) = Similarity.pqArtifacts(embeddings, nSub, nCodes, iters, trainN, dim)
    val root = mapper.createObjectNode()
    root.put("nSub", nSub)
    root.put("nCodes", nCodes)
    root.put("dim", d)
    val booksNode = root.putObject("books")
    books.toSeq.sortBy(_._1).foreach { case (s, arr) =>
      val subNode = booksNode.putArray(s.toString)
      arr.foreach { case (_, cb, _) =>
        val cbNode = subNode.addArray()
        cb.foreach { x => cbNode.add(x); () }
      }
    }
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "codebooks.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
        .getBytes(StandardCharsets.UTF_8))
    codes.foreach(_.write.mode(SaveMode.Overwrite).parquet(s"$dir/codes"))
  }

  /** Append a NEW batch to a persisted index WITHOUT retraining — the
    * faiss train/add split, and the missing half of the crawl-ingest
    * story (q_dedup_incremental screens the batch; this indexes the
    * kept docs): the batch is encoded with the PERSISTED codebooks —
    * a pure scan-side pass, per-vector deterministic, identical to how
    * [[write]] would have encoded the same vectors under the same
    * model — and the codes append to `codes/` (parquet append: the
    * existing code files are untouched). SimilaritySpec proves
    * search over (write existing, append batch) hash-EQUAL to search
    * over a one-shot encoding of the full corpus under the same
    * trained model.
    *
    * Appending to an EMPTY index fails loudly (there is no model to
    * encode against — train first); de-duplicating vec_ids against
    * the already-indexed corpus is the caller's screen
    * ([[graft.dedup.Dedup.incrementalDedup]] exists for exactly that).
    */
  def append(spark: SparkSession, batch: DataFrame, dir: String): Unit = {
    val (d, books, _) = read(spark, dir)
    require(books.nonEmpty,
      s"cannot append to the empty PQ index at $dir: no trained codebooks to encode against")
    Similarity.requireBatchDim(batch, d, s"the PQ index at $dir")
    Similarity.pqEncode(Similarity.unitCorpus(batch, d), books, books.size, d)
      .write.mode(SaveMode.Append).parquet(s"$dir/codes")
  }

  /** Read the persisted codebooks (code = position, ‖c‖² recomputed
    * with the training-side IEEE sum) and lazily the codes parquet.
    */
  def read(spark: SparkSession, dir: String)
      : (Int, Map[Int, Array[(Int, Array[Double], Double)]], Option[DataFrame]) = {
    val root = mapper.readTree(Files.readString(Paths.get(dir, "codebooks.json")))
    val d = root.get("dim").asInt()
    val booksNode = root.get("books")
    val books = booksNode.fields()
    val out = scala.collection.mutable.Map[Int, Array[(Int, Array[Double], Double)]]()
    while (books.hasNext) {
      val e = books.next()
      val sub = e.getKey.toInt
      val arr = (0 until e.getValue.size()).map { code =>
        val cbNode = e.getValue.get(code)
        val cb = Array.tabulate(cbNode.size())(i => cbNode.get(i).asDouble())
        (code, cb, cb.map(x => x * x).sum)
      }.toArray
      out(sub) = arr
    }
    val codesDir = Paths.get(dir, "codes")
    // a non-empty codebook with no codes/ is a CORRUPT index (write
    // always emits both) — fail loudly rather than silently searching
    // an empty index (the ADVICE-r8 empty-codebook lesson)
    require(out.isEmpty || Files.exists(codesDir),
      s"corrupt PQ index at $dir: codebooks.json has ${out.size} books but codes/ is missing")
    val codes =
      if (out.nonEmpty) Some(spark.read.parquet(codesDir.toString))
      else None
    (d, out.toMap, codes)
  }

  /** Search a READ-BACK index: the identical pipeline as the
    * in-session [[Similarity.pqAnn]] ([[Similarity.pqSearchWith]]),
    * just with the codebooks parsed from JSON and the codes scanned
    * from parquet. SimilaritySpec proves the results hash-equal.
    * `embeddings` supplies the query vectors and the exact-refine
    * store (the asymmetric-search contract: queries and final
    * re-scoring stay exact; only the candidate generation reads the
    * compressed index).
    */
  def search(
      spark: SparkSession,
      dir: String,
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      refine: Int = 4): DataFrame = {
    import spark.implicits._
    val (d, books, codes) = read(spark, dir)
    (books.isEmpty, codes) match {
      case (false, Some(c)) =>
        Similarity.pqSearchWith(embeddings, books, c, nQueries, k, books.size, refine, d)
      case _ =>
        Seq.empty[(Long, Int, Long, Double)].toDF("query_id", "rank", "vec_id", "cosine")
    }
  }
}
