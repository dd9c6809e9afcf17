package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Det
import graft.Ckpt.CkptOps

/** Similarity search over an embedding column (`array<float>`).
  *
  * Three operators with identical output contracts
  * (query_id, rank, vec_id, cosine):
  *   - bruteKnn — exact top-k; the query side broadcasts, the corpus
  *     streams once. Correctness baseline, oracle-checked.
  *   - lshAnn  — random-hyperplane multi-probe LSH: candidates come
  *     from equi-joins on (table, bucket), never from an n x n compare.
  *   - ivfAnn  — IVF-style: assign every vector to its nearest of
  *     nCells deterministic centroids, probe the nProbe best cells per
  *     query.
  *
  * All arithmetic widens float -> double BEFORE any op so results are
  * bit-identical to the DuckDB oracle (same IEEE sequence); every
  * vector op is a Catalyst higher-order function (codegen, no UDFs).
  */
object Similarity {

  /** (vec_id, v: array<double>, nrm) — the prepared corpus. The norm
    * is vec_dot(v, v): same left-to-right IEEE sequence as the
    * aggregate() fold it replaces, but native codegen (see VecDot).
    * The float→double widening is an array CAST (a native codegen
    * expression), not a transform() lambda — an interpreted
    * per-element closure on every corpus scan; values are identical
    * (element-wise float-to-double is exact).
    *
    * ZERO-NORM rows are filtered HERE, at the family's single entry
    * seam (the unitCorpus convention): a zero vector has no direction,
    * so it can neither rank nor be ranked by cosine, and every
    * downstream divide (cellArms ccos, probe ranking, re-score) is by
    * `nrm` — under ANSI mode one zero-norm row crashes the whole index
    * build (the round-12 q_chunk_search_ann DIVIDE_BY_ZERO at sf0.1).
    * Excluding it at the seam protects every IVF/PQ/SQ8/LSH consumer
    * at once; operators that must see the full corpus (labelCentroids,
    * quantizeInt8) read `embeddings` directly, not this.
    */
  private[graft] def prepared(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .filter(col("nrm") > 0)

  /** Codegen'd dot product ([[graft.functions.VecDot]]) — the hot loop
    * of every scoring path; bit-identical to the interpreted
    * aggregate(zip_with(...)) form and to the DuckDB oracle.
    */
  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.GraftFunctions.vecDot(a, b)

  /** Embedding dimensionality auto-detect: the MODAL non-empty vector
    * length (ties to the smaller), via one bounded aggregate job — a
    * DETERMINISTIC function of the corpus, unlike the first-row-in-
    * scan-order probe it replaces, under which a mixed-length corpus
    * trained/bucketed a dimensionality that depended on partition
    * order. On the normal uniform-length corpus this is the same
    * one-small-driver-job cost. 0 when no non-empty vectors exist.
    */
  private[graft] def detectDim(embeddings: DataFrame): Int =
    embeddings
      .select(size(col("embedding")).as("d")).filter(col("d") > 0)
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("d").asc)
      .head(1).headOption.map(_.getInt(0)).getOrElse(0)

  /** Exact brute-force cosine top-k. The corpus is scanned ONCE and
    * compared against the broadcast query set — at 100 TB this is a
    * single map-side pass (no corpus shuffle; only the tiny
    * nQueries-key window shuffle afterward).
    */
  def bruteKnn(embeddings: DataFrame, nQueries: Int = 10, k: Int = 10): DataFrame = {
    val e = prepared(embeddings)
    val qs = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    // spread the corpus scan: a single-file corpus would otherwise run
    // the whole corpus-x-queries compare on one thread. Spread, not a
    // blanket repartition (round 16): the old
    // repartition(shuffle.partitions) would FORCE a full corpus
    // shuffle on a well-split 100 TB scan (shrinking it to the
    // session's shuffle width); Spread no-ops there and sizes the
    // bench-scale fan-out from input bytes.
    graft.Spread(e)
      .join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), Det.r(col("cos"), 6).as("cosine"))
  }

  /** Memoized, materialized [[bruteKnn]] — the corpus-×-queries exact
    * pass is the ground truth BOTH q_knn_brute and the [[annEval]]
    * audit consume, so it runs once per (corpus, nQueries, k) per JVM
    * (the pairsCached discipline; result is an nQueries·k-row table).
    */
  private val bruteMemo =
    graft.Memo[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int, Int), DataFrame]()

  def bruteKnnCached(embeddings: DataFrame, nQueries: Int = 10, k: Int = 10): DataFrame =
    bruteMemo.getOrElseUpdate(embeddings.sparkSession,
      (embeddings.queryExecution.analyzed.canonicalized, nQueries, k))(
      bruteKnn(embeddings, nQueries, k).boundedCheckpoint())

  def sqlBruteKnn(nQueries: Int = 10, k: Int = 10): String = {
    val dotSql = "list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * q.qv[i]))"
    s"""WITH p AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM p
       |), q AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < $nQueries
       |), c AS (
       |  SELECT q.query_id, e.vec_id, ($dotSql) / (e.nrm * q.qn) AS cos
       |  FROM n e JOIN q ON e.vec_id != q.query_id
       |), r AS (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS "rank"
       |  FROM c
       |)
       |SELECT query_id, "rank", vec_id,
       |  floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
       |FROM r WHERE "rank" <= $k""".stripMargin
  }

  /** (vec_id, v, nrm, buckets) — prepared vectors with their
    * per-table random-hyperplane buckets; shared by the ANN search
    * here and the LSH-blocked near-dup pair generator in graft.dedup.
    *
    * All `tables` buckets come from ONE native expression
    * ([[graft.functions.HyperplaneBuckets]]) — a pure SCAN-SIDE
    * PROJECTION: no explode, no wide aggregate, no shuffle, no
    * join-back, and a generated loop small enough to JIT (see the
    * expression's scaladoc for why the two composed-Column
    * formulations both failed at this). Plane values are bit-identical
    * to the original `xxhash64`-expression definition, pinned by a
    * SimilaritySpec parity test.
    *
    * `dims` is the embedding dimensionality (planes are materialized
    * at that length); the default -1 AUTO-DETECTS it as the modal
    * non-empty length ([[detectDim]] — one tiny driver job,
    * deterministic even on a mixed-length corpus), so any fixed-dim
    * corpus works without configuration. Vectors of any OTHER length (or
    * with null elements) bucket to null and are dropped here —
    * consistent, not a new restriction: a mismatched-length pair
    * yields a null/NaN cosine in every exact path (VecDot returns
    * null, a zero norm makes NaN), so such vectors could never
    * survive re-scoring anyway. This also covers the empty-embedding
    * case the old explode formulation dropped implicitly.
    */
  private[graft] def bucketedCorpus(
      embeddings: DataFrame, tables: Int, bits: Int, dims: Int = -1): DataFrame = {
    val d = if (dims > 0) dims else detectDim(embeddings)
    val base = prepared(embeddings)
    if (d <= 0) // empty corpus (or all-empty vectors): empty result, same schema
      base.withColumn("buckets", lit(null).cast("array<bigint>"))
        .filter(col("buckets").isNotNull)
    else
      base
        .withColumn("buckets",
          graft.functions.GraftFunctions.hyperplaneBuckets(col("v"), tables, bits, d))
        .filter(col("buckets").isNotNull)
  }

  private[graft] def cosineExpr: (String, String) => org.apache.spark.sql.Column =
    (v, q) => dot(col(v), col(q))

  /** Approximate top-k via multi-probe random-hyperplane LSH.
    *
    * Corpus side: one (table, bucket) key per table. Query side: the
    * exact bucket plus 1-bit-flip probes (`probes` buckets per table;
    * default = all bits+1), which buys most of the recall lost to
    * quantization. `probes` is the recall/cost operating knob the
    * [[annEval]] sweep audits: probe sets are NESTED in `probes`, so
    * recall is monotone non-decreasing in it. Candidates = equi-join
    * on (t, bkt) — the plan must never contain a cartesian.
    * Verification re-scores candidates exactly, so precision is 1;
    * only recall is approximate (driver gate: rows-only; ScalaTest
    * checks recall vs bruteKnn).
    */
  def lshAnn(
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      tables: Int = 8,
      bits: Int = 8,
      dims: Int = -1,
      probes: Int = -1): DataFrame = {
    // bucketing is a pure projection now, so no checkpoint: the corpus
    // side scans once and the probe side re-scans with the vec_id
    // filter PUSHED DOWN to the source — at 100 TB that second "scan"
    // touches only the query rows, where a checkpoint would have
    // materialized the whole corpus
    val np = if (probes > 0) math.min(probes, bits + 1) else bits + 1
    val e = bucketedCorpus(embeddings, tables, bits, dims)
    val corpus = e.select(col("vec_id"), posexplode(col("buckets")).as(Seq("t", "bkt")))
    val probeSet = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), posexplode(col("buckets")).as(Seq("t", "qbkt")))
      .select(col("query_id"), col("t"),
        explode(expr(
          s"transform(sequence(-1, ${np - 2}), j -> if(j < 0, qbkt, qbkt ^ shiftleft(1L, j)))"))
          .as("bkt"))
    val pairs = corpus.join(broadcast(probeSet), Seq("t", "bkt"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct() // the same pair can collide in several tables/probes
    rankTopK(pairs, prepared(embeddings), nQueries, k)
  }

  /** IVF-style ANN: nCells deterministic centroids (the lowest-id
    * vectors — a stand-in seam where a k-means pass would plug in),
    * every vector assigned to its nearest centroid by cosine, queries
    * probe their nProbe best cells. Assignment is a broadcast of the
    * centroid table against one corpus scan; candidates come from the
    * cell equi-join. At 100 TB the cell table is what you'd persist +
    * bucket by cell.
    */
  def ivfAnn(
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 2): DataFrame = {
    val e = prepared(embeddings)
    val cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("nrm").as("cn"))
    ivfSearch(e, assignCellsCached(embeddings, cents, s"seed:$nCells"),
      cents, nQueries, k, nProbe)
  }

  /** IVF with TRAINED centroids — [[kmeansCentroids]] plugged into the
    * seam [[ivfAnn]] documents (its lowest-id seeds are the stand-in).
    * Same candidate shape; only the cell table differs.
    */
  def ivfAnnKmeans(
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 2,
      iters: Int = 5): DataFrame = {
    val cents = kmeansCached(embeddings, nCells, iters)
      .select(col("cell"), col("cv"), lit(1.0).as("cn")) // unit centroids
    ivfSearch(prepared(embeddings),
      assignCellsCached(embeddings, cents, s"kmeans:$nCells:$iters"),
      cents, nQueries, k, nProbe)
  }

  /** Memoized [[kmeansCentroids]] — the [[graft.dedup.Dedup.pairsCached]]
    * discipline: a trained model over the same corpus at the same
    * (nCells, iters) is the same model, so the end-to-end queries that
    * consume it (q_ann_ivf_kmeans, q_ann_eval) share ONE training run
    * per JVM instead of each re-running Lloyd. Keyed on the
    * canonicalized analyzed input plan + hyperparameters; the value is
    * a local (driver-data) frame of ≤nCells rows, so the memo holds no
    * cluster-side blocks.
    */
  private val kmMemo =
    graft.Memo[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int, Int), DataFrame]()

  def kmeansCached(embeddings: DataFrame, nCells: Int = 16, iters: Int = 5): DataFrame =
    kmMemo.getOrElseUpdate(embeddings.sparkSession,
      (embeddings.queryExecution.analyzed.canonicalized, nCells, iters))(
      kmeansCentroids(embeddings, nCells, iters))

  /** Force every memoized index build the similarity family shares —
    * brute truth, both IVF cell assignments, the k-means model, the PQ
    * codebooks+codes — at the family's standard operating parameters
    * (the same memo keys the queries and the [[annEval]] audit read),
    * returning (seam, seconds) per build. The bench calls this so
    * index-BUILD cost lands in its own `build` line item instead of
    * inflating whichever consumer happens to run first; the memo keys
    * match by construction because this calls the identical cached
    * getters with the identical defaults.
    */
  def prewarmIndexes(
      embeddings: DataFrame,
      nQueries: Int = 10, k: Int = 10, nCells: Int = 16,
      kmIters: Int = 5): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      out += name -> ((System.nanoTime() - t0) / 1e9)
    }
    timed("sim_brute_truth") { bruteKnnCached(embeddings, nQueries, k); () }
    val e = prepared(embeddings)
    val seedCents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("nrm").as("cn"))
    timed("sim_ivf_assign") { assignCellsCached(embeddings, seedCents, s"seed:$nCells"); () }
    timed("sim_kmeans_model") { kmeansCached(embeddings, nCells, kmIters); () }
    timed("sim_ivf_kmeans_assign") {
      val kmCents = kmeansCached(embeddings, nCells, kmIters)
        .select(col("cell"), col("cv"), lit(1.0).as("cn"))
      assignCellsCached(embeddings, kmCents, s"kmeans:$nCells:$kmIters"); ()
    }
    val d = detectDim(embeddings)
    if (d > 0 && d % PqSub == 0) {
      timed("sim_pq_codebooks") {
        pqCodebooksCached(embeddings, PqSub, PqCodes, PqIters, PqTrainN, d); ()
      }
      timed("sim_pq_codes") {
        val books = pqCodebooksCached(embeddings, PqSub, PqCodes, PqIters, PqTrainN, d)
        if (books.nonEmpty) {
          pqCodesCached(embeddings, books, PqSub, PqCodes, PqIters, PqTrainN, d); ()
        }
      }
    }
    if (d > 0) {
      timed("sim_sq8_codes") {
        if (sq8BoundsCached(embeddings, d).nonEmpty) { sq8CodesCached(embeddings, d); () }
      }
    }
    if (d > 0 && PcaM <= d) {
      timed("sim_pca_model") { pcaModelCached(embeddings, d); () }
      timed("sim_pca_codes") {
        if (pcaModelCached(embeddings, d)._1.nonEmpty) { pcaCodesCached(embeddings, d); () }
      }
    }
    if (d > 0 && d % PqSub == 0) {
      timed("sim_opq_rotation") {
        if (pcaModelCached(embeddings, d)._1.nonEmpty) { rotatedCached(embeddings, d); () }
      }
      timed("sim_opq_codes") {
        if (pcaModelCached(embeddings, d)._1.nonEmpty) {
          val rotated = rotatedCached(embeddings, d)
          val books = pqCodebooksCached(rotated, PqSub, PqCodes, PqIters, PqTrainN, d)
          if (books.nonEmpty) {
            pqCodesCached(rotated, books, PqSub, PqCodes, PqIters, PqTrainN, d); ()
          }
        }
      }
    }
    out.toSeq
  }

  /** Distributed spherical k-means (Lloyd) over the embedding table —
    * the centroid-training pass a real IVF index builds with. Cosine
    * objective: assign each UNIT vector to its max-cosine centroid,
    * update each centroid to the normalized mean of its members.
    *
    * Per iteration the centroid table (≤nCells×dim doubles — bounded,
    * the same discipline as every other driver-artifact read here) is
    * collected to the driver and embedded as LITERAL arrays, so
    * assignment is a pure scan-side projection: one codegen'd VecDot
    * per cell + an array_max over the ≤nCells (cos, cell) structs. The
    * ONLY Exchange per iteration is the groupBy(cell) partial-agg
    * rollup, whose shuffle carries dim doubles + a count per cell,
    * never vectors (plan-asserted in SimilaritySpec). This is the
    * map-side-assignment + per-cell-reduce shape MLlib's k-means runs;
    * the corpus is never re-shuffled, so the plan survives a 100×
    * scale-up with iters× scans and iters× nCells-row shuffles.
    *
    * `dim` AUTO-DETECTS as the modal non-empty vector length by
    * default ([[detectDim]] — one tiny driver job, deterministic on
    * any corpus); vectors of any other length are excluded up front,
    * alongside zero-norm vectors.
    * Cells that lose all members drop out (standard Lloyd); iterations
    * are a fixed small count (k-means converges fast and an IVF index
    * needs "good", not "optimal", cells). Seeds = the nCells lowest-id
    * unit vectors, so cell labels are stable and iters=0 reproduces
    * [[ivfAnn]]'s seed table exactly.
    *
    * Returns (cell, cv: unit array<double>). Double means make this
    * model-dependent (rows-only family, like the MLlib paths); the
    * SimilaritySpec gates pin unit norms, the non-decreasing cosine
    * objective, and the downstream recall behavior.
    */
  def kmeansCentroids(
      embeddings: DataFrame,
      nCells: Int = 16,
      iters: Int = 5,
      dim: Int = -1): DataFrame = {
    require(nCells > 0 && iters >= 0)
    val session = embeddings.sparkSession
    import session.implicits._
    val d = if (dim > 0) dim else detectDim(embeddings)
    if (d <= 0) // empty corpus (or all-empty vectors)
      return Seq.empty[(Long, Seq[Double])].toDF("cell", "cv")
    val u = prepared(embeddings)
      .filter(col("nrm") > 0 && size(col("v")) === d)
      // interpreted transform lambda is fine here: one normalization
      // pass of a training job, not an oracle-checked hot path
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("u"))
      .boundedCheckpoint()
    // seeds: a bounded nCells-row driver read
    var cents: Array[(Long, Array[Double])] = u.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("u").as("cv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    for (_ <- 1 to iters if cents.nonEmpty) {
      cents = lloydStep(u, cents, d)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    }
    // Ckpt.drop, not Dataset.unpersist: u is a localCheckpoint, whose
    // blocks Dataset.unpersist does not release (it only knows
    // CacheManager entries) — every kmeansCentroids call leaked its
    // unit-vector table until round 16
    graft.Ckpt.drop(u)
    cents.toSeq.map { case (c, v) => (c, v.toSeq) }.toDF("cell", "cv")
  }

  /** One Lloyd round over the unit-vector table `u` against DRIVER-
    * LITERAL centroids: scan-side argmax assignment (no join, no
    * Exchange) + the single groupBy(cell) mean rollup. Exposed so the
    * spec can assert the exactly-one-Exchange plan property.
    */
  private[graft] def lloydStep(
      u: DataFrame, cents: Array[(Long, Array[Double])], d: Int): DataFrame = {
    // nearest cell = max over ≤nCells literal (cos, -cell, cell)
    // structs; ties resolve to the smallest cell id, as max_by's
    // struct(cos, -cell) tie-break did. Same unroll/loop switch as
    // [[cellArmsArray]] (u is unit-norm, so no divide here).
    val armArr =
      if (cents.length <= ArmUnrollLimit)
        array(cents.map { case (cell, cv) =>
          struct(dot(col("u"), typedLit(cv.toSeq)).as("cos"),
            lit(-cell).as("tb"), lit(cell).as("cell"))
        }.toIndexedSeq: _*)
      else {
        val table = typedLit(cents.map { case (cell, cv) => (cell, cv.toSeq) }.toSeq)
        transform(table, c =>
          struct(dot(col("u"), c.getField("_2")).as("cos"),
            (-c.getField("_1")).as("tb"), c.getField("_1").as("cell")))
      }
    val assigned = u.select(
      col("u"), array_max(armArr).getField("cell").as("cell"))
    val means = (0 until d).map(i => avg(col("u")(i)).as(s"m$i"))
    assigned
      .groupBy(col("cell"))
      .agg(means.head, means.tail: _*)
      .select(col("cell"), array((0 until d).map(i => col(s"m$i")): _*).as("m"))
      .withColumn("mn", sqrt(dot(col("m"), col("m"))))
      .filter(col("mn") > 0)
      .select(col("cell"), transform(col("m"), x => x / col("mn")).as("cv"))
  }

  /** Nearest-cell assignment of every corpus vector — the per-index
    * build pass. EXCHANGE-FREE: the centroid table is bounded
    * (≤nCells×dim doubles), so it is collected once and embedded as
    * LITERAL structs, and the assignment becomes a pure scan-side
    * argmax projection (one codegen'd VecDot per cell + an array_max
    * over ≤nCells (ccos, -cell, cell) structs) — the [[lloydStep]]
    * shape. The old broadcast-crossJoin + groupBy(vec_id) form carried
    * one full-corpus-cardinality shuffle per index build; this carries
    * none. Ties resolve to the smallest cell id and NaN/null cosines
    * order exactly as the old max_by(struct) did (struct ordering is
    * identical), so the assignment is row-for-row unchanged.
    */
  private[graft] def assignCells(e: DataFrame, cents: DataFrame): DataFrame = {
    val cl = collectCells(cents)
    if (cl.isEmpty) return e.select(col("vec_id"), lit(null).cast("bigint").as("cell")).limit(0)
    e.select(col("vec_id"),
      array_max(cellArmsArray(cl)).getField("cell").as("cell"))
  }

  /** The bounded centroid table as driver rows, cell-sorted. */
  private def collectCells(cents: DataFrame): Array[(Long, Seq[Double], Double)] =
    cents.select(col("cell"), col("cv"), col("cn")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).sortBy(_._1)

  /** Above this centroid count the unrolled arm expression stops
    * being a win: janino's 64 KB method limit rejects the generated
    * code, so every consuming stage paid a ~30 s failed whole-stage
    * compile (per stage, per plan) and then ran INTERPRETED over a
    * width-proportional expression tree — at the sf3 chunk corpus
    * (323 adaptive cells) the assignment crawled at one core and the
    * run died downstream. 64 unrolled 8-dim arms stay comfortably
    * inside the method limit.
    */
  private val ArmUnrollLimit = 64

  /** The (ccos, -cell, cell) arm ARRAY over a prepared row's (v, nrm)
    * — the scan-side argmax/argsort arms shared by [[assignCells]]
    * and the IVF probe rankings. Two physical forms with identical
    * values (same IEEE ops in the same order): UNROLLED literal
    * structs while the centroid table is narrow (whole-stage
    * codegen'd — the hot shape every bench index uses), and a
    * `transform` LOOP over ONE literal centroid table above
    * [[ArmUnrollLimit]] — constant-size generated code at any cell
    * count, the shape that survives corpus-adaptive cell growth.
    */
  private def cellArmsArray(cl: Array[(Long, Seq[Double], Double)]): Column =
    if (cl.length <= ArmUnrollLimit)
      array(cellArms(cl).toIndexedSeq: _*)
    else {
      val table = typedLit(cl.toSeq)
      transform(table, c =>
        struct((dot(col("v"), c.getField("_2")) / (col("nrm") * c.getField("_3")))
          .as("ccos"),
          (-c.getField("_1")).as("tb"), c.getField("_1").as("cell")))
    }

  /** Literal (ccos, -cell, cell) struct per centroid over a prepared
    * row's (v, nrm) — the unrolled arms behind [[cellArmsArray]].
    */
  private def cellArms(cl: Array[(Long, Seq[Double], Double)]): Array[Column] =
    cl.map { case (cell, cv, cn) =>
      struct((dot(col("v"), typedLit(cv)) / (col("nrm") * lit(cn))).as("ccos"),
        lit(-cell).as("tb"), lit(cell).as("cell"))
    }

  /** Memoized, materialized [[assignCells]] — the cell table IS the
    * IVF index (at 100 TB it is what you'd persist + bucket by cell),
    * and the standalone searches (q_ann_ivf, q_ann_ivf_kmeans) and the
    * audit ([[annEval]]) all search the SAME index, so it builds once
    * per (corpus, index tag) per session. The tag names the centroid
    * recipe ("seed:n" / "kmeans:n:iters") — the centroid table itself
    * is derived from the same corpus, so the pair is a complete key.
    */
  private val assignMemo =
    graft.Memo[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String), DataFrame]()

  private[graft] def assignCellsCached(
      embeddings: DataFrame, cents: DataFrame, tag: String): DataFrame =
    assignMemo.getOrElseUpdate(embeddings.sparkSession,
      (embeddings.queryExecution.analyzed.canonicalized, tag))(
      assignCells(prepared(embeddings), cents).boundedCheckpoint())

  /** The search tail over a prebuilt cell assignment: rank probe
    * cells per query, candidate-join, exact re-score.
    */
  private[graft] def ivfSearch(
      e: DataFrame,
      assigned: DataFrame,
      cents: DataFrame,
      nQueries: Int,
      k: Int,
      nProbe: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("ccos").desc, col("cell").asc)
    // probe selection scores only the nQueries query vectors against
    // the centroids — branching it off the assignment's cross join
    // would evaluate the corpus-sized join a second time for a
    // queries-sized result
    val qProbes = e.filter(col("vec_id") < nQueries).crossJoin(broadcast(cents))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .select(col("vec_id").as("query_id"), col("cell"), col("ccos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= nProbe)
      .select(col("query_id"), col("cell"))
    // corpus vector sits in exactly one cell and probe cells are
    // distinct per query => each (query, vec) pair matches at most once
    val pairs = assigned.join(broadcast(qProbes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    rankTopK(pairs, e, nQueries, k)
  }

  /** Product-quantization ANN — THE standard memory-compression search
    * path at 100 TB (the IVF-PQ half the family lacked): each vector is
    * stored as nSub small codes instead of dim floats, and candidate
    * scoring reads the codes through per-query lookup tables (ADC)
    * instead of touching the raw vectors.
    *
    *   - TRAIN on a bounded sample (the faiss discipline — codebooks
    *     never see the whole corpus): ONE bounded collect of trainN
    *     sample vectors, then per-subspace k-means in plain
    *     R^{dim/nSub} L2 (classic PQ, not the spherical variant —
    *     subvectors of unit vectors are not unit) entirely on the
    *     driver with vec_id-sorted sequential arithmetic
    *     (deterministic by construction; see [[pqCodebooks]]).
    *   - ENCODE in one corpus pass, scan-side only: per subspace an
    *     argmax over nCodes literal (2·dot(x,cb) − ‖cb‖², tiebreak,
    *     code) structs — the [[assignCells]] shape; no join, no
    *     Exchange. codes = array<int> of length nSub: dim floats → nSub
    *     bytes (32× here), which is the entire point of PQ — at scale
    *     THIS table is what you persist and serve from RAM.
    *   - SEARCH asymmetrically (ADC): queries keep their exact
    *     subvectors and carry a literal-free in-plan lookup table
    *     qtab[sub][code] = dot(q_sub, cb[sub][code]) (nQueries×nSub×
    *     nCodes doubles, built on the queries-sized side and broadcast);
    *     the corpus-×-queries pass scores a pair with nSub array
    *     lookups (zip_with + aggregate over the codes) instead of a
    *     dim-wide dot — 8 reads vs 64 mults here, and the raw vectors
    *     never stream through the join.
    *   - REFINE: the top refine·k ADC candidates per query are
    *     re-scored EXACTLY ([[rankTopK]]) — the family's invariant:
    *     approximate paths generate candidates, exact arithmetic ranks
    *     them (emitted cosines are bit-exact, only the candidate SET is
    *     approximate; recall-gated in SimilaritySpec vs the memoized
    *     brute truth).
    *
    * Deterministic end to end (seeds = lowest vec_ids, lexicographic
    * tie-breaks), but replaying iterative codebook training in SQL is
    * impractical — rows-only driver gate like the other trained index
    * (q_ann_ivf_kmeans). Output contract (query_id, rank, vec_id,
    * cosine) matches the family. The codebooks and the encoded codes
    * table are memoized ([[assignCellsCached]] discipline), so the
    * standalone search and the [[annEval]] audit build the index once.
    */
  def pqAnn(
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      nSub: Int = PqSub,
      nCodes: Int = PqCodes,
      iters: Int = PqIters,
      trainN: Int = PqTrainN,
      refine: Int = 4,
      dim: Int = -1): DataFrame = {
    require(refine >= 1)
    val session = embeddings.sparkSession
    import session.implicits._
    val empty = Seq.empty[(Long, Int, Long, Double)]
      .toDF("query_id", "rank", "vec_id", "cosine")
    val d = if (dim > 0) dim else detectDim(embeddings)
    if (d <= 0) return empty
    require(d % nSub == 0, s"dim $d must divide into nSub=$nSub subspaces")
    val bySub = pqCodebooksCached(embeddings, nSub, nCodes, iters, trainN, d)
    if (bySub.isEmpty) return empty
    val codes = pqCodesCached(embeddings, bySub, nSub, nCodes, iters, trainN, d)
    pqSearchWith(embeddings, bySub, codes, nQueries, k, nSub, refine, d)
  }

  /** The PQ SEARCH phase against provided index artifacts (codebooks +
    * codes table) — factored out of [[pqAnn]] so a persisted index
    * read back from disk ([[PqIndex]]) drives the IDENTICAL pipeline:
    * ADC scoring, two-phase exact top-m (the ngramVocab discipline: a
    * plain per-query window would funnel the whole corpus's ADC scores
    * through nQueries partitions; the bucketed pre-window keeps only
    * top-m per (query, vec_id-hash bucket) first, so the global
    * ranking sorts ≤ buckets·m rows per query), then exact
    * re-scoring of the top refine·k candidates.
    */
  private[graft] def pqSearchWith(
      embeddings: DataFrame,
      bySub: Map[Int, Array[(Int, Array[Double], Double)]],
      codes: DataFrame,
      nQueries: Int, k: Int, nSub: Int, refine: Int, d: Int): DataFrame = {
    val e = prepared(embeddings).filter(col("nrm") > 0 && size(col("v")) === d)
    val qs = pqQueryTabs(unitCorpus(embeddings, d), bySub, nSub, d, nQueries)
    val pairs = pqTopM(pqAdcScore(codes, qs), refine * k)
      .select(col("query_id"), col("vec_id"))
    rankTopK(pairs, e, nQueries, k)
  }

  /** The trained PQ index artifacts for `embeddings` — the memoized
    * (codebooks, codes) pair both searches read; exposed for
    * [[PqIndex]] persistence. Codebooks empty on an empty corpus.
    */
  private[graft] def pqArtifacts(
      embeddings: DataFrame,
      nSub: Int = PqSub, nCodes: Int = PqCodes, iters: Int = PqIters,
      trainN: Int = PqTrainN, dim: Int = -1)
      : (Int, Map[Int, Array[(Int, Array[Double], Double)]], Option[DataFrame]) = {
    val d = if (dim > 0) dim else detectDim(embeddings)
    if (d <= 0) return (d, Map.empty, None)
    require(d % nSub == 0, s"dim $d must divide into nSub=$nSub subspaces")
    val books = pqCodebooksCached(embeddings, nSub, nCodes, iters, trainN, d)
    if (books.isEmpty) (d, books, None)
    else (d, books, Some(pqCodesCached(embeddings, books, nSub, nCodes, iters, trainN, d)))
  }

  /** SQ8 scalar-quantized ANN — the THIRD compression point between
    * the flat float scan (q_knn_brute: dim float32s per vector) and
    * PQ's 4-bit codes (q_ann_pq: nSub nibbles): each UNIT vector is
    * stored as dim uint8 codes — 4× smaller than float32, the
    * [[quantizeInt8]] per-dimension min/max recipe applied to the unit
    * corpus — and candidates are scored against the CODES, with the
    * top refine·k re-scored exactly ([[rankTopK]], the family
    * invariant: emitted cosines are bit-exact, only the candidate set
    * is approximate).
    *
    * Ranking identity: the reconstruction is v̂_i = lo_i + c_i·step_i,
    * so dot(q, v̂) = Σ q_i·lo_i + Σ (q_i·step_i)·c_i — the first term
    * is constant per query, so ranking by Σ w_i·c_i with the per-query
    * weight array w_i = q_i·step_i IS ranking by the reconstructed
    * dot. w is built on the queries side and broadcast; the corpus
    * pass reads only the uint8 codes (the persisted-index read shape:
    * 4× less memory bandwidth than the flat scan). Like flat PQ, the
    * scoring pass is by definition a linear corpus scan (a documented
    * BNLJ exemption); the cell-pruned paths (q_ann_ivf*, q_ann_ivfpq)
    * are the scan-avoiding alternatives.
    *
    * Quantization-model-dependent ⇒ rows-only driver gate;
    * SimilaritySpec pins the recall floor (tight: uint8 per dimension
    * loses little) and the exact-re-score invariant.
    */
  def sq8Ann(
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      refine: Int = 4,
      dim: Int = -1): DataFrame = {
    require(refine >= 1)
    val session = embeddings.sparkSession
    import session.implicits._
    val empty = Seq.empty[(Long, Int, Long, Double)]
      .toDF("query_id", "rank", "vec_id", "cosine")
    val d = if (dim > 0) dim else detectDim(embeddings)
    if (d <= 0) return empty
    val bounds = sq8BoundsCached(embeddings, d)
    if (bounds.isEmpty) return empty
    sq8SearchWith(embeddings, bounds, sq8CodesCached(embeddings, d), nQueries, k, refine, d)
  }

  /** (query_id, vec_id, approx) code-scan scores against the SQ8 index
    * — the candidate-generation pass shared by [[sq8Ann]] and the
    * [[annEval]] audit (which must audit THE index the standalone
    * query searches, so both read the same memoized bounds+codes).
    * None on an empty corpus.
    */
  private def sq8Scored(embeddings: DataFrame, d: Int, nQueries: Int): Option[DataFrame] = {
    val bounds = sq8BoundsCached(embeddings, d)
    if (bounds.isEmpty) None
    else Some(sq8ScoredWith(embeddings, bounds, sq8CodesCached(embeddings, d), d, nQueries))
  }

  /** The SQ8 candidate scoring against PROVIDED index artifacts —
    * factored so a persisted index ([[Sq8Index]]) drives the identical
    * pass.
    */
  private[graft] def sq8ScoredWith(
      embeddings: DataFrame, bounds: Array[(Double, Double)], codes: DataFrame,
      d: Int, nQueries: Int): DataFrame = {
    val steps = bounds.map { case (lo, hi) => if (hi > lo) (hi - lo) / 255.0 else 0.0 }
    val warr = array((0 until d).map(i => col("u")(i) * lit(steps(i))): _*)
    val qs = unitCorpus(embeddings, d).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), warr.as("w"))
    codes.join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .withColumn("approx",
        aggregate(zip_with(col("qc"), col("w"), (c, x) => c.cast("double") * x),
          lit(0.0), (acc, x) => acc + x))
      .select(col("query_id"), col("vec_id"), col("approx"))
  }

  /** The SQ8 SEARCH phase against provided artifacts — scoring,
    * two-phase top-m, exact refine (the [[pqSearchWith]] shape for the
    * scalar-quantized family).
    */
  private[graft] def sq8SearchWith(
      embeddings: DataFrame, bounds: Array[(Double, Double)], codes: DataFrame,
      nQueries: Int, k: Int, refine: Int, d: Int): DataFrame = {
    val scored = sq8ScoredWith(embeddings, bounds, codes, d, nQueries)
    val pairs = pqTopM(scored, refine * k).select(col("query_id"), col("vec_id"))
    rankTopK(pairs, prepared(embeddings).filter(col("nrm") > 0 && size(col("v")) === d),
      nQueries, k)
  }

  /** The SQ8 index artifacts (bounds, codes) — exposed for
    * [[Sq8Index]] persistence; bounds empty on an empty corpus.
    */
  private[graft] def sq8Artifacts(
      embeddings: DataFrame, dim: Int = -1)
      : (Int, Array[(Double, Double)], Option[DataFrame]) = {
    val d = if (dim > 0) dim else detectDim(embeddings)
    if (d <= 0) return (d, Array.empty, None)
    val bounds = sq8BoundsCached(embeddings, d)
    if (bounds.isEmpty) (d, bounds, None)
    else (d, bounds, Some(sq8CodesCached(embeddings, d)))
  }

  /** Per-dimension (lo, hi) of the unit corpus — one 2·dim-column
    * aggregate reduced to a single driver row (bounded artifact, the
    * quantizeInt8 pass-1 shape); empty on an empty corpus.
    */
  private[graft] def sq8Bounds(embeddings: DataFrame, d: Int): Array[(Double, Double)] = {
    val u = unitCorpus(embeddings, d)
    val aggs = (0 until d).flatMap(i =>
      Seq(min(col("u")(i)).as(s"lo$i"), max(col("u")(i)).as(s"hi$i")))
    val r = u.agg(aggs.head, aggs.tail: _*).collect().head
    if (r.isNullAt(0)) Array.empty
    else Array.tabulate(d)(i => (r.getDouble(2 * i), r.getDouble(2 * i + 1)))
  }

  /** Scan-side uint8 encoding of the unit corpus against driver-literal
    * bounds: (vec_id, qc array<int>) — no join, no Exchange (the
    * [[pqEncode]] discipline).
    */
  private[graft] def sq8Encode(u: DataFrame, bounds: Array[(Double, Double)]): DataFrame = {
    val codeCols: Seq[Column] = bounds.toIndexedSeq.zipWithIndex.map { case ((lo, hi), i) =>
      if (hi > lo)
        // clamp to the uint8 range: a no-op for the corpus the bounds
        // were trained on (they ARE its min/max) but required for
        // vectors APPENDED against a persisted index (Sq8Index.append)
        // whose values may fall outside the trained bounds
        greatest(lit(0),
          least(lit(255),
            floor((col("u")(i) - lit(lo)) / lit(hi - lo) * lit(255.0) + lit(0.5)).cast("int")))
      else lit(0)
    }
    u.select(col("vec_id"), array(codeCols: _*).as("qc"))
  }

  private val sq8BoundsMemo = graft.Memo[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int), Array[(Double, Double)]]()

  private def sq8BoundsCached(embeddings: DataFrame, d: Int): Array[(Double, Double)] =
    sq8BoundsMemo.getOrElseUpdate(embeddings.sparkSession,
      (embeddings.queryExecution.analyzed.canonicalized, d))(
      sq8Bounds(embeddings, d))

  /** Memoized, materialized SQ8 codes table — like the PQ codes, this
    * is what a serving index persists and reads.
    */
  private val sq8CodesMemo = graft.Memo[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int), DataFrame]()

  private def sq8CodesCached(embeddings: DataFrame, d: Int): DataFrame =
    sq8CodesMemo.getOrElseUpdate(embeddings.sparkSession,
      (embeddings.queryExecution.analyzed.canonicalized, d))(
      sq8Encode(unitCorpus(embeddings, d), sq8BoundsCached(embeddings, d)).boundedCheckpoint())

  // ------------------------------------------------------------------
  // PCA transform family (round-10 additions): the faiss PCAMatrix
  // pre-transform — the remaining standard compression point between
  // the flat scan and the quantized families: project to the top-m
  // principal directions and rank by the m-dim dot.
  // ------------------------------------------------------------------

  /** PCA / ANN-PCA defaults, shared so [[annEval]] audits THE
    * standalone index (the PqSub discipline).
    */
  private[graft] val PcaM = 16
  private[graft] val PcaTrainN = 256

  /** Deterministic UNCENTERED PCA trained on a bounded sample: the
    * eigen-decomposition of the second-moment matrix
    * M = (1/n)·Σ u·uᵀ over the lowest-trainN unit vectors (the
    * [[pqCodebooks]] sampling discipline — TakeOrdered, positional).
    *
    * UNCENTERED by design: cosine/IP search must preserve DOT
    * PRODUCTS, and qᵀx = Σ_j (v_jᵀq)(v_jᵀx) exactly when the v_j are
    * a full orthonormal basis — truncating to the top m drops the
    * smallest-eigenvalue terms, so the approximation error is bounded
    * by the discarded spectrum mass. Mean-centering (classical PCA)
    * would shift every dot product by query-independent-but-corpus-
    * dependent cross terms and break that decomposition.
    *
    * Training is DRIVER-SIDE and deterministic by construction (the
    * PQ argument): the sample accumulates in vec_id-sorted sequential
    * IEEE order, and the eigen-solver is cyclic Jacobi with a fixed
    * sweep order (upper-triangle row-major, fixed rotation formula,
    * fixed convergence threshold) — two independent trainings agree
    * EXACTLY (pinned in SimilaritySpec). Eigenvectors are sign-fixed
    * (largest-|component| entry positive, ties to the lowest index)
    * and sorted by (eigenvalue desc, original column asc).
    *
    * Returns (eigenvalues desc, eigenvectors as rows); empty on an
    * empty corpus. For unit vectors trace(M) = 1, so the eigenvalues
    * ARE the variance-explained shares (pinned).
    */
  private[graft] def pcaModel(
      embeddings: DataFrame, d: Int, trainN: Int = PcaTrainN)
      : (Array[Double], Array[Array[Double]]) = {
    require(trainN >= 2, "PCA needs at least two sample vectors")
    val sample: Array[Array[Double]] = unitCorpus(embeddings, d)
      .orderBy(col("vec_id")).limit(trainN)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    if (sample.isEmpty) return (Array.empty, Array.empty)
    val n = sample.length
    // second-moment matrix, vec_id-sorted accumulation order
    val a = Array.ofDim[Double](d, d)
    sample.foreach { u =>
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) { a(i)(j) += u(i) * u(j); j += 1 }
        i += 1
      }
    }
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) { a(i)(j) /= n; a(j)(i) = a(i)(j); j += 1 }
      i += 1
    }
    // cyclic Jacobi: rotate away each upper-triangle element in fixed
    // row-major order until the off-diagonal mass is negligible
    val v = Array.tabulate(d, d)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a, d)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a, d)
      sweep += 1
    }
    // (eigenvalue, original column, eigenvector) sorted desc; sign fix
    val pairs = (0 until d).map { j =>
      val ev = Array.tabulate(d)(r => v(r)(j))
      val pivot = ev.indices.maxBy(r => (math.abs(ev(r)), -r))
      val fixed = if (ev(pivot) < 0) ev.map(-_) else ev
      (a(j)(j), j, fixed)
    }.sortBy { case (lambda, j, _) => (-lambda, j) }
    (pairs.map(_._1).toArray, pairs.map(_._3).toArray)
  }

  private def offDiag(a: Array[Array[Double]], d: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < d - 1) {
      var j = i + 1
      while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  private val pcaModelMemo = graft.Memo[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String),
    (Array[Double], Array[Array[Double]])]()

  private[graft] def pcaModelCached(
      embeddings: DataFrame, d: Int, trainN: Int = PcaTrainN)
      : (Array[Double], Array[Array[Double]]) =
    pcaModelMemo.getOrElseUpdate(embeddings.sparkSession,
      (embeddings.queryExecution.analyzed.canonicalized, s"pcam:$d:$trainN"))(
      pcaModel(embeddings, d, trainN))

  /** Scan-side projection of the unit corpus onto the top-m principal
    * directions: (vec_id, p array<double> length m) — m codegen VecDot
    * folds against literal rows, no join, no Exchange (the
    * [[pqEncode]] discipline).
    */
  private[graft] def pcaProject(
      u: DataFrame, basis: Array[Array[Double]], m: Int): DataFrame = {
    val projCols: Seq[Column] =
      (0 until m).map(j => dot(col("u"), typedLit(basis(j).toSeq)))
    u.select(col("vec_id"), array(projCols: _*).as("p"))
  }

  /** Memoized, materialized projected corpus — what a serving PCA
    * index persists and reads ([[PcaIndex]]).
    */
  private val pcaCodesMemo = graft.Memo[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String), DataFrame]()

  private[graft] def pcaCodesCached(
      embeddings: DataFrame, d: Int, m: Int = PcaM, trainN: Int = PcaTrainN): DataFrame =
    pcaCodesMemo.getOrElseUpdate(embeddings.sparkSession,
      (embeddings.queryExecution.analyzed.canonicalized, s"pcac:$d:$m:$trainN"))(
      pcaProject(unitCorpus(embeddings, d), pcaModelCached(embeddings, d, trainN)._2, m)
        .boundedCheckpoint())

  /** q122: the variance SPECTRUM artifact — the table that decides m
    * (the audit-before-the-index discipline): per component its
    * eigenvalue, variance-explained share and the cumulative share.
    * For the unit corpus trace(M) = 1, so eigenvalue ≈ share (both
    * emitted; the division is by the actual trace for honesty on
    * near-unit sums). Bounded d-row driver artifact; model-dependent
    * (sample + Jacobi float order) ⇒ rows-only.
    */
  def pcaSpectrum(embeddings: DataFrame, dim: Int = -1): DataFrame = {
    val session = embeddings.sparkSession
    import session.implicits._
    val d = if (dim > 0) dim else detectDim(embeddings)
    if (d <= 0) return Seq.empty[(Long, Double, Double, Double)]
      .toDF("component", "eigenvalue", "var_explained", "cum_var")
    val (evs, _) = pcaModelCached(embeddings, d)
    if (evs.isEmpty) return Seq.empty[(Long, Double, Double, Double)]
      .toDF("component", "eigenvalue", "var_explained", "cum_var")
    val trace = evs.sum
    var cum = 0.0
    val rows = evs.zipWithIndex.map { case (ev, j) =>
      cum += ev
      (j.toLong, math.rint(ev * 1e6) / 1e6,
        math.rint(ev / trace * 1e6) / 1e6, math.rint(cum / trace * 1e6) / 1e6)
    }
    rows.toSeq.toDF("component", "eigenvalue", "var_explained", "cum_var")
  }

  /** q123: PCA-reduced ANN — rank by the m-dim projected dot, then
    * exact-refine: qᵀx ≈ (Vq)ᵀ(Vx) with V the top-m basis, so the
    * candidate pass reads m doubles per vector instead of d (the
    * memory-bandwidth claim, like SQ8's 4×; here d/m = 4 at the
    * defaults) and the approximation error is bounded by the
    * discarded spectrum mass — ON A CORPUS WITH SPECTRUM DECAY. The
    * near-uniform synthetic testdata deliberately has almost none
    * (the audit surfaces it — the q_ann_ivf_kmeans honesty pattern),
    * so the recall gate is calibrated to what a flat spectrum can
    * give and the operator's value case is documented, not faked.
    *
    * Scale shape: projection is one scan-side pass (memoized, the
    * persisted artifact); scoring is a linear scan of m-dim rows by
    * definition (the flat-PQ/SQ8 BNLJ exemption); the two-phase
    * [[pqTopM]] guards the candidate ranking; top refine·k re-scored
    * EXACTLY (family invariant: emitted cosines bit-exact).
    * Model-dependent ⇒ rows-only.
    */
  def pcaAnn(
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      m: Int = PcaM,
      refine: Int = 4,
      dim: Int = -1): DataFrame = {
    require(refine >= 1 && m >= 1)
    val session = embeddings.sparkSession
    import session.implicits._
    val empty = Seq.empty[(Long, Int, Long, Double)]
      .toDF("query_id", "rank", "vec_id", "cosine")
    val d = if (dim > 0) dim else detectDim(embeddings)
    if (d <= 0 || m > d) return empty
    val (evs, basis) = pcaModelCached(embeddings, d)
    if (evs.isEmpty) return empty
    pcaSearchWith(embeddings, pcaCodesCached(embeddings, d, m), nQueries, k, refine, d)
  }

  /** The PCA index artifacts (eigenvalues, basis, projected corpus) —
    * exposed for [[PcaIndex]] persistence; empty on an empty corpus.
    */
  private[graft] def pcaArtifacts(
      embeddings: DataFrame, dim: Int = -1, m: Int = PcaM)
      : (Int, Array[Double], Array[Array[Double]], Option[DataFrame]) = {
    val d = if (dim > 0) dim else detectDim(embeddings)
    if (d <= 0 || m > d) return (d, Array.empty, Array.empty, None)
    val (evs, basis) = pcaModelCached(embeddings, d)
    if (evs.isEmpty) (d, evs, basis, None)
    else (d, evs, basis, Some(pcaCodesCached(embeddings, d, m)))
  }

  /** The PCA candidate scoring against a PROVIDED projected table —
    * factored so a persisted index ([[PcaIndex]]) drives the identical
    * pass.
    */
  private[graft] def pcaScoredWith(codes: DataFrame, nQueries: Int): DataFrame = {
    val qs = codes.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("p").as("qp"))
    codes.join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .withColumn("approx", dot(col("p"), col("qp")))
      .select(col("query_id"), col("vec_id"), col("approx"))
  }

  /** The PCA SEARCH phase against provided artifacts: scoring,
    * two-phase top-m, exact refine (the [[sq8SearchWith]] shape).
    */
  private[graft] def pcaSearchWith(
      embeddings: DataFrame, codes: DataFrame,
      nQueries: Int, k: Int, refine: Int, d: Int): DataFrame = {
    val pairs = pqTopM(pcaScoredWith(codes, nQueries), refine * k)
      .select(col("query_id"), col("vec_id"))
    rankTopK(pairs, prepared(embeddings).filter(col("nrm") > 0 && size(col("v")) === d),
      nQueries, k)
  }

  /** q136: OPQ-style ROTATED PQ — the faiss OPQ idea with the PCA
    * basis as the rotation (OPQ proper alternates rotation and
    * codebook training; the PCA rotation is its standard one-shot
    * initialization and already delivers the mechanism): product
    * quantization carves the vector into nSub INDEPENDENT subspaces,
    * so correlated/unevenly-loaded dimensions waste codebook capacity
    * — rotating into the PCA eigenbasis decorrelates the axes before
    * the split. Because the basis is ORTHONORMAL, rotation preserves
    * norms and pairwise dot products exactly: the rotated corpus's
    * brute ranking IS the original's (vec_ids unchanged), the
    * exact-refine cosines emitted are the original cosines, and the
    * whole operator is a pure composition — the FULL d×d basis from
    * [[pcaModelCached]] applied as one scan-side projection (d VecDot
    * folds, the pcaProject machinery), feeding the unchanged
    * [[pqAnn]] train/encode/ADC/refine pipeline on the rotated frame.
    *
    * On THIS corpus the honest expectation (the q_ann_ivf_kmeans /
    * langid pattern): near-isotropic synthetic vectors have little
    * correlation to remove, so rotated-PQ recall ≈ plain-PQ recall —
    * the gate pins "no collapse" and SimilaritySpec pins the
    * rotation-invariance identities (emitted cosines bit-equal to
    * exact; on real correlated embeddings the same operator is where
    * OPQ's gains come from). Model-dependent ⇒ rows-only.
    */
  def opqAnn(
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      refine: Int = 4,
      dim: Int = -1): DataFrame = {
    val session = embeddings.sparkSession
    import session.implicits._
    val empty = Seq.empty[(Long, Int, Long, Double)]
      .toDF("query_id", "rank", "vec_id", "cosine")
    val d = if (dim > 0) dim else detectDim(embeddings)
    if (d <= 0) return empty
    require(d % PqSub == 0, s"dim $d must divide into nSub=$PqSub subspaces")
    // Empty unit corpus (e.g. all zero-norm vectors) → empty result,
    // the family's empty-corpus convention, matching pcaAnn — not the
    // rotatedCached require.
    if (pcaModelCached(embeddings, d)._1.isEmpty) return empty
    val rotated = rotatedCached(embeddings, d)
    val books = pqCodebooksCached(rotated, PqSub, PqCodes, PqIters, PqTrainN, d)
    if (books.isEmpty) return empty
    val codes = pqCodesCached(rotated, books, PqSub, PqCodes, PqIters, PqTrainN, d)
    pqSearchWith(rotated, books, codes, nQueries, k, PqSub, refine, d)
  }

  /** The PCA-rotated corpus (vec_id, embedding = R·u as doubles) —
    * memoized+materialized so OPQ's training, encoding and search all
    * read one rotation pass. Rotation preserves unit norms, so the
    * frame is consumable by every (vec_id, embedding) operator.
    */
  private val rotatedMemo = graft.Memo[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int), DataFrame]()

  private[sim] def rotatedCached(embeddings: DataFrame, d: Int): DataFrame =
    rotatedMemo.getOrElseUpdate(embeddings.sparkSession,
      (embeddings.queryExecution.analyzed.canonicalized, d))({
      val (_, basis) = pcaModelCached(embeddings, d)
      require(basis.nonEmpty, "cannot rotate an empty corpus")
      pcaProject(unitCorpus(embeddings, d), basis, d)
        .select(col("vec_id"), col("p").as("embedding"))
        .boundedCheckpoint()
    })

  /** Exact top-m ADC candidates per query, two-phase (see [[pqAnn]]);
    * emits (query_id, vec_id, rk) with rk the global ADC rank ≤ m.
    */
  private def pqTopM(scored: DataFrame, m: Int, buckets: Int = 64): DataFrame = {
    val wBucket = Window
      .partitionBy(col("query_id"), pmod(xxhash64(col("vec_id")), lit(buckets)))
      .orderBy(col("approx").desc, col("vec_id").asc)
    val w = Window.partitionBy("query_id").orderBy(col("approx").desc, col("vec_id").asc)
    scored
      .withColumn("brk", row_number().over(wBucket))
      .filter(col("brk") <= m)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= m)
      .select(col("query_id"), col("vec_id"), col("rk"))
  }

  /** PQ index defaults, shared so [[annEval]] audits THE standalone
    * index (the kmIters discipline), not a variant.
    */
  private[graft] val PqSub = 8
  private[graft] val PqCodes = 16
  private[graft] val PqIters = 3
  private[graft] val PqTrainN = 256

  /** (vec_id, u) — normalized valid d-dim vectors. */
  private[graft] def unitCorpus(embeddings: DataFrame, d: Int): DataFrame =
    prepared(embeddings).filter(col("nrm") > 0 && size(col("v")) === d)
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("u"))

  /** Loud dimensionality guard for the no-retrain index appends: a
    * batch vector whose dimensionality differs from the persisted
    * model's would be silently DROPPED by the unit-corpus `size === d`
    * filter (PQ/SQ8) or scored against mismatched centroid arrays
    * (IVF) — either way the append would "succeed" while indexing
    * nothing or garbage, the exact silent-downgrade shape the corrupt
    * index readers fail loudly on. One batch-sized aggregate up
    * front; empty vectors stay allowed (they are invalid everywhere
    * and excluded by the nrm/size filters by design, same as at
    * write time).
    */
  private[graft] def requireBatchDim(batch: DataFrame, d: Int, what: String): Unit = {
    val bad = batch
      .select(size(col("embedding")).as("bd"))
      .filter(col("bd") > 0 && col("bd") =!= d)
      .limit(1).count()
    require(bad == 0,
      s"cannot append to $what: batch contains vectors whose dimensionality != the trained $d")
  }

  /** Train the PQ codebooks on a bounded sample. The sample is bounded
    * BY DESIGN (trainN vectors — the faiss discipline: codebooks never
    * see the whole corpus), so after ONE bounded collect the k-means
    * runs entirely on the driver with vec_id-sorted sequential
    * arithmetic — DETERMINISTIC by construction, unlike a distributed
    * `avg` whose partial-merge order floats with shuffle fetch order,
    * and ~5 fewer fixed-latency Spark jobs on the audit's critical
    * path. Distributing k-means over a few thousand sample rows is
    * pure overhead; the corpus-sized work (encoding, ADC search) stays
    * distributed. Returns sub → sorted (code, centroid, ‖centroid‖²);
    * empty on an empty corpus.
    */
  private[graft] def pqCodebooks(
      embeddings: DataFrame, nSub: Int, nCodes: Int, iters: Int, trainN: Int,
      d: Int): Map[Int, Array[(Int, Array[Double], Double)]] = {
    require(nSub > 0 && nCodes > 1 && iters >= 0 && trainN >= nCodes)
    val ds = d / nSub
    // sample = the LOWEST trainN vec_ids (TakeOrdered — one bounded
    // job), not `vec_id < trainN`: an absolute-id threshold silently
    // yields an EMPTY sample on a valid corpus whose ids don't start
    // near 0 (a filtered/re-keyed frame), and an empty codebook would
    // make pqAnn return zero rows with no error. On contiguous 0-based
    // ids (the testdata) the two selections are identical.
    val sample: Array[(Long, Array[Double])] = unitCorpus(embeddings, d)
      .orderBy(col("vec_id")).limit(trainN)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    if (sample.isEmpty) return Map.empty // genuinely empty corpus
    val books = (0 until nSub).flatMap { s =>
      val xs = sample.map { case (id, u) => id -> u.slice(s * ds, (s + 1) * ds) }
      // seeds = the first (lowest-id) nCodes sample rows — positional,
      // so any non-empty corpus seeds a real codebook
      var cents: Array[(Int, Array[Double])] =
        xs.take(nCodes).zipWithIndex.map { case ((_, x), i) => i -> x }
      for (_ <- 1 to iters if cents.nonEmpty) {
        val assigned = xs.map { case (_, x) =>
          // argmin L2, ties to the smaller code — the assignCells order
          val code = cents.map { case (c, cb) =>
            var d2 = 0.0
            var i = 0
            while (i < ds) { val t = x(i) - cb(i); d2 += t * t; i += 1 }
            (d2, c)
          }.min._2
          code -> x
        }
        cents = assigned.groupBy(_._1).toArray.sortBy(_._1).map { case (c, xsc) =>
          val m = new Array[Double](ds)
          // vec_id-sorted member order (xs is sorted) => fixed IEEE sum
          xsc.foreach { case (_, x) => var i = 0; while (i < ds) { m(i) += x(i); i += 1 } }
          var i = 0
          while (i < ds) { m(i) /= xsc.length; i += 1 }
          c -> m
        }
      }
      cents.map { case (c, cb) => (s, c, cb) }
    }
    // RE-LABEL DENSELY: k-means can drop an empty cluster (or a seed
    // can be filtered by unitCorpus), leaving label gaps — but the ADC
    // lookup reads qtab POSITIONALLY (element_at(row, code + 1)), so
    // codes must be positions in the sorted codebook, 0..n-1 with no
    // holes, or a gapped label would read the wrong (or an absent)
    // table entry. This is also what PQ codes ARE in any real index:
    // positions, not training-seed ids.
    books.groupBy(_._1).map { case (s, arr) =>
      s -> arr.map { case (_, c, cb) => (c, cb, cb.map(x => x * x).sum) }.sortBy(_._1)
        .zipWithIndex.map { case ((_, cb, n2), i) => (i, cb, n2) }.toArray
    }
  }

  private val pqBookMemo = graft.Memo[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String),
    Map[Int, Array[(Int, Array[Double], Double)]]]()

  private def pqCodebooksCached(
      embeddings: DataFrame, nSub: Int, nCodes: Int, iters: Int, trainN: Int,
      d: Int): Map[Int, Array[(Int, Array[Double], Double)]] =
    pqBookMemo.getOrElseUpdate(embeddings.sparkSession,
      (embeddings.queryExecution.analyzed.canonicalized, s"pqb:$nSub:$nCodes:$iters:$trainN:$d"))(
      pqCodebooks(embeddings, nSub, nCodes, iters, trainN, d))

  /** Encode the corpus: (vec_id, codes array<int> length nSub) — one
    * scan-side pass, per subspace an argmax over nCodes literal
    * (2·dot−‖cb‖², tiebreak, code) structs (the [[assignCells]] shape).
    */
  private[graft] def pqEncode(
      u: DataFrame, bySub: Map[Int, Array[(Int, Array[Double], Double)]],
      nSub: Int, d: Int): DataFrame = {
    val ds = d / nSub
    val codeCols = (0 until nSub).map { s =>
      val xs = slice(col("u"), lit(s * ds + 1), lit(ds))
      val arms = bySub(s).map { case (code, cb, cb2) =>
        struct((lit(2.0) * dot(xs, typedLit(cb.toSeq)) - lit(cb2)).as("sc"),
          lit(-code).as("tb"), lit(code).as("code"))
      }
      array_max(array(arms.toIndexedSeq: _*)).getField("code")
    }
    u.select(col("vec_id"), array(codeCols: _*).as("codes"))
  }

  /** Memoized, materialized codes table — at 100 TB THIS is the
    * persisted PQ index; the standalone search and the audit read the
    * same materialization.
    */
  private val pqCodesMemo = graft.Memo[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String), DataFrame]()

  private def pqCodesCached(
      embeddings: DataFrame, bySub: Map[Int, Array[(Int, Array[Double], Double)]],
      nSub: Int, nCodes: Int, iters: Int, trainN: Int, d: Int): DataFrame =
    pqCodesMemo.getOrElseUpdate(embeddings.sparkSession,
      (embeddings.queryExecution.analyzed.canonicalized, s"pqc:$nSub:$nCodes:$iters:$trainN:$d"))(
      pqEncode(unitCorpus(embeddings, d), bySub, nSub, d).boundedCheckpoint())

  /** (query_id, qtab) — the per-query ADC lookup tables
    * qtab[sub][code] = dot(q_sub, cb[sub][code]), built on the
    * queries-sized side (to be broadcast by the caller).
    */
  private def pqQueryTabs(
      u: DataFrame, bySub: Map[Int, Array[(Int, Array[Double], Double)]],
      nSub: Int, d: Int, nQueries: Int): DataFrame = {
    val ds = d / nSub
    val qtab = array((0 until nSub).map { s =>
      val qxs = slice(col("u"), lit(s * ds + 1), lit(ds))
      array(bySub(s).map { case (_, cb, _) => dot(qxs, typedLit(cb.toSeq)) }.toIndexedSeq: _*)
    }: _*)
    u.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), qtab.as("qtab"))
  }

  /** Approximate score of a (codes, qtab) pair — nSub positional array
    * reads via zip_with (codes are positions in the sorted codebook;
    * see the dense re-label in [[pqCodebooks]]). Shared by [[pqAnn]]'s
    * full-corpus pass and [[ivfPqAnn]]'s cell-pruned pass.
    */
  private def adcApprox: Column =
    aggregate(zip_with(col("codes"), col("qtab"),
      (c, row) => element_at(row, c + 1)), lit(0.0), (acc, x) => acc + x)

  /** The ADC pass: (query_id, vec_id, approx) for every corpus ×
    * broadcast-query pair — nSub array reads per pair via zip_with.
    */
  private def pqAdcScore(codes: DataFrame, qs: DataFrame): DataFrame =
    codes.join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .withColumn("approx", adcApprox)
      .select(col("query_id"), col("vec_id"), col("approx"))

  /** IVF-PQ — the canonical billion-scale index layout (coarse
    * quantizer + product codes): IVF cell pruning decides WHICH
    * fraction of the corpus gets scored, PQ codes decide HOW CHEAPLY
    * each survivor is scored, and the top candidates are re-scored
    * exactly. Pure composition of the repo's memoized seams — the
    * cell assignment IS q_ann_ivf's index and the codebooks+codes ARE
    * q_ann_pq's, so this query builds NOTHING new per session.
    *
    * Scale shape — strictly better than either parent alone: unlike
    * pure PQ (whose ADC pass scores every corpus code against every
    * query), scoring touches only the probed cells' codes, and every
    * join is an equi-join (cell, vec_id, query_id) off broadcast
    * query-sized tables — ZERO nested-loop joins in the plan
    * (asserted in SimilaritySpec), the ngramVocab two-phase guarding
    * the candidate ranking. Deterministic; rows-only like its
    * parents; recall-gated vs the memoized brute truth.
    */
  def ivfPqAnn(
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 4,
      refine: Int = 4,
      dim: Int = -1): DataFrame = {
    require(nProbe > 0 && refine >= 1)
    val session = embeddings.sparkSession
    import session.implicits._
    val empty = Seq.empty[(Long, Int, Long, Double)]
      .toDF("query_id", "rank", "vec_id", "cosine")
    val d = if (dim > 0) dim else detectDim(embeddings)
    if (d <= 0) return empty
    require(d % PqSub == 0, s"dim $d must divide into nSub=$PqSub subspaces")
    val books = pqCodebooksCached(embeddings, PqSub, PqCodes, PqIters, PqTrainN, d)
    if (books.isEmpty) return empty
    val e = prepared(embeddings)
    val cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("nrm").as("cn"))
    val assigned = assignCellsCached(embeddings, cents, s"seed:$nCells")
    val codes = pqCodesCached(embeddings, books, PqSub, PqCodes, PqIters, PqTrainN, d)
    ivfPqSearchWith(embeddings, books, codes, cents, assigned, nQueries, k, nProbe, refine, d)
  }

  /** The IVF-PQ SEARCH phase against PROVIDED artifacts (PQ codebooks
    * + codes, IVF centroids + cell assignment) — factored so the
    * composed persisted indexes ([[IvfPqIndex]]: an [[IvfIndex]] and
    * a [[PqIndex]] read back from disk) drive the identical pipeline
    * the in-session [[ivfPqAnn]] runs.
    */
  private[graft] def ivfPqSearchWith(
      embeddings: DataFrame,
      books: Map[Int, Array[(Int, Array[Double], Double)]],
      codes: DataFrame,
      cents: DataFrame,
      assigned: DataFrame,
      nQueries: Int, k: Int, nProbe: Int, refine: Int, d: Int): DataFrame = {
    val session = embeddings.sparkSession
    import session.implicits._
    val empty = Seq.empty[(Long, Int, Long, Double)]
      .toDF("query_id", "rank", "vec_id", "cosine")
    val scored = ivfPqScored(embeddings, books, codes, cents, assigned, nQueries, nProbe, d)
    if (scored.isEmpty) return empty
    val pairs = pqTopM(scored.get, refine * k).select(col("query_id"), col("vec_id"))
    rankTopK(pairs, prepared(embeddings), nQueries, k)
  }

  /** The cell-pruned ADC candidate scoring shared by [[ivfPqSearchWith]]
    * and the [[annEval]] audit (which must audit THE pipeline the
    * standalone query serves); None when the centroid table is empty.
    */
  private def ivfPqScored(
      embeddings: DataFrame,
      books: Map[Int, Array[(Int, Array[Double], Double)]],
      codes: DataFrame, cents: DataFrame, assigned: DataFrame,
      nQueries: Int, nProbe: Int, d: Int): Option[DataFrame] = {
    val e = prepared(embeddings)
    // probe ranking scan-side (the assignCells move): the bounded
    // centroid table embeds as literal (ccos, -cell, cell) structs
    // (cellArms — the same arms assignCells argmaxes over), and
    // top-nProbe per query is array_sort desc + slice + explode — no
    // crossJoin, so not even the probe subtree nested-loops. Tie
    // order (ccos desc, cell asc) matches ivfSearch's window exactly.
    val cl = collectCells(cents)
    if (cl.isEmpty) return None
    val qProbes = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        explode(slice(reverse(array_sort(cellArmsArray(cl))), 1, nProbe)).as("a"))
      .select(col("query_id"), col("a.cell").as("cell"))
    val qs = pqQueryTabs(unitCorpus(embeddings, d), books, books.size, d, nQueries)
    Some(assigned.join(broadcast(qProbes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(codes, Seq("vec_id"))
      .join(broadcast(qs), Seq("query_id"))
      .withColumn("approx", adcApprox)
      .select(col("query_id"), col("vec_id"), col("approx")))
  }

  /** q132: IVF-SQ8 — the composition completing the pruning ×
    * compression matrix ([[ivfPqAnn]] : PQ nibbles :: this : SQ8
    * uint8): IVF cell pruning decides WHICH corpus fraction gets
    * scored, the SQ8 weighted code sum decides HOW CHEAPLY each
    * survivor is scored (ranking-equivalent to the reconstructed dot,
    * the [[sq8Ann]] argument), top refine·k re-scored exactly. Pure
    * composition of the memoized seams — the cell assignment IS
    * q_ann_ivf's index, the bounds+codes ARE q_ann_sq8's, so the
    * query builds nothing new per session; like IVF-PQ the plan is
    * strictly equi-join (cell / vec_id / query_id off broadcast
    * query-sized tables, scan-side probe ranking) — ZERO nested-loop
    * joins, asserted in SimilaritySpec; vs pure SQ8 the code scan
    * touches only probed cells' codes. Rows-only like its parents;
    * recall-gated vs the memoized brute truth.
    */
  def ivfSq8Ann(
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 4,
      refine: Int = 4,
      dim: Int = -1): DataFrame = {
    require(nProbe > 0 && refine >= 1)
    val session = embeddings.sparkSession
    import session.implicits._
    val empty = Seq.empty[(Long, Int, Long, Double)]
      .toDF("query_id", "rank", "vec_id", "cosine")
    val d = if (dim > 0) dim else detectDim(embeddings)
    if (d <= 0) return empty
    val bounds = sq8BoundsCached(embeddings, d)
    if (bounds.isEmpty) return empty
    val e = prepared(embeddings)
    val cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("nrm").as("cn"))
    val assigned = assignCellsCached(embeddings, cents, s"seed:$nCells")
    val codes = sq8CodesCached(embeddings, d)
    ivfSq8SearchWith(embeddings, bounds, codes, cents, assigned, nQueries, k, nProbe, refine, d)
  }

  /** The IVF-SQ8 SEARCH phase against PROVIDED artifacts (SQ8 bounds +
    * codes, IVF centroids + cell assignment) — factored so the
    * composed persisted indexes ([[IvfSq8Index]]) drive the identical
    * pipeline.
    */
  private[graft] def ivfSq8SearchWith(
      embeddings: DataFrame,
      bounds: Array[(Double, Double)],
      codes: DataFrame,
      cents: DataFrame,
      assigned: DataFrame,
      nQueries: Int, k: Int, nProbe: Int, refine: Int, d: Int): DataFrame = {
    val session = embeddings.sparkSession
    import session.implicits._
    val empty = Seq.empty[(Long, Int, Long, Double)]
      .toDF("query_id", "rank", "vec_id", "cosine")
    val scored = ivfSq8Scored(embeddings, bounds, codes, cents, assigned, nQueries, nProbe, d)
    if (scored.isEmpty) return empty
    val pairs = pqTopM(scored.get, refine * k).select(col("query_id"), col("vec_id"))
    rankTopK(pairs, prepared(embeddings), nQueries, k)
  }

  /** The cell-pruned SQ8 candidate scoring shared by
    * [[ivfSq8SearchWith]] and the [[annEval]] audit; None when the
    * centroid table is empty.
    */
  private def ivfSq8Scored(
      embeddings: DataFrame,
      bounds: Array[(Double, Double)],
      codes: DataFrame, cents: DataFrame, assigned: DataFrame,
      nQueries: Int, nProbe: Int, d: Int): Option[DataFrame] = {
    val e = prepared(embeddings)
    val cl = collectCells(cents)
    if (cl.isEmpty) return None
    // scan-side probe ranking — identical to ivfPqScored
    val qProbes = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        explode(slice(reverse(array_sort(cellArmsArray(cl))), 1, nProbe)).as("a"))
      .select(col("query_id"), col("a.cell").as("cell"))
    val steps = bounds.map { case (lo, hi) => if (hi > lo) (hi - lo) / 255.0 else 0.0 }
    val warr = array((0 until d).map(i => col("u")(i) * lit(steps(i))): _*)
    val qs = unitCorpus(embeddings, d).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), warr.as("w"))
    Some(assigned.join(broadcast(qProbes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(codes, Seq("vec_id"))
      .join(broadcast(qs), Seq("query_id"))
      .withColumn("approx",
        aggregate(zip_with(col("qc"), col("w"), (c, x) => c.cast("double") * x),
          lit(0.0), (acc, x) => acc + x))
      .select(col("query_id"), col("vec_id"), col("approx")))
  }

  /** ANN quality audit — recall@k of each approximate index against
    * the exact brute top-k on the same queries, SWEPT across probe
    * operating points (the q_langid_eval pattern: the evaluation that
    * DECIDES whether — and at which recall/cost point — the
    * approximate path may serve in place of the exact one, emitted as
    * a query so the decision input is itself a gated artifact). One
    * row per (method, n_probe ∈ probeSweep): for the IVF family
    * n_probe = cells probed; for LSH n_probe = buckets probed per
    * table; for PQ n_probe = the refinement factor (top n_probe·k ADC
    * candidates re-scored). Probe/candidate sets are nested in
    * n_probe for all four methods, so recall is monotone
    * non-decreasing along the sweep (SimilaritySpec pins it).
    *
    * Cost discipline: the brute truth is checkpointed (the
    * corpus-×-queries exact pass runs ONCE, not once per row); each
    * IVF index's corpus-side cell ASSIGNMENT is likewise checkpointed
    * and searched at every operating point — the sweep re-runs only
    * the queries-sized probe ranking + candidate join. Hits come from
    * equi-joins of two nQueries·k-row tables. Approximate methods ⇒
    * rows-only driver gate; SimilaritySpec pins the recall floors,
    * monotonicity, and the [0,1] range.
    */
  def annEval(
      embeddings: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      probeSweep: Seq[Int] = Seq(1, 2, 4, 8),
      tables: Int = 8,
      bits: Int = 8,
      nCells: Int = 16): DataFrame = {
    require(probeSweep.nonEmpty && probeSweep.forall(_ > 0) &&
      probeSweep.distinct.size == probeSweep.size,
      s"probe sweep must be positive and duplicate-free: $probeSweep")
    val maxP = probeSweep.max
    val truth = bruteKnnCached(embeddings, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val e = prepared(embeddings)
    val qs = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))

    // Per method: (method, query_id, vec_id, lvl) where lvl = the
    // SMALLEST n_probe at which the candidate appears (probe sets are
    // nested). The checkpoint is EAGER, so the elapsed time around it
    // IS the method's candidate-derivation wall cost — the per-method
    // cost axis the bench's top-5 line kept needing manual contention
    // adjudication for. Recorded per method and emitted as wall_ms on
    // every sweep row. (Since round 15 the ten derivations run
    // OVERLAPPED — see `runLevels` — so wall_ms includes scheduler
    // contention from sibling methods; it stays the honest cost axis
    // for ranking methods against each other, which is all the audit
    // reads it for.)
    //
    // The EXACT re-score deliberately does NOT happen here (the
    // round-14 shape: ten methods each joining their candidates back
    // against the corpus = ten serial corpus-side probe passes, the
    // driver bench's #1 cost): every method's checkpointed candidates
    // union into ONE method-tagged table and a single shared join
    // scores them all — see `scoredAll` below.
    val methodWallMs = scala.collection.concurrent.TrieMap[String, Long]()
    def scoredLevels(method: String, pairsLvl: DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = pairsLvl
        .select(lit(method).as("method"), col("query_id"), col("vec_id"), col("lvl"))
        .boundedCheckpoint()
      methodWallMs(method) = (System.nanoTime() - t0) / 1000000L
      out
    }

    // LSH: lvl = 1 + the smallest probe index (0 = exact bucket,
    // i = flip of bit i-1) that collides in ANY table
    val bc = bucketedCorpus(embeddings, tables, bits)
    val corpus = bc.select(col("vec_id"), posexplode(col("buckets")).as(Seq("t", "bkt")))
    val np = math.min(maxP, bits + 1)
    val probeSet = bc.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), posexplode(col("buckets")).as(Seq("t", "qbkt")))
      .select(col("query_id"), col("t"), posexplode(expr(
        s"transform(sequence(-1, ${np - 2}), j -> if(j < 0, qbkt, qbkt ^ shiftleft(1L, j)))"))
        .as(Seq("pidx", "bkt")))
    def lshPlan: DataFrame =
      corpus.join(broadcast(probeSet), Seq("t", "bkt"))
        .filter(col("vec_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg((min(col("pidx")) + 1).cast("long").as("lvl"))

    // IVF family: lvl = the rank of the candidate's assigned cell in
    // the query's centroid ranking (ivfSearch probes the top-nProbe).
    // The cell assignment comes from the SAME memoized index build the
    // standalone q_ann_ivf / q_ann_ivf_kmeans queries search, so the
    // audit adds zero extra index-build passes.
    def ivfPlan(cents: DataFrame, tag: String): DataFrame = {
      val w = Window.partitionBy("query_id").orderBy(col("ccos").desc, col("cell").asc)
      val qRanks = e.filter(col("vec_id") < nQueries).crossJoin(broadcast(cents))
        .withColumn("ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .select(col("vec_id").as("query_id"), col("cell"), col("ccos"))
        .withColumn("lvl", row_number().over(w).cast("long"))
        .filter(col("lvl") <= maxP)
        .select(col("query_id"), col("cell"), col("lvl"))
      assignCellsCached(embeddings, cents, tag).join(broadcast(qRanks), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), col("lvl"))
    }
    val seedCents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("nrm").as("cn"))
    val kmIters = 5 // q_ann_ivf_kmeans' default: audit THAT index, not a variant
    // lazy: the k-means fit (a memoized multi-job Lloyd run) then
    // happens inside its method's overlapped slot, not serially here
    lazy val kmCents = kmeansCached(embeddings, nCells, kmIters)
      .select(col("cell"), col("cv"), lit(1.0).as("cn")) // unit centroids

    // PQ: lvl = ceil(ADC rank / k) — the top refine·k candidate sets
    // nest in the refine factor exactly as probe sets do, so one ADC
    // ranking at the max level prices every sweep point. Audits the
    // SAME memoized index q_ann_pq searches; skipped only when the
    // corpus dimensionality does not divide into the standard subspace
    // count (the index itself would refuse to build).
    val dPq = detectDim(embeddings)
    def pqPlan: Option[DataFrame] =
      if (dPq <= 0 || dPq % PqSub != 0) None
      else {
        val books = pqCodebooksCached(embeddings, PqSub, PqCodes, PqIters, PqTrainN, dPq)
        if (books.isEmpty) None
        else {
          val codes = pqCodesCached(embeddings, books, PqSub, PqCodes, PqIters, PqTrainN, dPq)
          val pqQs = pqQueryTabs(unitCorpus(embeddings, dPq), books, PqSub, dPq, nQueries)
          Some(pqTopM(pqAdcScore(codes, pqQs), maxP * k)
            .select(col("query_id"), col("vec_id"),
              ceil(col("rk").cast("double") / lit(k)).cast("long").as("lvl")))
        }
      }

    val sweep = probeSweep.sorted
    // SQ8: lvl = ceil(code-scan rank / k) — refine levels nest exactly
    // as PQ's do; audits the SAME memoized bounds+codes q_ann_sq8
    // searches (sq8@refine r in the audit equals sq8Ann(refine=r),
    // pinned in SimilaritySpec).
    def sq8Plan: Option[DataFrame] =
      if (dPq <= 0) None
      else sq8Scored(embeddings, dPq, nQueries).map(scored =>
        pqTopM(scored, maxP * k)
          .select(col("query_id"), col("vec_id"),
            ceil(col("rk").cast("double") / lit(k)).cast("long").as("lvl")))

    // PCA: lvl = ceil(projected-dot rank / k) — refine levels nest
    // exactly as PQ/SQ8's do; audits the SAME memoized basis+projected
    // table q_ann_pca searches (pca@refine r equals pcaAnn(refine=r),
    // pinned in SimilaritySpec).
    def pcaPlan: Option[DataFrame] =
      if (dPq <= 0 || PcaM > dPq) None
      else {
        val (evs, _) = pcaModelCached(embeddings, dPq)
        if (evs.isEmpty) None
        else Some(
          pqTopM(pcaScoredWith(pcaCodesCached(embeddings, dPq), nQueries), maxP * k)
            .select(col("query_id"), col("vec_id"),
              ceil(col("rk").cast("double") / lit(k)).cast("long").as("lvl")))
      }

    // the two COMPOSITIONS, audited like their flat parents: refine
    // levels nest (lvl = ceil(cell-pruned code-scan rank / k)) at the
    // standalone queries' fixed nProbe = 4 coarse quantizer, reading
    // the SAME memoized parents the standalone compositions serve
    // (ivfpq@refine r equals ivfPqAnn(refine = r), pinned).
    val compProbe = 4
    lazy val assignedSeed = assignCellsCached(embeddings, seedCents, s"seed:$nCells")
    def compPlan(scored: Option[DataFrame]): Option[DataFrame] =
      scored.map(s =>
        pqTopM(s, maxP * k)
          .select(col("query_id"), col("vec_id"),
            ceil(col("rk").cast("double") / lit(k)).cast("long").as("lvl")))
    def ivfPqPlan: Option[DataFrame] =
      if (dPq <= 0 || dPq % PqSub != 0) None
      else {
        val books = pqCodebooksCached(embeddings, PqSub, PqCodes, PqIters, PqTrainN, dPq)
        if (books.isEmpty) None
        else compPlan(ivfPqScored(embeddings, books,
          pqCodesCached(embeddings, books, PqSub, PqCodes, PqIters, PqTrainN, dPq),
          seedCents, assignedSeed, nQueries, compProbe, dPq))
      }
    def ivfSq8Plan: Option[DataFrame] =
      if (dPq <= 0) None
      else {
        val bounds = sq8BoundsCached(embeddings, dPq)
        if (bounds.isEmpty) None
        else compPlan(ivfSq8Scored(embeddings, bounds,
          sq8CodesCached(embeddings, dPq),
          seedCents, assignedSeed, nQueries, compProbe, dPq))
      }

    // OPQ: the rotated frame's ADC ranking, refine levels nesting like
    // PQ's — audits the SAME memoized rotation+codebooks q_ann_opq
    // searches (opq@refine r equals opqAnn(refine=r), pinned). The
    // scored pairs join back to the ORIGINAL e/qs in scoredLevels for
    // the exact cosine — identical values by rotation invariance.
    def opqPlan: Option[DataFrame] =
      if (dPq <= 0 || dPq % PqSub != 0) None
      else {
        val (evs, _) = pcaModelCached(embeddings, dPq)
        if (evs.isEmpty) None
        else {
          val rotated = rotatedCached(embeddings, dPq)
          val books = pqCodebooksCached(rotated, PqSub, PqCodes, PqIters, PqTrainN, dPq)
          if (books.isEmpty) None
          else {
            val codes = pqCodesCached(rotated, books, PqSub, PqCodes, PqIters, PqTrainN, dPq)
            val opqQs = pqQueryTabs(unitCorpus(rotated, dPq), books, PqSub, dPq, nQueries)
            Some(pqTopM(pqAdcScore(codes, opqQs), maxP * k)
              .select(col("query_id"), col("vec_id"),
                ceil(col("rk").cast("double") / lit(k)).cast("long").as("lvl")))
          }
        }
      }

    // ---- OVERLAPPED candidate derivation (round-15, guide §2.6):
    // the ten methods' candidate materializations are independent
    // Spark actions, and running them serially left most executor
    // slots idle through each job's straggler tail at audit scale.
    // A small driver pool submits them concurrently (FIFO scheduling
    // back-fills freed slots); the memoized seams they share
    // (codebooks, cell assignments, k-means) are compute-once under
    // races, so a cold session pays each seam exactly once regardless
    // of arrival order. Result order is the fixed method list — the
    // output is order-insensitive (per-method aggregates), but
    // determinism costs nothing.
    val methodPlans: Seq[(String, () => Option[DataFrame])] = Seq(
      "lsh" -> (() => Some(lshPlan)),
      "ivf" -> (() => Some(ivfPlan(seedCents, s"seed:$nCells"))),
      "ivf_kmeans" -> (() => Some(ivfPlan(kmCents, s"kmeans:$nCells:$kmIters"))),
      "pq" -> (() => pqPlan),
      "sq8" -> (() => sq8Plan),
      "pca" -> (() => pcaPlan),
      "ivfpq" -> (() => ivfPqPlan),
      "ivfsq8" -> (() => ivfSq8Plan),
      "opq" -> (() => opqPlan))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val allLvls: Seq[(String, DataFrame)] =
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(methodPlans.map { case (m, thunk) =>
            scala.concurrent.Future(thunk().map(df => m -> scoredLevels(m, df)))
          }),
          scala.concurrent.duration.Duration.Inf).flatten
      } finally pool.shutdown()

    // ---- the ONE shared probe pass (round-15): every method's
    // checkpointed candidate levels union into a method-tagged table
    // and a single corpus-side join + broadcast query join scores them
    // all exactly — the ten serial per-method rescore joins collapse
    // to one, so the audit costs ~the most expensive single method's
    // candidate derivation plus one scoring pass.
    val scoredAll = allLvls.map(_._2).reduce(_ unionAll _)
      .join(e.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
      .join(broadcast(qs), "query_id")
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .select(col("method"), col("query_id"), col("vec_id"), col("lvl"), col("cos"))
      .boundedCheckpoint()

    // One subtree for ALL methods, not per (method, sweep point): a
    // single shared window (partition (method, query) — identical
    // order+frame for every sweep column ⇒ ONE WindowExec) carries
    // |probeSweep| conditional running counts — rk_p = rank among the
    // method's candidates with lvl ≤ p, which for a row with lvl ≤ p
    // equals row_number over the filtered set — then ONE truth
    // semi-join + ONE groupBy(method) aggregation price every
    // (method, operating point), and the per-point rows unpivot from
    // the per-method aggregate rows (the labelCentroids
    // explode-a-literal-struct-array move). Row-identical to the
    // per-method formulation.
    val w = Window.partitionBy("method", "query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = scoredAll.select(
      Seq(col("method"), col("query_id"), col("vec_id"), col("lvl")) ++
        sweep.map(p => sum(when(col("lvl") <= p, 1L).otherwise(0L)).over(w).as(s"rk$p")): _*)
    val hitAggs = sweep.map(p =>
      sum(when(col("lvl") <= p && col(s"rk$p") <= k, 1L).otherwise(0L)).as(s"h$p"))
    val hits = ranked.join(truth, Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("method")).agg(hitAggs.head, hitAggs.tail: _*)
    // the COST axis of the tradeoff the audit exists to drive:
    // candidates the method scored exactly at each operating point
    val candAggs = sweep.map(p =>
      sum(when(col("lvl") <= p, 1L).otherwise(0L)).as(s"c$p"))
    val cands = scoredAll.groupBy(col("method")).agg(candAggs.head, candAggs.tail: _*)
    // seed from the included-method list so a method with zero
    // candidates still emits its zero-hit sweep rows (the pre-shared
    // truth-left-join behavior)
    val session = embeddings.sparkSession
    import session.implicits._
    val methodSeed = allLvls.map(_._1).toDF("method")
    val wallMap = map(allLvls.flatMap { case (m, _) =>
      Seq(lit(m), lit(methodWallMs.getOrElse(m, 0L))) }: _*)
    val perMethod = Det.attachScalar(
      methodSeed
        .join(hits, Seq("method"), "left")
        .join(cands, Seq("method"), "left"),
      truth.agg(count(lit(1)).as("n_truth")))
    val rows = sweep.map(p => struct(
      col("method"), lit(p).cast("long").as("n_probe"),
      col("n_truth"), coalesce(col(s"h$p"), lit(0L)).as("n_hit"),
      Det.r(coalesce(col(s"h$p"), lit(0L)).cast("double") /
        greatest(col("n_truth"), lit(1L)).cast("double"), 6).as("recall"),
      coalesce(col(s"c$p"), lit(0L)).as("n_cands"),
      element_at(wallMap, col("method")).as("wall_ms")))
    perMethod
      .select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** q128: IVF cell-BALANCE audit — the probe-COST axis [[annEval]]'s
    * recall sweep cannot see: per (index, cell) the member count,
    * corpus share, and mean member-to-centroid cosine (cohesion). A
    * hot cell is the IVF scale hazard — every query probing it scans
    * its whole posting list, so serve-time cost variance IS the share
    * spread — and low cohesion says the cell boundary cuts through
    * true neighborhoods (the recall hazard). Reads BOTH indexes the
    * standalone searches serve (seed + kmeans) through the same
    * memoized assignments, so the audit adds zero index builds.
    *
    * Scale shape: the assignment is the memoized scan-side projection;
    * the per-row cosine to the OWN centroid is one broadcast equi-join
    * with the bounded centroid table + a VecDot; each cosine fixes to
    * an integer MICRO-COSINE before the per-cell sum (the
    * embedOutliers discipline — order-free longs), and the rollup is
    * ≤2·nCells rows. Model-dependent (kmeans) ⇒ rows-only;
    * share-partition, bounds, per-index row counts and a driver-side
    * seed-index recomputation pinned in SimilaritySpec.
    */
  def ivfCellProfile(
      embeddings: DataFrame, nCells: Int = 16, kmIters: Int = 5): DataFrame = {
    val e = prepared(embeddings)
    // zero-norm vectors have no cosine to any centroid (the unitCorpus
    // discipline) — excluded from both the shares and the cohesion
    val ev = e.filter(col("nrm") > 0)
    val n = ev.count()
    def profile(cents: DataFrame, tag: String, name: String): DataFrame = {
      val assigned = assignCellsCached(embeddings, cents, tag)
      assigned
        .join(ev.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
        .join(broadcast(cents), Seq("cell"))
        .withColumn("micro_cos",
          floor(dot(col("v"), col("cv")) / (col("nrm") * col("cn")) * lit(1000000.0) +
            lit(0.5)).cast("long"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("micro_cos")).as("mc"))
        .select(lit(name).as("index"), col("cell"), col("n_vecs"),
          Det.r(col("n_vecs").cast("double") / lit(n.toDouble), 6).as("share"),
          Det.r(col("mc").cast("double") / lit(1000000.0) / col("n_vecs").cast("double"), 6)
            .as("mean_cos"))
    }
    val seedCents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("nrm").as("cn"))
    val kmCents = kmeansCached(embeddings, nCells, kmIters)
      .select(col("cell"), col("cv"), lit(1.0).as("cn"))
    profile(seedCents, s"seed:$nCells", "seed")
      .unionAll(profile(kmCents, s"kmeans:$nCells:$kmIters", "kmeans"))
  }

  /** Per-label embedding centroids — the bridge between the vector
    * table and everything that consumes cluster/class prototypes (IVF
    * seeding, drift monitoring per slice, class-mean classifiers).
    *
    * Plan: `dim` independent `sum` aggregate columns (plain codegen
    * aggregates with partial aggregation) over ONE groupBy(label)
    * shuffle — each map task forwards `dim` longs + a count per
    * label, never the vectors. The long-format unpivot (explode of a
    * literal struct array) runs over the ≤|labels|-row aggregate,
    * where the `dim`× replication is free.
    *
    * Determinism: each element is fixed to an integer MICRO unit
    * (6-dp half-up floor) BEFORE summation, so the per-label sum is
    * an exact order-free long (the surprisal/PSI fixed-point policy
    * — a double `avg` would depend on summation order within ~1 ulp
    * and can flake the cross-engine hash at a rounding boundary).
    * The mean is then ONE IEEE division of two exactly-represented
    * integers (micro-sum / (n·1e6)) — bit-identical in any engine.
    * Micro-sums stay far from Long range (|v|≲1 ⇒ ≤1e6·n; fine to
    * n~1e12 rows/label), and n·1e6 is double-exact to n≈9e9.
    */
  def labelCentroids(embeddings: DataFrame, dim: Int = 64): DataFrame = {
    val sums = (0 until dim).map(i =>
      sum(floor(col("embedding")(i).cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))
        .as(s"s$i"))
    val wide = embeddings
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sums: _*)
    val dimRows = (0 until dim).map(i =>
      struct(lit(i).cast("long").as("dim"),
        (col(s"s$i").cast("double") / (col("n") * lit(1000000L)).cast("double")).as("mean")))
    wide
      .select(col("label").cast("long").as("label"), col("n"),
        explode(array(dimRows: _*)).as("d"))
      .select(col("label"), col("d.dim").as("dim"), col("n"), col("d.mean").as("mean"))
  }

  /** DuckDB oracle: 64 integer micro-sum columns on the tiny
    * aggregate, unpivoted via UNION ALL (1-based list indexing on
    * the DuckDB side). Same fixed-point-then-one-divide recipe as
    * the Spark plan, so the mean is bit-identical.
    */
  def sqlLabelCentroids(dim: Int = 64): String = {
    val sums = (0 until dim)
      .map(i => s"CAST(sum(CAST(floor(CAST(embedding[${i + 1}] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s$i")
      .mkString(",\n    ")
    val arms = (0 until dim).map(i =>
      s"SELECT label, CAST($i AS BIGINT) AS dim, n, CAST(s$i AS DOUBLE) / CAST(n * 1000000 AS DOUBLE) AS mean FROM wide")
      .mkString("\nUNION ALL\n")
    s"""WITH wide AS (
       |  SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n,
       |    $sums
       |  FROM embeddings GROUP BY 1
       |)
       |$arms""".stripMargin
  }

  /** Per-dimension int8 scalar quantization — the storage-compression
    * step of a vector pipeline (4× smaller than float32; what a
    * vector index persists). Classic TWO-PASS shape: pass 1 reduces
    * the table to one row of per-dimension min/max (2·dim codegen agg
    * columns — only that row crosses the network); pass 2 broadcasts
    * it back and quantizes scan-side:
    * q_i = floor((v_i − min_i)/(max_i − min_i)·255 + 0.5), constant
    * dimensions map to 0. Emitted as the comma-joined code string's
    * md5 (the storage identity) plus the leading codes for
    * inspection. Every per-element step is an exact IEEE scalar
    * sequence on identical inputs (min/max are SELECTIONS, not
    * accumulations — no float-sum order anywhere), so the DuckDB twin
    * hash-matches bit-exactly.
    */
  def quantizeInt8(embeddings: DataFrame, dim: Int = 64): DataFrame = {
    val aggs = (0 until dim).flatMap { i =>
      val v = col("embedding")(i).cast("double")
      Seq(min(v).as(s"lo$i"), max(v).as(s"hi$i"))
    }
    val minmax = embeddings.agg(aggs.head, aggs.tail: _*)
    def q(i: Int): Column = {
      val v = col("embedding")(i).cast("double")
      when(col(s"hi$i") > col(s"lo$i"),
        floor((v - col(s"lo$i")) / (col(s"hi$i") - col(s"lo$i")) * lit(255.0) + lit(0.5))
          .cast("int"))
        .otherwise(lit(0))
    }
    val codes = (0 until dim).map(i => q(i).as(s"q$i"))
    Det.attachScalar(embeddings, minmax)
      .select((col("vec_id") +: codes): _*)
      .select(col("vec_id"),
        md5(concat_ws(",", (0 until dim).map(i => col(s"q$i")): _*).cast("binary")).as("q_md5"),
        col("q0"), col("q1"), col("q2"), col("q3"))
  }

  def sqlQuantizeInt8(dim: Int = 64): String = {
    val aggs = (0 until dim).flatMap { i =>
      val v = s"CAST(embedding[${i + 1}] AS DOUBLE)"
      Seq(s"min($v) AS lo$i", s"max($v) AS hi$i")
    }
    def q(i: Int) = {
      val v = s"CAST(e.embedding[${i + 1}] AS DOUBLE)"
      s"CASE WHEN m.hi$i > m.lo$i THEN CAST(floor(($v - m.lo$i) / (m.hi$i - m.lo$i) * 255.0 + 0.5) AS INTEGER) ELSE 0 END"
    }
    val codeList = (0 until dim).map(q).mkString(",\n      ")
    s"""WITH m AS (
       |  SELECT ${aggs.mkString(", ")} FROM embeddings
       |), c AS (
       |  SELECT e.vec_id, [
       |      $codeList
       |    ] AS qs
       |  FROM embeddings e, m
       |)
       |SELECT vec_id,
       |  md5(array_to_string(qs, ',')) AS q_md5,
       |  qs[1] AS q0, qs[2] AS q1, qs[3] AS q2, qs[4] AS q3
       |FROM c""".stripMargin
  }

  /** Re-score candidate pairs exactly and keep the top k per query. */
  private def rankTopK(pairs: DataFrame, e: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val qs = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    pairs
      .join(e.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
      .join(broadcast(qs), "query_id")
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), Det.r(col("cos"), 6).as("cosine"))
  }
}
