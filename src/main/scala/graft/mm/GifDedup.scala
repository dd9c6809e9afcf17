package graft.mm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Ckpt.CkptOps

/** FRAME-LEVEL animation dedup — the round-11 verdict's #3 gap: the
  * GIF walker enumerated real frames (q144) but nothing hashed them,
  * so two animations sharing 9 of 10 frames were invisible to every
  * screen. Two operators close it:
  *
  *   - q173 `gifFrames`: per-frame CONTENT SIGNATURES from the real
  *     block walk — each frame's LZW data sub-block payload (the
  *     actual bytes the walker traverses) packed into a 64-bit
  *     signature ([[MediaCodec.walkGif]]'s `chainSig`: first 8
  *     payload bytes LE, top byte masked to 7 bits). Two frames are
  *     "the same picture" iff their payload bytes agree — the
  *     frame-set identity a re-muxed animation preserves and a
  *     re-timed one (different delays, same frames) preserves too.
  *   - q174 `gifDedup`: ASYMMETRIC frame-set containment pairs (the
  *     #127 semantics on frame signatures): C(A→B) = |A∩B|/|A| over
  *     each doc's distinct-signature set, emitted for C ≥ τ in BOTH
  *     directions (re-timed twins contain each other; a trimmed cut
  *     is contained in its source one-way). Candidates come from the
  *     frame-signature EQUI-join — pairs sharing zero frames are
  *     never compared.
  *
  * Planting (the phash/audio discipline): animations are keyed by
  * GROUP doc_id div 48 (bounded cliques — the r11 scale lesson) with
  * variant doc_id % 3: v0 the base cut (frames cid 0..n-1, delay 5),
  * v1 the RE-TIMED re-encode (same frame contents, delay 9 —
  * different bytes, C=1 both ways), v2 one frame at position g%n
  * REPLACED (cid 100+f — shares n-1 of n frames). n = 4 + g%4, so
  * with τ=0.75 even the n=4 groups' v2 pairs (C=3/4 exactly) stay in
  * — the boundary case both engines must agree on. Every 19th doc is
  * truncated 2 bytes short and quarantines (truncated_block — the
  * walker dies inside the final sub-block chain).
  *
  * Both queries are HASH-EXACT: the DuckDB oracle replays the
  * planting arithmetic (group/variant → content id → payload bytes →
  * LE pack) with zero byte walking — proof the Spark signatures came
  * from actually-walked sub-block bytes. Scale shape: the walk is the
  * typed mapPartitions batch seam (memoized per corpus, itemized
  * `mm_gif_frames`); the pair join is one frame_sig equi-join with
  * group-bounded cliques; containment needs no full-index asymmetry
  * here because frame sets are tiny (≤7) — the per-doc set size rides
  * the exploded rows exactly like bm25's doc length.
  */
object GifDedup {

  /** Planted-animation arithmetic — shared by the builder and the
    * oracle. Content id = which PICTURE a frame position shows.
    */
  private[graft] def gdNFrames(g: Long): Int = (4L + math.floorMod(g, 4L)).toInt
  private[graft] def gdCid(g: Long, v: Long, f: Int): Long =
    if (v == 2L && f.toLong == g % gdNFrames(g).toLong) 100L + f else f.toLong
  /** Payload byte j of content `cid` in group `g`. The 8-byte frame
    * signature must be INJECTIVE in (g, cid): the original
    * `(g·13 + cid·29 + j·41) mod 256` form had only 256 distinct
    * signatures corpus-wide, so unrelated groups collided every ~256
    * groups and the pair output grew QUADRATICALLY with corpus size —
    * the unbounded-clique failure the div-48 grouping exists to avoid.
    * Now bytes 0–3 carry (g·KA mod 2^32) and bytes 4–5 carry
    * (cid·KB mod 2^16); both multipliers are odd (units mod 2^32 /
    * 2^16), so distinct (g, cid) → distinct signatures for any
    * g < 2^32, cid < 2^16 — cross-group frame sets are DISJOINT and
    * the equi-join never emits a cross-group candidate. Bytes 6–7 stay
    * mixing bytes (7 masked to 7 bits — the walker's chainSig top-byte
    * convention).
    */
  private[graft] val GdKA = 2654435761L // Knuth 32-bit golden ratio; odd
  private[graft] val GdKB = 40503L // 16-bit Fibonacci-hash multiplier; odd
  private[graft] def gdByte(g: Long, cid: Long, j: Int): Int =
    if (j <= 3) (((g * GdKA) >> (8 * j)) & 255L).toInt
    else if (j <= 5) (((cid * GdKB) >> (8 * (j - 4))) & 255L).toInt
    else {
      val m = if (j == 7) 128L else 256L
      math.floorMod(g * 13L + cid * 29L + 7L, m).toInt
    }
  private[graft] def gdSig(g: Long, cid: Long): Long =
    (0 until 8).map(j => gdByte(g, cid, j).toLong << (8 * j)).sum

  private[mm] final case class GifFrameRow(
      doc_id: Long, frame_pos: Long, frame_sig: Long, err: String)

  /** q173: the per-(doc, frame) signature table from the REAL walk. */
  def gifFrames(documents: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id").as[Long].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { id =>
          val g = id / 48L
          val v = math.floorMod(id, 3L)
          val n = gdNFrames(g)
          val full = MediaCodec.buildGifAnim(
            64L, 48L, n,
            f => if (v == 1L) 9L else 5L,
            f => 64L, f => 48L,
            _ => 8,
            (f, j) => gdByte(g, gdCid(g, v, f), j))
          val payload = if (math.floorMod(id, 19L) == 0L) full.take(full.length - 2) else full
          MediaCodec.walkGif(payload)((_, _, frames) => frames) match {
            case Right(frames) =>
              frames.zipWithIndex.map { case (fr, f) =>
                GifFrameRow(id, f.toLong, fr.sig, "")
              }
            case Left(err) => Seq(GifFrameRow(id, -1L, -1L, err))
          }
        }
      }
    }.toDF()
  }

  /** Memoized, materialized [[gifFrames]] — one walk per corpus per
    * session feeds the signature query and both pair-join sides.
    */
  private val gfMemo =
    graft.Memo[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame]()

  def gifFramesCached(documents: DataFrame): DataFrame =
    gfMemo.getOrElseUpdate(documents.sparkSession,
      documents.queryExecution.analyzed.canonicalized)(
      gifFrames(documents).boundedCheckpoint())

  /** Bench seam itemization (the MediaCodec.prewarm discipline). */
  def prewarm(documents: DataFrame): Seq[(String, Double)] = {
    val t0 = System.nanoTime()
    gifFramesCached(documents)
    Seq("mm_gif_frames" -> ((System.nanoTime() - t0) / 1e9))
  }

  /** q174: frame-set containment pairs over the signature table. */
  def gifDedup(documents: DataFrame, tau: Double = 0.75): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1], got $tau")
    val fr = gifFramesCached(documents).filter(col("err") === "")
      .select(col("doc_id"), col("frame_sig")).distinct()
    val counts = fr.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val sized = fr.join(counts, Seq("doc_id"))
    val a = sized.toDF("doc_a", "frame_sig", "n_a")
    val b = sized.select(col("doc_id").as("doc_b"), col("frame_sig"))
    a.join(b, Seq("frame_sig"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("containment",
        col("n_shared").cast("double") / col("n_a").cast("double"))
      .filter(col("containment") >= tau)
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("n_a"),
        graft.Det.r(col("containment"), 6).as("containment"))
  }

  // ------------------------------------------------------ DuckDB twins

  /** The signature CTE chain shared by both oracles, ending in
    * `gsig(doc_id, frame_pos, frame_sig)` over decodable docs.
    */
  private def sqlSigCtes: String =
    """gd AS (
      |  SELECT doc_id, doc_id // 48 AS g, doc_id % 3 AS v,
      |    4 + (doc_id // 48) % 4 AS n
      |  FROM documents
      |), gdf AS (
      |  SELECT doc_id, g, v, n, unnest(range(0, n)) AS f FROM gd
      |), gdc AS (
      |  SELECT doc_id, g, f,
      |    CASE WHEN v = 2 AND f = g % n THEN 100 + f ELSE f END AS cid
      |  FROM gdf
      |), gdj AS (
      |  SELECT doc_id, g, f, cid, unnest(range(0, 8)) AS j FROM gdc
      |), gdb AS (
      |  SELECT doc_id, f, j,
      |    CASE WHEN j <= 3 THEN ((g * 2654435761) // (CASE j WHEN 0 THEN 1
      |           WHEN 1 THEN 256 WHEN 2 THEN 65536 ELSE 16777216 END)) % 256
      |         WHEN j = 4 THEN (cid * 40503) % 256
      |         WHEN j = 5 THEN ((cid * 40503) // 256) % 256
      |         WHEN j = 6 THEN (g * 13 + cid * 29 + 7) % 256
      |         ELSE (g * 13 + cid * 29 + 7) % 128 END AS b
      |  FROM gdj
      |), gsig AS MATERIALIZED (
      |  SELECT doc_id, f AS frame_pos,
      |    CAST(sum(b * (CAST(1 AS BIGINT) << (8 * j))) AS BIGINT) AS frame_sig
      |  FROM gdb GROUP BY 1, 2
      |)""".stripMargin

  def sqlGifFrames: String =
    s"""WITH $sqlSigCtes
       |SELECT doc_id, CAST(frame_pos AS BIGINT) AS frame_pos, frame_sig, '' AS err
       |FROM gsig WHERE doc_id % 19 <> 0
       |UNION ALL
       |SELECT doc_id, CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), 'truncated_block'
       |FROM documents WHERE doc_id % 19 = 0""".stripMargin

  def sqlGifDedup(tau: Double = 0.75): String =
    s"""WITH $sqlSigCtes, gset AS (
       |  SELECT DISTINCT doc_id, frame_sig FROM gsig WHERE doc_id % 19 <> 0
       |), gcnt AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM gset GROUP BY 1
       |), gpair AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(count(*) AS BIGINT) AS n_shared
       |  FROM gset a JOIN gset b ON a.frame_sig = b.frame_sig
       |  WHERE a.doc_id <> b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT p.doc_a, p.doc_b, p.n_shared, c.n AS n_a,
       |  floor(CAST(p.n_shared AS DOUBLE) / CAST(c.n AS DOUBLE)
       |    * 1000000.0 + 0.5) / 1000000.0 AS containment
       |FROM gpair p JOIN gcnt c ON p.doc_a = c.doc_id
       |WHERE CAST(p.n_shared AS DOUBLE) / CAST(c.n AS DOUBLE) >= $tau""".stripMargin
}
