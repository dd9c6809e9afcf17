package graft.mm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Ckpt.CkptOps

/** AUDIO perceptual fingerprint + near-dup family — the modality gap
  * the round-11 verdict ranked #2: real WAV decode existed (q143) but
  * a re-encoded audio copy sharing no bytes passed every ingest
  * screen. This is the image dHash family (MediaCodec q148-q155)
  * replayed on the PCM-16 modality:
  *
  *   - FINGERPRINT (q169): the energy-difference hash — the dHash
  *     construction on the time axis (Haitsma–Kalker's band-energy
  *     delta fingerprint collapsed to one band): the decoded mono
  *     stream splits into 65 fixed 2-frame segments, segment energy =
  *     Σ|s16|, bit k = 1 iff E(k+1) > E(k), packed as FOUR 16-bit
  *     bands (the SimHash banding unit). Comparisons are invariant
  *     under positive GAIN (a volume change / re-encode scales every
  *     energy by the same factor ⇒ identical hash by construction),
  *     and a LOCAL edit perturbs one segment ⇒ at most the 2 bits
  *     whose comparisons touch it.
  *   - PAIRS (q170): banded Hamming self-join — candidates share ANY
  *     16-bit band (one (band, value) equi-join shuffle; with ≤ tau=2
  *     flipped bits ≥2 bands are intact, so every true pair IS a
  *     candidate by pigeonhole — the join is EXACT, not approximate),
  *     verified by exact bit_count Hamming.
  *   - DROP (q171): first-wins verdicts over connected components of
  *     the pair graph (min-label propagation — the Lee et al. rule
  *     the image/batch screens use).
  *   - SCREEN (q172): the incremental-ingest form — a landed batch
  *     clip keeps iff NO stored clip sits within Hamming tau.
  *
  * Planting (the phashPixelAt discipline, MediaCodec.scala:846): clips
  * are keyed by GROUP doc_id div 48 (BOUNDED cliques — the r11 scale
  * lesson: modulus-keyed groups grow with the corpus and turn every
  * pair emitter quadratic; and the comparison pattern is INJECTIVE in
  * the group via an affine 32-bit mix — see [[fpBit]] — so cliques
  * never merge ACROSS groups either, the GifDedup gdByte lesson) with
  * variant doc_id % 3: v0 base signal, v1 base ×3 gain (different
  * bytes, same fingerprint — the re-encoded copy lexical dedup is
  * blind to), v2 one segment's samples +2500 (≤2 bits flip —
  * structural; the exact count is (bit t−1 = 0) + (bit t = 1)).
  * Sample magnitudes stay ≤29400, inside s16 — no clamp can desync
  * builder and oracle. Every 19th doc ships truncated to 9 bytes and
  * must quarantine (the family's corruption discipline). All four
  * queries are HASH-EXACT: the DuckDB oracle replays the planting
  * arithmetic through the same segment-energy/compare/pack pipeline
  * with zero byte decoding — proof the Spark bits came from actual
  * decoded RIFF bytes.
  *
  * Scale shape: fingerprinting is the typed mapPartitions batch seam
  * (scan-side, embarrassingly parallel, zero shuffles); all join work
  * is banded equi-joins; the decode pass is memoized once per corpus
  * per session ([[fpCached]], the phashCached discipline) and
  * itemized in the bench build line via [[prewarm]].
  */
object AudioFp {

  private[graft] val nSeg = 65 // 64 comparison bits = 4 × 16-bit bands
  private[graft] val segFrames = 2
  private[graft] val fpFrames = nSeg * segFrames // 130 mono frames
  private val fpRate = 8000L

  /** Planted-signal arithmetic — shared by the builder and the oracle.
    *
    * The comparison pattern is INJECTIVE in the group (the GifDedup
    * gdByte lesson, replayed on this modality): the original smooth
    * base signal made the 64 energy comparisons a near-periodic
    * function of g, so UNRELATED groups collided on whole fingerprints
    * — measured at sf1: 1,082 distinct fingerprints across 1,042
    * groups, 623-doc cross-group cliques, 417M banded candidate rows,
    * and q_audio_drop's component propagation dying outright. Now bit
    * k of group g is bit k of an affine 32-bit mix ((g·KA + CA) mod
    * 2^32 for k < 32; the KB/CB half for k ≥ 32) — distinct groups
    * < 2^32 get distinct comparison patterns (KA, KB odd ⇒ the mixes
    * are bijections), two groups land within Hamming ≤ 2 only when
    * their id difference inverts to a ≤2-bit value (≈500·nGroups/2^32
    * of all pairs — none at any bench scale), and the pair graph is
    * the PLANTED bounded ≤48-id group cliques at every corpus size
    * (measured: candidates 0.38M/3.9M/11.6M at sf0.1/1/3 — linear).
    *
    * Segment energies walk the pattern: E(0) = 10000, E(k+1) = E(k) ±
    * 150 as bit k directs (range [400, 19600], always even, always
    * positive); each segment's two frames carry E/2 per sample, so the
    * decoded integer energy is exactly E. Gain (v1, ×3 ≤ 29400 < s16
    * max) scales every energy — comparisons invariant; the v2 edit
    * (+2500 per sample on segment g mod 65) raises that one energy by
    * exactly 5000 > the 150-step, so comparisons t−1 and t saturate
    * (up into t, down out of it) and the flip count is (bit t−1 = 0)
    * + (bit t = 1) ∈ {0, 1, 2} — the ≤2-bit bound is structural, the
    * ≥1 for group 0 is a concrete-value fact (bit 0 of CA is 1).
    */
  private[graft] val KA = 2654435761L
  private[graft] val CA = 2654435769L
  private[graft] val KB = 2246822519L
  private[graft] val CB = 3266489917L
  private val M32 = 4294967296L

  /** Comparison-pattern bit k (0..63) for group g. */
  private[graft] def fpBit(g: Long, k: Int): Int =
    if (k < 32) ((((g * KA + CA) % M32) >> k) & 1L).toInt
    else ((((g * KB + CB) % M32) >> (k - 32)) & 1L).toInt

  /** Target base-variant segment energy (before gain/edit). */
  private[graft] def fpEnergy(g: Long, seg: Int): Long = {
    var e = 10000L
    var k = 0
    while (k < seg) { e += (if (fpBit(g, k) == 1) 150L else -150L); k += 1 }
    e
  }

  private[graft] def fpSample(docId: Long, i: Int): Int = {
    val g = docId / 48L
    val v = math.floorMod(docId, 3L)
    val seg = i / segFrames
    val s = fpEnergy(g, seg) / 2L
    (if (v == 1L) s * 3L
     else if (v == 2L && seg == (g % nSeg.toLong).toInt) s + 2500L
     else s).toInt
  }

  /** Energy-delta hash over a decoded mono s16 stream: 65 segment
    * energies (integer Σ|s|, so both engines are exact), bit k set iff
    * E(k+1) > E(k), packed as four 16-bit bands. Exposed for the
    * spec's driver-side recomputation.
    */
  private[graft] def energyBands(samples: Array[Int]): Array[Long] = {
    val e = Array.ofDim[Long](nSeg)
    var i = 0
    val n = math.min(samples.length, nSeg * segFrames)
    while (i < n) {
      e(i / segFrames) += math.abs(samples(i).toLong)
      i += 1
    }
    val bands = Array.fill(4)(0L)
    var k = 0
    while (k < nSeg - 1) {
      if (e(k + 1) > e(k)) bands(k / 16) |= 1L << (k % 16)
      k += 1
    }
    bands
  }

  private[mm] final case class FpRow(
      doc_id: Long, n_frames: Long,
      b0: Long, b1: Long, b2: Long, b3: Long, err: String)

  /** q169: the per-clip fingerprint from a REAL RIFF/WAVE decode —
    * spec-valid PCM-16 bytes built from the planting arithmetic, then
    * the q143 chunk walk ([[MediaCodec.wavSamples]] — word-aligned
    * past the planted JUNK chunk, LE fmt parse, sign-extended s16
    * stream) feeding [[energyBands]]. A misread pad byte, endianness
    * slip, or sign-extension bug shifts an energy and fails the hash.
    */
  def audioFingerprint(documents: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id").as[Long].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { id =>
          val full = MediaCodec.buildWav(
            1, fpRate, fpFrames, (f, _) => fpSample(id, f))
          val payload = if (math.floorMod(id, 19L) == 0L) full.take(9) else full
          MediaCodec.wavSamples(payload) match {
            case Right(s) =>
              val b = energyBands(s)
              FpRow(id, s.length.toLong, b(0), b(1), b(2), b(3), "")
            case Left(err) => FpRow(id, -1L, -1L, -1L, -1L, -1L, err)
          }
        }
      }
    }.toDF()
  }

  /** Memoized, materialized [[audioFingerprint]] — one decode pass per
    * corpus per session feeds the hash query, both pair-join sides,
    * the drop verdict, and both screen sides.
    */
  private val fpMemo =
    graft.Memo[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame]()

  def fpCached(documents: DataFrame): DataFrame =
    fpMemo.getOrElseUpdate(documents.sparkSession,
      documents.queryExecution.analyzed.canonicalized)(
      audioFingerprint(documents).boundedCheckpoint())

  /** Bench seam itemization (the MediaCodec.prewarm discipline). */
  def prewarm(documents: DataFrame): Seq[(String, Double)] = {
    val t0 = System.nanoTime()
    fpCached(documents)
    Seq("mm_audio_fp" -> ((System.nanoTime() - t0) / 1e9))
  }

  /** q170: near-duplicate AUDIO pairs — banded Hamming self-join over
    * the fingerprint, pigeonhole-exact at tau ≤ 2 (see object doc).
    */
  def audioDedup(documents: DataFrame, tau: Int = 2): DataFrame = {
    val ub = MediaCodec.bandUnpivot(fpCached(documents))
    val l = ub.toDF("a", "a0", "a1", "a2", "a3", "bi", "bv")
    val r = ub.toDF("b", "c0", "c1", "c2", "c3", "bi", "bv")
    val cands = l.join(r, Seq("bi", "bv")).filter(col("a") < col("b"))
      .select("a", "b", "a0", "a1", "a2", "a3", "c0", "c1", "c2", "c3")
      .distinct()
    val hamming = (0 to 3).map(i =>
      bit_count(col(s"a$i").bitwiseXOR(col(s"c$i")))).reduce(_ + _).cast("long")
    cands.select(col("a"), col("b"), hamming.as("hamming"))
      .filter(col("hamming") <= tau)
  }

  /** q171: first-wins drop verdicts — keep iff the clip is its
    * perceptual cluster's min doc_id; quarantined payloads excluded
    * (they never landed as audio; the decode gate reports them).
    */
  def audioDrop(documents: DataFrame, tau: Int = 2): DataFrame = {
    val fp = fpCached(documents).filter(col("err") === "").select("doc_id")
    val pairs = audioDedup(documents, tau)
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
    // clustersCached, not clusters(): memoized stable blocks — no
    // extra checkpoint copy, no per-invocation labels leak (round 16)
    val labels = graft.dedup.Dedup.clustersCached(pairs)
    fp.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("keep", col("cluster_id") === col("doc_id"))
  }

  /** q172: the AUDIO incremental-ingest screen — the sixth screen
    * modality (exact/near-Jaccard/containment/span/embedding/
    * perplexity/image all have one): a landed batch clip keeps iff no
    * stored clip sits within Hamming tau. An undecodable payload is
    * not an audio-dup risk — it passes with decoded=false (the decode
    * gate reports it separately, the image-screen convention).
    */
  def audioScreen(documents: DataFrame, batchMod: Long = 10, tau: Int = 2): DataFrame = {
    require(batchMod >= 2, "batchMod must split the corpus into batch and existing")
    val fp = fpCached(documents)
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === 0
    val b = MediaCodec.bandUnpivot(fp.filter(isBatch))
      .toDF("bdoc", "a0", "a1", "a2", "a3", "bi", "bv")
    val s = MediaCodec.bandUnpivot(fp.filter(!isBatch))
      .toDF("sdoc", "c0", "c1", "c2", "c3", "bi", "bv")
    val hamming = (0 to 3).map(i =>
      bit_count(col(s"a$i").bitwiseXOR(col(s"c$i")))).reduce(_ + _)
    val hits = b.join(s, Seq("bi", "bv"))
      .select("bdoc", "sdoc", "a0", "a1", "a2", "a3", "c0", "c1", "c2", "c3")
      .distinct()
      .filter(hamming <= tau)
      .groupBy(col("bdoc"))
      .agg(count(lit(1)).as("n"))
      .select(col("bdoc").as("doc_id"), col("n"))
    fp.filter(isBatch).select(col("doc_id"), (col("err") === "").as("decoded"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("decoded"),
        coalesce(col("n"), lit(0L)).cast("long").as("n_store_dups"))
      .withColumn("audio_keep", col("n_store_dups") === 0L)
  }

  // ------------------------------------------------------ DuckDB twins

  /** The fingerprint CTE chain shared by all four oracles: planting
    * arithmetic → per-segment integer energies → delta bits → four
    * 16-bit bands, ending in `af(doc_id, b0..b3)` over ALL docs (the
    * quarantine override is applied per consumer).
    */
  private def sqlFpCtes: String =
    s"""ag AS (
       |  SELECT doc_id, doc_id // 48 AS g, doc_id % 3 AS v FROM documents
       |), ai AS (
       |  SELECT doc_id, g, v, unnest(range(0, $nSeg)) AS seg FROM ag
       |), abitt AS (
       |  SELECT doc_id, g, v, seg,
       |    CASE WHEN seg < 32
       |         THEN (((g * $KA + $CA) % 4294967296) >> seg) & 1
       |         ELSE (((g * $KB + $CB) % 4294967296) >> (seg - 32)) & 1
       |    END AS bit
       |  FROM ai
       |), ae AS MATERIALIZED (
       |  SELECT doc_id, seg,
       |    CASE WHEN v = 1 THEN 3 * e0
       |         WHEN v = 2 AND seg = g % $nSeg THEN e0 + 5000
       |         ELSE e0 END AS e
       |  FROM (
       |    SELECT doc_id, g, v, seg,
       |      10000 + 150 * (2 * coalesce(sum(bit) OVER (
       |        PARTITION BY doc_id ORDER BY seg
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) - seg) AS e0
       |    FROM abitt)
       |), abits AS (
       |  SELECT a.doc_id, a.seg AS k, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
       |  FROM ae a JOIN ae b ON b.doc_id = a.doc_id AND b.seg = a.seg + 1
       |  WHERE a.seg < ${nSeg - 1}
       |), abands AS (
       |  SELECT doc_id, k // 16 AS band,
       |    CAST(sum(bit * (CAST(1 AS BIGINT) << (k % 16))) AS BIGINT) AS val
       |  FROM abits GROUP BY 1, 2
       |), af AS MATERIALIZED (
       |  SELECT doc_id,
       |    max(CASE WHEN band = 0 THEN val END) AS b0,
       |    max(CASE WHEN band = 1 THEN val END) AS b1,
       |    max(CASE WHEN band = 2 THEN val END) AS b2,
       |    max(CASE WHEN band = 3 THEN val END) AS b3
       |  FROM abands GROUP BY 1
       |)""".stripMargin

  def sqlAudioFingerprint: String =
    s"""WITH $sqlFpCtes
       |SELECT doc_id,
       |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE $fpFrames END AS BIGINT) AS n_frames,
       |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE b0 END AS BIGINT) AS b0,
       |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE b1 END AS BIGINT) AS b1,
       |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE b2 END AS BIGINT) AS b2,
       |  CAST(CASE WHEN doc_id % 19 = 0 THEN -1 ELSE b3 END AS BIGINT) AS b3,
       |  CASE WHEN doc_id % 19 = 0 THEN 'truncated_header' ELSE '' END AS err
       |FROM af""".stripMargin

  private def sqlBandUnpivot(name: String, extra: String): String =
    s"""$name AS (
       |  SELECT doc_id, b0, b1, b2, b3, 0 AS bi, b0 AS bv FROM af
       |  WHERE doc_id % 19 <> 0$extra
       |  UNION ALL SELECT doc_id, b0, b1, b2, b3, 1, b1 FROM af
       |  WHERE doc_id % 19 <> 0$extra
       |  UNION ALL SELECT doc_id, b0, b1, b2, b3, 2, b2 FROM af
       |  WHERE doc_id % 19 <> 0$extra
       |  UNION ALL SELECT doc_id, b0, b1, b2, b3, 3, b3 FROM af
       |  WHERE doc_id % 19 <> 0$extra
       |)""".stripMargin

  def sqlAudioDedup(tau: Int = 2): String =
    s"""WITH $sqlFpCtes, ${sqlBandUnpivot("aub", "")}
       |, acand AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       |    l.b0 AS a0, l.b1 AS a1, l.b2 AS a2, l.b3 AS a3,
       |    r.b0 AS c0, r.b1 AS c1, r.b2 AS c2, r.b3 AS c3
       |  FROM aub l JOIN aub r ON l.bi = r.bi AND l.bv = r.bv AND l.doc_id < r.doc_id
       |)
       |SELECT a, b,
       |  CAST(bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
       |     + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) AS BIGINT) AS hamming
       |FROM acand
       |WHERE bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
       |    + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) <= $tau""".stripMargin

  def sqlAudioDrop(tau: Int = 2): String =
    s"""WITH RECURSIVE $sqlFpCtes, ${sqlBandUnpivot("aub", "")}
       |, apr AS MATERIALIZED (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM aub l JOIN aub r ON l.bi = r.bi AND l.bv = r.bv AND l.doc_id < r.doc_id
       |  WHERE bit_count(xor(l.b0, r.b0)) + bit_count(xor(l.b1, r.b1))
       |      + bit_count(xor(l.b2, r.b2)) + bit_count(xor(l.b3, r.b3)) <= $tau
       |), apg AS (
       |  SELECT a AS src, b AS dst FROM apr
       |  UNION
       |  SELECT b, a FROM apr
       |), apreach(src, x) AS (
       |  SELECT src, src FROM (SELECT DISTINCT src FROM apg)
       |  UNION
       |  SELECT w.src, apg.dst FROM apreach w JOIN apg ON w.x = apg.src
       |), aplab AS (
       |  SELECT src AS doc_id, min(x) AS cluster_id FROM apreach GROUP BY 1
       |)
       |SELECT af.doc_id,
       |  CAST(coalesce(aplab.cluster_id, af.doc_id) AS BIGINT) AS cluster_id,
       |  (coalesce(aplab.cluster_id, af.doc_id) = af.doc_id) AS keep
       |FROM af LEFT JOIN aplab ON af.doc_id = aplab.doc_id
       |WHERE af.doc_id % 19 <> 0""".stripMargin

  def sqlAudioScreen(batchMod: Long = 10, tau: Int = 2): String =
    s"""WITH $sqlFpCtes,
       |${sqlBandUnpivot("asb", s" AND doc_id % $batchMod = 0")},
       |${sqlBandUnpivot("ass", s" AND doc_id % $batchMod <> 0")},
       |ash AS (
       |  SELECT DISTINCT b.doc_id AS bdoc, s.doc_id AS sdoc
       |  FROM asb b JOIN ass s ON b.bi = s.bi AND b.bv = s.bv
       |  WHERE bit_count(xor(b.b0, s.b0)) + bit_count(xor(b.b1, s.b1))
       |      + bit_count(xor(b.b2, s.b2)) + bit_count(xor(b.b3, s.b3)) <= $tau
       |), asc2 AS (
       |  SELECT bdoc AS doc_id, CAST(count(*) AS BIGINT) AS n FROM ash GROUP BY 1
       |)
       |SELECT d.doc_id, (d.doc_id % 19 <> 0) AS decoded,
       |  CAST(coalesce(asc2.n, 0) AS BIGINT) AS n_store_dups,
       |  (coalesce(asc2.n, 0) = 0) AS audio_keep
       |FROM documents d LEFT JOIN asc2 ON d.doc_id = asc2.doc_id
       |WHERE d.doc_id % $batchMod = 0""".stripMargin
}
