package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Det

/** Streaming operators over the events stream.
  *
  * The tumbling-window aggregate exists twice on purpose: [[hourlyAgg]]
  * is the batch shape (oracle-checkable, q32) and [[hourlyStream]] the
  * Structured Streaming shape (`readStream` -> watermark -> windowed
  * agg); ScalaTest proves the two produce identical results on the
  * same data through a memory sink. Stateful sessionization uses
  * `flatMapGroupsWithState` — the state survives micro-batches keyed
  * by user, so a session spanning batches is stitched correctly.
  */
object Events {

  /** Normalize a raw events frame's `ts` to a session-zone
    * TimestampType instant — the streaming twin of the schema branch
    * in [[graft.Tables.events]]: legacy TIMESTAMP(NANOS) testdata
    * reads as long nanos (`nanosAsLong`), newer generations carry a
    * native µs timestamp (TIMESTAMP_NTZ under Spark 4's parquet
    * inference). The session runs UTC, so both branches yield the
    * identical epoch instants.
    */
  private def normTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    case _ =>
      df.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** q32: tumbling 1-hour event aggregation (batch form). value is
    * 2-decimal => summed as exact integer cents (order-independent at
    * any parallelism). countDistinct(user_id) is the single distinct
    * (no Expand). One shuffle on (hour, event_type).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Det.fromCents(sum(Det.cents(col("value")))).as("sum_value"))
      .select(
        date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("n_users"), col("sum_value"))

  def sqlHourlyAgg: String =
    """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
      |  event_type,
      |  count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** q52: SLIDING-window aggregation (batch form): `windowMinutes`
    * windows advancing every `slideMinutes`, so each event lands in
    * window/slide overlapping windows (the standard
    * rates-over-trailing-windows monitoring shape). Spark's `window()`
    * handles the fan-out inside the scan stage before the single
    * (window_start, event_type) shuffle — the row multiplier runs
    * BEFORE the aggregation exactly like the frame-sampling explode,
    * and map-side partial aggregation collapses it again, so the
    * shuffle carries near-aggregated data. The DuckDB oracle derives
    * the same epoch-aligned window starts arithmetically.
    */
  def slidingAgg(events: DataFrame, windowMinutes: Int = 60, slideMinutes: Int = 15): DataFrame = {
    require(windowMinutes % slideMinutes == 0, "window must be a multiple of slide")
    events
      .groupBy(
        window(col("ts"), s"$windowMinutes minutes", s"$slideMinutes minutes")
          .getField("start").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Det.fromCents(sum(Det.cents(col("value")))).as("sum_value"))
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  def sqlSlidingAgg(windowMinutes: Int = 60, slideMinutes: Int = 15): String = {
    // mirror slidingAgg's guard: a non-divisible pair would silently
    // truncate k here while the Spark twin throws
    require(windowMinutes % slideMinutes == 0, "window must be a multiple of slide")
    val slideMs = slideMinutes * 60000L
    val k = windowMinutes / slideMinutes
    s"""WITH e AS (
       |  SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, event_type, value FROM events
       |), w AS (
       |  SELECT (ms // $slideMs) * $slideMs - k.k * $slideMs AS ws_ms, event_type, value
       |  FROM e CROSS JOIN (SELECT unnest(range(0, $k)) AS k) k
       |)
       |SELECT strftime(make_timestamp(ws_ms * 1000), '%Y-%m-%d %H:%M:%S') AS window_start,
       |  event_type,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
       |FROM w GROUP BY 1, 2""".stripMargin
  }

  /** The sliding aggregate as a Structured Streaming query (same
    * watermark/state story as [[hourlyStream]]; open state = windows
    * inside watermark + window length).
    */
  def slidingStream(spark: SparkSession, dir: String,
      windowMinutes: Int = 60, slideMinutes: Int = 15): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    normTs(spark.readStream
      .schema(schema)
      .parquet(dir))
      .withWatermark("ts", "2 hours")
      .groupBy(
        window(col("ts"), s"$windowMinutes minutes", s"$slideMinutes minutes")
          .getField("start").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Det.fromCents(sum(Det.cents(col("value")))).as("sum_value"))
  }

  /** The same aggregate as a Structured Streaming query over a parquet
    * directory source. The 2-hour watermark bounds state: at 100 TB/day
    * the state store holds only the open windows, and late events
    * beyond the watermark are dropped deterministically.
    */
  def hourlyStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    normTs(spark.readStream
      .schema(schema)
      .parquet(dir))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Det.fromCents(sum(Det.cents(col("value")))).as("sum_value"))
  }

  /** Sessionization via Spark's NATIVE `session_window` — the
    * declarative alternative to the lag-gap window
    * ([[graft.ops.Relational.sessionize]]) and the stateful form
    * ([[sessionizeStateful]]): one groupBy, merge-on-overlap
    * semantics, and the SAME operator works under `readStream` with a
    * watermark (dynamic gap state, bounded by the watermark horizon).
    *
    * Boundary semantics pinned EMPIRICALLY in StreamingSpec: an event
    * at exactly last_ts + gap MERGES into the running session (Spark
    * merges when the ranges touch, i.e. a session breaks only when
    * diff > gap) — the same convention as the lag-gap `sessionize`,
    * so the two formulations agree everywhere, ties included. Session
    * end = last event + gap. Input timestamps are truncated to millis
    * first so the boundary decision happens at the same precision in
    * both engines (the raw µs timestamp would break ties the ms-based
    * oracle cannot see).
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .select(col("user_id"), col("event_type"),
        timestamp_millis(unix_millis(col("ts"))).as("ts_ms_t"))
      .groupBy(col("user_id"),
        session_window(col("ts_ms_t"), s"$gapMinutes minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"))
      .select(col("user_id"),
        unix_millis(col("w.start")).as("session_start_ms"),
        unix_millis(col("w.end")).as("session_end_ms"),
        col("n_events"), col("n_purchases"))

  /** DuckDB oracle: independent lag-gap formulation with the
    * session_window break convention (diff > gap starts a session)
    * and end = last event + gap.
    */
  def sqlSessionWindowAgg(gapMinutes: Int = 30): String = {
    val gapMs = gapMinutes * 60000L
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms FROM events
       |), g AS (
       |  SELECT *, lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) AS prev FROM e
       |), s AS (
       |  SELECT *, CASE WHEN prev IS NULL OR ts_ms - prev > $gapMs THEN 1 ELSE 0 END AS brk FROM g
       |), c AS (
       |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_ms
       |    ROWS UNBOUNDED PRECEDING) AS sid FROM s
       |)
       |SELECT user_id,
       |  min(ts_ms) AS session_start_ms,
       |  max(ts_ms) + $gapMs AS session_end_ms,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
       |FROM c GROUP BY user_id, sid""".stripMargin
  }

  // ------------------------------------------------------------------
  // Streaming exact dedup (ingest-time duplicate suppression).
  // ------------------------------------------------------------------

  /** Keep the FIRST arrival per content hash.
    * `dropDuplicatesWithinWatermark` bounds the dedup state by the
    * event-time watermark: at 100 TB/day the state store holds only
    * the hashes seen inside the watermark horizon, never the full
    * corpus history. That makes this the INGEST-side dedup — it
    * suppresses the within-horizon duplicates (crawler refetches,
    * retry storms) as documents stream in; the corpus-global
    * guarantee still comes from running the batch [[graft.dedup.Dedup.exact]]
    * over the compacted store. Works on a batch frame too (falls back
    * to plain first-per-key semantics), which is what the
    * batch-equivalence test exploits.
    */
  def dedupStream(docs: DataFrame, tsCol: String = "ingest_ts", watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** File-source form: stream a parquet directory of documents with an
    * `ingest_ts` column through the dedup.
    */
  def dedupDocStream(spark: SparkSession, dir: String, watermark: String = "2 hours"): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    dedupStream(spark.readStream.schema(schema).parquet(dir), watermark = watermark)
  }

  // ------------------------------------------------------------------
  // Streaming incremental dedup screen (the crawl-ingest pipeline).
  // ------------------------------------------------------------------

  /** The [[graft.dedup.Dedup.incrementalDedup]] contract as a
    * Structured Streaming job: documents STREAM in, and every
    * micro-batch is screened against the STATIC existing store —
    * exact (content hash) + near (one-sided prefix probe into the
    * store's inverted shingle index) — via
    * [[graft.dedup.Dedup.screenAgainst]] inside `foreachBatch`.
    *
    * Why `foreachBatch` and not a fully-declarative streaming plan:
    * the screen ends in a per-doc candidate rollup over a pair-dedup
    * (`distinct` on (doc, ex) then count), a chain of stateful
    * operators Structured Streaming cannot express in one query — but
    * a micro-batch is a BOUNDED landed batch by definition, so running
    * the proven batch screen per micro-batch is not a workaround, it
    * is the production shape (and Spark's documented pattern for
    * batch-only logic in streams). The store-side index is the
    * memoized [[graft.dedup.Dedup.setsCached]] seam, so micro-batch N
    * pays ZERO store-side work after micro-batch 1 — per-batch cost is
    * ∝ batch, the incremental contract. Per-doc results depend only on
    * (doc, store), so the union over micro-batches is provably the one
    * big screen's output — StreamingSpec drives the batch slice
    * through file-per-trigger micro-batches and proves the
    * accumulated output row-equal to the batch operator.
    *
    * Compose [[dedupStream]] upstream for within-stream exact
    * suppression (`dropDuplicatesWithinWatermark` — watermark-bounded
    * state), mirroring how [[graft.dedup.Dedup.batchDedup]] composes
    * with the batch screen; this operator screens whatever reaches it
    * against the STORE.
    *
    * Returns the prepared writer; the caller picks trigger/checkpoint
    * and starts it. `sink` receives each screened micro-batch
    * (the incrementalDedup schema) and its micro-batch id.
    */
  def incrementalScreenStream(
      stream: DataFrame,
      existingDocs: DataFrame,
      tau: Double = 0.5)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (mb: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.dedup.Dedup.screenAgainst(mb.toDF(), existingDocs, tau), id)
      }

  /** The perplexity screen's streaming form — each micro-batch scored
    * under the STATIC store's smoothed LM against the store's shipped
    * tercile cut via [[graft.text.LangModel.pplScreenAgainst]]; the
    * store-side model (vocabulary + totals + cut) is a memoized seam,
    * so micro-batch N pays zero store-side work after the first.
    * Per-doc results depend only on (doc, store), so the micro-batched
    * union equals the one-shot batch screen (pinned in StreamingSpec).
    */
  def pplScreenStream(
      stream: DataFrame,
      storeDocs: DataFrame)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (mb: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.text.LangModel.pplScreenAgainst(mb.toDF(), storeDocs), id)
      }

  /** The DISK-BACKED streaming ingest — [[ingestStream]]'s semantics
    * with the store living where a production store actually lives:
    * the persisted [[graft.dedup.ShingleIndex]]. Each micro-batch is
    * screened by [[graft.dedup.Dedup.decisionFromIndex]] (store
    * twin + first-wins self-screen + contained-in-store, all against
    * the ON-DISK index as of this batch), its verdicts go to `sink`,
    * and the KEPT docs are [[graft.dedup.ShingleIndex.append]]ed to
    * the index — so the store the next micro-batch screens against
    * has grown BY THE KEEPERS, on disk, exactly the crawl-ingest
    * loop: screen from the index, append to the index, repeat.
    *
    * Pinned in StreamingSpec: verdicts match [[ingestStream]]'s
    * greedy sequential semantics (same simulation), and after the
    * stream drains the persisted index holds exactly store ∪ kept
    * docs — row-equal to a one-shot [[graft.dedup.ShingleIndex.write]]
    * over that union.
    *
    * The decision for batch N must read the index as of batch N, so
    * each verdict frame is materialized (collect-to-sink or
    * localCheckpoint in the sink) BEFORE the append; the localCheckpoint
    * here enforces it independently of what the sink does.
    */
  def ingestStreamPersisted(
      stream: DataFrame,
      indexDir: String,
      tau: Double = 0.5,
      tauContain: Double = 0.8)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (mb: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val spark = mb.sparkSession
        val batch = mb.toDF().localCheckpoint()
        val decision = graft.dedup.Dedup
          .decisionFromIndex(spark, batch, indexDir, tau, tauContain)
          .localCheckpoint()
        val keepers = batch
          .join(decision.filter(col("keep") === 1L).select("doc_id"), "doc_id")
        graft.dedup.ShingleIndex.append(keepers, indexDir)
        sink(decision, id)
      }

  /** The BLOOM membership screen's streaming form — the fourth
    * incremental modality's `Events.*Stream` twin (exact/near,
    * embedding and perplexity have had theirs since round 10): each
    * micro-batch's content-hash keys probe the PERSISTED
    * [[graft.dedup.BloomIndex]] — the compact summary a 100 TB store
    * actually ships to its ingest workers — and, with `appendKeys`,
    * the batch's keys are OR-appended to the filter after its verdict
    * (the growing-store crawl shape; the verdict for batch N must
    * read the filter as of batch N, so the append follows the sink).
    *
    * Pinned in StreamingSpec: with a static filter the micro-batched
    * union is row-equal to the one-shot probe (verdicts depend only
    * on (key, filter)); with appends the final filter bytes are
    * byte-EQUAL to a one-shot build over store ∪ all batch keys at
    * the persisted geometry — OR is associative and commutative, so
    * the micro-batch split cannot change a single bit.
    *
    * Key derivation matches [[graft.dedup.Dedup.bloomScreen]]:
    * xxhash64 of the md5 content hash, derived once per micro-batch
    * (localCheckpoint) so probe and append read the same frame.
    */
  def bloomScreenStream(
      stream: DataFrame,
      indexDir: String,
      appendKeys: Boolean = false)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (mb: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val keys = mb.toDF()
          .select(col("doc_id"),
            xxhash64(md5(col("text").cast("binary"))).as("k"))
          .localCheckpoint()
        val filter = graft.dedup.BloomIndex.read(indexDir)
        val verdict = keys.select(col("doc_id"),
          when(graft.functions.GraftFunctions.bloomMightContain(lit(filter), col("k")),
            lit(1L)).otherwise(lit(0L)).as("bloom_hit"))
        sink(verdict, id)
        if (appendKeys) graft.dedup.BloomIndex.append(keys.select("k"), indexDir)
      }

  /** The IMAGE modality's streaming screen — [[bloomScreenStream]]'s
    * shape over the persisted [[graft.mm.PhashIndex]]: each
    * micro-batch of landed docs decodes and hashes ITS OWN images
    * (batch-sized work) and probes the store's band table; with
    * `appendLanded` the KEPT decodable images' hashes row-append into
    * the index, so batch N screens against the store plus every
    * earlier batch's keepers — the sequential crawl semantics
    * ([[ingestStream]]'s contract on the image modality). Verdict rows
    * are the [[graft.mm.MediaCodec.imageScreenAgainst]] contract.
    */
  def imageScreenStream(
      stream: DataFrame,
      indexDir: String,
      appendLanded: Boolean = false)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (mb: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val batch = mb.toDF().localCheckpoint()
        val verdict = graft.mm.PhashIndex
          .probe(batch.sparkSession, batch, indexDir).localCheckpoint()
        sink(verdict, id)
        if (appendLanded)
          graft.mm.PhashIndex.append(batch.sparkSession,
            batch.join(verdict.filter(col("image_keep")).select("doc_id"), "doc_id"),
            indexDir)
      }

  /** The FULL streaming ingest — the [[incrementalScreenStream]]
    * contract with the store GROWING as batches land: each micro-batch
    * is (1) self-screened first-wins
    * ([[graft.dedup.Dedup.selfScreenSets]] — an earlier doc within the
    * micro-batch that is an exact/near twin drops the later one), and
    * (2) screened against the store AS OF THIS BATCH: the immutable
    * initial corpus PLUS every earlier micro-batch's KEPT docs — the
    * semantics a production crawl ingest actually has, because a store
    * can only block against what it stored: a doc DROPPED in batch 2
    * does not block its twin in batch 5 (its kept representative
    * does). The emitted verdict per doc is the [[ingestDecision]]
    * shape (doc_id, store_keep, batch_keep, keep).
    *
    * Cost per micro-batch stays the incremental contract: the initial
    * store's inverted index is the memoized
    * [[graft.dedup.Dedup.setsCached]] seam (paid once), the
    * accumulated-keeper sets are batch-sized unions localCheckpoint'd
    * per batch (bounded lineage), and both screens are one-sided
    * prefix probes ∝ batch. When the whole drop arrives as ONE
    * micro-batch this reduces exactly to the batch
    * [[graft.dedup.Dedup.ingestDecision]] (accumulator empty) —
    * pinned in StreamingSpec, along with the multi-batch sequential
    * semantics against a driver-side greedy simulation.
    *
    * The verdict stream goes to `sink`; callers append the keepers to
    * their store table / persisted indexes from there (the
    * IvfIndex/PqIndex/Sq8Index.append path). State lives in this
    * writer's closure — one query per ingest lifetime.
    */
  def ingestStream(
      stream: DataFrame,
      existingDocs: DataFrame,
      tau: Double = 0.5)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // accumulated (doc_id, sh, ch) sets of every kept doc from earlier
    // micro-batches; foreachBatch runs sequentially on the driver, so
    // plain closure state is safe
    var kept: Option[DataFrame] = None
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (mb: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val mbSets = graft.dedup.Dedup.hashedShingleSets(mb.toDF()).localCheckpoint()
        val storeSets = kept match {
          case Some(k) => graft.dedup.Dedup.setsCached(existingDocs).unionByName(k)
          case None    => graft.dedup.Dedup.setsCached(existingDocs)
        }
        // materialize the verdict BEFORE growing the accumulator: the
        // decision for batch N must read the store as of batch N
        val decision = graft.dedup.Dedup.decisionSets(mbSets, storeSets, tau).localCheckpoint()
        val keeperSets = mbSets
          .join(decision.filter(col("keep") === 1L).select("doc_id"), "doc_id")
          .localCheckpoint()
        kept = Some(kept.fold(keeperSets)(_.unionByName(keeperSets).localCheckpoint()))
        sink(decision, id)
      }
  }

  /** The [[incrementalScreenStream]] contract for the EMBEDDING
    * modality: vectors stream in, each micro-batch is screened for
    * semantic near-duplicates against the static store via
    * [[graft.dedup.Dedup.embedScreenAgainst]] — brute
    * (broadcast-batch map-side pass) or LSH-blocked (`useLsh`, the
    * 100 TB path: the store defines the hyperplane geometry, so every
    * micro-batch probes the same index). Same foreachBatch rationale
    * and same equality argument: per-vector results depend only on
    * (vector, store), so the micro-batched union equals the one-shot
    * screen (proven in StreamingSpec).
    */
  def embedScreenStream(
      stream: DataFrame,
      existingVecs: DataFrame,
      tau: Double = 0.35,
      useLsh: Boolean = false)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (mb: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.dedup.Dedup.embedScreenAgainst(mb.toDF(), existingVecs, tau, useLsh), id)
      }

  // ------------------------------------------------------------------
  // Stream-stream interval join (windowed attribution).
  // ------------------------------------------------------------------

  /** All (purchase, click) pairs of the same user with the click
    * inside the attribution window [purchase − windowMinutes,
    * purchase] — the STREAMING attribution contract. A running
    * last-touch (the batch [[graft.ops.AsOf]] form) needs total order
    * per user and is not stream-expressible; the interval join is:
    * both sides carry watermarks and the time-range predicate bounds
    * the join state to the window + watermark horizon, so state stays
    * finite at any throughput. Downstream picks max(click_ts) per
    * purchase if it wants last-touch.
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame, windowMinutes: Int = 60): DataFrame = {
    val c = clicks.select(
      col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = purchases.select(
      col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("click_id"),
        unix_millis(col("p_ts")) - unix_millis(col("c_ts")) as "gap_ms")
  }

  /** File-source streaming form: two readStreams over the same event
    * directory, each filtered and watermarked (the click side keeps
    * state for window + watermark; the purchase side for its
    * watermark).
    */
  def attributionStream(spark: SparkSession, dir: String, windowMinutes: Int = 60): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    def side(t: String, wm: String) = normTs(spark.readStream
      .schema(schema).parquet(dir))
      .filter(col("event_type") === t)
      .withWatermark("ts", wm)
    attributionJoin(
      side("click", s"${windowMinutes * 2} minutes"),
      side("purchase", "30 minutes"),
      windowMinutes)
  }

  // ------------------------------------------------------------------
  // Stateful sessionization (flatMapGroupsWithState).
  // ------------------------------------------------------------------
  final case class Ev(user_id: Long, event_id: Long, ts_ms: Long, event_type: String)
  final case class SessionState(seq: Long, lastTs: Long)
  final case class SessionEvent(user_id: Long, event_id: Long, ts_ms: Long, session_seq: Long)

  /** Assign a session sequence number to every event; a session breaks
    * after `gapMinutes` of inactivity. State per user = (current
    * session seq, last timestamp), so sessions stitch across
    * micro-batches. Within one invocation events are processed in
    * (ts, event_id) order; in streaming mode the watermark must be >=
    * the session gap for this ordering to hold per batch.
    */
  def sessionizeStateful(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[SessionEvent] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          // Memory bound: this materializes ONE user's events from ONE
          // micro-batch (the sort needs them all; cross-batch state is
          // just (seq, lastTs)). In streaming that is bounded by
          // trigger interval x per-user event rate — a power user at
          // 100 events/s on a 1-minute trigger is ~6k rows, and the
          // watermark caps how late a batch can grow. A key hot enough
          // to break this (millions of events per user per trigger)
          // needs sub-key salting upstream, not a bigger buffer;
          // StreamingSpec pins a 100k-event single-user batch.
          val sorted = evs.toSeq.sortBy(e => (e.ts_ms, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val out = sorted.map { e =>
            val isNew = st.lastTs == Long.MinValue || e.ts_ms - st.lastTs > gapMs
            st = SessionState(if (isNew) st.seq + 1 else st.seq, e.ts_ms)
            SessionEvent(uid, e.event_id, e.ts_ms, st.seq)
          }
          state.update(st)
          out.iterator
      }
  }

  // ------------------------------------------------------------------
  // Stateful latest-state upsert (mapGroupsWithState) — the streaming
  // form of ops.Temporal.latestSnapshot.
  // ------------------------------------------------------------------
  final case class SnapState(ts_ms: Long, event_id: Long, event_type: String, n_events: Long)
  final case class UserSnapshot(user_id: Long, ts_ms: Long, event_id: Long,
      event_type: String, n_events: Long)

  /** Maintain each user's current (latest-event) state across
    * micro-batches — the streaming CDC upsert that keeps the serving
    * state table fresh without batch recompaction. Unlike
    * sessionization, state per user is a FIXED-SIZE record and no
    * per-batch buffering or sorting is needed: each event either
    * replaces the champion (strictly newer (ts_ms, event_id)) or only
    * bumps the event count, so arrival order within the batch is
    * irrelevant — exactly the merge the batch struct-max performs,
    * proven equivalent in StreamingSpec. Update output mode emits a
    * user's row only in batches that saw that user.
    */
  def snapshotStateful(events: Dataset[Ev]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SnapState, UserSnapshot](GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SnapState]) =>
          var st = state.getOption.getOrElse(SnapState(Long.MinValue, Long.MinValue, "", 0L))
          evs.foreach { e =>
            val newer = e.ts_ms > st.ts_ms ||
              (e.ts_ms == st.ts_ms && e.event_id > st.event_id)
            st =
              if (newer) SnapState(e.ts_ms, e.event_id, e.event_type, st.n_events + 1)
              else st.copy(n_events = st.n_events + 1)
          }
          state.update(st)
          UserSnapshot(uid, st.ts_ms, st.event_id, st.event_type, st.n_events)
      }
  }

  /** The upsert as a streaming query over a parquet directory source
    * (schema declared, never inferred). */
  def snapshotStream(spark: SparkSession, dir: String): Dataset[UserSnapshot] = {
    import spark.implicits._
    val schema = spark.read.parquet(dir).schema
    val typed = normTs(spark.readStream
      .schema(schema)
      .parquet(dir))
      // epoch-ms by integer floor; unix_millis on the normalized
      // timestamp equals the legacy ns DIV 1e6 two-step composition
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("event_type"))
      .as[Ev]
    snapshotStateful(typed)
  }

  /** Events table -> typed event stream (epoch-ms). */
  def typedEvents(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"), col("event_type"))
      .as[Ev]
  }

  /** Session-level rollup of the stateful assignment — same output
    * contract as the window-based Relational.sessionize, proven
    * equivalent in ScalaTest.
    */
  def sessionizeStatefulRollup(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionizeStateful(typedEvents(events), gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("duration_ms"))

  // ------------------------------------------------------------------
  // Watermark policy audit (micro-batch accounting + delay sweep).
  // ------------------------------------------------------------------

  /** Deterministic arrival-delay model for the watermark audits: the
    * generator's event log is ts-ordered (event_id order == event-time
    * order, so the raw log has literally zero out-of-order arrivals
    * and any watermark audit over it is degenerate), so arrival time
    * is modeled as ts + a per-event network delay derived from the
    * event's own identity — the md5-nibble arithmetic both engines
    * share (the [[graft.text.DocEmbed]] hash seam): the first 6 hex
    * nibbles of md5(event_id) as an integer, mod [[DelayModMs]]
    * (uniform in [0, 4h)). Everything downstream is integer-exact in
    * both engines.
    */
  private[graft] val DelayModMs = 14400000L // 4 h
  /** Micro-batch trigger interval on ARRIVAL time. */
  private[graft] val TriggerMs = 600000L // 10 min

  private[graft] def withArrival(
      events: DataFrame, triggerMs: Long = TriggerMs): DataFrame =
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("delay_ms",
        expr(s"CAST(conv(substring(md5(cast(cast(event_id AS STRING) AS BINARY)), 1, 6), 16, 10) AS BIGINT) % ${DelayModMs}L"))
      .withColumn("arrival_ms", col("ts_ms") + col("delay_ms"))
      .withColumn("batch_id", expr(s"arrival_ms DIV ${triggerMs}L"))

  /** Exclusive prefix max of event time over micro-batch ids — the
    * watermark base each batch observes (Structured Streaming advances
    * the watermark BETWEEN batches from the max event time of PRIOR
    * batches; within a batch every row sees the same watermark). The
    * frame this window runs over is the per-batch aggregate — one row
    * per trigger interval, i.e. ~52k rows/YEAR at a 10-min trigger —
    * so the unpartitioned window is a deliberate tiny-frame sort, not
    * a scale hazard; the event-sized work is the one groupBy feeding
    * it and the broadcast join back.
    */
  private[graft] def batchWatermarkBase(arrivals: DataFrame): DataFrame = {
    val w = Window.orderBy(col("batch_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    arrivals
      .groupBy(col("batch_id"))
      .agg(max(col("ts_ms")).as("batch_max_ts"))
      .withColumn("wm_base_ms", max(col("batch_max_ts")).over(w))
  }

  /** q183: micro-batch accounting under the arrival-delay model — the
    * table an operator reads before SIZING a streaming deployment:
    * one row per 10-minute trigger interval with its row count,
    * distinct users, event-time span, the watermark the batch runs
    * under (fixed delay `watermarkMinutes`; first batch has none —
    * sentinel -1), and how many of its rows arrive BELOW that
    * watermark (= rows a watermarked stateful op would drop). Spark's
    * actual batch-granular semantics, not a per-row approximation:
    * wm(b) = max event time over batches < b, minus the delay. Plan:
    * one shuffle to the batch rollup, a broadcast of the tiny
    * watermark table back onto it — no event-sized window anywhere.
    */
  def triggerBatches(events: DataFrame, watermarkMinutes: Int = 60): DataFrame = {
    val wmMs = watermarkMinutes * 60000L
    val arrivals = withArrival(events)
    val wm = batchWatermarkBase(arrivals)
      .select(col("batch_id"), col("wm_base_ms"))
    arrivals
      .join(broadcast(wm), Seq("batch_id"))
      .groupBy(col("batch_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("ts_ms")).as("ts_min_ms"),
        max(col("ts_ms")).as("ts_max_ms"),
        coalesce(max(col("wm_base_ms") - wmMs), lit(-1L)).as("watermark_ms"),
        sum(when(col("ts_ms") < col("wm_base_ms") - wmMs, 1L).otherwise(0L))
          .as("n_late"))
  }

  def sqlTriggerBatches(watermarkMinutes: Int = 60): String = {
    val wmMs = watermarkMinutes * 60000L
    s"""WITH e AS (
       |  SELECT event_id, user_id,
       |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
       |  FROM events
       |), a AS (
       |  SELECT *, ts_ms + ${delaySql("event_id")} AS arrival_ms FROM e
       |), b AS (
       |  SELECT *, arrival_ms // $TriggerMs AS batch_id FROM a
       |), wm AS (
       |  SELECT batch_id,
       |    max(bmax) OVER (ORDER BY batch_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_base_ms
       |  FROM (SELECT batch_id, max(ts_ms) AS bmax FROM b GROUP BY batch_id)
       |)
       |SELECT b.batch_id,
       |  count(*) AS n_events,
       |  count(DISTINCT user_id) AS n_users,
       |  min(ts_ms) AS ts_min_ms,
       |  max(ts_ms) AS ts_max_ms,
       |  coalesce(max(wm_base_ms - $wmMs), -1) AS watermark_ms,
       |  CAST(sum(CASE WHEN ts_ms < wm_base_ms - $wmMs THEN 1 ELSE 0 END) AS BIGINT) AS n_late
       |FROM b JOIN wm USING (batch_id)
       |GROUP BY b.batch_id""".stripMargin
  }

  /** The arrival-delay expression in DuckDB terms: first 6 md5 nibbles
    * of the event id rendered as a decimal integer (strpos-nibble
    * arithmetic — DuckDB has no conv()), mod [[DelayModMs]].
    */
  private def delaySql(idCol: String): String = {
    val hexAlphabet = "0123456789abcdef"
    val nibbles = (1 to 6).map { i =>
      s"(strpos('$hexAlphabet', substr(md5(CAST($idCol AS VARCHAR)), $i, 1)) - 1) * ${1L << (4 * (6 - i))}"
    }.mkString("(", " + ", ")")
    s"($nibbles % $DelayModMs)"
  }

  /** q184: the watermark DECISION table — for each candidate delay,
    * how much data a watermarked streaming agg would drop, by event
    * type: n_late (rows arriving below the batch watermark) and the
    * worst observed lateness (how far below; 0 when none). The sweep
    * an operator reads to pick `withWatermark`'s delay BEFORE
    * deploying the stream: the smallest rung whose drop rate is
    * acceptable bounds the state store. The batch-granular watermark
    * is computed ONCE (one shuffle + the tiny prefix window); the
    * sweep rungs are a constant-size explode over the joined frame —
    * per-rung membership is integer ms arithmetic, so no float
    * boundary can misfile a row (the q_dedup_sweep discipline).
    */
  def watermarkSweep(
      events: DataFrame,
      watermarkMinutes: Seq[Int] = Seq(15, 30, 60, 120, 240)): DataFrame = {
    val arrivals = withArrival(events)
    val wm = batchWatermarkBase(arrivals)
      .select(col("batch_id"), col("wm_base_ms"))
    arrivals
      .join(broadcast(wm), Seq("batch_id"))
      .withColumn("watermark_minutes",
        explode(array(watermarkMinutes.map(m => lit(m.toLong)): _*)))
      .withColumn("late_by_ms",
        when(col("wm_base_ms").isNotNull &&
          col("ts_ms") < col("wm_base_ms") - col("watermark_minutes") * 60000L,
          col("wm_base_ms") - col("watermark_minutes") * 60000L - col("ts_ms"))
          .otherwise(lit(0L)))
      .groupBy(col("watermark_minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("late_by_ms") > 0L, 1L).otherwise(0L)).as("n_late"),
        max(col("late_by_ms")).as("max_late_ms"))
  }

  def sqlWatermarkSweep(
      watermarkMinutes: Seq[Int] = Seq(15, 30, 60, 120, 240)): String = {
    val rungs = watermarkMinutes.mkString(", ")
    s"""WITH e AS (
       |  SELECT event_id, event_type,
       |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
       |  FROM events
       |), a AS (
       |  SELECT *, ts_ms + ${delaySql("event_id")} AS arrival_ms FROM e
       |), b AS (
       |  SELECT *, arrival_ms // $TriggerMs AS batch_id FROM a
       |), wm AS (
       |  SELECT batch_id,
       |    max(bmax) OVER (ORDER BY batch_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_base_ms
       |  FROM (SELECT batch_id, max(ts_ms) AS bmax FROM b GROUP BY batch_id)
       |), x AS (
       |  SELECT b.*, wm.wm_base_ms, r.watermark_minutes,
       |    CASE WHEN wm.wm_base_ms IS NOT NULL
       |           AND ts_ms < wm.wm_base_ms - r.watermark_minutes * 60000
       |         THEN wm.wm_base_ms - r.watermark_minutes * 60000 - ts_ms
       |         ELSE 0 END AS late_by_ms
       |  FROM b JOIN wm USING (batch_id)
       |  CROSS JOIN (SELECT CAST(unnest([$rungs]) AS BIGINT) AS watermark_minutes) r
       |)
       |SELECT watermark_minutes, event_type,
       |  count(*) AS n_events,
       |  CAST(sum(CASE WHEN late_by_ms > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       |  max(late_by_ms) AS max_late_ms
       |FROM x GROUP BY 1, 2""".stripMargin
  }
}
