package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Det

/** Temporal log operators beyond the as-of join ([[AsOf]]): CDC-style
  * snapshot compaction and the banded interval join. Both exist
  * because their naive formulations are the two classic temporal
  * scale-killers — a whole-log window sort, and a nested-loop range
  * join.
  */
object Temporal {

  /** Latest-state snapshot of the event log: one row per user carrying
    * that user's most recent event — the CDC log→table compaction /
    * upsert-materialization shape (reference serve_api.py scores the
    * CURRENT state of a customer; this is how that state table is
    * derived from an append-only log).
    *
    * Plan: a single `groupBy(user_id).agg(max(struct(...)))` — one
    * keyed shuffle with MAP-SIDE PARTIAL aggregation, so every map
    * task forwards at most ONE candidate row per user it saw
    * (asserted in TemporalSpec: `partial_max` below the only
    * Exchange). The textbook `row_number() = 1` formulation SHUFFLES
    * THE ENTIRE LOG and sorts it per user; here the network carries a
    * per-user-per-task constant. Cost note: a struct is not a
    * mutable aggregation-buffer type, so Spark plans SortAggregate —
    * each scan partition locally sorts by the bare grouping key
    * before folding. That CPU cost is the price of the one-pass form;
    * the alternative that keeps HashAggregate (pack (ts_ms, event_id)
    * into a decimal(38,0), then join winners back to the log by
    * event_id) re-shuffles the full log for the fetch join, which
    * loses at 100 TB. The struct compares lexicographically on
    * (ts_ms, event_id); event_id is unique, so the winning row —
    * hence every emitted column — is determined by a total order.
    */
  def latestSnapshot(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        struct(
          unix_millis(col("ts")).as("ts_ms"),
          col("event_id"),
          col("event_type"),
          col("value")).as("st"))
      .groupBy(col("user_id"))
      .agg(max(col("st")).as("st"), count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("st.ts_ms").as("ts_ms"),
        col("st.event_id").as("event_id"),
        col("st.event_type").as("event_type"),
        Det.r(col("st.value"), 2).as("value"),
        col("n_events"))

  /** DuckDB oracle: the independent rank-based formulation. */
  def sqlLatestSnapshot(): String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, value,
      |         epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
      |  FROM events
      |), r AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts_ms DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM e
      |)
      |SELECT user_id, ts_ms, event_id, event_type,
      |  floor(value * 100.0 + 0.5) / 100.0 AS value,
      |  CAST(n_events AS BIGINT) AS n_events
      |FROM r WHERE rn = 1""".stripMargin

  /** Banded interval join: every (purchase, click) pair of the same
    * user with the click inside the trailing `windowMinutes` before
    * the purchase — windowed attribution keeping ALL touches, where
    * [[AsOf.attribution]] keeps only the last.
    *
    * A direct range join has no equi-key, so Spark plans a nested
    * loop — quadratic per user and a BNLJ across users. Banding makes
    * it an EQUI-join: clicks key by their `windowMs`-wide time band
    * (`ts DIV windowMs`); a trailing window of the same width overlaps
    * at most 2 bands, so the purchase side fans out exactly 2× inside
    * the scan stage (explode of a 2-element array — no extra pass),
    * both sides shuffle once on (user_id, band), and the exact range
    * predicate filters inside the join. Join volume is bounded by
    * true matches plus same-band near-misses — never
    * |clicks|×|purchases|. Verified BNLJ/cartesian-free in
    * PlanHardeningSpec's net.
    */
  def intervalJoin(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val windowMs = windowMinutes * 60000L
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id"),
        col("event_id").as("click_id"),
        unix_millis(col("ts")).as("click_ms"))
      .withColumn("band", expr(s"click_ms DIV ${windowMs}L"))
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        col("event_id").as("purchase_id"),
        unix_millis(col("ts")).as("purchase_ms"))
      .withColumn("band",
        explode(array(
          expr(s"purchase_ms DIV ${windowMs}L") - lit(1L),
          expr(s"purchase_ms DIV ${windowMs}L"))))
    purchases
      .join(clicks, Seq("user_id", "band"))
      .filter(col("click_ms") >= col("purchase_ms") - lit(windowMs) &&
        col("click_ms") < col("purchase_ms"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (col("purchase_ms") - col("click_ms")).as("lag_ms"))
  }

  /** SCD-2 history build: each event becomes a validity interval
    * [valid_from_ms, valid_to_ms) closed by the user's next event —
    * the slowly-changing-dimension table a warehouse derives from a
    * CDC log. One shuffle+sort on user_id (`lead` window); the sort
    * is per-user history, the partition key bounds it. The open
    * (current) row carries valid_to_ms = -1 — a sentinel rather than
    * NULL so downstream range predicates and the oracle hash never
    * meet engine-specific NULL ordering.
    */
  def scd2(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("valid_to_ms", coalesce(lead(col("ts_ms"), 1).over(w), lit(-1L)))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_ms").as("valid_from_ms"), col("valid_to_ms"),
        (col("valid_to_ms") === -1L).as("is_current"))
  }

  def sqlScd2(): String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |         epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
      |  FROM events
      |)
      |SELECT user_id, event_id, event_type,
      |  ts_ms AS valid_from_ms,
      |  coalesce(lead(ts_ms) OVER (PARTITION BY user_id
      |                             ORDER BY ts_ms, event_id), -1) AS valid_to_ms,
      |  coalesce(lead(ts_ms) OVER (PARTITION BY user_id
      |                             ORDER BY ts_ms, event_id), -1) = -1 AS is_current
      |FROM e""".stripMargin

  /** Snapshot diff between two cutoffs t1 < t2: per user, the state
    * change between "latest event at-or-before t1" and "… t2" —
    * added / changed / unchanged (an append-only log cannot delete).
    * The audit query behind incremental-materialization correctness
    * checks ("what did the last day of log do to the state table?").
    *
    * Plan: ONE scan and ONE groupBy — both snapshots come from
    * conditional struct-maxes (`max(when(ts <= t, st))`) in the same
    * aggregate, so the log is read once and never joined against
    * itself; the oracle formulation (two rank CTEs + left join) is
    * deliberately independent.
    */
  def snapshotDiff(events: DataFrame, t1Ms: Long = 1705363200000L, // 2024-01-16 UTC
      t2Ms: Long = 1706745600000L /* 2024-02-01 UTC */): DataFrame = {
    require(t1Ms < t2Ms, "snapshotDiff needs t1 < t2")
    val st = struct(col("ts_ms"), col("event_id"))
    val agg = events
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("ts_ms") <= t1Ms, st)).as("a"),
        max(when(col("ts_ms") <= t2Ms, st)).as("b"))
      .filter(col("b").isNotNull) // user has no events by t2 => absent from both
    agg.select(
      col("user_id"),
      when(col("a").isNull, lit("added"))
        .when(col("a.event_id") =!= col("b.event_id"), lit("changed"))
        .otherwise(lit("unchanged")).as("status"),
      coalesce(col("a.event_id"), lit(-1L)).as("old_event_id"),
      col("b.event_id").as("new_event_id"))
  }

  /** q160: MERGE INTO semantics over the CDC log — the writer's view
    * next to [[snapshotDiff]]'s audit view: target = latest state per
    * user as of t1, source = the (t1, t2] change slice, and the
    * output is the POST-MERGE table with the Delta/Iceberg op labels
    * (matched → `update`, not-matched-by-target → `insert`, target
    * rows the source never touched → `noop` — the WHEN NOT MATCHED BY
    * SOURCE branch). Same scale shape as [[snapshotDiff]]: BOTH sides
    * from conditional struct-maxes in ONE scan + ONE groupBy — the
    * log is never joined against itself; the merged row is a per-
    * column CASE over the two struct arms (engine-portable — no
    * struct-valued coalesce seam). Oracle: the independent
    * two-rank-CTE + FULL OUTER JOIN formulation.
    */
  def mergeUpsert(events: DataFrame, t1Ms: Long = 1705363200000L,
      t2Ms: Long = 1706745600000L): DataFrame = {
    require(t1Ms < t2Ms, "mergeUpsert needs t1 < t2")
    val st = struct(col("ts_ms"), col("event_id"), col("event_type"), col("value"))
    val agg = events
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_millis(col("ts")).as("ts_ms"))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("ts_ms") <= t1Ms, st)).as("tgt"),
        max(when(col("ts_ms") > t1Ms && col("ts_ms") <= t2Ms, st)).as("src"))
      .filter(col("tgt").isNotNull || col("src").isNotNull)
    def pick(f: String) =
      when(col("src").isNotNull, col(s"src.$f")).otherwise(col(s"tgt.$f"))
    agg.select(
      col("user_id"),
      when(col("tgt").isNull, lit("insert"))
        .when(col("src").isNull, lit("noop"))
        .otherwise(lit("update")).as("op"),
      pick("ts_ms").as("ts_ms"),
      pick("event_id").as("event_id"),
      pick("event_type").as("event_type"),
      Det.r(pick("value"), 2).as("value"))
  }

  def sqlMergeUpsert(t1Ms: Long = 1705363200000L, t2Ms: Long = 1706745600000L): String =
    s"""WITH mue AS (
       |  SELECT user_id, event_id, event_type, value,
       |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
       |  FROM events
       |), mut AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts_ms DESC, event_id DESC) AS rn
       |    FROM mue WHERE ts_ms <= $t1Ms) WHERE rn = 1
       |), mus AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts_ms DESC, event_id DESC) AS rn
       |    FROM mue WHERE ts_ms > $t1Ms AND ts_ms <= $t2Ms) WHERE rn = 1
       |)
       |SELECT coalesce(s.user_id, t.user_id) AS user_id,
       |  CASE WHEN t.user_id IS NULL THEN 'insert'
       |       WHEN s.user_id IS NULL THEN 'noop'
       |       ELSE 'update' END AS op,
       |  coalesce(s.ts_ms, t.ts_ms) AS ts_ms,
       |  coalesce(s.event_id, t.event_id) AS event_id,
       |  coalesce(s.event_type, t.event_type) AS event_type,
       |  floor(coalesce(s.value, t.value) * 100.0 + 0.5) / 100.0 AS value
       |FROM mut t FULL OUTER JOIN mus s ON t.user_id = s.user_id""".stripMargin

  def sqlSnapshotDiff(t1Ms: Long = 1705363200000L, t2Ms: Long = 1706745600000L): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms FROM events
       |), r1 AS (
       |  SELECT user_id, event_id, row_number() OVER (PARTITION BY user_id
       |           ORDER BY ts_ms DESC, event_id DESC) AS rn
       |  FROM e WHERE ts_ms <= $t1Ms
       |), r2 AS (
       |  SELECT user_id, event_id, row_number() OVER (PARTITION BY user_id
       |           ORDER BY ts_ms DESC, event_id DESC) AS rn
       |  FROM e WHERE ts_ms <= $t2Ms
       |), s1 AS (SELECT user_id, event_id FROM r1 WHERE rn = 1),
       |   s2 AS (SELECT user_id, event_id FROM r2 WHERE rn = 1)
       |SELECT s2.user_id,
       |  CASE WHEN s1.user_id IS NULL THEN 'added'
       |       WHEN s1.event_id <> s2.event_id THEN 'changed'
       |       ELSE 'unchanged' END AS status,
       |  coalesce(s1.event_id, -1) AS old_event_id,
       |  s2.event_id AS new_event_id
       |FROM s2 LEFT JOIN s1 ON s2.user_id = s1.user_id""".stripMargin

  /** DuckDB oracle: the plain inequality join (fine at oracle scale). */
  def sqlIntervalJoin(windowMinutes: Int = 30): String = {
    val windowMs = windowMinutes * 60000L
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type,
       |         epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
       |  FROM events
       |), c AS (
       |  SELECT user_id, event_id AS click_id, ts_ms AS click_ms
       |  FROM e WHERE event_type = 'click'
       |), p AS (
       |  SELECT user_id, event_id AS purchase_id, ts_ms AS purchase_ms
       |  FROM e WHERE event_type = 'purchase'
       |)
       |SELECT p.user_id, purchase_id, click_id,
       |  purchase_ms - click_ms AS lag_ms
       |FROM p JOIN c ON p.user_id = c.user_id
       | AND click_ms >= purchase_ms - $windowMs
       | AND click_ms < purchase_ms""".stripMargin
  }
}
