package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (temporal) join — match each probe row to the LATEST
  * candidate row at or before it, per key. Spark has no native ASOF
  * operator; the naive formulation (range join + per-probe top-1) is
  * O(probes × candidates) per key and explodes at scale.
  *
  * This is the scalable composition: UNION the two sides, tag them,
  * and take a running `last(candidate, ignoreNulls)` over a window
  * ordered by (ts, side, tie) within each key — ONE shuffle on the
  * key, one sort, zero range explosion; cost is linear in the row
  * count regardless of how candidates and probes interleave.
  * Candidates sort BEFORE probes at equal timestamps, so a same-tick
  * candidate is visible to its probe (`ts_candidate <= ts_probe`
  * semantics), and the optional tie column makes the winner among
  * equal-timestamp candidates deterministic.
  *
  * Window partitioning is by the join key — at production scale keys
  * number in the millions, so parallelism is not language-skew-shaped;
  * per-key window size is that key's history.
  */
object AsOf {

  /** Generic two-frame as-of join. Both frames must carry `key` and
    * `tsCol` under the same names; every candidate column comes back
    * prefixed (`prefix`) next to the probe's own columns. Probes with
    * no candidate at or before them are dropped (inner as-of).
    *
    * @param tieCol candidate column that breaks equal-timestamp ties
    *               deterministically (max wins); None = ties resolve
    *               by encounter order within the sorted partition.
    */
  def asofJoin(
      probes: DataFrame,
      candidates: DataFrame,
      key: String,
      tsCol: String,
      tieCol: Option[String] = None,
      prefix: String = "asof_"): DataFrame = {
    require(probes.columns.contains(key) && candidates.columns.contains(key),
      s"both sides need key column '$key'")
    require(probes.columns.contains(tsCol) && candidates.columns.contains(tsCol),
      s"both sides need timestamp column '$tsCol'")
    val pType = StructType(probes.schema.fields)
    val cType = StructType(candidates.schema.fields)
    // the tie column is ordered RAW (any orderable type) — a cast to
    // long would silently null out e.g. string ids and turn the
    // advertised deterministic tie-break into a no-op. Probes carry a
    // null tie: order among probes at one timestamp is irrelevant
    // (each emits its own row) and candidates-vs-probes is decided by
    // __side alone.
    val tieType = tieCol
      .map(tc => candidates.schema(tc).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    val p = probes.select(
      col(key).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
      lit(null).cast(tieType).as("__tie"),
      struct(probes.columns.map(col).toIndexedSeq: _*).as("__pp"),
      lit(null).cast(cType).as("__cp"))
    val c = candidates.select(
      col(key).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side"),
      tieCol.map(col(_).cast(tieType)).getOrElse(lit(0L).cast(tieType)).as("__tie"),
      lit(null).cast(pType).as("__pp"),
      struct(candidates.columns.map(col).toIndexedSeq: _*).as("__cp"))
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flat: Seq[Column] =
      probes.columns.toIndexedSeq.map(n => col(s"__pp.$n").as(n)) ++
        candidates.columns.toIndexedSeq.map(n => col(s"__cp_last.$n").as(s"$prefix$n"))
    p.unionByName(c)
      .withColumn("__cp_last", last(col("__cp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__cp_last").isNotNull)
      .select(flat: _*)
  }

  /** Last-touch attribution on the events stream: for every
    * `probeType` event, the most recent `candidateType` event of the
    * same user at or before it (probes with no prior candidate are
    * dropped). Same running-last trick as [[asofJoin]], but both sides
    * come from ONE events scan with a pushed-down IN filter — the
    * generic two-frame API would read the table twice, and at 100 TB
    * the second scan is the dominant cost. AsOfSpec proves the two
    * formulations identical.
    */
  def attribution(
      events: DataFrame,
      probeType: String = "purchase",
      candidateType: String = "click"): DataFrame = {
    require(probeType != candidateType, "probe and candidate types must differ")
    val e = events
      .filter(col("event_type").isin(probeType, candidateType))
      .select(
        col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        (col("event_type") === probeType).cast("int").as("is_probe"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("is_probe"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("cand",
        when(col("is_probe") === 0, struct(col("ts_ms"), col("event_id"))))
      .withColumn("last_cand", last(col("cand"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1 && col("last_cand").isNotNull)
      .select(
        col("event_id").as("probe_id"),
        col("user_id"),
        col("last_cand.event_id").as("matched_id"),
        (col("ts_ms") - col("last_cand.ts_ms")).as("gap_ms"))
  }

  /** Oracle: the quadratic-per-key reference formulation (range join +
    * per-probe rank). Independent of the Spark plan on purpose — it
    * validates the semantics, not the trick.
    */
  def sqlAttribution(probeType: String = "purchase", candidateType: String = "click"): String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, event_type, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms FROM events
       |), p AS (SELECT * FROM e WHERE event_type = ${graft.Det.sqlStr(probeType)}),
       |c AS (SELECT * FROM e WHERE event_type = ${graft.Det.sqlStr(candidateType)}),
       |j AS (
       |  SELECT p.event_id AS probe_id, p.user_id, p.ts_ms AS probe_ms,
       |    c.event_id AS matched_id, c.ts_ms AS matched_ms,
       |    row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts_ms DESC, c.event_id DESC) AS rk
       |  FROM p JOIN c ON p.user_id = c.user_id AND c.ts_ms <= p.ts_ms
       |)
       |SELECT probe_id, user_id, matched_id, probe_ms - matched_ms AS gap_ms
       |FROM j WHERE rk = 1""".stripMargin
}
