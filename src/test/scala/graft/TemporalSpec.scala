package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Temporal

class TemporalSpec extends SparkSpec {

  test("latestSnapshot: hand-built log pins the winner and the equal-ms tie-break") {
    import spark.implicits._
    // user 1: later ts wins; user 2: equal-ms events, higher event_id
    // wins (the struct's lexicographic (ts_ms, event_id) order)
    val ev = Seq(
      (1L, 1L, 1000L, "click", 1.0), (2L, 1L, 2000L, "purchase", 2.5),
      (3L, 2L, 5000L, "view", 0.0), (4L, 2L, 5000L, "error", 9.99))
      .toDF("event_id", "user_id", "ts_ms", "event_type", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val got = Temporal.latestSnapshot(ev).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4), r.getLong(5))))
      .toMap
    assert(got === Map(
      1L -> ((2000L, 2L, "purchase", 2.5, 2L)),
      2L -> ((5000L, 4L, "error", 9.99, 2L))))
  }

  test("latestSnapshot equals the window-rank formulation on real events") {
    val events = Tables.events(spark, sf)
    val snap = Temporal.latestSnapshot(events)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms").desc, col("event_id").desc)
    val ref = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_events", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type"),
        Det.r(col("value"), 2).as("value"), col("n_events"))
    assert(snap.collect().map(_.toSeq).toSet === ref.collect().map(_.toSeq).toSet)
    assert(snap.count() > 0)
  }

  test("latestSnapshot plan: one shuffle, fed by a map-side partial aggregate") {
    val plan = planOf(Temporal.latestSnapshot(Tables.events(spark, sf)))
    val shuffles = "Exchange".r.findAllIn(plan).length
    assert(shuffles === 1, s"expected exactly one keyed shuffle, got $shuffles:\n$plan")
    // the scale contract vs row_number(): the log is reduced BEFORE
    // the exchange — at most one candidate per user per map task
    assert(plan.contains("partial_max"),
      s"no map-side partial aggregation before the shuffle:\n$plan")
    assert(!plan.contains("Window"), s"must not fall back to a window formulation:\n$plan")
  }

  test("intervalJoin: band-edge cases — inclusive lower bound, strict upper, cross-user isolation") {
    import spark.implicits._
    // purchase @3_600_000, trailing window [1_800_000, 3_600_000):
    val ev = Seq(
      (1L, 1L, 1800000L, "click"), // exactly at the lower bound -> IN
      (2L, 1L, 1799999L, "click"), // just below -> OUT
      (3L, 1L, 3599999L, "click"), // just before the purchase -> IN
      (4L, 1L, 3600000L, "click"), // same ms as the purchase -> OUT (strict)
      (5L, 2L, 3599000L, "click"), // other user -> OUT
      (6L, 1L, 3600000L, "purchase"))
      .toDF("event_id", "user_id", "ts_ms", "event_type")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val got = Temporal.intervalJoin(ev)
      .select("click_id", "lag_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1800000L), (3L, 1L)))
  }

  test("scd2: intervals tile each user's timeline — no gaps, no overlaps, one open row") {
    val out = Temporal.scd2(Tables.events(spark, sf))
    val users = out.select("user_id").distinct().count()
    // exactly one open (current) row per user
    assert(out.filter(col("is_current")).count() === users)
    assert(out.filter(col("is_current") =!= (col("valid_to_ms") === -1L)).count() === 0)
    // closed intervals are non-empty-or-zero-length and chain exactly:
    // each closed row's valid_to equals SOME row's valid_from for the
    // same user, and closed rows never extend past the successor
    assert(out.filter(!col("is_current") && col("valid_to_ms") < col("valid_from_ms")).count() === 0)
    val next = out.select(col("user_id").as("u"), col("valid_from_ms").as("vf"))
    val dangling = out.filter(!col("is_current"))
      .join(next, col("user_id") === col("u") && col("valid_to_ms") === col("vf"), "left_anti")
    assert(dangling.count() === 0)
    // row conservation: one interval per event
    assert(out.count() === Tables.events(spark, sf).count())
  }

  test("snapshotDiff: hand-built log pins added/changed/unchanged") {
    import spark.implicits._
    // t1 = 10_000, t2 = 20_000
    // user 1: events at 5_000 and 15_000 -> changed
    // user 2: first event at 12_000 -> added
    // user 3: only event at 3_000 -> unchanged
    // user 4: only event at 25_000 -> absent (no state by t2)
    val ev = Seq(
      (1L, 1L, 5000L), (2L, 1L, 15000L),
      (3L, 2L, 12000L),
      (4L, 3L, 3000L),
      (5L, 4L, 25000L))
      .toDF("event_id", "user_id", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val got = Temporal.snapshotDiff(ev, t1Ms = 10000L, t2Ms = 20000L).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> (("changed", 1L, 2L)),
      2L -> (("added", -1L, 3L)),
      3L -> (("unchanged", 4L, 4L))))
  }

  test("mergeUpsert: hand-built log pins update/insert/noop and the post-merge row") {
    import spark.implicits._
    // t1 = 5000: user 1 has target + later change (update), user 2 only
    // target (noop), user 3 only change (insert), user 4 only after t2
    // (absent). user 1's change slice has two events — latest wins.
    val ev = Seq(
      (1L, 1L, 1000L, "click", 1.0), (2L, 1L, 6000L, "view", 2.0),
      (3L, 1L, 7000L, "purchase", 3.0),
      (4L, 2L, 2000L, "click", 4.0),
      (5L, 3L, 8000L, "signup", 5.0),
      (6L, 4L, 99999L, "click", 6.0))
      .toDF("event_id", "user_id", "ts_ms", "event_type", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val got = Temporal.mergeUpsert(ev, t1Ms = 5000L, t2Ms = 9000L).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getString(4), r.getDouble(5))))
      .toMap
    assert(got === Map(
      1L -> (("update", 7000L, 3L, "purchase", 3.0)),
      2L -> (("noop", 2000L, 4L, "click", 4.0)),
      3L -> (("insert", 8000L, 5L, "signup", 5.0))))
  }

  test("mergeUpsert agrees with snapshotDiff's status partition; update+noop rows ARE the t1 users") {
    val events = Tables.events(spark, sf)
    val merged = Temporal.mergeUpsert(events).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val diff = Temporal.snapshotDiff(events).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // op maps onto the audit view: insert==added; update/noop split changed/unchanged
    assert(merged.keySet === diff.keySet)
    merged.foreach { case (u, op) =>
      val status = diff(u)
      op match {
        case "insert" => assert(status === "added", s"user $u")
        // an update can land on the SAME latest event_id only if the
        // change re-won; changed status implies a source change existed
        case "update" => assert(status === "changed" || status === "unchanged", s"user $u")
        case "noop"   => assert(status === "unchanged", s"user $u")
      }
    }
    // one-scan shape like snapshotDiff: single Exchange, single scan
    val plan = planOf(Temporal.mergeUpsert(events))
    assert("Exchange".r.findAllIn(plan).length === 1, s"plan:\n$plan")
  }

  test("snapshotDiff agrees with two latestSnapshots on real events; one scan, one shuffle") {
    val events = Tables.events(spark, sf)
    val (t1, t2) = (1705363200000L, 1706745600000L)
    val diff = Temporal.snapshotDiff(events, t1, t2)
    def snapAt(t: Long) =
      Temporal.latestSnapshot(events.filter(unix_millis(col("ts")) <= t))
        .select(col("user_id"), col("event_id"))
    val s1 = snapAt(t1).withColumnRenamed("event_id", "old_id")
    val s2 = snapAt(t2).withColumnRenamed("event_id", "new_id")
    val ref = s2.join(s1, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("old_id").isNull, lit("added"))
          .when(col("old_id") =!= col("new_id"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        coalesce(col("old_id"), lit(-1L)).as("old_event_id"),
        col("new_id").as("new_event_id"))
    assert(diff.collect().map(_.toSeq).toSet === ref.collect().map(_.toSeq).toSet)
    assert(diff.count() > 0)
    // plan properties on a FRESH (unexecuted) frame — an executed AQE
    // plan prints initial+final sections and double-counts nodes
    val plan = planOf(Temporal.snapshotDiff(events, t1, t2))
    assert("Exchange".r.findAllIn(plan).length === 1, s"diff must be one shuffle:\n$plan")
    assert("FileScan".r.findAllIn(plan).length === 1, s"diff must scan the log once:\n$plan")
  }

  test("intervalJoin equals the naive range join on real events; plan has no BNLJ") {
    val events = Tables.events(spark, sf)
    val got = Temporal.intervalJoin(events)
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_millis(col("ts")).as("click_ms"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        unix_millis(col("ts")).as("purchase_ms"))
    val naive = p.join(c, col("pu") === col("user_id") &&
        col("click_ms") >= col("purchase_ms") - lit(1800000L) &&
        col("click_ms") < col("purchase_ms"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (col("purchase_ms") - col("click_ms")).as("lag_ms"))
    assert(got.collect().map(_.toSeq).toSet === naive.collect().map(_.toSeq).toSet)
    assert(got.count() > 0)
    val plan = planOf(got)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded interval join must stay an equi-join:\n$plan")
  }
}
