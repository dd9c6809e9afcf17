package graft

import org.apache.spark.sql.functions._

import graft.ops.{AsOf, Relational}

class RelationalSpec extends SparkSpec {

  test("topNPerGroup keeps at most n rows per brand, ranked by revenue") {
    val top = Relational.topNPerGroup(Tables.lineitem(spark, sf), Tables.part(spark, sf), n = 3)
    val perBrand = top.groupBy("brand").count().filter(col("count") > 3)
    assert(perBrand.count() === 0)
    val badRank = top.filter(col("rank") < 1 || col("rank") > 3)
    assert(badRank.count() === 0)
    // within a brand, revenue is non-increasing in rank
    val rows = top.orderBy(col("brand"), col("rank")).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val revs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("sessionize conserves events and produces non-negative durations") {
    val events = Tables.events(spark, sf)
    val sessions = Relational.sessionize(events)
    assert(sessions.agg(sum(col("n_events"))).head().getLong(0) === events.count())
    assert(sessions.filter(col("duration_ms") < 0).count() === 0)
    // a 30-min-gap session's duration is bounded by its event count
    assert(sessions.filter(col("n_events") === 1 && col("duration_ms") =!= 0).count() === 0)
  }

  test("joinEnrich covers every nation exactly once and is cartesian-free") {
    val out = Relational.joinEnrich(Tables.orders(spark, sf), Tables.customer(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf))
    val plan = planOf(out)
    assert(!plan.contains("CartesianProduct"))
    val n = out.collect()
    assert(n.length === 25) // TPC-H nations
    assert(n.map(_.getString(1)).distinct.length === 25)
  }

  test("cohortRetention: offsets non-negative, week-0 cell per cohort equals cohort size") {
    val ret = Relational.cohortRetention(Tables.events(spark, sf))
    assert(ret.filter(col("week_offset") < 0).count() === 0)
    // retention at offset k never exceeds the cohort's week-0 count
    val w0 = ret.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    val joined = ret.join(w0, "cohort_week")
    assert(joined.filter(col("n_users") > col("cohort_size")).count() === 0)
  }

  test("asof attribution matches hand-built timeline including ties") {
    import spark.implicits._
    // user 1: click@1000(id=1), click@2000(id=2), purchase@3000(id=3)
    //         -> matched to id=2, gap 1000
    // user 2: purchase@500(id=4) with no prior click -> dropped
    // user 3: clicks id=5,6 both @5000, purchase @5000(id=7)
    //         -> same-ms candidate visible; deterministic winner id=6
    val ev = Seq(
      (1L, 1L, 1000L, "click"), (2L, 1L, 2000L, "click"), (3L, 1L, 3000L, "purchase"),
      (4L, 2L, 500L, "purchase"),
      (5L, 3L, 5000L, "click"), (6L, 3L, 5000L, "click"), (7L, 3L, 5000L, "purchase"))
      .toDF("event_id", "user_id", "ts_ms", "event_type")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val got = AsOf.attribution(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set((3L, 1L, 2L, 1000L), (7L, 3L, 6L, 0L)))
  }

  test("asof attribution invariants on real events: non-negative gaps, one match per probe") {
    val events = Tables.events(spark, sf)
    val out = AsOf.attribution(events)
    assert(out.filter(col("gap_ms") < 0).count() === 0)
    val nPurchases = events.filter(col("event_type") === "purchase").count()
    assert(out.count() <= nPurchases)
    assert(out.select("probe_id").distinct().count() === out.count())
    assert(out.count() > 0)
  }

  test("generic asofJoin on two frames agrees with the single-scan attribution") {
    val events = Tables.events(spark, sf)
    def side(t: String) = events
      .filter(col("event_type") === t)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"))
    val generic = AsOf.asofJoin(side("purchase"), side("click"),
        key = "user_id", tsCol = "ts_ms", tieCol = Some("event_id"))
      .select(col("event_id"), col("user_id"), col("asof_event_id"),
        (col("ts_ms") - col("asof_ts_ms")).as("gap_ms"))
      .collect().map(_.toSeq).toSet
    val bespoke = AsOf.attribution(events).collect().map(_.toSeq).toSet
    assert(generic === bespoke)
    assert(generic.nonEmpty)
  }

  test("asof plan: exactly one shuffle, event-type filter pushed to the scan") {
    val plan = planOf(AsOf.attribution(Tables.events(spark, sf)))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles === 1, s"expected the single key shuffle, got $shuffles:\n$plan")
    assert(plan.contains("PushedFilters: [In(event_type"),
      s"event-type filter not pushed to the parquet scan:\n$plan")
  }

  test("funnel: hand-built timelines pin strict sequential semantics") {
    import spark.implicits._
    // u1 completes in order; u2 clicks BEFORE signup (click must not
    // count) then purchases (no qualified click -> no purchase);
    // u3 signup+click at the SAME ms (strictness: click rejected);
    // u4 signup only
    val ev = Seq(
      (1L, 1L, 1000L, "signup"), (2L, 1L, 2000L, "click"), (3L, 1L, 3000L, "purchase"),
      (4L, 2L, 1000L, "click"), (5L, 2L, 2000L, "signup"), (6L, 2L, 3000L, "purchase"),
      (7L, 3L, 1000L, "signup"), (8L, 3L, 1000L, "click"),
      (9L, 4L, 1000L, "signup"))
      .toDF("event_id", "user_id", "ts_ms", "event_type")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val got = Relational.funnel(ev).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got === Map("signup" -> 4L, "click" -> 1L, "purchase" -> 1L))
  }

  test("funnel counts are monotone non-increasing on real events") {
    val rows = Relational.funnel(Tables.events(spark, sf))
      .orderBy("stage_idx").collect().map(_.getLong(2))
    assert(rows.length === 3)
    assert(rows.sliding(2).forall(p => p(0) >= p(1)), rows.toSeq.toString)
    assert(rows.head > 0)
  }

  test("rollingUserStats: hand-built timeline pins the trailing range frame") {
    import spark.implicits._
    // user 1 events at day 0, 3, 8, 20 (value 1.00 each); 7-day window:
    // day 0 -> {0}, day 3 -> {0,3}, day 8 -> {3,8}, day 20 -> {20}
    val day = 86400000L
    val ev = Seq((1L, 1L, 0L * day, 1.0), (2L, 1L, 3L * day, 1.0),
      (3L, 1L, 8L * day, 1.0), (4L, 1L, 20L * day, 1.0))
      .toDF("event_id", "user_id", "ts_ms", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val got = Relational.rollingUserStats(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got === Map(1L -> (1L, 1.0), 2L -> (2L, 2.0), 3L -> (2L, 2.0), 4L -> (1L, 1.0)))
  }

  test("funnel: a quote-bearing stage name neither breaks the plan nor the oracle SQL") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 1000L, "it's a signup"), (2L, 1L, 2000L, "click"))
      .toDF("event_id", "user_id", "ts_ms", "event_type")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val stages = Seq("it's a signup", "click")
    val got = Relational.funnel(ev, stages).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got === Map("it's a signup" -> 1L, "click" -> 1L))
    // the DuckDB twin must double embedded quotes, never emit the raw
    // literal mid-string
    val sql = Relational.sqlFunnel(stages)
    assert(sql.contains("'it''s a signup'"))
    assert(!sql.contains("'it's"))
  }

  test("asofJoin: a STRING tie column breaks equal-timestamp ties (max wins), not nulled out") {
    import spark.implicits._
    val probes = Seq((10L, "k", 5000L)).toDF("pid", "user_id", "ts_ms")
    val candidates = Seq(
      ("a-low", "k", 5000L), ("z-high", "k", 5000L), ("m-mid", "k", 5000L))
      .toDF("cand_id", "user_id", "ts_ms")
    val got = AsOf.asofJoin(probes, candidates,
        key = "user_id", tsCol = "ts_ms", tieCol = Some("cand_id"))
      .select("asof_cand_id").collect().map(_.getString(0))
    assert(got.toSeq === Seq("z-high"))
  }

  test("pricingSummary aggregates are internally consistent") {
    val p = Relational.pricingSummary(Tables.lineitem(spark, sf))
    val bad = p.filter(col("n_orders") > col("count_order") || col("count_order") <= 0)
    assert(bad.count() === 0)
  }

  test("eventPivot conserves events across type columns and counts purchases twice-consistently") {
    val events = Tables.events(spark, sf)
    val piv = Relational.eventPivot(events)
    val typeCols = Seq("n_click", "n_error", "n_purchase", "n_signup", "n_view")
    val total = piv.agg(sum(typeCols.map(col).reduce(_ + _))).head().getLong(0)
    assert(total === events.count())
    // the pivoted purchase count agrees with an independent filter+agg
    val pivPurch = piv.agg(sum(col("n_purchase"))).head().getLong(0)
    assert(pivPurch === events.filter(col("event_type") === "purchase").count())
    // purchase_value only where purchases exist; exact cents conserve
    assert(piv.filter(col("n_purchase") === 0 && col("purchase_value") =!= 0.0).count() === 0)
    val pivValCents = piv.agg(sum(Det.cents(col("purchase_value")))).head().getLong(0)
    val rawCents = events.filter(col("event_type") === "purchase")
      .agg(sum(Det.cents(col("value")))).head().getLong(0)
    assert(pivValCents === rawCents)
  }

  test("eventPivot with an explicit value list plans no extra distinct-values job") {
    // an open pivot would first collect distinct event types; with the
    // list given the plan is a pure two-level aggregate over one scan
    val piv = Relational.eventPivot(Tables.events(spark, sf))
    val plan = planOf(piv)
    assert(plan.contains("pivotfirst"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("revenueRollup levels re-aggregate exactly: region rows sum to ALL, grand total matches") {
    val rr = Relational.revenueRollup(Tables.orders(spark, sf), Tables.customer(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf)).collect()
    def cents(d: Double): Long = math.floor(d * 100.0 + 0.5).toLong
    val finest = rr.filter(_.getLong(2) == 0L)
    val perRegion = rr.filter(_.getLong(2) == 1L)
    val grand = rr.filter(_.getLong(2) == 3L)
    assert(grand.length === 1)
    assert(perRegion.forall(_.getString(1) == "ALL"))
    // each region's ALL row equals the sum of its finest rows (exact cents)
    perRegion.foreach { r =>
      val fin = finest.filter(_.getString(0) == r.getString(0))
      assert(fin.map(_.getLong(3)).sum === r.getLong(3))
      assert(fin.map(_.getLong(4)).sum === r.getLong(4))
      assert(fin.map(x => cents(x.getDouble(5))).sum === cents(r.getDouble(5)))
    }
    // grand total equals the sum over regions
    assert(perRegion.map(_.getLong(3)).sum === grand.head.getLong(3))
    assert(perRegion.map(x => cents(x.getDouble(5))).sum === cents(grand.head.getDouble(5)))
    // no partial level: rollup(region, nation) never emits region=ALL with a concrete nation
    assert(!rr.exists(r => r.getString(0) == "ALL" && r.getString(1) != "ALL"))
  }

  test("revenueRollup expands AFTER the finest-grain aggregate, not over the fact table") {
    val rr = Relational.revenueRollup(Tables.orders(spark, sf), Tables.customer(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf))
    val plan = rr.queryExecution.optimizedPlan.toString
    // Expand must sit above the (region, nation) Aggregate of the
    // orders join — i.e. some Aggregate appears BELOW the Expand
    val lines = plan.linesIterator.toSeq
    val expandIdx = lines.indexWhere(_.contains("Expand"))
    assert(expandIdx >= 0, "rollup should plan an Expand")
    assert(lines.drop(expandIdx + 1).exists(_.contains("Aggregate")),
      "Expand must run over the pre-aggregated frame, not the raw join")
  }

  test("revenueCube: all four levels reaggregate exactly; Expand sits above the finest aggregate") {
    val cube = Relational.revenueCube(Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.nation(spark, sf), Tables.region(spark, sf))
    val rows = cube.collect()
    def lines(level: Long) = rows.filter(_.getLong(2) == level).map(_.getLong(3)).sum
    // every grouping level partitions the same fact rows
    assert(lines(0) === lines(1) && lines(1) === lines(2) && lines(2) === lines(3))
    val grand = rows.filter(_.getLong(2) == 3)
    assert(grand.length === 1 && grand(0).getString(0) === "ALL" && grand(0).getString(1) === "ALL")
    val revL0 = rows.filter(_.getLong(2) == 0).map(r => BigDecimal(r.getDouble(4))).sum
    assert((revL0 - BigDecimal(grand(0).getDouble(4))).abs < 0.01 * rows.length)
    // two-phase: the Expand must run over a pre-aggregated frame
    val plan = planOf(cube)
    val planLines = plan.linesIterator.toSeq
    val expandIdx = planLines.indexWhere(_.contains("Expand"))
    assert(expandIdx >= 0)
    assert(planLines.drop(expandIdx + 1).exists(_.contains("Aggregate")),
      "cube Expand must not run over the raw fact join")
  }

  test("dailyActiveApprox: per-day HLL estimate within 10% of exact; event counts exact; no Expand") {
    val events = Tables.events(spark, sf)
    val approx = Relational.dailyActiveApprox(events)
    val exact = events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("exact_users"), count(lit(1)).as("n_exact"))
    val j = approx.join(exact, "day").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val (a, ex) = (r.getLong(1), r.getLong(3))
      assert(math.abs(a - ex).toDouble / ex <= 0.10, s"day ${r.getString(0)}: $a vs $ex")
      assert(r.getLong(2) === r.getLong(4), s"day ${r.getString(0)}: inexact event count")
    }
    // the sketch path must not plan the countDistinct Expand
    assert(!planOf(approx).contains("Expand"))
  }

  test("priceHistogram: counts conserve rows, bounds are exact multiples, shares sum to ~1") {
    val li = Tables.lineitem(spark, sf)
    val h = Relational.priceHistogram(li)
    val rows = h.collect()
    assert(rows.map(_.getLong(2)).sum === li.count())
    rows.foreach { r =>
      assert(r.getDouble(1) === r.getLong(0) * 500.0, "lo must be bucket * width")
      assert(r.getLong(0) >= 0 && r.getDouble(3) > 0)
    }
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) <= 1e-4 * rows.length)
    // bounded window keeps an honest partition key (no unpartitioned warning path)
    assert(!planOf(Relational.priceHistogram(li)).contains("Exchange SinglePartition"))
  }

  test("multiHorizonStats: horizons nest, 7d agrees with rollingUserStats, one shared shuffle+sort") {
    val events = Tables.events(spark, sf)
    val m = Relational.multiHorizonStats(events)
    assert(m.filter(col("n_1d") > col("n_7d") || col("n_7d") > col("n_30d")).count() === 0)
    assert(m.filter(col("n_1d") < 1).count() === 0, "the current event is in every frame")
    val r7 = Relational.rollingUserStats(events, windowDays = 7)
      .select(col("event_id"), col("n_roll"))
    assert(m.join(r7, "event_id").filter(col("n_7d") =!= col("n_roll")).count() === 0)
    val plan = planOf(Relational.multiHorizonStats(events))
    assert("Exchange".r.findAllIn(plan).length === 1,
      s"all horizons must share one shuffle:\n$plan")
    assert("Sort ".r.findAllIn(plan).length === 1,
      s"all horizons must share one sort:\n$plan")
  }

  test("multiHorizonStats: hand-built timeline pins spend attribution to purchases only") {
    import spark.implicits._
    val day = 86400000L
    // user 1: purchase 5.00 @d0, click 99.0 @d0+1h, purchase 2.50 @d6, purchase 1.00 @d40
    val ev = Seq(
      (1L, 1L, 0L, "purchase", 5.0), (2L, 1L, 3600000L, "click", 99.0),
      (3L, 1L, 6L * day, "purchase", 2.5), (4L, 1L, 40L * day, "purchase", 1.0))
      .toDF("event_id", "user_id", "ts_ms", "event_type", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val got = Relational.multiHorizonStats(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === Map(
      1L -> ((1L, 1L, 1L, 5.0)),
      2L -> ((2L, 2L, 2L, 5.0)),     // click adds no spend
      3L -> ((1L, 3L, 3L, 7.5)),
      4L -> ((1L, 1L, 1L, 1.0))))    // d40 sees nothing in 30d
  }

  test("priceQuantiles: two-level cumulative equals a driver-side exact sort; no data-sized window") {
    val li = Tables.lineitem(spark, sf)
    val got = Relational.priceQuantiles(li).head()
    // brute-force reference: sort every cents value on the driver and
    // pick the ceil(p*n)-th
    val cents = li.select(Det.cents(col("l_extendedprice")).as("c"))
      .collect().map(_.getLong(0)).sorted
    def ref(p: Double): Double = cents(math.ceil(p * cents.length).toInt - 1) / 100.0
    assert(got.getLong(0) === cents.length.toLong)
    assert(got.getDouble(1) === ref(0.5))
    assert(got.getDouble(2) === ref(0.9))
    assert(got.getDouble(3) === ref(0.99))
    assert(got.getDouble(4) === ref(0.999))
    // the scale contract: the within-bucket cumulative window
    // partitions by bucket (bounded), never by a single partition —
    // the only SinglePartition exchange allowed is the final global
    // aggregate's partial-row rollup
    val plan = planOf(Relational.priceQuantiles(li))
    assert(plan.contains("windowspecdefinition(bucket"),
      s"cumulative window must partition by bucket:\n$plan")
    val winIdx = plan.indexOf("Window")
    val spIdx = plan.indexOf("Exchange SinglePartition")
    assert(spIdx < winIdx,
      s"no data-sized rows may cross a single-partition exchange into a window:\n$plan")
  }

  test("corrMatrix: bounded in [-1,1], agrees with Spark's corr, pins a perfect pair") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val m = Relational.corrMatrix(li).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m.size === 6)
    m.values.foreach(c => assert(c >= -1.0 && c <= 1.0))
    m.foreach { case ((a, b), c) =>
      val builtin = li.agg(corr(col(a), col(b))).head().getDouble(0)
      assert(math.abs(c - builtin) < 1e-4, s"($a,$b): $c vs $builtin")
    }
    // a constructed exactly-linear pair correlates to 1.0 and a
    // constant column drops out (zero variance)
    val t = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0))
      .toDF("x", "y", "k")
    val got = Relational.corrMatrix(t, Seq("x", "y", "k")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got === Map(("x", "y") -> 1.0))
    assert("FileScan".r.findAllIn(planOf(Relational.corrMatrix(li))).length === 1)
  }

  test("profile: one scan, conserved counts, means inside [min, max]") {
    val li = Tables.lineitem(spark, sf)
    val p = Relational.profile(li).collect()
    assert(p.length === 4)
    val total = li.count()
    p.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === total, s"${r.getString(0)}: n + nulls != rows")
      assert(r.getDouble(3) <= r.getDouble(5) && r.getDouble(5) <= r.getDouble(4),
        s"${r.getString(0)}: mean outside [min, max]")
    }
    assert("FileScan".r.findAllIn(planOf(Relational.profile(li))).length === 1,
      "profiler must read the table once")
  }
}
