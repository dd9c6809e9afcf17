package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Det

/** General relational operator battery: aggregation, dimension joins,
  * top-N-per-group, sessionization, cohort retention. Everything is
  * declarative DataFrame code so Catalyst gets pushdown/pruning/join
  * selection; small dims are explicitly `broadcast()`.
  */
object Relational {

  /** Pricing summary (TPC-H Q1 flavor): wide aggregate battery over the
    * fact table grouped by two low-cardinality flags. Money in cents
    * (exact); the single groupBy benefits from partial aggregation.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag").as("returnflag"), col("l_linestatus").as("linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        Det.fromCents(sum(Det.cents(col("l_extendedprice")))).as("sum_base_price"),
        Det.r(Det.fromCents(sum(Det.cents(col("l_extendedprice")))) / count(lit(1)), 4)
          .as("avg_price"),
        Det.r(Det.fromCents(sum(Det.cents(col("l_discount")))) / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  /** Customer revenue enriched through the dim chain customer ⋈ nation
    * ⋈ region. Only nation (25 rows) and region (5 rows) are broadcast
    * — they stay tiny at any scale. The customer-cardinality side is
    * NOT broadcast: at 100 TB the customer dimension is billions of
    * rows, so perCust ⋈ customer is a shuffle join on custkey and AQE
    * picks the physical strategy at runtime.
    */
  def joinEnrich(orders: DataFrame, customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val dims = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name").as("nation"), col("r_name").as("region"))
    val perCust = orders
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("cust_orders"),
        sum(Det.cents(col("o_totalprice"))).as("cust_cents"))
    perCust
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("region"), col("nation"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("cust_orders")).as("n_orders"),
        Det.fromCents(sum(col("cust_cents"))).as("revenue"))
  }

  /** Top-N parts per brand by revenue: window rank over a pre-aggregated
    * (brand, part) rollup — the window runs on the *aggregate*, not the
    * fact table, so the sort is tiny at any scale. Deterministic
    * tie-break on partkey.
    */
  def topNPerGroup(lineitem: DataFrame, part: DataFrame, n: Int = 3): DataFrame = {
    val perPart = lineitem
      .groupBy(col("l_partkey"))
      .agg(sum(Det.cents(col("l_extendedprice"))).as("part_cents"))
    // part is SF-scaled (200k x SF rows) — no explicit broadcast; AQE
    // decides between broadcast and shuffle join from runtime sizes.
    val withBrand = perPart
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("part_cents").desc, col("l_partkey").asc)
    withBrand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(
        col("p_brand").as("brand"),
        col("rank"),
        col("l_partkey").as("partkey"),
        Det.fromCents(col("part_cents")).as("part_revenue"))
  }

  /** Event sessionization: a session breaks after `gapMinutes` of user
    * inactivity. Classic lag + conditional cumulative-sum windows, one
    * shuffle on user_id. Timestamps are compared in epoch-millis longs
    * (ns/µs parquet precision skew never reaches the output).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapMs = gapMinutes * 60L * 1000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val withGap = events
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("duration_ms"),
        countDistinct(col("event_type")).as("n_event_types"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"))
  }

  /** Weekly cohort retention matrix on events: cohort = ISO week of a
    * user's first event; one row per (cohort_week, week_offset) with
    * distinct active users. Two shuffles (per-user min, then matrix
    * agg) — both on already-reduced data.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val activity = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val firstWeek = activity
      .groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    activity
      .join(firstWeek, "user_id")
      .groupBy(col("cohort_week"), col("week"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        ((datediff(col("week"), col("cohort_week"))) / 7).cast("int").as("week_offset"),
        col("n_users"))
  }
}
