package graft.etl

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Det

/** Time-sliced retention/churn feature engineering.
  *
  * Re-expresses the reference ETL (reference: pipeline/etl.py:33-142)
  * Spark-first. The reference computes the customer feature table with
  * four separate `groupBy`s (history agg, distinct products, recent-90d,
  * lookahead label) stitched by three joins — at 100 TB that is four
  * shuffles of the fact table. Here the entire table is ONE
  * orders⋈lineitem join followed by ONE `groupBy(custkey)` using
  * conditional aggregation (`agg(fn(when(slice, col)))`), so the fact
  * data is shuffled exactly once and every aggregate is computed with
  * map-side partial aggregation inside whole-stage codegen.
  *
  * Money is aggregated as integer cents (order-independent, exact at
  * any parallelism — see graft.Det); derived ratios/logs are rounded
  * with the deterministic formula shared with the DuckDB oracle.
  */
object Retention {

  /** Cutoff semantics of reference pipeline/etl.py:53-63 (defaults
    * lookahead=180d from etl.py:159, recent window=90d from etl.py:87,
    * cohort rule from etl.py:127).
    */
  final case class Config(
      cutoff: LocalDateTime = LocalDateTime.parse("2000-06-30T23:59:59"),
      lookaheadDays: Int = 180,
      recentDays: Int = 90,
      cohortMinOrders: Int = 2,
      cohortRecencyDays: Int = 180) {
    def cutoffTs: Column    = lit(Timestamp.valueOf(cutoff))
    def lookaheadTs: Column = lit(Timestamp.valueOf(cutoff.plusDays(lookaheadDays.toLong)))
    def recentTs: Column    = lit(Timestamp.valueOf(cutoff.minusDays(recentDays.toLong)))
    def cutoffDate: Column  = to_date(cutoffTs)
  }

  /** Valid-transaction filter + line amount (reference etl.py:35-39:
    * CustomerID notnull, Quantity>0, UnitPrice>0, Amount=qty*price).
    * `l_extendedprice` is already the line amount (qty*price);
    * `net_amount` additionally applies discount/tax to show the
    * expression battery. All predicates push down to the parquet scan.
    */
  def cleanLines(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_orderkey").isNotNull && col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .select(
        col("l_orderkey").as("orderkey"),
        col("l_linenumber").as("linenumber"),
        col("l_partkey").as("partkey"),
        col("l_quantity").as("qty"),
        col("l_extendedprice").as("amount"),
        Det.r(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 2)
          .as("net_amount"))

  /** Order-level rollup from lines (reference etl.py:42-51: groupBy
    * Invoice → max date, sum amount, countDistinct products, sum qty).
    */
  def orderRollup(lineitem: DataFrame): DataFrame =
    cleanLinesForAgg(lineitem)
      .groupBy(col("l_orderkey").as("orderkey"))
      .agg(
        count(lit(1)).as("order_lines"),
        sum(col("l_quantity")).as("order_qty"),
        Det.fromCents(sum(Det.cents(col("l_extendedprice")))).as("order_amount"),
        countDistinct(col("l_partkey")).as("distinct_parts"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("last_ship_date"))

  private def cleanLinesForAgg(lineitem: DataFrame): DataFrame =
    lineitem.filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)

  /** The flagship: full cutoff-sliced customer feature + churn label
    * table (reference etl.py:33-142) in ONE join + ONE groupBy.
    *
    * Slices (all relative to cutoff T, lookahead T1=T+180d, R=T-90d):
    *   hist      o_orderdate <= T        → behavioural features
    *   recent    R < o_orderdate <= T    → recent-90d features
    *   lookahead T < o_orderdate <= T1   → churn label (no purchase ⇒ 1)
    * Cohort rule: total_orders >= 2 OR recency_days <= 180
    * (reference etl.py:127). Customers with no history are excluded
    * (the reference aggregates hist_orders only, etl.py:66-75).
    */
  def customerFeatures(orders: DataFrame, lineitem: DataFrame, cfg: Config = Config()): DataFrame = {
    val lines = cleanLinesForAgg(lineitem)
    val o = orders.filter(col("o_custkey").isNotNull)
      .select("o_orderkey", "o_custkey", "o_orderdate")

    val hist      = col("o_orderdate") <= cfg.cutoffTs
    val recent    = col("o_orderdate") > cfg.recentTs && hist
    val lookahead = col("o_orderdate") > cfg.cutoffTs && col("o_orderdate") <= cfg.lookaheadTs

    // Two aggregation branches instead of one multi-countDistinct agg:
    // putting countDistinct(orderkey) + countDistinct(partkey) in a
    // single agg makes Catalyst insert an Expand node that replicates
    // every joined fact row once per distinct group (~4x the shuffled
    // bytes at 100 TB). Branch A reduces to order grain first — after
    // which "distinct orders" is a plain count — and branch B keeps the
    // single partkey distinct (one distinct per agg never Expands; it
    // plans as a two-phase hash aggregate with map-side dedup). Each
    // branch's join shuffle carries only that branch's columns, and the
    // final A-join-B runs on two custkey-partitioned aggregates, so it
    // reuses their partitioning instead of shuffling again.

    // Branch A: order-grain rollup -> per-customer counts/sums/dates.
    val orderGrain = lines
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_orderkey"))
      .agg(
        max(col("o_orderdate")).as("od"), // constant within an order
        sum(col("l_quantity")).as("order_qty"),
        sum(Det.cents(col("l_extendedprice"))).as("order_cents"))
    val histO      = col("od") <= cfg.cutoffTs
    val recentO    = col("od") > cfg.recentTs && histO
    val lookaheadO = col("od") > cfg.cutoffTs && col("od") <= cfg.lookaheadTs
    val perCustomer = orderGrain
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        count(when(histO, lit(1))).as("total_orders"),
        sum(when(histO, col("order_qty"))).as("total_qty_raw"),
        sum(when(histO, col("order_cents"))).as("total_cents"),
        max(when(histO, col("od"))).as("last_purchase_ts"),
        count(when(recentO, lit(1))).as("recent90_orders"),
        sum(when(recentO, col("order_cents"))).as("recent90_cents"),
        max(when(lookaheadO, lit(1.0)).otherwise(lit(0.0))).as("has_future_purchase"))

    // Branch B: the one remaining distinct (products per customer).
    val perProducts = lines
      .select(col("l_orderkey"), col("l_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("pcustkey"))
      .agg(countDistinct(when(hist, col("l_partkey"))).as("distinct_products"))

    val feats = perCustomer
      .join(perProducts, col("custkey") === col("pcustkey"))
      .drop("pcustkey")
      .filter(col("total_orders") >= 1)

    val withDerived = feats
      .withColumn("recency_days", datediff(cfg.cutoffDate, to_date(col("last_purchase_ts"))))
      .withColumn("total_amount", Det.fromCents(coalesce(col("total_cents"), lit(0L))))
      .withColumn("recent90_amount", Det.fromCents(coalesce(col("recent90_cents"), lit(0L))))
      .withColumn("label",
        when(col("has_future_purchase") === 1.0, lit(0.0)).otherwise(lit(1.0)))

    // Null handling (reference etl.py:106-118) + cohort rule
    // (etl.py:127) + feature selection (etl.py:130-141).
    withDerived
      .filter(col("total_orders") >= cfg.cohortMinOrders ||
        col("recency_days") <= cfg.cohortRecencyDays)
      .select(
        col("custkey"),
        col("total_orders"),
        coalesce(col("total_qty_raw"), lit(0.0)).as("total_qty"),
        col("total_amount"),
        Det.r(col("total_amount") / col("total_orders"), 4).as("avg_order_amount"),
        col("distinct_products"),
        col("recent90_orders"),
        col("recent90_amount"),
        col("recency_days"),
        Det.r(log1p(col("total_amount")), 6).as("total_amount_log"),
        Det.r(log1p(col("recent90_amount")), 6).as("recent90_amount_log"),
        col("label"))
  }

  /** Lookahead churn labels only (reference etl.py:58-63,120-124):
    * every customer with history, label 1 unless a purchase lands in
    * (T, T1]. Single groupBy over orders (no lineitem needed).
    */
  def churnLabels(orders: DataFrame, cfg: Config = Config()): DataFrame = {
    val hist      = col("o_orderdate") <= cfg.cutoffTs
    val lookahead = col("o_orderdate") > cfg.cutoffTs && col("o_orderdate") <= cfg.lookaheadTs
    orders.filter(col("o_custkey").isNotNull)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        sum(when(hist, lit(1L)).otherwise(lit(0L))).as("hist_orders"),
        max(when(lookahead, lit(1.0)).otherwise(lit(0.0))).as("has_future_purchase"))
      .filter(col("hist_orders") >= 1)
      .select(
        col("custkey"),
        col("hist_orders"),
        when(col("has_future_purchase") === 1.0, lit(0.0)).otherwise(lit(1.0)).as("label"))
  }

  /** Behavioural segmentation (reference README:31-38 EDA): new /
    * churned / active_repeat by recency+frequency, with per-segment
    * rollup including revenue share (computed with a full-frame window
    * over the 3-row aggregate — no driver collect). Money re-enters
    * cents before summing (order-independent).
    */
  def segments(features: DataFrame): DataFrame = {
    val seg = features.withColumn("segment",
      when(col("total_orders") === 1 && col("recency_days") <= 180, lit("new"))
        .when(col("recency_days") > 180, lit("churned"))
        .otherwise(lit("active_repeat")))
    val rolled = seg.groupBy("segment").agg(
      count(lit(1)).as("n_customers"),
      sum(col("total_orders")).as("sum_orders"),
      sum(Det.cents(col("total_amount"))).as("seg_cents"))
    rolled
      .select(
        col("segment"),
        col("n_customers"),
        Det.r(col("sum_orders").cast("double") / col("n_customers"), 4).as("avg_orders"),
        Det.r(Det.fromCents(col("seg_cents")) / col("n_customers"), 2).as("avg_amount"),
        Det.r(col("seg_cents").cast("double") /
          // constant key: the frame is the <=3-row segment rollup at any
          // data size; Det.constKey (non-foldable, unlike lit(0)) keeps
          // the plan off the "no partition defined" warning path
          sum(col("seg_cents")).over(
            Window.partitionBy(Det.constKey(col("seg_cents")))).cast("double"), 6).as("revenue_share"))
  }

  /** Class-imbalance weights (reference train.py:40-55) WITHOUT the
    * reference's driver-side collect: the two label counts stay in the
    * plan via a full-frame window over the 2-row aggregate.
    * w_pos = N_neg / max(N_pos, 1); w_neg = 1.0.
    */
  def classWeightTable(labeled: DataFrame): DataFrame = {
    val counts = labeled.groupBy("label").agg(count(lit(1)).as("n"))
    val all    = Window.partitionBy(Det.constKey(col("n"))) // 2-row frame; constant key, see segments()
    counts
      .withColumn("pos", sum(when(col("label") === 1.0, col("n")).otherwise(0L)).over(all))
      .withColumn("neg", sum(when(col("label") === 0.0, col("n")).otherwise(0L)).over(all))
      .select(
        col("label"), col("n"),
        Det.r(when(col("label") === 1.0,
          col("neg").cast("double") / greatest(col("pos"), lit(1L)).cast("double"))
          .otherwise(lit(1.0)), 6).as("class_weight"))
  }

  /** Attach a class_weight column to a labeled DataFrame for training
    * (broadcast of the 1-row count aggregate; collect-free).
    */
  def withClassWeights(labeled: DataFrame): DataFrame = {
    val counts = labeled.agg(
      sum(when(col("label") === 1.0, 1L).otherwise(0L)).as("_pos"),
      sum(when(col("label") === 0.0, 1L).otherwise(0L)).as("_neg"))
    labeled
      .crossJoin(broadcast(counts))
      .withColumn("class_weight",
        when(col("label") === 1.0,
          col("_neg").cast("double") / greatest(col("_pos"), lit(1L)).cast("double"))
          .otherwise(lit(1.0)))
      .drop("_pos", "_neg")
  }

  /** Deterministic train/val/test split (reference etl.py:145-151 uses
    * randomSplit 70/15/15; a modulo split keeps the same proportions
    * while being reproducible across engines and cluster sizes — at
    * 100 TB a seed-based randomSplit is also re-evaluated per attempt,
    * a hash split is not).
    */
  def splitColumn(key: Column): Column =
    when(pmod(key, lit(20)) < 14, lit("train"))
      .when(pmod(key, lit(20)) < 17, lit("val"))
      .otherwise(lit("test"))

  def withSplit(features: DataFrame, key: String = "custkey"): DataFrame =
    features.withColumn("split", splitColumn(col(key)))

  /** Persist the feature table as train/val/test parquet directories
    * (reference etl.py:145-151 writes three parquet outputs).
    * `partitionBy("split")` yields one directory per split, each
    * independently readable with partition pruning; at 100 TB you
    * would additionally bucket by custkey so downstream training joins
    * co-locate.
    */
  def writeSplits(features: DataFrame, outDir: String): Unit =
    withSplit(features).write.mode("overwrite").partitionBy("split").parquet(outDir)

  def splitSummary(features: DataFrame): DataFrame =
    withSplit(features)
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_customers"),
        Det.r(sum(col("label")) / count(lit(1)), 6).as("pos_rate"))

  /** Population-stability index of `recency_days` between the train
    * and test splits — the standard drift check (PSI < 0.1 stable,
    * 0.1-0.25 shifting, > 0.25 drifted); run between splits it audits
    * split exchangeability, run between training time and serving time
    * it is THE deployment drift monitor.
    *
    *   psi = Σ_bins (p_i − q_i) · ln(p_i / q_i)
    *
    * over 30-day recency bins capped at 11 (the 180 d churn horizon +
    * tail), with Laplace-smoothed shares p = (n+1)/(N+12) so empty
    * bins stay defined. The FULL 0..11 bin domain is materialized
    * (12-row range left-joined with observed counts) before the
    * per-bin term, so the smoothed p and q each sum to exactly 1 and
    * the PSI matches the standard full-domain definition even when a
    * bin is empty in both splits. Shapes: one groupBy over the
    * ≤12-bin domain, totals and the PSI sum via bounded
    * `Det.constKey` windows.
    * Determinism: bin cut and counts are integers; shares divide in
    * an identical cast sequence; each bin term is fixed to integer
    * micro-nats before the sum (the surprisal ln policy), so the
    * DuckDB twin hash-matches.
    */
  def driftPsi(features: DataFrame): DataFrame = {
    val counts = withSplit(features)
      .filter(col("split").isin("train", "test"))
      .select(
        expr("least(CAST(11 AS BIGINT), CAST(greatest(recency_days, 0) AS BIGINT) DIV 30)")
          .as("bin"),
        col("split"))
      .groupBy(col("bin"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    val domain = features.sparkSession.range(0L, 12L).select(col("id").as("bin"))
    val full = domain.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_train"), lit(0L)).as("n_train"),
        coalesce(col("n_test"), lit(0L)).as("n_test"))
    val w = Window.partitionBy(Det.constKey(col("bin")))
    val p = (col("n_train") + lit(1L)).cast("double") / (col("nt") + lit(12L)).cast("double")
    val q = (col("n_test") + lit(1L)).cast("double") / (col("ns") + lit(12L)).cast("double")
    full
      .withColumn("nt", sum(col("n_train")).over(w))
      .withColumn("ns", sum(col("n_test")).over(w))
      .withColumn("micro", floor((p - q) * log(p / q) * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("psi", Det.r(sum(col("micro")).over(w).cast("double") / lit(1000000.0), 6))
      .select(col("bin"), col("n_train"), col("n_test"),
        Det.r(col("micro").cast("double") / lit(1000000.0), 6).as("psi_contrib"),
        col("psi"))
  }

  def sqlDriftPsi(featuresCte: String): String =
    s"""$featuresCte, sp AS (
       |  SELECT CAST(least(11, greatest(recency_days, 0) // 30) AS BIGINT) AS bin,
       |    CASE WHEN custkey % 20 < 14 THEN 'train'
       |         WHEN custkey % 20 < 17 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM cohort
       |), c AS (
       |  SELECT bin,
       |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
       |  FROM sp WHERE split IN ('train', 'test') GROUP BY 1
       |), dom AS (
       |  SELECT CAST(range AS BIGINT) AS bin FROM range(0, 12)
       |), cf AS (
       |  SELECT dom.bin,
       |    CAST(COALESCE(c.n_train, 0) AS BIGINT) AS n_train,
       |    CAST(COALESCE(c.n_test, 0) AS BIGINT) AS n_test
       |  FROM dom LEFT JOIN c ON dom.bin = c.bin
       |), t AS (
       |  SELECT bin, n_train, n_test,
       |    sum(n_train) OVER () AS nt, sum(n_test) OVER () AS ns
       |  FROM cf
       |), m AS (
       |  SELECT bin, n_train, n_test,
       |    CAST(floor(
       |      (CAST(n_train + 1 AS DOUBLE) / CAST(nt + 12 AS DOUBLE)
       |        - CAST(n_test + 1 AS DOUBLE) / CAST(ns + 12 AS DOUBLE))
       |      * ln((CAST(n_train + 1 AS DOUBLE) / CAST(nt + 12 AS DOUBLE))
       |           / (CAST(n_test + 1 AS DOUBLE) / CAST(ns + 12 AS DOUBLE)))
       |      * 1000000.0 + 0.5) AS BIGINT) AS micro
       |  FROM t
       |)
       |SELECT bin, n_train, n_test,
       |  floor(CAST(micro AS DOUBLE) / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 AS psi_contrib,
       |  floor(CAST(sum(micro) OVER () AS DOUBLE) / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 AS psi
       |FROM m""".stripMargin
}
