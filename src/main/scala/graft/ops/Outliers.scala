package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Det

/** Statistical anomaly detection over the event log: per-user spend
  * z-score outliers — the data-quality screen a pipeline runs before
  * features/labels are trusted (a fat-fingered 100× price lands in
  * `total_amount` otherwise).
  *
  * Scale shape: the first and second moments come from ONE
  * `groupBy(user_id)` over the purchase slice — count, Σcents (long,
  * exact), Σcents² (decimal(38,0), exact: the sums are
  * order-independent INTEGER arithmetic, where a double Σx² would
  * round differently per partitioning). The stats table (one row per
  * active buyer) joins back to the purchase slice on user_id — a
  * keyed shuffle join AQE sizes at runtime. Everything downstream of
  * the two exact sums is a fixed scalar op sequence (cast, ×, ÷,
  * sqrt — all IEEE-correctly-rounded), so the DuckDB oracle computes
  * bit-identical z-scores; only the final z is display-rounded, and
  * the outlier predicate compares the ROUNDED value so the cut is
  * engine-deterministic at the boundary.
  */
object Outliers {

  def spendOutliers(events: DataFrame, minEvents: Int = 5, zThreshold: Double = 3.0): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), Det.cents(col("value")).as("cents"))
    val stats = purchases
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("cents")).as("s"),
        // cents ≤ ~1e7 ⇒ cents² ≤ 1e14 fits a long; the SUM is what
        // overflows a long at scale, hence decimal(38,0)
        sum((col("cents") * col("cents")).cast(DecimalType(38, 0))).as("ss"))
      .filter(col("n") >= minEvents)
    val z = purchases
      .join(stats, "user_id")
      .withColumn("mean_c", col("s").cast("double") / col("n"))
      .withColumn("std_c", sqrt(greatest(
        (col("ss").cast("double") - col("s").cast("double") * col("s").cast("double") / col("n")) / col("n"),
        lit(0.0))))
      .filter(col("std_c") > 0)
      .withColumn("z", Det.r((col("cents").cast("double") - col("mean_c")) / col("std_c"), 4))
    z.filter(abs(col("z")) >= zThreshold)
      .select(
        col("event_id"), col("user_id"),
        Det.fromCents(col("cents")).as("value"),
        col("z"),
        col("n").as("user_events"))
  }

  /** DuckDB oracle: same exact-moment formulation (HUGEINT Σcents²). */
  def sqlSpendOutliers(minEvents: Int = 5, zThreshold: Double = 3.0): String = {
    val zExpr = "floor((CAST(cents AS DOUBLE) - mean_c) / std_c * 10000.0 + 0.5) / 10000.0"
    s"""WITH p AS (
       |  SELECT event_id, user_id,
       |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'
       |), st AS (
       |  SELECT user_id, count(*) AS n, sum(cents) AS s,
       |         sum(CAST(cents * cents AS HUGEINT)) AS ss
       |  FROM p GROUP BY 1 HAVING count(*) >= $minEvents
       |), zt AS (
       |  SELECT p.event_id, p.user_id, p.cents, st.n,
       |    CAST(st.s AS DOUBLE) / st.n AS mean_c,
       |    sqrt(greatest(
       |      (CAST(st.ss AS DOUBLE) - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE) / st.n) / st.n,
       |      0.0)) AS std_c
       |  FROM p JOIN st ON p.user_id = st.user_id
       |)
       |SELECT event_id, user_id,
       |  CAST(cents AS DOUBLE) / 100.0 AS value,
       |  $zExpr AS z,
       |  CAST(n AS BIGINT) AS user_events
       |FROM zt
       |WHERE std_c > 0 AND abs($zExpr) >= $zThreshold""".stripMargin
  }
}
