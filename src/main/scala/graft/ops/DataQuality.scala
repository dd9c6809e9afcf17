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

  /** q159: the constraint battery over lineitem + orders + customer.
    *
    * Fully LAZY — the verdict table is a union of aggregate plans, not
    * a driver-side Seq of collected counts: each wide aggregate
    * UNPIVOTS into its constraint rows via one explode over literal
    * (table, constraint, n, violations) structs, so the real scans,
    * the uniqueness groupBy and the referential join are all visible
    * in the returned plan (and get the same hardening checks every
    * other query gets) and nothing executes until the caller acts.
    */
  def dqSuite(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column

    // coalesce: sum over an EMPTY table is null, and a data-quality
    // gate must verdict an empty input (n=0, zero violations), not NPE
    def viol(c: Column) =
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))

    // one aggregate row → its constraint rows, lazily
    def unpivot(agg: DataFrame, table: String, constraints: Seq[(String, String)]) =
      agg.select(explode(array(constraints.map { case (name, vcol) =>
        struct(lit(table).as("table_name"), lit(name).as("constraint_name"),
          col("n").as("n_rows"), col(vcol).as("n_violations"))
      }: _*)).as("r")).select("r.*")

    // ONE scan: every per-row lineitem constraint is a conditional
    // count inside the same aggregate
    val li = unpivot(
      lineitem.agg(
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
        viol(col("l_tax") < 0.0).as("v_tax_neg")),
      "lineitem", Seq(
        ("complete_l_quantity", "v_qty_null"),
        ("complete_l_extendedprice", "v_price_null"),
        ("range_l_quantity_1_50", "v_qty_range"),
        ("positive_l_extendedprice", "v_price_pos"),
        ("accepted_l_returnflag_ANR", "v_flag_set"),
        ("range_l_discount_0_1", "v_disc_range"),
        ("nonnegative_l_tax", "v_tax_neg")))

    val od = unpivot(
      orders.agg(
        count(lit(1)).as("n"),
        viol(col("o_orderkey").isNull).as("v_key_null"),
        viol(!(col("o_totalprice") > 0.0) && col("o_totalprice").isNotNull)
          .as("v_total_pos")),
      "orders", Seq(
        ("complete_o_orderkey", "v_key_null"),
        ("positive_o_totalprice", "v_total_pos")))

    // uniqueness: rows carrying a key value that occurs more than
    // once; Σ per-key counts IS the table's row count, so one keyed
    // rollup yields both n and the duplicate total
    val uq = unpivot(
      orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c")), lit(0L)).as("n"),
          coalesce(sum(when(col("c") > 1L, col("c"))), lit(0L)).as("d")),
      "orders", Seq(("unique_o_orderkey", "d")))

    // referential: order rows whose customer key does not resolve —
    // a 1:≤1 broadcast left join against the distinct dimension keys
    // counts rows and orphans in the same pass
    val rf = unpivot(
      orders
        .join(broadcast(customer.select(col("c_custkey")).distinct()),
          orders("o_custkey") === customer("c_custkey"), "left")
        .agg(count(lit(1)).as("n"),
          viol(col("c_custkey").isNull).as("orphans")),
      "orders", Seq(("ref_o_custkey_in_customer", "orphans")))

    li.union(od).union(uq).union(rf)
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
