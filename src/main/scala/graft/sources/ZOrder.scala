package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Det

/** Z-ORDER (Morton-curve) data clustering — the storage-layout
  * operator behind multi-dimensional scan pruning (Delta/Iceberg's
  * OPTIMIZE ZORDER BY): a table sorted by ONE column prunes range
  * predicates on that column and nothing else; interleaving the bits
  * of two (rank-normalized) columns into one sort key gives every
  * file/bucket a BOUNDED min-max envelope in BOTH dimensions, so a
  * 2-D range predicate skips most of the layout.
  *
  * The query is the LAYOUT AUDIT, not a write: both layouts computed
  * from one scan — `linear` (sort by the primary dim: the status quo)
  * and `zorder` (the 16-bit Morton key of the two 8-bit normalized
  * dims) — each cut into the same number of equal-width buckets (a
  * bucket stands for a file's min-max footer stats), emitting per
  * (layout, bucket) the row count and each dimension's min/max/span
  * in normalized units. The pruning claim is then READABLE IN THE
  * ARTIFACT: under `linear` the secondary dimension's spans cover
  * ~the whole domain; under `zorder` both spans are ~sqrt-bounded.
  *
  * Everything is integer arithmetic (normalization is an integer
  * scale against broadcast min/max scalars; the interleave is 16
  * unrolled shift/mask terms) ⇒ the DuckDB twin is hash-exact.
  * Scale shape: two scalar aggregates + ONE scan + one
  * (layout, bucket)-keyed aggregate — at 100 TB the same plan writes
  * the layout instead of auditing it (sort by z, the sort IS the
  * shuffle you'd pay anyway to compact).
  */
object ZOrder {

  /** 16-bit Morton interleave of two 8-bit ints: u takes the odd
    * bits, t the even. Unrolled — 16 shift/mask terms, codegen.
    */
  private[graft] def morton(u8: Column, t8: Column): Column =
    (0 until 8).map { k =>
      (shiftleft(shiftright(u8, k).bitwiseAND(1), 2 * k + 1)) +
        (shiftleft(shiftright(t8, k).bitwiseAND(1), 2 * k))
    }.reduce(_ + _)

  private def sqlMorton(u8: String, t8: String): String =
    (0 until 8).map { k =>
      s"((($u8 >> $k) & 1) << ${2 * k + 1}) + ((($t8 >> $k) & 1) << ${2 * k})"
    }.mkString("(", " + ", ")")

  /** q152: the two-layout 64-bucket audit over events(user_id, ts). */
  def zorderAudit(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"),
      unix_millis(col("ts")).as("ts_ms"))
    val scalars = base.agg(
      min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"),
      min(col("ts_ms")).as("min_t"), max(col("ts_ms")).as("max_t"))
    // integer division throughout (`div`, the q_histogram idiom) — a
    // double `/` + cast can land one off the oracle's exact `//`
    val normed = Det.attachScalar(base, scalars).select(
      expr("((user_id - min_u) * 256) div (max_u - min_u + 1)").as("u8"),
      expr("((ts_ms - min_t) * 256) div (max_t - min_t + 1)").as("t8"))
    val both = normed
      .withColumn("z16", morton(col("u8"), col("t8")))
      .select(col("u8"), col("t8"), explode(array(
        struct(lit("linear").as("layout"), expr("u8 div 4").as("bucket")),
        struct(lit("zorder").as("layout"), expr("z16 div 1024").as("bucket")))).as("lb"))
    both.groupBy(col("lb.layout").as("layout"), col("lb.bucket").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("u8")).as("min_u8"), max(col("u8")).as("max_u8"),
        min(col("t8")).as("min_t8"), max(col("t8")).as("max_t8"))
      .select(col("layout"), col("bucket"), col("n_rows"),
        col("min_u8"), col("max_u8"), col("min_t8"), col("max_t8"),
        (col("max_u8") - col("min_u8") + 1L).as("u_span"),
        (col("max_t8") - col("min_t8") + 1L).as("t_span"))
  }

  def sqlZorderAudit: String = {
    val z = sqlMorton("u8", "t8")
    s"""WITH zb AS (
       |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms FROM events
       |), zs AS (
       |  SELECT min(user_id) AS min_u, max(user_id) AS max_u,
       |         min(ts_ms) AS min_t, max(ts_ms) AS max_t
       |  FROM zb
       |), zn AS (
       |  SELECT ((user_id - min_u) * 256) // (max_u - min_u + 1) AS u8,
       |         ((ts_ms - min_t) * 256) // (max_t - min_t + 1) AS t8
       |  FROM zb, zs
       |), zu AS (
       |  SELECT 'linear' AS layout, u8 // 4 AS bucket, u8, t8 FROM zn
       |  UNION ALL
       |  SELECT 'zorder', $z // 1024, u8, t8 FROM zn
       |)
       |SELECT layout, CAST(bucket AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(min(u8) AS BIGINT) AS min_u8, CAST(max(u8) AS BIGINT) AS max_u8,
       |  CAST(min(t8) AS BIGINT) AS min_t8, CAST(max(t8) AS BIGINT) AS max_t8,
       |  CAST(max(u8) - min(u8) + 1 AS BIGINT) AS u_span,
       |  CAST(max(t8) - min(t8) + 1 AS BIGINT) AS t_span
       |FROM zu GROUP BY 1, 2""".stripMargin
  }
}
