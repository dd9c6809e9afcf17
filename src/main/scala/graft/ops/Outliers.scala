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

  /** q116: the [[spendOutliers]] discipline on the EMBEDDING modality
    * — the vector-quality screen an embedding pipeline runs before an
    * index or a semantic-dedup pass trusts the vectors (a corrupted /
    * wrong-model / truncated vector lands far from its label's
    * centroid): per label, each vector's cosine to the label CENTROID,
    * z-scored within the label, outliers past the rounded-z cut.
    *
    * Determinism stack (every piece already proven in an
    * oracle-checked operator): the centroid is the q_label_centroids
    * recipe kept wide — per-dimension integer MICRO-SUMS (order-free
    * exact) divided once (fixed IEEE scalar); the cosine is the
    * codegen [[graft.functions.VecDot]] array fold, bit-identical to
    * the DuckDB list_sum form; each cosine then fixes to an integer
    * micro-cosine BEFORE the per-label moment sums (Σc long,
    * Σc² decimal(38,0) — the q_anomaly integer-moment move), and the
    * z cut compares the ROUNDED z. Scale shape: one wide bounded
    * centroid aggregate, broadcast back; one micro-cosine pass; one
    * per-label moment rollup broadcast back — no corpus-sized join,
    * no window.
    */
  def embedOutliers(
      embeddings: DataFrame,
      dim: Int = 64,
      minN: Int = 5,
      zThreshold: Double = 2.0): DataFrame = {
    val dot = graft.functions.GraftFunctions.vecDot _
    val sums = (0 until dim).map(i =>
      sum(floor(col("embedding")(i).cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))
        .as(s"s$i"))
    val wide = embeddings.filter(size(col("embedding")) === dim)
      .groupBy(col("label")).agg(count(lit(1)).as("cn"), sums: _*)
    val mcols = (0 until dim).map(i =>
      col(s"s$i").cast("double") / (col("cn") * lit(1000000L)).cast("double"))
    val cents = wide.select(col("label"), array(mcols: _*).as("m"))
    val cos = embeddings
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      // ragged vectors are out of the screen's contract (the
      // unitCorpus `size === d` discipline): VecDot returns NULL on a
      // length mismatch where the SQL list fold may not, so the
      // dimension filter is explicit and mirrored in the twin
      .filter(size(col("v")) === dim)
      .join(broadcast(cents), "label")
      .withColumn("vn", sqrt(dot(col("v"), col("v"))))
      .withColumn("mn", sqrt(dot(col("m"), col("m"))))
      .filter(col("vn") > 0 && col("mn") > 0)
      .withColumn("c",
        floor(dot(col("v"), col("m")) / (col("vn") * col("mn")) * lit(1000000.0) + lit(0.5))
          .cast("long"))
      .select(col("vec_id"), col("label"), col("c"))
    val stats = cos
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("c")).as("s"),
        // |c| <= 1e6 => c² <= 1e12 fits a long; the SUM overflows at
        // scale, hence decimal(38,0) (the spendOutliers reasoning)
        sum((col("c") * col("c")).cast(DecimalType(38, 0))).as("ss"))
      .filter(col("n") >= minN)
    cos.join(broadcast(stats), "label")
      .withColumn("mean_c", col("s").cast("double") / col("n"))
      .withColumn("std_c", sqrt(greatest(
        (col("ss").cast("double") - col("s").cast("double") * col("s").cast("double") / col("n")) / col("n"),
        lit(0.0))))
      .filter(col("std_c") > 0)
      .withColumn("z", Det.r((col("c").cast("double") - col("mean_c")) / col("std_c"), 4))
      .filter(abs(col("z")) >= zThreshold)
      .select(
        col("vec_id"),
        col("label").cast("long").as("label"),
        Det.r(col("c").cast("double") / lit(1000000.0), 6).as("cosine"),
        col("z"),
        col("n").as("label_n"))
  }

  /** DuckDB oracle of [[embedOutliers]]: the identical micro-sum
    * centroid, list-fold cosine, integer-moment z formulation.
    */
  def sqlEmbedOutliers(
      dim: Int = 64, minN: Int = 5, zThreshold: Double = 2.0): String = {
    val sums = (0 until dim)
      .map(i => s"sum(CAST(floor(CAST(embedding[${i + 1}] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS s$i")
      .mkString(",\n    ")
    val mList = (0 until dim)
      .map(i => s"CAST(s$i AS DOUBLE) / CAST(cn * 1000000 AS BIGINT)")
      .mkString("[", ", ", "]")
    val zExpr = "floor((CAST(c AS DOUBLE) - mean_c) / std_c * 10000.0 + 0.5) / 10000.0"
    s"""WITH eo_w AS (
       |  SELECT label, count(*) AS cn,
       |    $sums
       |  FROM embeddings WHERE len(embedding) = $dim GROUP BY 1
       |), eo_m AS (
       |  SELECT label, $mList AS m FROM eo_w
       |), eo_v AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings WHERE len(embedding) = $dim
       |), eo_c AS (
       |  SELECT vec_id, eo_v.label,
       |    CAST(floor(
       |      list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * m[i]))
       |      / (sqrt(list_sum(list_transform(v, x -> x * x)))
       |         * sqrt(list_sum(list_transform(m, x -> x * x))))
       |      * 1000000.0 + 0.5) AS BIGINT) AS c
       |  FROM eo_v JOIN eo_m ON eo_v.label = eo_m.label
       |  WHERE sqrt(list_sum(list_transform(v, x -> x * x))) > 0
       |    AND sqrt(list_sum(list_transform(m, x -> x * x))) > 0
       |), eo_s AS (
       |  SELECT label, count(*) AS n, sum(c) AS s,
       |    sum(CAST(c * c AS HUGEINT)) AS ss
       |  FROM eo_c GROUP BY 1 HAVING count(*) >= $minN
       |), eo_z AS (
       |  SELECT eo_c.vec_id, eo_c.label, eo_c.c, eo_s.n,
       |    CAST(eo_s.s AS DOUBLE) / eo_s.n AS mean_c,
       |    sqrt(greatest(
       |      (CAST(eo_s.ss AS DOUBLE) - CAST(eo_s.s AS DOUBLE) * CAST(eo_s.s AS DOUBLE) / eo_s.n) / eo_s.n,
       |      0.0)) AS std_c
       |  FROM eo_c JOIN eo_s ON eo_c.label = eo_s.label
       |)
       |SELECT vec_id, CAST(label AS BIGINT) AS label,
       |  floor(CAST(c AS DOUBLE) / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 AS cosine,
       |  $zExpr AS z,
       |  CAST(n AS BIGINT) AS label_n
       |FROM eo_z
       |WHERE std_c > 0 AND abs($zExpr) >= $zThreshold""".stripMargin
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
