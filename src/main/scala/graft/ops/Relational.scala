package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Det
import graft.Ckpt.CkptOps

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

  /** Top-N parts per brand by revenue over a pre-aggregated
    * (brand, part) rollup, with an exact TWO-PHASE rank: parts first
    * rank inside (brand, hash-bucket) and only the ≤ buckets·n
    * survivors rank per brand. A part in the global brand top-n is
    * necessarily in its bucket's top-n (fewer competitors), so the
    * prune is lossless — and the per-brand sort never sees the whole
    * SF-scaled part catalog of a brand in one window task (25 brands ×
    * millions of parts each at 100 TB). Deterministic tie-break on
    * partkey.
    */
  def topNPerGroup(lineitem: DataFrame, part: DataFrame, n: Int = 3, buckets: Int = 64): DataFrame = {
    val perPart = lineitem
      .groupBy(col("l_partkey"))
      .agg(sum(Det.cents(col("l_extendedprice"))).as("part_cents"))
    // part is SF-scaled (200k x SF rows) — no explicit broadcast; AQE
    // decides between broadcast and shuffle join from runtime sizes.
    val withBrand = perPart
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
    val wBucket = Window
      .partitionBy(col("p_brand"), pmod(xxhash64(col("l_partkey")), lit(buckets)))
      .orderBy(col("part_cents").desc, col("l_partkey").asc)
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("part_cents").desc, col("l_partkey").asc)
    withBrand
      .withColumn("brk", row_number().over(wBucket))
      .filter(col("brk") <= n)
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

  /** Strict sequential funnel over events: how many users performed
    * stage 1, then stage 2 STRICTLY AFTER their first stage-1 event,
    * then stage 3 strictly after that qualified stage-2 event.
    *
    * Plan: ONE shuffle+sort (user window ordered by ts), then layered
    * window columns — r1 = running min stage-1 ts, a stage-2 row
    * qualifies iff its ts > r1, r2 = running min of QUALIFIED stage-2
    * ts, and so on. Because events are scanned in time order, the
    * running minima at each row equal the global "first qualified"
    * times the textbook per-stage-min-after-min definition uses (the
    * oracle computes it that way, independently, via chained
    * aggregates) — layering windows over one spec adds Window nodes
    * but NO extra exchange or sort. Output: one row per stage with
    * the surviving user count.
    */
  def funnel(events: DataFrame, stages: Seq[String] = Seq("signup", "click", "purchase")): DataFrame = {
    require(stages.size >= 2 && stages.distinct.size == stages.size, "need >= 2 distinct stages")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("q0", when(col("event_type") === stages.head, col("ts_ms")))
      .withColumn("r0", min(col("q0")).over(w))
    stages.zipWithIndex.tail.foreach { case (s, i) =>
      df = df
        .withColumn(s"q$i",
          when(col("event_type") === s && col("ts_ms") > col(s"r${i - 1}"), col("ts_ms")))
        .withColumn(s"r$i", min(col(s"q$i")).over(w))
    }
    val tCols = stages.indices.map(i => min(col(s"q$i")).as(s"t$i"))
    val perUser = df.groupBy(col("user_id")).agg(tCols.head, tCols.tail: _*)
    // count(col) skips NULLs and yields 0 (never NULL) on the empty
    // global aggregate — exactly the empty-stream contract
    val countCols = stages.indices.map(i => count(col(s"t$i")).as(s"c$i"))
    val counts = perUser.agg(countCols.head, countCols.tail: _*)
    // unpivot via explode of typed structs — stage names travel as
    // Column literals, never spliced into a SQL string (a name with a
    // quote must not be able to break or inject into the plan)
    val stageRows = stages.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("stage_idx"), lit(s).as("stage"), col(s"c$i").as("n_users"))
    }
    counts
      .select(explode(array(stageRows: _*)).as("st"))
      .select(col("st.stage_idx"), col("st.stage"), col("st.n_users"))
  }

  def sqlFunnel(stages: Seq[String] = Seq("signup", "click", "purchase")): String = {
    val ctes = stages.zipWithIndex.map { case (s, i) =>
      if (i == 0)
        s"u0 AS (SELECT user_id, min(ts_ms) AS t FROM e WHERE event_type = ${Det.sqlStr(s)} GROUP BY 1)"
      else
        s"""u$i AS (
           |  SELECT e.user_id, min(e.ts_ms) AS t
           |  FROM e JOIN u${i - 1} ON e.user_id = u${i - 1}.user_id
           |  WHERE e.event_type = ${Det.sqlStr(s)} AND e.ts_ms > u${i - 1}.t
           |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val selects = stages.zipWithIndex.map { case (s, i) =>
      s"SELECT ${i + 1} AS stage_idx, ${Det.sqlStr(s)} AS stage, CAST(count(*) AS BIGINT) AS n_users FROM u$i"
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms FROM events
       |),
       |$ctes
       |$selects""".stripMargin
  }

  /** Rolling time-window features: at every event, the user's event
    * count and spend over the trailing `windowDays` — the per-event
    * generalization of the reference's fixed-cutoff recent-90-day
    * aggregates (etl.py:87-96). A RANGE frame over epoch-millis: the
    * frame is value-based, so equal-timestamp rows are all included
    * regardless of row order — deterministic without a tie-break.
    * One shuffle+sort on user_id; money summed as exact cents.
    */
  def rollingUserStats(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val spanMs = windowDays * 86400000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
      .rangeBetween(-spanMs, 0)
    events
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"), col("value"))
      .withColumn("n_roll", count(lit(1)).over(w))
      .withColumn("value_roll", Det.fromCents(sum(Det.cents(col("value"))).over(w)))
      .select(col("event_id"), col("user_id"), col("n_roll"), col("value_roll"))
  }

  def sqlRollingUserStats(windowDays: Int = 7): String = {
    val spanMs = windowDays * 86400000L
    s"""SELECT event_id, user_id,
       |  CAST(count(*) OVER w AS BIGINT) AS n_roll,
       |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w AS DOUBLE) / 100.0 AS value_roll
       |FROM (SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, value FROM events)
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
       |             RANGE BETWEEN $spanMs PRECEDING AND CURRENT ROW)""".stripMargin
  }

  /** Multi-horizon trailing features in ONE pass — the feature-store
    * materialization shape: at every event, the user's counts over
    * trailing 1d/7d/30d and purchase spend over 30d. All four frames
    * are RANGE windows over the SAME (partition, ordering), so Spark
    * plans ONE Exchange + ONE Sort shared by the stacked Window
    * operators (asserted in RelationalSpec) — the naive per-horizon
    * self-join would scan and shuffle the log once per horizon.
    * Value-based frames make equal-ts rows order-insensitive; spend
    * sums exact cents.
    */
  def multiHorizonStats(events: DataFrame): DataFrame = {
    val base = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
    def fr(days: Int) = base.rangeBetween(-days * 86400000L, 0)
    events
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        when(col("event_type") === "purchase", Det.cents(col("value")))
          .otherwise(0L).as("pc"))
      .withColumn("n_1d", count(lit(1)).over(fr(1)))
      .withColumn("n_7d", count(lit(1)).over(fr(7)))
      .withColumn("n_30d", count(lit(1)).over(fr(30)))
      .withColumn("spend_30d", Det.fromCents(sum(col("pc")).over(fr(30))))
      .select(col("event_id"), col("user_id"), col("n_1d"), col("n_7d"),
        col("n_30d"), col("spend_30d"))
  }

  def sqlMultiHorizonStats(): String = {
    def w(days: Int) =
      s"(PARTITION BY user_id ORDER BY ts_ms RANGE BETWEEN ${days * 86400000L} PRECEDING AND CURRENT ROW)"
    s"""SELECT event_id, user_id,
       |  CAST(count(*) OVER w1 AS BIGINT) AS n_1d,
       |  CAST(count(*) OVER w7 AS BIGINT) AS n_7d,
       |  CAST(count(*) OVER w30 AS BIGINT) AS n_30d,
       |  CAST(sum(pc) OVER w30 AS DOUBLE) / 100.0 AS spend_30d
       |FROM (
       |  SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
       |    CASE WHEN event_type = 'purchase'
       |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END AS pc
       |  FROM events)
       |WINDOW w1 AS ${w(1)}, w7 AS ${w(7)}, w30 AS ${w(30)}""".stripMargin
  }

  /** Single-pass column profiler over the numeric fact columns — the
    * EDA/data-quality report (the reference's notebooks stage). ONE
    * wide aggregate computes every column's count / null count / min
    * / max / mean; the long-format unpivot (explode of a literal
    * struct array) runs on the 1-row result. Means are exact-cents
    * ratios rounded 4 dp; min/max are raw 2-dp parquet doubles —
    * both engine-exact.
    */
  def profile(lineitem: DataFrame,
      cols: Seq[String] = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}_n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        sum(Det.cents(col(c))).as(s"${c}_cents"))
    }
    val wide = lineitem.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}_n").as("n"),
        col(s"${c}_nulls").as("n_nulls"),
        col(s"${c}_min").as("min"),
        col(s"${c}_max").as("max"),
        Det.r(Det.fromCents(col(s"${c}_cents")) / col(s"${c}_n"), 4).as("mean"))
    }
    wide
      .select(explode(array(rows: _*)).as("p"))
      .select(col("p.column"), col("p.n"), col("p.n_nulls"),
        col("p.min"), col("p.max"), col("p.mean"))
  }

  def sqlProfile(cols: Seq[String] = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")): String = {
    val arms = cols.map { c =>
      s"""SELECT ${Det.sqlStr(c)} AS "column",
         |  CAST(count($c) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  min($c) AS min, max($c) AS max,
         |  floor(CAST(sum(CAST(floor($c * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         |        / count($c) * 10000.0 + 0.5) / 10000.0 AS mean
         |FROM lineitem""".stripMargin
    }
    arms.mkString("\nUNION ALL\n")
  }

  /** Exact price percentiles over the full fact table — the
    * continuous-domain generalization of the corpus token-count
    * percentiles, and the pattern's hardest case: the distinct-value
    * table is the PRICE DOMAIN in cents (~1e6-1e7 rows at any data
    * scale), too big for one cumulative window task.
    *
    * Two-level cumulative (the AUC/packSequences decomposition):
    * (1) cents roll up to distinct-value counts — the only data-sized
    * shuffle, map-side combined; (2) values group into $100 buckets;
    * bucket totals cumulate over the BOUNDED bucket table (≤ domain /
    * bucket rows, constKey window); (3) within-bucket cumulatives run
    * bucket-partitioned (≤ bucketCents distinct values per task), and
    * cum = broadcast bucket offset + within-bucket running sum. No
    * window ever sees more than max(buckets, bucketCents) rows. The
    * exact percentile is the smallest value whose cumulative count
    * reaches ceil(p·n) (percentile_disc; identical convention to the
    * DuckDB rank-selection oracle).
    */
  def priceQuantiles(lineitem: DataFrame, bucketCents: Long = 10000L): DataFrame = {
    // the distinct-value rollup feeds both the bucket totals and the
    // cumulative join — checkpoint so the fact scan runs once
    val vals = lineitem
      .select(Det.cents(col("l_extendedprice")).as("cents"))
      .groupBy(col("cents"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", expr(s"cents DIV $bucketCents"))
      .boundedCheckpoint()
    // ONE window spec (round 16): the total rides the SAME asc sort as
    // the prefix via an unbounded frame — same exact integer sums, one
    // Window node + one Sort in the plan instead of two of each
    val wSpec = Window.partitionBy(Det.constKey(col("bucket"))).orderBy(col("bucket").asc)
    val wB = wSpec.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = wSpec.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = vals
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("btot"))
      .withColumn("offset", coalesce(sum(col("btot")).over(wB), lit(0L)))
      .withColumn("n", sum(col("btot")).over(wAll))
      .select(col("bucket"), col("offset"), col("n"))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("cents").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum", col("offset") + sum(col("cnt")).over(wIn))
    def pct(p: Double): Column =
      Det.fromCents(min(when(col("cum") >= ceil(lit(p) * col("n")).cast("long"), col("cents"))))
    cum.agg(
      max(col("n")).as("n_lines"),
      pct(0.5).as("p50"), pct(0.9).as("p90"),
      pct(0.99).as("p99"), pct(0.999).as("p999"))
  }

  /** DuckDB oracle: independent rank-selection over every row. */
  def sqlPriceQuantiles(): String = {
    def pct(p: String, as: String) =
      s"CAST(max(CASE WHEN rk = CAST(ceil($p * n) AS BIGINT) THEN cents END) AS DOUBLE) / 100.0 AS $as"
    s"""WITH c AS (
       |  SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents FROM lineitem
       |), r AS (
       |  SELECT cents, row_number() OVER (ORDER BY cents) AS rk,
       |         count(*) OVER () AS n
       |  FROM c
       |)
       |SELECT CAST(max(n) AS BIGINT) AS n_lines,
       |  ${pct("0.5", "p50")},
       |  ${pct("0.9", "p90")},
       |  ${pct("0.99", "p99")},
       |  ${pct("0.999", "p999")}
       |FROM r""".stripMargin
  }

  /** Pearson correlation matrix over the numeric fact columns in ONE
    * pass — [[profile]]'s bivariate companion. Every moment (n, Σx,
    * Σxy) is EXACT integer arithmetic: cents products fit a long per
    * row (≤1e14) and sum in decimal(38,0), so the moments are
    * order-independent; the final correlation is a fixed scalar
    * sequence over those exact moments (casts, ×, −, ÷, sqrt — all
    * IEEE-identical in DuckDB), making the 6-dp result bit-exact. A
    * double-accumulated Σxy would round differently per partitioning
    * — the standard one-pass corr is NOT engine-deterministic, this
    * one is. Complete-case semantics: rows with any null column are
    * excluded once, up front.
    */
  def corrMatrix(lineitem: DataFrame,
      cols: Seq[String] = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")): DataFrame = {
    val complete = lineitem
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(c => Det.cents(col(c)).as(c)): _*)
    val pairs = for { i <- cols.indices; j <- i until cols.length } yield (i, j)
    val aggs = (count(lit(1)).as("n") +:
      cols.map(c => sum(col(c)).as(s"s_$c"))) ++
      pairs.map { case (i, j) =>
        sum((col(cols(i)) * col(cols(j))).cast(DecimalType(38, 0))).as(s"p_${i}_$j")
      }
    val wide = complete.agg(aggs.head, aggs.tail: _*)
    def d(name: String) = col(name).cast("double")
    val rows = pairs.collect { case (i, j) if i < j =>
      val (a, b) = (cols(i), cols(j))
      val cov = d("n") * d(s"p_${i}_$j") - d(s"s_$a") * d(s"s_$b")
      val va  = d("n") * d(s"p_${i}_$i") - d(s"s_$a") * d(s"s_$a")
      val vb  = d("n") * d(s"p_${j}_$j") - d(s"s_$b") * d(s"s_$b")
      val ok = va > 0 && vb > 0
      // CASE WHEN evaluates lazily — the guarded branch never divides
      // by the zero variance (ANSI mode makes that an error, not NULL)
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(ok, Det.r(cov / sqrt(va * vb), 6)).otherwise(lit(null).cast("double")).as("corr"),
        ok.as("ok"))
    }
    wide
      .select(explode(array(rows: _*)).as("c"))
      .filter(col("c.ok")) // zero-variance columns have no correlation
      .select(col("c.col_a"), col("c.col_b"), col("c.corr"))
  }

  def sqlCorrMatrix(cols: Seq[String] = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")): String = {
    def cents(c: String) = s"CAST(floor($c * 100.0 + 0.5) AS BIGINT)"
    val pairs = for { i <- cols.indices; j <- i until cols.length } yield (i, j)
    val moments =
      (s"count(*) AS n" +: cols.map(c => s"sum(${cents(c)}) AS s_$c")) ++
        pairs.map { case (i, j) =>
          s"sum(CAST(${cents(cols(i))} * ${cents(cols(j))} AS HUGEINT)) AS p_${i}_$j"
        }
    val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    def d(x: String) = s"CAST($x AS DOUBLE)"
    val arms = pairs.collect { case (i, j) if i < j =>
      val (a, b) = (cols(i), cols(j))
      val cov = s"(${d("n")} * ${d(s"p_${i}_$j")} - ${d(s"s_$a")} * ${d(s"s_$b")})"
      val va  = s"(${d("n")} * ${d(s"p_${i}_$i")} - ${d(s"s_$a")} * ${d(s"s_$a")})"
      val vb  = s"(${d("n")} * ${d(s"p_${j}_$j")} - ${d(s"s_$b")} * ${d(s"s_$b")})"
      s"""SELECT ${Det.sqlStr(a)} AS col_a, ${Det.sqlStr(b)} AS col_b,
         |  floor($cov / sqrt($va * $vb) * 1000000.0 + 0.5) / 1000000.0 AS corr
         |FROM m WHERE $va > 0 AND $vb > 0""".stripMargin
    }
    s"""WITH m AS (
       |  SELECT ${moments.mkString(",\n    ")}
       |  FROM lineitem WHERE $notNull
       |)
       |${arms.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Per-user activity profile via PIVOT: one row per user, one count
    * column per event type, purchase spend riding along as exact cents.
    *
    * The value list is EXPLICIT — an open `pivot("event_type")` first
    * runs a distinct-values job and collects it to the driver (a full
    * extra pass over the fact table at 100 TB). With the list given,
    * Catalyst plans the two-level PivotFirst shape (verified in the
    * formatted plan): aggregate at (user_id, event_type) grain — the
    * only fact-sized shuffle, fully map-side-combined, keyed FINER
    * than the output so it parallelizes wider — then PivotFirst folds
    * the ≤ |types| rows per user into the column vector on a second,
    * already-reduced shuffle. NULL count cells mean "user never
    * produced this type" and surface as 0.
    */
  def eventPivot(events: DataFrame,
                 types: Seq[String] = Seq("click", "error", "purchase", "signup", "view")): DataFrame = {
    val counted = events
      .select(col("user_id"), col("event_type"),
        when(col("event_type") === "purchase", Det.cents(col("value"))).otherwise(0L).as("pc"))
      .groupBy(col("user_id"))
      .pivot(col("event_type"), types)
      .agg(count(lit(1)).as("n"), sum(col("pc")).as("cents"))
    // pivot+multi-agg names columns `<value>_<alias>`; keep the counts
    // (NULL => the user never produced that type => 0) and only the
    // purchase cents column carries money
    val countCols = types.map(t => coalesce(col(s"${t}_n"), lit(0L)).as(s"n_$t"))
    counted.select(
      (col("user_id") +: countCols :+
        Det.fromCents(coalesce(col("purchase_cents"), lit(0L))).as("purchase_value")): _*)
  }

  def sqlEventPivot(types: Seq[String] = Seq("click", "error", "purchase", "signup", "view")): String = {
    val counts = types.map(t =>
      s"CAST(sum(CASE WHEN event_type = ${Det.sqlStr(t)} THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
      .mkString(",\n  ")
    s"""SELECT user_id,
       |  $counts,
       |  CAST(sum(CASE WHEN event_type = 'purchase'
       |    THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE) / 100.0 AS purchase_value
       |FROM events GROUP BY 1""".stripMargin
  }

  /** Multi-level revenue totals (region, region+nation, grand total)
    * via ROLLUP — computed TWO-PHASE for scale. A naive
    * `facts.rollup(...)` plans an Expand over the FACT table: every
    * input row is replicated once per grouping level before the
    * shuffle (3× the scan volume at 100 TB). Instead the fact table
    * aggregates ONCE at the finest grain (region, nation) — the only
    * data-sized shuffle — and the rollup's Expand runs over that
    * ≤ |nation|-row aggregate, where replication is free. Sums and
    * customer counts re-aggregate losslessly from the finest grain
    * (each customer lives in exactly one nation). Grouped-out keys are
    * labelled 'ALL' (via `grouping()`, not the NULL the Expand emits,
    * so a real NULL key could not collide) and `level` carries
    * `grouping_id()` for unambiguous level selection downstream.
    */
  def revenueRollup(orders: DataFrame, customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val finest = joinEnrich(orders, customer, nation, region)
      .select(col("region"), col("nation"), col("n_customers"),
        col("n_orders"), Det.cents(col("revenue")).as("rev_cents"))
    finest
      .rollup(col("region"), col("nation"))
      .agg(
        sum(col("n_customers")).as("n_customers"),
        sum(col("n_orders")).as("n_orders"),
        Det.fromCents(sum(col("rev_cents"))).as("revenue"),
        grouping_id().as("level"))
      .select(
        when(grouping_id_free(col("level"), 2), lit("ALL")).otherwise(col("region")).as("region"),
        when(grouping_id_free(col("level"), 1), lit("ALL")).otherwise(col("nation")).as("nation"),
        col("level").cast("long").as("level"),
        col("n_customers"), col("n_orders"), col("revenue"))
  }

  // grouping_id() bit test: bit 0 = rightmost rollup column. Kept as a
  // helper because `grouping()` is only valid inside the agg.
  private def grouping_id_free(level: Column, bit: Int): Column =
    (level.cast("int").bitwiseAND(bit)) =!= 0

  /** CUBE over (region, returnflag) — all four grouping levels of a
    * geography × line-status revenue report, completing the OLAP trio
    * with [[eventPivot]] and [[revenueRollup]]. Same TWO-PHASE scale
    * shape as the rollup: the fact tables aggregate ONCE at the finest
    * (region, returnflag) grain — the only data-sized shuffle — and
    * the cube's 4× Expand multiplies the ≤ |regions|·|flags| aggregate
    * only. Sums re-aggregate losslessly because the finest grain
    * partitions the facts; a count-DISTINCT could not (customers span
    * flags) and is deliberately absent.
    */
  def revenueCube(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val dims = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name").as("region"))
    val finest = lineitem
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("region"), col("l_returnflag").as("returnflag"))
      .agg(count(lit(1)).as("n_lines"), sum(Det.cents(col("l_extendedprice"))).as("cents"))
    finest
      .cube(col("region"), col("returnflag"))
      .agg(sum(col("n_lines")).as("n_lines"),
        Det.fromCents(sum(col("cents"))).as("revenue"),
        grouping_id().as("level"))
      .select(
        when(grouping_id_free(col("level"), 2), lit("ALL")).otherwise(col("region")).as("region"),
        when(grouping_id_free(col("level"), 1), lit("ALL")).otherwise(col("returnflag")).as("returnflag"),
        col("level").cast("long").as("level"),
        col("n_lines"), col("revenue"))
  }

  def sqlRevenueCube(): String =
    s"""WITH dims AS (
       |  SELECT c_custkey, r_name AS region
       |  FROM customer JOIN nation ON c_nationkey = n_nationkey
       |                JOIN region ON n_regionkey = r_regionkey
       |), f AS (
       |  SELECT dims.region, l.l_returnflag AS returnflag,
       |    CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN dims ON o.o_custkey = dims.c_custkey
       |)
       |SELECT
       |  CASE WHEN GROUPING(region) = 1 THEN 'ALL' ELSE region END AS region,
       |  CASE WHEN GROUPING(returnflag) = 1 THEN 'ALL' ELSE returnflag END AS returnflag,
       |  CAST(GROUPING(region) * 2 + GROUPING(returnflag) AS BIGINT) AS level,
       |  CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(sum(cents) AS DOUBLE) / 100.0 AS revenue
       |FROM f
       |GROUP BY CUBE(region, returnflag)""".stripMargin

  def sqlRevenueRollup(): String =
    s"""WITH dims AS (
       |  SELECT c_custkey, n_name AS nation, r_name AS region
       |  FROM customer JOIN nation ON c_nationkey = n_nationkey
       |                JOIN region ON n_regionkey = r_regionkey
       |), pc AS (
       |  SELECT o_custkey, count(*) AS cust_orders,
       |    sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cust_cents
       |  FROM orders GROUP BY 1
       |)
       |SELECT
       |  CASE WHEN GROUPING(region) = 1 THEN 'ALL' ELSE region END AS region,
       |  CASE WHEN GROUPING(nation) = 1 THEN 'ALL' ELSE nation END AS nation,
       |  CAST(GROUPING(region) * 2 + GROUPING(nation) AS BIGINT) AS level,
       |  CAST(count(*) AS BIGINT) AS n_customers,
       |  CAST(sum(cust_orders) AS BIGINT) AS n_orders,
       |  CAST(sum(cust_cents) AS DOUBLE) / 100.0 AS revenue
       |FROM pc JOIN dims ON o_custkey = c_custkey
       |GROUP BY ROLLUP(region, nation)""".stripMargin

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

  /** Fixed-width value histogram over line net prices with
    * share-of-total — the profiling/reporting staple. Bucketing is
    * INTEGER arithmetic end to end (cents DIV width-in-cents), so the
    * bucket cut is exact and identical in both engines — a double
    * `floor(price/width)` could land a boundary value differently.
    * One scan + one tiny groupBy (≤ price-range/width rows); the
    * grand total is a [[Det.constKey]]-partitioned window over the
    * BUCKET table (bounded rows — an attachScalar here would plan the
    * fact scan twice, once per branch).
    */
  def priceHistogram(lineitem: DataFrame, widthCents: Long = 50000L): DataFrame = {
    val buckets = lineitem
      .select(Det.cents(col("l_extendedprice")).as("cents"))
      .select(expr(s"cents DIV $widthCents").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(Det.constKey(col("bucket")))
    buckets
      .withColumn("total", sum(col("n")).over(w))
      .select(
        col("bucket"),
        Det.fromCents(col("bucket") * widthCents).as("lo"),
        col("n"),
        Det.r(col("n").cast("double") / col("total").cast("double"), 6).as("share"))
  }

  def sqlPriceHistogram(widthCents: Long = 50000L): String =
    s"""WITH b AS (
       |  SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) // $widthCents AS bucket,
       |         count(*) AS n
       |  FROM lineitem GROUP BY 1
       |), t AS (SELECT sum(n) AS total FROM b)
       |SELECT bucket,
       |  CAST(bucket * $widthCents AS DOUBLE) / 100.0 AS lo,
       |  CAST(n AS BIGINT) AS n,
       |  floor(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS share
       |FROM b, t""".stripMargin

  /** Daily active users via HLL++ (`approx_count_distinct`) — the
    * sketch path for the highest-volume recurring question a 100 TB
    * event store answers. An exact `countDistinct(user_id)` per day
    * must shuffle every distinct (day, user) pair; the HLL sketch is
    * a fixed ~kilobytes-per-day accumulator that partial-aggregates
    * map-side and MERGES across partitions, so the shuffle carries
    * |days| × sketch_size regardless of user cardinality — and
    * sketches for (day) roll up to (week, month) without rescanning.
    * Approximate (relative error ≈ `rsd`) ⇒ rows-only driver gate;
    * RelationalSpec pins the per-day error against the exact count.
    */
  def dailyActiveApprox(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        count(lit(1)).as("n_events"))
}
