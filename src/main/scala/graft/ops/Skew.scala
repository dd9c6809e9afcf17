package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for pathological hot keys.
  *
  * AQE's skew-join (on by default) splits oversized shuffle partitions
  * at runtime and is the right tool for MODERATE skew — nothing to do.
  * Explicit salting is for the pathological case AQE cannot fix: one
  * key so hot that even a split partition's build side (all dim rows
  * for that key must be present in every split) or a downstream
  * per-key aggregation state exceeds an executor. Salting rewrites the
  * join key to (key, salt ∈ [0, n)): the fact side gets a
  * deterministic salt per row, the dim side is replicated n ways, and
  * the hot key's rows spread over n tasks by construction.
  *
  * Cost model: dim-side replication multiplies the dim shuffle volume
  * by n — only worth it when |dim| ≪ |fact| (the usual case; a
  * replicated 1 GB dim at n=32 is 32 GB of shuffle, still nothing
  * against a 100 TB fact whose hot key would otherwise pin one task
  * for hours).
  */
object Skew {

  /** Deterministic per-row salt: hash of the whole row, so retries and
    * recomputations salt identically (a `rand()` salt would break
    * task-retry determinism). Rows that are COMPLETELY identical get
    * the same salt — spreading those needs a disambiguating column
    * (event_id, file offset) included in the frame.
    */
  def saltFact(fact: DataFrame, salts: Int): DataFrame =
    fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int"))

  /** Replicate the dim side once per salt value. */
  def replicateDim(dim: DataFrame, salts: Int): DataFrame =
    dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))

  /** Salted INNER equi-join on `key` (the only join type where salting
    * is semantics-preserving without extra bookkeeping: every fact row
    * finds its dim rows in exactly the one salt replica it carries).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    saltFact(fact, salts)
      .join(replicateDim(dim, salts), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** The 18-key routing dim for [[skewJoinQuery]]: 'hot' weighted 10,
    * cold_0..16 weighted 1 + i % 3 — a bounded driver literal (the
    * broadcast-dim shape; replication only ever multiplies THIS).
    */
  private def routeDim(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (("hot", 10L) +: (0 until 17).map(i => (s"cold_$i", 1L + i % 3)))
      .toDF("route_key", "weight")
  }

  /** q151: the SALTED skew join as an end-to-end query — the planted
    * ~90%-hot-key fact of [[skewProfileQuery]] joined to its routing
    * dim through [[saltedJoin]], then aggregated per key. Salting is
    * semantics-preserving for an inner equi-join (every fact row meets
    * its dim rows in exactly the one salt replica it carries), so the
    * DuckDB twin is the PLAIN join + aggregate — the hash gate proves
    * the rewrite changes the SHUFFLE LAYOUT and nothing else. All
    * aggregation is integer (exact cents × integer weight), no float
    * seam. At 100 TB this is the operator for the key AQE cannot fix:
    * the hot key's rows spread over `salts` tasks by construction,
    * and the map-side partial agg keeps the re-aggregation per key
    * tiny. SkewSpec pins salted == unsalted equality, the actual salt
    * spread of the hot key, dim replication arithmetic, and that the
    * join really keys on (key, __salt).
    */
  def skewJoinQuery(events: DataFrame, salts: Int = 8): DataFrame = {
    val fact = events.select(
      when(pmod(col("event_id"), lit(10)) < 9, lit("hot"))
        .otherwise(concat(lit("cold_"), pmod(col("event_id"), lit(17))))
        .as("route_key"),
      graft.Det.cents(col("value")).as("cents"))
    saltedJoin(fact, routeDim(events.sparkSession), "route_key", salts)
      .groupBy(col("route_key"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("cents") * col("weight")).as("weighted_cents"))
  }

  def sqlSkewJoin: String =
    s"""WITH sjf AS (
       |  SELECT CASE WHEN event_id % 10 < 9 THEN 'hot'
       |              ELSE 'cold_' || CAST(event_id % 17 AS VARCHAR) END AS route_key,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
       |  FROM events
       |), sjd AS (
       |  SELECT 'hot' AS route_key, 10 AS weight
       |  UNION ALL
       |  SELECT 'cold_' || CAST(i AS VARCHAR), 1 + i % 3 FROM range(0, 17) t(i)
       |)
       |SELECT route_key, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(cents * weight) AS BIGINT) AS weighted_cents
       |FROM sjf JOIN sjd USING (route_key)
       |GROUP BY 1""".stripMargin

  /** Join-key skew profile — the diagnostic that DECIDES between
    * nothing / AQE / [[saltedJoin]]: exact counts and shares of every
    * key holding more than 1/t of the table. Same two-pass
    * sketch-then-recount design as [[graft.text.Corpus.heavyHitters]]
    * (the key domain is open — a plain `groupBy(key)` would shuffle
    * the full distinct-key table just to find a handful of hot keys):
    * one [[graft.functions.MisraGries]] pass reduces each partition to
    * ≤ k counters (superset guarantee for freq > n/(k+1)), the ≤ k
    * candidates broadcast back for an exact recount, and the integer
    * threshold `cnt·t > n` decides — so the output equals the naive
    * full groupBy exactly. Keys profile as strings (hash/cast-stable
    * for any type); NULL keys are excluded (they broadcast in joins,
    * not shuffle).
    */
  /** Driver-gate harness for [[keyProfile]]: the synthetic events
    * table is deliberately UNIFORM, so this derivation plants the
    * pathological case the profiler exists for — ~90% of events route
    * to one synthetic hot key, the remaining 10% spread over 17 cold
    * keys (each ~0.59% of traffic, above the 1/200 threshold, so the
    * report carries a full hot-vs-warm spectrum, not one row). The
    * MisraGries superset guarantee holds at t=200, k=200 (k+1 ≥ t),
    * so the sketch→recount output EQUALS the naive groupBy and the
    * DuckDB twin is hash-exact.
    */
  def skewProfileQuery(events: DataFrame, t: Int = 200, k: Int = 200): DataFrame =
    keyProfile(
      events.withColumn("route_key",
        when(pmod(col("event_id"), lit(10)) < 9, lit("hot"))
          .otherwise(concat(lit("cold_"), pmod(col("event_id"), lit(17))))),
      "route_key", t, k)

  def sqlSkewProfile(t: Int = 200): String =
    s"""WITH k AS (
       |  SELECT CASE WHEN event_id % 10 < 9 THEN 'hot'
       |              ELSE 'cold_' || CAST(event_id % 17 AS VARCHAR) END AS key
       |  FROM events
       |), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM k)
       |SELECT k.key, CAST(count(*) AS BIGINT) AS n_rows,
       |  floor(CAST(count(*) AS DOUBLE) / CAST(tot.n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS share
       |FROM k, tot
       |GROUP BY k.key, tot.n
       |HAVING count(*) * $t > tot.n""".stripMargin

  def keyProfile(df: DataFrame, keyCol: String, t: Int = 100, k: Int = 200): DataFrame = {
    require(k + 1 >= t, s"k=$k counters cannot guarantee share > 1/$t (need k+1 >= t)")
    val keys = df.select(col(keyCol).cast("string").as("key")).filter(col("key").isNotNull)
    val sketch = keys.agg(
      graft.functions.GraftFunctions.misraGries(col("key"), k).as("cands"),
      count(lit(1)).as("n"))
    val candidates = sketch
      .select(explode(col("cands")).as("c"), col("n"))
      .select(col("c").getField("item").as("key"), col("n"))
    keys
      .join(broadcast(candidates), Seq("key"))
      .groupBy(col("key"), col("n"))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") * lit(t.toLong) > col("n"))
      .select(col("key"), col("n_rows"),
        graft.Det.r(col("n_rows").cast("double") / col("n").cast("double"), 6).as("share"))
  }
}
