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
}
