package graft

import org.apache.spark.sql.DataFrame

/** localCheckpoint with a BOUNDED carried size estimate.
  *
  * Spark 4's `Dataset.localCheckpoint` carries the origin plan's
  * statistics onto the new `LogicalRDD`
  * (`LogicalRDD.rewriteStatsAndConstraints`). Catalyst's size-only
  * join estimate is the PRODUCT of the children's sizes, so a chain of
  * checkpointed derivations — each origin joining frames whose leaves
  * are themselves checkpoints carrying already-multiplied estimates —
  * compounds the exponent geometrically across generations. Deep
  * enough chains (the semantic-dedup pipeline at sf3: chunk seam →
  * k-means seams → scored → the CC loop's per-round checkpoints) push
  * the estimate past BigInteger's 2^31-bit ceiling and
  * `java.lang.ArithmeticException: BigInteger would overflow supported
  * range` kills the job AFTER its work succeeded, while the stats are
  * being rewritten onto the checkpoint.
  *
  * [[local]] caps the carry: when the checkpoint's carried sizeInBytes
  * exceeds Long.MaxValue — past any physical meaning; no planner
  * decision distinguishes 2^63 from 2^400 bytes — the frame is rebuilt
  * over the SAME materialized internal-row RDD with fresh (default)
  * statistics, so the next generation's origin multiplies bounded
  * numbers. Below the cap (every physically plausible frame) the
  * checkpoint is returned untouched, carried stats, partitioning and
  * all — broadcast decisions downstream of normal seams are
  * unaffected.
  */
object Ckpt {
  private val MaxCarried = BigInt(Long.MaxValue)

  /** Cap applies on the way OUT of a successful localCheckpoint; the
    * catch below covers the way IN: when the ORIGIN plan already
    * carries compounded over-cap stats (a chain of raw
    * `localCheckpoint`s built outside this module), the overflow
    * throws inside localCheckpoint's own stats rewrite before any cap
    * can engage — so the fallback rebuilds the checkpoint by hand
    * (copy → localCheckpoint → force, the same steps
    * `Dataset.localCheckpoint(eager = true)` performs) and wraps the
    * materialized rows in a fresh-stats frame. Chains built entirely
    * through [[local]] never take this path (every generation's carry
    * is already bounded).
    */
  /** Storage level for checkpoint blocks: `spark.graft.ckpt.storageLevel`
    * (default MEMORY_AND_DISK_SER). Serialized blocks are 2-4x smaller
    * for the array-heavy dedup seams (shingle sets, signatures, pair
    * graphs), which is what keeps the whole seam population resident
    * at sf3 under the 8g bench heap — the round-15 ladder measured
    * 2-4x run-to-run swings on untouched queries as these blocks
    * fought the feature cache for memory. The per-read deserialization
    * cost at bench scale is noise (measured: sf0.1 totals unchanged).
    */
  private def level(df: DataFrame) =
    org.apache.spark.storage.StorageLevel.fromString(
      df.sparkSession.conf.get("spark.graft.ckpt.storageLevel", "MEMORY_AND_DISK_SER"))

  def local(df: DataFrame): DataFrame = {
    val ck =
      try df.localCheckpoint(eager = true, level(df))
      catch {
        case _: ArithmeticException => return rebuild(df)
      }
    val carried = ck.queryExecution.analyzed.stats.sizeInBytes
    if (carried <= MaxCarried) ck
    else org.apache.spark.sql.GraftSqlBridge.internalFrame(
      df.sparkSession, ck.queryExecution.toRdd, ck.schema)
  }

  /** The hand-rolled checkpoint the ArithmeticException catch falls
    * back to: copy → localCheckpoint → force, the same steps
    * `Dataset.localCheckpoint(eager = true)` performs, then wrap the
    * materialized rows in a fresh-stats frame — skipping the stats
    * REWRITE that threw. Works because the overflow fires computing
    * the origin plan's own output estimate (the product over its
    * children), which physical planning never needs — the children's
    * carried estimates are under the ceiling or their own checkpoints
    * would have died first.
    */
  private[graft] def rebuild(df: DataFrame): DataFrame = {
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.persist(level(df))
    rdd.localCheckpoint()
    rdd.count()
    org.apache.spark.sql.GraftSqlBridge.internalFrame(
      df.sparkSession, rdd, df.schema)
  }

  /** ACTUALLY release a checkpointed frame's blocks. `Dataset
    * .unpersist()` routes through the CacheManager, which only knows
    * `.persist()`-ed plans — on a localCheckpoint'd frame it is a
    * silent NO-OP (verified empirically on Spark 4.1: the persistent
    * RDD count does not move), so every "unpersist the previous
    * round" call on a checkpoint leaked its blocks until RDD GC.
    * This walks the plan's LogicalRDD leaves and unpersists the
    * underlying RDDs directly (non-blocking).
    *
    * Only for frames this module produced and whose blocks the caller
    * KNOWS are dead: a localCheckpoint has no lineage, so dropping
    * blocks that something still reads is unrecoverable, not a
    * recompute.
    */
  def drop(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Suffix form, so call sites read like the built-in. */
  implicit class CkptOps(private val df: DataFrame) extends AnyVal {
    def boundedCheckpoint(): DataFrame = Ckpt.local(df)
    def dropCheckpoint(): Unit = Ckpt.drop(df)
  }
}
