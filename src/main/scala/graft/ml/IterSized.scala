package graft.ml

import org.apache.spark.sql.DataFrame

/** Right-size a MATERIALIZED (checkpointed) frame for an iterative
  * optimizer: L-BFGS re-scans its instance cache once per iteration,
  * so the frame's task count is paid ~20-40 times per fit — at bench
  * scale a 32-partition cache of a few thousand rows costs far more
  * in per-task scheduling than in compute. Coalesce (narrow, no
  * shuffle) to ceil(rows / rowsPerTask), capped at the existing
  * partition count, so the decision is SCALE-ADAPTIVE: on a corpus
  * where every partition already carries ≥ rowsPerTask rows this is
  * a no-op, and the cap means parallelism is never reduced below
  * what one-task-per-rowsPerTask-rows needs.
  *
  * The count job is one narrow pass over checkpoint blocks (the
  * caller's contract: `df` is already materialized), charged to the
  * consumer that builds the fit — strictly cheaper than the dozens
  * of per-iteration task waves it removes.
  *
  * Scoped to the ROWS-ONLY classifier queries: coalescing changes
  * float accumulation order in the gradient treeAggregate, which the
  * declared model-dependence of those queries already covers (their
  * gates are AUC/consistency invariants, not value hashes). Never
  * apply this on an oracle-hashed path.
  */
private[ml] object IterSized {
  def apply(df: DataFrame, rowsPerTask: Long = 50000L): DataFrame = {
    val parts = df.rdd.getNumPartitions
    val rows = df.count()
    val target =
      math.max(1L, math.min(parts.toLong, (rows + rowsPerTask - 1) / rowsPerTask)).toInt
    if (target >= parts) df else df.coalesce(target)
  }
}
