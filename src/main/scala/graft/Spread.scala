package graft

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame

/** Spread a (possibly single-file, hence single-partition) scan across
  * the session's shuffle parallelism before heavy per-row expression
  * work — the raw-row shuffle is narrow and the expression work behind
  * it is the expensive part. On a well-split 100 TB input the
  * partition count already exceeds the target and this is a true
  * no-op.
  *
  * The decision uses the OPTIMIZED-PLAN SIZE STATISTIC (catalog/file
  * -index bytes ÷ `spark.sql.files.maxPartitionBytes`, the same
  * arithmetic FilePartition uses to split a scan) — NOT
  * `df.rdd.getNumPartitions`, which would run full physical planning
  * and build the scan RDD during query *construction*, forcing
  * eager file listing on a catalog table and bypassing AQE. The file
  * index behind the statistic was already populated when the
  * DataFrame was created, so reading it plans nothing and runs no job.
  *
  * Relations WITHOUT real statistics (RDD-backed, local/test frames)
  * report the `spark.sql.defaultSizeInBytes` sentinel (Long.MaxValue
  * unless CBO is tuned), which would read as "plenty of partitions"
  * and silently turn Spread into a no-op exactly where a
  * single-partition source is most likely — so the sentinel falls
  * through to an unconditional repartition. That errs toward one
  * narrow raw-row shuffle on stat-less inputs (bounded: such frames
  * are never the 100 TB scan, which always carries file-index stats).
  *
  * SCOPE of the stat-less branch (deliberate, recorded here so the
  * coverage claim is honest): every DRIVER-GATED query reads parquet
  * through the catalog, whose file index always yields a real size
  * statistic — so no CORRECTNESS/BENCH artifact can reach this
  * branch, and none is routed through it artificially. The branch is
  * the guard for the LIBRARY surface: operators accept any DataFrame,
  * and a user handing a LocalRelation / RDD-backed frame (exactly
  * what every hand-built `toDF` spec corpus is, which is why the
  * branch runs in nearly every suite, pinned in SpreadSpec) would
  * otherwise run the per-row expression work of a whole operator on
  * one thread. Library-surface-only, test-observed; not artifact-
  * observable by construction.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    val target = conf.get("spark.sql.shuffle.partitions").toInt
    val maxPartitionBytes = JavaUtils.byteStringAsBytes(
      conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val sizeInBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val noRealStats =
      sizeInBytes == BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes)
    val estimatedScanPartitions =
      ((sizeInBytes + maxPartitionBytes - 1) / maxPartitionBytes).max(1)
    if (!noRealStats && estimatedScanPartitions >= target) df
    else df.repartition(target)
  }
}
