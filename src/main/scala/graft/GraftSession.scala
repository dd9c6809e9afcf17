package graft

import org.apache.spark.sql.SparkSession

/** Shared session construction for the graft mains and the test
  * fixture — ONE place for the configs that plan correctness and
  * performance depend on, so a main can't silently drift.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS), which Spark 4 rejects
      // by default; read the nanos as longs (Tables.events converts)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // InferFiltersFromGenerate clones expensive generator-input
      // expressions into pushed-down filters (3x per-row work on every
      // explode-of-computed-array path); explode already skips
      // empty/null arrays on its own
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // AQE coalescing stays at Spark's parallelism-first default:
      // round 16 MEASURED size-based coalescing
      // (coalescePartitions.parallelismFirst=false, 64m advisory) and
      // the bench total REGRESSED 248->273 s — the CPU-heavy
      // post-shuffle stages (ANN rescoring, skew profiling, MMR) all
      // collapse to one ~small-MB partition and serialize. The
      // over-parallelization fix lives in Spread's size-derived
      // repartition target instead (explicit repartitions are the one
      // shuffle class AQE cannot coalesce).
      .config("spark.ui.enabled", "false")
}
