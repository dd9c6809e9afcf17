package graft

import org.apache.spark.sql.DataFrame

/** Spread a (possibly single-file, hence single-partition) scan across
  * the session's shuffle parallelism before heavy per-row expression
  * work — the raw-row shuffle is narrow and the expression work behind
  * it is the expensive part. On a well-split 100 TB input the
  * partition count already exceeds the target and this is a true
  * no-op.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
