package graft.tools

import graft.{GraftSession, SparkEntry}

/** Targeted per-query driver for scale investigation: time individual
  * `SparkEntry.queries` entries against an arbitrary sf directory
  * through the same noop-sink materialization the bench uses, without
  * paying the full 188-query sweep. Optionally dumps the formatted
  * physical plan (`--explain`) so a super-linear timing can be read
  * next to the plan that produced it.
  *
  * Usage: runMain graft.tools.RunQuery <sfDir> <q1,q2,...> [--explain] [--repeat N]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunQuery <sfDir> <q1,q2,...> [--explain] [--repeat N]")
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val explain = args.contains("--explain")
    val repeat = args.indexOf("--repeat") match {
      case -1 => 1
      case i =>
        require(i + 1 < args.length && args(i + 1).forall(_.isDigit),
          "--repeat needs a numeric count")
        args(i + 1).toInt
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      if (explain) {
        println(s"=== plan $name ===")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      for (r <- 1 to repeat) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[runquery] $name run$r: $sec%.2f s")
      }
    }
    spark.stop()
  }
}
