package graft

/** Benchmark main: times every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Results are materialized through the `noop` datasource sink — unlike
  * `.count()`, which lets Catalyst prune away projection work entirely,
  * the noop writer evaluates every output row/column while writing
  * nothing, so timings reflect the real computation. Failures are
  * recorded explicitly as -1 timings plus a `failures` list (a throwing
  * query must never masquerade as a fast one).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failures = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failures ::= name
          false
        }
      // isolate measurements: drop the previous query's broadcast /
      // cache debris outside the timed section (shared-JVM GC pressure
      // showed up as 4x run-to-run swings on the join-heavy queries)
      spark.catalog.clearCache()
      System.gc()
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val fs = failures.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
