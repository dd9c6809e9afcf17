package graft

/** Spread = stats-based scan widening: repartition only when the size
  * statistic says the scan would under-parallelize, decided with NO
  * df.rdd materialization at build time (VERDICT r5 nit).
  */
class SpreadSpec extends SparkSpec {

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("small single-file scan widens to the session shuffle parallelism") {
    val out = Spread(Tables.documents(spark, sf))
    assert(out.rdd.getNumPartitions ===
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
  }

  test("no-op (same DataFrame reference) once the estimated scan meets the target") {
    // 1 KiB split size makes the estimated partition count of even the
    // sf0.001 documents table exceed the 4-partition target
    withConf("spark.sql.files.maxPartitionBytes", "1k") {
      val df = Tables.documents(spark, sf)
      assert(Spread(df) eq df)
    }
  }
}
