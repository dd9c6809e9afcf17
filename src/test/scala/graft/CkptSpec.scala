package graft

import org.apache.spark.sql.functions._

class CkptSpec extends SparkSpec {
  import spark.implicits._

  /** Run `body` with `spark.sql.defaultSizeInBytes` forced to the
    * sentinel maximum, so RDD-backed (stat-less) leaves report
    * Long.MaxValue and a single self-join's size estimate already
    * exceeds the Ckpt cap — the cheap way to manufacture the
    * compounded-stats regime a deep checkpointed chain reaches at
    * scale.
    */
  private def withHugeDefaults[A](body: => A): A = {
    val key = "spark.sql.defaultSizeInBytes"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Long.MaxValue.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("bounded checkpoint caps an insane carried estimate and keeps rows identical") {
    withHugeDefaults {
      // RDD-backed leaves (no stats) + a join → product of two
      // Long.MaxValue estimates, far past the cap
      val base = spark.createDataFrame(
        spark.sparkContext.parallelize((1L to 100L).map(i => (i, i * 3))),
      ).toDF("k", "v")
      val joined = base.join(base.withColumnRenamed("v", "w"), "k")
      val rawCarry = joined.localCheckpoint().queryExecution.analyzed.stats.sizeInBytes
      assert(rawCarry > BigInt(Long.MaxValue),
        s"test setup must manufacture an over-cap estimate, got $rawCarry")
      val bounded = Ckpt.local(joined)
      val carried = bounded.queryExecution.analyzed.stats.sizeInBytes
      assert(carried <= BigInt(Long.MaxValue),
        s"bounded checkpoint must cap the carry, got $carried")
      assert(bounded.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
        === joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted,
        "the rebuilt frame must hold exactly the checkpointed rows")
    }
  }

  test("bounded checkpoint is a plain checkpoint below the cap — stats carried through") {
    val df = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    val ck = Ckpt.local(df)
    val carried = ck.queryExecution.analyzed.stats.sizeInBytes
    assert(carried <= BigInt(Long.MaxValue) && carried > 0)
    assert(ck.queryExecution.analyzed.getClass.getSimpleName == "LogicalRDD",
      "below the cap the ordinary checkpointed LogicalRDD is returned untouched")
    assert(ck.count() === df.count())
  }

  test("the ArithmeticException fallback rebuilds the same rows with fresh bounded stats") {
    // the catch body (Ckpt.rebuild) is exercised directly: driving a
    // REAL raw-chain overflow requires grinding ~2^30-bit BigInteger
    // products for minutes (the magnitudes just below the BigInteger
    // ceiling), so the glue `catch ArithmeticException => rebuild` is
    // read-verified and the fallback itself is behavior-verified here
    withHugeDefaults {
      val base = spark.createDataFrame(
        spark.sparkContext.parallelize((1L to 100L).map(i => (i, i * 3))),
      ).toDF("k", "v")
      val joined = base.join(base.withColumnRenamed("v", "w"), "k")
      val rebuilt = Ckpt.rebuild(joined)
      assert(rebuilt.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
        === joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted,
        "the fallback must materialize exactly the origin's rows")
      assert(rebuilt.queryExecution.analyzed.stats.sizeInBytes <= BigInt(Long.MaxValue),
        "the fallback frame must carry fresh bounded stats")
      assert(rebuilt.queryExecution.analyzed.getClass.getSimpleName == "LogicalRDD")
    }
  }

  test("Ckpt.drop releases a checkpoint's blocks where Dataset.unpersist silently cannot") {
    import spark.implicits._
    val ck = Ckpt.local(Seq(1L, 2L, 3L).toDF("x"))
    // track the specific checkpointed RDD id (concurrency-safe: other
    // suites may persist their own RDDs in the shared session)
    val ids = ck.queryExecution.analyzed.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
    assert(ids.nonEmpty && ids.forall(spark.sparkContext.getPersistentRDDs.contains),
      "a local checkpoint must register its RDD as persistent")
    ck.unpersist()
    assert(ids.forall(spark.sparkContext.getPersistentRDDs.contains),
      "Dataset.unpersist is a CacheManager call and must NOT touch checkpoint " +
        "blocks (if this starts failing, Spark fixed it and Ckpt.drop can retire)")
    Ckpt.drop(ck)
    assert(!ids.exists(spark.sparkContext.getPersistentRDDs.contains),
      "Ckpt.drop must unpersist the checkpointed RDD itself")
  }

  test("a deep chain of bounded checkpoints never overflows stats estimation") {
    withHugeDefaults {
      val base = spark.createDataFrame(
        spark.sparkContext.parallelize((1L to 50L).map(i => (i, i))),
      ).toDF("k", "v")
      // each generation joins the previous checkpoint with itself —
      // raw localCheckpoint compounds the estimate geometrically and
      // dies around generation ~25; the bounded form must survive
      var cur = Ckpt.local(base)
      for (_ <- 1 to 30) {
        val g = cur.select(col("k"), col("v"))
          .join(cur.select(col("k"), col("v").as("w")), "k")
          .select(col("k"), (col("v") + col("w")).as("v"))
        cur = Ckpt.local(g)
      }
      assert(cur.count() === 50L)
    }
  }
}
