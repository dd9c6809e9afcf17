package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Managed-table dirs survive a dead JVM while the in-memory catalog
    * does not — clear both so reruns start clean.
    */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val dir = new java.io.File(s"spark-warehouse/$name")
    if (dir.exists()) rm(dir)
  }

  test("co-bucketed fact tables join with ZERO exchanges and no sort") {
    resetTable("orders_b"); resetTable("lineitem_b")
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lines = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(lines, "lineitem_b", "l_orderkey", 8)
    val ob = Bucketing.readBucketed(spark, "orders_b")
    val lb = Bucketing.readBucketed(spark, "lineitem_b")
    // disable broadcast so the join must pick sort-merge — the shape
    // the big-fact-join takes at 100 TB, which is what bucketing serves.
    // Since 3.0 Spark only trusts per-bucket sortedness behind the
    // legacy flag (it must verify one-file-per-bucket at planning);
    // with it on, the pre-sorted single-file buckets also kill the Sort
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      withConf("spark.sql.legacy.bucketedTableScan.outputOrdering", "true") {
        val joined = ob.join(lb, col("o_orderkey") === col("l_orderkey"))
        val plan = planOf(joined)
        assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
        assert(!plan.contains("Sort "), s"bucketed join re-sorts sorted buckets:\n$plan")
        // same answer as the plain (shuffling) join
        val expected = Tables.orders(spark, sf)
          .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
          .count()
        assert(joined.count() === expected)
      }
    }
  }

  test("q_bucketed_join: zero-Exchange fact join through the bucketed layout; answer equals the plain join") {
    // the driver-gated query's join subtree: bucketed scans ARE the
    // hash partitioning, so there must be NO Exchange anywhere in it
    val joined = Bucketing.bucketedFactJoin(spark, sf)
    val plan = planOf(joined)
    assert(!plan.contains("Exchange"), s"bucketed fact join still shuffles:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"merge hint must pin SMJ:\n$plan")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val got = canon(Bucketing.bucketedJoinRollup(spark, sf))
    val plain = canon(Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        Det.fromCents(sum(Det.cents(col("l_extendedprice")))).as("revenue")))
    assert(got === plain)
    assert(got.nonEmpty)
  }

  test("salted join equals the plain join on an adversarially skewed key") {
    import spark.implicits._
    // 10k fact rows, 90% on ONE key — the shape AQE alone cannot fix
    // when the per-key state has to be co-resident
    val fact = (0 until 10000).map { i =>
      val k = if (i % 10 == 0) (i / 10) % 100 + 1L else 0L
      (k, i.toLong)
    }.toDF("k", "payload")
    val dim = (0L until 101L).map(k => (k, s"name_$k")).toDF("k", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 16)
    val plain = fact.join(dim, Seq("k"))
    assert(salted.columns.toSeq === plain.columns.toSeq)
    val a = salted.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val b = plain.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(a === b)
  }

  test("keyProfile finds exactly the planted hot keys with exact counts and shares") {
    import spark.implicits._
    // 10_000 rows: key 0 holds 90%, keys 1..100 hold ~0.1% each, plus
    // a NULL slice that must be ignored
    val rows = (0 until 10000).map { i =>
      val k = if (i % 10 == 0) java.lang.Long.valueOf((i / 10) % 100 + 1L) else java.lang.Long.valueOf(0L)
      (k, i.toLong)
    } ++ (0 until 500).map(i => (null.asInstanceOf[java.lang.Long], (10000 + i).toLong))
    val df = rows.toDF("k", "payload")
    val prof = Skew.keyProfile(df, "k", t = 100, k = 200).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // only key 0 exceeds 1% of the 10_000 non-null rows
    assert(prof === Map("0" -> ((9000L, 0.9))))
    // equals the naive full groupBy under the same threshold
    val naive = df.filter(col("k").isNotNull)
      .groupBy(col("k")).count()
      .filter(col("count") * 100 > 10000)
      .collect().map(r => r.getLong(0).toString -> r.getLong(1)).toMap
    assert(prof.view.mapValues(_._1).toMap === naive)
  }

  test("skewProfileQuery: planted hot key at ~90%; sketch->recount equals the naive groupBy") {
    val prof = Skew.skewProfileQuery(Tables.events(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(math.abs(prof("hot")._2 - 0.9) < 0.01, s"hot share ${prof("hot")._2}")
    // at sf0.001 (1000 events) a couple of cold keys sit exactly ON
    // the strict 1/200 boundary (5 rows · 200 = n), so the expected
    // keyset comes from the naive groupBy under the same threshold —
    // the equality below IS the operator's exactness claim. Most cold
    // keys clear the bar; the report is a spectrum, not one row.
    assert(prof.keySet.count(_.startsWith("cold_")) >= 10)
    prof.collect { case (k, (_, share)) if k.startsWith("cold_") => (k, share) }.foreach {
      case (k, share) => assert(share > 1.0 / 200 && share < 0.02, s"$k share $share")
    }
    val n = Tables.events(spark, sf).count()
    val events = Tables.events(spark, sf).withColumn("route_key",
      when(pmod(col("event_id"), lit(10)) < 9, lit("hot"))
        .otherwise(concat(lit("cold_"), pmod(col("event_id"), lit(17)))))
    val full = events.groupBy("route_key").count()
      .filter(col("count") * 200 > lit(n))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prof.view.mapValues(_._1).toMap === full)
  }

  test("salting spreads the hot key across all salt values deterministically") {
    import spark.implicits._
    val fact = (0 until 9000).map(i => (0L, i.toLong)).toDF("k", "payload")
    val s1 = Skew.saltFact(fact, 16)
    // every salt bucket gets a share of the hot key (9000 distinct rows
    // hash across 16 salts), and the assignment is retry-deterministic
    val counts = s1.groupBy("__salt").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (0 until 16).toSet)
    assert(counts.values.max < 9000L / 16 * 3, s"salt distribution too skewed: $counts")
    val s2 = Skew.saltFact(fact, 16).groupBy("__salt").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts === s2)
  }
}
