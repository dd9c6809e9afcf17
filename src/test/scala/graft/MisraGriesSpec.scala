package graft

import org.apache.spark.sql.{GraftSqlBridge, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{GraftFunctions, MisraGries}
import graft.text.{Corpus, Text}

class MisraGriesSpec extends SparkSpec {

  /** Skewed multi-partition stream: "hot" = 20%, "warm" = 5%, the rest
    * unique tail tokens. Deterministic (id-derived), shuffled across
    * 17 partitions so partial sketches really merge (and serde runs in
    * the exchange).
    */
  private def skewed(n: Long) = spark.range(n)
    .repartition(17)
    .select(
      when(pmod(col("id"), lit(5)) === 0, lit("hot"))
        .when(pmod(col("id"), lit(20)) === 1, lit("warm"))
        .otherwise(concat(lit("t"), col("id"))).as("token"))

  test("guarantee: every item with freq > n/(k+1) is present, with one-sided counter bounds") {
    val n = 100000L
    val k = 49 // error bound n/(k+1) = 2000 = 2%
    val row = skewed(n).agg(GraftFunctions.misraGries(col("token"), k).as("s")).head()
    val ests = row.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ests.size <= k)
    val bound = n / (k + 1) // 2000
    // hot (20000) and warm (5000) both exceed the bound -> guaranteed
    assert(ests.contains("hot") && ests.contains("warm"))
    // counter is a lower bound within n/(k+1) of the true frequency
    assert(ests("hot") <= 20000L && ests("hot") >= 20000L - bound)
    assert(ests("warm") <= 5000L && ests("warm") >= 5000L - bound)
    // presentation order: est desc, item asc
    val rows = row.getSeq[Row](0)
    assert(rows.map(r => (-r.getLong(1), r.getString(0))) === rows
      .map(r => (-r.getLong(1), r.getString(0))).sorted)
  }

  test("merge preserves the summed error bound; serde round-trips") {
    val mg = MisraGries(GraftSqlBridge.expression(lit("x")), 3)
    def buf(items: (String, Long)*) = {
      val b = mg.createAggregationBuffer()
      items.foreach { case (s, c) => b.update(UTF8String.fromString(s), c) }
      b
    }
    // merge two sketches that overflow k=3: counters add pointwise,
    // then the (k+1)-th largest is subtracted and non-positives drop
    val merged = mg.merge(buf("a" -> 10L, "b" -> 4L, "c" -> 2L), buf("a" -> 5L, "d" -> 3L, "e" -> 1L))
    assert(merged.size <= 3)
    // pointwise sums: a=15 b=4 d=3 c=2 e=1; 4th largest = 2 -> a=13 b=2 d=1
    assert(merged(UTF8String.fromString("a")) === 13L)
    assert(merged(UTF8String.fromString("b")) === 2L)
    assert(merged(UTF8String.fromString("d")) === 1L)
    val rt = mg.deserialize(mg.serialize(merged))
    assert(rt === merged)
  }

  test("heavyHitters (two-pass sketch + recount) equals the naive exact groupBy") {
    val docs = Tables.documents(spark, sf)
    val t = 200
    val got = Corpus.heavyHitters(docs, t = t, k = 2 * t).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val tokens = docs.withColumn("toks", Text.tokens(col("text")))
      .select(explode(col("toks")).as("token"))
    val n = tokens.count()
    val naive = tokens.groupBy("token").count().collect()
      .filter(r => r.getLong(1) * t > n)
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === naive)
    assert(got.nonEmpty, s"threshold n/$t selected nothing at sf0.001 — weaken t")
    // also exact at the minimum legal sketch size k+1 == t
    val tight = Corpus.heavyHitters(docs, t = t, k = t - 1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(tight === naive)
  }

  test("heavyHitters plan: candidate side broadcasts; no data-sized shuffle for the sketch") {
    val plan = planOf(Corpus.heavyHitters(Tables.documents(spark, sf)))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"candidate recount join should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("misra_gries is SQL-callable once registered") {
    GraftSqlBridge.registerFunction(spark, GraftExtensions.misraGries)
    val r = spark.sql(
      """SELECT misra_gries(t, 2) AS s
        |FROM (SELECT explode(array('a','a','a','b','b','c','a','b','d')) AS t)""".stripMargin)
      .head().getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    // n=9, k=2 -> bound 3; a (freq 4) is guaranteed present
    assert(r.contains("a"))
    assert(r.size <= 2)
    // nulls are skipped, not counted
    val withNull = spark.sql(
      """SELECT misra_gries(t, 4) AS s
        |FROM (SELECT explode(array('a', CAST(NULL AS STRING), 'a')) AS t)""".stripMargin)
      .head().getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(withNull === Map("a" -> 2L))
  }
}
