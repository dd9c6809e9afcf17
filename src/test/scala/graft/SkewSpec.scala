package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = Seq(
    ("hot", 100L), ("hot", 200L), ("hot", 300L), ("hot", 400L),
    ("cold_1", 50L), ("cold_2", 60L)).toDF("route_key", "cents")
  private lazy val dim = Seq(("hot", 10L), ("cold_1", 1L), ("cold_2", 2L), ("cold_3", 3L))
    .toDF("route_key", "weight")

  test("saltedJoin equals the plain inner join exactly (any salt count)") {
    val plain = fact.join(dim, "route_key")
      .select("route_key", "cents", "weight")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    for (salts <- Seq(1, 3, 8)) {
      val salted = Skew.saltedJoin(fact, dim, "route_key", salts)
        .select("route_key", "cents", "weight")
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(salted.toSeq === plain.toSeq, s"salts=$salts")
    }
  }

  test("saltFact spreads a hot key over multiple salts; salt is retry-deterministic") {
    val events = Tables.events(spark, sf)
    val f = events.select(
      when(pmod(col("event_id"), lit(10)) < 9, lit("hot"))
        .otherwise(concat(lit("cold_"), pmod(col("event_id"), lit(17)))).as("route_key"),
      Det.cents(col("value")).as("cents"))
    val salts = Skew.saltFact(f, 8).filter(col("route_key") === "hot")
      .select("__salt").distinct().collect().map(_.getInt(0)).sorted
    assert(salts.length > 1, "hot key must spread")
    assert(salts.forall(s => s >= 0 && s < 8))
    val again = Skew.saltFact(f, 8).filter(col("route_key") === "hot")
      .select("__salt").distinct().collect().map(_.getInt(0)).sorted
    assert(again.toSeq === salts.toSeq, "same rows, same salts")
  }

  test("replicateDim multiplies the dim by the salt count, one replica per salt") {
    val rep = Skew.replicateDim(dim, 5)
    assert(rep.count() === dim.count() * 5)
    assert(rep.groupBy("route_key").agg(countDistinct("__salt").as("n"))
      .filter(col("n") =!= 5).count() === 0)
  }

  test("skewJoinQuery: the physical join really keys on (route_key, __salt)") {
    val q = Skew.skewJoinQuery(Tables.events(spark, sf), salts = 8)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salted key missing from plan:\n$plan")
  }

  test("skewJoinQuery matches a driver-side recomputation on the corpus") {
    val events = Tables.events(spark, sf)
    val got = Skew.skewJoinQuery(events, salts = 8).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val weights = (("hot", 10L) +: (0 until 17).map(i => (s"cold_$i", 1L + i % 3))).toMap
    val rows = events.select(col("event_id"), Det.cents(col("value")).as("cents"))
      .collect().map { r =>
        val id = r.getLong(0)
        val key = if (id % 10 < 9) "hot" else s"cold_${id % 17}"
        (key, r.getLong(1))
      }
    val expect = rows.groupBy(_._1).map { case (k, rs) =>
      k -> ((rs.length.toLong, rs.map(_._2 * weights(k)).sum))
    }
    assert(got === expect)
  }
}
