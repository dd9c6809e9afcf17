package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val brute = Similarity.bruteKnn(Tables.embeddings(spark, sf)).cache()

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bruteKnn matches a driver-side exact computation for query 0") {
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val q = vecs(0L)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(10).map(_._1)
    val got = brute.filter(col("query_id") === 0).orderBy("rank")
      .collect().map(_.getLong(2)).toSeq
    assert(got === expected)
  }

  test("every query returns exactly k ranked neighbors, no self-matches") {
    val counts = brute.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ === 10L))
    assert(brute.filter(col("query_id") === col("vec_id")).count() === 0)
  }

  test("LSH ANN recall vs brute is acceptable and its plan cartesian-free") {
    val lsh = Similarity.lshAnn(Tables.embeddings(spark, sf))
    val recall = pairSet(lsh).intersect(pairSet(brute)).size.toDouble / pairSet(brute).size
    assert(recall >= 0.3, s"LSH recall@10 $recall below floor")
    val plan = planOf(lsh)
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("IVF ANN recall vs brute is acceptable") {
    val ivf = Similarity.ivfAnn(Tables.embeddings(spark, sf))
    val recall = pairSet(ivf).intersect(pairSet(brute)).size.toDouble / pairSet(brute).size
    assert(recall >= 0.5, s"IVF recall@10 $recall below floor")
  }
}
