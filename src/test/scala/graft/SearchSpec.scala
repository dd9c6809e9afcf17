package graft

import org.apache.spark.sql.functions._

import graft.text.Search

class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf: hand-computed scores and ranks on a 3-doc corpus") {
    val docs = Seq(
      (1L, "x x y"),
      (2L, "x z"),
      (3L, "x")).toDF("doc_id", "text")
    val r = Search.tfidfTop(docs, k = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getString(2), x.getLong(3), x.getDouble(4)))
      .toMap
    val ln3r = math.floor(math.log(3.0) * 1e6 + 0.5) / 1e6
    // d1: y (tf 1, idf ln3) beats x (tf 2, idf ln(3/3)=0)
    assert(r((1L, 1L)) === ("y", 1L, ln3r))
    assert(r((1L, 2L)) === ("x", 2L, 0.0))
    assert(r((2L, 1L)) === ("z", 1L, ln3r))
    assert(r((2L, 2L)) === ("x", 1L, 0.0))
    assert(r((3L, 1L)) === ("x", 1L, 0.0))
    assert(!r.contains((3L, 2L)))
  }

  test("bm25: matches a driver-side reimplementation on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val terms = Search.defaultQuery
    val k1 = 1.2; val b = 0.75
    val toks = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty))
    val n = toks.length
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / n
    val dfm = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
    def idf(t: String) = math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0)
    val expected = toks.flatMap { case (id, ts) =>
      val score = terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0.0) 0.0
        else idf(t) * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * ts.length / avgdl))
      }.sum
      if (score > 0.0) Some(id -> score) else None
    }.sortBy { case (id, s) => (-s, id) }.take(20)
    val got = Search.bm25Search(docs, terms, k = 20, k1 = k1, b = b).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.length === expected.length)
    got.zip(expected).foreach { case ((rank, id, score), (eid, escore)) =>
      assert(id === eid, s"rank $rank")
      assert(math.abs(score - escore) < 1e-5, s"doc $id: $score vs $escore")
    }
  }

  test("bm25 plan: global top-k is TakeOrdered, never a full sort; no cartesian") {
    val plan = planOf(Search.bm25Search(Tables.documents(spark, sf)))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("tfidf plan: scalar attachment is a broadcast hash join, no cartesian/BNLJ") {
    val plan = planOf(Search.tfidfTop(Tables.documents(spark, sf)))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("hybridSearch: RRF fusion matches a driver recomputation; overlap outranks solo") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val out = graft.text.Search.hybridSearch(docs, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // recompute RRF from the two constituent oracle-gated rankings
    val text = graft.text.Search.bm25Search(docs).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    val vec = graft.sim.Similarity.bruteKnnCached(emb)
      .filter(org.apache.spark.sql.functions.col("query_id") === 0L).collect()
      .map(r => r.getLong(2) -> r.getInt(1).toLong).toMap
    val expect = (text.keySet ++ vec.keySet).map { id =>
      val tr = text.getOrElse(id, -1L); val vr = vec.getOrElse(id, -1L)
      val rrf = (if (tr > 0) 1000000L / (60L + tr) else 0L) +
        (if (vr > 0) 1000000L / (60L + vr) else 0L)
      id -> ((tr, vr, rrf))
    }.toMap
    assert(out.length === expect.size)
    out.foreach { case (_, id, tr, vr, rrf) =>
      assert(expect(id) === ((tr, vr, rrf)), s"doc $id")
    }
    // rank order follows (rrf desc, doc_id asc)
    val sorted = out.sortBy(r => (-r._5, r._2)).map(_._2)
    assert(out.sortBy(_._1).map(_._2).toSeq === sorted.toSeq)
  }
}
