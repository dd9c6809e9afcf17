package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val tau = 0.35

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val vecs: Map[Long, Seq[Double]] = emb
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
  private lazy val out = Dedup.semDedup(emb, tau = tau).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getBoolean(5)))

  test("semDedup: one row per vector, exactly one keep per duplicate group") {
    assert(out.length === vecs.size)
    out.groupBy(_._3).foreach { case (cid, rows) =>
      assert(rows.count(_._6) === 1, s"cluster $cid keeps")
      assert(rows.map(_._4).distinct.toSeq === Seq(rows.length.toLong), s"cluster $cid n_docs")
    }
  }

  test("semDedup: survivor is the LOWEST-centroid-cosine member (vec_id tie-break)") {
    out.groupBy(_._3).foreach { case (cid, rows) =>
      val want = rows.minBy(r => (r._5, r._1))._1
      assert(rows.find(_._6).get._1 === want, s"cluster $cid survivor")
    }
  }

  test("semDedup: duplicate groups never span cells; dropped members justified by a real pair") {
    out.groupBy(_._3).foreach { case (cid, rows) =>
      assert(rows.map(_._2).distinct.length === 1, s"cluster $cid spans cells")
      if (rows.length > 1) rows.foreach { r =>
        val others = rows.filter(_._1 != r._1)
        assert(others.exists(o => cosine(vecs(r._1), vecs(o._1)) >= tau - 1e-9),
          s"vec ${r._1} in cluster $cid has no within-cell partner >= tau")
      }
    }
  }

  test("semDedup: every pair missed vs the global brute graph is cross-cell") {
    val cellOf = out.map(r => r._1 -> r._2).toMap
    val clusterOf = out.map(r => r._1 -> r._3).toMap
    val ids = vecs.keys.toSeq.sorted
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (ids(i), ids(j))
      if (cosine(vecs(a), vecs(b)) >= tau && clusterOf(a) != clusterOf(b))
        assert(cellOf(a) != cellOf(b),
          s"within-cell pair ($a, $b) above tau not grouped")
    }
  }

  test("semDedupDisk: the persisted-index path is row-equal to the in-session dedup") {
    val viaDisk = Dedup.semDedupDisk(emb, tau = tau).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    val inSession = Dedup.semDedup(emb, tau = tau).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    assert(viaDisk.toSeq === inSession.toSeq)
  }
}
