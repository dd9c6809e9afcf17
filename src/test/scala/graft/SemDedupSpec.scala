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

  test("semDedupChunks: on a single-chunk corpus it IS doc-level semdedup (vec_id == doc_id)") {
    import spark.implicits._
    // truncate every doc to its first 20 tokens: ≤ stride (32) tokens
    // ⇒ exactly one chunk per doc, and the chunk embedding equals the
    // doc embedding (DocEmbedSpec); with the chunk-major vec_id
    // packing chunk_id·2^40 + doc_id, a single-chunk corpus packs to
    // vec_id == doc_id — so the chunk pipeline must reproduce the
    // doc-level pipeline's rows EXACTLY, not just isomorphically
    val short = Tables.documents(spark, sf)
      .withColumn("toks", graft.text.Text.tokens(col("text")))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"),
        concat_ws(" ", slice(col("toks"), 1, 20)).as("text"))
      .localCheckpoint()
    val chunkSide = graft.text.DocEmbed.semDedupChunks(short, tau = tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6)))
    assert(chunkSide.forall(_._2 == 0L), "every doc has exactly one chunk")
    val docVecs = graft.text.DocEmbed.docEmbed(short).select(
      col("doc_id").as("vec_id"),
      array((0 until graft.text.DocEmbed.dims)
        .map(j => col(s"e$j").cast("double")): _*).as("embedding"))
    val docSide = Dedup.semDedup(docVecs, tau = tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).sortBy(_._1)
    val mapped = chunkSide.map(t => (t._1, t._3, t._4, t._5, t._6, t._7)).sortBy(_._1)
    assert(mapped.length === docSide.length)
    mapped.zip(docSide).foreach { case (c, d) =>
      assert(c._1 === d._1 && c._2 === d._2 && c._3 === d._3 && c._4 === d._4 &&
        c._6 === d._6, s"doc ${c._1}: chunk-level row != doc-level row")
      // centroid_cos: two independent Lloyd trainings on the same
      // vectors — 6-dp-rounded values agree within one rounding step
      assert(math.abs(c._5 - d._5) <= 1e-6 + 1e-9, s"doc ${c._1} centroid_cos")
    }
  }

  test("semDedupChunks: a passage duplicated across different docs clusters at chunk level") {
    import spark.implicits._
    // two docs sharing their FIRST 64 tokens (one full chunk) with
    // distinct continuations, plus filler docs: doc-level embeddings
    // diverge but chunk 0 is bit-identical in both — the SemDeDup
    // passage case only the chunk operand can see
    val shared = (1 to 64).map(i => s"dup$i").mkString(" ")
    val tailA = (1 to 64).map(i => s"alpha$i").mkString(" ")
    val tailB = (1 to 64).map(i => s"beta$i").mkString(" ")
    val filler = (0 until 20).map(i =>
      (100L + i, (1 to 40).map(j => s"f${i}w$j").mkString(" ")))
    val docs = (Seq((1L, s"$shared $tailA"), (2L, s"$shared $tailB")) ++ filler)
      .toDF("doc_id", "text")
    val rows = graft.text.DocEmbed.semDedupChunks(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3), r.getBoolean(6)))
    val out = rows.map(t => t._1 -> ((t._2, t._3))).toMap
    val (c1, c2) = (out((1L, 0L)), out((2L, 0L)))
    assert(c1._1 === c2._1, "identical leading chunks share a cluster")
    // the cluster may also capture the half-shared chunk 1s (dup tail
    // + distinct continuation can clear tau); the structural claims:
    // one keeper per cluster, and the two IDENTICAL copies never both
    // keep — at least one duplicated-passage copy is dropped
    assert(rows.filter(_._2 == c1._1).count(_._3) === 1,
      "the shared-passage cluster keeps exactly one chunk")
    assert(!(c1._2 && c2._2), "identical passage copies never both keep")
  }

  test("oversized cells salt into bounded sub-cells: completes, over-keep bounded by splits") {
    import spark.implicits._
    // 9000 identical vectors: k-means collapses them into ONE cell at
    // any k (identical vectors cannot be split by centroids), which is
    // exactly the hot-cell shape that funneled the sf3 chunk corpus's
    // pair join into one task. 9000 rows over the 4096-row cap salt
    // into splits = 3 sub-cells (vec_id mod 3), so the join partition
    // is bounded; the documented cost is ONE keeper per sub-cell
    // instead of one overall — the min vec_id of each residue class.
    val n = 9000
    val vecs = (0 until n).map(i => (i.toLong, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDedup(vecs, nCells = 4, iters = 1, tau = 0.99)
      .select("vec_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out.size === n)
    val keepers = out.filter(_._2).keys.toSet
    assert(keepers === Set(0L, 1L, 2L),
      s"one keeper per sub-cell residue class, got $keepers")
  }

  test("groupedComponents equals the iterative clusters() on a group-keyed pair graph") {
    import spark.implicits._
    // randomized fixed-seed graph whose edges never cross a (g1, g2)
    // group — the semdedup emitter's invariant. The one-pass grouped
    // union-find must produce byte-identical labels to the global
    // label-propagation loop (the round-15 replacement's contract).
    val rnd = new scala.util.Random(20260819L)
    val pairs = (0 until 400).map { _ =>
      val g1 = rnd.nextInt(5).toLong
      val g2 = rnd.nextInt(3).toLong
      // node ids disjoint across groups (as vec_ids are: one cell each)
      val base = (g1 * 3 + g2) * 1000L
      val a = base + rnd.nextInt(40)
      val b = base + rnd.nextInt(40)
      (g1, g2, math.min(a, b), math.max(a, b))
    }.filter { case (_, _, a, b) => a != b }
      .toDF("cell", "subcell", "doc_a", "doc_b")
    val grouped = Dedup.groupedComponents(pairs, Seq("cell", "subcell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val iterative = Dedup.clusters(pairs.select("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(grouped === iterative)
  }
}
