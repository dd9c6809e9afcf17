package graft

import org.apache.spark.sql.functions._

import graft.text.DocEmbed

class DocEmbedSpec extends SparkSpec {
  import spark.implicits._

  private def md5h32(t: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  private def signs(t: String): Array[Long] = {
    val h = md5h32(t)
    Array.tabulate(DocEmbed.dims)(j => if (((h >> j) & 1L) == 1L) 1L else -1L)
  }

  test("docEmbed: hand-computed hash signs reproduce a two-token doc exactly") {
    val out = DocEmbed.docEmbed(
      Seq((1L, "alpha beta"), (2L, "alpha alpha")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val expect1 = signs("alpha").zip(signs("beta")).map { case (a, b) => a + b }
    val expect2 = signs("alpha").map(_ * 2L)
    assert(out(1L).getLong(1) === 2L)
    (0 until DocEmbed.dims).foreach { j =>
      assert(out(1L).getLong(2 + j) === expect1(j), s"doc 1 e$j")
      assert(out(2L).getLong(2 + j) === expect2(j), s"doc 2 e$j: multiplicity counts")
    }
  }

  test("docEmbed on the corpus: component bounds and parity invariants") {
    val corpus = Tables.documents(spark, sf)
    val out = DocEmbed.docEmbed(corpus).collect()
    assert(out.length === corpus.count())
    out.foreach { r =>
      val n = r.getLong(1)
      (0 until DocEmbed.dims).foreach { j =>
        val e = r.getLong(2 + j)
        assert(math.abs(e) <= n, s"|e$j| bounded by token count")
        assert(((e % 2 + 2) % 2) === (n % 2), s"e$j parity matches n_tokens")
      }
    }
  }

  test("derived vectors feed the vector family unchanged (brute kNN composability)") {
    val emb = DocEmbed.docEmbed(Tables.documents(spark, sf))
      .select(col("doc_id").as("vec_id"),
        array((0 until DocEmbed.dims).map(j => col(s"e$j").cast("float")): _*)
          .as("embedding"))
    val knn = graft.sim.Similarity.bruteKnn(emb, nQueries = 3, k = 5).collect()
    assert(knn.length === 15, "3 queries x top-5 over the derived vectors")
    knn.foreach(r => assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9))
  }

  test("chunkEmbed: chunk partition of the doc embedding; counts tie to q_chunk") {
    val corpus = Tables.documents(spark, sf)
    val ce = DocEmbed.chunkEmbed(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // chunk geometry matches q_chunk row for row
    val ch = graft.text.Corpus.chunk(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(ce.keySet === ch.keySet)
    ce.foreach { case (k, r) => assert(r.getLong(2) === ch(k), s"chunk $k length") }
    // at stride 32 / chunk 64 every token lands in exactly 2 chunks
    // except the first stride's tokens (1 chunk): summing chunk
    // embeddings double-counts interior tokens — verify on a planted
    // short doc where one chunk covers everything
    val one = DocEmbed.chunkEmbed(Seq((7L, "alpha beta")).toDF("doc_id", "text"))
      .collect()
    assert(one.length === 1)
    val doc = DocEmbed.docEmbed(Seq((7L, "alpha beta")).toDF("doc_id", "text")).head()
    (0 until DocEmbed.dims).foreach { j =>
      assert(one.head.getLong(3 + j) === doc.getLong(2 + j),
        s"single-chunk doc: chunk embedding == doc embedding at e$j")
    }
  }

  test("chunkSearch: top-k per query, self-doc excluded, cosine matches a driver recompute") {
    val corpus = Tables.documents(spark, sf)
    val out = DocEmbed.chunkSearch(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.length === 15, "3 queries x top-5")
    assert(out.forall(r => r._1 != r._3), "a query never retrieves its own chunks")
    out.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to 5L), s"query $q ranks")
      // ranks descend in cosine
      val byRank = rs.sortBy(_._2).map(_._5)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"query $q order")
    }
    // recompute one hit's cosine from the two embedding tables
    val chunks = DocEmbed.chunkEmbed(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (0 until DocEmbed.dims).map(j => r.getLong(3 + j)).toArray).toMap
    val queries = DocEmbed.docEmbed(corpus).collect()
      .map(r => r.getLong(0) ->
        (0 until DocEmbed.dims).map(j => r.getLong(2 + j)).toArray).toMap
    out.take(3).foreach { case (q, _, d, c, cos) =>
      val (qv, cv) = (queries(q), chunks((d, c)))
      val dot = qv.zip(cv).map { case (x, y) => x * y }.sum.toDouble
      val expect = dot / (math.sqrt(cv.map(x => x * x).sum.toDouble) *
        math.sqrt(qv.map(x => x * x).sum.toDouble))
      assert(math.abs(math.floor(expect * 1e6 + 0.5) / 1e6 - cos) < 1e-9, s"($q,$d,$c)")
    }
  }

  test("chunkSearchAnn: a planted sign-balanced (zero-norm) chunk neither crashes the IVF build nor retrieves") {
    // two tokens with COMPLEMENTARY sign vectors in all 8 dims —
    // (h(a) ^ h(b)) & 0xFF == 0xFF — make "a b" a single chunk whose
    // hash-kernel embedding is exactly the zero vector: the class that
    // crashed the round-12 sf0.1 bench (DIVIDE_BY_ZERO in the cell
    // assignment when the unfiltered chunk table fed the index build).
    val byLow = (0 until 4096).map(i => s"zz$i")
      .groupBy(t => (md5h32(t) & 0xFFL).toInt)
    val (ta, tb) = (0 until 256).iterator
      .flatMap(lo => for { as <- byLow.get(lo); bs <- byLow.get(lo ^ 0xFF) }
        yield (as.head, bs.head)).next()
    assert(((md5h32(ta) ^ md5h32(tb)) & 0xFFL) === 0xFFL, "tokens are sign-complementary")
    val planted = Seq((99991L, s"$ta $tb")).toDF("doc_id", "text")
    // the planted chunk really is zero-norm
    val pe = DocEmbed.chunkEmbed(planted).head()
    (0 until DocEmbed.dims).foreach(j => assert(pe.getLong(3 + j) === 0L, s"e$j zero"))
    val corpus = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .unionByName(planted)
    val ann = DocEmbed.chunkSearchAnn(corpus).collect() // must not throw
    assert(ann.nonEmpty, "ANN search still serves the nonzero corpus")
    assert(!ann.exists(_.getLong(2) == 99991L),
      "a zero-norm chunk has no direction — excluded from the index and every result")
  }

  test("chunkSearchAnn: recall floor vs the brute truth, exact re-scored cosines, contract") {
    val corpus = Tables.documents(spark, sf)
    def hits(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val brute = DocEmbed.chunkSearch(corpus).collect()
    val ann = DocEmbed.chunkSearchAnn(corpus).collect()
    // contract: same shape as the brute truth — per-query dense ranks,
    // self-doc excluded, cosine-descending
    assert(ann.forall(r => r.getLong(0) != r.getLong(2)),
      "a query never retrieves its own chunks")
    ann.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.length.toLong),
        s"query $q ranks dense")
      val byRank = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"query $q cosine order")
    }
    // recall@5 vs the exact scan — the SimilaritySpec IVF discipline
    val recall =
      hits(ann).intersect(hits(brute)).size.toDouble / hits(brute).size
    assert(recall >= 0.5, s"chunk ANN recall@5 $recall below floor")
    // the family invariant: cosines on SHARED hits are bit-identical
    // (exact re-score — only the candidate SET is approximate)
    val bruteCos = brute.map(r =>
      (r.getLong(0), r.getLong(2), r.getLong(3)) -> r.getDouble(4)).toMap
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(2), r.getLong(3))
      bruteCos.get(key).foreach(b =>
        assert(b === r.getDouble(4), s"cosine drift on shared hit $key"))
    }
    // plan: candidates come from the cell equi-join, never a cartesian
    val plan = DocEmbed.chunkSearchAnn(corpus).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "ANN path must stay equi-join-only")
  }

  test("chunkSearchMmr at lambda=1 IS the brute top-k (the redundancy charge vanishes)") {
    val corpus = Tables.documents(spark, sf)
    val brute = DocEmbed.chunkSearch(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    val mmr = DocEmbed.chunkSearchMmr(corpus, lambda = 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(mmr === brute, "rank-for-rank identity at lambda=1")
  }

  test("chunkSearchMmr equals a driver-side greedy replay; rank 1 is the brute rank 1") {
    val corpus = Tables.documents(spark, sf)
    val (nQ, k, kPool, lam) = (3, 5, 32, 0.7)
    // rebuild the candidate pools from the oracle-gated constituents
    val qvecs = DocEmbed.docEmbed(corpus).collect()
      .map(r => r.getLong(0) ->
        Array.tabulate(DocEmbed.dims)(j => r.getLong(2 + j)))
      .filter { case (id, v) => id < nQ && v.map(x => x * x).sum > 0 }
    val chunks = DocEmbed.chunkEmbed(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Array.tabulate(DocEmbed.dims)(j => r.getLong(3 + j))))
      .filter(_._3.map(x => x * x).sum > 0)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expect = qvecs.flatMap { case (q, qv) =>
      val qn = math.sqrt(qv.map(x => (x * x).toDouble).sum)
      val pool = chunks.filter(_._1 != q).map { case (d, c, ev) =>
        val nsq = ev.map(x => x * x).sum
        val cos = r6(ev.zip(qv).map { case (a, b) => (a * b).toDouble }.sum /
          (math.sqrt(nsq.toDouble) * qn))
        val uv = ev.map(_ / math.sqrt(nsq.toDouble))
        (d, c, cos, uv)
      }.sortBy(t => (-t._3, t._1, t._2)).take(kPool)
      val used = Array.fill(pool.length)(false)
      val picked = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      (1 to math.min(k, pool.length)).map { rank =>
        var bi = -1; var bs = Double.NegativeInfinity; var bm = 0.0
        pool.indices.foreach { i =>
          if (!used(i)) {
            var ms = 0.0
            picked.foreach { p =>
              val d = pool(i)._4.zip(p).map { case (a, b) => a * b }.sum
              if (d > ms) ms = d
            }
            val sc = lam * pool(i)._3 - (1.0 - lam) * ms
            if (sc > bs) { bi = i; bs = sc; bm = ms }
          }
        }
        used(bi) = true; picked += pool(bi)._4
        (q, rank.toLong, pool(bi)._1, pool(bi)._2, pool(bi)._3, r6(bm), r6(bs))
      }
    }.toSet
    val out = DocEmbed.chunkSearchMmr(corpus, nQ, k, kPool, lam).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSet
    assert(out === expect, "greedy MMR replay must match pick-for-pick")
    // rank 1 always equals the brute rank 1 (no redundancy charge yet)
    val brute1 = DocEmbed.chunkSearch(corpus).collect()
      .filter(_.getLong(1) == 1L).map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val mmr1 = out.filter(_._2 == 1L).map(t => (t._1, t._3, t._4))
    assert(mmr1 === brute1)
  }

  test("chunkSearchMmr diversifies: a planted duplicate pair cannot fill adjacent top slots") {
    // doc 0 is the query; docs 1 and 2 are identical (their chunks'
    // vectors coincide — pairwise sim 1.0); docs 3.. diverge. The
    // brute list ranks the twin copies back-to-back; MMR's redundancy
    // charge must push something diverse between or past the copy.
    // NOTE the embedding is a token-multiset hash kernel (order-blind):
    // only docs 1/2 share the query's token set, docs 3/4 share none
    val base = "spark line column order small sort fast value scan hash"
    val docs = Seq(
      (0L, base + " group batch"),
      (1L, base + " merge"), (2L, base + " merge"),
      (3L, "window row data table stream filter big key index cache"),
      (4L, "plan read write node disk shuffle join agg query the"))
      .toDF("doc_id", "text")
    val brute = DocEmbed.chunkSearch(docs, nQueries = 1, k = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (rank, doc_id)
    val mmr = DocEmbed.chunkSearchMmr(docs, nQueries = 1, k = 4, kPool = 8,
      lambda = 0.5).collect().map(r => (r.getLong(1), r.getLong(2)))
    // precondition (self-validating planting): the twins hold brute
    // ranks 1 and 2
    assert(brute.sortBy(_._1).take(2).map(_._2).toSet === Set(1L, 2L),
      s"planting broken: brute head is ${brute.toSeq}")
    // MMR must NOT place the second twin at rank 2 — the sim-1.0
    // charge (0.5 * 1.0) exceeds any relevance edge it has
    val mmrRank2 = mmr.find(_._1 == 2L).get._2
    assert(mmrRank2 !== (if (mmr.find(_._1 == 1L).get._2 == 1L) 2L else 1L),
      s"twin pair filled adjacent MMR slots: ${mmr.toSeq}")
  }
}
