package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toSeq.toDF("doc_id", "text")

  /** Driver-side brute-force truth: all-pairs exact Jaccard over the
    * hashed shingle sets — the reference computation every exactness
    * test compares against.
    */
  private def bruteJaccardPairs(df: org.apache.spark.sql.DataFrame, tau: Double): Set[(Long, Long)] = {
    val sets = Dedup.hashedShingleSets(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a < b
      inter = (sa & sb).size.toDouble
      jac = inter / (sa.size + sb.size - inter)
      if jac >= tau
    } yield (a, b)).toSet
  }

  test("exact dedup groups identical texts and keeps the minimum id") {
    val out = Dedup.exact(docs(7L -> "same text", 3L -> "same text", 9L -> "other"))
      .orderBy("keep_id").collect()
    assert(out.length === 2)
    val dupGroup = out.find(_.getLong(1) === 2L).get
    assert(dupGroup.getLong(2) === 3L) // keep_id = min(3, 7)
  }

  test("ngram pairs find the planted near-dups, all above threshold") {
    val pairs = Dedup.ngramPairs(Tables.documents(spark, sf)).cache()
    val n = pairs.count()
    assert(n > 0, "expected planted near-dup pairs in testdata")
    assert(pairs.filter(col("jaccard") < 0.5).count() === 0)
    assert(pairs.filter(col("doc_a") >= col("doc_b")).count() === 0)
  }

  test("pairsCached: semantically-equal reads share ONE materialized pair graph; values match ngramPairs") {
    // two INDEPENDENT reads of the same parquet dir must key to the
    // same memo entry (canonicalized-plan equality across fresh
    // spark.read calls — the property the whole seam rests on)
    val a = Dedup.pairsCached(Tables.documents(spark, sf))
    val b = Dedup.pairsCached(Tables.documents(spark, sf))
    assert(a eq b, "fresh reads of the same dir must share the memoized graph")
    // a different tau keys separately
    val c = Dedup.pairsCached(Tables.documents(spark, sf), tau = 0.7)
    assert(!(a eq c))
    // and the memoized values are exactly ngramPairs'
    val direct = Dedup.ngramPairs(Tables.documents(spark, sf)).collect().map(_.toSeq).toSet
    assert(a.collect().map(_.toSeq).toSet === direct)
    // a genuinely different corpus must NOT collide with the memo
    val other = Dedup.pairsCached(docs(1L -> "alpha beta gamma delta", 2L -> "unrelated words here now"))
    assert(!(other eq a))
  }

  test("prefix-filtered ngram pairs stay exact under an adversarial stop-phrase corpus") {
    // every document shares a stop-phrase (ultra-frequent shingles, the
    // Σ df² blowup case); the prefix filter must drop it from the index
    // without losing the planted near-dup pair
    val stop = "alpha beta gamma delta epsilon"
    val corpus = (0 until 60).map(i =>
      (i.toLong, s"$stop unique$i filler$i token$i more$i words$i here$i")) ++
      Seq((100L, s"$stop common tail one two three four five six seven eight nine"),
          (101L, s"$stop common tail one two three four five six seven eight ten"))
    val df = corpus.toDF("doc_id", "text")
    val expected = bruteJaccardPairs(df, 0.5)
    assert(expected.nonEmpty, "the adversarial corpus must contain a planted pair")
    val got = Dedup.ngramPairs(df).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("ngramPairs is lossless at a non-dyadic tau on real data") {
    val corpus = Tables.documents(spark, sf).limit(200)
    val tau = 0.55
    val truth = bruteJaccardPairs(corpus, tau)
    val got = Dedup.ngramPairs(corpus, tau).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === truth)
    assert(truth.nonEmpty, "test corpus must contain at least one qualifying pair")
  }

  test("ngramPairs survives the exact FP ceil boundary (0.55*100 = 55.00000000000001)") {
    // CONSTRUCTED boundary: doc A = 102 distinct tokens -> 100 distinct
    // shingles; doc B = A's last 57 tokens -> its 55 shingles are a
    // subset of A's. jac = 55/100 = 0.55 exactly, and the minimal
    // intersection bound is ceil(0.55*100) = 55 in real arithmetic —
    // but 0.55*100 = 55.00000000000001 in doubles, so BOTH the naive
    // size-ratio filter (55 >= 55.000…01 false) and the naive prefix
    // bound (ceil -> 56, one slot short of the first shared shingle in
    // df order) silently drop this qualifying pair. The n=20 sf0.001
    // corpus never reaches n=100, so only this construction pins the
    // epsilon fix.
    val aTokens = (0 until 102).map(i => s"tok$i")
    val bTokens = aTokens.takeRight(57)
    val df = docs(1L -> aTokens.mkString(" "), 2L -> bTokens.mkString(" "))
    val tau = 0.55
    assert(bruteJaccardPairs(df, tau) === Set((1L, 2L)))
    val got = Dedup.ngramPairs(df, tau).collect()
    assert(got.length === 1, "the boundary pair must be found")
    assert(got.head.getLong(0) === 1L && got.head.getLong(1) === 2L)
    assert(got.head.getDouble(2) === 0.55)
  }

  /** Driver-side brute directional containment truth. */
  private def bruteContainmentPairs(
      df: org.apache.spark.sql.DataFrame, tau: Double): Map[(Long, Long), Double] = {
    val sets = Dedup.hashedShingleSets(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    (for {
      (a, sa) <- sets.toSeq if sa.nonEmpty
      (b, sb) <- sets.toSeq if a != b
      cont = (sa & sb).size.toDouble / sa.size
      if cont >= tau
    } yield (a, b) -> math.floor(cont * 1e6 + 0.5) / 1e6).toMap
  }

  test("containmentPairs: a short doc inside a long one is found where Jaccard is blind") {
    val short = (1 to 6).map(i => s"q$i").mkString(" ")              // 4 shingles
    val long = short + " " + (1 to 12).map(i => s"r$i").mkString(" ") // 16 shingles, A's ⊂ B's
    val df = docs(1L -> short, 2L -> long, 3L -> "entirely unrelated text body here")
    val got = Dedup.containmentPairs(df, tau = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // A fully contained in B; the reverse direction is 4/16 = 0.25
    assert(got === Map((1L, 2L) -> 1.0))
    // ...and the symmetric Jaccard query misses the pair entirely at
    // its default tau (jac = 4/16 = 0.25) — the operator's reason to exist
    assert(bruteJaccardPairs(df, 0.5) === Set.empty)
    // exact twins contain each other: both directions emitted
    val twins = docs(1L -> "one two three four five six", 2L -> "one two three four five six")
    val both = Dedup.containmentPairs(twins, tau = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(both === Set((1L, 2L), (2L, 1L)))
  }

  test("containmentPairs equals the brute directional truth on real data, cartesian-free") {
    val corpus = Tables.documents(spark, sf).limit(200)
    val tau = 0.75
    val truth = bruteContainmentPairs(corpus, tau)
    assert(truth.nonEmpty, "test corpus must contain at least one qualifying directional pair")
    val got = Dedup.containmentPairs(corpus, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got === truth)
    val plan = planOf(Dedup.containmentPairs(corpus, tau))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("clusters: hand-built components resolve to min-id labels") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("clusters: a 64-node path converges (pointer jumping, O(log diameter) rounds)") {
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(chain, maxIters = 10).collect()
    assert(got.length === 64)
    assert(got.forall(_.getLong(1) === 0L))
  }

  test("clusters throws on iteration exhaustion instead of returning wrong labels") {
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // pin the contraction width: the adaptive sizing collapses a
    // spec-scale graph into one union-find task (no iterative rounds
    // left to exhaust), so the guard needs the chain kept spread
    assertThrows[IllegalStateException](
      Dedup.clusters(chain, maxIters = 1, contractWidth = Some(8)))
  }

  test("clusters on real near-dup pairs: endpoints co-labelled, keeper is the min member") {
    val pairs = Dedup.ngramPairs(Tables.documents(spark, sf))
      .select("doc_a", "doc_b").cache()
    val labels = Dedup.clustersQuery(Tables.documents(spark, sf)).cache()
    val lab = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every pair's endpoints are in the same cluster
    assert(pairs.collect().forall(r => lab(r.getLong(0)) === lab(r.getLong(1))))
    // cluster_id is a member of its own cluster and the minimum one
    val byCluster = lab.groupBy(_._2).view.mapValues(_.keys.min).toMap
    assert(byCluster.forall { case (cid, minMember) => cid === minMember })
  }

  test("bestSurvivors keeps the highest-quality member of every cluster") {
    val docs = Tables.documents(spark, sf)
    val best = graft.dedup.Dedup.bestSurvivors(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val labels = Dedup.clustersQuery(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = graft.text.Text.quality(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(best.keySet === labels.values.toSet)
    labels.groupBy(_._2).foreach { case (cid, members) =>
      val ids = members.keys.toSeq
      // brute winner: max quality, then min doc_id
      val winner = ids.maxBy(id => (quality(id), -id))
      val (nDocs, keepId, keepScore) = best(cid)
      assert(nDocs === ids.size.toLong, s"cluster $cid size")
      assert(keepId === winner, s"cluster $cid keeper")
      assert(keepScore === quality(winner))
      // the quality keeper can differ from the min-id keeper — that is
      // the point; both must be members
      assert(ids.contains(keepId))
    }
  }

  test("minhash LSH agrees with the exact ngram path at tau=0.5") {
    val exact = Dedup.ngramPairs(Tables.documents(spark, sf))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(Tables.documents(spark, sf))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision is exact (candidates re-verified); recall should be
    // total at jaccard ~0.95+ with 8 bands of 4
    assert(lsh.subsetOf(exact))
    assert(lsh === exact)
  }

  test("minhash LSH plan is cartesian-free (the 100-TB promise)") {
    val plan = planOf(Dedup.minhashLshPairs(Tables.documents(spark, sf)))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("simhash: identical docs collide at distance 0; pairs respect maxHamming") {
    val out = Dedup.simhashPairs(docs(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta"))
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(2) === 0L)
    val real = Dedup.simhashPairs(Tables.documents(spark, sf))
    assert(real.filter(col("hamming") > 3).count() === 0)
  }

  test("simhash plan is cartesian-free") {
    val plan = planOf(Dedup.simhashPairs(Tables.documents(spark, sf)))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("LSH-blocked embedding pairs: subset of brute with usable recall, cartesian-free") {
    val brute = Dedup.embeddingPairs(Tables.embeddings(spark, sf))
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshDf = Dedup.embeddingPairsLsh(Tables.embeddings(spark, sf))
    val lsh = lshDf.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "exact re-scoring means precision 1")
    assert(lsh.size.toDouble / brute.size >= 0.25, s"recall ${lsh.size.toDouble / brute.size}")
    val plan = planOf(lshDf)
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("embedding pairs are symmetric-free and above threshold") {
    val pairs = Dedup.embeddingPairs(Tables.embeddings(spark, sf)).cache()
    assert(pairs.count() > 0)
    assert(pairs.filter(col("cosine") < 0.35).count() === 0)
    assert(pairs.filter(col("vec_a") >= col("vec_b")).count() === 0)
  }

  test("contamination: a train doc sharing an eval shingle is flagged, unrelated docs are not") {
    import spark.implicits._
    // doc 0 is the eval slice (0 % 50 == 0); doc 1 embeds one of its
    // 3-gram shingles ("quick brown fox"); doc 2 shares nothing
    val docs = Seq(
      (0L, "the quick brown fox jumps high"),
      (1L, "they saw a quick brown fox running away from the farm"),
      (2L, "completely unrelated words in this document entirely"))
      .toDF("doc_id", "text")
    val got = Dedup.contamination(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L))
    assert(got(1L) === 1L) // exactly the one shared shingle
  }

  test("decontaminate partitions the training slice: kept + contaminated, no eval ids") {
    val docs = Tables.documents(spark, sf)
    val kept = Dedup.decontaminate(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val flagged = Dedup.contamination(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val train = docs.filter(col("doc_id") % 50 =!= 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.intersect(flagged).isEmpty)
    assert(kept.union(flagged) === train)
    assert(kept.forall(_ % 50 != 0))
  }

  test("contamination plan broadcasts the eval shingle set (corpus never shuffles by shingle)") {
    val plan = planOf(Dedup.contamination(Tables.documents(spark, sf)))
    assert(plan.contains("BroadcastHashJoin"), s"expected eval-side broadcast:\n$plan")
  }

  test("dedupEval: monotone recall along both sweeps, precision-1 minhash levels, sane floors") {
    val docs = Tables.documents(spark, sf)
    val rows = Dedup.dedupEval(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val nExact = Dedup.pairsCached(docs).count()
    assert(rows.forall(_._3 === nExact), "n_exact must equal the exact pair-set size on every row")
    assert(rows.forall { case (_, _, _, n, rec) => n >= 0 && rec >= 0.0 && rec <= 1.0 })
    def recalls(method: String): Seq[(Long, Double)] =
      rows.filter(_._1 == method).sortBy(_._2).map(r => (r._2, r._5)).toSeq
    val mh = recalls("minhash")
    val sh = recalls("simhash")
    assert(mh.map(_._1) === Seq(2L, 4L, 8L, 16L))
    assert(sh.map(_._1) === Seq(0L, 1L, 2L, 3L))
    assert(mh.map(_._2).sliding(2).forall { case Seq(a, b) => b >= a - 1e-12 },
      s"minhash recall must be monotone in bands: $mh")
    assert(sh.map(_._2).sliding(2).forall { case Seq(a, b) => b >= a - 1e-12 },
      s"simhash recall must be monotone in hamming: $sh")
    // the finest minhash level must agree with the standalone LSH path
    // at the same (numHashes=32, bands=16... note: the standalone uses
    // 8 bands) — floor instead: the 16-band level dominates the
    // 8-band level, which IS the standalone operating point
    val lshPairs = Dedup.minhashLshPairs(docs).count()
    val mh8 = mh.find(_._1 == 8L).get._2
    assert(math.abs(mh8 - lshPairs.toDouble / math.max(nExact, 1L)) < 1e-6,
      "the 8-band sweep level must equal the standalone minhashLshPairs operating point")
    assert(mh.last._2 >= mh8 - 1e-12)
    // the r9 cross-check column: non-null ONLY on the (minhash, 8)
    // row, where it must equal both n_pairs and the standalone count;
    // and the r9 cost column: candidates monotone in level, >= pairs
    val withCc = Dedup.dedupEval(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    withCc.foreach { case (method, level, nPairs, nCands, cc) =>
      assert(nCands >= nPairs, s"$method/$level cands $nCands < verified pairs $nPairs")
      if (method == "minhash" && level == 8L) {
        assert(cc === Some(nPairs), "cross-check must equal the sweep's own 8-band count")
        assert(cc === Some(lshPairs), "cross-check must equal the standalone pair count")
      } else assert(cc.isEmpty, s"n_standalone must be null off the operating point: $method/$level")
    }
    def candsOf(method: String) =
      withCc.filter(_._1 == method).sortBy(_._2).map(_._4).toSeq
    for (m <- Seq("minhash", "simhash"))
      assert(candsOf(m).sliding(2).forall { case Seq(a, b) => b >= a; case _ => true },
        s"$m n_cands must be monotone in level: ${candsOf(m)}")
  }

  test("shingle/signature/simhash tables derive once across the dedup family (setsCached/sigsCached/simhashCached)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k m"),
      (3L, "completely different words here to make another doc"),
      (4L, "completely different words here to make another doc too")).toDF("doc_id", "text")
    // first consumer of each seam pays; the rest must be memo hits.
    val m0 = Memo.missCount
    Dedup.minhashLshPairs(docs).collect() // pays sets + sigs
    val afterMinhash = Memo.missCount
    assert(afterMinhash - m0 >= 2L, "minhash must pay the shingle-set and signature seams")
    Dedup.simhashPairs(docs).collect() // pays the simhash fingerprint table
    val afterSimhash = Memo.missCount
    assert(afterSimhash - afterMinhash === 1L,
      "simhash must pay exactly its own fingerprint seam (shingle scan already shared)")
    // the audit composes ALL the seams + pairsCached; it must add only
    // the pair-graph materialization, never re-derive sets/sigs/simhash
    Dedup.dedupEval(docs).collect()
    val afterEval = Memo.missCount
    assert(afterEval - afterSimhash === 1L,
      "dedupEval must hit the shared seams and pay only pairsCached")
    // and the ngram path reads the same shingle-set memo (already paid)
    Dedup.ngramPairs(docs).collect()
    assert(Memo.missCount === afterEval,
      "ngramPairs must reuse the family's shingle-set materialization")
    // the incremental screen reads the SAME seam for BOTH its screens
    // (the md5 content hash rides setsCached) and pays exactly TWO new
    // materializations: the store's df table (a store-side property,
    // one per store per session) and the shared intersection-counts
    // table
    Dedup.incrementalDedup(docs, batchMod = 2).collect()
    val afterIncr = Memo.missCount
    assert(afterIncr - afterEval === 2L,
      "incrementalDedup must pay only the store-df and shared counts seams over setsCached")
    // a repeat hits the counts memo outright
    Dedup.incrementalDedup(docs, batchMod = 2).collect()
    assert(Memo.missCount === afterIncr,
      "repeated incrementalDedup must hit the counts memo")
    // the full ingest decision's store AND containment screens ride
    // the SAME counts entry (alpha = min(tau, tauContain) = tau here);
    // its batch self-screen pays the family's ONE self-counts seam
    Dedup.ingestDecision(docs, batchMod = 2).collect()
    val afterIngest = Memo.missCount
    assert(afterIngest - afterIncr === 1L,
      "ingestDecision's store-facing screens must share incrementalDedup's counts entry, " +
        "adding only the batch self-screen's counts seam")
    // batchDedup runs the identical self-screen — a pure memo hit
    Dedup.batchDedup(docs, batchMod = 2).collect()
    assert(Memo.missCount === afterIngest,
      "batchDedup must hit the self-counts entry ingestDecision materialized")
    // and the containment screen probes at the family alpha floor, so
    // it rides the SAME store-facing counts entry too
    Dedup.containedIncremental(docs, batchMod = 2).collect()
    assert(Memo.missCount === afterIngest,
      "containedIncremental must share the family's store-facing counts entry")
  }

  test("incrementalDedup: hand-built batch vs existing — exact twin, near-dup, unique, batch-internal ignored") {
    import spark.implicits._
    // batchMod=10: docs 0,10,20,30 are the batch; 1..9 the existing.
    // doc 0  = exact twin of existing doc 1 (identical text)
    // doc 10 = near-dup of existing doc 2 (9/11 shingles shared)
    // doc 20 = unique -> keep
    // doc 30 = near-dup of BATCH doc 20 only -> still keep (contract:
    //          the screen is against the existing store, not the batch)
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, shared),
      (3L, "completely different existing content words here for padding"),
      (10L, shared + " extra tail"),
      (20L, "unique batch content nothing like anything in the store at all"),
      (30L, "unique batch content nothing like anything in the store at all really")).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(docs, batchMod = 10, tau = 0.5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === Set(0L, 10L, 20L, 30L))
    assert(got(0L)._1 === 1L, "identical text must flag exact")
    assert(got(0L)._2 >= 1L && got(0L)._3 === 0L, "an exact twin is also a near-dup; not kept")
    assert(got(10L) === ((0L, 1L, 0L)), "near-dup of existing doc 2 only")
    assert(got(20L) === ((0L, 0L, 1L)), "unique batch doc keeps")
    assert(got(30L) === ((0L, 0L, 1L)), "batch-internal near-dup must NOT flag")
  }

  test("screen candidates: a corpus-wide boilerplate shingle does NOT fan the candidate join out to batch x store") {
    import spark.implicits._
    // every doc = 10 tokens unique to it + the SAME 5-token boilerplate
    // footer (every real crawl has one). Under the round-14
    // unrestricted count-join the footer's posting list alone joins
    // every batch doc to every store doc (|batch| x |store| aggregate
    // input rows); under the df-ordered prefix the footer shingles
    // carry MAXIMAL df, sort last in every doc's order, and never
    // probe — candidates must be exactly the planted near-dup pair.
    val footer = "visit the common footer boilerplate"
    val base = (0L until 60L).map(i =>
      (i, (0 until 10).map(j => s"w${i}x$j").mkString(" ") + " " + footer))
    // batch doc 20 is a verbatim copy of store doc 7 (the one true pair)
    val planted = base.map { case (i, t) =>
      if (i == 20L) (i, base.find(_._1 == 7L).get._2) else (i, t)
    }
    val docsDf = planted.toDF("doc_id", "text")
    val sets = Dedup.setsCached(docsDf)
    val isBatch = pmod(col("doc_id"), lit(10L)) === 0
    val exIndex = sets.filter(!isBatch)
      .select(col("doc_id").as("ex_id"), explode(col("sh")).as("h"))
    val cands = Dedup.screenCandidates(sets.filter(isBatch), exIndex, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cands.toSet === Set((20L, 7L)),
      s"boilerplate must stay out of every prefix: got ${cands.length} candidate pairs " +
        s"(|batch| x |store| would be ${6 * 54})")
    // and the verdicts with the plant are still exact: 20 is the only
    // non-keeper in the batch (exact twin of 7), everything else keeps
    val got = Dedup.incrementalDedup(docsDf, batchMod = 10, tau = 0.5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(20L) === ((1L, 1L, 0L)), "planted twin must flag exact + near and drop")
    assert(got.filter(_._1 != 20L).values.forall(_ == ((0L, 0L, 1L))),
      "boilerplate alone must never flag a batch doc")
  }

  test("incrementalDedup: one-sided prefix probe equals the brute cross comparison on a fixed-seed corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("red", "blue", "green", "stone", "river", "cloud", "iron", "wolf",
      "amber", "pine", "salt", "storm", "ember", "frost", "moss", "raven")
    def doc(): String = Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0L until 60L).map(i => (i, doc()))
    // plant near-dups across the slice boundary: batch ids are %10==0
    val planted = base.map {
      case (i, t) if i == 20L => (i, base.find(_._1 == 7L).get._2 + " tail")
      case (i, t) if i == 40L => (i, base.find(_._1 == 13L).get._2)
      case x => x
    }
    val docs = planted.toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(docs, batchMod = 10, tau = 0.5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // driver-side brute: shingle sets per doc, batch x existing
    def shingles(t: String): Set[Seq[String]] = {
      val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length < 3) Set(toks) else toks.sliding(3).map(_.toSeq).toSet
    }
    val sets = planted.map { case (i, t) => i -> shingles(t) }.toMap
    val texts = planted.toMap
    val (batch, existing) = planted.map(_._1).partition(_ % 10 == 0)
    batch.foreach { b =>
      val nNear = existing.count { e =>
        val (a, c) = (sets(b), sets(e))
        val inter = a.intersect(c).size.toDouble
        inter / (a.size + c.size - inter) >= 0.5
      }
      val isExact = existing.exists(e => texts(e) == texts(b))
      val (ge, gn, gk) = got(b)
      assert(ge === (if (isExact) 1L else 0L), s"doc $b exact flag")
      assert(gn === nNear.toLong, s"doc $b near count")
      assert(gk === (if (!isExact && nNear == 0) 1L else 0L), s"doc $b keep flag")
    }
  }

  test("batchDedup: first-wins within the batch — hand-built clusters") {
    import spark.implicits._
    // batchMod=10: docs 0,10,20,30,40 are the batch; existing docs are
    // present but must be IGNORED by this screen.
    // doc 0  = first of an exact-twin pair (0,20) -> kept
    // doc 10 = near-dup of BATCH doc 0 (shared prefix + tail) -> dropped
    // doc 20 = exact twin of EARLIER batch doc 0 -> dropped
    // doc 30 = unique in the batch (its twin doc 3 is existing) -> kept
    // doc 40 = unique -> kept
    val base = "the quick brown fox jumps over the lazy dog again and again and again"
    val docs = Seq(
      (0L, base),
      (3L, "an existing twin of a batch doc should not matter here at all"),
      (5L, base), // existing exact twin of doc 0: ignored by this screen
      (10L, base + " with a small tail"),
      (20L, base),
      (30L, "an existing twin of a batch doc should not matter here at all"),
      (40L, "completely unrelated batch content nothing shared with anyone")).toDF("doc_id", "text")
    val got = Dedup.batchDedup(docs, batchMod = 10, tau = 0.5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === Set(0L, 10L, 20L, 30L, 40L))
    assert(got(0L) === ((0L, 0L, 1L)), "first member of the cluster is kept")
    assert(got(10L)._2 >= 1L && got(10L)._3 === 0L, "near-dup of earlier batch doc 0")
    assert(got(20L)._1 === 1L && got(20L)._3 === 0L, "exact twin of earlier batch doc 0")
    assert(got(30L) === ((0L, 0L, 1L)), "existing-store twins are out of this screen's scope")
    assert(got(40L) === ((0L, 0L, 1L)), "unique batch doc keeps")
  }

  test("batchDedup: prefix probe equals the brute earlier-only cross comparison on a fixed-seed corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(4321)
    val vocab = Vector("red", "blue", "green", "stone", "river", "cloud", "iron", "wolf",
      "amber", "pine", "salt", "storm", "ember", "frost", "moss", "raven")
    def doc(): String = Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0L until 60L).map(i => (i, doc()))
    // plant batch-internal dups (ids %10==0): 30 near-dups 10, 50 == 20
    val planted = base.map {
      case (i, _) if i == 30L => (i, base.find(_._1 == 10L).get._2 + " tail")
      case (i, _) if i == 50L => (i, base.find(_._1 == 20L).get._2)
      case x => x
    }
    val docs = planted.toDF("doc_id", "text")
    val got = Dedup.batchDedup(docs, batchMod = 10, tau = 0.5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def shingles(t: String): Set[Seq[String]] = {
      val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length < 3) Set(toks) else toks.sliding(3).map(_.toSeq).toSet
    }
    val sets = planted.map { case (i, t) => i -> shingles(t) }.toMap
    val texts = planted.toMap
    val batch = planted.map(_._1).filter(_ % 10 == 0)
    batch.foreach { b =>
      val earlier = batch.filter(_ < b)
      val nNear = earlier.count { e =>
        val (a, c) = (sets(b), sets(e))
        val inter = a.intersect(c).size.toDouble
        inter / (a.size + c.size - inter) >= 0.5
      }
      val isExact = earlier.exists(e => texts(e) == texts(b))
      val (ge, gn, gk) = got(b)
      assert(ge === (if (isExact) 1L else 0L), s"doc $b exact flag")
      assert(gn === nNear.toLong, s"doc $b near count")
      assert(gk === (if (!isExact && nNear == 0) 1L else 0L), s"doc $b keep flag")
    }
  }

  test("ingestDecision: the conjunction of the three screens, on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val store = Dedup.incrementalDedup(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val intra = Dedup.batchDedup(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val contain = Dedup.containedIncremental(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = Dedup.ingestDecision(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === store.keySet && got.keySet === intra.keySet)
    assert(got.keySet === contain.keySet)
    got.foreach { case (id, (sk, bk, ck, k)) =>
      assert(sk === store(id), s"doc $id store verdict")
      assert(bk === intra(id), s"doc $id batch verdict")
      assert(ck === contain(id), s"doc $id containment verdict")
      assert(k === sk * bk * ck, s"doc $id conjunction")
    }
    // the screens must actually bite somewhere for the test to mean
    // anything (the sf corpus plants both kinds of duplicates)
    assert(got.values.exists(_._1 == 0L), "store screen never fired")
    assert(got.values.exists(v => v._4 == 0L), "no doc was dropped at all")
  }

  test("embedIncremental: brute cross-slice agreement and the broadcast-batch plan shape") {
    val emb = Tables.embeddings(spark, sf)
    val got = Dedup.embedIncremental(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // driver-side brute cross-slice recomputation
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val (batch, existing) = vecs.keys.toSeq.partition(_ % 10 == 0)
    assert(got.keySet === batch.toSet)
    batch.foreach { b =>
      val n = existing.count(e => cos(vecs(b), vecs(e)) >= 0.35)
      assert(got(b)._1 === n.toLong, s"vec $b near count")
      assert(got(b)._2 === (if (n == 0) 1L else 0L), s"vec $b keep")
    }
    // the scale claim: the batch side broadcasts (one map-side pass
    // over the existing scan), and nothing shuffles the corpus into
    // an n² pair materialization
    val plan = planOf(Dedup.embedIncremental(emb))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"batch side must broadcast:\n$plan")
  }

  test("embedIncremental useLsh: never over-counts vs brute, usable recall, BNLJ-free plan") {
    val emb = Tables.embeddings(spark, sf)
    val brute = Dedup.embedIncremental(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lshDf = Dedup.embedIncremental(emb, useLsh = true)
    val lsh = lshDf.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // same batch coverage, and exact re-scoring means the LSH counts
    // are a per-doc LOWER bound on brute (precision 1: candidates are
    // a subset of the true near-dup set)
    assert(lsh.keySet === brute.keySet)
    lsh.foreach { case (id, (n, keep)) =>
      assert(n <= brute(id), s"vec $id: lsh $n > brute ${brute(id)}")
      assert(keep === (if (n == 0) 1L else 0L), s"vec $id keep flag")
    }
    val (bruteTotal, lshTotal) = (brute.values.sum, lsh.values.map(_._1).sum)
    assert(bruteTotal > 0, "gate needs near-dups to exist at this sf")
    assert(lshTotal.toDouble / bruteTotal >= 0.25,
      s"recall ${lshTotal.toDouble / bruteTotal}")
    // the scale claim that distinguishes this path from the brute
    // screen: candidates come from a bucket EQUI-join (broadcast hash),
    // never a nested loop or cartesian
    val plan = planOf(lshDf)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("span-window table derives once per (corpus, k): spans + scrub + report share the memo") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "z z a b c d e f"),
      (3L, "too short")).toDF("doc_id", "text")
    val m0 = Memo.missCount
    Dedup.dupSpans(docs, k = 4).collect()
    val afterFirst = Memo.missCount
    assert(afterFirst - m0 >= 1L, "the first span query must pay the window-table derivation")
    Dedup.dupSpanScrub(docs, k = 4).collect()
    Dedup.dupSpanReport(docs, k = 4).collect()
    assert(Memo.missCount === afterFirst,
      "scrub/report must hit the shared span-window memo, not re-derive the tokenize+explode scan")
    // a different k keys separately
    Dedup.dupSpans(docs, k = 5).collect()
    assert(Memo.missCount === afterFirst + 1L)
  }

  test("dupSpans: hand-built docs pin window counts, cross-doc-only duplication, short-doc exclusion") {
    import spark.implicits._
    // k=4. doc 1: 6 tokens -> 3 windows; doc 2 shares doc 1's full
    // last-4 span "c d e f" (1 of its 4 windows; its own tail spans
    // are unique). doc 3 repeats a span WITHIN itself only -> not
    // duplicated (cross-doc rule). doc 4: 3 tokens -> no windows row.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x c d e f y z"),
      (3L, "p q r s p q r s"),
      (4L, "u v w"))
      .toDF("doc_id", "text")
    val got = Dedup.dupSpans(docs, k = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === ((3L, 1L, 0.333333))) // only "c d e f" is shared
    assert(got(2L) === ((4L, 1L, 0.25)))
    assert(got(3L) === ((5L, 0L, 0.0))) // within-doc repeat is NOT a dup span
    // real data: the planted near-dup docs must surface long shared
    // spans, and fractions stay in [0, 1] with counts consistent
    val real = Dedup.dupSpans(Tables.documents(spark, sf)).collect()
    assert(real.nonEmpty)
    assert(real.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(real.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    assert(real.exists(_.getLong(2) > 0), "expected planted near-dups to share >=10-token spans")
    // docs in a ngram near-dup pair at high tau share most content ->
    // their dup fraction should be substantial
    val pairDocs = Dedup.ngramPairs(Tables.documents(spark, sf), 0.5)
      .select("doc_a", "doc_b").collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    if (pairDocs.nonEmpty) {
      val byId = real.map(r => r.getLong(0) -> r.getDouble(3)).toMap
      val fracs = pairDocs.toSeq.flatMap(byId.get)
      assert(fracs.nonEmpty && fracs.max > 0.3, s"near-dup docs dup fractions: ${fracs.sorted.reverse.take(5)}")
    }
  }

  test("dupSpanScrub: owner keeps the span, non-owners lose exactly the covered tokens") {
    import spark.implicits._
    // k=4: doc 1 owns "c d e f" (lowest id containing it); doc 2 loses
    // tokens 2..5 ("c d e f") and keeps "x y z"; doc 5 (all tokens
    // covered) scrubs to empty
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x c d e f y z"),
      (5L, "c d e f"))
      .toDF("doc_id", "text")
    val got = Dedup.dupSpanScrub(docs, k = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) === ((6L, 0L, md5("a b c d e f")))) // owner untouched
    assert(got(2L) === ((7L, 4L, md5("x y z"))))
    assert(got(5L) === ((4L, 4L, md5(""))))
    // all docs present, incl. ones below the window size
    val withShort = docs.union(Seq((9L, "u v")).toDF("doc_id", "text"))
    val all = Dedup.dupSpanScrub(withShort, k = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(all.keySet === Set(1L, 2L, 5L, 9L) && all(9L) === 0L)
  }

  test("decontaminateSpans: eval-overlapping windows cut with NO owner rule; clean docs untouched") {
    import spark.implicits._
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // evalMod=50 ⇒ doc 100 is the eval slice; k=3
    val docs = Seq(
      (100L, "secret bench question alpha beta"),          // eval
      (1L, "intro words secret bench question tail part"), // quotes it
      (2L, "completely unrelated text here now"),          // clean
      (3L, "secret bench question"),                       // IS the benchmark line
      (4L, "tiny doc"))                                    // below window size
      .toDF("doc_id", "text")
    val got = Dedup.decontaminateSpans(docs, evalMod = 50, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // the eval slice is not training data and never appears
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    // doc 1: window "secret bench question" (pos 3) cut ⇒ tokens 3..5
    assert(got(1L) === ((7L, 3L, md5("intro words tail part"))))
    assert(got(2L) === ((5L, 0L, md5("completely unrelated text here now"))))
    // no owner concept: the training copy of an eval span ALWAYS cuts,
    // even when the training doc "owns" (pre-dates) nothing
    assert(got(3L) === ((3L, 3L, md5(""))))
    assert(got(4L) === ((2L, 0L, md5("tiny doc"))))
    // scale contract: the eval window-hash set reaches the training
    // scan through a broadcast, never a corpus shuffle by hash
    val plan = planOf(Dedup.decontaminateSpans(Tables.documents(spark, sf)))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("bloomScreen: no false negatives ever, FP rate under the ceiling, deterministic mergeable filter") {
    import spark.implicits._
    import graft.functions.GraftFunctions.{bloomBuild, bloomMightContain}
    // real corpus: every true exact-dup must flag; FPs stay rare
    val rows = Dedup.bloomScreen(Tables.documents(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, bloom, exact) => exact == 0L || bloom == 1L },
      "a Bloom filter must NEVER miss a true member")
    val nonDups = rows.filter(_._3 == 0L)
    val fpRate = nonDups.count(_._2 == 1L).toDouble / math.max(nonDups.length, 1)
    assert(fpRate <= 0.08, s"false-positive rate $fpRate above the ~0.8%-theory ceiling band")
    // the filter is deterministic and truly mergeable: building over 7
    // partitions and over 1 yields byte-identical filters
    val keys = (1L to 500L).map(i => Tuple1(i * 0x9e3779b97f4a7c15L)).toDF("v")
    def build(df: org.apache.spark.sql.DataFrame) =
      df.agg(bloomBuild(col("v"), 8192, 7)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(keys.repartition(7)), build(keys.repartition(1))),
      "partial-merge order must not change the filter bytes")
    // probe semantics on a hand-built filter: members always hit,
    // non-member FP rate near theory
    val filter = build(keys)
    val members = keys.select(
      bloomMightContain(lit(filter), col("v")).as("hit")).collect()
    assert(members.forall(_.getBoolean(0)), "member probes must all hit")
    val probes = (100001L to 101000L).map(i => Tuple1(i * 0x517cc1b727220a95L)).toDF("v")
    val fp = probes.select(bloomMightContain(lit(filter), col("v")).as("hit"))
      .collect().count(_.getBoolean(0))
    // 500 keys in 8192 bits at k=7 ⇒ theory ~0.55%; allow wide slack
    assert(fp <= 50, s"non-member FP count $fp way above theory on 1000 probes")
  }

  test("BloomIndex: write -> read -> probe identical to in-session; append equals one-shot union build") {
    import spark.implicits._
    def rmrf(dir: String): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    val store = (1L to 400L).map(i => Tuple1(i * 0x9e3779b97f4a7c15L)).toDF("v")
    val batch = (401L to 450L).map(i => Tuple1(i * 0x9e3779b97f4a7c15L)).toDF("v")
    val dir = java.nio.file.Files.createTempDirectory("bloom_idx_").toString
    try {
      graft.dedup.BloomIndex.write(store, dir)
      // read-back probe == in-session probe over the same filter bytes
      val fromDisk = graft.dedup.BloomIndex.probe(spark, store.union(batch), dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      store.collect().map(_.getLong(0)).foreach(v =>
        assert(fromDisk(v) === 1L, "a stored key must always hit the read-back filter"))
      // append: OR-ing the batch in preserves the geometry, never
      // loses a key, and at that FIXED geometry is byte-equal to a
      // one-shot build over the union (OR IS the aggregate's merge)
      val storeBytes = graft.dedup.BloomIndex.read(dir)
      graft.dedup.BloomIndex.append(batch, dir)
      val viaAppend = graft.dedup.BloomIndex.read(dir)
      assert(storeBytes.length === viaAppend.length, "append must preserve geometry")
      val hits = graft.dedup.BloomIndex.probe(spark, store.union(batch), dir).collect()
      assert(hits.forall(_.getLong(1) == 1L), "append lost a key")
      import graft.functions.GraftFunctions.bloomBuild
      val bits = (viaAppend.length - 4) * 8
      val oneShot = store.union(batch)
        .agg(bloomBuild(col("v"), bits, 7)).head().getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(viaAppend, oneShot),
        "append drifted from the one-shot union build at fixed geometry")
      // corrupt artifacts fail loudly
      val bad = java.nio.file.Files.createTempDirectory("bloom_bad_").toString
      try {
        intercept[IllegalArgumentException] { graft.dedup.BloomIndex.read(bad) }
        java.nio.file.Files.write(java.nio.file.Paths.get(bad, "filter.bin"), Array[Byte](0, 0, 0, 7))
        intercept[IllegalArgumentException] { graft.dedup.BloomIndex.read(bad) }
      } finally rmrf(bad)
    } finally rmrf(dir)
  }

  test("BloomIndex sharded: members never miss, routes by residue, append equals one-shot union") {
    import spark.implicits._
    def rmrf(dir: String): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    val store = (1L to 400L).map(i => Tuple1(i * 0x9e3779b97f4a7c15L)).toDF("v")
    val batch = (401L to 450L).map(i => Tuple1(i * 0x9e3779b97f4a7c15L)).toDF("v")
    val absent = (1000L to 1400L).map(i => Tuple1(i * 0x6a09e667f3bcc909L)).toDF("v")
    val dir = java.nio.file.Files.createTempDirectory("bloom_shard_").toString
    try {
      graft.dedup.BloomIndex.writeSharded(store, dir, nShards = 8)
      // zero false negatives across every shard
      val hits = graft.dedup.BloomIndex.probeSharded(spark, store, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hits.size === 400 && hits.values.forall(_ == 1L), "a stored key missed its shard")
      // false positives stay under the geometry's ceiling (~0.8% at
      // 10 bits / 7 hashes; generous slack for 400 draws)
      val fp = graft.dedup.BloomIndex.probeSharded(spark, absent, dir)
        .collect().count(_.getLong(1) == 1L)
      assert(fp <= 20, s"$fp/400 sharded false positives is far over the geometry's rate")
      // per-shard append equals the one-shot union build, byte for byte
      graft.dedup.BloomIndex.appendSharded(spark, batch, dir)
      val appended = spark.read.parquet(s"$dir/shards").collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      // byte-for-byte: at the store's FIXED geometry (bits read from
      // meta.json), appending is identical to one aggregate over the
      // union — OR is the aggregate's merge
      val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "meta.json")))
      val bits = meta.get("bits").asInt()
      import graft.functions.GraftFunctions.bloomBuild
      val one = store.union(batch)
        .groupBy(pmod(col("v"), lit(8L)).as("shard"))
        .agg(bloomBuild(col("v"), bits, 7).as("filter"))
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      assert(appended === one, "sharded append drifted from the one-shot union build")
      val unionHits = graft.dedup.BloomIndex.probeSharded(spark, store.union(batch), dir)
        .collect()
      assert(unionHits.forall(_.getLong(1) == 1L), "sharded append lost a key")
      // a key routing to a shard the store never populated is
      // definitively absent (left join, not an error)
      val far = Seq(Tuple1(8L * 1234567L + 3L)).toDF("v")
      assert(graft.dedup.BloomIndex.probeSharded(spark, far, dir).collect().length === 1)
      // append refreshed meta.json's key accounting (ADVICE r10)
      val meta2 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "meta.json")))
      assert(meta2.get("n_keys").asLong() === 450L,
        "appendSharded left meta.json n_keys stale")
      assert(meta2.get("bits").asInt() === bits && meta2.get("n_shards").asInt() === 8)
      // a caller whose key column is itself named "shard" (or "filter")
      // must get real verdicts, not probes of the routing column
      val collide = store.union(batch).withColumnRenamed("v", "shard")
      val collideHits = graft.dedup.BloomIndex.probeSharded(spark, collide, dir).collect()
      assert(collideHits.length === 450 && collideHits.forall(_.getLong(1) == 1L),
        "a key column named 'shard' was shadowed by the routing column")
      assert(collideHits.head.schema.fieldNames.head === "shard",
        "probeSharded should preserve the caller's key column name")
    } finally rmrf(dir)
  }

  test("ShingleIndex: write -> read -> probe hash-EQUAL to in-session screenAgainst; append equals one-shot union; loud corrupt failures") {
    import spark.implicits._
    def rmrf(dir: String): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    val rnd = new scala.util.Random(77)
    val vocab = Vector("red", "blue", "green", "stone", "river", "cloud", "iron", "wolf",
      "amber", "pine", "salt", "storm", "ember", "frost", "moss", "raven")
    def doc(): String = Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0L until 60L).map(i => (i, doc()))
    // plant an exact twin and a near-dup across the batch/store boundary
    val planted = base.map {
      case (i, _) if i == 20L => (i, base.find(_._1 == 7L).get._2 + " tail")
      case (i, _) if i == 40L => (i, base.find(_._1 == 13L).get._2)
      case x => x
    }
    val store = planted.filter(_._1 % 10 != 0).toDF("doc_id", "text")
    val batch = planted.filter(_._1 % 10 == 0).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shingle_idx_").toString
    try {
      graft.dedup.ShingleIndex.write(store, dir)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val disk = rows(graft.dedup.ShingleIndex.probe(spark, batch, dir))
      val inSession = rows(Dedup.screenAgainst(batch, store))
      assert(disk === inSession, "disk-served screen drifted from the in-session screen")
      assert(disk.exists { case (id, e, _, _) => id == 40L && e == 1L },
        "planted exact twin not flagged through the persisted index")
      assert(disk.exists { case (id, _, n, _) => id == 20L && n >= 1L },
        "planted near-dup not flagged through the persisted index")
      // append: landed docs join the store; probe equals a ONE-SHOT
      // build over the union
      val landed = Seq((100L, planted.find(_._1 == 3L).get._2),
        (101L, "totally novel landed content never seen before")).toDF("doc_id", "text")
      graft.dedup.ShingleIndex.append(landed, dir)
      val oneShot = java.nio.file.Files.createTempDirectory("shingle_one_").toString
      try {
        graft.dedup.ShingleIndex.write(store.union(landed), oneShot)
        val probeA = rows(graft.dedup.ShingleIndex.probe(spark, batch, dir))
        val probeO = rows(graft.dedup.ShingleIndex.probe(spark, batch, oneShot))
        assert(probeA === probeO, "append drifted from the one-shot union build")
      } finally rmrf(oneShot)
      // meta accounting refreshed by the append
      val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "meta.json")))
      assert(meta.get("n_docs").asLong() === 54L + 2L, "append left meta.json n_docs stale")
      // the mod-split query form serves the identical verdicts as q107
      val viaQuery = rows(Dedup.incrementalDedupDisk(planted.toDF("doc_id", "text")))
      val viaMem = rows(Dedup.incrementalDedup(planted.toDF("doc_id", "text")))
      assert(viaQuery === viaMem, "incrementalDedupDisk drifted from incrementalDedup")
    } finally rmrf(dir)
    // loud failures: missing layout, then a half-deleted one
    val bad = java.nio.file.Files.createTempDirectory("shingle_bad_").toString
    try {
      intercept[IllegalArgumentException] {
        graft.dedup.ShingleIndex.probe(spark, batch, bad)
      }
      graft.dedup.ShingleIndex.write(store, bad)
      rmrf(s"$bad/postings")
      intercept[IllegalArgumentException] {
        graft.dedup.ShingleIndex.probe(spark, batch, bad)
      }
    } finally rmrf(bad)
  }

  test("ShingleIndex bucketed postings: probe hash-equal to the plain layout; store side joins without its own Exchange") {
    import spark.implicits._
    def rmrf(dir: String): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    def withConf[A](key: String, value: String)(body: => A): A = {
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, value)
      try body
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val docs = Tables.documents(spark, sf)
    val store = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val plain = java.nio.file.Files.createTempDirectory("shingle_plain_").toString
    val bucketed = java.nio.file.Files.createTempDirectory("shingle_bktd_").toString
    try {
      graft.dedup.ShingleIndex.write(store, plain)
      graft.dedup.ShingleIndex.writeBucketed(store, bucketed, numBuckets = 4)
      // layout changes the PLAN, never the answer
      val viaPlain = rows(graft.dedup.ShingleIndex.probe(spark, batch, plain))
      val viaBucketed = rows(graft.dedup.ShingleIndex.probe(spark, batch, bucketed))
      assert(viaBucketed === viaPlain, "bucketed probe drifted from the plain layout")
      assert(viaBucketed === rows(Dedup.screenAgainst(batch, store)))
      assert(viaBucketed.nonEmpty)
      // with broadcast off (the large-crawl-drop shape the layout
      // serves), the parquet path shuffles BOTH probe-join sides; the
      // bucketed scan IS the h-distribution, so the bucketed plan
      // carries strictly fewer Exchanges. Since round 15 the postings
      // index is joined ONLY inside the candidate stage (the scoring
      // stage re-attaches arrays from sets/, and the candidate table
      // is checkpointed before it), so that is where the layout's
      // Exchange saving lives — assert on the candidate-stage plan.
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        def exchanges(df: org.apache.spark.sql.DataFrame): Int =
          "Exchange".r.findAllIn(planOf(df)).length
        val batchSets = Dedup.hashedShingleSets(batch)
        def candPlan(dir: String) = Dedup.screenCandidates(
          batchSets, graft.dedup.ShingleIndex.probeIndex(spark, dir), 0.5,
          Some(graft.dedup.ShingleIndex.dfTable(spark, dir)))
        val ep = exchanges(candPlan(plain))
        val eb = exchanges(candPlan(bucketed))
        assert(eb < ep, s"bucketed layout did not remove the store-side shuffle: $eb vs $ep")
      }
      // containment probe routes through the same bucketed layout
      assert(
        graft.dedup.ShingleIndex.containmentProbe(spark, batch, bucketed).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ===
          graft.dedup.ShingleIndex.containmentProbe(spark, batch, plain).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
      // append maintains the bucketed layout: landed docs visible to
      // the next probe, equal to a one-shot bucketed build
      val landed = Seq((9001L, "a brand new landed document about nothing")).toDF("doc_id", "text")
      graft.dedup.ShingleIndex.append(landed, bucketed)
      val oneShot = java.nio.file.Files.createTempDirectory("shingle_bk_one_").toString
      try {
        graft.dedup.ShingleIndex.writeBucketed(
          store.select("doc_id", "text").union(landed), oneShot, numBuckets = 4)
        assert(rows(graft.dedup.ShingleIndex.probe(spark, batch, bucketed)) ===
          rows(graft.dedup.ShingleIndex.probe(spark, batch, oneShot)),
          "bucketed append drifted from the one-shot bucketed build")
      } finally rmrf(oneShot)
    } finally { rmrf(plain); rmrf(bucketed) }
  }

  test("containedIncremental: planted contained-in-store doc caught; near screen blind to it; disk probe hash-equal; brute agreement") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
      "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi")
    def words(n: Int): Seq[String] = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
    // store doc 1: a LONG doc; batch doc 10: a SHORT verbatim slice of
    // it (plus the other corpus filler) — the |B| >> |A| case the near
    // screen is blind to at tau=0.5
    val long = words(120).mkString(" ")
    val slice = long.split(" ").slice(30, 42).mkString(" ")
    val base = (0L until 40L).map {
      case 1L => (1L, long)
      case 10L => (10L, slice)
      case i => (i, words(8 + rnd.nextInt(8)).mkString(" "))
    }
    val docs = base.toDF("doc_id", "text")
    val got = Dedup.containedIncremental(docs, batchMod = 10, tau = 0.8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === base.map(_._1).filter(_ % 10 == 0).toSet)
    assert(got(10L)._1 >= 1L && got(10L)._2 === 0L,
      "planted contained-in-store doc not caught by the containment screen")
    // the NEAR screen at its default tau must NOT flag it (that
    // blindness is the reason this screen exists)
    val near = Dedup.incrementalDedup(docs, batchMod = 10, tau = 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(near(10L) === 0L, "near screen unexpectedly caught the contained doc — plant too similar")
    // and the full ingest verdict drops it via contain_keep alone
    val verdict = Dedup.ingestDecision(docs, batchMod = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(verdict(10L) === ((1L, 1L, 0L, 0L)),
      "ingest verdict must drop the contained doc through contain_keep")
    // brute directional agreement over every batch doc
    val sets = Dedup.hashedShingleSets(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val (batch, existing) = base.map(_._1).partition(_ % 10 == 0)
    batch.foreach { b =>
      val n = existing.count { e =>
        sets(b).nonEmpty && (sets(b) & sets(e)).size.toDouble / sets(b).size >= 0.8
      }
      assert(got(b)._1 === n.toLong, s"doc $b container count")
      assert(got(b)._2 === (if (n == 0) 1L else 0L), s"doc $b keep")
    }
    // disk-served probe over the persisted index is hash-equal
    def rmrf(dir: String): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    val dir = java.nio.file.Files.createTempDirectory("contain_idx_").toString
    try {
      val storeDf = docs.filter(col("doc_id") % 10 =!= 0)
      val batchDf = docs.filter(col("doc_id") % 10 === 0)
      graft.dedup.ShingleIndex.write(storeDf, dir)
      val disk = graft.dedup.ShingleIndex.containmentProbe(spark, batchDf, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val mem = Dedup.containmentAgainst(batchDf, storeDf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(disk === mem, "disk-served containment probe drifted from in-session")
      assert(disk === got.map { case (id, (n, k)) => (id, n, k) }.toSet)
    } finally rmrf(dir)
  }

  test("incrementalSpans: batch windows flag iff verbatim in the STORE; batch-internal repeats don't count") {
    import spark.implicits._
    // batchMod=10 ⇒ ids 10,20,30,40 are the batch; k=3
    val docs = Seq(
      (1L, "alpha beta gamma delta"),   // store: windows (a,b,g) (b,g,d)
      (10L, "x alpha beta gamma y"),    // batch: middle window is stored
      (20L, "p q r s"),                 // batch: clean
      (30L, "u v w z1 z2"),             // batch: duplicates ONLY doc 40
      (40L, "u v w z1 z2"),             // batch: duplicates ONLY doc 30
      (21L, "below k"))                 // store, below window size
      .toDF("doc_id", "text")
    val got = Dedup.incrementalSpans(docs, batchMod = 10, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === Set(10L, 20L, 30L, 40L), "batch docs with windows only")
    assert(got(10L) === ((3L, 1L, math.floor(1.0 / 3.0 * 1e6 + 0.5) / 1e6)))
    assert(got(20L) === ((2L, 0L, 0.0)))
    // the store screen must NOT flag batch-internal duplication (that
    // is q_dedup_batch's job at doc level)
    assert(got(30L)._2 === 0L && got(40L)._2 === 0L)
    // scale contract: both hash joins are broadcasts — the store scan
    // is never shuffled by window hash
    val plan = planOf(Dedup.incrementalSpans(Tables.documents(spark, sf)))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("ingestSpanScrub: store-duplicated spans cut, novel text survives, no owner rule") {
    import spark.implicits._
    // batchMod=10 ⇒ ids 10,20,30 are the batch; k=3
    val docs = Seq(
      (1L, "alpha beta gamma delta"),   // store
      (10L, "x alpha beta gamma y"),    // batch: tokens 2..4 are stored
      (20L, "p q r s"),                 // batch: clean — md5 unchanged
      (30L, "u v w z1 z2"),             // batch: duplicates ONLY doc 40 (batch-internal)
      (40L, "u v w z1 z2"))             // batch: ditto — store screen must not cut
      .toDF("doc_id", "text")
    val got = Dedup.ingestSpanScrub(docs, batchMod = 10, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet === Set(10L, 20L, 30L, 40L), "every batch doc is emitted")
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 10: window (alpha beta gamma) is stored → tokens 2,3,4 cut
    assert(got(10L) === ((5L, 3L, md5("x y"))))
    // clean batch docs rebuild to their own tokenization unchanged
    assert(got(20L) === ((4L, 0L, md5("p q r s"))))
    // batch-internal duplication is NOT the store screen's to cut
    assert(got(30L)._2 === 0L && got(40L)._2 === 0L)
    // a fully-stored batch doc scrubs to the empty string
    val full = Seq((1L, "a1 a2 a3 a4"), (10L, "a1 a2 a3 a4")).toDF("doc_id", "text")
    val fg = Dedup.ingestSpanScrub(full, batchMod = 10, k = 3).collect()
    assert(fg.length === 1 && fg.head.getLong(2) === 4L && fg.head.getString(3) === md5(""))
    // scale contract: broadcast-only hash joins, store never shuffled by h
    val plan = planOf(Dedup.ingestSpanScrub(Tables.documents(spark, sf)))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("containedDrop: bigger container wins, twins keep the lower id, chains drop every non-head") {
    val a = (1 to 6).map(i => s"q$i").mkString(" ")          // 4 shingles
    val b = a + " " + (1 to 3).map(i => s"r$i").mkString(" ") // a ⊑ b
    val c = b + " " + (1 to 3).map(i => s"s$i").mkString(" ") // b ⊑ c
    val df = docs(1L -> a, 2L -> b, 3L -> c, 7L -> "twin one two three four", 8L -> "twin one two three four")
    val got = Dedup.containedDrop(df, tau = 0.8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 7L, 8L))
    assert(got(3L) === ((0L, 1L)), "the chain head survives")
    assert(got(2L)._2 === 0L, "the middle of the chain is contained in its head")
    assert(got(1L)._2 === 0L && got(1L)._1 >= 1L, "the smallest doc is dropped")
    assert(got(7L) === ((0L, 1L)), "twin: lower id survives")
    assert(got(8L) === ((1L, 0L)), "twin: higher id drops")
    // every dropped doc's content is (approximately) covered by a kept
    // doc — here exactly: c contains b and a; 7 contains 8
    // driver brute equivalence on real data
    val corpus = Tables.documents(spark, sf).limit(200)
    val sets = Dedup.hashedShingleSets(corpus).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val tau = 0.75
    val expect = sets.map { case (id, sa) =>
      val nc = sets.count { case (oid, sb) =>
        oid != id && sa.nonEmpty &&
          (sa & sb).size.toDouble / sa.size >= tau &&
          (sb.size > sa.size || (sb.size == sa.size && oid < id))
      }
      id -> ((nc.toLong, if (nc == 0) 1L else 0L))
    }
    val real = Dedup.containedDrop(corpus, tau).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(real === expect)
  }

  test("modalityAgreement: brute form ties out exactly; the served LSH form is a recall-floored subset of it") {
    val docsDf = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    // ---- the brute composition (the gate-only exact form): counts
    // tie out against the two pair operators it composes
    val r = Dedup.modalityAgreement(docsDf, emb, useLsh = false).collect()
    assert(r.length === 1)
    val row = r.head
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val t = pairs(Dedup.ngramPairs(docsDf).select("doc_a", "doc_b"))
    val e = pairs(Dedup.embeddingPairs(emb).select("vec_a", "vec_b"))
    assert(row.getLong(0) === t.size.toLong)
    assert(row.getLong(1) === e.size.toLong)
    assert(row.getLong(2) === (t & e).size.toLong)
    val union = (t | e).size
    val expJac = if (union > 0) math.floor((t & e).size.toDouble / union * 1e6 + 0.5) / 1e6 else 0.0
    assert(row.getDouble(3) === expJac)
    assert(t.nonEmpty && e.nonEmpty, "both modalities must find pairs on the test corpus")
    // ---- the SERVED form (useLsh default): the embedding side is the
    // LSH graph — exact-rescored, so a SUBSET of brute on both counts,
    // the text side identical, and recall stays usable (the
    // embedIncremental/embedDedupBest floor)
    val lshRow = Dedup.modalityAgreement(docsDf, emb).collect().head
    assert(lshRow.getLong(0) === t.size.toLong, "text side must be identical in both forms")
    assert(lshRow.getLong(1) <= row.getLong(1), "LSH embed pairs must never overcount brute")
    assert(lshRow.getLong(2) <= row.getLong(2), "LSH intersection must never overcount brute")
    assert(lshRow.getLong(1) >= (0.3 * row.getLong(1)).toLong,
      s"LSH embed-pair recall collapsed: ${lshRow.getLong(1)} of ${row.getLong(1)}")
    // and the served pairs really are a subset (not just count-bounded)
    val eLsh = pairs(Dedup.embeddingPairsLshCached(emb).select("vec_a", "vec_b"))
    assert(eLsh.subsetOf(e), "exact-rescored LSH pairs must be a subset of the brute graph")
  }

  test("dedupReport: one-row dashboard agrees with the operators it summarizes") {
    val docsDf = Tables.documents(spark, sf)
    val r = Dedup.dedupReport(docsDf).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(0) === docsDf.count())
    val exactGroups = Dedup.exact(docsDf).filter(col("n_copies") >= 2).collect()
    assert(row.getLong(1) === exactGroups.length.toLong)
    assert(row.getLong(2) === exactGroups.map(_.getLong(1)).sum)
    assert(row.getLong(3) === Dedup.ngramPairs(docsDf).count())
    val labels = Dedup.clustersQuery(docsDf).collect()
    assert(row.getLong(4) === labels.map(_.getLong(1)).distinct.length.toLong)
    assert(row.getLong(5) === labels.length.toLong)
    assert(math.abs(row.getDouble(6) - labels.length.toDouble / docsDf.count()) < 1e-6)
    // a hand-built corpus with one exact pair and one near pair
    val tiny = docs(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta",
      3L -> "totally different content goes here now",
      4L -> "totally different content goes here later")
    val t = Dedup.dedupReport(tiny).head()
    assert(t.getLong(0) === 4L && t.getLong(1) === 1L && t.getLong(2) === 2L)
    assert(t.getLong(3) >= 1L && t.getLong(5) >= 2L)
    // empty corpus: still exactly one row, all zeros
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      docsDf.schema)
    val z = Dedup.dedupReport(empty).head()
    assert((0 to 5).forall(i => z.getLong(i) === 0L) && z.getDouble(6) === 0.0)
  }

  test("dupSpanReport: overlap merges, adjacent coverage merges, gaps split — hand-pinned") {
    import spark.implicits._
    val k = 4
    // (1) overlapping windows: a shared 6-token passage = dup windows
    //     at 3 consecutive positions -> ONE merged 6-token span
    // (2) adjacent coverage: two shared 4-token passages back-to-back
    //     in doc 30 but separated in doc 31 -> dup positions {1, 5},
    //     coverage [1,4]+[5,8] adjacent -> ONE span of 8
    // (3) gap: two shared passages separated by a doc-unique token ->
    //     TWO spans
    val docs = Seq(
      (10L, "p1 p2 p3 p4 p5 p6 e7"),
      (11L, "zz p1 p2 p3 p4 p5 p6"),
      (30L, "t1 t2 t3 t4 u1 u2 u3 u4 c9"),
      (31L, "t1 t2 t3 t4 zz u1 u2 u3 u4"),
      (40L, "s1 s2 s3 s4 mm s5 s6 s7 s8"),
      (41L, "s1 s2 s3 s4 nn s5 s6 s7 s8"))
      .toDF("doc_id", "text")
    val got = Dedup.dupSpanReport(docs, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).toSet).toMap
    assert(got(10L) === Set((1L, 6L)), s"overlap merge: ${got(10L)}")
    assert(got(11L) === Set((2L, 6L)))
    assert(got(30L) === Set((1L, 8L)), s"adjacent coverage must merge: ${got(30L)}")
    // doc 31's two passages are separated by zz -> two spans
    assert(got(31L) === Set((1L, 4L), (6L, 4L)))
    assert(got(40L) === Set((1L, 4L), (6L, 4L)), s"gap must split: ${got(40L)}")
    assert(got(41L) === Set((1L, 4L), (6L, 4L)))
  }

  test("dupSpanReport equals a driver-side islands recomputation on a fixed-seed random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val shared = Seq.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val texts = (0L until 40L).map { id =>
      val own = Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (id, if (id % 3 == 0) s"$own $shared" else own)
    }
    val k = 5
    // brute truth: dup windows -> covered index union -> maximal islands
    val toks = texts.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toVector }.toMap
    val wins = toks.toSeq.flatMap { case (id, ts) =>
      if (ts.size >= k) (0 to ts.size - k).map(p => (id, p + 1, ts.slice(p, p + k).mkString(" ")))
      else Seq.empty
    }
    val docsPerWin = wins.groupBy(_._3).view.mapValues(_.map(_._1).distinct).toMap
    val expected = wins.filter(w => docsPerWin(w._3).size >= 2)
      .groupBy(_._1).view.mapValues { ws =>
        val covered = ws.flatMap(w => w._2 until w._2 + k).distinct.sorted
        // islands over the covered indexes
        covered.foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, i) if i == e + 1 => (s, i) :: rest
          case (acc, i) => (i, i) :: acc
        }.map { case (s, e) => (s.toLong, (e - s + 1).toLong) }.toSet
      }.toMap
    val got = Dedup.dupSpanReport(texts.toDF("doc_id", "text"), k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).toSet).toMap
    assert(got === expected)
  }

  test("dupSpans + dupSpanScrub equal a brute reimplementation on a fixed-seed random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    // small vocab + planted shared passage => natural window collisions
    val shared = Seq.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val texts = (0L until 40L).map { id =>
      val own = Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val t = if (id % 3 == 0) s"$own $shared" else own
      (id, t)
    }
    val k = 5
    val docs = texts.toDF("doc_id", "text")
    // brute truth
    val toks = texts.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toVector }.toMap
    val wins = toks.toSeq.flatMap { case (id, ts) =>
      if (ts.size >= k) (0 to ts.size - k).map(p => (id, p + 1, ts.slice(p, p + k).mkString(" ")))
      else Seq.empty
    }
    val docsPerWin = wins.groupBy(_._3).view.mapValues(_.map(_._1).distinct).toMap
    val expectSpans = wins.groupBy(_._1).map { case (id, ws) =>
      val dup = ws.count(w => docsPerWin(w._3).size >= 2)
      id -> ((ws.size.toLong, dup.toLong))
    }
    val gotSpans = Dedup.dupSpans(docs, k).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotSpans === expectSpans)
    // scrub truth: cut token indices of non-owner dup windows
    val expectScrub = toks.map { case (id, ts) =>
      val cuts = wins.filter(w => w._1 == id && docsPerWin(w._3).size >= 2 &&
        docsPerWin(w._3).min != id).flatMap(w => w._2 until w._2 + k).distinct
      val kept = ts.zipWithIndex.collect { case (t, i) if !cuts.contains(i + 1) => t }
      id -> ((ts.size.toLong, cuts.size.toLong, kept.mkString(" ")))
    }
    val md5 = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val gotScrub = Dedup.dupSpanScrub(docs, k).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(gotScrub === expectScrub.map { case (id, (n, c, t)) => id -> ((n, c, md5(t))) })
  }

  test("embedDedupBest: keep_id has max quality in its component; clusters partition the pair graph") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val got = Dedup.embedDedupBest(docs, emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty)
    // driver-side truth: union-find over the brute cosine pairs
    val pairs = Dedup.embeddingPairs(emb).select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val comps = parent.keys.toSeq.groupBy(find).map { case (_, m) => m.toSet }.toSet
    // one output row per component, labelled by its min id, n_docs = size
    assert(got.keySet === comps.map(_.min))
    comps.foreach(c => assert(got(c.min)._1 === c.size.toLong, s"component $c"))
    // the survivor attains the max (quality, -doc_id) in its component
    val q = graft.text.Text.quality(docs).select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    comps.foreach { c =>
      val bestQ = c.map(q).max
      val expectKeep = c.filter(d => q(d) == bestQ).min
      assert(got(c.min)._2 === expectKeep && got(c.min)._3 === bestQ, s"component $c")
    }
  }

  test("embedDedupBest with LSH pairs: clusters only refine (never merge), usable coverage") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val brute = Dedup.embedDedupBest(docs, emb).collect()
    val lsh = Dedup.embedDedupBest(docs, emb, useLsh = true).collect()
    // LSH pairs are exact-rescored (subset of brute pairs), so every
    // LSH component is contained in one brute component: its keeper's
    // quality never exceeds the brute component's keeper quality, and
    // the node coverage is a subset with usable recall
    val bruteNodes = Dedup.embeddingPairs(emb).select("vec_a", "vec_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val lshNodes = Dedup.embeddingPairsLsh(emb).select("vec_a", "vec_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(lshNodes.subsetOf(bruteNodes))
    assert(lshNodes.size.toDouble / bruteNodes.size >= 0.5,
      s"LSH node recall ${lshNodes.size.toDouble / bruteNodes.size}")
    assert(lsh.map(_.getLong(1)).sum === lshNodes.size.toLong) // partition of covered nodes
    assert(lsh.nonEmpty && brute.nonEmpty)
  }

  test("decontaminateFrac: boundary-exact at the threshold, strictly weaker than any-overlap") {
    import spark.implicits._
    // eval doc 0: shingles {a b c, b c d, c d e}
    // doc 1: 5 shingles, 3 shared -> 0.6  >= 0.5 -> dropped
    // doc 2: 4 shingles, 1 shared -> 0.25 <  0.5 -> kept (any-overlap would drop)
    // doc 3: 6 shingles, 3 shared -> 0.5 EXACTLY -> dropped (>= at the edge)
    // doc 4: no overlap -> kept by both
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d e x y"),
      (2L, "a b c q r s"),
      (3L, "a b c d e q r s"),
      (4L, "completely unrelated words here again"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val kept = Dedup.decontaminateFrac(docs, minSharedFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 4L))
    // sanity on the constructed fractions via the contamination report
    val shared = Dedup.contamination(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shared === Map(1L -> 3L, 2L -> 1L, 3L -> 3L))
    // one micro above the exact boundary no longer drops doc 3 (6
    // shingles, 3 shared = 0.5 < 0.500001)
    val keptAbove = Dedup.decontaminateFrac(docs, minSharedFrac = 0.500001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptAbove === Set(2L, 3L, 4L))
    // fractional keep-set is a superset of the any-overlap keep-set
    val real = Tables.documents(spark, sf)
    val anyKept = Dedup.decontaminate(real).select("doc_id").collect().map(_.getLong(0)).toSet
    val fracKept = Dedup.decontaminateFrac(real).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(anyKept.subsetOf(fracKept))
    // and the plan still broadcasts the eval side
    val plan = planOf(Dedup.decontaminateFrac(real))
    assert(plan.contains("BroadcastHashJoin"), s"expected eval-side broadcast:\n$plan")
  }

  test("dedupSweep: ladder equals a driver replay over the pair graph; monotone; base rung is the whole graph") {
    val corpus = Tables.documents(spark, sf)
    val pairs = Dedup.pairsCached(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty, "corpus must have near-dup pairs for the sweep to mean anything")
    val expect = (0L to 20L).flatMap { k =>
      val th = (500000L + 25000L * k) / 1e6
      val keep = pairs.filter { case (_, _, j) =>
        math.floor(j * 1e6 + 0.5).toLong >= 500000L + 25000L * k
      }
      if (keep.isEmpty) None
      else Some(k -> (th, keep.length.toLong,
        keep.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong))
    }.toMap
    val out = Dedup.dedupSweep(corpus).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    assert(out === expect, "rung-for-rung replay")
    // rung 0 is the full pair graph (tau == the base emission cutoff)
    assert(out(0L)._2 === pairs.length.toLong)
    // monotone: pairs and docs can only shrink as tau rises
    val o = out.toSeq.sortBy(_._1).map(_._2)
    o.sliding(2).foreach {
      case Seq((_, p1, d1), (_, p2, d2)) => assert(p2 <= p1 && d2 <= d1)
      case _ =>
    }
  }

  test("exactNormalized: planted re-encodings collapse to one group that raw exact dedup splits") {
    // doc_ids chosen to land one doc in each variant class (mod 3):
    // 0 verbatim, 1 uppercased, 2 double-spaced+punct — same text
    val docs = Seq(
      (0L, "spark line column"), (1L, "spark line column"),
      (2L, "spark line column"), (3L, "other words here"))
      .toDF("doc_id", "text")
    val out = Dedup.exactNormalized(docs).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.size === 2, "two normalized groups")
    val big = out.values.find(_._1 == 3L).get
    assert(big === ((3L, 3L, 0L)),
      "3 copies, 3 DISTINCT raw hashes (the re-encodings), keep the min id")
    assert(out.values.exists(_ == ((1L, 1L, 3L))), "singleton stays alone")
    // the blind spot proven: raw exact dedup over the SAME encoded
    // texts sees three distinct documents
    val enc = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(3L)) === 1L, upper(col("text")))
        .when(pmod(col("doc_id"), lit(3L)) === 2L,
          concat(regexp_replace(col("text"), " ", "  "), lit(" !!")))
        .otherwise(col("text")).as("text"))
    assert(Dedup.exact(enc).count() === 4,
      "raw hashing treats every planted re-encoding as a distinct doc")
  }

  test("exactNormalized on the corpus: normalized groups are exactly the raw exact-dedup groups") {
    // this corpus is already canonical (lowercase, single-spaced,
    // alnum-only), so norm(reencode(text)) == text and the normalized
    // group table must coincide with q_dedup_exact's group-for-group:
    // same hash key, same sizes, same survivor
    val docs = Tables.documents(spark, sf)
    val norm = Dedup.exactNormalized(docs).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(3)))).toMap
    val raw = Dedup.exact(docs).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(norm.keySet === raw.keySet, "norm_hash == md5(original canonical text)")
    norm.foreach { case (h, v) =>
      assert(v === raw(h), s"group $h: same n_copies and keep_id")
    }
    // and every group's variant count is consistent with its members'
    // mod-3 classes: a group of >=2 docs in different classes must
    // show >1 raw variant
    val multi = Dedup.exactNormalized(docs)
      .filter(col("n_copies") > col("n_exact_variants")).collect()
    multi.foreach { r =>
      assert(r.getLong(2) >= 1L)
    }
  }

  // ------------------------------------------------------------------
  // q185: line-level exact dedup
  // ------------------------------------------------------------------

  /** Driver replay of the line derivation: 12-token windows plus the
    * planted boilerplate (the lineDedup planting arithmetic).
    */
  private def replayLines(docId: Long, text: String): Seq[String] = {
    val boilerA = "subscribe to the data stream newsletter and follow for more updates"
    val boilerB = "click here to read the full archive of spark query reports"
    val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
    val body = toks.grouped(12).map(_.mkString(" ")).toSeq
    if (docId % 4 == 0) boilerA +: body
    else if (docId % 4 == 2) body :+ boilerB
    else body
  }

  test("line dedup: an out-of-range doc_id fails loudly instead of corrupting the packed winner key") {
    import spark.implicits._
    val bad = Seq(((1L << 43), "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val ex = intercept[Exception] { Dedup.lineDedup(bad).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("lineDedup winner-key packing")),
      s"expected the packing-contract error, got: ${ex.getMessage}")
  }

  test("line dedup: keep-first on a hand-built corpus, boilerplate removed everywhere but its first carrier") {
    val twentyFour = (1 to 24).map(i => s"w$i").mkString(" ")
    val out = Dedup.lineDedup(docs(
      1L -> twentyFour, // 2 lines, first carrier of both
      5L -> twentyFour, // exact twin: every line already seen
      4L -> "novel words only here", // boilerA prepended (4 % 4 == 0)
      8L -> "other novel words" // boilerA again: dropped (doc 4 owns it)
    )).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 2L && out(1L).getLong(2) === 2L)
    assert(out(5L).getLong(1) === 2L && out(5L).getLong(2) === 0L)
    assert(out(5L).getString(3) === "")
    assert(out(4L).getLong(1) === 2L && out(4L).getLong(2) === 2L,
      "doc 4 is the minimum (doc_id, line_no) carrier of boilerA")
    assert(out(8L).getLong(1) === 2L && out(8L).getLong(2) === 1L)
    assert(out(8L).getString(3) === "other novel words",
      "doc 8 keeps only its body line; the boilerplate belongs to doc 4")
    assert(out(4L).getString(3).startsWith("subscribe to the data stream"))
  }

  test("line dedup on the corpus equals a full driver keep-first replay; kept volume = distinct lines") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    // keep-first replay over (doc_id, line_no) order
    val seen = scala.collection.mutable.Set[String]()
    val expected = texts.map { case (id, text) =>
      val lines = replayLines(id, text)
      val kept = lines.filter(l => seen.add(l))
      (id, lines.size.toLong, kept.size.toLong, kept.mkString("\n"))
    }.toSet
    // the replay walks ids ascending and lines in order, which IS the
    // packed-key minimum; compare the full row set
    val got = Dedup.lineDedup(Tables.documents(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got === expected)
    val distinctLines = texts.flatMap { case (id, t) => replayLines(id, t) }.distinct.size.toLong
    assert(got.toSeq.map(_._3).sum === distinctLines,
      "every distinct line survives exactly once corpus-wide")
    assert(got.exists(r => r._3 < r._2), "planted boilerplate must drop somewhere")
  }

  // ------------------------------------------------------------------
  // q188: semantic decontamination
  // ------------------------------------------------------------------

  test("semantic decontamination: planted paraphrase flagged, orthogonal train kept, zero vector excluded") {
    import spark.implicits._
    val eval = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), // eval slice: vec_id % 50 == 0
      (50L, Seq(0f, 1f, 0f, 0f)))
    val train = Seq(
      (1L, Seq(2f, 0.1f, 0f, 0f)), // near eval 0 → contaminated
      (2L, Seq(0f, 0f, 3f, 0f)), // orthogonal to both → keep
      (3L, Seq(0f, 0f, 0f, 0f))) // zero norm → excluded entirely
    val out = Dedup.decontaminateSemantic((eval ++ train).toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(0L) && !out.contains(50L), "eval rows are not verdict rows")
    assert(!out.contains(3L), "zero-norm vectors are unrankable and excluded")
    assert(out(1L).getLong(1) === 1L && out(1L).getLong(3) === 0L)
    assert(out(1L).getDouble(2) > 0.99)
    assert(out(2L).getLong(1) === 0L && out(2L).getLong(3) === 1L)
    assert(out(2L).getDouble(2) === 0.0)
  }

  test("semantic decontamination on the corpus equals the brute driver replay") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .filter { case (_, v) => math.sqrt(v.map(x => x * x).sum) > 0 }
    val (ev, tr) = vecs.partition(_._1 % 50 == 0)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = tr.map { case (id, v) =>
      val cs = ev.map { case (_, e) => cos(v, e) }.filter(_ >= 0.35)
      val mc = if (cs.isEmpty) 0.0 else cs.max
      (id, cs.size.toLong, math.floor(mc * 1e6 + 0.5) / 1e6,
        if (cs.isEmpty) 1L else 0L)
    }.toSet
    val got = Dedup.decontaminateSemantic(Tables.embeddings(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got === expected)
    assert(got.exists(_._4 === 0L), "the planted straddling near-dups must flag")
    assert(got.count(_._4 === 0L) < got.size / 10, "contamination must stay the exception")
  }
}
