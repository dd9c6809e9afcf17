package graft

import org.apache.spark.sql.functions._

import graft.mm.MediaCodec

class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Long*) = ids.toSeq.toDF("doc_id")

  /** Expected bands straight from the planting arithmetic — no PNG
    * encode/decode in the loop (what the REAL decode must recover).
    */
  private def plantedBands(id: Long): Array[Long] = {
    val raw = Array.ofDim[Byte](MediaCodec.phashH * MediaCodec.phashW * 3)
    for (y <- 0 until MediaCodec.phashH; x <- 0 until MediaCodec.phashW) {
      val (r, g, b) = MediaCodec.phashPixelAt(id, x, y)
      val o = (y * MediaCodec.phashW + x) * 3
      raw(o) = r.toByte; raw(o + 1) = g.toByte; raw(o + 2) = b.toByte
    }
    MediaCodec.dhashBands(raw, MediaCodec.phashW, MediaCodec.phashH)
  }

  private def hamming(a: Array[Long], b: Array[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  test("imagePhash: real decode recovers the planted-arithmetic bands; quarantine fires") {
    val ids = Seq(3L, 4L, 5L, 19L, 6L, 48L)
    val out = MediaCodec.imagePhash(docs(ids: _*))
      .collect().map(r => r.getLong(0) -> r).toMap
    ids.filter(_ % 19 != 0).foreach { id =>
      val r = out(id)
      assert(r.getString(7) === "")
      assert(r.getLong(1) === 36L && r.getLong(2) === 32L)
      val expect = plantedBands(id)
      assert(Seq(r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ===
        expect.toSeq, s"doc $id bands")
      // bands are 16-bit values by construction
      expect.foreach(b => assert(b >= 0L && b <= 0xffffL))
    }
    val q = out(19L)
    assert(q.getString(7) === "missing_idat" && q.getLong(3) === -1L)
  }

  test("dHash invariances: brightness shift hashes EQUAL, one-block edit within 2 bits") {
    // group 0 (ids 0..47): id 3 (v0 base), 4 (v1 brightness), 5 (v2 block edit)
    val base = plantedBands(3L)
    assert(plantedBands(4L).toSeq === base.toSeq,
      "uniform brightness adds the same constant to every block sum — gradients unchanged")
    val edited = plantedBands(5L)
    assert(hamming(base, edited) <= 2, "a 4x4-block edit touches at most 2 comparisons")
    // different groups are different pictures: far apart in hash space
    assert(hamming(plantedBands(3L), plantedBands(48L)) > 2)
  }

  test("imageDedup: planted variant pairs recovered, quarantined docs excluded, a<b once") {
    // two groups (0 and 1) across all three variants + a quarantined id
    val out = MediaCodec.imageDedup(docs(3L, 4L, 5L, 48L, 49L, 50L, 19L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = out.map(t => (t._1, t._2)).toSet
    assert(pairs.contains((3L, 4L)), "brightness pair")
    assert(out.find(t => t._1 == 3L && t._2 == 4L).get._3 === 0L)
    assert(pairs.contains((3L, 5L)) && pairs.contains((4L, 5L)), "block-edit pairs")
    assert(pairs.contains((48L, 49L)) && pairs.contains((48L, 50L)))
    assert(!out.exists(t => t._1 == 19L || t._2 == 19L), "quarantined never pairs")
    assert(out.forall(t => t._1 < t._2))
    assert(out.map(t => (t._1, t._2)).distinct.length === out.length, "pairs emitted once")
    // cross-group: nothing within tau by planting
    assert(!pairs.exists { case (a, b) => a / 48L != b / 48L })
  }

  test("imageDrop: first-wins survivor per perceptual cluster, singletons keep, quarantine absent") {
    val out = MediaCodec.imageDrop(docs(3L, 4L, 5L, 48L, 19L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(!out.contains(19L), "quarantined doc must not get a verdict")
    assert(out(3L) === ((3L, true)), "cluster min keeps")
    assert(out(4L) === ((3L, false)) && out(5L) === ((3L, false)), "later members drop")
    assert(out(48L) === ((48L, true)), "singleton keeps")
    // verdict conserves: one keep per cluster
    out.values.groupBy(_._1).foreach { case (cid, vs) =>
      assert(vs.count(_._2) === 1, s"cluster $cid keeps")
    }
  }

  test("imageScreen: batch images drop on a store hash hit; undecodable batch rows pass flagged") {
    // batch = ids % 10 == 0: 0 (quarantined: 0 % 19 == 0), 50 (g1 v2),
    // 480 (g10 v0 — novel). store: 49 (g1 v1 — within tau of 50)
    val all = docs(0L, 50L, 480L, 49L)
    val out = MediaCodec.imageScreen(all).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.keySet === Set(0L, 50L, 480L), "exactly the batch rows")
    assert(out(0L) === ((false, 0L, true)), "quarantined: passes the IMAGE screen, flagged")
    assert(out(50L)._1 && out(50L)._2 >= 1L && !out(50L)._3, "store near-dup screens out")
    assert(out(480L) === ((true, 0L, true)), "novel picture lands")
    // the arbitrary-split core agrees with the modulus form
    val viaCore = MediaCodec.imageScreenAgainst(
      all.filter(col("doc_id") % 10 === 0), all.filter(col("doc_id") % 10 =!= 0))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(viaCore === out)
  }

  test("PhashIndex: write -> read -> probe row-equal to the in-session screen; append = union build") {
    import graft.mm.PhashIndex
    val all = Tables.documents(spark, sf).select("doc_id")
    val store = all.filter(col("doc_id") % 10 =!= 0)
    val batch = all.filter(col("doc_id") % 10 === 0)
    val dir = java.nio.file.Files.createTempDirectory("phash_idx_spec_").toString
    PhashIndex.write(store, dir)
    val viaDisk = PhashIndex.probe(spark, batch, dir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getBoolean(3))).sortBy(_._1)
    val inSession = MediaCodec.imageScreenAgainst(batch, store).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getBoolean(3))).sortBy(_._1)
    assert(viaDisk.toSeq === inSession.toSeq)
    // append the landed slice: the grown index equals a one-shot build
    // over the union (hash rows compared as sets)
    val landed = batch.filter(col("doc_id") % 20 === 0)
    PhashIndex.append(spark, landed, dir)
    val grown = PhashIndex.readHashes(spark, dir).collect()
      .map(_.toSeq).map(_.mkString("|")).sorted
    val oneShotDir = java.nio.file.Files.createTempDirectory("phash_idx_spec2_").toString
    PhashIndex.write(store.union(landed), oneShotDir)
    val oneShot = PhashIndex.readHashes(spark, oneShotDir).collect()
      .map(_.toSeq).map(_.mkString("|")).sorted
    assert(grown.toSeq === oneShot.toSeq)
    // corrupt layouts fail loudly
    intercept[IllegalArgumentException] {
      PhashIndex.readHashes(spark, dir + "_missing")
    }
  }

  test("imageDedup on the corpus: every same-group variant pair is present") {
    val corpus = Tables.documents(spark, sf).select("doc_id")
    val ids = corpus.as[Long].collect().filter(_ % 19 != 0)
    val expected = ids.groupBy(_ / 48).values.flatMap { grp =>
      for {
        a <- grp.toSeq; b <- grp.toSeq if a < b
        // same picture family: variants of one group with hamming <= 2
        if hamming(plantedBands(a), plantedBands(b)) <= 2
      } yield (a, b)
    }.toSet
    val got = MediaCodec.imageDedup(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.subsetOf(got),
      s"missing ${(expected -- got).take(5)} of ${expected.size}")
  }
}
