package graft

import org.apache.spark.sql.functions._

import graft.mm.AudioFp

class AudioFpSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Long*) = ids.toSeq.toDF("doc_id")

  /** Expected bands straight from the planting arithmetic — no RIFF
    * encode/decode in the loop (what the REAL decode must recover).
    */
  private def plantedBands(id: Long): Array[Long] =
    AudioFp.energyBands(Array.tabulate(AudioFp.fpFrames)(i => AudioFp.fpSample(id, i)))

  private def hamming(a: Array[Long], b: Array[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  test("audioFingerprint: real RIFF decode recovers the planted-arithmetic bands; quarantine fires") {
    val ids = Seq(3L, 4L, 5L, 19L, 6L, 48L)
    val out = AudioFp.audioFingerprint(docs(ids: _*))
      .collect().map(r => r.getLong(0) -> r).toMap
    ids.filter(_ % 19 != 0).foreach { id =>
      val r = out(id)
      assert(r.getString(6) === "")
      assert(r.getLong(1) === AudioFp.fpFrames.toLong, s"doc $id frame count")
      val expect = plantedBands(id)
      assert(Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
        expect.toSeq, s"doc $id bands")
      expect.foreach(b => assert(b >= 0L && b <= 0xffffL, "bands are 16-bit"))
    }
    val q = out(19L)
    assert(q.getString(6) === "truncated_header" && q.getLong(2) === -1L)
  }

  test("fingerprint invariances: x3 gain hashes EQUAL, one-segment edit within 2 bits") {
    // group 0 (ids 0..47): id 3 (v0 base), 4 (v1 gain), 5 (v2 segment edit)
    val base = plantedBands(3L)
    assert(plantedBands(4L).toSeq === base.toSeq,
      "positive gain scales every segment energy by the same factor — comparisons unchanged")
    val edited = plantedBands(5L)
    assert(hamming(base, edited) <= 2, "a one-segment edit touches at most 2 comparisons")
    // The ≥1-flip is a CONCRETE-VALUE fact, not a structural law: the
    // +5000 energy bump on segment t = g mod 65 flips (bit t−1 = 0) +
    // (bit t = 1) comparisons, which CAN be zero for some groups. For
    // group 0 the edited segment is t = 0 (no t−1 comparison) and bit
    // 0 of the pattern is bit 0 of CA = 1 (E(1) = 10150 > E(0) =
    // 10000 in the base), so the bumped E(0) = 15000 > E(1) flips
    // comparison 0 true → false: exactly one flip.
    assert(AudioFp.fpBit(0L, 0) === 1 &&
      AudioFp.fpEnergy(0L, 1) > AudioFp.fpEnergy(0L, 0),
      "group 0 pattern: comparison 0 is 1 in the base hash")
    assert(hamming(edited, base) === 1,
      "group 0's seg-0 edit overtakes E(1) — comparison 0 flips, nothing else moves")
    // different groups are different signals: the affine 32-bit mix
    // puts unrelated groups far apart in hash space (the injectivity
    // that keeps cliques group-local at every corpus size)
    assert(hamming(plantedBands(3L), plantedBands(48L)) > 2)
  }

  test("audioDedup: planted variant pairs recovered, quarantine excluded, pigeonhole-exact") {
    val ids = Seq(3L, 4L, 5L, 48L, 49L, 50L, 19L)
    val out = AudioFp.audioDedup(docs(ids: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = out.map(t => (t._1, t._2)).toSet
    assert(pairs.contains((3L, 4L)), "gain pair")
    assert(out.find(t => t._1 == 3L && t._2 == 4L).get._3 === 0L)
    assert(pairs.contains((3L, 5L)) && pairs.contains((4L, 5L)), "segment-edit pairs")
    assert(pairs.contains((48L, 49L)) && pairs.contains((48L, 50L)))
    assert(!out.exists(t => t._1 == 19L || t._2 == 19L), "quarantined never pairs")
    assert(out.forall(t => t._1 < t._2))
    assert(out.map(t => (t._1, t._2)).distinct.length === out.length, "pairs emitted once")
    // pigeonhole exactness: the banded join equals a brute-force
    // Hamming scan over the same fingerprints at tau=2
    val decodable = ids.filter(_ % 19 != 0)
    val brute = (for {
      a <- decodable; b <- decodable if a < b
      if hamming(plantedBands(a), plantedBands(b)) <= 2
    } yield (a, b)).toSet
    assert(pairs === brute, "banded candidates must equal the brute tau<=2 pair set")
  }

  test("audioDrop: first-wins survivor per cluster, singletons keep, quarantine absent") {
    val out = AudioFp.audioDrop(docs(3L, 4L, 5L, 48L, 19L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(!out.contains(19L), "quarantined doc must not get a verdict")
    assert(out(3L) === ((3L, true)), "cluster min keeps")
    assert(out(4L) === ((3L, false)) && out(5L) === ((3L, false)), "later members drop")
    assert(out(48L) === ((48L, true)), "singleton keeps")
  }

  test("audioScreen: batch verdicts match a driver recompute; undecodable passes with decoded=false") {
    val corpus = Tables.documents(spark, sf)
    val out = AudioFp.audioScreen(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getBoolean(3)))).toMap
    val ids = corpus.select("doc_id").collect().map(_.getLong(0))
    val store = ids.filter(i => i % 10 != 0 && i % 19 != 0).map(i => i -> plantedBands(i))
    ids.filter(_ % 10 == 0).foreach { id =>
      val (decoded, nDups, keep) = out(id)
      assert(decoded === (id % 19 != 0), s"doc $id decode verdict")
      val expect =
        if (id % 19 == 0) 0L
        else store.count { case (_, sb) => hamming(plantedBands(id), sb) <= 2 }.toLong
      assert(nDups === expect, s"doc $id store-dup count")
      assert(keep === (expect == 0L), s"doc $id keep verdict")
    }
  }

  test("fingerprint empty corpus and single doc behave") {
    val empty = AudioFp.audioFingerprint(Seq.empty[Long].toDF("doc_id"))
    assert(empty.count() === 0L)
    val one = AudioFp.audioDedup(docs(3L)).collect()
    assert(one.isEmpty, "a single clip pairs with nothing")
  }
}
