package graft

import graft.mm.GifDedup

class GifDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Long*) = ids.toSeq.toDF("doc_id")

  /** A doc's expected distinct frame-signature set straight from the
    * planting arithmetic — no GIF encode/walk in the loop (what the
    * REAL sub-block walk must recover).
    */
  private def plantedSigs(id: Long): Set[Long] = {
    val g = id / 48L
    val v = math.floorMod(id, 3L)
    (0 until GifDedup.gdNFrames(g))
      .map(f => GifDedup.gdSig(g, GifDedup.gdCid(g, v, f))).toSet
  }

  private def containment(a: Set[Long], b: Set[Long]): Double =
    a.intersect(b).size.toDouble / a.size

  test("gifFrames: real sub-block walk recovers the planted-arithmetic signatures; quarantine fires") {
    // group 0 (n=4): 3 (v0), 4 (v1 re-timed), 5 (v2 frame replaced);
    // group 1 (n=5): 48; 19 is the truncated quarantine case
    val ids = Seq(3L, 4L, 5L, 48L, 19L)
    val out = GifDedup.gifFrames(docs(ids: _*)).collect()
      .groupBy(_.getLong(0))
    ids.filter(_ % 19 != 0).foreach { id =>
      val rows = out(id)
      assert(rows.forall(_.getString(3) === ""), s"doc $id decodes")
      assert(rows.length === GifDedup.gdNFrames(id / 48L), s"doc $id frame count")
      assert(rows.map(_.getLong(1)).sorted.toSeq ===
        (0L until rows.length.toLong), s"doc $id positions")
      assert(rows.map(_.getLong(2)).toSet === plantedSigs(id),
        s"doc $id walked signatures == planting arithmetic")
    }
    val q = out(19L)
    assert(q.length === 1 && q.head.getString(3) === "truncated_block" &&
      q.head.getLong(1) === -1L, "truncated payload quarantines")
  }

  test("signature space is injective in (group, content id) — the r12 256-value collapse is gone") {
    // the old (g*13 + cid*29 + j*41) % 256 byte arithmetic gave the
    // whole 64-bit signature only 256 distinct values, so unrelated
    // groups (e.g. 0 and 81) shared frames and the pair output grew
    // quadratically with corpus size. Now bytes 0-3 are a unit-odd
    // multiple of g mod 2^32 and bytes 4-5 of cid mod 2^16: distinct
    // (g, cid) must map to distinct signatures.
    val sigs = for {
      g <- 0L until 2048L
      cid <- (0L until 8L) ++ (100L until 108L)
    } yield GifDedup.gdSig(g, cid)
    assert(sigs.distinct.size === sigs.size, "all (g, cid) signatures distinct")
    // the ADVICE repro: groups 0 and 81 previously shared 3 of 4 frames
    assert(plantedSigs(0L).intersect(plantedSigs(81L * 48L)).isEmpty)
  }

  test("no cross-group pairs over a doc range spanning well past 81 groups") {
    // one v0 doc per group across 300 groups: ANY emitted pair would
    // be cross-group. Under the injective signature space the
    // frame-sig equi-join generates zero candidates.
    val ids = (0L until 300L).map(_ * 48L).filter(_ % 19 != 0)
    assert(GifDedup.gifDedup(docs(ids: _*)).count() === 0L,
      "unrelated groups share no frames — pair output stays group-bounded")
  }

  test("re-timed twin C=1 both ways; frame-replaced variant sits exactly on the C=3/4 boundary") {
    // group 0 has n=4, so v2 (one frame replaced) has containment
    // exactly 3/4 with v0/v1 — IN at tau=0.75, OUT at tau=0.76.
    // ids 3/4/5 (v0/v1/v2): doc 0 would be the %19 quarantine case.
    val ids = Seq(3L, 4L, 5L)
    val out = GifDedup.gifDedup(docs(ids: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(out((3L, 4L)) === 1.0 && out((4L, 3L)) === 1.0,
      "re-timed re-encode (different delay bytes, same pictures) contains both ways")
    Seq((3L, 5L), (5L, 3L), (4L, 5L), (5L, 4L)).foreach { p =>
      assert(out(p) === 0.75, s"replaced-frame pair $p at the boundary")
    }
    val strict = GifDedup.gifDedup(docs(ids: _*), tau = 0.76).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict === Set((3L, 4L), (4L, 3L)),
      "tau just above the boundary keeps only the re-timed twin")
  }

  test("gifDedup equals a brute driver-side containment scan; quarantine never pairs") {
    // mixed groups and variants plus the quarantined doc 19 (group 0)
    val ids = Seq(0L, 1L, 2L, 19L, 48L, 49L, 50L, 96L, 97L)
    val out = GifDedup.gifDedup(docs(ids: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(!out.exists(t => t._1 == 19L || t._2 == 19L), "quarantined never pairs")
    val decodable = ids.filter(_ % 19 != 0)
    val brute = (for {
      a <- decodable; b <- decodable if a != b
      sa = plantedSigs(a); sb = plantedSigs(b)
      c = containment(sa, sb) if c >= 0.75
    } yield (a, b, sa.intersect(sb).size.toLong, sa.size.toLong,
      math.floor(c * 1e6 + 0.5) / 1e6)).toSet
    assert(out.toSet === brute, "banded pairs == brute asymmetric containment")
  }
}
