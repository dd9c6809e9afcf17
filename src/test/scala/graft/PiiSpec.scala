package graft

import org.apache.spark.sql.functions._

import graft.text.Pii

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Long*) =
    ids.toSeq.map(i => (i, s"plain text body $i")).toDF("doc_id", "text")

  /** Independent driver-side Luhn validity (full 16-digit string). */
  private def luhnOk(s: String): Boolean = {
    val sum = s.zipWithIndex.map { case (ch, idx) =>
      val d = ch - '0'
      // idx 0-based from the left; 16-length: double even idx (odd 1-based)
      if (idx % 2 == 0) { val dd = 2 * d; if (dd > 9) dd - 9 else dd } else d
    }.sum
    sum % 10 == 0
  }

  test("piiScrub: each planted modulus lands its one PII shape; nothing else fires") {
    // 1: nothing; 5: email; 7: ip; 17: bad ip; 22: card (even=Luhn-ok);
    // 33: card (odd=Luhn-broken); 13: phone
    val out = Pii.piiScrub(docs(1L, 5L, 7L, 17L, 22L, 33L, 13L))
      .collect().map(r => r.getLong(0) -> r).toMap
    def counts(id: Long) = {
      val r = out(id)
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getBoolean(8))
    }
    assert(counts(1L)  === ((0L, 0L, 0L, 0L, 0L, 0L, false)))
    assert(counts(5L)  === ((1L, 0L, 0L, 0L, 0L, 0L, true)), "email")
    assert(counts(7L)  === ((0L, 0L, 1L, 1L, 0L, 0L, true)), "valid ip")
    assert(counts(17L) === ((0L, 0L, 1L, 0L, 0L, 0L, false)), "lookalike ip: candidate, not valid")
    assert(counts(22L) === ((0L, 0L, 0L, 0L, 1L, 1L, true)), "Luhn-valid card")
    assert(counts(33L) === ((0L, 0L, 0L, 0L, 1L, 0L, false)), "Luhn-broken card (33 % 11 = 0, odd)")
    assert(counts(13L) === ((0L, 1L, 0L, 0L, 0L, 0L, true)), "phone")
  }

  test("piiScrub: planted card Luhn validity matches an independent driver implementation") {
    val cards = docs(22L, 44L, 33L, 55L)
      .select(col("doc_id"), Pii.cardCol(col("doc_id")).as("card"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cards.foreach { case (id, c) =>
      assert(c.length === 16)
      assert(luhnOk(c) === (id % 2 == 0), s"doc $id card $c")
    }
  }

  test("piiScrub: redaction scrubs every candidate (lookalikes included), text order intact") {
    val out = Pii.piiScrub(docs(5L, 17L, 22L, 13L))
      .collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(out(5L) === "plain text body 5 contact <email>")
    assert(out(17L) === "plain text body 17 at <ip>", "conservative: lookalike scrubbed too")
    assert(out(22L) === "plain text body 22 card <card>")
    assert(out(13L) === "plain text body 13 tel <phone>")
  }

  test("piiScrub on the corpus: counts follow the planting arithmetic exactly") {
    val corpus = Tables.documents(spark, sf)
    val out = Pii.piiScrub(corpus).collect()
    assert(out.length === corpus.count())
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === (if (id % 5 == 0) 1L else 0L), s"emails doc $id")
      assert(r.getLong(2) === (if (id % 13 == 0) 1L else 0L), s"phones doc $id")
      val ipCands = (if (id % 7 == 0) 1L else 0L) + (if (id % 17 == 0) 1L else 0L)
      assert(r.getLong(3) === ipCands, s"ip candidates doc $id")
      assert(r.getLong(4) === (if (id % 7 == 0) 1L else 0L), s"valid ips doc $id")
      assert(r.getLong(5) === (if (id % 11 == 0) 1L else 0L), s"card candidates doc $id")
      assert(r.getLong(6) === (if (id % 11 == 0 && id % 2 == 0) 1L else 0L), s"valid cards doc $id")
      val expectPii = id % 5 == 0 || id % 13 == 0 || id % 7 == 0 ||
        (id % 11 == 0 && id % 2 == 0)
      assert(r.getBoolean(8) === expectPii, s"has_pii doc $id")
    }
    // the verdict is non-degenerate both ways
    val n = out.count(_.getBoolean(8))
    assert(n > 0 && n < out.length)
  }

  test("policyReport: conjunction equals its constituents; pii vetoes regardless of quality") {
    val corpus = Tables.documents(spark, sf)
    val out = Pii.policyReport(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out.size === corpus.count())
    val gopher = graft.text.Text.gopherFilter(corpus, minStopwords = 1L).collect()
      .map(r => r.getLong(0) -> r.getBoolean(11)).toMap
    val pii = Pii.piiScrub(corpus).collect()
      .map(r => r.getLong(0) -> r.getBoolean(8)).toMap
    out.foreach { case (id, (g, c, p, q, keep)) =>
      assert(g === gopher(id), s"doc $id gopher")
      assert(p === pii(id), s"doc $id pii")
      assert(keep === (g && c && !p), s"doc $id conjunction")
      assert(q >= 0.0 && q <= 1.0)
    }
    // a doc with validated PII never ships, even at top quality
    out.values.filter(_._3).foreach(v => assert(!v._5, "pii veto"))
    val kept = out.values.count(_._5)
    assert(kept > 0 && kept < out.size, s"degenerate policy: $kept/${out.size}")
  }
}
