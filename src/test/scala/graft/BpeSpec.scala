package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

class BpeSpec extends SparkSpec {

  /** Independent driver-side greedy BPE: classic list fold per word,
    * rule by rule — the semantics the replace-chain must reproduce.
    */
  private def driverBpe(text: String, merges: Seq[(String, String)]): Seq[Seq[String]] = {
    val words = text.replace("|", "").split("\\s+").filter(_.nonEmpty).toSeq
    words.map { w =>
      merges.foldLeft(w.map(_.toString): Seq[String]) { case (toks, (a, b)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += a + b; i += 2 // consume both: no rescan of own output
          } else { out += toks(i); i += 1 }
        }
        out.toSeq
      }
    }
  }

  test("hand-pinned merges: chained rules, within-word only, unknown words split to chars") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the then and"),  // the->1 tok; then->the+n; and->1 tok
      (2L, "zzq"),           // no rules apply -> 3 char tokens
      (3L, ""),              // empty -> all zeros
      (4L, "a|b")            // reserved delimiter stripped -> "ab" -> 2 toks (a,b unmergeable)
    ).toDF("doc_id", "text")
    val got = Bpe.bpeTokenize(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((3L, 10L, 4L)), "the=1, then=2, and=1 -> 4 BPE tokens over 10 chars")
    assert(got(2L) === ((1L, 3L, 3L)))
    assert(got(3L) === ((0L, 0L, 0L)))
    assert(got(4L) === ((1L, 2L, 2L)))
  }

  test("overlapping candidates merge greedily left-to-right without rescanning") {
    import spark.implicits._
    val docs = Seq((1L, "aaa"), (2L, "aaaa"), (3L, "aaaaa")).toDF("doc_id", "text")
    val got = Bpe.bpeTokenize(docs, merges = Seq("a" -> "a")).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // aaa -> [aa, a]; aaaa -> [aa, aa]; aaaaa -> [aa, aa, a]
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 3L))
  }

  test("matches the driver-side greedy reimplementation on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val got = Bpe.bpeTokenize(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val words = driverBpe(text, Bpe.defaultMerges)
      val exp = (words.size.toLong, words.map(_.map(_.length).sum).sum.toLong,
        words.map(_.size).sum.toLong)
      assert(got(id) === exp, s"doc $id: expected $exp got ${got(id)}")
    }
    // BPE must actually compress vs characters on English-ish text
    val totalChars = got.values.map(_._2).sum.toDouble
    val totalToks = got.values.map(_._3).sum.toDouble
    assert(totalToks < totalChars * 0.80, s"merges should cut >20% of char tokens: $totalToks/$totalChars")
  }

  test("plan is a pure scan-side projection: no Exchange beyond the spread, no Join, no explode") {
    val plan = planOf(Bpe.bpeTokenize(Tables.documents(spark, sf)))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Generate"), plan)
    assert("Exchange".r.findAllIn(plan).size <= 1, s"only the Spread repartition may shuffle:\n$plan")
  }

  test("merge tokens containing the reserved delimiter or whitespace are rejected") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Bpe.bpeTokenize(docs, merges = Seq("a" -> "|")))
    intercept[IllegalArgumentException](Bpe.bpeTokenize(docs, merges = Seq("a b" -> "c")))
    intercept[IllegalArgumentException](Bpe.bpeTokenize(docs, merges = Seq("" -> "c")))
  }
}
