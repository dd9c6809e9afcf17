package graft

import org.apache.spark.sql.functions._

import graft.text.{LangModel, Text}

class LangModelSpec extends SparkSpec {

  test("surprisal: hand corpus matches the micro-nat fixed-point formula") {
    import spark.implicits._
    // corpus: "a a a a" + "a b" => cnt(a)=5, cnt(b)=1, N=6
    val docs = Seq((1L, "a a a a"), (2L, "a b"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    def micro(tf: Long, cnt: Long): Long =
      math.floor(tf * math.log(6.0 / cnt) * 1e6 + 0.5).toLong
    def score(parts: (Long, Long)*): Double = {
      val m = parts.map { case (tf, cnt) => micro(tf, cnt) }.sum
      val n = parts.map(_._1).sum
      math.floor(m / 1e6 / n * 1e6 + 0.5) / 1e6
    }
    val got = LangModel.surprisal(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map(
      1L -> ((4L, score((4L, 5L)))),
      2L -> ((2L, score((1L, 5L), (1L, 1L))))))
    // the all-common-token doc scores strictly lower than the one
    // holding the rare token
    assert(got(1L)._2 < got(2L)._2)
  }

  test("surprisalBigram equals a driver-side reimplementation on a fixed-seed random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val texts = (0L until 30L).map { id =>
      // include sub-bigram docs (0/1 tokens) to pin the exclusion rule
      val n = rnd.nextInt(10)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = texts.toDF("doc_id", "text")
    val lambda = 0.75
    val toks = texts.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toVector }.toMap
    val uni = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTotal = uni.values.sum
    val bigrams = toks.values.flatMap(ts => ts.zip(ts.drop(1))).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val expect = toks.collect { case (id, ts) if ts.size >= 2 =>
      val bf = ts.zip(ts.drop(1)).groupBy(identity).view.mapValues(_.size.toLong)
      val micro = bf.map { case ((w1, w2), f) =>
        val p = lambda * (bigrams((w1, w2)).toDouble / uni(w1)) +
          (1.0 - lambda) * (uni(w2).toDouble / nTotal)
        math.floor(f * -math.log(p) * 1e6 + 0.5).toLong
      }.sum
      val n = ts.size - 1L
      id -> ((n, math.floor(micro / 1e6 / n * 1e6 + 0.5) / 1e6))
    }
    val got = LangModel.surprisalBigram(docs, lambda).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === expect)
    assert(got.nonEmpty && got.keySet === toks.filter(_._2.size >= 2).keySet)
  }

  test("surprisalBigram on real docs: templated word order scores below shuffled order") {
    val docs = Tables.documents(spark, sf)
    val s = LangModel.surprisalBigram(docs)
    assert(s.filter(col("avg_nats") < 0).count() === 0)
    // n_bigrams = n_tokens - 1 for every doc with >= 2 tokens
    val ts = Text.tokenStats(docs).select(col("doc_id"), col("n_tokens").as("n_ws"))
    val joined = s.join(ts, "doc_id")
    assert(joined.filter(col("n_bigrams") =!= col("n_ws") - 1).count() === 0)
    assert(s.count() === ts.filter(col("n_ws") >= 2).count())
    // order sensitivity — the point of the bigram rung: a corpus whose
    // docs repeat one bigram pattern scores lower than the same tokens
    // in a broken order with the same unigram profile
    import spark.implicits._
    val patterned = (0L until 20L).map(i => (i, "x1 y2 " * 10)).toDF("doc_id", "text")
    val broken = (0L until 20L).map { i =>
      (i, (if (i % 2 == 0) "x1 x1 y2 y2 " else "y2 x1 x1 y2 ") * 5)
    }.toDF("doc_id", "text")
    def mean(df: org.apache.spark.sql.DataFrame) =
      LangModel.surprisalBigram(df).agg(avg(col("avg_nats"))).head().getDouble(0)
    assert(mean(patterned) < mean(broken), "repeated bigram pattern must score lower")
  }

  test("surprisal on real docs: positive scores, token counts agree with tokenStats") {
    val docs = Tables.documents(spark, sf)
    val s = LangModel.surprisal(docs)
    assert(s.filter(col("avg_nats") < 0).count() === 0)
    val ts = Text.tokenStats(docs).select(col("doc_id"), col("n_tokens").as("n_ws"))
    val joined = s.join(ts, "doc_id")
    assert(joined.filter(col("n_tokens") =!= col("n_ws")).count() === 0)
    // every non-empty doc is scored
    assert(s.count() === ts.filter(col("n_ws") > 0).count())
  }
}
