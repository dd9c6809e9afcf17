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
