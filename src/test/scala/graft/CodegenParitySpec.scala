package graft

import org.apache.spark.sql.DataFrame

import graft.dedup.Dedup
import graft.sim.Similarity

/** Codegen/interpreted parity net for the native expressions: every
  * custom Catalyst expression has BOTH a `doGenCode` (the hot path)
  * and an `eval`/`nullSafeEval` (the fallback Spark silently switches
  * to when a generated method fails to compile or codegen is
  * disabled). If the two implementations ever diverge, results change
  * silently with the execution mode — so each expression is driven
  * through a real query twice, once under the default codegen
  * pipeline and once with codegen forced OFF, and the result sets
  * must match exactly.
  */
class CodegenParitySpec extends SparkSpec {

  private def withInterpreted[A](body: => A): A = {
    val forced = Seq(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val prev = forced.map { case (k, _) => k -> spark.conf.getOption(k) }
    forced.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case a: Seq[_] => a.toList
      case x => x
    }).toSet

  private def assertParity(name: String)(build: => DataFrame): Unit = {
    val codegen = rows(build)
    val interpreted = withInterpreted(rows(build))
    assert(codegen === interpreted, s"$name diverges between codegen and interpreted eval")
    assert(codegen.nonEmpty, s"$name parity check ran on an empty result")
  }

  test("VecDot: brute top-k identical under codegen and interpreted eval") {
    assertParity("VecDot") {
      Similarity.bruteKnn(Tables.embeddings(spark, sf), nQueries = 4, k = 5)
    }
  }

  test("HyperplaneBuckets: bucket values identical under codegen and interpreted eval") {
    assertParity("HyperplaneBuckets") {
      Similarity.bucketedCorpus(Tables.embeddings(spark, sf), 4, 8)
        .selectExpr("vec_id", "buckets")
    }
  }

  test("SortedIntersectSize: exact ngram pairs identical under codegen and interpreted eval") {
    assertParity("SortedIntersectSize") {
      Dedup.ngramPairs(Tables.documents(spark, sf))
    }
  }

  test("RepetitionStats: repetition signals identical under codegen and interpreted eval") {
    assertParity("RepetitionStats") {
      graft.text.Text.repetition(Tables.documents(spark, sf))
    }
  }

  test("MisraGries: heavy hitters identical under codegen and interpreted eval") {
    // typed-imperative aggregate: the interpreted mode exercises the
    // non-codegen aggregate path end to end
    assertParity("MisraGries") {
      graft.text.Corpus.heavyHitters(Tables.documents(spark, sf))
    }
  }
}
