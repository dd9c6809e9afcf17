package graft

import org.apache.spark.sql.functions._

import graft.ml.{Churn, QualityFilter}

class QualityFilterSpec extends SparkSpec {

  test("learned filter separates its weak labels far beyond chance; predictions consistent") {
    val docs = Tables.documents(spark, sf)
    val scored = QualityFilter.trainScore(docs).localCheckpoint()
    // one verdict per document
    assert(scored.count() === docs.count())
    val rows = scored.collect()
    // both classes present at the default labelTau (the weak labels
    // are only worth learning if they split the corpus)
    val nPos = rows.count(_.getLong(1) == 1L)
    assert(nPos > 0 && nPos < rows.length, s"degenerate weak labels: $nPos/${rows.length}")
    // probabilities in range, prediction = thresholded probability
    rows.foreach { r =>
      val p = r.getDouble(2)
      assert(p >= 0.0 && p <= 1.0)
      assert(r.getLong(3) === (if (p >= 0.5) 1L else 0L))
    }
    // separation: the classifier must rank its own weak labels far
    // above chance (hashed stopword/length evidence is exactly what
    // the heuristic encodes) — the same distributed rank-statistic
    // AUC the churn family gates on
    val auc = Churn.aucTable(
      scored.select(col("weak_label").cast("double").as("label"), col("q_prob").as("p1")))
      .head().getDouble(0)
    assert(auc >= 0.75, s"learned quality filter AUC $auc below the separation floor")
  }

  test("write -> scoreFrom is row-identical to the in-session trainScore") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("qf_model_").toString
    try {
      QualityFilter.write(docs, dir)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      val fromDisk = rows(QualityFilter.scoreFrom(spark, dir, docs))
      val inSession = rows(QualityFilter.trainScore(docs))
      assert(fromDisk === inSession)
      assert(fromDisk.nonEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("capacity and supervision knobs behave: more features never hurt badly, labels follow tau") {
    val docs = Tables.documents(spark, sf)
    // a stricter label threshold can only shrink the positive class
    def pos(tau: Double) =
      QualityFilter.trainScore(docs, labelTau = tau).filter(col("weak_label") === 1L).count()
    val loose = pos(0.6)
    val strict = pos(0.66)
    assert(strict <= loose, s"stricter tau grew the positive class: $strict > $loose")
  }
}
