package graft

import graft.ml.Churn

/** The train-now/eval-later operational loop: metrics.json persistence
  * (reference train.py:176-189 / eval.py:30-40) and the CSV artifact
  * exports (threshold curve, coefficients).
  */
class ArtifactsSpec extends SparkSpec {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-artifacts").toString

  test("metrics artifact round-trips exactly") {
    val m = Churn.computeMetrics(spark, sf)
    val path = s"$tmp/metrics.json"
    Churn.saveMetrics(m, path)
    assert(Churn.loadMetrics(path) === m)
    assert(m.bestThreshold >= 0.0 && m.bestThreshold <= 1.0)
    assert(m.valAucRoc >= 0.0 && m.valAucRoc <= 1.0)
  }

  test("evalConfusion via the artifact path reproduces the in-plan query") {
    val path = s"$tmp/metrics2.json"
    Churn.saveMetrics(Churn.computeMetrics(spark, sf), path)
    val viaArtifact = Churn.evalConfusionFromArtifact(spark, sf, path).head()
    val inPlan = Churn.evalConfusion(spark, sf).head()
    assert(viaArtifact === inPlan)
  }

  test("scorer from the artifact uses the persisted threshold") {
    val path = s"$tmp/metrics3.json"
    val m = Churn.computeMetrics(spark, sf)
    Churn.saveMetrics(m, path)
    val sc = Churn.scorerFromArtifact(spark, sf, path)
    val (p1, pred) = sc.scoreOne(spark, Map("total_orders" -> 3.0))
    assert(pred === (if (p1 >= m.bestThreshold) 1.0 else 0.0))
  }

  test("threshold curve and coefficient CSVs carry the reference's columns") {
    Churn.exportThresholdCurve(spark, sf, s"$tmp/threshold_curve")
    Churn.exportCoefficients(spark, sf, s"$tmp/coefficients")
    val curve = spark.read.option("header", "true").csv(s"$tmp/threshold_curve")
    assert(curve.columns.toSeq === Seq("threshold", "precision", "recall", "f1"))
    assert(curve.count() === 101)
    val coefs = spark.read.option("header", "true").csv(s"$tmp/coefficients")
    assert(coefs.columns.toSeq === Seq("feature", "coefficient", "abs_coeff"))
    assert(coefs.count() === Churn.featureCols.size)
  }

  test("loadMetrics rejects a malformed artifact") {
    val path = s"$tmp/broken.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), """{"not_metrics": 1}""")
    intercept[IllegalArgumentException](Churn.loadMetrics(path))
  }
}
