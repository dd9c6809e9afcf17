package graft

import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.sql.functions._

import graft.etl.Retention
import graft.ml.Churn

class ChurnSpec extends SparkSpec {
  import spark.implicits._

  test("aucTable: exact Mann-Whitney on a hand-computed example") {
    // pos@0.9, neg@0.8, pos@0.7, neg@0.6 -> 3 of 4 pairs ordered -> 0.75
    val pred = Seq((1.0, 0.9), (0.0, 0.8), (1.0, 0.7), (0.0, 0.6)).toDF("label", "p1")
    val r = Churn.aucTable(pred).head()
    assert(r.getDouble(0) === 0.75)
    assert(r.getLong(2) === 2L && r.getLong(3) === 2L)
  }

  test("aucTable: ties contribute half (all-tied scores give AUC 0.5)") {
    val pred = Seq((1.0, 0.5), (0.0, 0.5), (1.0, 0.5), (0.0, 0.5)).toDF("label", "p1")
    assert(Churn.aucTable(pred).head().getDouble(0) === 0.5)
  }

  test("aucTable matches MLlib's evaluator on real model predictions") {
    // like-for-like: aucTable quantizes p1 to 6 dp (the bounded-window
    // scale design), so MLlib must score the SAME quantized column —
    // comparing against raw scores would differ by 1/(2·P·N) whenever
    // two raw scores land in one quantization cell, and whether that
    // happens depends on the fit's seed/data, a latent flake
    val pred = Churn.predictions(spark, sf, "test")
      .withColumn("p1", Det.r(col("p1"), 6)).cache()
    val ours = Churn.aucTable(pred).head().getDouble(0)
    val mllib = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("p1").setMetricName("areaUnderROC")
      .evaluate(pred)
    assert(math.abs(ours - mllib) < 1e-6, s"ours=$ours mllib=$mllib")
  }

  test("quantized AUC drifts < 1e-4 from MLlib on the RAW scores") {
    // aucTable quantizes p1 to 6 dp internally (the bounded-window
    // scale design); this pins the documented claim that quantization
    // moves the statistic by less than reporting precision — the
    // like-for-like test above can't catch a large quantization error
    val pred = Churn.predictions(spark, sf, "test").cache()
    val ours = Churn.aucTable(pred).head().getDouble(0)
    val mllibRaw = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("p1").setMetricName("areaUnderROC")
      .evaluate(pred)
    assert(math.abs(ours - mllibRaw) < 1e-4, s"ours=$ours mllibRaw=$mllibRaw")
  }

  test("the pipeline learns a separable synthetic problem (AUC > 0.9)") {
    // testdata's synthetic dates carry no churn signal (~0.5 AUC
    // ceiling), so the learning gate runs on a constructed separable
    // set: one informative feature + deterministic noise.
    val rows = (0 until 400).map { i =>
      val label = (i % 2).toDouble
      val noise = (i % 7) * 0.1
      (i.toLong, 2.0 + label, 10.0 + noise, label * 10.0 + noise, 5.0, 3.0 + label,
        1.0, noise, 30.0 - label * 5, math.log1p(label * 10.0 + noise), 0.5, label)
    }.toDF(("custkey" +: Churn.featureCols :+ "label"): _*)
    val train = Retention.withClassWeights(rows)
    val model = Churn.buildPipeline()._1.fit(train)
    val pred = model.transform(train)
      .select(col("label"),
        org.apache.spark.ml.functions.vector_to_array(col("probability")).getItem(1).as("p1"))
    val auc = Churn.aucTable(pred).head().getDouble(0)
    assert(auc > 0.9, s"separable AUC $auc")
  }

  test("thresholdSweep: hand-computed confusion counts at key thresholds") {
    val pred = Seq((1.0, 0.95), (0.0, 0.85), (1.0, 0.75), (0.0, 0.65), (1.0, 0.55), (1.0, 1.0))
      .toDF("label", "p1")
    val sweep = Churn.thresholdSweep(pred).cache()
    assert(sweep.count() === 101)
    val at = sweep.collect().map(r => r.getDouble(0) -> r).toMap
    val t80 = at(0.8)
    assert(t80.getLong(1) === 2L && t80.getLong(2) === 1L) // tp=0.95,1.0; fp=0.85
    val t0 = at(0.0)
    assert(t0.getLong(1) === 4L && t0.getLong(3) === 0L) // everything positive
    val t100 = at(1.0)
    assert(t100.getLong(1) === 1L) // only p1 == 1.0 survives the last cut
  }

  test("thresholdSweep on real predictions: recall and tp non-increasing") {
    val sweep = Churn.thresholdSweepQuery(spark, sf)
      .orderBy("threshold").collect()
    val tps = sweep.map(_.getLong(1))
    assert(tps.zip(tps.tail).forall { case (a, b) => a >= b })
    val recalls = sweep.map(_.getDouble(6))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b })
  }

  test("evalConfusion: cells partition the test split; pos_rate consistent") {
    val r = Churn.evalConfusion(spark, sf).head()
    val (tp, fp, tn, fn) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val n = Churn.split(spark, sf, "test").count()
    assert(tp + fp + tn + fn === n)
    val posRate = r.getDouble(8)
    val expected = math.floor((tp + fn).toDouble / n * 1e6 + 0.5) / 1e6
    assert(posRate === expected)
  }

  test("coefficient table: one row per feature, sorted by |coef| desc") {
    val rows = Churn.coefficientTable(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet === Churn.featureCols.toSet)
    val abs = rows.map(_.getDouble(2))
    assert(abs.zip(abs.tail).forall { case (a, b) => a >= b })
  }

  test("Scorer: missing features default to 0.0 and produce a valid score") {
    val sc = Churn.scorer(spark, sf)
    val (p1, predLabel) = sc.scoreOne(spark, Map("total_orders" -> 3.0, "unknown_feature" -> 99.0))
    assert(p1 >= 0.0 && p1 <= 1.0)
    assert(predLabel === 0.0 || predLabel === 1.0)
    val (pEmpty, _) = sc.scoreOne(spark, Map.empty)
    assert(pEmpty >= 0.0 && pEmpty <= 1.0)
  }

  test("model save/load round-trips: loaded model scores identically") {
    val model = Churn.fitted(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    Churn.save(model, dir)
    val loaded = Churn.load(dir)
    val data = Churn.split(spark, sf, "test").limit(20)
    val p = (m: org.apache.spark.ml.PipelineModel) =>
      m.transform(data)
        .select(col("custkey"),
          org.apache.spark.ml.functions.vector_to_array(col("probability")).getItem(1).as("p1"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p(model) === p(loaded))
  }

  test("cross-validator wiring: 3 folds over the 3x3 grid (train.py:160-173)") {
    val cv = Churn.buildCrossValidator()
    assert(cv.getNumFolds === 3)
    assert(cv.getEstimatorParamMaps.length === 9)
  }

  test("calibration bins partition the test predictions and reaggregate to the base rate") {
    val cal = Churn.calibrationTable(spark, sf).collect()
    val pred = Churn.predictions(spark, sf, "test")
    assert(cal.map(_.getLong(1)).sum === pred.count())
    cal.foreach { r =>
      val (bin, n, meanP1, posRate) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(bin >= 0 && bin <= 9)
      assert(posRate >= 0.0 && posRate <= 1.0)
      // mean predicted probability sits inside its bin (6-dp rounding slack)
      assert(meanP1 >= bin / 10.0 - 1e-6 && meanP1 <= (bin + 1) / 10.0 + 1e-6,
        s"bin $bin: mean_p1 $meanP1 outside")
      assert(n > 0)
    }
    // weighted pos_rate equals the split's base rate (to rounding)
    val base = pred.agg(avg(col("label"))).head().getDouble(0)
    val weighted = cal.map(r => r.getLong(1) * r.getDouble(3)).sum / cal.map(_.getLong(1)).sum
    assert(math.abs(weighted - base) < 1e-4)
  }

  test("bestRow: each thr_metric selects its own maximum, ties to the lowest threshold") {
    // constructed sweep where the three metrics provably pick three
    // DIFFERENT rows: F1 peaks at 0.4, precision at 0.8, and recall
    // ties at 1.0 across 0.0-0.2 (must resolve to 0.0, the reference's
    // strict-greater ascending loop)
    val sweep = Seq(
      (0.0, 1.00, 0.30, 0.46),
      (0.1, 1.00, 0.35, 0.52),
      (0.2, 1.00, 0.40, 0.57),
      (0.4, 0.80, 0.70, 0.75),
      (0.8, 0.20, 0.95, 0.33)
    ).toDF("threshold", "recall", "precision", "f1")
    def pick(m: String) = Churn.bestRow(sweep, m).select("threshold").head().getDouble(0)
    assert(pick("f1") === 0.4)
    assert(pick("precision") === 0.8)
    assert(pick("recall") === 0.0) // tie at recall=1.0 -> lowest threshold
    intercept[IllegalArgumentException](Churn.bestRow(sweep, "accuracy"))
  }

  test("bestSweepRow(metric) on real predictions: recall picks t=0, per-metric optima dominate") {
    val rows = Churn.thresholdSweepQuery(spark, sf)
      .select("threshold", "precision", "recall", "f1").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    def best(m: String) = Churn.bestSweepRow(spark, sf, m)
      .select("threshold", "precision", "recall", "f1").head()
    // recall is maximal (=1 when positives exist) at threshold 0 and
    // ties resolve downward, so the recall-selected threshold is 0.0
    assert(best("recall").getDouble(0) === 0.0)
    // each selected row attains the sweep-wide max of its own metric
    assert(best("f1").getDouble(3) === rows.map(_._4).max)
    assert(best("precision").getDouble(1) === rows.map(_._2).max)
    assert(best("recall").getDouble(2) === rows.map(_._3).max)
    // and the metric name round-trips through the artifact
    val m = Churn.computeMetrics(spark, sf, "recall")
    assert(m.thrMetric === "recall" && m.bestThreshold === 0.0)
    val path = java.nio.file.Files.createTempDirectory("graft-metrics").toString + "/metrics.json"
    Churn.saveMetrics(m, path)
    assert(Churn.loadMetrics(path) === m)
  }

  test("full CV fit selects a model (slow, ~2 min; set GRAFT_SLOW_TESTS=1)") {
    // verified manually this round: 121s at sf0.001, avg metrics
    // 0.57-0.67 across the grid — gated so the default suite stays fast
    assume(sys.env.contains("GRAFT_SLOW_TESTS"), "set GRAFT_SLOW_TESTS=1 to run")
    val train = Retention.withClassWeights(Churn.split(spark, sf, "train")).cache()
    val cvm = Churn.cvFit(train)
    assert(cvm.avgMetrics.length === 9)
    assert(cvm.avgMetrics.forall(m => m >= 0.0 && m <= 1.0))
  }
}
