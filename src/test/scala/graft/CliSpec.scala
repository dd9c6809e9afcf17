package graft

import java.nio.file.{Files, Paths}
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.cli.{Args, Etl, Eval, PlotFeatureImportance, PlotThreshold, Serve, Train}
import graft.etl.Retention
import graft.ml.{Churn, Plots}

/** The per-stage CLI contract (reference Makefile: etl.py:154,
  * train.py:125, eval.py:22, serve_api.py) — the full Etl -> Train ->
  * Eval -> Serve loop driven through the actual `main`s, agreeing
  * with the library path the driver gate verifies.
  */
class CliSpec extends SparkSpec {

  // materialize the shared fixture session BEFORE any CLI main runs:
  // with a live default session the mains reuse it and never stop it;
  // otherwise a filtered run (-z) would let a main create and stop its
  // own, leaving follow-up model loads without a SparkContext
  private lazy val tmp = { SparkSpec.session; Files.createTempDirectory("graft-cli").toString }
  private lazy val processed = s"$tmp/processed"
  private lazy val modelOut = s"$tmp/model_out"

  test("Args: argparse-style flags, boolean flags, and required checks") {
    val a = Args.parse(Array("--in_dir", "/x", "--cv", "--port", "8080"))
    assert(a === Map("in_dir" -> "/x", "cv" -> "true", "port" -> "8080"))
    assert(Args.required(a, "in_dir") === "/x")
    intercept[IllegalArgumentException](Args.required(a, "out_dir"))
    intercept[IllegalArgumentException](Args.parse(Array("positional")))
  }

  test("Etl main writes features + partitioned splits that equal the library derivation") {
    Etl.main(Array("--in_dir", sf, "--out_dir", processed))
    val features = spark.read.parquet(s"$processed/features")
    val lib = Retention.customerFeatures(Tables.orders(spark, sf), Tables.lineitem(spark, sf))
    assert(features.collect().map(_.toSeq).toSet === lib.collect().map(_.toSeq).toSet)
    // splits: Hive-partitioned by split, same membership as withSplit
    val splits = spark.read.parquet(s"$processed/splits")
    assert(splits.columns.contains("split"))
    val got = splits.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Retention.withSplit(lib).groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.values.sum === lib.count())
  }

  test("Train main persists model, metrics.json, single-file CSVs, and decodable PNGs") {
    Train.main(Array("--in_dir", processed, "--out_dir", modelOut, "--thr_metric", "f1"))
    // metrics artifact: parses, records the metric, agrees with the
    // library path (same data, same deterministic single fit; the only
    // slack is float-sum ordering inside the LR fit, so AUC gets a
    // tolerance and the 0.01-grid threshold must land on the same row)
    val m = Churn.loadMetrics(s"$modelOut/metrics.json")
    assert(m.thrMetric === "f1")
    val lib = Churn.computeMetrics(spark, sf)
    assert(math.abs(m.valAucRoc - lib.valAucRoc) < 1e-3)
    assert(math.abs(m.valAucPr - lib.valAucPr) < 1e-3)
    assert(math.abs(m.bestThreshold - lib.bestThreshold) <= 0.02 + 1e-9)
    // model reloads and scores
    val model = Churn.load(s"$modelOut/model")
    assert(model.stages.length === 4)
    // single-file CSV artifacts with the reference's columns
    val coefLines = Files.readAllLines(Paths.get(s"$modelOut/coefficients.csv"))
    assert(coefLines.get(0) === "feature,coefficient,abs_coeff")
    assert(coefLines.size === Churn.featureCols.size + 1)
    val curveLines = Files.readAllLines(Paths.get(s"$modelOut/threshold_curve.csv"))
    assert(curveLines.get(0) === "threshold,precision,recall,f1")
    assert(curveLines.size === 102)
    // PNGs decode with sane dimensions and are not blank
    def nonBlank(path: String, minW: Int, minH: Int): Unit = {
      val img = ImageIO.read(new java.io.File(path))
      assert(img !== null, s"$path did not decode")
      assert(img.getWidth >= minW && img.getHeight >= minH, s"$path ${img.getWidth}x${img.getHeight}")
      val colors = (0 until img.getHeight by 7).flatMap(y =>
        (0 until img.getWidth by 7).map(x => img.getRGB(x, y))).toSet
      assert(colors.size > 8, s"$path looks blank (${colors.size} distinct sampled colors)")
    }
    nonBlank(s"$modelOut/threshold_curve.png", 800, 600)
    nonBlank(s"$modelOut/feature_importance.png", 800, 400)
  }

  test("Eval main reads the threshold back and its confusion agrees with the library query") {
    val outJson = s"$tmp/confusion.json"
    Eval.main(Array("--in_dir", processed, "--model_dir", s"$modelOut/model",
      "--out_json", outJson))
    val text = Files.readString(Paths.get(outJson))
    def num(k: String): Double =
      ("\"" + k + "\"\\s*:\\s*(-?[0-9.eE+-]+)").r.findFirstMatchIn(text).get.group(1).toDouble
    // cells partition the test split
    val nTest = spark.read.parquet(s"$processed/splits")
      .filter(col("split") === "test").count()
    assert(num("tp") + num("fp") + num("tn") + num("fn") === nTest.toDouble)
    // the threshold is the persisted one from Train's metrics.json
    assert(num("threshold") === Churn.loadMetrics(s"$modelOut/metrics.json").bestThreshold)
    // and the confusion agrees with the library query at that threshold
    val libRow = Churn.evalConfusionAt(spark, sf, num("threshold")).head()
    assert(Seq(num("tp"), num("fp"), num("tn"), num("fn"))
      === Seq(libRow.getLong(1), libRow.getLong(2), libRow.getLong(3), libRow.getLong(4)).map(_.toDouble))
    assert(num("test_auc_roc") > 0.0 && num("test_auc_roc") <= 1.0)
  }

  test("Eval main falls back to threshold 0.5 without a metrics artifact") {
    val outJson = s"$tmp/confusion_fallback.json"
    Eval.main(Array("--in_dir", processed, "--model_dir", s"$modelOut/model",
      "--metrics_path", s"$tmp/does_not_exist.json", "--out_json", outJson))
    val text = Files.readString(Paths.get(outJson))
    assert("\"threshold\"\\s*:\\s*0\\.5".r.findFirstIn(text).isDefined)
  }

  test("Serve main contract: /health reflects the persisted threshold, /predict scores") {
    val (server, port) = Serve.run(spark, Map(
      "model_dir" -> s"$modelOut/model", "metrics_path" -> s"$modelOut/metrics.json"))
    try {
      def get(path: String): String = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path").openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        try new String(conn.getInputStream.readAllBytes(), "UTF-8") finally conn.disconnect()
      }
      val health = get("/health")
      val thr = Churn.loadMetrics(s"$modelOut/metrics.json").bestThreshold
      assert(health.contains("\"status\":\"ok\"") && health.contains(thr.toString))
      val conn = new java.net.URL(s"http://127.0.0.1:$port/predict").openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write("""{"features":{"total_orders":3.0}}""".getBytes("UTF-8"))
      val resp = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      conn.disconnect()
      assert(resp.contains("probability") && resp.contains("prediction"))
    } finally server.stop()
  }

  test("PlotThreshold renders any split (reference SPLIT=test workflow); marker present; splits differ") {
    val (valPng, valCsv) = (s"$tmp/thr_val.png", s"$tmp/thr_val.csv")
    val (testPng, testCsv) = (s"$tmp/thr_test.png", s"$tmp/thr_test.csv")
    PlotThreshold.main(Array("--in_dir", processed, "--model_dir", s"$modelOut/model",
      "--split", "val", "--out", valPng, "--csv_out", valCsv))
    PlotThreshold.main(Array("--in_dir", processed, "--model_dir", s"$modelOut/model",
      "--split", "test", "--out", testPng, "--csv_out", testCsv))
    // both CSVs carry the full 101-point sweep with the reference header
    val vl = Files.readAllLines(Paths.get(valCsv))
    val tl = Files.readAllLines(Paths.get(testCsv))
    assert(vl.get(0) === "threshold,precision,recall,f1" && vl.size === 102)
    assert(tl.size === 102)
    // different split populations => different curves (the point of --split)
    assert(vl !== tl, "val and test sweeps must differ on this data")
    // the val-split CSV equals Train's (same model, same split, same sweep)
    val trainCsv = Files.readAllLines(Paths.get(s"$modelOut/threshold_curve.csv"))
    assert(vl === trainCsv)
    // PNGs decode, differ, and carry the dashed best-threshold marker
    // (Color.GRAY appears in thresholdCurve ONLY via the marker+legend)
    def pixels(p: String): Set[Int] = {
      val img = ImageIO.read(new java.io.File(p))
      assert(img !== null)
      assert(img.getWidth === 1050)
      (0 until img.getHeight).flatMap(y =>
        (0 until img.getWidth by 2).map(x => img.getRGB(x, y) & 0xffffff)).toSet
    }
    assert(pixels(testPng).contains(0x808080), "best-threshold marker missing")
    assert(!java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(valPng)), Files.readAllBytes(Paths.get(testPng))))
    intercept[IllegalArgumentException](PlotThreshold.main(
      Array("--in_dir", processed, "--model_dir", s"$modelOut/model", "--split", "bogus")))
  }

  test("PlotFeatureImportance --top N plots exactly min(N, n_features) bars") {
    val coefCsv = s"$modelOut/coefficients.csv"
    val nFeatures = Churn.featureCols.size
    // bar geometry: height = top(70) + n*(barH 34 + gap 14) + bottom(40)
    def barCount(p: String): Int = (ImageIO.read(new java.io.File(p)).getHeight - 110) / 48
    val top3 = s"$tmp/fi_top3.png"
    PlotFeatureImportance.main(Array("--coef_csv", coefCsv, "--out", top3, "--top", "3"))
    assert(barCount(top3) === 3)
    val all = s"$tmp/fi_all.png"
    PlotFeatureImportance.main(Array("--coef_csv", coefCsv, "--out", all))
    assert(barCount(all) === nFeatures)
    val top99 = s"$tmp/fi_top99.png"
    PlotFeatureImportance.main(Array("--coef_csv", coefCsv, "--out", top99, "--top", "99"))
    assert(barCount(top99) === nFeatures)
    // a CSV without the reference columns is rejected, like load_coefficients
    val bad = s"$tmp/bad_coef.csv"
    Files.writeString(Paths.get(bad), "name,value\nx,1.0\n")
    intercept[IllegalArgumentException](PlotFeatureImportance.main(
      Array("--coef_csv", bad, "--out", s"$tmp/never.png")))
  }

  test("Eval main default metrics_path resolves without --metrics_path (model-dir then parent)") {
    val outJson = s"$tmp/confusion_default_path.json"
    // no --metrics_path: Train wrote metrics.json to the model dir's
    // PARENT, so the fallback must find it (and a parentless relative
    // model_dir must not NPE — the reference-contract regression)
    Eval.main(Array("--in_dir", processed, "--model_dir", s"$modelOut/model",
      "--out_json", outJson))
    val text = Files.readString(Paths.get(outJson))
    val persisted = Churn.loadMetrics(s"$modelOut/metrics.json").bestThreshold
    assert(text.contains(s""""threshold": $persisted"""),
      s"default metrics_path did not pick up the persisted threshold $persisted:\n$text")
  }

  test("Train main --cv true runs the reference CV grid (slow; set GRAFT_SLOW_TESTS=1)") {
    assume(sys.env.contains("GRAFT_SLOW_TESTS"), "set GRAFT_SLOW_TESTS=1 to run")
    // self-sufficient under test filtering (-z): etl if splits absent
    if (!Files.exists(Paths.get(s"$processed/splits")))
      Etl.main(Array("--in_dir", sf, "--out_dir", processed))
    val cvOut = s"$tmp/model_cv"
    Train.main(Array("--in_dir", processed, "--out_dir", cvOut,
      "--cv", "true", "--cv_parallelism", "4", "--metric", "aucroc", "--thr_metric", "recall"))
    val m = Churn.loadMetrics(s"$cvOut/metrics.json")
    assert(m.thrMetric === "recall" && m.bestThreshold === 0.0) // recall ties -> lowest
    assert(Churn.load(s"$cvOut/model").stages.length === 4)
  }

  test("Plots render constructed inputs with the advertised geometry") {
    val curve = s"$tmp/unit_curve.png"
    Plots.thresholdCurve(
      (0 to 100).map { i => val t = i / 100.0; (t, 1.0 - t, t, 0.5) },
      bestThr = Some(0.42), path = curve)
    val img = ImageIO.read(new java.io.File(curve))
    assert(img.getWidth === 1050 && img.getHeight === 750)
    val bars = s"$tmp/unit_bars.png"
    Plots.featureImportance(Seq(("a", 1.5), ("b", -0.7), ("c", 0.01)), bars)
    val bimg = ImageIO.read(new java.io.File(bars))
    assert(bimg.getWidth === 1100 && bimg.getHeight > 150)
    // positive bar red pixels and negative bar blue pixels both present
    val rgbs = (0 until bimg.getHeight).flatMap(y =>
      (0 until bimg.getWidth by 3).map(x => bimg.getRGB(x, y) & 0xffffff)).toSet
    assert(rgbs.contains(0xd62728), "positive (red) bar missing")
    assert(rgbs.contains(0x1f77b4), "negative (blue) bar missing")
    intercept[IllegalArgumentException](Plots.thresholdCurve(Nil, None, s"$tmp/x.png"))
  }
}
