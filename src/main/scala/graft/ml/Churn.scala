package graft.ml

import scala.collection.concurrent.TrieMap

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{Imputer, StandardScaler, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}
import graft.etl.Retention

/** Churn-model pipeline: train / evaluate / serve (reference
  * pipeline/train.py, eval.py, serve_api.py), re-expressed so every
  * evaluation metric is a constant number of Spark jobs.
  *
  * The reference's threshold grid search runs 3 counts x 101
  * thresholds = 303 Spark jobs (train.py:81-86); here the whole sweep
  * is ONE aggregation into a 101-bucket histogram plus window
  * cumulative sums over those 101 rows. The reference's AUC comes from
  * MLlib's evaluator; here AUC-ROC is the exact Mann-Whitney rank
  * statistic (tie-corrected) and AUC-PR the trapezoid over the
  * distinct-score PR curve, both computed in-plan.
  */
object Churn {

  /** Feature columns = everything the feature table carries except the
    * id and the label (reference train.py:35-37).
    */
  val featureCols: Seq[String] = Seq(
    "total_orders", "total_qty", "total_amount", "avg_order_amount",
    "distinct_products", "recent90_orders", "recent90_amount",
    "recency_days", "total_amount_log", "recent90_amount_log")

  /** Imputer -> VectorAssembler -> StandardScaler(withMean, withStd) ->
    * LogisticRegression(weightCol, maxIter=80) — reference
    * train.py:154-158. Returns the LR stage too so callers can build
    * hyperparameter grids against it.
    */
  def buildPipeline(maxIter: Int = 80): (Pipeline, LogisticRegression) = {
    val imputed = featureCols.map(_ + "_imp")
    val imputer = new Imputer().setInputCols(featureCols.toArray).setOutputCols(imputed.toArray)
    val assembler = new VectorAssembler().setInputCols(imputed.toArray).setOutputCol("features")
    val scaler = new StandardScaler()
      .setInputCol("features").setOutputCol("features_scaled")
      .setWithMean(true).setWithStd(true)
    val lr = new LogisticRegression()
      .setFeaturesCol("features_scaled").setLabelCol("label")
      .setWeightCol("class_weight").setMaxIter(maxIter)
    (new Pipeline().setStages(Array(imputer, assembler, scaler, lr)), lr)
  }

  /** 3-fold CV over regParam x elasticNetParam (reference
    * train.py:160-173). Exercised in ScalaTest at sf0.001; the
    * benchmark queries use the single default fit.
    */
  def buildCrossValidator(metric: String = "areaUnderPR", parallelism: Int = 4): CrossValidator = {
    val (pipeline, lr) = buildPipeline()
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.0, 0.01, 0.1))
      .addGrid(lr.elasticNetParam, Array(0.0, 0.5, 1.0))
      .build()
    val evaluator = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction").setMetricName(metric)
    new CrossValidator()
      .setEstimator(pipeline).setEstimatorParamMaps(grid).setEvaluator(evaluator)
      .setNumFolds(3).setParallelism(parallelism).setSeed(42)
  }

  def cvFit(train: DataFrame): CrossValidatorModel = buildCrossValidator().fit(train)

  // ------------------------------------------------------------------
  // Data plumbing: feature table + deterministic split + class weights.
  // ------------------------------------------------------------------
  /** Feature table per data directory, persisted: five ML queries (and
    * train + val + test splits within each) reuse it, so recomputing
    * the flagship join+aggregate per query would dominate their cost.
    * The reference caches its splits the same way (train.py:146-148).
    */
  // DataFrame caches are keyed by (session, dir): a cached plan is
  // bound to the session that built it, and returning it to a NEW
  // session (after the old one stopped) would throw at execution time.
  // Fitted models are session-independent (coefficients live on the
  // driver) so the model cache keys by dir alone.
  private def sessionKey(spark: SparkSession, dir: String): String =
    System.identityHashCode(spark) + "@" + dir

  // value = (persisted inner frame — what clearCaches must unpersist,
  // right-sized consumer view). The view is IterSized over the cached
  // blocks: the feature table is customers-sized (tiny at bench scale,
  // one task per 50k rows at any scale), but its natural partitioning
  // is the build join's shuffle width — so every one of the 5+ ML
  // consumers paid a full width of ~5 ms/task scheduling per scan
  // (measured: q_predict_batch's single job 182 ms @32c vs 68 ms @8c
  // for identical work). Values are partition-independent by the
  // engine's determinism policy, so the view changes no query result.
  private val featureCache = TrieMap.empty[String, (DataFrame, DataFrame)]

  def featuresWithSplit(spark: SparkSession, dir: String): DataFrame =
    featureCache.getOrElseUpdate(sessionKey(spark, dir), {
      val inner = Retention.withSplit(
        Retention.customerFeatures(Tables.orders(spark, dir), Tables.lineitem(spark, dir)))
        .persist()
      (inner, IterSized(inner))
    })._2

  def split(spark: SparkSession, dir: String, name: String): DataFrame =
    featuresWithSplit(spark, dir).filter(col("split") === name).drop("split")

  /** One fitted model per data directory. Every ML query needs the
    * trained model; fitting is by far the dominant cost, so Verify and
    * Bench (which call all five queries in one JVM) fit once. The LR
    * fit is deterministic for fixed data, so the cache does not change
    * results, only latency.
    */
  private val modelCache = TrieMap.empty[String, PipelineModel]

  def fitted(spark: SparkSession, dir: String): PipelineModel =
    modelCache.getOrElseUpdate(dir, {
      val train = Retention.withClassWeights(split(spark, dir, "train")).cache()
      // IterSized: the L-BFGS loop (maxIter 80) re-scans its instance
      // cache once per iteration, so the train frame's task count is
      // paid ~80x — right-size it to one task per 50k rows (narrow
      // coalesce, scale-adaptive no-op on big data). Model-dependent
      // consumers are all rows-only (float accumulation order moves
      // under coalescing); the hashed feature queries sit UPSTREAM of
      // the fit and are untouched.
      try buildPipeline()._1.fit(IterSized(train))
      finally train.unpersist()
    })

  /** Model persistence (reference train.py:178 / eval.py:50). */
  def save(model: PipelineModel, path: String): Unit = model.write.overwrite().save(path)
  def load(path: String): PipelineModel = PipelineModel.load(path)

  // (persisted inner, right-sized view) — the featureCache discipline:
  // scored rows are split-sized, and the sweep/confusion/AUC/batch
  // queries re-scan them many times per bench run
  private val predictionCache = TrieMap.empty[(String, String), (DataFrame, DataFrame)]

  /** (custkey, label, p1) scored rows for one split; persisted because
    * the sweep, confusion, and AUC queries all re-read them.
    */
  def predictions(spark: SparkSession, dir: String, splitName: String): DataFrame =
    predictionCache.getOrElseUpdate((sessionKey(spark, dir), splitName), {
      val m = fitted(spark, dir)
      val inner = m.transform(split(spark, dir, splitName))
        .select(col("custkey"), col("label"),
          vector_to_array(col("probability")).getItem(1).as("p1"))
        .persist()
      (inner, IterSized(inner))
    })._2

  // ------------------------------------------------------------------
  // q13: coefficient table (reference train.py:110-122) — feature,
  // coefficient, abs_coeff, sorted by |coef| descending.
  // ------------------------------------------------------------------
  def coefficientTable(spark: SparkSession, dir: String): DataFrame =
    coefficientTableOf(spark, fitted(spark, dir))

  /** Coefficient table from an explicit model — the CLI/eval-later
    * path where the model was loaded from disk, not cache-fitted.
    */
  def coefficientTableOf(spark: SparkSession, model: PipelineModel): DataFrame = {
    val lrm = model.stages.last.asInstanceOf[LogisticRegressionModel]
    val rows = featureCols.zip(lrm.coefficients.toArray).map { case (f, c) => (f, c, math.abs(c)) }
    import spark.implicits._
    rows.toSeq.toDF("feature", "coefficient", "abs_coeff")
      .orderBy(col("abs_coeff").desc, col("feature").asc)
  }

  // ------------------------------------------------------------------
  // q14: batch scoring (reference serve_api.py:120-166 / eval.py:50-54)
  // at the serve default threshold 0.5.
  // ------------------------------------------------------------------
  def predictBatch(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame =
    predictions(spark, dir, "test")
      .select(col("custkey"), col("label"),
        Det.r(col("p1"), 6).as("p1"),
        (col("p1") >= threshold).cast("double").as("prediction"))

  // ------------------------------------------------------------------
  // q15: the 101-threshold sweep as ONE aggregation.
  //
  // floor(p1*100) buckets every prediction; "p1 >= i/100" is then
  // "bucket >= i", so TP/FP/FN/TN at every threshold are suffix sums
  // of the 101-row histogram — window work over 101 rows, not 303 jobs
  // over the full data (reference train.py:58-102). The equivalence is
  // exact except when p1 lands within a double ulp of a threshold
  // whose *100 product rounds down (e.g. 0.29*100 = 28.999...) —
  // measure-zero for sigmoid outputs. Denominators use max(x, 1) like
  // the reference.
  // ------------------------------------------------------------------
  def thresholdSweep(pred: DataFrame): DataFrame = {
    val spark = pred.sparkSession
    val hist = pred
      .select(least(floor(col("p1") * 100).cast("int"), lit(100)).as("bucket"), col("label"))
      .groupBy("bucket")
      .agg(sum(col("label")).cast("long").as("pos"), count(lit(1)).as("n"))
    val full = spark.range(0, 101).select(col("id").cast("int").as("bucket"))
    // constant-partition windows: the input is exactly 101 rows at any
    // data size; Det.constKey (not a foldable lit) keeps Spark off its
    // "no partition defined" single-partition warning path.
    // ONE window spec (round 16): the totals ride the SAME desc sort
    // as the suffix sums via an unbounded frame — same integer sums,
    // one Window node + one Sort in the plan instead of two of each
    // (cold planning/codegen is the bench cost of this bounded query).
    val wSpec = Window.partitionBy(Det.constKey(col("bucket"))).orderBy(col("bucket").desc)
    val wDesc = wSpec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = wSpec.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = full.join(hist, Seq("bucket"), "left")
      .na.fill(0L, Seq("pos", "n"))
      .withColumn("tp", sum(col("pos")).over(wDesc))
      .withColumn("pp", sum(col("n")).over(wDesc))
      .withColumn("p_tot", sum(col("pos")).over(wAll))
      .withColumn("all_tot", sum(col("n")).over(wAll))
    val tp = col("tp"); val fp = col("pp") - col("tp")
    val fn = col("p_tot") - col("tp")
    val tn = col("all_tot") - col("pp") - fn
    val precision = tp.cast("double") / greatest(tp + fp, lit(1L)).cast("double")
    val recall    = tp.cast("double") / greatest(tp + fn, lit(1L)).cast("double")
    val f1 = lit(2.0) * precision * recall /
      greatest(precision + recall, lit(1e-9))
    cum.select(
      (col("bucket").cast("double") / 100.0).as("threshold"),
      tp.as("tp"), fp.as("fp"), fn.as("fn"), tn.as("tn"),
      Det.r(precision, 6).as("precision"),
      Det.r(recall, 6).as("recall"),
      Det.r(f1, 6).as("f1"))
  }

  def thresholdSweepQuery(spark: SparkSession, dir: String): DataFrame =
    thresholdSweep(predictions(spark, dir, "val"))

  /** The operating-point metrics the selector can optimize — mirrors
    * the reference CLI contract (train.py `--thr_metric
    * choices=["f1","recall","precision"]`, Makefile `THR_METRIC`).
    */
  val thresholdMetrics: Seq[String] = Seq("f1", "recall", "precision")

  /** Best operating row = max of the chosen metric on a sweep; ties
    * resolve to the LOWEST threshold (the reference's strict-greater
    * replacement over ascending thresholds keeps the first/lowest
    * too, train.py:93-102). ONE definition — bestThreshold (in-plan)
    * and computeMetrics (the persisted artifact) must never diverge
    * on the tie-break. Factored over an arbitrary sweep frame so
    * tests can pin the selector on constructed sweeps.
    */
  def bestRow(sweep: DataFrame, metric: String = "f1"): DataFrame = {
    require(thresholdMetrics.contains(metric),
      s"thr_metric must be one of ${thresholdMetrics.mkString("|")}, got '$metric'")
    sweep.orderBy(col(metric).desc, col("threshold").asc).limit(1)
  }

  def bestSweepRow(spark: SparkSession, dir: String, metric: String = "f1"): DataFrame =
    bestRow(thresholdSweepQuery(spark, dir), metric)

  def bestThreshold(spark: SparkSession, dir: String, metric: String = "f1"): DataFrame =
    bestSweepRow(spark, dir, metric).select(col("threshold").as("thr"))

  // ------------------------------------------------------------------
  // q16: test-set confusion matrix + point metrics at the best
  // validation threshold (reference eval.py:72-88) — a single
  // conditional aggregation over the scored test split.
  // ------------------------------------------------------------------
  def evalConfusion(spark: SparkSession, dir: String): DataFrame =
    confusionFrom(predictions(spark, dir, "test"), bestThreshold(spark, dir))

  /** Confusion matrix at an explicit operating threshold — the
    * eval-later path where the threshold comes from a persisted
    * metrics artifact (reference eval.py:30-40), not the in-plan sweep.
    */
  def evalConfusionAt(spark: SparkSession, dir: String, threshold: Double): DataFrame =
    confusionAt(predictions(spark, dir, "test"), threshold)

  /** Confusion at an explicit threshold over explicit (label, p1)
    * predictions — the building block the CLI eval stage uses with a
    * loaded model's scores.
    */
  def confusionAt(pred: DataFrame, threshold: Double): DataFrame =
    confusionFrom(pred, pred.sparkSession.range(1).select(lit(threshold).as("thr")))

  private def confusionFrom(pred: DataFrame, thrDf: DataFrame): DataFrame = {
    val agg = pred.crossJoin(broadcast(thrDf))
      .agg(
        first(col("thr")).as("threshold"),
        sum(when(col("label") === 1.0 && col("p1") >= col("thr"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("label") === 0.0 && col("p1") >= col("thr"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("label") === 0.0 && col("p1") < col("thr"), 1L).otherwise(0L)).as("tn"),
        sum(when(col("label") === 1.0 && col("p1") < col("thr"), 1L).otherwise(0L)).as("fn"),
        count(lit(1)).as("n"))
    val precision = col("tp").cast("double") / greatest(col("tp") + col("fp"), lit(1L)).cast("double")
    val recall    = col("tp").cast("double") / greatest(col("tp") + col("fn"), lit(1L)).cast("double")
    val f1 = lit(2.0) * precision * recall / greatest(precision + recall, lit(1e-9))
    agg.select(
      col("threshold"), col("tp"), col("fp"), col("tn"), col("fn"),
      Det.r(precision, 6).as("precision"),
      Det.r(recall, 6).as("recall"),
      Det.r(f1, 6).as("f1"),
      Det.r((col("tp") + col("fn")).cast("double") / greatest(col("n"), lit(1L)).cast("double"), 6)
        .as("pos_rate"))
  }

  // ------------------------------------------------------------------
  // q17: distributed AUC-ROC + AUC-PR on the test split.
  //
  // AUC-ROC: exact tie-corrected Mann-Whitney — group by distinct
  // score, each positive contributes (#negatives strictly below +
  // half the tied negatives), normalized by P*N.
  // AUC-PR: trapezoid over the distinct-score PR curve (first point
  // (recall 0, precision 1), one point per distinct score descending).
  //
  // Scale shape: scores are quantized to 6 dp FIRST (standard for AUC
  // at scale; a 1e-6 score grid moves the statistic by less than the
  // reporting precision), so the score groupBy — the only data-sized
  // shuffle — emits at most 1e6+1 rows. The cumulative statistics are
  // then two-level: per-score rows carry a coarse bucket key
  // (floor(p1*1000), <=1001 buckets), bucket-level prefix sums run over
  // the <=1001-row bucket rollup, and the within-bucket windows are
  // PARTITIONED BY bucket (partition size <=1001 distinct scores), so
  // no window ever funnels unbounded data through one task.
  // ------------------------------------------------------------------
  def aucTable(pred: DataFrame): DataFrame = {
    val byScore = pred
      .groupBy(Det.r(col("p1"), 6).as("p1"))
      .agg(sum(col("label")).cast("long").as("pos"), count(lit(1)).as("n"))
      .withColumn("neg", col("n") - col("pos"))
      .withColumn("bkt", floor(col("p1") * 1000).cast("int"))
    // Bucket rollup: <=1001 rows at ANY data size. The prefix windows
    // over it are partitioned by a non-foldable constant key
    // (Det.constKey) so the (bounded, constant-cardinality) single
    // partition is explicit and Spark's "no partition defined" path is
    // never taken.
    // ONE bucket-level window spec (round 16): the asc prefix, the
    // desc prefixes and the partition totals are all frames of the
    // SAME (constKey, bkt desc) sort — below-sum = total − inclusive
    // desc-sum, totals = the unbounded frame. Same exact integer sums,
    // but ONE Window node + ONE Sort in the plan where there were
    // three of each (this query's bench cost is cold planning/codegen
    // of the cascade, not execution — the tables are ≤1001 rows).
    val wBkt = Window.partitionBy(Det.constKey(col("bkt"))).orderBy(col("bkt").desc)
    val wBktAbove = wBkt.rowsBetween(Window.unboundedPreceding, -1)
    val wBktIncl = wBkt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBktFull = wBkt.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bktPrefix = byScore
      .groupBy(col("bkt"))
      .agg(sum(col("pos")).as("bpos"), sum(col("neg")).as("bneg"), sum(col("n")).as("bn"))
      .withColumn("bkt_pos_above", coalesce(sum(col("bpos")).over(wBktAbove), lit(0L)))
      .withColumn("bkt_n_above", coalesce(sum(col("bn")).over(wBktAbove), lit(0L)))
      .withColumn("p_tot", sum(col("bpos")).over(wBktFull))
      .withColumn("n_tot", sum(col("bneg")).over(wBktFull))
      .withColumn("bkt_neg_below", col("n_tot") - sum(col("bneg")).over(wBktIncl))
      .select("bkt", "bneg", "bkt_neg_below", "bkt_pos_above", "bkt_n_above", "p_tot", "n_tot")
    // Within-bucket cumulative sums; boundary values come from the
    // broadcast bucket prefix, so cross-bucket state never crosses a
    // window partition. The previous PR-curve point for a bucket's
    // highest score is the bucket-above cumulative (recall 0 /
    // precision 1 when nothing is above).
    // ONE within-bucket spec too (round 16): the asc neg-prefix is
    // bucket-total − inclusive desc-sum (bneg rides the broadcast),
    // and the lag() of the PR point is recomputed from the exclusive
    // desc frame — the same integers through the same divides, so the
    // doubles are bit-identical, with the window count 3 → 1.
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("p1").desc)
    val wInAbove = wIn.rowsBetween(Window.unboundedPreceding, -1)
    val wInIncl = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = byScore
      .join(broadcast(bktPrefix), "bkt")
      .withColumn("neg_below",
        col("bkt_neg_below") + col("bneg") - sum(col("neg")).over(wInIncl))
      .withColumn("cum_pos", col("bkt_pos_above") + sum(col("pos")).over(wInIncl))
      .withColumn("cum_n", col("bkt_n_above") + sum(col("n")).over(wInIncl))
      .withColumn("cum_pos_prev",
        col("bkt_pos_above") + coalesce(sum(col("pos")).over(wInAbove), lit(0L)))
      .withColumn("cum_n_prev",
        col("bkt_n_above") + coalesce(sum(col("n")).over(wInAbove), lit(0L)))
      .withColumn("roc_contrib",
        col("pos").cast("double") *
          (col("neg_below").cast("double") + col("neg").cast("double") / 2.0))
      .withColumn("recall", col("cum_pos").cast("double") / greatest(col("p_tot"), lit(1L)).cast("double"))
      .withColumn("prec", col("cum_pos").cast("double") / col("cum_n").cast("double"))
      .withColumn("recall_prev",
        col("cum_pos_prev").cast("double") / greatest(col("p_tot"), lit(1L)).cast("double"))
      .withColumn("prec_prev",
        when(col("cum_n_prev") > 0,
          col("cum_pos_prev").cast("double") / col("cum_n_prev").cast("double"))
          .otherwise(lit(1.0)))
      .withColumn("pr_contrib",
        (col("recall") - col("recall_prev")) * (col("prec") + col("prec_prev")) / 2.0)
    scored.agg(
      Det.r(sum(col("roc_contrib")) /
        (greatest(max(col("p_tot")), lit(1L)).cast("double") *
          greatest(max(col("n_tot")), lit(1L)).cast("double")), 6)
        .as("auc_roc"),
      Det.r(sum(col("pr_contrib")), 6).as("auc_pr"),
      max(col("p_tot")).as("n_pos"),
      max(col("n_tot")).as("n_neg"))
  }

  def evalAuc(spark: SparkSession, dir: String): DataFrame =
    aucTable(predictions(spark, dir, "test"))

  // ------------------------------------------------------------------
  // Reliability / calibration table — the eval artifact behind a
  // reliability diagram (a churn score used for budgeted outreach
  // needs calibrated probabilities, not just rank order). Test
  // predictions bucket into `bins` equal-width probability bins; per
  // bin: count, mean predicted p1, observed positive rate. A
  // calibrated model has mean_p1 ≈ pos_rate per bin. One bins-row
  // aggregation, window-free; model-dependent ⇒ rows-only gate, with
  // ChurnSpec pinning partition/consistency invariants.
  // ------------------------------------------------------------------
  def calibrationTable(spark: SparkSession, dir: String, bins: Int = 10): DataFrame =
    predictions(spark, dir, "test")
      .select(col("label"), col("p1"),
        least(lit(bins - 1L), floor(col("p1") * bins).cast("long")).as("bin"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        Det.r(avg(col("p1")), 6).as("mean_p1"),
        Det.r(avg(col("label")), 6).as("pos_rate"))

  // ------------------------------------------------------------------
  // metrics.json artifact contract. The reference persists validation
  // AUCs and the chosen operating threshold after training
  // (train.py:176-189) and eval reads the threshold back from the file
  // (eval.py:30-40) — that round-trip is what makes a train-now /
  // eval-later workflow reproducible. Values here are the final
  // scalars of terminal aggregations, so driver-side materialization
  // is the artifact write, not a data move.
  // ------------------------------------------------------------------
  final case class Metrics(
      valAucRoc: Double, valAucPr: Double,
      bestThreshold: Double, precision: Double, recall: Double, f1: Double,
      thrMetric: String = "f1")

  /** Validation metrics + best operating threshold (the reference
    * evaluates the sweep and AUCs on the val split, train.py:178-186).
    * `thrMetric` picks which sweep column the operating point
    * maximizes, like the reference's `--thr_metric`.
    */
  def computeMetrics(spark: SparkSession, dir: String, thrMetric: String = "f1"): Metrics = {
    val auc = aucTable(predictions(spark, dir, "val")).head()
    val best = bestSweepRow(spark, dir, thrMetric)
      .select("threshold", "precision", "recall", "f1").head()
    Metrics(auc.getDouble(0), auc.getDouble(1),
      best.getDouble(0), best.getDouble(1), best.getDouble(2), best.getDouble(3),
      thrMetric)
  }

  /** Write the metrics artifact with the reference's key layout
    * (nested best_threshold object, train.py:95-102,186), plus the
    * metric the threshold was selected by so eval/serve can report
    * the operating policy, not just the number.
    */
  def saveMetrics(m: Metrics, path: String): Unit = {
    // "value" = the chosen metric's value at the selected threshold —
    // the reference's best_threshold payload carries it (train.py:94-100)
    val value = m.thrMetric match {
      case "recall" => m.recall
      case "precision" => m.precision
      case _ => m.f1
    }
    val json =
      s"""{
         |  "val_auc_roc": ${m.valAucRoc},
         |  "val_auc_pr": ${m.valAucPr},
         |  "thr_metric": "${m.thrMetric}",
         |  "best_threshold": {
         |    "threshold": ${m.bestThreshold},
         |    "value": $value,
         |    "precision": ${m.precision},
         |    "recall": ${m.recall},
         |    "f1": ${m.f1}
         |  }
         |}""".stripMargin
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, json)
  }

  def loadMetrics(path: String): Metrics = {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    def num(key: String): Double = {
      // the char class must include '-' INSIDE it too, or scientific
      // notation with a negative exponent ("5.0E-4", which Double
      // .toString emits below 1e-3) truncates at the exponent sign
      val m = ("\"" + key + "\"\\s*:\\s*(-?[0-9.eE+-]+)").r.findFirstMatchIn(text)
      m.getOrElse(throw new IllegalArgumentException(s"metrics artifact missing '$key': $path"))
        .group(1).toDouble
    }
    // thr_metric is absent from pre-round-6 artifacts; those were
    // always F1-selected, so the default is also the correct legacy read
    val thrMetric = "\"thr_metric\"\\s*:\\s*\"([a-z0-9_]+)\"".r
      .findFirstMatchIn(text).map(_.group(1)).getOrElse("f1")
    Metrics(num("val_auc_roc"), num("val_auc_pr"),
      num("threshold"), num("precision"), num("recall"), num("f1"), thrMetric)
  }

  /** Train-now/eval-later loop: fit, persist metrics, and evaluate the
    * test confusion at the threshold read BACK from the artifact.
    */
  def evalConfusionFromArtifact(spark: SparkSession, dir: String, metricsPath: String): DataFrame =
    evalConfusionAt(spark, dir, loadMetrics(metricsPath).bestThreshold)

  // ------------------------------------------------------------------
  // CSV artifact exports (reference plot_threshold.py:24-60 writes
  // docs/threshold_curve.csv; train.py:110-122 coefficients.csv). The
  // chart rendering itself is out of scope for a Spark library; the
  // tables carry the same columns the plots consume.
  // ------------------------------------------------------------------
  def exportThresholdCurve(spark: SparkSession, dir: String, outDir: String): Unit =
    thresholdSweepQuery(spark, dir)
      .select("threshold", "precision", "recall", "f1")
      .orderBy("threshold")
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(outDir)

  def exportCoefficients(spark: SparkSession, dir: String, outDir: String): Unit =
    coefficientTable(spark, dir)
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(outDir)

  // ------------------------------------------------------------------
  // Serving contract (reference serve_api.py:113-160): feature dicts,
  // unknown features ignored, missing features -> 0.0, everything cast
  // double, p1 >= threshold decides.
  // ------------------------------------------------------------------
  final class Scorer(model: PipelineModel, val threshold: Double = 0.5) {
    def scoreBatch(spark: SparkSession, batch: Seq[Map[String, Double]]): DataFrame = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
      val schema = StructType(featureCols.map(f => StructField(f, DoubleType, nullable = false)))
      val rows = batch.map(m => Row.fromSeq(featureCols.map(f => m.getOrElse(f, 0.0))))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, math.max(1, rows.size / 1000)), schema)
      model.transform(df)
        .withColumn("p1", vector_to_array(col("probability")).getItem(1))
        .withColumn("prediction", (col("p1") >= threshold).cast("double"))
        .select((featureCols.map(col) :+ col("p1") :+ col("prediction")): _*)
    }

    def scoreOne(spark: SparkSession, features: Map[String, Double]): (Double, Double) = {
      val r = scoreBatch(spark, Seq(features)).select("p1", "prediction").head()
      (r.getDouble(0), r.getDouble(1))
    }
  }

  def scorer(spark: SparkSession, dir: String, threshold: Double = 0.5): Scorer =
    new Scorer(fitted(spark, dir), threshold)

  /** Serving at the trained operating point: the threshold comes from
    * the persisted metrics artifact, like the reference's serve layer
    * reading metrics.json at startup.
    */
  def scorerFromArtifact(spark: SparkSession, dir: String, metricsPath: String): Scorer =
    new Scorer(fitted(spark, dir), loadMetrics(metricsPath).bestThreshold)

  /** Drop all per-directory cached state (features, predictions,
    * models) and unpersist the backing blocks — for long-lived
    * sessions that move between data directories.
    */
  def clearCaches(): Unit = {
    // unpersist the INNER persisted frames — Dataset.unpersist on the
    // IterSized coalesce view would not match the cache entry
    featureCache.values.foreach(_._1.unpersist())
    featureCache.clear()
    predictionCache.values.foreach(_._1.unpersist())
    predictionCache.clear()
    modelCache.clear()
  }
}
