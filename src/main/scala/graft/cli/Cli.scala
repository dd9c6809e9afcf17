package graft.cli

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.etl.Retention
import graft.ml.{Churn, Plots}
import graft.serve.ScoreServer

/** Per-stage command-line entry points mirroring the reference's
  * Makefile-driven workflow (reference pipeline/etl.py:154-173,
  * train.py:125-205, eval.py:22-89, serve_api.py): a user can run the
  * whole pipeline end-to-end — features+splits, model+metrics+plots,
  * held-out evaluation, HTTP scoring — without writing any Scala.
  *
  * Flag names follow the reference argparse contracts (`--in_dir`,
  * `--out_dir`, `--cutoff`, `--lookahead_days`, `--cv_parallelism`,
  * `--metric`, `--thr_metric`, `--model_dir`, `--metrics_path`,
  * `--port`). Each stage is a thin arg-parsing shell over the library
  * operators the driver gate already verifies — the CLI adds no new
  * query logic, so CLI results and library results cannot diverge.
  */
object Args {
  /** Minimal `--key value` parser (argparse-style). A `--key` followed
    * by another `--key` or end-of-args is a boolean flag ("true").
    */
  def parse(argv: Array[String]): Map[String, String] = {
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] = rest match {
      case Nil => acc
      case key :: tail if key.startsWith("--") =>
        tail match {
          case v :: more if !v.startsWith("--") => loop(more, acc + (key.drop(2) -> v))
          case _ => loop(tail, acc + (key.drop(2) -> "true"))
        }
      case other :: _ =>
        throw new IllegalArgumentException(s"unexpected argument '$other' (flags are --key value)")
    }
    loop(argv.toList, Map.empty)
  }

  def required(m: Map[String, String], key: String): String =
    m.getOrElse(key, throw new IllegalArgumentException(s"missing required flag --$key"))
}

private[cli] object CliSession {
  /** Run `f` with the active session if one exists (tests, shared
    * JVMs) — creating and owning a fresh one only otherwise, so a CLI
    * main never stops a session it did not start.
    */
  def withSession(f: SparkSession => Unit): Unit = {
    // active is thread-local; default is global — check BOTH, or a CLI
    // main invoked from a fresh thread in a shared JVM (tests) would
    // "create" (getOrCreate returns the default) and then stop a
    // session it does not own
    val existing = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = existing.getOrElse {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
      val s = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    try f(spark)
    finally if (existing.isEmpty) spark.stop()
  }

  /** (custkey, label, p1) scores of one split under an explicit model
    * — the CLI twin of Churn.predictions for loaded models.
    */
  def score(model: PipelineModel, split: DataFrame): DataFrame =
    model.transform(split)
      .select(col("custkey"), col("label"),
        vector_to_array(col("probability")).getItem(1).as("p1"))

  def readSplit(spark: SparkSession, splitsDir: String, name: String): DataFrame =
    spark.read.parquet(splitsDir).filter(col("split") === name).drop("split")
}

/** `graft.cli.Etl --in_dir <tables> --out_dir <processed> [--cutoff
  * YYYY-MM-DD] [--lookahead_days N] [--recent_days N]` — reference
  * etl.py:154-173. Writes `<out>/features` (full labeled feature
  * table) and `<out>/splits` (Hive-partitioned by split=train/val/
  * test, partition-prunable — the scalable form of the reference's
  * three separate parquet writes).
  */
object Etl {
  def main(argv: Array[String]): Unit = CliSession.withSession { spark =>
    val a = Args.parse(argv)
    val inDir = Args.required(a, "in_dir")
    val outDir = Args.required(a, "out_dir")
    val cfg = Retention.Config(
      cutoff = LocalDateTime.parse(a.getOrElse("cutoff", "2000-06-30") + "T23:59:59"),
      lookaheadDays = a.getOrElse("lookahead_days", "180").toInt,
      recentDays = a.getOrElse("recent_days", "90").toInt)
    val features = Retention.customerFeatures(
      graft.Tables.orders(spark, inDir), graft.Tables.lineitem(spark, inDir), cfg)
    features.write.mode("overwrite").parquet(s"$outDir/features")
    Retention.writeSplits(spark.read.parquet(s"$outDir/features"), s"$outDir/splits")
    println(s"[ETL] Saved features & splits to $outDir")
  }
}

/** `graft.cli.Train --in_dir <processed> --out_dir <model_out>
  * [--cv true] [--cv_parallelism N] [--metric aucroc|aucpr]
  * [--thr_metric f1|recall|precision]` — reference train.py:125-205.
  *
  * Writes `<out>/model` (PipelineModel), `<out>/metrics.json`
  * (AUCs + best operating point + thr_metric), single-file
  * `<out>/coefficients.csv` and `<out>/threshold_curve.csv`, and the
  * two PNG artifacts (threshold_curve.png, feature_importance.png).
  *
  * `--cv true` runs the reference's 3-fold x 3x3-grid CrossValidator
  * (train.py:160-173; minutes of fitting); the default single
  * deterministic fit is the library path the driver gate verifies.
  */
object Train {
  def main(argv: Array[String]): Unit = CliSession.withSession { spark =>
    val a = Args.parse(argv)
    val inDir = Args.required(a, "in_dir")
    val outDir = Args.required(a, "out_dir")
    val thrMetric = a.getOrElse("thr_metric", "f1")
    val cvMetric = a.getOrElse("metric", "aucpr") match {
      case "aucroc" => "areaUnderROC"
      case "aucpr"  => "areaUnderPR"
      case other => throw new IllegalArgumentException(s"--metric must be aucroc|aucpr, got '$other'")
    }
    val train = Retention.withClassWeights(
      CliSession.readSplit(spark, s"$inDir/splits", "train")).cache()
    val model =
      if (a.get("cv").contains("true"))
        Churn.buildCrossValidator(cvMetric, a.getOrElse("cv_parallelism", "4").toInt)
          .fit(train).bestModel.asInstanceOf[PipelineModel]
      else Churn.buildPipeline()._1.fit(train)
    train.unpersist()
    Churn.save(model, s"$outDir/model")

    val predVal = CliSession.score(model, CliSession.readSplit(spark, s"$inDir/splits", "val"))
      .cache()
    val auc = Churn.aucTable(predVal).head()
    val sweepDf = Churn.thresholdSweep(predVal)
      .select("threshold", "precision", "recall", "f1")
    val sweep = sweepDf.orderBy("threshold").collect()
    val best = Churn.bestRow(sweepDf, thrMetric).head()
    predVal.unpersist()
    val m = Churn.Metrics(auc.getDouble(0), auc.getDouble(1),
      best.getDouble(0), best.getDouble(1), best.getDouble(2), best.getDouble(3), thrMetric)
    Churn.saveMetrics(m, s"$outDir/metrics.json")

    // single-FILE csv artifacts like the reference (vs a parquet-style
    // part-file directory): tiny driver-side tables, written directly
    val coef = Churn.coefficientTableOf(spark, model).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val coefCsv = "feature,coefficient,abs_coeff\n" +
      coef.map { case (f, c) => s"$f,$c,${math.abs(c)}" }.mkString("\n") + "\n"
    Files.writeString(Paths.get(s"$outDir/coefficients.csv"), coefCsv)
    val curveCsv = "threshold,precision,recall,f1\n" +
      sweep.map(r => s"${r.getDouble(0)},${r.getDouble(1)},${r.getDouble(2)},${r.getDouble(3)}")
        .mkString("\n") + "\n"
    Files.writeString(Paths.get(s"$outDir/threshold_curve.csv"), curveCsv)

    Plots.thresholdCurve(
      sweep.map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq,
      Some(m.bestThreshold), s"$outDir/threshold_curve.png")
    Plots.featureImportance(coef.toSeq, s"$outDir/feature_importance.png")

    println(s"[TRAIN] Saved best model to: $outDir/model")
    println(f"[TRAIN] Validation AUC-ROC=${m.valAucRoc}%.4f  AUC-PR=${m.valAucPr}%.4f")
    println(s"[TRAIN] Best threshold ($thrMetric) -> ${m.bestThreshold}")
    println(s"[TRAIN] Metrics saved to: $outDir/metrics.json")
  }
}

/** `graft.cli.Eval --in_dir <processed> --model_dir <model>
  * [--metrics_path <metrics.json>] [--out_json <confusion.json>]` —
  * reference eval.py:22-89: test AUCs, then the confusion matrix at
  * the threshold read back from metrics.json (fallback 0.5).
  */
object Eval {
  def main(argv: Array[String]): Unit = CliSession.withSession { spark =>
    val a = Args.parse(argv)
    val inDir = Args.required(a, "in_dir")
    val modelDir = Args.required(a, "model_dir")
    // default = <model_dir>/metrics.json (the reference contract,
    // eval.py:35-40), falling back to the model dir's PARENT where
    // graft.cli.Train writes it; toAbsolutePath so a parentless
    // relative --model_dir (e.g. "model") can't NPE on getParent
    val metricsPath = a.getOrElse("metrics_path", {
      val inModel = Paths.get(modelDir, "metrics.json")
      if (Files.exists(inModel)) inModel.toString
      else Paths.get(modelDir).toAbsolutePath.getParent.resolve("metrics.json").toString
    })
    val model = Churn.load(modelDir)
    val pred = CliSession.score(model, CliSession.readSplit(spark, s"$inDir/splits", "test"))
      .cache()
    val auc = Churn.aucTable(pred).head()
    val thr =
      try Churn.loadMetrics(metricsPath).bestThreshold
      catch { case _: Exception => 0.5 } // reference eval.py:66-70 fallback
    val c = Churn.confusionAt(pred, thr).head()
    pred.unpersist()
    val json =
      s"""{
         |  "test_auc_roc": ${auc.getDouble(0)},
         |  "test_auc_pr": ${auc.getDouble(1)},
         |  "threshold": $thr,
         |  "tp": ${c.getLong(1)}, "fp": ${c.getLong(2)}, "tn": ${c.getLong(3)}, "fn": ${c.getLong(4)},
         |  "precision": ${c.getDouble(5)}, "recall": ${c.getDouble(6)}, "f1": ${c.getDouble(7)},
         |  "pos_rate": ${c.getDouble(8)}
         |}""".stripMargin
    a.get("out_json").foreach { p =>
      val path = Paths.get(p)
      if (path.getParent != null) Files.createDirectories(path.getParent)
      Files.writeString(path, json)
    }
    println(f"[EVAL] Test AUC-ROC = ${auc.getDouble(0)}%.4f  AUC-PR = ${auc.getDouble(1)}%.4f")
    println(f"[EVAL] Threshold = $thr%.2f")
    println("[EVAL] Confusion Matrix (label=1 is positive):")
    println(s"       TP=${c.getLong(1)}  FP=${c.getLong(2)}  TN=${c.getLong(3)}  FN=${c.getLong(4)}")
    println(f"[EVAL] Precision=${c.getDouble(5)}%.4f  Recall=${c.getDouble(6)}%.4f  " +
      f"F1=${c.getDouble(7)}%.4f  PosRate=${c.getDouble(8)}%.4f")
  }
}

/** `graft.cli.PlotThreshold --in_dir <processed> --model_dir <model>
  * [--split train|val|test] [--out <png>] [--csv_out <csv>]` —
  * reference plot_threshold.py: render the P/R/F1-vs-threshold curve
  * of ANY split under the saved model (the reference's `SPLIT=test`
  * workflow), writing the curve CSV and the PNG with the dashed
  * best-threshold marker read from metrics.json when present
  * (model_dir/metrics.json per the reference, falling back to the
  * parent dir where [[Train]] writes it). The sweep is the library's
  * one-aggregation-pass [[Churn.thresholdSweep]] — not the
  * reference's collect-to-pandas loop.
  */
object PlotThreshold {
  def main(argv: Array[String]): Unit = CliSession.withSession { spark =>
    val a = Args.parse(argv)
    val inDir = Args.required(a, "in_dir")
    val modelDir = Args.required(a, "model_dir")
    val split = a.getOrElse("split", "val")
    require(Set("train", "val", "test")(split),
      s"--split must be train|val|test, got '$split'")
    val out = a.getOrElse("out", "docs/threshold_curve.png")
    val csvOut = a.getOrElse("csv_out", "docs/threshold_curve.csv")
    val model = Churn.load(modelDir)
    val pred = CliSession.score(model, CliSession.readSplit(spark, s"$inDir/splits", split))
    val sweep = Churn.thresholdSweep(pred)
      .select("threshold", "precision", "recall", "f1").orderBy("threshold").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    val csvPath = Paths.get(csvOut)
    if (csvPath.getParent != null) Files.createDirectories(csvPath.getParent)
    Files.writeString(csvPath, "threshold,precision,recall,f1\n" +
      sweep.map { case (t, p, r, f) => s"$t,$p,$r,$f" }.mkString("\n") + "\n")
    // marker from metrics.json if present (reference plot_threshold
    // .py:56-61: missing/broken metrics => no marker, never a failure)
    val bestThr = Seq(
      Paths.get(modelDir, "metrics.json"),
      Paths.get(modelDir).toAbsolutePath.getParent.resolve("metrics.json"))
      .find(Files.exists(_))
      .flatMap(p => try Some(Churn.loadMetrics(p.toString).bestThreshold)
        catch { case _: Exception => None })
    Plots.thresholdCurve(sweep, bestThr, out, s"Threshold Optimization Curve ($split)")
    println(s"[PLOT] Saved threshold curve ($split) -> $out")
  }
}

/** `graft.cli.PlotFeatureImportance --coef_csv <coefficients.csv>
  * [--out <png>] [--top N]` — reference plot_feature_importance.py:
  * signed coefficient bars from the persisted CSV, truncated to the
  * top N by |coef| when `--top` > 0 (0 = all, the reference default).
  * Pure driver-side artifact rendering — no Spark session.
  */
object PlotFeatureImportance {
  def main(argv: Array[String]): Unit = {
    val a = Args.parse(argv)
    val coefCsv = Args.required(a, "coef_csv")
    val out = a.getOrElse("out", "docs/feature_importance.png")
    val top = a.getOrElse("top", "0").toInt
    val lines = Files.readAllLines(Paths.get(coefCsv))
    require(!lines.isEmpty, s"empty coefficients CSV: $coefCsv")
    val header = lines.get(0).split(",").map(_.trim)
    val missing = Set("feature", "coefficient", "abs_coeff") -- header.toSet
    require(missing.isEmpty, s"coefficients CSV missing columns: $missing")
    // resolve indexes from the header — a column-reordered CSV with the
    // same names must parse the named columns, not positions 0/1
    val featIdx = header.indexOf("feature")
    val coefIdx = header.indexOf("coefficient")
    val rows = (1 until lines.size).map { i =>
      val parts = lines.get(i).split(",")
      (parts(featIdx), parts(coefIdx).toDouble)
    }
    val shown = rows.sortBy { case (f, c) => (-math.abs(c), f) } match {
      case s if top > 0 => s.take(top)
      case s => s
    }
    Plots.featureImportance(shown, out)
    println(s"[PLOT] Saved feature importance -> $out")
  }
}

/** `graft.cli.Serve --model_dir <model> [--metrics_path <metrics.json>]
  * [--port N] [--host H]` — reference serve_api.py: HTTP scoring at
  * the persisted operating threshold (fallback 0.5).
  */
object Serve {
  /** Start and return the server (tests stop it); `main` blocks. */
  def run(spark: SparkSession, a: Map[String, String]): (ScoreServer, Int) = {
    val modelDir = Args.required(a, "model_dir")
    val thr = a.get("metrics_path")
      .map(p => Churn.loadMetrics(p).bestThreshold)
      .getOrElse(0.5)
    val scorer = new Churn.Scorer(Churn.load(modelDir), thr)
    val server = new ScoreServer(spark, scorer,
      a.getOrElse("port", "0").toInt, a.getOrElse("host", "127.0.0.1"))
    val port = server.start()
    println(s"[SERVE] listening on port $port (threshold=$thr)")
    (server, port)
  }

  def main(argv: Array[String]): Unit = CliSession.withSession { spark =>
    run(spark, Args.parse(argv))
    new java.util.concurrent.CountDownLatch(1).await() // serve until killed
  }
}

/** `graft.cli.BpeModelTool --mode train --data <sfDir> --model <path>
  * [--n_merges N]` trains BPE merges on the documents table and ships
  * them as an ordered merges.txt; `--mode tokenize` reads the model
  * back and tokenizes — the train-once/tokenize-forever lifecycle.
  * Tokenize-with-read-back is proven hash-equal to the in-session
  * train→apply composition in BpeSpec.
  */
object BpeModelTool {
  def main(argv: Array[String]): Unit = CliSession.withSession { spark =>
    val a = Args.parse(argv)
    val data = Args.required(a, "data")
    val model = Args.required(a, "model")
    val docs = graft.Tables.documents(spark, data)
    a.getOrElse("mode", "train") match {
      case "train" =>
        graft.text.BpeModel.writeTrained(docs, model,
          a.getOrElse("n_merges", graft.text.Bpe.defaultTrainRounds.toString).toInt)
        println(s"[BPE] merges written to $model")
      case "tokenize" =>
        graft.text.BpeModel.tokenize(docs, model)
          .orderBy(col("doc_id")).show(20, truncate = false)
      case m => throw new IllegalArgumentException(s"unknown --mode '$m'")
    }
  }
}

/** `graft.cli.UnigramModelTool --mode train --data <sfDir> --model <path>`
  * trains the unigram-LM piece vocabulary and ships it as a
  * rank-ordered pieces.txt; `--mode tokenize` reads the model back
  * and tokenizes — the BpeModelTool lifecycle on the unigram family.
  */
object UnigramModelTool {
  def main(argv: Array[String]): Unit = CliSession.withSession { spark =>
    val a = Args.parse(argv)
    val data = Args.required(a, "data")
    val model = Args.required(a, "model")
    val docs = graft.Tables.documents(spark, data)
    a.getOrElse("mode", "train") match {
      case "train" =>
        graft.text.UnigramModel.writeTrained(docs, model)
        println(s"[UNIGRAM] pieces written to $model")
      case "tokenize" =>
        graft.text.UnigramModel.tokenize(docs, model)
          .orderBy(col("doc_id")).show(20, truncate = false)
      case m => throw new IllegalArgumentException(s"unknown --mode '$m'")
    }
  }
}

/** `graft.cli.TextModelTool --mode train|score --family quality|langid
  * --data <sfDir> --model_dir <dir>` — the train-once/score-forever
  * lifecycle for the two learned text filters (MLlib model dir;
  * langid adds a langs.json label-index sidecar). Score-with-read-back
  * is proven row-identical to the in-session train→score in the
  * respective specs.
  */
object TextModelTool {
  def main(argv: Array[String]): Unit = CliSession.withSession { spark =>
    val a = Args.parse(argv)
    val data = Args.required(a, "data")
    val modelDir = Args.required(a, "model_dir")
    val docs = graft.Tables.documents(spark, data)
    def show(df: org.apache.spark.sql.DataFrame): Unit =
      df.orderBy(col("doc_id")).show(20, truncate = false)
    (a.getOrElse("mode", "train"), a.getOrElse("family", "quality")) match {
      case ("train", "quality") =>
        graft.ml.QualityFilter.write(docs, modelDir)
        println(s"[QUALITY] model written to $modelDir")
      case ("train", "langid") =>
        graft.ml.LangIdClassifier.write(docs, modelDir)
        println(s"[LANGID] model written to $modelDir")
      case ("score", "quality") =>
        show(graft.ml.QualityFilter.scoreFrom(spark, modelDir, docs))
      case ("score", "langid") =>
        show(graft.ml.LangIdClassifier.scoreFrom(spark, modelDir, docs))
      case (m, f) =>
        throw new IllegalArgumentException(s"unknown --mode '$m' / --family '$f'")
    }
  }
}

/** `graft.cli.PqIndexTool --mode build --data <sfDir> --index_dir <dir>
  * [--family pq|ivf|ivf_kmeans|sq8|pca|opq]` trains+persists an ANN index
  * (PQ: codebooks.json + codes parquet; IVF: centroids.json +
  * assignment parquet; SQ8: bounds.json + codes parquet; PCA:
  * model.json + projected parquet); `--mode
  * search` reads it back and prints the top-k neighbors — the
  * train-once/search-forever serving lifecycle for the ANN family.
  * `--mode append --batch_mod N` encodes the vec_id % N == 0 slice
  * (the landed-batch convention of q_dedup_incremental) against the
  * PERSISTED model — no retrain — and appends it to the index.
  * Search over a read-back index is proven hash-equal to the
  * in-session train→search in SimilaritySpec for every family, and
  * append is proven one-shot-equivalent under the same model.
  */
object PqIndexTool {
  def main(argv: Array[String]): Unit = CliSession.withSession { spark =>
    val a = Args.parse(argv)
    val data = Args.required(a, "data")
    val indexDir = Args.required(a, "index_dir")
    val family = a.getOrElse("family", "pq")
    val emb = graft.Tables.embeddings(spark, data)
    def show(df: org.apache.spark.sql.DataFrame): Unit =
      df.orderBy(col("query_id"), col("rank")).show(200, truncate = false)
    (a.getOrElse("mode", "build"), family) match {
      case ("build", "pq") =>
        graft.sim.PqIndex.write(emb, indexDir)
        println(s"[PQ] index written to $indexDir")
      case ("build", "ivf") | ("build", "ivf_kmeans") =>
        graft.sim.IvfIndex.write(emb, indexDir, kmeans = family == "ivf_kmeans")
        println(s"[IVF] index written to $indexDir (kmeans=${family == "ivf_kmeans"})")
      case ("build", "sq8") =>
        graft.sim.Sq8Index.write(emb, indexDir)
        println(s"[SQ8] index written to $indexDir")
      case ("build", "pca") =>
        graft.sim.PcaIndex.write(emb, indexDir)
        println(s"[PCA] index written to $indexDir")
      case ("build", "opq") =>
        graft.sim.OpqIndex.write(emb, indexDir)
        println(s"[OPQ] index written to $indexDir")
      case ("append", fam) =>
        val batch = emb.filter(
          pmod(col("vec_id"), lit(a.getOrElse("batch_mod", "10").toLong)) === 0)
        fam match {
          case "pq" => graft.sim.PqIndex.append(spark, batch, indexDir)
          case "ivf" | "ivf_kmeans" => graft.sim.IvfIndex.append(spark, batch, indexDir)
          case "sq8" => graft.sim.Sq8Index.append(spark, batch, indexDir)
          case "pca" => graft.sim.PcaIndex.append(spark, batch, indexDir)
          case "opq" => graft.sim.OpqIndex.append(spark, batch, indexDir)
          case other => throw new IllegalArgumentException(s"unknown --family '$other'")
        }
        println(s"[${fam.toUpperCase}] batch appended to $indexDir (no retrain)")
      case ("search", "sq8") =>
        show(graft.sim.Sq8Index.search(spark, indexDir, emb,
          nQueries = a.getOrElse("nqueries", "10").toInt,
          k = a.getOrElse("k", "10").toInt,
          refine = a.getOrElse("refine", "4").toInt))
      case ("search", "pq") =>
        show(graft.sim.PqIndex.search(spark, indexDir, emb,
          nQueries = a.getOrElse("nqueries", "10").toInt,
          k = a.getOrElse("k", "10").toInt,
          refine = a.getOrElse("refine", "4").toInt))
      case ("search", "pca") =>
        show(graft.sim.PcaIndex.search(spark, indexDir, emb,
          nQueries = a.getOrElse("nqueries", "10").toInt,
          k = a.getOrElse("k", "10").toInt,
          refine = a.getOrElse("refine", "4").toInt))
      case ("search", "opq") =>
        show(graft.sim.OpqIndex.search(spark, indexDir, emb,
          nQueries = a.getOrElse("nqueries", "10").toInt,
          k = a.getOrElse("k", "10").toInt,
          refine = a.getOrElse("refine", "4").toInt))
      case ("search", "ivf") | ("search", "ivf_kmeans") =>
        show(graft.sim.IvfIndex.search(spark, indexDir, emb,
          nQueries = a.getOrElse("nqueries", "10").toInt,
          k = a.getOrElse("k", "10").toInt,
          nProbe = a.getOrElse("nprobe", "2").toInt))
      case ("search", "ivfpq") =>
        // the composition serves from its two persisted parents:
        // --index_dir = the IVF index, --pq_dir = the PQ index
        show(graft.sim.IvfPqIndex.search(spark, indexDir, Args.required(a, "pq_dir"), emb,
          nQueries = a.getOrElse("nqueries", "10").toInt,
          k = a.getOrElse("k", "10").toInt,
          nProbe = a.getOrElse("nprobe", "4").toInt,
          refine = a.getOrElse("refine", "4").toInt))
      case ("search", "ivfsq8") =>
        // likewise: --index_dir = the IVF index, --sq8_dir = the SQ8 index
        show(graft.sim.IvfSq8Index.search(spark, indexDir, Args.required(a, "sq8_dir"), emb,
          nQueries = a.getOrElse("nqueries", "10").toInt,
          k = a.getOrElse("k", "10").toInt,
          nProbe = a.getOrElse("nprobe", "4").toInt,
          refine = a.getOrElse("refine", "4").toInt))
      case (mode, fam) =>
        throw new IllegalArgumentException(s"unknown --mode '$mode' / --family '$fam'")
    }
  }
}

/** `graft.cli.ShingleIndexTool --mode build|probe|contain|decide|append
  * --data <sfDir> --index_dir <dir> [--batch_mod 10] [--tau 0.5]
  * [--tau_contain 0.8] [--buckets N]` — the persisted near-dup store
  * index lifecycle (q_dedup_incremental_disk / q_ingest_decision_disk
  * as shell commands): `build` writes the store slice's ShingleIndex
  * (bucketed postings with `--buckets`), the screen modes probe the
  * batch slice against the read-back layout, `append` grows the index
  * by the batch (the crawl loop's write half). Disk-vs-memory
  * hash-equality is pinned in DedupSpec; this is the ops wrapper.
  */
object ShingleIndexTool {
  def main(argv: Array[String]): Unit = CliSession.withSession { spark =>
    val a = Args.parse(argv)
    val data = Args.required(a, "data")
    val indexDir = Args.required(a, "index_dir")
    val batchMod = a.getOrElse("batch_mod", "10").toLong
    val tau = a.getOrElse("tau", "0.5").toDouble
    val tauContain = a.getOrElse("tau_contain", "0.8").toDouble
    val docs = graft.Tables.documents(spark, data)
    val store = docs.filter(pmod(col("doc_id"), lit(batchMod)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(batchMod)) === 0)
    def show(df: org.apache.spark.sql.DataFrame): Unit =
      df.orderBy(col("doc_id")).show(20, truncate = false)
    a.getOrElse("mode", "build") match {
      case "build" =>
        a.get("buckets") match {
          case Some(b) => graft.dedup.ShingleIndex.writeBucketed(store, indexDir, b.toInt)
          case None => graft.dedup.ShingleIndex.write(store, indexDir)
        }
        println(s"[SHINGLE] index written to $indexDir")
      case "probe" => show(graft.dedup.ShingleIndex.probe(spark, batch, indexDir, tau))
      case "contain" =>
        show(graft.dedup.ShingleIndex.containmentProbe(spark, batch, indexDir, tauContain))
      case "decide" =>
        show(graft.dedup.Dedup.decisionFromIndex(spark, batch, indexDir, tau, tauContain))
      case "append" =>
        graft.dedup.ShingleIndex.append(batch, indexDir)
        println(s"[SHINGLE] batch appended to $indexDir")
      case m => throw new IllegalArgumentException(s"unknown --mode '$m'")
    }
  }
}

/** `graft.cli.PhashIndexTool --mode build|probe|append --data <sfDir>
  * --index_dir <dir> [--batch_mod 10] [--tau 2]` — the persisted
  * image-hash store lifecycle (q_image_incremental_disk as shell
  * commands): `build` decodes + hashes the store slice's images into
  * the PhashIndex band table, `probe` screens the batch slice against
  * the read-back layout, `append` lands the batch's decodable hashes.
  * Disk-vs-memory row-equality is pinned in PhashSpec; this is the
  * ops wrapper.
  */
object PhashIndexTool {
  def main(argv: Array[String]): Unit = CliSession.withSession { spark =>
    val a = Args.parse(argv)
    val data = Args.required(a, "data")
    val indexDir = Args.required(a, "index_dir")
    val batchMod = a.getOrElse("batch_mod", "10").toLong
    val tau = a.getOrElse("tau", "2").toInt
    val docs = graft.Tables.documents(spark, data)
    val store = docs.filter(pmod(col("doc_id"), lit(batchMod)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(batchMod)) === 0)
    a.getOrElse("mode", "build") match {
      case "build" =>
        graft.mm.PhashIndex.write(store, indexDir)
        println(s"[PHASH] index written to $indexDir")
      case "probe" =>
        graft.mm.PhashIndex.probe(spark, batch, indexDir, tau)
          .orderBy(col("doc_id")).show(20, truncate = false)
      case "append" =>
        graft.mm.PhashIndex.append(spark, batch, indexDir)
        println(s"[PHASH] batch appended to $indexDir")
      case m => throw new IllegalArgumentException(s"unknown --mode '$m'")
    }
  }
}

/** `graft.cli.LmIndexTool --mode train|score --data <sfDir>
  * --model_dir <dir> [--order 1|2|3] [--batch_mod 10]` — the
  * persisted order-n LM lifecycle (q_ppl_incremental_disk as shell
  * commands): `train` fits the store slice's n-gram model + shipped
  * tercile cut, `score` screens the batch slice under the read-back
  * artifact. Disk-vs-memory hash-equality (order 1) and the
  * interpolation/backoff arithmetic are pinned in LangModelSpec.
  */
object LmIndexTool {
  def main(argv: Array[String]): Unit = CliSession.withSession { spark =>
    val a = Args.parse(argv)
    val data = Args.required(a, "data")
    val modelDir = Args.required(a, "model_dir")
    val order = a.getOrElse("order", "1").toInt
    val batchMod = a.getOrElse("batch_mod", "10").toLong
    val docs = graft.Tables.documents(spark, data)
    val store = docs.filter(pmod(col("doc_id"), lit(batchMod)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(batchMod)) === 0)
    a.getOrElse("mode", "train") match {
      case "train" =>
        graft.text.LmIndex.write(store, modelDir, order)
        println(s"[LM] order-$order model written to $modelDir")
      case "score" =>
        graft.text.LmIndex.score(spark, batch, modelDir)
          .orderBy(col("doc_id")).show(20, truncate = false)
      case m => throw new IllegalArgumentException(s"unknown --mode '$m'")
    }
  }
}
