package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Det
import graft.text.Text
import graft.Ckpt.CkptOps

/** q114: the LEARNED quality filter — the fasttext-shaped classifier
  * every large-scale pretraining pipeline runs after (or instead of)
  * hand-written heuristics (the GPT-3/PaLM discipline: a linear model
  * over hashed token features, trained to separate a reference "good"
  * corpus from raw crawl, then swept over the whole corpus as a keep
  * score). The reference repo's MLlib stack (assembler → LR) is the
  * same machinery pointed at behavioral features; this is its text
  * twin, and together with q_text_quality it closes the
  * heuristic→learned filter pair: the heuristic BOOTSTRAPS the labels
  * (weak supervision — here quality_score ≥ labelTau standing in for
  * the curated-corpus membership bit), the classifier GENERALIZES
  * them to token evidence the heuristic never encoded.
  *
  * Scale shape: features are MLlib `HashingTF` over the same
  * scan-side token array the heuristic reads — hashing-trick fixed
  * width (no vocabulary collect, no fit pass, the property that makes
  * it THE text featurizer at 100 TB), one corpus scan, no UDF of
  * ours. LR training is MLlib's standard treeAggregate loop (each
  * iteration one map-side gradient pass); scoring is one scan-side
  * transform. The feature frame is localCheckpoint'd so train and
  * score read one materialization.
  *
  * Output per doc: (doc_id, weak_label, q_prob 6dp, pred at 0.5).
  * Model-dependent (L-BFGS float accumulation order) ⇒ rows-only
  * driver gate; QualityFilterSpec gates separation (AUC vs its own
  * weak labels well above chance), prediction consistency, range, and
  * class presence.
  */
object QualityFilter {

  /** The labeled hashed-feature frame train and score share. */
  private def featFrame(
      documents: DataFrame, numFeatures: Int, labelTau: Double): DataFrame = {
    val q = Text.qualityColumns(col("toks"), col("text"))
    val base = graft.Spread(documents)
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("label",
        when(q.score >= lit(labelTau), lit(1.0)).otherwise(lit(0.0)))
      .select(col("doc_id"), col("toks"), col("label"))
    new HashingTF()
      .setInputCol("toks").setOutputCol("features").setNumFeatures(numFeatures)
      .transform(base)
      .boundedCheckpoint()
  }

  private def scoreFeats(
      model: org.apache.spark.ml.classification.LogisticRegressionModel,
      feats: DataFrame): DataFrame = {
    val p1 = vector_to_array(col("probability")).getItem(1)
    model.transform(feats).select(
      col("doc_id"),
      col("label").cast("long").as("weak_label"),
      Det.r(p1, 6).as("q_prob"),
      when(p1 >= 0.5, lit(1L)).otherwise(lit(0L)).as("pred"))
  }

  def trainScore(
      documents: DataFrame,
      numFeatures: Int = 1024,
      labelTau: Double = 0.64,
      maxIter: Int = 40,
      regParam: Double = 1e-3): DataFrame = {
    val feats = featFrame(documents, numFeatures, labelTau)
    // train side right-sized for the ~20-iteration L-BFGS rescan
    // (IterSized: narrow coalesce, scale-adaptive no-op on big data);
    // scoring keeps the full checkpoint width — it is one pass
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(IterSized(feats))
    scoreFeats(model, feats)
  }

  /** Train and PERSIST the filter (MLlib's native writer — the
    * train-once/score-forever lifecycle every other trained artifact
    * here already has: merges.txt, the four index families). The
    * hashing-trick featurizer has no state, so the model directory IS
    * the whole filter; `numFeatures`/`labelTau` ride along in the
    * scoring call and must match the training's (the HashingTF width
    * is checked at transform time by the model's coefficient size).
    */
  def write(
      documents: DataFrame, dir: String,
      numFeatures: Int = 1024, labelTau: Double = 0.64,
      maxIter: Int = 40, regParam: Double = 1e-3): Unit = {
    val feats = featFrame(documents, numFeatures, labelTau)
    // IterSized matches trainScore's fit exactly — the read-back
    // model must be coefficient-identical to the in-session one
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(IterSized(feats))
      .write.overwrite().save(dir)
  }

  /** Score with a READ-BACK model — row-identical to the in-session
    * [[trainScore]] for the same corpus and params (the model is the
    * only trained state; scoring is one scan-side transform), proven
    * in QualityFilterSpec. A corrupt/missing model dir fails loudly
    * through MLlib's loader.
    */
  def scoreFrom(
      spark: org.apache.spark.sql.SparkSession, dir: String, documents: DataFrame,
      numFeatures: Int = 1024, labelTau: Double = 0.64): DataFrame =
    scoreFeats(
      org.apache.spark.ml.classification.LogisticRegressionModel.load(dir),
      featFrame(documents, numFeatures, labelTau))
}
