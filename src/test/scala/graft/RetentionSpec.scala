package graft

import org.apache.spark.sql.functions._

import graft.etl.Retention

class RetentionSpec extends SparkSpec {

  private lazy val feats =
    Retention.customerFeatures(Tables.orders(spark, sf), Tables.lineitem(spark, sf)).cache()

  test("flagship feature table: shape and invariants") {
    val rows = feats.collect()
    assert(rows.nonEmpty)
    val labels = feats.select(col("label")).distinct().collect().map(_.getDouble(0)).toSet
    assert(labels.subsetOf(Set(0.0, 1.0)))
    assert(feats.filter(col("recency_days") < 0).count() === 0)
    assert(feats.filter(col("total_orders") < 1).count() === 0)
    // cohort rule: total_orders >= 2 OR recency <= 180
    assert(feats.filter(col("total_orders") < 2 && col("recency_days") > 180).count() === 0)
  }

  test("flagship physical plan contains no Expand (multi-distinct rewrite)") {
    assert(!planOf(feats).contains("Expand"))
  }

  test("derived columns are consistent with their definitions") {
    val bad = feats.filter(
      abs(col("avg_order_amount") -
        floor(col("total_amount") / col("total_orders") * 1e4 + 0.5) / 1e4) > 1e-9)
    assert(bad.count() === 0)
  }

  test("splits partition the cohort 70/15/15 by modulo and cover every row") {
    val withSplit = Retention.withSplit(feats)
    assert(withSplit.count() === feats.count())
    val bySplit = withSplit.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    // modulo split: train fraction should be near 14/20
    val total = bySplit.values.sum.toDouble
    assert(bySplit("train") / total > 0.5)
  }

  test("writeSplits persists three partition directories that reunion to the cohort") {
    val dir = java.nio.file.Files.createTempDirectory("graft-splits").toString
    Retention.writeSplits(feats, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === feats.count())
    val names = back.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(names === Set("train", "val", "test"))
    // partition pruning: reading one split touches only its directory
    val train = spark.read.parquet(dir).filter(col("split") === "train")
    assert(train.count() > 0)
  }

  test("class weights: negative class 1.0, positive class neg/pos") {
    val w = Retention.classWeightTable(feats).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val (nPos, wPos) = w(1.0)
    val (nNeg, wNeg) = w(0.0)
    assert(wNeg === 1.0)
    val expected = math.floor(nNeg.toDouble / math.max(nPos, 1L).toDouble * 1e6 + 0.5) / 1e6
    assert(wPos === expected)
  }

  test("withClassWeights stays in-plan (no collect) and matches the table") {
    val weighted = Retention.withClassWeights(feats)
    val distinctW = weighted.filter(col("label") === 1.0)
      .select(col("class_weight")).distinct().collect()
    assert(distinctW.length === 1)
  }

  test("driftPsi: contributions sum to the reported PSI; the modulo split shows no drift") {
    val rows = Retention.driftPsi(feats).collect()
    // the full 0..11 bin domain is always present, observed or not
    assert(rows.length === 12)
    assert(rows.map(_.getLong(0)).sorted.toSeq === (0L until 12L))
    // counts conserve the two splits
    val split = Retention.withSplit(feats).groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getLong(1)).sum === split("train"))
    assert(rows.map(_.getLong(2)).sum === split("test"))
    // every bin term is non-negative and they sum to the total (1 µ-nat
    // slack per bin from the per-row rounding)
    val psi = rows.head.getDouble(4)
    assert(rows.map(_.getDouble(4)).distinct.length === 1)
    assert(rows.forall(_.getDouble(3) >= 0.0))
    assert(math.abs(rows.map(_.getDouble(3)).sum - psi) < rows.length * 1e-6 + 1e-9)
    // a deterministic modulo split of one population must not drift
    assert(psi >= 0.0 && psi < 0.25, s"psi=$psi")
  }
}
