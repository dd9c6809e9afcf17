package graft

import org.apache.spark.sql.functions._

import graft.ops.Outliers

class OutliersSpec extends SparkSpec {

  import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}

  private def asEvents(rows: Seq[(Long, Long, Long, String, Double)]) =
    rows.toDF("event_id", "user_id", "ts_ms", "event_type", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))

  test("spendOutliers flags exactly the planted spike, with the hand-computed z") {
    // nine 10.00 purchases + one 1000.00: mean 109.00, std exactly
    // 297.00, spike z = (1000-109)/297 = 3.0 — right at the cut
    val ev = asEvents(((1 to 9).map(i => (i.toLong, 1L, i * 1000L, "purchase", 10.0)) :+
      ((10L, 1L, 10000L, "purchase", 1000.0))).toSeq)
    val got = Outliers.spendOutliers(ev).collect()
    assert(got.length === 1)
    assert(got(0).getLong(0) === 10L)
    assert(got(0).getDouble(2) === 1000.0)
    assert(got(0).getDouble(3) === 3.0)
    assert(got(0).getLong(4) === 10L)
  }

  test("constant spend (std = 0) and thin users (n < minEvents) never flag") {
    val constant = (1 to 10).map(i => (i.toLong, 1L, i * 1000L, "purchase", 25.0))
    val thin = Seq((11L, 2L, 1000L, "purchase", 1.0), (12L, 2L, 2000L, "purchase", 9999.0))
    assert(Outliers.spendOutliers(asEvents((constant ++ thin).toSeq)).count() === 0)
  }

  test("non-purchase events are invisible to the spend screen") {
    val ev = (1 to 10).map(i => (i.toLong, 1L, i * 1000L, "click", if (i == 10) 1e6 else 1.0))
    assert(Outliers.spendOutliers(asEvents(ev.toSeq)).count() === 0)
  }

  test("real events: every flagged row clears the rounded-z threshold") {
    val out = Outliers.spendOutliers(Tables.events(spark, sf))
    assert(out.filter(abs(col("z")) < 3.0).count() === 0)
    assert(out.filter(col("user_events") < 5).count() === 0)
  }

  test("embedOutliers flags the planted off-centroid vector and nothing from a tight cluster") {
    // label 0: 9 vectors hugging e1 + one planted at -e1 (far from the
    // centroid); label 1: a tight cluster (no flags); dim 4 for
    // readability — the operator takes dim explicitly
    val base = (1 to 9).map(i => (i.toLong, 0, Seq(1.0f, 0.01f * i, 0f, 0f)))
    val planted = Seq((10L, 0, Seq(-1.0f, 0f, 0f, 0f)))
    val tight = (11 to 20).map(i => (i.toLong, 1, Seq(0f, 1.0f, 0.001f * i, 0f)))
    val emb = (base ++ planted ++ tight).toDF("vec_id", "label", "embedding")
    val got = Outliers.embedOutliers(emb, dim = 4, zThreshold = 2.0).collect()
    assert(got.map(_.getLong(0)).toSet === Set(10L),
      s"exactly the planted vector must flag, got ${got.mkString(",")}")
    assert(got.head.getLong(1) === 0L)
    assert(got.head.getDouble(2) < 0, "the planted vector points away from its centroid")
    assert(got.head.getLong(4) === 10L)
  }

  test("embedOutliers: ragged (wrong-dimension) vectors are out of contract — excluded everywhere") {
    val base = (1 to 9).map(i => (i.toLong, 0, Seq(1.0f, 0.01f * i, 0f, 0f)))
    val planted = Seq((10L, 0, Seq(-1.0f, 0f, 0f, 0f)))
    val ragged = Seq((99L, 0, Seq(-1.0f, 0f)))       // 2-dim in a 4-dim corpus
    val clean = Outliers.embedOutliers((base ++ planted).toDF("vec_id", "label", "embedding"),
      dim = 4, zThreshold = 2.0).collect()
    val withRagged = Outliers.embedOutliers(
      (base ++ planted ++ ragged).toDF("vec_id", "label", "embedding"),
      dim = 4, zThreshold = 2.0).collect()
    // the ragged vector neither flags nor shifts anyone's centroid/z
    assert(withRagged.map(_.toSeq).toSet === clean.map(_.toSeq).toSet)
    assert(!withRagged.exists(_.getLong(0) == 99L))
  }

  test("embedOutliers on the real corpus: thresholds respected, zero-norm vectors never flag") {
    val out = Outliers.embedOutliers(Tables.embeddings(spark, sf)).localCheckpoint()
    assert(out.filter(abs(col("z")) < 2.0).count() === 0)
    assert(out.filter(col("label_n") < 5).count() === 0)
    // the screen fires on the synthetic corpus (the gate needs rows)
    assert(out.count() > 0, "expected tail vectors beyond 2 sigma on the real corpus")
    // driver-side recomputation of one flagged vector's z agrees
    val emb = Tables.embeddings(spark, sf)
    val first = out.orderBy(col("vec_id")).head()
    val rows = emb.select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2)))
    val lbl = first.getLong(1).toInt
    val mine = rows.filter(_._2 == lbl)
    val n = mine.length
    val d = mine.head._3.length
    val micro = Array.tabulate(d)(i => mine.map(v => math.floor(v._3(i) * 1e6 + 0.5).toLong).sum)
    val m = micro.map(s => s.toDouble / (n.toLong * 1000000L).toDouble)
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val mn = math.sqrt(dot(m.toIndexedSeq, m.toIndexedSeq))
    val cs = mine.map { case (id, _, v) =>
      id -> math.floor(dot(v, m.toIndexedSeq) / (math.sqrt(dot(v, v)) * mn) * 1e6 + 0.5).toLong
    }
    val s = cs.map(_._2).sum
    val ss = cs.map(c => BigInt(c._2) * c._2).sum
    val mean = s.toDouble / n
    val std = math.sqrt(math.max((ss.toDouble - s.toDouble * s.toDouble / n) / n, 0.0))
    val c0 = cs.find(_._1 == first.getLong(0)).get._2
    val z = math.floor((c0 - mean) / std * 1e4 + 0.5) / 1e4
    assert(z === first.getDouble(3), "driver z recomputation drifted")
  }
}
