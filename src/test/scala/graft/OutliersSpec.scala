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
}
