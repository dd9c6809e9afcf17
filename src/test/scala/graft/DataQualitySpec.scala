package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.ops.DataQuality

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def li(rows: (java.lang.Double, java.lang.Double, String, java.lang.Double, java.lang.Double)*) =
    rows.toSeq.toDF("l_quantity", "l_extendedprice", "l_returnflag", "l_discount", "l_tax")
  private def od(rows: (java.lang.Long, Long, java.lang.Double)*) =
    rows.toSeq.toDF("o_orderkey", "o_custkey", "o_totalprice")
  private def cu(keys: Long*) = keys.toSeq.toDF("c_custkey")

  test("dqSuite: each planted violation lands on exactly its constraint") {
    val lineitem = li(
      (5.0, 100.0, "A", 0.1, 0.02),   // clean
      (null, 100.0, "N", 0.1, 0.02),  // null quantity
      (99.0, 100.0, "R", 0.1, 0.02),  // quantity out of range
      (5.0, -3.0, "A", 0.1, 0.02),    // non-positive price
      (5.0, 100.0, "X", 0.1, 0.02),   // flag outside set
      (5.0, 100.0, "A", 1.5, 0.02),   // discount out of range
      (5.0, 100.0, "A", 0.1, -0.5))   // negative tax
    val orders = od(
      (1L, 10L, 50.0),                 // clean
      (2L, 10L, 50.0), (2L, 10L, 50.0), // duplicate key (2 rows)
      (null, 10L, 50.0),               // null key
      (3L, 10L, 0.0),                  // non-positive total
      (4L, 99L, 50.0))                 // orphan customer
    val out = DataQuality.dqSuite(lineitem, orders, cu(10L)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(("lineitem", "complete_l_quantity")) === ((7L, 1L, false)))
    assert(out(("lineitem", "complete_l_extendedprice")) === ((7L, 0L, true)))
    assert(out(("lineitem", "range_l_quantity_1_50")) === ((7L, 1L, false)))
    assert(out(("lineitem", "positive_l_extendedprice")) === ((7L, 1L, false)))
    assert(out(("lineitem", "accepted_l_returnflag_ANR")) === ((7L, 1L, false)))
    assert(out(("lineitem", "range_l_discount_0_1")) === ((7L, 1L, false)))
    assert(out(("lineitem", "nonnegative_l_tax")) === ((7L, 1L, false)))
    assert(out(("orders", "complete_o_orderkey")) === ((6L, 1L, false)))
    assert(out(("orders", "positive_o_totalprice")) === ((6L, 1L, false)))
    // uniqueness counts the ROWS carrying a duplicated key, both of them
    assert(out(("orders", "unique_o_orderkey")) === ((6L, 2L, false)))
    assert(out(("orders", "ref_o_custkey_in_customer")) === ((6L, 1L, false)))
  }

  test("dqSuite verdicts an empty input (n=0, zero violations) instead of throwing") {
    val out = DataQuality.dqSuite(
      li().limit(0).union(li((1.0, 1.0, "A", 0.0, 0.0))).limit(0),
      od().limit(0).union(od((1L, 1L, 1.0))).limit(0),
      cu(1L).limit(0)).collect()
    assert(out.length === 11)
    out.foreach { r =>
      assert(r.getLong(2) === 0L && r.getLong(3) === 0L && r.getBoolean(4), r.getString(1))
    }
  }

  test("dqSuite on the shipped corpus: every constraint passes (the gate a run would read)") {
    val out = DataQuality.dqSuite(Tables.lineitem(spark, sf),
      Tables.orders(spark, sf), Tables.customer(spark, sf)).collect()
    assert(out.length === 11)
    out.foreach(r => assert(r.getBoolean(4), s"constraint ${r.getString(1)} failed"))
  }
}
