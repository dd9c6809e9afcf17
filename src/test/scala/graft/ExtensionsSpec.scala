package graft

import org.apache.spark.sql.GraftSqlBridge

class ExtensionsSpec extends SparkSpec {

  test("sorted_intersect_size is SQL-callable once registered") {
    GraftSqlBridge.registerFunction(spark, GraftExtensions.sortedIntersectSize)
    val r = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 3L, 5L, 7L), array(3L, 4L, 5L, 9L)) AS n")
      .head().getInt(0)
    assert(r === 2)
    val empty = spark.sql(
      "SELECT sorted_intersect_size(array(1L), CAST(array() AS ARRAY<BIGINT>)) AS n")
      .head().getInt(0)
    assert(empty === 0)
  }

  test("the extension class injects the function at session build time") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builder shape checked below
    val (_, _, builder) = GraftExtensions.sortedIntersectSize
    val e = builder(Seq(
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(Array(1L, 2L))),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(Array(2L, 3L)))))
    assert(e.isInstanceOf[graft.functions.SortedIntersectSize])
  }
}
