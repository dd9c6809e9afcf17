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

  test("vec_dot is SQL-callable and matches the interpreted HOF form bit-for-bit") {
    GraftSqlBridge.registerFunction(spark, GraftExtensions.vecDot)
    val r = spark.sql(
      """SELECT vec_dot(a, b) AS native,
        |  aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x) AS hof
        |FROM (SELECT array(0.1D, 2.5D, -3.25D, 7.0D) AS a,
        |             array(1.5D, 0.3D, 2.0D, -0.125D) AS b)""".stripMargin).head()
    assert(r.getDouble(0) === r.getDouble(1))
    // null semantics: mismatched lengths and null elements yield null
    assert(spark.sql("SELECT vec_dot(array(1.0D), array(1.0D, 2.0D))").head().isNullAt(0))
    assert(spark.sql("SELECT vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D))")
      .head().isNullAt(0))
    assert(spark.sql("SELECT vec_dot(CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>))")
      .head().getDouble(0) === 0.0)
  }

  test("hyperplane_buckets is SQL-callable and matches the expression eval") {
    GraftSqlBridge.registerFunction(spark, GraftExtensions.hyperplaneBuckets)
    val got = spark.sql(
      "SELECT hyperplane_buckets(array(1.0D, -2.0D, 0.5D), 2, 4, 3) AS b")
      .head().getSeq[Long](0)
    val planes = graft.functions.HyperplaneBuckets.planes(2, 4, 3)
    val v = Array(1.0, -2.0, 0.5)
    val expected = (0 until 2).map { t =>
      (0 until 4).foldLeft(0L) { (acc, b) =>
        val base = (t * 4 + b) * 3
        val p = v.indices.foldLeft(0.0)((s, j) => s + v(j) * planes(base + j))
        if (p > 0.0) acc | (1L << (3 - b)) else acc
      }
    }
    assert(got.toSeq === expected)
    // wrong dims and null elements are null, not mis-bucketed
    assert(spark.sql("SELECT hyperplane_buckets(array(1.0D), 2, 4, 3)").head().isNullAt(0))
    assert(spark.sql(
      "SELECT hyperplane_buckets(array(1.0D, CAST(NULL AS DOUBLE), 2.0D), 2, 4, 3)")
      .head().isNullAt(0))
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
