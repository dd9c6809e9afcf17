package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomBuild, BloomMightContain, HyperplaneBuckets, MisraGries, SortedIntersectSize, VecDot}

/** Session-extension entry point: registers graft's native Catalyst
  * expressions as SQL functions. Users opt in with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`), after which
  * `SELECT sorted_intersect_size(a, b)` works from plain SQL and the
  * expression participates in whole-stage codegen like any built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.sortedIntersectSize)
    ext.injectFunction(GraftExtensions.vecDot)
    ext.injectFunction(GraftExtensions.hyperplaneBuckets)
    ext.injectFunction(GraftExtensions.misraGries)
    ext.injectFunction(GraftExtensions.bloomBuild)
    ext.injectFunction(GraftExtensions.bloomMightContain)
  }
}

object GraftExtensions {
  val sortedIntersectSize: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_intersect_size"),
    new ExpressionInfo(
      classOf[SortedIntersectSize].getName,
      null,
      "sorted_intersect_size",
      "sorted_intersect_size(a, b) - intersection size of two sorted bigint arrays",
      ""),
    (children: Seq[Expression]) => {
      require(children.length == 2, "sorted_intersect_size takes exactly 2 arguments")
      SortedIntersectSize(children.head, children(1))
    })

  val vecDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(
      classOf[VecDot].getName,
      null,
      "vec_dot",
      "vec_dot(a, b) - dot product of two double arrays",
      ""),
    (children: Seq[Expression]) => {
      require(children.length == 2, "vec_dot takes exactly 2 arguments")
      VecDot(children.head, children(1))
    })

  val hyperplaneBuckets: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hyperplane_buckets"),
    new ExpressionInfo(
      classOf[HyperplaneBuckets].getName,
      null,
      "hyperplane_buckets",
      "hyperplane_buckets(v, tables, bits, dims) - per-table random-hyperplane " +
        "LSH bucket values of a double-array vector (tables/bits/dims are int literals)",
      ""),
    (children: Seq[Expression]) => {
      require(children.length == 4, "hyperplane_buckets takes exactly 4 arguments")
      def intLit(e: Expression, name: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case _ => throw new IllegalArgumentException(s"$name must be an integer literal")
      }
      HyperplaneBuckets(children.head,
        intLit(children(1), "tables"), intLit(children(2), "bits"), intLit(children(3), "dims"))
    })

  val misraGries: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("misra_gries"),
    new ExpressionInfo(
      classOf[MisraGries].getName,
      null,
      "misra_gries",
      "misra_gries(item, k) - mergeable Misra-Gries frequent-items sketch: up to k " +
        "(item, counter) candidates; every item with frequency > n/(k+1) is guaranteed present",
      ""),
    (children: Seq[Expression]) => {
      require(children.length == 2, "misra_gries takes exactly 2 arguments")
      val k = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case _ => throw new IllegalArgumentException("k must be an integer literal")
      }
      MisraGries(children.head, k)
    })

  val bloomBuild: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_build"),
    new ExpressionInfo(
      classOf[BloomBuild].getName,
      null,
      "bloom_build",
      "bloom_build(key, num_bits, num_hashes) - mergeable Bloom-filter aggregate over " +
        "pre-hashed bigint keys; returns the filter as binary (4-byte hash-count header + bits)",
      ""),
    (children: Seq[Expression]) => {
      require(children.length == 3, "bloom_build takes exactly 3 arguments")
      def intLit(e: Expression, name: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case _ => throw new IllegalArgumentException(s"$name must be an integer literal")
      }
      BloomBuild(children.head,
        intLit(children(1), "num_bits"), intLit(children(2), "num_hashes"))
    })

  val bloomMightContain: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(
      classOf[BloomMightContain].getName,
      null,
      "bloom_might_contain",
      "bloom_might_contain(filter, key) - Bloom membership probe: false positives " +
        "possible, false negatives impossible",
      ""),
    (children: Seq[Expression]) => {
      require(children.length == 2, "bloom_might_contain takes exactly 2 arguments")
      BloomMightContain(children.head, children(1))
    })
}
