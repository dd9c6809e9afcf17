package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: |A ∩ B| for two SORTED long arrays via
  * a zero-allocation merge walk, with full whole-stage-codegen support.
  *
  * This is the hot inner loop of n-gram Jaccard verification
  * (graft.dedup): the built-in `size(array_intersect(a, b))` builds a
  * hash set AND materializes the intersection array per candidate pair
  * — pure GC pressure for a number we discard immediately. At millions
  * of candidate pairs per partition this expression is the difference
  * between an allocation-bound and a compute-bound verify stage.
  * Callers must pre-sort the arrays (array_sort once per document row,
  * amortized over all its candidate pairs).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  // registered as a SQL function (GraftExtensions), so malformed input
  // must fail analysis — getLong over a non-bigint array would return
  // garbage, not throw
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; } else if ($xv > $yv) { $j++; } else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Column wrapper for [[SortedIntersectSize]]. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      SortedIntersectSize(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column wrapper for [[VecDot]]. */
  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      VecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column wrapper for [[HyperplaneBuckets]]. */
  def hyperplaneBuckets(v: Column, tables: Int, bits: Int, dims: Int): Column =
    GraftSqlBridge.column(
      HyperplaneBuckets(GraftSqlBridge.expression(v), tables, bits, dims))

  /** Column wrapper for [[RepetitionStats]]. */
  def repetitionStats(tokens: Column): Column =
    GraftSqlBridge.column(RepetitionStats(GraftSqlBridge.expression(tokens)))

  /** Column wrapper for the [[MisraGries]] aggregate. */
  def misraGries(item: Column, k: Int): Column =
    GraftSqlBridge.column(
      MisraGries(GraftSqlBridge.expression(item), k).toAggregateExpression())

  /** Column wrapper for the [[BloomBuild]] aggregate. */
  def bloomBuild(key: Column, numBits: Int, numHashes: Int): Column =
    GraftSqlBridge.column(
      BloomBuild(GraftSqlBridge.expression(key), numBits, numHashes).toAggregateExpression())

  /** Column wrapper for [[BloomMightContain]]. */
  def bloomMightContain(filter: Column, key: Column): Column =
    GraftSqlBridge.column(
      BloomMightContain(GraftSqlBridge.expression(filter), GraftSqlBridge.expression(key)))
}
