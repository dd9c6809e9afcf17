package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: per-document n-gram repetition
  * statistics (Gopher/C4-style signals) in ONE pass over the token
  * array — `struct(top2, tot2, dis3, tot3)` = (max bigram
  * multiplicity, bigram total, distinct trigram count, trigram
  * total).
  *
  * Why an expression and not a plan: the statistics are strictly
  * per-document, so the explode → groupBy(doc_id, gram) →
  * groupBy(doc_id) → join-back formulation shuffles a gram table ~2×
  * the token count of the corpus TWICE and then joins it back —
  * three exchanges for numbers each row can compute locally. As an
  * expression the whole query is a scan-side projection:
  * embarrassingly parallel, zero exchanges, no gram row ever
  * materialized outside its task (at 100 TB the gram shuffle is
  * ~2× corpus size of pure network traffic saved).
  *
  * Cost model per row: one String per token plus one HashMap/HashSet
  * of gram keys, all dead before the next row — allocation-heavy but
  * linear, and orders of magnitude under the exchange it replaces.
  * doGenCode stays inside whole-stage codegen by calling the static
  * [[RepetitionStats.compute]] (one virtual call per ROW, not a
  * per-element interpreted lambda — the HOF lesson).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("top2", LongType, nullable = false),
    StructField("tot2", LongType, nullable = false),
    StructField("dis3", LongType, nullable = false),
    StructField("tot3", LongType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    RepetitionStats.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RepetitionStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  /** One-pass gram statistics; called from generated code per row. */
  def compute(arr: ArrayData): InternalRow = {
    val m = arr.numElements()
    val tot2 = math.max(m - 1, 0).toLong
    val tot3 = math.max(m - 2, 0).toLong
    var top2 = 0L
    var dis3 = 0L
    if (m >= 2) {
      val words = new Array[String](m)
      var i = 0
      while (i < m) { words(i) = arr.getUTF8String(i).toString; i += 1 }
      val big = new java.util.HashMap[String, Integer]()
      i = 0
      while (i < m - 1) {
        val g = words(i) + " " + words(i + 1)
        val prev = big.get(g)
        val c = if (prev == null) 1 else prev.intValue() + 1
        big.put(g, Integer.valueOf(c))
        if (c > top2) top2 = c.toLong
        i += 1
      }
      if (m >= 3) {
        val tri = new java.util.HashSet[String]()
        i = 0
        while (i < m - 2) {
          tri.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
          i += 1
        }
        dis3 = tri.size.toLong
      }
    }
    new GenericInternalRow(Array[Any](top2, tot2, dis3, tot3))
  }
}
