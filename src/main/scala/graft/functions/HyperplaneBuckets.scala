package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: all `tables` random-hyperplane LSH
  * bucket values of one embedding vector, in a single fused loop.
  *
  * Bucket bit b of table t is the sign of the dot product between the
  * vector and a deterministic pseudo-random plane whose component j is
  * `xxhash64(t*1000003 + b*1009 + j) / 2^63` (the exact value the SQL
  * `xxhash64` function produces for an INT input, seed 42 — pinned by
  * a parity test). The planes are precomputed ONCE driver-side into a
  * flat `double[]` and shipped as a codegen reference object.
  *
  * Why an expression and not composed Columns: the composed form — 64
  * `vec_dot(v, <literal plane>)` columns — constant-folds and
  * whole-stage-compiles, but the generated method is ~150 KB of
  * source, far past HotSpot's huge-method JIT limit, so the hot path
  * runs in the BYTECODE INTERPRETER (~600 µs/row observed — a
  * scale-killer disguised as a working plan; the explode+wide-agg
  * formulation it replaced instead paid ~10 s of one-time janino
  * compile plus a corpus shuffle). This loop is ~40 lines of
  * generated code: it JITs, vectorizes over a plain double[], and
  * keeps bucketing a pure scan-side projection.
  *
  * Null semantics: a null vector, a vector whose length != `dims`, or
  * any null element yields null (such vectors can never survive the
  * exact re-score in any LSH consumer — VecDot nulls them — so
  * dropping them at bucketing changes no results).
  */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int, dims: Int)
    extends UnaryExpression {

  require(tables > 0 && dims > 0, s"tables ($tables) and dims ($dims) must be positive")
  // bits > 63 would wrap 1L << (bits-1-b) and silently collide bit
  // weights; fail at construction, not with degraded recall
  require(bits > 0 && bits <= 63, s"bits ($bits) must be in [1, 63]")
  require(tables.toLong * bits * dims <= Int.MaxValue,
    s"plane table tables*bits*dims = ${tables.toLong * bits * dims} overflows Int")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  @transient private lazy val planes: Array[Double] =
    HyperplaneBuckets.planes(tables, bits, dims)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dims) return null
    val vv = new Array[Double](dims)
    var j = 0
    while (j < dims) {
      if (v.isNullAt(j)) return null
      vv(j) = v.getDouble(j)
      j += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dims
        var acc = 0.0
        var k = 0
        while (k < dims) { acc += vv(k) * planes(base + k); k += 1 }
        if (acc > 0.0) bucket |= 1L << (bits - 1 - b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val vv = ctx.freshName("vv")
      val bad = ctx.freshName("bad")
      val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val base = ctx.freshName("base")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
         |if ($v.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $vv = new double[$dims];
         |  boolean $bad = false;
         |  for (int $j = 0; $j < $dims; $j++) {
         |    if ($v.isNullAt($j)) { $bad = true; break; }
         |    $vv[$j] = $v.getDouble($j);
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long[] $out = new long[$tables];
         |    for (int $t = 0; $t < $tables; $t++) {
         |      long $bucket = 0L;
         |      for (int $b = 0; $b < $bits; $b++) {
         |        int $base = ($t * $bits + $b) * $dims;
         |        double $acc = 0.0;
         |        for (int $k = 0; $k < $dims; $k++) {
         |          $acc += $vv[$k] * $planesRef[$base + $k];
         |        }
         |        if ($acc > 0.0) { $bucket |= 1L << (${bits - 1} - $b); }
         |      }
         |      $out[$t] = $bucket;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** Flat plane table: component j of bit b of table t at
    * `[(t*bits + b)*dims + j]` — `XXH64.hashInt(mix, 42)` is
    * bit-identical to the SQL `xxhash64(CAST(mix AS INT))`.
    */
  def planes(tables: Int, bits: Int, dims: Int): Array[Double] = {
    val arr = new Array[Double](tables * bits * dims)
    var idx = 0
    for (t <- 0 until tables; b <- 0 until bits; j <- 0 until dims) {
      arr(idx) = XXH64.hashInt(t * 1000003 + b * 1009 + j, 42L).toDouble / 9.223372036854776e18
      idx += 1
    }
    arr
  }
}
