package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Shared hashing for the Bloom pair ([[BloomBuild]] /
  * [[BloomMightContain]]): the Kirsch–Mitzenmacher double-hashing
  * scheme — bit i probes position (h1 + i·h2) mod m — over two
  * splitmix64-finalized hashes of the input long. Build and probe MUST
  * agree bit for bit, so both go through these two functions (the
  * probe's generated code calls them too — a ~10-instruction static
  * call, JIT-inlined).
  */
object BloomHash {
  /** splitmix64 finalizer — full-avalanche mix of (v ^ seed). */
  def mix(v: Long, seed: Long): Long = {
    var z = v ^ seed
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  val Seed1 = 0x9e3779b97f4a7c15L
  val Seed2 = 0xc2b2ae3d27d4eb4fL

  /** The i-th probe position in [0, m). h2 is forced odd so all k
    * probe positions stay distinct for power-of-two-free m too.
    */
  def position(v: Long, i: Int, m: Int): Int = {
    val h1 = mix(v, Seed1)
    val h2 = mix(v, Seed2) | 1L
    java.lang.Math.floorMod(h1 + i * h2, m.toLong).toInt
  }
}

/** Native mergeable Bloom-filter aggregate: `bloom_build(v, numBits,
  * numHashes)` over pre-hashed LONG keys (callers feed `xxhash64(x)` —
  * keeping the key-hashing policy visible in the plan) returns the
  * filter as BINARY: a 4-byte big-endian numHashes header + the bit
  * array.
  *
  * Why: an exact membership screen against a 100 TB store either
  * shuffles the probe side against the store's key index (a join) or
  * ships a COMPACT summary of the store to the probes. The Bloom
  * filter is that summary — bitsPerKey·n bits total regardless of key
  * size, one map-side pass to build (partials are bit arrays, merge
  * is byte-wise OR — fully order-independent, so unlike the
  * Misra–Gries sketch the RESULT is deterministic for a given input
  * set), no false negatives ever, false positives at the standard
  * (1 − e^(−kn/m))^k rate. The probe side then filters scan-side with
  * [[BloomMightContain]] and only the (tiny) maybe-set pays the exact
  * verification join — Spark's own runtime bloom-join optimization,
  * made explicit and persistable.
  */
case class BloomBuild(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(numBits >= 8 && numBits % 8 == 0,
    s"bloom_build needs a positive multiple-of-8 bit count, got $numBits")
  require(numHashes >= 1 && numHashes <= 32, s"bloom_build needs 1..32 hashes, got $numHashes")

  override def prettyName: String = "bloom_build"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long (pre-hashed) key column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBits / 8)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val pos = BloomHash.position(key, i, numBits)
        buffer(pos >>> 3) = (buffer(pos >>> 3) | (1 << (pos & 7))).toByte
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) { buffer(i) = (buffer(i) | other(i)).toByte; i += 1 }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = {
    val out = new Array[Byte](4 + buffer.length)
    out(0) = (numHashes >>> 24).toByte
    out(1) = (numHashes >>> 16).toByte
    out(2) = (numHashes >>> 8).toByte
    out(3) = numHashes.toByte
    System.arraycopy(buffer, 0, out, 4, buffer.length)
    out
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuild =
    copy(child = newChild)
}

/** Scan-side Bloom membership probe: `bloom_might_contain(filter, v)`
  * — filter is the self-describing BINARY [[BloomBuild]] emits
  * (4-byte numHashes header + bit array; usually a collected driver
  * artifact embedded as a literal, the centroid-table move), v the
  * same pre-hashed LONG key domain the filter was built over. False
  * positives possible, false negatives impossible (the Bloom
  * contract). Codegen'd: the probe loop is numHashes static-call
  * mixes + bit tests per row, no allocation.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary filter, long key), got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(f: Any, v: Any): Any = {
    val filter = f.asInstanceOf[Array[Byte]]
    if (filter.length <= 4) return null
    val k = ((filter(0) & 0xff) << 24) | ((filter(1) & 0xff) << 16) |
      ((filter(2) & 0xff) << 8) | (filter(3) & 0xff)
    val m = (filter.length - 4) * 8
    val key = v.asInstanceOf[Long]
    var i = 0
    while (i < k) {
      val pos = BloomHash.position(key, i, m)
      if ((filter(4 + (pos >>> 3)) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, v) => {
      val k = ctx.freshName("k")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val hit = ctx.freshName("hit")
      val bh = "graft.functions.BloomHash$.MODULE$"
      s"""
         |if ($f.length <= 4) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = (($f[0] & 0xff) << 24) | (($f[1] & 0xff) << 16) |
         |    (($f[2] & 0xff) << 8) | ($f[3] & 0xff);
         |  int $m = ($f.length - 4) * 8;
         |  boolean $hit = true;
         |  for (int $i = 0; $i < $k; $i++) {
         |    int $pos = $bh.position($v, $i, $m);
         |    if (($f[4 + ($pos >>> 3)] & (1 << ($pos & 7))) == 0) { $hit = false; break; }
         |  }
         |  ${ev.value} = $hit;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
