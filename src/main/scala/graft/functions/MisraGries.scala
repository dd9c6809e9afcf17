package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a native mergeable aggregate
  * (TypedImperativeAggregate): `misra_gries(item, k)` returns up to
  * `k` candidate items, each with its counter value.
  *
  * Why a sketch at all: finding items with frequency > n/t over an
  * OPEN key domain (URLs, shingles, error strings) with a plain
  * `groupBy(item)` shuffles the full distinct-item table — data-sized
  * at 100 TB. The sketch reduces each partition to k counters, so the
  * only thing that crosses the network is one ≤ k-entry summary per
  * partition (map-side partial → single tiny merge). The price is
  * approximation, with a hard one-sided guarantee:
  *
  *   counter(x) ≤ freq(x) ≤ counter(x) + n/(k+1)
  *
  * so every item with freq(x) > n/(k+1) is GUARANTEED present in the
  * output (the classic Misra–Gries bound; each decrement event retires
  * k+1 occurrences, so at most n/(k+1) decrements ever happen). The
  * candidate SET is therefore a superset of the true heavy hitters —
  * callers that need exactness re-count just the candidates in a
  * second filtered pass (see [[graft.text.Corpus.heavyHitters]]),
  * which is the standard two-pass exact heavy-hitters design.
  *
  * Merging partial sketches follows Agarwal et al., "Mergeable
  * Summaries" (PODS 2012): add counters pointwise, then subtract the
  * (k+1)-th largest counter from all and drop the non-positive —
  * which preserves the error bound with n = n₁+n₂. Counter VALUES
  * (and which below-threshold extras survive) depend on partition
  * order, but the guarantee — true heavy hitters always present — is
  * order-independent, which is exactly the determinism contract the
  * two-pass recount needs.
  *
  * Update cost is amortized O(1): a decrement pass costs O(k) but at
  * most n/(k+1) such passes happen, so total work is O(n). Eviction
  * hygiene: stored keys are CLONED UTF8Strings (the input pointer
  * aliases the scan's reused row buffer).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, "misra_gries needs k >= 1 counters")

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string item column, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty[UTF8String, Long]

  override def update(
      buffer: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buffer.get(item) match {
        case Some(c) => buffer.update(item, c + 1L)
        case None =>
          if (buffer.size < k) buffer.update(item.clone(), 1L)
          else decrementAll(buffer)
      }
    }
    buffer
  }

  // the decrement step: every counter -1 (the arriving item's implicit
  // counter of 1 also dies), zeros evicted
  private def decrementAll(buffer: mutable.HashMap[UTF8String, Long]): Unit = {
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    buffer.mapValuesInPlace { (key, c) =>
      if (c == 1L) dead += key
      c - 1L
    }
    dead.foreach(buffer.remove)
  }

  override def merge(
      buffer: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (item, c) =>
      buffer.update(item, buffer.getOrElse(item, 0L) + c)
    }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest counter value from everything;
      // at most k entries can strictly exceed it, so the result fits
      val values = buffer.values.toArray
      java.util.Arrays.sort(values)
      val sub = values(values.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buffer.mapValuesInPlace { (key, c) =>
        if (c - sub <= 0L) dead += key
        c - sub
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic presentation order (est desc, item asc); the VALUES
    // are order-dependent estimates — see scaladoc
    val sorted = buffer.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c)
    })
  }

  override def serialize(buffer: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (item, c) =>
      val bytes = item.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val buffer = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      buffer.update(UTF8String.fromBytes(bytes), in.readLong())
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
