package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a native Catalyst aggregate.
  *
  * One pass, O(capacity) state per partial buffer: an item whose true
  * frequency exceeds N/(capacity+1) is GUARANTEED to be in the final
  * summary (the classic deterministic bound, which survives arbitrary
  * partial-buffer merging per Agarwal et al., "Mergeable Summaries":
  * merge sums counts pairwise, then subtracts the (capacity+1)-th
  * largest count from all entries to shrink back — errors add to at
  * most N/(capacity+1) overall).
  *
  * The summary is a CANDIDATE set, not a count estimate: which
  * below-threshold items also survive depends on merge order, and the
  * residual counts are order-dependent too, so `eval` returns only the
  * surviving items (lexicographically sorted). Exactness is restored
  * downstream by re-counting the ≤ capacity candidates in a second
  * pass ([[graft.operators.Scale.heavyHittersExact]]) — the two-scan
  * plan that makes EXACT heavy hitters cheap at 100 TB: scan 1 moves
  * only O(capacity) state per partition, scan 2 shuffles only
  * candidate keys.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be positive, got $capacity")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries expects a string child, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < capacity =>
          // clone: the UTF8String points into a reused row buffer
          buf.update(s.clone(), 1L)
        case None =>
          // decrement-all: amortized O(1) per input — each pass here
          // cancels capacity+1 occurrences (the arriving one included)
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.mapValuesInPlace { (k, c) =>
            if (c == 1L) dead += k
            c - 1L
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, v) =>
      buf.update(k, buf.getOrElse(k, 0L) + v)
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything:
      // at most `capacity` entries can exceed it, so the map shrinks
      // back while keeping every above-threshold item's bound intact
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val t = counts(counts.length - (capacity + 1))
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.mapValuesInPlace { (k, c) =>
        if (c <= t) dead += k
        c - t
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val keys = buf.keys.toArray
    java.util.Arrays.sort(keys, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(keys.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      val b = k.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.getInt
      val b = new Array[Byte](len)
      in.get(b)
      val v = in.getLong
      buf.update(UTF8String.fromBytes(b), v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
