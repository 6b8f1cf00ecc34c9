package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch as a native imperative aggregate — the
  * one-pass, fixed-memory frequent-items summary (Misra & Gries 1982;
  * mergeable form per Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * The buffer holds at most `capacity` counters. Guarantee: after any
  * sequence of updates and merges over N rows, every value with true
  * frequency f > N/(capacity+1) is present in the buffer (its counter
  * undercounts by at most N/(capacity+1), hence stays positive). The
  * CANDIDATE SET is therefore a superset of the true heavy hitters no
  * matter how Spark partitions the data or orders the partial-aggregate
  * merges — which is what makes a two-pass exact answer possible: sketch
  * pass → bounded candidate list → exact recount of candidates only.
  *
  * The eval result is the SORTED candidate list (counts deliberately not
  * exposed: counter values depend on merge order; the membership guarantee
  * does not). Genuinely a custom-aggregate case per SURVEY.md §4.2:
  * fixed-memory stream summaries are not composable from Spark's built-in
  * aggregates (`collect_*` grow unboundedly; `approx_count_distinct` solves
  * a different problem).
  *
  * Scale shape: each task carries one ≤capacity-entry map; partials
  * serialize to a few KB regardless of input size; the final merge touches
  * #partitions × capacity entries. This is the 100 TB answer to "top
  * domains / hottest keys / most frequent tokens" that never shuffles the
  * corpus — only sketches move.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity >= 1, "misra_gries capacity must be >= 1")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string column, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < capacity => buf(s) = 1L
        case None =>
          // full and unseen: decrement every counter (the arriving item's
          // implicit counter hits 0 immediately), drop exhausted ones
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buf(k) = buf.getOrElse(k, 0L) + c
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest counter from all — the merged
      // sketch keeps <= capacity counters and the summed error stays within
      // the N/(capacity+1) bound (Agarwal et al. 2012, §3.2)
      val d = buf.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - d)
      buf.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, java.nio.charset.StandardCharsets.UTF_8)) =
        in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}
