package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a TypedImperativeAggregate — the
  * mutable-buffer custom-aggregate extension point (SURVEY §2.8).
  *
  * Guarantee: any value occurring more than n/k times is in the result, with
  * count under-estimated by at most n/k. The buffer holds at most k entries,
  * so the shuffle carries O(k) bytes per partition regardless of input size
  * — the canonical "vocabulary heavy hitters over 100 TB of tokens" shape
  * where exact groupBy-count would shuffle every distinct token.
  *
  * Merge uses the standard pairwise Misra–Gries combination (sum counts,
  * then subtract the (k+1)-th largest and drop non-positives), preserving
  * the error bound across partitions.
  *
  * Result: map<string, long> of surviving candidates and their (lower-bound)
  * counts.
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  private def offer(buf: mutable.HashMap[String, Long], v: String, c: Long): Unit = {
    buf.get(v) match {
      case Some(prev) => buf(v) = prev + c
      case None =>
        if (buf.size < k) buf(v) = c
        else {
          // decrement-all step, amortized over the offered count; the
          // decrement/prune pass runs BEFORE the offered key is inserted so
          // the new entry is not double-decremented (it enters at c - dec).
          val dec = math.min(c, buf.values.min)
          buf.mapValuesInPlace((_, cnt) => cnt - dec)
          buf.filterInPlace((_, cnt) => cnt > 0)
          if (c > dec) buf(v) = c - dec
        }
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString, 1L)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (v, c) => offer(a, v, c) }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toSeq.sortBy { case (v, c) => (-c, v) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1))),
      new GenericArrayData(entries.map(_._2)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, c) =>
      val bytes = v.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HeavyHitters {
  /** Column API: heavy-hitter sketch of a string column. */
  def approxTopK(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesTopK(ColumnBridge.expression(c), k).toAggregateExpression())
}
