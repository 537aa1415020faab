package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Grouped top-k as a TypedImperativeAggregate: per group, keep the k best
  * (score, id) pairs — score descending, ties broken by ascending id, so
  * the result is deterministic under any partitioning.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY g
  * ORDER BY s DESC) <= k` shuffles and SORTS every row of every group; this
  * aggregate keeps an O(k) bounded heap per group, combines map-side, and
  * ships only k pairs per group per partition through the shuffle — the
  * scale-correct shape for "top N documents per language over 100 TB".
  *
  * Result: array<struct<score double, id bigint>> sorted best-first.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Number].doubleValue(), i.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.mergeFrom(b); a }

  override def eval(buf: TopKBuffer): Any = {
    val best = buf.sortedBestFirst
    new GenericArrayData(best.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buf.sortedBestFirst
    out.writeInt(items.length)
    items.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    (0 until n).foreach(_ => buf.offer(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

/** Bounded "k best" buffer: heap keyed so the WORST held pair surfaces
  * first, making eviction O(log k). Best = higher score, then LOWER id
  * (deterministic ties). */
final class TopKBuffer(k: Int) {
  // compare(a, b) > 0 ⇔ a is WORSE than b (lower score, or same score and
  // higher id). PriorityQueue dequeues its ordering's maximum → the worst.
  private val byWorseness: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
  private val heap =
    scala.collection.mutable.PriorityQueue.empty[(Double, Long)](byWorseness)

  def offer(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else if (byWorseness.compare((score, id), heap.head) < 0) { // better than worst
      heap.dequeue()
      heap.enqueue((score, id))
    }
  }

  def mergeFrom(other: TopKBuffer): Unit =
    other.heap.foreach { case (s, i) => offer(s, i) }

  def sortedBestFirst: Array[(Double, Long)] =
    heap.toArray.sortBy { case (s, i) => (-s, i) }
}

object TopKByKey {
  /** Column API: top-k (score, id) pairs per group; explode downstream. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKPairs(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())
}
