package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a size-capped min-heap over (score, id)
  * pairs where "worst" = lowest score, ties broken by larger id (so
  * the kept set matches `ORDER BY score DESC, id ASC LIMIT k`).
  *
  * `dedupIds = true` keeps at most one entry per id (the best-scored
  * one) — for candidate streams where the same neighbor can arrive
  * several times (e.g. a pair colliding in more than one LSH table,
  * scored once per shared bucket with the SAME similarity). The
  * result then matches top-k over the DISTINCT (id → best score)
  * set: a duplicate of a kept id never occupies a second slot, and a
  * duplicate of an evicted id re-competes at its own score exactly
  * like a fresh entry. The membership scan is O(k) per add — free at
  * the k this engine uses (≤ tens). */
final class TopKBuffer(val k: Int, val dedupIds: Boolean = false) {
  // worst element dequeues first; also the output sort comparator
  private[plans] val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // lower score = worse
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // larger id = worse
    }
  }
  val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  def add(score: Double, id: Long): Unit = {
    if (dedupIds) {
      val it = heap.iterator
      while (it.hasNext) {
        val cur = it.next()
        if (cur._2 == id) {
          // already held: keep whichever scores better (our LSH
          // duplicates tie exactly, so this is almost always a skip)
          if (worstFirst.compare((score, id), cur) < 0) {
            val kept = heap.toArray.filter(_._2 != id)
            heap.clear(); kept.foreach(heap.enqueue(_))
            heap.enqueue((score, id))
          }
          return
        }
      }
    }
    if (heap.size < k) heap.enqueue((score, id))
    else if (worstFirst.compare((score, id), heap.head) < 0) {
      heap.dequeue(); heap.enqueue((score, id))
    }
  }

  def addAll(other: TopKBuffer): Unit =
    other.heap.foreach(p => add(p._1, p._2))

  /** best → worst — sorted with the SAME comparator the heap uses,
    * so NaN scores (e.g. cosine of a zero-norm vector) rank
    * identically in retention and output (Double.compare total
    * order: NaN above every value, matching Spark's DESC sort). */
  def sortedDesc: Array[(Double, Long)] =
    heap.toArray.sorted(worstFirst)
}

/** Top-k-per-group as a TypedImperativeAggregate: each partition
  * keeps a k-sized heap (map-side partial), heaps merge at the
  * reducer — O(N log k) work and k-row state per group, versus the
  * window row_number form's full per-group shuffle sort. The plan
  * difference is what matters at 100 TB: no sort of the candidate
  * set, just bounded-state aggregation.
  *
  * Input: struct<score: double, id: bigint>. Output:
  * array<struct<score, id>> sorted best→worst with the same tie
  * rule as ORDER BY score DESC, id ASC.
  */
case class TopKPairs(
    child: Expression,
    k: Int,
    dedupIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, dedupIds)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = child.eval(input).asInstanceOf[InternalRow]
    if (s != null && !s.isNullAt(0) && !s.isNullAt(1))
      buf.add(s.getDouble(0), s.getLong(1))
    buf
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    b1.addAll(b2); b1
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedDesc.map(p =>
      InternalRow(p._1, p._2): Any))

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val arr = buf.sortedDesc
    out.writeInt(buf.k); out.writeBoolean(buf.dedupIds)
    out.writeInt(arr.length)
    arr.foreach { p => out.writeDouble(p._1); out.writeLong(p._2) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt(), in.readBoolean())
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(child = newChildren.head)
}
