package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k minimum values) distinct-set sketch: the k smallest
  * distinct hash values of a set, in UNSIGNED hash order. Where HLL
  * (a02) only unions, KMV sketches also support JACCARD and therefore
  * distinct-INTERSECTION estimates between sets — the k smallest of
  * A∪B are a uniform sample of A∪B, so the fraction of them present
  * in both sketches estimates |A∩B|/|A∪B| (Beyer et al., "On synopses
  * for distinct-value estimation under multiset operations").
  *
  * Buffer: a bounded sorted set (k values max, dedup by value).
  * Merging takes the k smallest of the union — associative and
  * lossless w.r.t. the sketch definition, so map-side partials are
  * exact. Values are stored XOR Long.MinValue so SIGNED order equals
  * the unsigned order of the raw hashes (array functions downstream
  * can sort/slice them with plain comparisons).
  *
  * Input: a 64-bit hash column (xxhash64(...)); NULLs skipped.
  * Output: array<bigint>, ascending, size ≤ k (size < k ⇒ the set had
  * fewer than k distinct hashes — estimates become exact counts).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 1, s"KmvSketch needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    val t = h ^ Long.MinValue // unsigned order under signed compare
    if (buf.size < k) { buf.add(t); () }
    else if (t < buf.last) {
      if (buf.add(t)) buf.remove(buf.last)
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val t = it.next()
      if (b1.size < k) b1.add(t)
      else if (t < b1.last) { if (b1.add(t)) b1.remove(b1.last) }
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(
      buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new java.util.TreeSet[java.lang.Long]()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}
