package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary with `m` counters (the batched
  * "subtract the minimum" variant). Invariant: for every key,
  * `true_count - offset_error <= est <= true_count`, with total
  * undercount bounded by `n / (m + 1)` — so every key with true
  * frequency above `n / (m + 1)` is guaranteed present. Merging sums
  * counters then re-trims to `m` by subtracting the (m+1)-th largest
  * count (Agarwal et al., mergeable summaries): the guarantee
  * survives map-side partials + reducer merge.
  */
final class MGSummary(val m: Int) {
  require(m >= 1, s"MGSummary needs m >= 1 counters, got $m")

  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(key: String, w: Long = 1L): Unit = {
    counts.get(key) match {
      case Some(c) => counts.update(key, c + w)
      case None =>
        counts.update(key, w)
        if (counts.size > m) trim()
    }
  }

  /** Subtract the (m+1)-th largest count from everything; drop ≤0.
    * Restores size ≤ m while preserving the MG undercount bound. */
  private def trim(): Unit = {
    if (counts.size <= m) return
    val sorted = counts.values.toArray
    java.util.Arrays.sort(sorted)
    val cut = sorted(sorted.length - m - 1) // (m+1)-th largest
    counts.filterInPlace((_, c) => c - cut > 0L)
    counts.mapValuesInPlace((_, c) => c - cut)
  }

  def mergeIn(other: MGSummary): Unit = {
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    trim()
  }

  /** est desc, key asc — deterministic output order. */
  def sortedDesc: Array[(String, Long)] =
    counts.toArray.sortBy { case (k, c) => (-c, k) }
}

/** Heavy-hitter candidates as a TypedImperativeAggregate: each
  * partition keeps an m-counter Misra–Gries summary (map-side
  * partial), summaries merge at the reducer — bounded state
  * regardless of key cardinality, versus a full groupBy's
  * cardinality-sized shuffle. The candidate set is a guaranteed
  * superset of every key with frequency > n/(m+1); pair with an
  * exact-count verify pass (filtered to candidates) for exact top-k
  * at scale ([[graft.operators.Sketches.heavyHitters]]).
  *
  * Input: a string key expression (NULLs skipped). Output:
  * array<struct<key: string, est: bigint>>, est desc / key asc.
  */
case class MisraGries(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {

  require(m >= 1, s"MisraGries needs m >= 1 counters, got $m")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType), StructField("est", LongType))))

  override def createAggregationBuffer(): MGSummary = new MGSummary(m)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(b1: MGSummary, b2: MGSummary): MGSummary = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: MGSummary): Any =
    new GenericArrayData(buf.sortedDesc.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c): Any
    })

  // length-prefixed raw UTF-8, not writeUTF: keys are whole column
  // values (heavyHitters casts arbitrary columns to string) and
  // writeUTF throws past 64 KB of modified-UTF-8
  override def serialize(buf: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.m)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MGSummary(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}
