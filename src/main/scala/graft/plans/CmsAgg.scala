package graft.plans

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.CountMinSketch

/** STORED count-min sketches: point-FREQUENCY estimates as binary
  * columns — the frequency member of the stored-sketch family (a02
  * HLL distinct, a03 MG heavy hitters, a04 KMV set algebra, a05 GK
  * quantiles, a06 Bloom membership). A CMS is a depth×width counter
  * matrix; an item increments one counter per row, the estimate is
  * the min over rows — never an undercount, overestimate ≤ eps·N with
  * probability 1−confidence. Counters are LINEAR, so merging per-day
  * sketches (element-wise sum) is byte-identical to one sketch built
  * over the union, given identical (depth, width, seed) — pinned by
  * construction here, spec-pinned in SketchSpec. Ship yesterday's
  * sketch to today's job and answer "how often did key X appear this
  * quarter" without rescanning a single day.
  *
  * Long keys only (hash wider types to a long first, as a06); NULLs
  * are skipped.
  */
object CmsSerde {
  def write(s: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    s.writeTo(bos)
    bos.toByteArray
  }
}

/** Aggregate long keys into a count-min sketch binary. */
case class CmsSketchAgg(
    child: Expression,
    eps: Double = 0.001,
    confidence: Double = 0.99,
    seed: Int = 42,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  require(eps > 0 && eps < 1, s"eps must be in (0, 1): $eps")
  require(confidence > 0 && confidence < 1,
    s"confidence must be in (0, 1): $confidence")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buf.addLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
    b1.mergeInPlace(b2)

  override def eval(buf: CountMinSketch): Any = CmsSerde.write(buf)
  override def serialize(buf: CountMinSketch): Array[Byte] = CmsSerde.write(buf)
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(bytes)

  override def prettyName: String = "cms_sketch"
  override def withNewMutableAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren.head)
}

/** Merge stored count-min sketch binaries (element-wise counter sum). */
case class CmsMergeAgg(
    child: Expression,
    eps: Double = 0.001,
    confidence: Double = 0.99,
    seed: Int = 42,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) {
      val in = CountMinSketch.readFrom(v.asInstanceOf[Array[Byte]])
      // fail fast with the parameter mismatch spelled out: Spark's own
      // mergeInPlace throws IncompatibleMergeException deep in a task
      // with only the dimension numbers, which doesn't tell the caller
      // WHICH stored column was built under different (eps, confidence)
      if (in.depth != buf.depth || in.width != buf.width)
        throw new IllegalArgumentException(
          s"cms_merge: stored sketch has depth=${in.depth} width=${in.width} " +
            s"but this merge expects depth=${buf.depth} width=${buf.width} " +
            s"(eps=$eps, confidence=$confidence, seed=$seed) — stored sketches " +
            "must be built with the same parameters they are merged under")
      buf.mergeInPlace(in)
    }
    buf
  }

  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
    b1.mergeInPlace(b2)

  override def eval(buf: CountMinSketch): Any = CmsSerde.write(buf)
  override def serialize(buf: CountMinSketch): Array[Byte] = CmsSerde.write(buf)
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(bytes)

  override def prettyName: String = "cms_merge"
  override def withNewMutableAggBufferOffset(offset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren.head)
}
