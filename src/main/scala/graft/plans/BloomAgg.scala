package graft.plans

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** STORED bloom-filter sketches: build membership filters as binary
  * columns (one per day/partition), merge them later (bitwise OR —
  * exact: merging per-partition filters is byte-identical to one
  * filter built over the union, given identical size parameters),
  * probe with [[BloomMightContain]]. The membership member of the
  * stored-sketch family (a02 HLL, a03 MG, a04 KMV, a05 GK): ship
  * yesterday's seen-ID filter to today's job and prune the scan
  * without touching yesterday's data.
  *
  * Long keys only, like [[BloomMightContain]] — hash wider types to
  * a long first. NULLs are skipped. All partial/merged filters MUST
  * share (expectedItems, fpp) or mergeInPlace throws
  * IncompatibleMergeException — by construction here, since both
  * aggregates pin the parameters.
  */
object BloomSerde {
  def write(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}

/** Aggregate long keys into a bloom filter binary. */
case class BloomSketchAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
  require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter =
    b1.mergeInPlace(b2)

  override def eval(buf: BloomFilter): Any = BloomSerde.write(buf)
  override def serialize(buf: BloomFilter): Array[Byte] = BloomSerde.write(buf)
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(bytes)

  override def prettyName: String = "bloom_sketch"
  override def withNewMutableAggBufferOffset(offset: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomSketchAgg =
    copy(child = newChildren.head)
}

/** Merge stored bloom filter binaries (bitwise OR) into one. */
case class BloomMergeAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.mergeInPlace(
      BloomFilter.readFrom(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter =
    b1.mergeInPlace(b2)

  override def eval(buf: BloomFilter): Any = BloomSerde.write(buf)
  override def serialize(buf: BloomFilter): Array[Byte] = BloomSerde.write(buf)
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(bytes)

  override def prettyName: String = "bloom_merge"
  override def withNewMutableAggBufferOffset(offset: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomMergeAgg =
    copy(child = newChildren.head)
}
