package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole MinHash signature as ONE aggregate: a long[numHashes]
  * buffer of per-seed minima updated in a single pass over the
  * shingles, instead of `numHashes` separate `min(xxhash64(i, s))`
  * aggregate expressions each with its own buffer slot and its own
  * re-hash of the shingle bytes.
  *
  * Value parity is exact: slot i holds
  * min over shingles of xxhash64(i, shingle), computed with the same
  * chained [[XxHash64Function]] Spark's `xxhash64(lit(i), col)` uses
  * (seed 42 → hash the int → hash the UTF8 bytes), so signatures are
  * byte-identical to the expression form (spec-asserted) and LSH band
  * hashes downstream are unchanged.
  *
  * Plan shape: ObjectHashAggregate with map-side partials; merge is
  * elementwise min. State is numHashes longs per group either way —
  * what this buys is one buffer object instead of 64 slots, one
  * input-bytes traversal per shingle instead of 64, and an API that
  * returns the signature as a single `array<bigint>` column.
  */
case class MinHashSig(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numHashes > 0, s"numHashes must be positive: $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val s = child.eval(input)
    if (s != null) {
      val utf8 = s.asInstanceOf[UTF8String]
      var i = 0
      while (i < numHashes) {
        // exact xxhash64(lit(i), shingle) chain: seed 42, int, bytes
        val h = XxHash64Function.hash(utf8, StringType,
          XxHash64Function.hash(i, IntegerType, 42L))
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * numHashes)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(numHashes)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSig =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): MinHashSig =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSig =
    copy(child = newChildren.head)
}
