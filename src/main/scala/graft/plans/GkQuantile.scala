package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.types._

/** STORED mergeable quantile sketches over Spark's Greenwald-Khanna
  * summary (`QuantileSummaries` — the structure behind
  * `approxQuantile`/`percentile_approx`): the quantile member of the
  * stored-sketch family (a02 HLL = distinct-union, a03 Misra-Gries =
  * heavy hitters, a04 KMV = set algebra). What the built-in
  * `percentile_approx` can NOT do is persist its state: these
  * aggregates emit/consume the sketch as a binary column, so a
  * pipeline stores one tiny sketch per day/partition and answers
  * "p99 over any date range" by MERGING sketches — no raw rescan.
  * State is O(1/err · log(err·N)) regardless of data size, and merge
  * keeps the GK rank-error guarantee (relative error ≤ 2·err after
  * merge, Greenwald & Khanna 2001 / Spark's implementation).
  *
  * [[GkSketch]]: doubles → sketch binary. [[GkMerge]]: sketch
  * binaries → merged sketch binary. [[GkQuery]]: sketch binary +
  * percentiles → array<double> estimates (scalar, not aggregate).
  */
object GkSerde {
  def write(s0: QuantileSummaries): Array[Byte] = {
    val s = s0.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(s.relativeError)
    out.writeInt(s.compressThreshold)
    out.writeLong(s.count)
    val st = s.sampled
    out.writeInt(st.length)
    var i = 0
    while (i < st.length) {
      out.writeDouble(st(i).value); out.writeLong(st(i).g)
      out.writeLong(st(i).delta); i += 1
    }
    out.flush(); bos.toByteArray
  }

  def read(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val err = in.readDouble()
    val thr = in.readInt()
    val count = in.readLong()
    val n = in.readInt()
    val st = new Array[QuantileSummaries.Stats](n)
    var i = 0
    while (i < n) {
      st(i) = QuantileSummaries.Stats(
        in.readDouble(), in.readLong(), in.readLong())
      i += 1
    }
    new QuantileSummaries(thr, err, st, count, true)
  }

  def mergeNonEmpty(
      a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
    if (a.count == 0) b
    else if (b.count == 0) a
    else a.compress().merge(b.compress())
}

/** Aggregate doubles into a GK quantile sketch, emitted as binary. */
case class GkSketch(
    child: Expression,
    relativeError: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] {

  require(relativeError > 0 && relativeError < 1,
    s"relativeError must be in (0, 1): $relativeError")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError)

  override def update(
      buf: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double]) else buf
  }

  override def merge(
      b1: QuantileSummaries, b2: QuantileSummaries): QuantileSummaries =
    GkSerde.mergeNonEmpty(b1, b2)

  override def eval(buf: QuantileSummaries): Any = GkSerde.write(buf)

  override def serialize(buf: QuantileSummaries): Array[Byte] =
    GkSerde.write(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    GkSerde.read(bytes)

  override def prettyName: String = "gk_sketch"
  override def withNewMutableAggBufferOffset(offset: Int): GkSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GkSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GkSketch =
    copy(child = newChildren.head)
}

/** Merge stored GK sketch binaries into one sketch binary — the
  * rollup aggregate that answers range queries from stored per-day
  * sketches without touching raw data. */
case class GkMerge(
    child: Expression,
    relativeError: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError)

  override def update(
      buf: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v != null)
      GkSerde.mergeNonEmpty(buf, GkSerde.read(v.asInstanceOf[Array[Byte]]))
    else buf
  }

  override def merge(
      b1: QuantileSummaries, b2: QuantileSummaries): QuantileSummaries =
    GkSerde.mergeNonEmpty(b1, b2)

  override def eval(buf: QuantileSummaries): Any = GkSerde.write(buf)

  override def serialize(buf: QuantileSummaries): Array[Byte] =
    GkSerde.write(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    GkSerde.read(bytes)

  override def prettyName: String = "gk_merge"
  override def withNewMutableAggBufferOffset(offset: Int): GkMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GkMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GkMerge =
    copy(child = newChildren.head)
}

/** Query a stored GK sketch binary for quantile estimates: scalar
  * expression, array<double> of the same length as `percentiles`.
  * NULL for an empty sketch (count 0). */
case class GkQuery(child: Expression, percentiles: Seq[Double])
  extends UnaryExpression with CodegenFallback {

  require(percentiles.nonEmpty &&
    percentiles.forall(p => p >= 0 && p <= 1),
    s"percentiles must be in [0, 1]: $percentiles")

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, false)

  override protected def nullSafeEval(input: Any): Any = {
    val s = GkSerde.read(input.asInstanceOf[Array[Byte]])
    if (s.count == 0) null
    else {
      val qs = s.query(percentiles).get
      new GenericArrayData(qs.map(q => q: Any).toArray)
    }
  }

  override def prettyName: String = "gk_query"
  override protected def withNewChildInternal(
      newChild: Expression): GkQuery = copy(child = newChild)
}
