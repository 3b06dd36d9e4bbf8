package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The ONE total order every pair buffer retains and emits by:
  * >0 iff (s1,i1) is WORSE than (s2,i2) — lower score, ties broken
  * by larger id. Double.compare's total order puts NaN above every
  * value (a NaN cosine ranks best, matching Spark's DESC sort) and
  * orders -0.0 below 0.0 strictly, so ±0.0-scored entries sort
  * identically in the heap, the threshold buffer, and the windowed
  * row_number form. */
private[plans] object PairOrder {
  @inline def cmp(s1: Double, i1: Long, s2: Double, i2: Long): Int = {
    val c = java.lang.Double.compare(s2, s1) // lower score = worse
    if (c != 0) c else java.lang.Long.compare(i1, i2) // larger id = worse
  }
}

/** Bounded top-k buffer: a size-capped binary heap over (score, id)
  * pairs where "worst" = lowest score, ties broken by larger id (so
  * the kept set matches `ORDER BY score DESC, id ASC LIMIT k`).
  *
  * Storage is two parallel PRIMITIVE arrays (scores, ids) with
  * hand-rolled sift ops — not a `PriorityQueue[(Double, Long)]`.
  * The update path runs once per candidate row, and the LSH pair
  * folds push ~10⁸ rows per trigger through it: the tuple-per-add
  * (plus the queue's internal growth/iterator churn) measurably
  * dominated the fold stages' GC at sf1.0 (stack-sampled: the top
  * frames were ArrayBuilder.resize under TopKBuffer.add). The
  * primitive form allocates NOTHING per add.
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
  // arrays grow geometrically up to k: sparse groups (e.g. the ANN
  // candidate aggregation after the rerankBudget floor raised k to
  // n/16, capped 2^16) should not pay a ~1 MB eager allocation per
  // group buffer when they only ever see a handful of rows
  private var scores = new Array[Double](math.min(math.max(k, 0), 16))
  private var ids = new Array[Long](scores.length)
  private var n = 0

  @inline private def cmp(s1: Double, i1: Long, s2: Double, i2: Long): Int =
    PairOrder.cmp(s1, i1, s2, i2)

  // max-heap on "worseness": the root is the worst kept entry
  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (cmp(scores(i), ids(i), scores(p), ids(p)) > 0) {
        val s = scores(i); scores(i) = scores(p); scores(p) = s
        val d = ids(i); ids(i) = ids(p); ids(p) = d
        i = p
      } else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < n && cmp(scores(l), ids(l), scores(w), ids(w)) > 0) w = l
      if (r < n && cmp(scores(r), ids(r), scores(w), ids(w)) > 0) w = r
      if (w == i) return
      val s = scores(i); scores(i) = scores(w); scores(w) = s
      val d = ids(i); ids(i) = ids(w); ids(w) = d
      i = w
    }
  }

  def add(score: Double, id: Long): Unit = {
    if (k <= 0) return
    if (dedupIds) {
      var i = 0
      while (i < n) {
        if (ids(i) == id) {
          // already held: keep whichever scores better (our LSH
          // duplicates tie exactly, so this is almost always a skip)
          if (cmp(scores(i), ids(i), score, id) > 0) {
            scores(i) = score; ids(i) = id
            siftDown(i); siftUp(i)
          }
          return
        }
        i += 1
      }
    }
    if (n < k) {
      if (n == scores.length) {
        val newCap = math.min(k, math.max(n * 2, 16))
        scores = java.util.Arrays.copyOf(scores, newCap)
        ids = java.util.Arrays.copyOf(ids, newCap)
      }
      scores(n) = score; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (cmp(scores(0), ids(0), score, id) > 0) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  def addAll(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** best → worst — sorted with the SAME order the heap retains by,
    * so NaN scores (e.g. cosine of a zero-norm vector) rank
    * identically in retention and output. */
  def sortedDesc: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) =>
        cmp(a._1, a._2, b._1, b._2) < 0)
    out
  }
}

/** Top-k-per-group as a TypedImperativeAggregate: each partition
  * keeps a k-sized heap (map-side partial), heaps merge at the
  * reducer — O(N log k) work and k-row state per group, versus the
  * window row_number form's full per-group shuffle sort. The plan
  * difference is what matters at 100 TB: no sort of the candidate
  * set, just bounded-state aggregation.
  *
  * Input: score (double), id (bigint) as SEPARATE children — a
  * single struct child would allocate a GenericInternalRow plus two
  * boxes per input row just to be unpacked again (TypedImperative
  * update is interpreted, once per candidate row). Output:
  * array<struct<score, id>> sorted best→worst with the same tie
  * rule as ORDER BY score DESC, id ASC.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    dedupIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, dedupIds)

  // Unboxed update fast path: after binding, the children are
  // usually bare BoundReferences (the Cast at the call site folds
  // away when the inputs are already double/long), and `eval`'s
  // boxed Any return would allocate two wrappers per candidate row —
  // ~10⁹ allocations per trigger in the LSH pair folds. Read the
  // primitives straight off the input row instead; any non-trivial
  // child expression falls back to eval.
  @transient private lazy val scoreOrd: Int = score match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
        if b.dataType == DoubleType => b.ordinal
    case _ => -1
  }
  @transient private lazy val idOrd: Int = id match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
        if b.dataType == LongType => b.ordinal
    case _ => -1
  }

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    if (scoreOrd >= 0 && idOrd >= 0) {
      if (!input.isNullAt(scoreOrd) && !input.isNullAt(idOrd))
        buf.add(input.getDouble(scoreOrd), input.getLong(idOrd))
    } else {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null)
        buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
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
    copy(score = newChildren(0), id = newChildren(1))
}

/** Buffer for the RETENTION prune (keep rank ≤ k OR score > t): all
  * above-threshold entries plus a k-bounded below-threshold heap, in
  * ONE pass over the scored stream. A NaN score joins neither side —
  * exactly the two-filter form it replaces (`> t` and `<= t` both
  * reject NaN).
  *
  * `dedupIds = true` is id-unique ACROSS the threshold, best score
  * wins — matching TopKBuffer's dedup semantics so a general caller
  * of `Similarity.thresholdTopKAgg` gets top-k-over-distinct-ids
  * behavior, not just the LSH folds' bit-equal-duplicate case: a
  * repeat above-side arrival keeps the better score (not the
  * first-seen), and an id held above never also surfaces from the
  * below heap (above scores strictly outrank below scores, so
  * above always wins the cross-threshold tie; the below side is
  * filtered at [[result]]/[[held]] rather than eagerly evicted —
  * the heap is k-bounded, so the deferred filter is O(k)).
  *
  * Keeping the full k below-threshold entries (rather than k − |above|)
  * is what makes this a merge monoid: |above| only grows across
  * merges, so the final cut `take(k − |above|)` at eval never needs a
  * below entry an earlier trim would have dropped. */
final class ThresholdTopKBuffer(
    val k: Int, val t: Double, val dedupIds: Boolean) {
  private[plans] val below = new TopKBuffer(k, dedupIds)
  private var aScores = new Array[Double](8)
  private var aIds = new Array[Long](8)
  private[plans] var an = 0
  private val seen =
    if (dedupIds) new graft.operators.LongIntOpenMap() else null

  def add(score: Double, id: Long): Unit = {
    if (score > t) {
      if (dedupIds) {
        val at = seen.getOrNeg(id)
        if (at >= 0) {
          // repeat arrival: best score wins (same rule as TopKBuffer)
          if (PairOrder.cmp(aScores(at), aIds(at), score, id) > 0)
            aScores(at) = score
          return
        }
        seen.put(id, an)
      }
      if (an == aScores.length) {
        aScores = java.util.Arrays.copyOf(aScores, an * 2)
        aIds = java.util.Arrays.copyOf(aIds, an * 2)
      }
      aScores(an) = score; aIds(an) = id; an += 1
    } else if (score <= t) below.add(score, id)
    // NaN: neither branch — dropped, like the filter form
  }

  def merge(other: ThresholdTopKBuffer): Unit = {
    var i = 0
    while (i < other.an) { add(other.aScores(i), other.aIds(i)); i += 1 }
    below.addAll(other.below)
  }

  // below entries whose id is also held above are shadowed (above
  // always scores better); the heap is k-bounded so this is O(k)
  private def belowSurvivors: Array[(Double, Long)] =
    if (seen == null) below.sortedDesc
    else below.sortedDesc.filter(e => !seen.contains(e._2))

  /** Retained rows, globally sorted best→worst: every above entry
    * (they all outrank every below entry), then the surviving below
    * heap's best k − |above|. */
  def result: Array[(Double, Long)] = {
    val above = Array.tabulate(an)(i => (aScores(i), aIds(i)))
    scala.util.Sorting.stableSort(above,
      (a: (Double, Long), b: (Double, Long)) =>
        PairOrder.cmp(a._1, a._2, b._1, b._2) < 0)
    above ++ belowSurvivors.take(math.max(0, k - an))
  }

  /** Everything the buffer holds (above + surviving below heap) —
    * the serialization payload; replaying through [[add]] (or
    * feeding it as aggregate input rows — update IS add) reconstructs
    * the state including the dedup map. private[graft]: the fused
    * banded partial scorer drains per-partition buffers through it. */
  private[graft] def held: Array[(Double, Long)] =
    Array.tabulate(an)(i => (aScores(i), aIds(i))) ++ belowSurvivors
}

/** The retention prune (rank ≤ k OR score > threshold) as ONE
  * bounded-state aggregate — the one-pass replacement for the
  * above-filter ∪ hDeg-join ∪ below-top-k three-reader plan, which
  * needed the scored candidate stream persisted (a ~10⁸-row columnar
  * cache per trigger at sf1.0) just to avoid recomputing it per
  * reader. Here the stream is consumed once, un-cached, and the
  * state per group is its own output mass (above edges) + k.
  */
case class ThresholdTopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    threshold: Double,
    dedupIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThresholdTopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): ThresholdTopKBuffer =
    new ThresholdTopKBuffer(k, threshold, dedupIds)

  // same unboxed fast path as TopKPairs.update (see there)
  @transient private lazy val scoreOrd: Int = score match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
        if b.dataType == DoubleType => b.ordinal
    case _ => -1
  }
  @transient private lazy val idOrd: Int = id match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
        if b.dataType == LongType => b.ordinal
    case _ => -1
  }

  override def update(
      buf: ThresholdTopKBuffer, input: InternalRow): ThresholdTopKBuffer = {
    if (scoreOrd >= 0 && idOrd >= 0) {
      if (!input.isNullAt(scoreOrd) && !input.isNullAt(idOrd))
        buf.add(input.getDouble(scoreOrd), input.getLong(idOrd))
    } else {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null)
        buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(
      b1: ThresholdTopKBuffer, b2: ThresholdTopKBuffer): ThresholdTopKBuffer = {
    b1.merge(b2); b1
  }

  override def eval(buf: ThresholdTopKBuffer): Any =
    new GenericArrayData(buf.result.map(p =>
      InternalRow(p._1, p._2): Any))

  override def serialize(buf: ThresholdTopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val arr = buf.held
    out.writeInt(buf.k); out.writeDouble(buf.t); out.writeBoolean(buf.dedupIds)
    out.writeInt(arr.length)
    arr.foreach { p => out.writeDouble(p._1); out.writeLong(p._2) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ThresholdTopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new ThresholdTopKBuffer(
      in.readInt(), in.readDouble(), in.readBoolean())
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ThresholdTopKPairs =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): ThresholdTopKPairs =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThresholdTopKPairs =
    copy(score = newChildren(0), id = newChildren(1))
}
