package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Content-defined chunking (CDC) boundaries over a binary payload —
  * the gear-hash rolling cut of FastCDC (Xia et al., USENIX ATC '16)
  * without size normalization: a chunk ends at the first byte where
  * the rolling hash's low `maskBits` bits are all zero (subject to
  * min/max chunk bounds). Returns the array of cut OFFSETS
  * (exclusive chunk ends, ascending; the last element is always the
  * payload length), so `array<int>`; callers derive (start, len)
  * pairs positionally. An empty payload yields an empty array.
  *
  * Why content-defined and not fixed-stride (the
  * [[graft.operators.Multimodal.chunkPayload]] sibling): a fixed
  * grid is destroyed by INSERTION — prepend one byte and every
  * downstream chunk's content shifts, so chunk-level dedup finds
  * nothing. The gear hash's boundary test depends on at most the
  * last `maskBits` bytes (`h = (h << 1) + gear(b)`: a byte's
  * contribution to the low `maskBits` bits shifts out of the mask
  * after `maskBits` steps), so after any edit the cut sequence
  * re-synchronizes within one chunk and every later chunk is
  * byte-identical — shared data dedups at chunk granularity no
  * matter where it sits. That re-synchronization is spec-pinned
  * (PlansSpec), not assumed.
  *
  * Scale shape: per-row streaming byte loop (whole-stage codegen via
  * the static impl, no regex, no allocation beyond the cut array —
  * ~payload/2^maskBits ints); boundaries never depend on other rows,
  * so chunking is embarrassingly parallel and the downstream
  * dedup exchange carries (hash, len) pairs, never payload bytes —
  * the m-family's payload-bytes-never-shuffle rule.
  *
  * Determinism: the gear table derives from splitmix64 over the
  * byte value — a fixed pure function, no RNG state, identical on
  * every JVM.
  */
case class CdcChunks(
    child: Expression,
    minLen: Int,
    maxLen: Int,
    maskBits: Int) extends UnaryExpression {

  require(minLen >= 1 && maxLen >= minLen,
    s"need 1 <= minLen <= maxLen, got minLen=$minLen maxLen=$maxLen")
  require(maskBits >= 1 && maskBits <= 48,
    s"maskBits must be in [1, 48], got $maskBits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects a binary input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcChunksImpl.cuts(input.asInstanceOf[Array[Byte]],
      minLen, maxLen, maskBits)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CdcChunksImpl.cuts($c, $minLen, $maxLen, $maskBits);")

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunks = copy(child = newChild)
}

/** The chunker behind [[CdcChunks]] — standalone object so codegen
  * calls it statically (the PiiScan pattern). */
object CdcChunksImpl {

  /** splitmix64 finalizer — the standard pure 64-bit mixer. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Fixed 256-entry gear table, one mixed 64-bit value per byte. */
  private val Gear: Array[Long] = Array.tabulate(256)(b => mix64(b.toLong))

  /** Cut offsets (exclusive ends) as a Catalyst int array. */
  def cuts(bytes: Array[Byte], minLen: Int, maxLen: Int,
      maskBits: Int): GenericArrayData = {
    val n = bytes.length
    val mask = (1L << maskBits) - 1L
    val out = new java.util.ArrayList[Any](math.max(4, n >>> maskBits))
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(bytes(i) & 0xFF)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        out.add(i + 1)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n) out.add(n)
    new GenericArrayData(out.toArray)
  }
}
