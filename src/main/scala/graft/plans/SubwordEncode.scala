package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword segmentation against a broadcast
  * vocabulary — the APPLY side of a trained tokenizer (BPE/WordPiece
  * inference-style maximal munch), run as a map-side codegen
  * expression so a fixed vocab can be pushed over a 100 TB corpus
  * with zero shuffle and bounded driver state (the vocab itself,
  * ≤ [[SubwordVocab.MaxEntries]] entries — same bounded-collect
  * class as the IVF codebooks).
  *
  * Semantics (deterministic, spec-pinned in PlansSpec):
  *   - at each byte position take the LONGEST vocab entry that
  *     prefixes the remaining text (maximal munch);
  *   - no entry → consume exactly ONE code point as an
  *     out-of-vocabulary token;
  *   - returns struct(n_tokens, n_unk, n_chars): token count, OOV
  *     token count, and the code-point length — everything a
  *     fertility / coverage audit needs, without materializing the
  *     token array per row.
  *
  * Byte-level matching is code-point exact: a well-formed vocab
  * entry can only match at code-point boundaries of well-formed
  * text, because in UTF-8 no complete encoding is a prefix of a
  * different code point's encoding and continuation bytes never
  * begin one. NULL text → NULL struct.
  *
  * The vocab rides the expression (a `Seq[String]`, value equality →
  * Catalyst CSE/canonicalization work); the probe structure is
  * rebuilt lazily per executor ([[SubwordVocab]] is Serializable
  * with a @transient index).
  */
case class SubwordEncode(child: Expression, vocab: SubwordVocab)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"subword_encode expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = new StructType()
    .add("n_tokens", LongType, nullable = false)
    .add("n_unk", LongType, nullable = false)
    .add("n_chars", LongType, nullable = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    vocab.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordVocab", vocab,
      classOf[SubwordVocab].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SubwordEncode = copy(child = newChild)
}

object SubwordVocab {
  /** Driver-state bound: a vocab is a TOKENIZER artifact (tens of
    * thousands of entries), never corpus-sized. */
  val MaxEntries = 65536
  val MaxEntryBytes = 64

  def apply(entries: Seq[String]): SubwordVocab = {
    require(entries.size <= MaxEntries,
      s"subword vocab exceeds $MaxEntries entries (${entries.size})")
    require(entries.forall(e => e.nonEmpty &&
      e.getBytes("UTF-8").length <= MaxEntryBytes),
      s"subword vocab entries must be non-empty and <= $MaxEntryBytes bytes")
    new SubwordVocab(entries.distinct.toArray)
  }
}

/** Vocabulary + probe index for [[SubwordEncode]]. Matching probes a
  * length-bucketed hash set from the longest present entry length
  * down (maximal munch = first hit wins); `UTF8String.fromBytes`
  * slices are zero-copy, so a probe allocates nothing but the
  * wrapper. */
final class SubwordVocab private (val entries: Array[String])
    extends Serializable {

  // value equality so equal expressions canonicalize/CSE together
  override def equals(o: Any): Boolean = o match {
    case v: SubwordVocab => java.util.Arrays.equals(
      entries.asInstanceOf[Array[AnyRef]],
      v.entries.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.hashCode(entries.asInstanceOf[Array[AnyRef]])

  @transient private lazy val index: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](entries.length * 2)
    entries.foreach(e => s.add(UTF8String.fromString(e)))
    s
  }
  @transient private lazy val maxLen: Int =
    if (entries.isEmpty) 0
    else entries.iterator.map(_.getBytes("UTF-8").length).max

  // lengths that actually occur in the vocab — probing skips the rest
  @transient private lazy val hasLen: Array[Boolean] = {
    val a = new Array[Boolean](maxLen + 1)
    entries.foreach(e => a(e.getBytes("UTF-8").length) = true)
    a
  }

  /** Byte length of the UTF-8 code point starting at b(i). Defensive
    * on malformed bytes: lone continuation/overlong leads consume 1. */
  @inline private def cpLen(b: Array[Byte], i: Int, n: Int): Int = {
    val lead = b(i) & 0xff
    val len =
      if (lead < 0x80) 1
      else if (lead >= 0xc0 && lead < 0xe0) 2
      else if (lead >= 0xe0 && lead < 0xf0) 3
      else if (lead >= 0xf0 && lead < 0xf8) 4
      else 1
    math.min(len, n - i)
  }

  def encode(s: UTF8String): GenericInternalRow = {
    val b = s.getBytes
    val n = b.length
    var nTok = 0L
    var nUnk = 0L
    var i = 0
    while (i < n) {
      var matched = 0
      var l = math.min(maxLen, n - i)
      while (l > 0 && matched == 0) {
        if (hasLen(l) &&
          index.contains(UTF8String.fromBytes(b, i, l))) matched = l
        else l -= 1
      }
      if (matched > 0) { nTok += 1; i += matched }
      else { nTok += 1; nUnk += 1; i += cpLen(b, i, n) }
    }
    new GenericInternalRow(
      Array[Any](nTok, nUnk, s.numChars().toLong))
  }
}
