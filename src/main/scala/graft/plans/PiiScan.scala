package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass PII detection + redaction — email and phone matching,
  * counting, and `<EMAIL>`/`<PHONE>` splicing fused into a single
  * byte scan (the reference's normalize layer scrubs the same way,
  * field by field; hangarbay/address.py's cleaning philosophy applied
  * to free text).
  *
  * Replaces FOUR regex traversals (two `regexp_extract_all` for the
  * counts + two chained `regexp_replace` for the scrub) with one
  * linear walk. java.util.regex re-scans each position through its
  * backtracking machine; for these two fixed patterns the match
  * extents are decidable with a hand-rolled scanner that is exact —
  * the equivalence argument is spec-pinned property-style against
  * the regex composition in PlansSpec (random + adversarial strings).
  *
  * Patterns (must stay in lockstep with [[graft.functions.TextFns]]):
  *   email = `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`
  *   phone = `\d{3}-\d{3}-\d{4}`
  * The counts are INDEPENDENT extractions over the original text
  * (regexp_extract_all semantics — a phone inside an email's domain
  * still counts); the redaction is the SEQUENTIAL composition
  * "replace all emails, then all phones on the result". Key facts
  * making the single pass exact:
  *   - an email match always begins at the start of a maximal
  *     local-class run (the local class is closed under extension, so
  *     a mid-run start sees the same '@' boundary and domain and
  *     succeeds iff the run start does);
  *   - the email's backtracking extent is "rightmost dot in the
  *     domain-class run followed by >= 2 ASCII letters", with the
  *     letter run taken greedily;
  *   - phone characters are all local-class characters, so any phone
  *     overlapping an email's local part is consumed by the email in
  *     BOTH orderings, and `<EMAIL>` contains no digits, so the
  *     replacement can never create a new phone match.
  *
  * Returns struct(n_emails BIGINT, n_phones BIGINT, redacted STRING);
  * NULL text yields a NULL struct.
  */
case class PiiScan(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pii_scan expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = new StructType()
    .add("n_emails", LongType, nullable = false)
    .add("n_phones", LongType, nullable = false)
    .add("redacted", StringType, nullable = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PiiScanImpl.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PiiScanImpl.scan($c);")

  override protected def withNewChildInternal(
      newChild: Expression): PiiScan = copy(child = newChild)
}

/** The scanner behind [[PiiScan]] — standalone object so codegen can
  * call it statically. Operates on raw UTF-8 bytes: every pattern
  * character is ASCII and multi-byte code points (bytes >= 0x80)
  * belong to no character class, so byte-wise scanning is exact and
  * non-ASCII text passes through unmodified. */
object PiiScanImpl {
  private final val EMAIL = "<EMAIL>".getBytes
  private final val PHONE = "<PHONE>".getBytes

  @inline private def isLocal(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '.' || b == '_' || b == '%' ||
      b == '+' || b == '-'

  @inline private def isDomain(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '.' || b == '-'

  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** End (exclusive) of an email match starting exactly at `i`, or -1.
    * `i` must sit at the start of a maximal local-run (caller
    * guarantees). */
  private def emailEnd(b: Array[Byte], i: Int, n: Int): Int = {
    var r = i
    while (r < n && isLocal(b(r))) r += 1
    if (r == i || r >= n || b(r) != '@') return -1
    val j = r + 1
    var m = j
    while (m < n && isDomain(b(m))) m += 1
    if (m == j) return -1
    // backtracking order: rightmost dot inside (j, m) first
    var p = m - 1
    while (p > j) {
      if (b(p) == '.') {
        var e = p + 1
        while (e < n && isAlpha(b(e))) e += 1
        if (e - (p + 1) >= 2) return e
      }
      p -= 1
    }
    -1
  }

  /** Does a phone match start exactly at `i`? */
  private def phoneAt(b: Array[Byte], i: Int, n: Int): Boolean = {
    if (i + 12 > n) return false
    isDigit(b(i)) && isDigit(b(i + 1)) && isDigit(b(i + 2)) &&
      b(i + 3) == '-' &&
      isDigit(b(i + 4)) && isDigit(b(i + 5)) && isDigit(b(i + 6)) &&
      b(i + 7) == '-' &&
      isDigit(b(i + 8)) && isDigit(b(i + 9)) && isDigit(b(i + 10)) &&
      isDigit(b(i + 11))
  }

  def scan(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val n = b.length
    var nE = 0L
    var nP = 0L
    var out: java.io.ByteArrayOutputStream = null
    var copied = 0 // bytes of `b` already flushed to `out`
    def splice(from: Int, upto: Int, token: Array[Byte]): Unit = {
      if (out == null) out = new java.io.ByteArrayOutputStream(n + 16)
      out.write(b, copied, from - copied)
      out.write(token, 0, token.length)
      copied = upto
    }
    // PHONE COUNT: an independent extraction over the ORIGINAL text
    // (regexp_extract_all semantics) — a phone embedded in an email's
    // local part or domain COUNTS here even though the sequential
    // redaction consumes it under <EMAIL> (PlansSpec pins
    // "555-123-4567@example.com" -> n_emails=1, n_phones=1, <EMAIL>).
    var p = 0
    while (p < n) {
      if (phoneAt(b, p, n)) { nP += 1; p += 12 } else p += 1
    }
    // EMAIL COUNT + SEQUENTIAL REDACTION: emails replaced first, then
    // phones on the residual — phone splices are confined to regions
    // no email consumed (<EMAIL> carries no digits, so replacement
    // can never create a new phone match).
    var i = 0
    while (i < n) {
      if (isLocal(b(i))) {
        // i heads a maximal local-run (the outer loop only lands on a
        // local byte at a run boundary or a post-match resume — both
        // are exactly where the regex pass would attempt the email)
        val e = emailEnd(b, i, n)
        if (e > 0) {
          splice(i, e, EMAIL); nE += 1; i = e
        } else {
          // no email can start anywhere inside this run (local class
          // is closed under extension: every start sees the same '@'
          // boundary and domain); scan it for phone REDACTION only.
          // A phone's 12 characters are all local-class, so its match
          // never crosses the run's end.
          var j = i
          while (j < n && isLocal(b(j))) {
            if (phoneAt(b, j, n)) { splice(j, j + 12, PHONE); j += 12 }
            else j += 1
          }
          i = j
        }
      } else i += 1
    }
    val red =
      if (out == null) s // no match: zero-copy passthrough
      else {
        out.write(b, copied, n - copied)
        UTF8String.fromBytes(out.toByteArray)
      }
    new GenericInternalRow(Array[Any](nE, nP, red))
  }
}
