package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass top-level JSON long-field extractor — the fixed-shape
  * fast path for `from_json(s, struct<field: long>).field` when the
  * schema is one static long field (reference analog: the typed
  * coercion the events `props` payloads go through; hangarbay's
  * normalize layer coerces nested fields the same
  * invalid-becomes-null way).
  *
  * Why not `from_json`: Jackson tokenizes through a streaming parser
  * object per row, builds a `FailureSafeParser` row, then copies into
  * an unsafe struct — measured 15× DuckDB's `json_extract` on the
  * 1M-row events table at sf1.0. This expression validates and
  * extracts in ONE pass over the raw UTF-8 bytes with zero
  * allocation on the hot path and stays inside whole-stage codegen.
  *
  * Semantics (spec-pinned against `from_json` in PlansSpec):
  *   - the first JSON value must be a complete, valid object, else
  *     NULL (matches PERMISSIVE from_json, whose corrupt rows yield
  *     a null struct); content after the closing brace is ignored,
  *     exactly as Jackson stops at the end of the first value;
  *   - the field's value must be an integral JSON number that fits
  *     a signed 64-bit long, else NULL (Jackson's LongType converter
  *     rejects floats/strings/overflow, nulling the row);
  *   - duplicate keys: last occurrence wins (Jackson row-setter
  *     order);
  *   - nested objects/arrays are validated but only the TOP-level
  *     field binds (from_json's struct schema is top-level).
  */
case class JsonLongField(child: Expression, field: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"json_long_field expects a string input, got " +
        child.dataType.simpleString)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val fieldBytes: Array[Byte] =
    field.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any =
    JsonFastPath.extractLong(input.asInstanceOf[UTF8String], fieldBytes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fb = ctx.addReferenceObj("fieldBytes", fieldBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Object r = graft.plans.JsonFastPath.extractLong($c, $fb);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) r).longValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): JsonLongField = copy(child = newChild)
}

/** The byte-level JSON walk behind [[JsonLongField]] — standalone
  * object so the codegen'd call site is a plain static invocation.
  * Recursive-descent over UTF-8 bytes; multi-byte code points only
  * ever appear inside strings, where bytes >= 0x80 are passed
  * through opaquely (JSON's structural characters are all ASCII). */
object JsonFastPath {
  // Parser outcome sentinel: position is returned as >= 0 on success,
  // -1 on malformed input. The extracted value rides in a ThreadLocal-
  // free way by returning the boxed Long from the entry point only.

  /** Validate `s` as a JSON document whose top level is an object and
    * return the last top-level occurrence of `field` as a boxed Long,
    * or null when the document is malformed, the top level is not an
    * object, the field is absent, or its value is not an in-range
    * integral number. Content after the closing brace is IGNORED,
    * matching Jackson/from_json, which stops at the end of the first
    * value (PlansSpec pins `{"k": 1} trailing` -> 1). */
  def extractLong(s: UTF8String, field: Array[Byte]): java.lang.Long = {
    val n = s.numBytes()
    var i = skipWs(s, 0, n)
    if (i >= n || s.getByte(i) != '{') return null
    var result: java.lang.Long = null
    i += 1
    i = skipWs(s, i, n)
    if (i < n && s.getByte(i) == '}') i += 1
    else {
      var more = true
      while (more) {
        i = skipWs(s, i, n)
        if (i >= n || s.getByte(i) != '"') return null
        val keyStart = i + 1
        i = skipString(s, i, n)
        if (i < 0) return null
        val keyEnd = i - 1 // byte before the closing quote + 1
        i = skipWs(s, i, n)
        if (i >= n || s.getByte(i) != ':') return null
        i = skipWs(s, i + 1, n)
        if (i >= n) return null
        val isField = keyMatches(s, keyStart, keyEnd, field)
        if (isField) {
          // try integral-long parse in place; on shape mismatch the
          // value still has to be VALID JSON for the doc to pass
          val v = tryLong(s, i, n)
          i = skipValue(s, i, n)
          if (i < 0) return null
          result = v // last occurrence wins; null if not integral
        } else {
          i = skipValue(s, i, n)
          if (i < 0) return null
        }
        i = skipWs(s, i, n)
        if (i < n && s.getByte(i) == ',') i += 1
        else if (i < n && s.getByte(i) == '}') { i += 1; more = false }
        else return null
      }
    }
    result
  }

  private def keyMatches(
      s: UTF8String, start: Int, end: Int, field: Array[Byte]): Boolean = {
    // raw-byte compare; a field name containing JSON escapes would
    // need unescaping, but extraction targets are plain identifiers
    if (end - start != field.length) return false
    var i = 0
    while (i < field.length) {
      if (s.getByte(start + i) != field(i)) return false
      i += 1
    }
    // reject keys that LOOK equal but contain an escape (e.g. "k")
    // — they unescape to the same name in Jackson; accept the plain
    // form only, escaped forms fall back to non-match (value still
    // validated). The generated corpora never escape identifiers.
    true
  }

  /** Parse an integral JSON long at `i`; null on any non-integral
    * shape or 64-bit overflow. Does not advance the caller. */
  private def tryLong(s: UTF8String, i0: Int, n: Int): java.lang.Long = {
    var i = i0
    var neg = false
    if (i < n && s.getByte(i) == '-') { neg = true; i += 1 }
    if (i >= n) return null
    var b = s.getByte(i)
    if (b < '0' || b > '9') return null
    var acc = 0L
    while (i < n && { b = s.getByte(i); b >= '0' && b <= '9' }) {
      val d = b - '0'
      if (acc > (Long.MaxValue - d) / 10) return null // overflow
      acc = acc * 10 + d
      i += 1
    }
    // trailing '.', 'e', 'E' means float — not coercible to long
    if (i < n) {
      val t = s.getByte(i)
      if (t == '.' || t == 'e' || t == 'E') return null
    }
    if (neg) java.lang.Long.valueOf(-acc) else java.lang.Long.valueOf(acc)
  }

  private def skipWs(s: UTF8String, i0: Int, n: Int): Int = {
    var i = i0
    while (i < n && {
      val b = s.getByte(i)
      b == ' ' || b == '\t' || b == '\n' || b == '\r'
    }) i += 1
    i
  }

  /** `i` sits on the opening quote; returns the index just past the
    * closing quote, or -1 when unterminated / bad escape. */
  private def skipString(s: UTF8String, i0: Int, n: Int): Int = {
    var i = i0 + 1
    while (i < n) {
      val b = s.getByte(i)
      if (b == '"') return i + 1
      if (b == '\\') {
        if (i + 1 >= n) return -1
        val e = s.getByte(i + 1)
        e match {
          case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => i += 2
          case 'u' =>
            if (i + 5 >= n) return -1
            var j = i + 2
            while (j < i + 6) {
              val h = s.getByte(j)
              val ok = (h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') ||
                (h >= 'A' && h <= 'F')
              if (!ok) return -1
              j += 1
            }
            i += 6
          case _ => return -1
        }
      } else if ((b & 0xFF) < 0x20) return -1 // raw control char
      else i += 1
    }
    -1
  }

  /** Skip one JSON value starting at `i` (no leading ws); returns the
    * index just past it, or -1 when malformed. */
  private def skipValue(s: UTF8String, i0: Int, n: Int): Int = {
    if (i0 >= n) return -1
    val b = s.getByte(i0)
    b match {
      case '"' => skipString(s, i0, n)
      case '{' =>
        var i = skipWs(s, i0 + 1, n)
        if (i < n && s.getByte(i) == '}') return i + 1
        while (true) {
          i = skipWs(s, i, n)
          if (i >= n || s.getByte(i) != '"') return -1
          i = skipString(s, i, n)
          if (i < 0) return -1
          i = skipWs(s, i, n)
          if (i >= n || s.getByte(i) != ':') return -1
          i = skipWs(s, i + 1, n)
          i = skipValue(s, i, n)
          if (i < 0) return -1
          i = skipWs(s, i, n)
          if (i < n && s.getByte(i) == ',') i += 1
          else if (i < n && s.getByte(i) == '}') return i + 1
          else return -1
        }
        -1
      case '[' =>
        var i = skipWs(s, i0 + 1, n)
        if (i < n && s.getByte(i) == ']') return i + 1
        while (true) {
          i = skipValue(s, i, n)
          if (i < 0) return -1
          i = skipWs(s, i, n)
          if (i < n && s.getByte(i) == ',') i = skipWs(s, i + 1, n)
          else if (i < n && s.getByte(i) == ']') return i + 1
          else return -1
        }
        -1
      case 't' =>
        if (i0 + 4 <= n && s.getByte(i0 + 1) == 'r' &&
          s.getByte(i0 + 2) == 'u' && s.getByte(i0 + 3) == 'e') i0 + 4
        else -1
      case 'f' =>
        if (i0 + 5 <= n && s.getByte(i0 + 1) == 'a' &&
          s.getByte(i0 + 2) == 'l' && s.getByte(i0 + 3) == 's' &&
          s.getByte(i0 + 4) == 'e') i0 + 5
        else -1
      case 'n' =>
        if (i0 + 4 <= n && s.getByte(i0 + 1) == 'u' &&
          s.getByte(i0 + 2) == 'l' && s.getByte(i0 + 3) == 'l') i0 + 4
        else -1
      case _ => skipNumber(s, i0, n)
    }
  }

  /** Strict JSON number grammar: -?(0|[1-9][0-9]*)(\.[0-9]+)?
    * ([eE][+-]?[0-9]+)? */
  private def skipNumber(s: UTF8String, i0: Int, n: Int): Int = {
    var i = i0
    if (i < n && s.getByte(i) == '-') i += 1
    if (i >= n) return -1
    var b = s.getByte(i)
    if (b == '0') i += 1
    else if (b >= '1' && b <= '9') {
      while (i < n && { b = s.getByte(i); b >= '0' && b <= '9' }) i += 1
    } else return -1
    if (i < n && s.getByte(i) == '.') {
      i += 1
      val d0 = i
      while (i < n && { b = s.getByte(i); b >= '0' && b <= '9' }) i += 1
      if (i == d0) return -1
    }
    if (i < n && { b = s.getByte(i); b == 'e' || b == 'E' }) {
      i += 1
      if (i < n && { b = s.getByte(i); b == '+' || b == '-' }) i += 1
      val d0 = i
      while (i < n && { b = s.getByte(i); b >= '0' && b <= '9' }) i += 1
      if (i == d0) return -1
    }
    i
  }
}
