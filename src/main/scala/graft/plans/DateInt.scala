package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, StringType, TimestampNTZType}
import org.apache.spark.unsafe.types.UTF8String

/** All-integer date <-> yyyyMMdd-int conversions — the reference's
  * registry dates are stored as yyyyMMdd integers
  * (hangarbay/normalize.py:123's int-coded FAA dates), and both
  * directions sit on 100 TB-scale hot paths where
  * `date_format`/`to_date` pay a java.time formatter + Locale +
  * chronology object walk per row. These two expressions use the
  * proleptic-Gregorian civil-date algorithms (Howard Hinnant's
  * public-domain days-from-civil / civil-from-days) — pure integer
  * arithmetic, no allocation, whole-stage-codegen'd, bit-identical to
  * java.time over the full domain (PlansSpec pins equality against
  * `date_format`/`to_date` on random epoch days and random ints,
  * including every invalid shape).
  */

/** DateType (days since 1970-01-01) or TimestampNTZType (micros since
  * epoch, timezone-free) -> yyyyMMdd int, e.g. 19960102. Matches
  * `date_format(d, "yyyyMMdd").cast("int")` for all years 1..9999
  * (the int encoding is unambiguous there; java.time would render
  * year 10000+ as 5 digits, which the int form represents
  * identically). Zoned TimestampType is deliberately rejected — its
  * rendering depends on the session timezone, which this pure-integer
  * path does not model. */
case class DateToYyyymmdd(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DateType ||
      child.dataType == TimestampNTZType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"date_to_yyyymmdd expects a date or timestamp_ntz input, got " +
        child.dataType.simpleString)

  override def dataType: DataType = IntegerType

  private def isNtz = child.dataType == TimestampNTZType

  override def nullSafeEval(input: Any): Any =
    if (isNtz)
      DateIntImpl.daysToYyyymmdd(
        Math.floorDiv(input.asInstanceOf[Long], 86400000000L).toInt)
    else DateIntImpl.daysToYyyymmdd(input.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isNtz)
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.DateIntImpl.daysToYyyymmdd(" +
          s"(int) Math.floorDiv($c, 86400000000L))")
    else
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.DateIntImpl.daysToYyyymmdd($c)")

  override protected def withNewChildInternal(
      newChild: Expression): DateToYyyymmdd = copy(child = newChild)
}

/** yyyyMMdd int -> ISO "yyyy-MM-dd" string, invalid -> NULL. Matches
  * `date_format(to_date(cast(v as string), "yyyyMMdd"), "yyyy-MM-dd")`
  * for every NON-NEGATIVE int: the string form parses iff the int has
  * exactly 8 digits (year 1000..9999 — shorter ints render to shorter
  * strings, which the strict parser rejects) and (month, day) is a
  * real proleptic-Gregorian calendar date. Negative ints are INVALID
  * here (not an 8-digit code); the formatter composition instead
  * parses "-19960102" as the astronomical year -1996 — a documented,
  * deliberate divergence (PlansSpec pins both behaviors). */
case class YyyymmddToIso(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"yyyymmdd_to_iso expects an int input, got " +
        child.dataType.simpleString)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    DateIntImpl.yyyymmddToIso(input.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |UTF8String r = graft.plans.DateIntImpl.yyyymmddToIso($c);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
       """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): YyyymmddToIso = copy(child = newChild)
}

/** yyyyMMdd int -> DateType (days since epoch), invalid -> NULL. Same
  * validity domain as [[YyyymmddToIso]]. */
case class YyyymmddToDate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"yyyymmdd_to_date expects an int input, got " +
        child.dataType.simpleString)

  override def dataType: DataType = DateType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    DateIntImpl.yyyymmddToDays(input.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Object r = graft.plans.DateIntImpl.yyyymmddToDays($c);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Integer) r).intValue(); }
       """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): YyyymmddToDate = copy(child = newChild)
}

object DateIntImpl {
  private final val DaysInMonth =
    Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

  @inline private def isLeap(y: Int): Boolean =
    (y % 4 == 0 && y % 100 != 0) || y % 400 == 0

  /** civil-from-days (Hinnant): epoch days -> yyyyMMdd int. */
  def daysToYyyymmdd(days: Int): Int = {
    val z = days.toLong + 719468L
    val era = Math.floorDiv(z, 146097L)
    val doe = (z - era * 146097L).toInt // [0, 146096]
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    val doy = doe - (365 * yoe + yoe / 4 - yoe / 100)
    val mp = (5 * doy + 2) / 153
    val d = doy - (153 * mp + 2) / 5 + 1
    val m = if (mp < 10) mp + 3 else mp - 9
    val y = (yoe + era * 400 + (if (m <= 2) 1 else 0)).toInt
    y * 10000 + m * 100 + d
  }

  /** Validity shared by the two parsing directions: exactly-8-digit
    * int, real calendar (month, day). Returns year*512 + month*32 +
    * day packed, or -1. */
  @inline private def validate(v: Int): Int = {
    if (v < 10000000 || v > 99999999) return -1 // not 8 digits
    val y = v / 10000
    val m = (v / 100) % 100
    val d = v % 100
    if (m < 1 || m > 12) return -1
    val dim =
      if (m == 2 && isLeap(y)) 29 else DaysInMonth(m - 1)
    if (d < 1 || d > dim) return -1
    (y << 9) | (m << 5) | d
  }

  def yyyymmddToIso(v: Int): UTF8String = {
    val packed = validate(v)
    if (packed < 0) return null
    val b = new Array[Byte](10)
    val y = packed >> 9
    val m = (packed >> 5) & 15
    val d = packed & 31
    b(0) = ('0' + y / 1000).toByte
    b(1) = ('0' + (y / 100) % 10).toByte
    b(2) = ('0' + (y / 10) % 10).toByte
    b(3) = ('0' + y % 10).toByte
    b(4) = '-'
    b(5) = ('0' + m / 10).toByte
    b(6) = ('0' + m % 10).toByte
    b(7) = '-'
    b(8) = ('0' + d / 10).toByte
    b(9) = ('0' + d % 10).toByte
    UTF8String.fromBytes(b)
  }

  /** days-from-civil (Hinnant): yyyyMMdd int -> epoch days, boxed so
    * invalid input signals NULL. */
  def yyyymmddToDays(v: Int): Integer = {
    val packed = validate(v)
    if (packed < 0) return null
    val yy = packed >> 9
    val m = (packed >> 5) & 15
    val d = packed & 31
    val y = if (m <= 2) yy - 1 else yy
    val era = Math.floorDiv(y, 400)
    val yoe = y - era * 400
    val mp = if (m > 2) m - 3 else m + 9
    val doy = (153 * mp + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    Integer.valueOf(era * 146097 + doe - 719468)
  }
}
