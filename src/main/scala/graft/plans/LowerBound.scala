package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Binary-search insertion point: the number of elements of a sorted
  * double array that are strictly below the probe value (equivalently,
  * the first index whose element is >= the value).
  *
  * Used by [[graft.operators.Percentiles]] for per-row range-bucket
  * assignment: O(log buckets) per row instead of the O(buckets) linear
  * scan a `size(filter(...))` composition costs, and the whole loop
  * stays inside whole-stage codegen (doGenCode).
  */
case class LowerBound(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lower_bound expects (array<double>, double), got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  // Comparisons MUST match Spark SQL's double ordering (NaN largest,
  // -0.0 == 0.0) — the same ordering the downstream rank window's
  // orderBy uses — or rows containing NaN land in bucket 0 but rank
  // last within it, corrupting the interpolated percentile. A raw
  // Java `<` has exactly that bug (boundary < NaN is false).
  override def nullSafeEval(arr: Any, v: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val x = v.asInstanceOf[Double]
    var lo = 0
    var hi = a.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil
            .compareDoubles(a.getDouble(mid), x) < 0) lo = mid + 1
      else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, v) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val cmp = "org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles"
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($cmp($a.getDouble($mid), $v) < 0) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LowerBound =
    copy(left = newLeft, right = newRight)
}
