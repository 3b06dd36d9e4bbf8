package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency probe against a pre-built [[CountMinSketch]], with
  * whole-stage codegen — same shipping mechanism as
  * [[BloomMightContain]]: the sketch object rides into the generated
  * class through the codegen references array, so a probe is a direct
  * virtual call in the scan loop (min over depth counters), no UDF
  * dispatch, no per-row deserialization.
  *
  * Estimates NEVER undercount (min over hashed counter rows); the
  * overestimate is ≤ eps·N with the sketch's configured confidence.
  * Long keys only — hash wider types to a long first (xxhash64).
  */
case class CmsEstimate(child: Expression, sketch: CountMinSketch)
    extends UnaryExpression {

  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects a bigint key, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    sketch.estimateCount(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cms = ctx.addReferenceObj("cmsSketch", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $cms.estimateCount(java.lang.Long.valueOf($v));")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CmsEstimate = copy(child = newChild)
}
