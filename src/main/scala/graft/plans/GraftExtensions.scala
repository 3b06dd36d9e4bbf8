package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions for SQL
  * use (`SELECT cosine_sim(a, b)`, `SELECT nfc_normalize(s)`). Attach
  * via `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, cls, builder) =>
      e.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(cls, name), builder))
    }
}

object GraftExtensions {
  private val functions: Seq[(String, String, Seq[Expression] => Expression)] =
    Seq(
      ("cosine_sim", classOf[CosineSim].getName,
        exprs => CosineSim(exprs.head, exprs(1))),
      ("nfc_normalize", classOf[NfcNormalize].getName,
        exprs => NfcNormalize(exprs.head)))

  /** Register on an already-running session (extensions only apply
    * at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
