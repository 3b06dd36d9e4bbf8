package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.SparkSession

/** Custom whole-operator as-of join (backward): for each left row,
  * the latest right value with right.ts <= left.ts on the same key
  * (ties on ts resolve to the largest value).
  *
  * This is the full custom-operator path — logical node, planner
  * strategy, physical sort-merge exec — for the case Spark has no
  * native operator for. The physical plan demands hash clustering on
  * the key and (key, ts) ordering from BOTH children, so Catalyst's
  * EnsureRequirements inserts exactly one shuffle+sort per side and
  * the merge itself is a streaming single pass per partition with
  * O(1) state — the plan shape that survives 100 TB.
  *
  * Key/ts/value are long-typed expressions (timestamps are micros
  * internally); the composed union-and-carry form
  * ([[graft.operators.Temporal.asofBackward]]) remains the generic
  * fallback.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    rightVal: Expression,
    // a constructor field (not a body val): plan transforms copy()
    // the node, and the output attribute's exprId must survive or
    // downstream resolution breaks
    matchedAttr: AttributeReference) extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ matchedAttr

  // matchedAttr is minted here, not derived from children — declare
  // it or CheckAnalysis reports it missing from the input
  override def producedAttributes: AttributeSet = AttributeSet(matchedAttr)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNode {
  private def requireLongBacked(e: Expression, role: String): Unit = {
    val ok = e.dataType match {
      case LongType | org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    require(ok, s"as-of $role must be long-backed " +
      s"(bigint/timestamp), got ${e.dataType.simpleString}")
  }

  def create(left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, leftTs: Expression, rightKey: Expression,
      rightTs: Expression, rightVal: Expression,
      matchedName: String): AsOfJoinNode = {
    // fail at construction, not mid-job in an executor: the merge
    // reads these as primitive longs
    requireLongBacked(leftKey, "left key"); requireLongBacked(leftTs, "left ts")
    requireLongBacked(rightKey, "right key"); requireLongBacked(rightTs, "right ts")
    requireLongBacked(rightVal, "right value")
    AsOfJoinNode(left, right, leftKey, leftTs, rightKey, rightTs,
      rightVal, AttributeReference(matchedName, LongType, nullable = true)())
  }
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.leftKey, n.leftTs, n.rightKey, n.rightTs, n.rightVal,
        n.matchedAttr) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    rightVal: Expression,
    matchedAttr: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ matchedAttr

  override def producedAttributes: AttributeSet = AttributeSet(matchedAttr)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))

  // right additionally value-ordered so the last row consumed at a
  // tied timestamp is the max value (tie rule)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightVal, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val rValB = BindReferences.bindReference(rightVal, right.output)
    val leftOutput = left.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val project = UnsafeProjection.create(
        outAttrs.map(a => BindReferences.bindReference(a: Expression,
          leftOutput :+ matchedAttr)))
      val matchRow = new GenericInternalRow(1)
      val joined = new JoinedRow()

      // right side consumed as primitives — no row copies retained;
      // rows with NULL key/ts/value are skipped (SQL semantics:
      // NULL never matches), not coerced to 0
      var rKey = 0L; var rTs = 0L; var rVal = 0L
      var rValid = false
      def advanceRight(): Unit = {
        rValid = false
        while (!rValid && rIt.hasNext) {
          val r = rIt.next()
          val k = rKeyB.eval(r); val t = rTsB.eval(r); val v = rValB.eval(r)
          if (k != null && t != null && v != null) {
            rKey = k.asInstanceOf[Long]
            rTs = t.asInstanceOf[Long]
            rVal = v.asInstanceOf[Long]
            rValid = true
          }
        }
      }
      advanceRight()

      var matchKey = 0L; var matchVal = 0L; var hasMatch = false

      lIt.map { lRow =>
        val kRaw = lKeyB.eval(lRow)
        val tRaw = lTsB.eval(lRow)
        if (kRaw == null || tRaw == null) {
          // NULL key/ts on the left: no match, emit null
          matchRow.setNullAt(0)
          project(joined(lRow, matchRow))
        } else {
        val k = kRaw.asInstanceOf[Long]
        val t = tRaw.asInstanceOf[Long]
        // consume right rows at or before (k, t); rows sorted by
        // (key, ts, val) so the last accepted row per key is the
        // latest ts / max val
        while (rValid && (rKey < k || (rKey == k && rTs <= t))) {
          if (rKey == k) { matchKey = k; matchVal = rVal; hasMatch = true }
          advanceRight()
        }
        if (hasMatch && matchKey == k) matchRow.setLong(0, matchVal)
        else matchRow.setNullAt(0)
        project(joined(lRow, matchRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Ensure the planner strategy is installed on the session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
}
