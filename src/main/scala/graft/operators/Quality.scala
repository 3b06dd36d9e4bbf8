package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Publish-time data-quality audit — the validation layer a registry
  * publish runs before swapping a snapshot live (the reference
  * enforces schemas at normalize time, pipelines/normalize.py +
  * hangarbay/schemas.py; these are the row/key/reference-level checks
  * on top).
  *
  * Every check emits one (check_name, n_violations) row. Scale shape:
  * row-predicate checks over one table FUSE into a single scan
  * ([[expectAll]] — N sums in one map-side aggregate, unpivoted);
  * uniqueness is one hash-agg; referential integrity is one anti-join
  * (parent side broadcast when small, shuffle otherwise — Catalyst's
  * choice). Nothing collects; an audit over a 100 TB table costs the
  * scans, not the checks.
  */
object Quality {

  /** N row-predicate expectations over ONE scan of `df`: each is a
    * conditional sum in the same map-side aggregate, then the single
    * result row is unpivoted to (check_name, n_violations) rows. */
  def expectAll(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val sums = checks.map { case (name, violation) =>
      coalesce(sum(when(violation, 1L).otherwise(0L)), lit(0L))
        .as(s"__c_${name}")
    }
    val one = df.agg(sums.head, sums.tail: _*)
    val stacked = checks.map { case (name, _) =>
      s"'${name.replace("'", "''")}', `__c_${name}`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${checks.size}, $stacked) AS (check_name, n_violations)")
  }

  /** Duplicate-key count: rows beyond the first per key value. */
  def expectUnique(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1), lit(0L)).cast("long")
        .as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Orphaned-child count: child keys with no matching parent row
    * (NULL child keys are not orphans — use a not-null expectation
    * for those). */
  def expectReferential(
      child: DataFrame,
      parent: DataFrame,
      name: String,
      childKey: String,
      parentKey: String): DataFrame =
    // aliased on both sides: child and parent key often share a name
    child.select(col(childKey).as("__ck")).filter(col("__ck").isNotNull)
      .join(parent.select(col(parentKey).as("__pk")),
        col("__ck") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Combine check frames into the audit report, pass/fail flagged. */
  def audit(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionAll _)
      .withColumn("status",
        when(col("n_violations") === 0, lit("pass")).otherwise(lit("fail")))
}
