package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins: both sides pre-bucketed on the join key
  * join WITHOUT a shuffle — the layout that makes repeated fact-fact
  * joins affordable at 100 TB (pay the shuffle once at write time). */
class BucketingSpec extends SparkSuite {

  test("banded LSH layout: candidate self-join plans no shuffle, same pairs") {
    val docs = Tables.load(spark, sfDir, "documents")
    graft.operators.Dedup.writeBandedLayout(
      docs, col("doc_id"), col("text"), "bands_b", numBuckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fromLayout = graft.operators.Dedup
        .candidatePairsFromLayout(spark, "bands_b")
      // the join itself must be exchange-free (the trailing distinct
      // legitimately shuffles on the pair key)
      val exec = fromLayout.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val joins = exec.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joins.nonEmpty, "expected a sort-merge self-join")
      joins.foreach { j =>
        val ex = j.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(ex.isEmpty, s"banded-layout join still shuffles:\n$j")
      }
      val direct = graft.operators.Dedup
        .minHashCandidatePairs(docs, col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val layout = fromLayout
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(layout == direct,
        s"layout pairs diverge: ${layout.size} vs ${direct.size}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bands_b")
    }
  }

  test("join of tables bucketed on the key plans no shuffle") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val orders = Tables.load(spark, sfDir, "orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has an order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
