package graft

import org.apache.spark.sql.functions._
import graft.operators.{ExactDistinct, LongOpenSet}

/** The one-scan exact-distinct operator: equality with Spark's
  * countDistinct (nulls, zero keys, negatives), the primitive set
  * itself, both decline gates, and the q10 fast-path/fallback
  * agreement. */
class ExactDistinctSpec extends SparkSuite {

  test("LongOpenSet: distinct semantics incl. 0, negatives, growth") {
    val s = new LongOpenSet(4)
    val keys = Seq(0L, 0L, -1L, Long.MinValue, Long.MaxValue, 7L) ++
      (1L to 1000L) ++ (1L to 1000L)
    keys.foreach(s.add)
    assert(s.size == keys.toSet.size)
    assert(s.toArray.toSet == keys.toSet)
    assert(s.toArray.length == keys.toSet.size)
  }

  test("longCounts equals countDistinct on nullable long columns") {
    val df = spark.range(0, 20000)
      .select(
        (col("id") % 97).as("a"),
        when(col("id") % 7 === 0, col("id") % 1003).as("b"),
        (col("id") * 2654435761L % 100003L - 50000L).as("c"))
    val got = ExactDistinct.longCounts(df, Seq("a", "b", "c"), 20000L).get
    val want = df.agg(countDistinct(col("a")), countDistinct(col("b")),
      countDistinct(col("c"))).head()
    assert(got == Seq(want.getLong(0), want.getLong(1), want.getLong(2)))
  }

  test("gates decline: row count over budget, non-long column") {
    val df = spark.range(0, 10)
      .select(col("id").as("a"), col("id").cast("int").as("b"))
    assert(ExactDistinct.longCounts(df, Seq("a"),
      ExactDistinct.MaxFastPathRows + 1).isEmpty)
    assert(ExactDistinct.longCounts(df, Seq("b"), 10L).isEmpty)
  }

  test("parquetRowCount reads exact footer counts, no job") {
    val rc = ExactDistinct.parquetRowCount(spark, s"$sfDir/lineitem.parquet")
    assert(rc == spark.read.parquet(s"$sfDir/lineitem.parquet").count())
  }

  test("q10 fast path equals the distributed fallback row for row") {
    val fast = SparkEntry.queries("q10_distinct_count")(spark, sfDir)
      .head()
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val slow = li.agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders")).head()
    assert(fast == slow)
  }
}
