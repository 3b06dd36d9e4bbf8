package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Scale

class ScaleSpec extends SparkSuite {

  test("saltedJoin returns identical results to a plain join") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val supp = Tables.load(spark, sfDir, "supplier")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(supp, Seq("l_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Scale.saltedJoin(li, supp, "l_suppkey",
        col("l_orderkey") * 10 + col("l_linenumber"), numSalts = 8)
      .groupBy("s_name").agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("compact merges a many-small-file layout, preserving rows") {
    val src = Files.createTempDirectory("graft_compact_src").toString
    val dest = Files.createTempDirectory("graft_compact_dst").toString + "/out"
    val orders = Tables.load(spark, sfDir, "orders")
    orders.repartition(40).write.mode("overwrite").parquet(src)
    val smallFiles = new java.io.File(src).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(smallFiles == 40)
    Scale.compact(spark.read.parquet(src), src, dest,
      targetFileBytes = 1L << 30)
    val compacted = new java.io.File(dest).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(compacted == 1, s"expected 1 compacted file, got $compacted")
    assert(spark.read.parquet(dest).count() == orders.count())
  }

  test("partitionedWrite produces a layout that prunes partitions") {
    val out = Files.createTempDirectory("graft_layout").toString + "/docs"
    val docs = Tables.load(spark, sfDir, "documents")
    Scale.partitionedWrite(docs, out, Seq("lang"), Seq("doc_id"))
    val scan = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"no partition pruning in plan:\n$plan")
    assert(scan.count() ==
      docs.filter(col("lang") === "en").count())
  }
}
