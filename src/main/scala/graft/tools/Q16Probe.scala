package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: can q16_status_metadata's per-table row counts come from
  * parquet FOOTER statistics instead of full scans? DuckDB answers
  * count(*) from row-group metadata (its 0.02 s at sf1.0); Spark has
  * the same machinery behind `spark.sql.parquet.aggregatePushdown`,
  * but only on the DSv2 read path (useV1SourceList must exclude
  * parquet). A child session (shared context, own SQLConf — the p19
  * pattern) scopes both flags away from every other query.
  * Usage: runMain graft.tools.Q16Probe [sfDir] */
object Q16Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/testdata/sf1.0"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[q16probe] $tag n=$n t=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    timeIt("v1-count")(
      spark.read.parquet(s"$dir/lineitem.parquet").count())
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    timeIt("v2-push-count")(
      s2.read.parquet(s"$dir/lineitem.parquet").count())
    val plan = s2.read.parquet(s"$dir/lineitem.parquet")
      .groupBy().count().queryExecution.executedPlan.toString
    println("[q16probe] pushed=" + plan.contains("PushedAggregation: [COUNT(*)]"))
    spark.stop()
  }
}
