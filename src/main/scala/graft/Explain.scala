package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints explain("formatted") and a timed run
  * for the named queries. Usage:
  *   runMain graft.Explain <sfDir> <query> [query ...]
  *   runMain graft.Explain <sfDir> <query> --time-only
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val timeOnly = args.contains("--time-only")
    val names = args.tail.filterNot(_.startsWith("--"))
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // bucketed layouts here are only ever read by probes that WANT
      // the bucketed scan (pruned point lookups, co-located joins) --
      // see graft.operators.Layouts; keep the planner from silently
      // un-bucketing them, and no operator mutates this mid-session
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      println(s"\n========== $name ==========")
      if (!timeOnly)
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      // rebuild the DataFrame per run, as Bench does: operators with a
      // driver-side loop (d06) or streaming run (e04/e05) do real work
      // at construction time
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[$name run $i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
