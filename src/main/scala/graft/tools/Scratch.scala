package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch profiler: times one named query in isolation (warm + steady
  * runs), prints explain on demand. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
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
    val fn = graft.SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val times = (1 to 4).map(_ => once())
    println(f"[scratch] $name warm=${times.head}%.2f steady=${times.tail.map(t => f"$t%.2f").mkString(",")}")
    if (args.contains("--explain")) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
