package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** One-off measurement probe behind the round-11 LSH-parallelism
  * fixes; kept as the runnable record. Runs a SparkEntry key twice
  * (Bench's shape) printing every stage over 0.5 s as
  * `STAGE <id> tasks=<n> wall=<s>`. Findings at sf1.0 it exists to
  * remember (pre-fix numbers):
  *
  *  - s16's quadratic cosine stage ran at 2 tasks (259 s) on a cold
  *    cache and 32 tasks (11 s) on a warm one: the planner broadcast
  *    the byte-small band table, so the scoring inherited the
  *    corpus's file splits; with a materialized cache the stats
  *    forced a shuffle instead. Bench's measure-the-second-run
  *    protocol masked the cold shape entirely.
  *  - the un-spread hyperplane projection ran 4x concurrently at 2
  *    tasks each (11 s apiece) while the lazy cache raced.
  *
  * Both are fixed in Similarity (explicit verbatim-key repartition,
  * pre-projection spread, eager materialization); this probe is how
  * to SEE a recurrence. */
object D09Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.tuneLocal(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) -
          si.submissionTime.getOrElse(0L)) / 1000.0
        if (dur > 0.5)
          println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%4d wall=${dur}%8.2f s")
      }
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf1.0")
    val key = args.headOption.getOrElse("s16_knn_graph")
    for (r <- 1 to 2) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(key)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"RUN$r $key: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
