package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
object D09Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.tune(SparkSession.builder()).master("local[32]")
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
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        if (dur > 0.5) println(f"STAGE ${si.stageId}%3d tasks=${si.numTasks}%4d wall=${dur}%8.2f s")
      }
    })
    val dir = "/root/repo/testdata/sf1.0"
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("s16_knn_graph")(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"RUN$r: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
