package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Deterministic per-key cost profile: Spark JOB / STAGE / TASK counts
  * and shuffle bytes for each named query, measured via a
  * SparkListener. Wall-clock on a contended box is ±40% noise; job and
  * exchange counts are bit-stable, so before/after claims in
  * OPTIMIZATION_r14.md lean on these. Usage:
  *   runMain graft.tools.JobStats <sfDir> <query> [query ...]
  */
object JobStats {
  private class Counter extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    @volatile var cpuNs = 0L
    @volatile var runMs = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit =
      synchronized { jobs += 1 }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized {
        stages += 1
        tasks += s.stageInfo.numTasks
        shuffleRead += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        shuffleWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        // task CPU time is far more drift-robust than wall on a
        // contended box — the r15 engine comparisons rank on it
        cpuNs += s.stageInfo.taskMetrics.executorCpuTime
        runMs += s.stageInfo.taskMetrics.executorRunTime
      }
    def reset(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0L; shuffleRead = 0L; shuffleWrite = 0L
      cpuNs = 0L; runMs = 0L
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val c = new Counter
    spark.sparkContext.addSparkListener(c)
    names.foreach { name =>
      // run once un-counted (codegen, fixture memo), then counted
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      // drain listener events from the warm run before resetting
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      c.reset()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      println(f"[jobstats] $name%-32s jobs=${c.jobs}%4d stages=${c.stages}%4d " +
        f"tasks=${c.tasks}%6d shufR=${c.shuffleRead}%12d shufW=${c.shuffleWrite}%12d " +
        f"cpu=${c.cpuNs / 1e9}%8.2f s run=${c.runMs / 1e3}%8.2f s " +
        f"wall=$secs%7.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
