package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-13 p-family floor probe: run one p-key with a job listener
  * and print every Spark job's wall time + call site, so the trigger
  * floor (control IO, appends, compactions, result fold) separates
  * from the real per-batch compute. Usage:
  *   runMain graft.tools.R13PProbe <sfDir> <key> [key...]
  */
object R13PProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1.0")
    val keys = if (args.length > 1) args.drop(1).toSeq else Seq("p18_incremental_graph_dedup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(e.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach { case (t0, desc) =>
          done.add((e.jobId, (System.nanoTime() - t0) / 1e9, desc))
        }
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val secs = (for (a <- si.completionTime; b <- si.submissionTime)
          yield (a - b) / 1e3).getOrElse(-1.0)
        if (secs > 2.0) {
          val m = si.taskMetrics
          stages.add(f"stage ${si.stageId}%4d wall=$secs%7.1f tasks=${si.numTasks}%4d " +
            f"cpuSum=${m.executorCpuTime / 1e9}%8.1f runSum=${m.executorRunTime / 1e3}%8.1f " +
            f"gc=${m.jvmGCTime / 1e3}%6.1f shW=${m.shuffleWriteMetrics.bytesWritten >> 20}%6d MB " +
            f"shR=${m.shuffleReadMetrics.totalBytesRead >> 20}%6d MB spill=${m.diskBytesSpilled >> 20}%5d MB " +
            si.name.take(60))
        }
      }
    })

    // SPARK_GRAFT_WARM_DIR: run each key once on a small fixture
    // first — tests whether the cold-run CPU blowup is JIT warmup of
    // the (source-cached) generated classes, which a small same-shape
    // run would pre-compile.
    sys.env.get("SPARK_GRAFT_WARM_DIR").foreach { wd =>
      for (key <- keys) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(key)(spark, wd)
          .write.format("noop").mode("overwrite").save()
        println(f"== $key warm@$wd ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    for (key <- keys; run <- 1 to 2) {
      done.clear()
      stages.clear()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(key)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener drain
      println(f"== $key run$run wall=$wall%.1f s")
      import scala.jdk.CollectionConverters._
      val sorted = done.asScala.toSeq.sortBy(_._1)
      val totalJob = sorted.map(_._2).sum
      sorted.foreach { case (id, s, d) =>
        if (s > 0.5) println(f"  job $id%4d $s%7.2f s  ${d.replaceAll("\n", " | ").take(110)}")
      }
      println(f"  jobs=${sorted.size} sumJobSecs=$totalJob%.1f (wall $wall%.1f)")
      stages.asScala.toSeq.sorted.foreach(s => println("  " + s))
    }
    spark.stop()
  }
}
