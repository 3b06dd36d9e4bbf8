package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Per-STAGE cost attribution for one query key: stage name (callsite),
  * task count, shuffle bytes, executor CPU — the dissection JobStats'
  * per-key totals can't give. Usage:
  *   runMain graft.tools.R15StageProbe <sfDir> <query>
  */
object R15StageProbe {
  private case class St(id: Int, name: String, tasks: Int,
    shufR: Long, shufW: Long, cpuNs: Long, runMs: Long, outRows: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val name = args(1)
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
    // warm (codegen, memo)
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
    val stages = ArrayBuffer[St]()
    val l = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val i = s.stageInfo
          stages += St(i.stageId, i.name.takeWhile(_ != '\n'), i.numTasks,
            i.taskMetrics.shuffleReadMetrics.totalBytesRead,
            i.taskMetrics.shuffleWriteMetrics.bytesWritten,
            i.taskMetrics.executorCpuTime,
            i.taskMetrics.executorRunTime,
            i.taskMetrics.outputMetrics.recordsWritten)
        }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
    println(f"[stageprobe] $name total wall=$secs%.2f s, ${stages.size} stages")
    stages.sortBy(-_.cpuNs).foreach { s =>
      println(f"[stage] id=${s.id}%4d cpu=${s.cpuNs / 1e9}%8.2f s " +
        f"run=${s.runMs / 1e3}%8.2f s tasks=${s.tasks}%5d " +
        f"shufR=${s.shufR}%11d shufW=${s.shufW}%11d  ${s.name}")
    }
    spark.stop()
  }
}
