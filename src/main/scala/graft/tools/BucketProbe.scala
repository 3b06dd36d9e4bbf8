package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off experiment: does DisableUnnecessaryBucketedScan (the
  * autoBucketedScan=true default) disable a bucketed scan that has a
  * bucket-pruning filter? Decides whether the index probes need the
  * session-conf mutation at all. Not part of the driver contract. */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.tuneLocal(SparkSession.builder()).master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (1 to 10000).map(i => (s"tok$i", i.toLong)).toDF("token", "owner_id")
      .write.bucketBy(8, "token").sortBy("token")
      .mode("overwrite").saveAsTable("bp_idx")
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      val exec = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      exec.toString
    }
    println("=== autoBucketedScan=" +
      spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled"))
    // 1. point probe: equality filter on the bucket column
    val point = spark.table("bp_idx").filter(col("token") === "tok77")
    val p1 = planOf(point)
    println("POINT bucketed=" + p1.contains("SelectedBucketsCount"))
    println(p1.linesIterator.filter(_.contains("FileScan")).mkString("\n"))
    // 2. IN-list probe (the IVF cells shape)
    val inl = spark.table("bp_idx")
      .filter(col("token").isin("tok1", "tok2", "tok3"))
    val p2 = planOf(inl)
    println("INLIST bucketed=" + p2.contains("SelectedBucketsCount"))
    // 3. join on the bucket key with an unbucketed probe side (span shape)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val probe = (1 to 50).map(i => s"tok$i").toDF("token")
    val j = probe.join(spark.table("bp_idx"), Seq("token"))
    val p3 = planOf(j)
    println("JOIN plan:\n" + p3.linesIterator
      .filter(l => l.contains("FileScan") || l.contains("Exchange") ||
        l.contains("Bucketed"))
      .mkString("\n"))
    spark.stop()
  }
}
