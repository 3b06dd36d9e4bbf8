package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing breakdown of the p11 streaming DSIR fold: stream
  * machinery vs the fold's actual aggregate. Not driver contract. */
object P11Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Sessions.tuneLocal(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[p11probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // warm session
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    // batch equivalent of the per-batch delta aggregate
    val isTgt = col("source") === "src0"
    t("batch delta agg") {
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("source"), explode(graft.functions.TextFns.wordNgrams(
          graft.functions.TextFns.tokensLower(col("text")), 2)).as("bgr"))
        .select(col("source"),
          graft.functions.TextFns.featureBucket(col("bgr"), 64).as("b"))
        .groupBy("b").agg(
          sum(when(isTgt, 1L).otherwise(0L)).as("ct"),
          sum(when(isTgt, 0L).otherwise(1L)).as("cr"))
        .collect()
    }
    // an empty-fold stream over the same source: machinery cost only
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    t("stream machinery (count-only foreachBatch)") {
      val base = java.nio.file.Files.createTempDirectory("p11probe").toString
      val q = spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.agg(count(lit(1))).collect(); ()
        }
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.processAllAvailable(); q.stop()
    }
    // the real p11
    t("streamingDsirModel end-to-end") {
      graft.streaming.Streams.streamingDsirModel(spark, sfDir).collect()
    }
    spark.stop()
  }
}
