package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for the ROUND-11 bucket-local p15 body (the
  * successor measurement to [[P15Probe]], which replicates the
  * round-10 candidate-join body): times banding, the bucket-local
  * within scoring, the per-batch graph pre-prune, and the pruned
  * part write separately, plus the raw counts that explain them
  * (candidate occurrences vs pruned edges). Not part of the driver
  * contract; findings recorded in BENCH_FULL.md.
  *
  * Usage: runMain graft.tools.P15Probe2 [sfDir] [shufflePartitions]
  */
object P15Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parts = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = graft.Sessions.tuneLocal(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeMs(f: => Unit): Long = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000
    }
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()

    val b = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val bandedV = graft.operators.Similarity
      .bandedWithVecs(b, "vec_id", "embedding", 12, 4, 64, 42L).cache()
    println(s"[p15probe2] band+cache: ${timeMs(bandedV.count())} ms " +
      s"(${bandedV.count()} band rows)")
    val withinScored = graft.operators.Similarity
      .scoredPairsFromBanded(bandedV, maxBucketRows = 2048)
    println(s"[p15probe2] within scoring (noop): ${timeMs(
      withinScored.write.format("noop").mode("overwrite").save())} ms")
    println(s"[p15probe2] candidate occurrences: ${withinScored.count()}")
    val sym = withinScored
      .select(explode(array(
        struct(col("a_id").as("vec_id"), col("b_id").as("nbr_id"),
          col("sim")),
        struct(col("b_id").as("vec_id"), col("a_id").as("nbr_id"),
          col("sim")))).as("e"))
      .select(col("e.vec_id"), col("e.nbr_id"), col("e.sim"))
    val pruned = graft.streaming.Streams
      .graphFold(5, None, dedupEdges = true)(sym)
    println(s"[p15probe2] pre-prune (noop): ${timeMs(
      pruned.write.format("noop").mode("overwrite").save())} ms")
    println(s"[p15probe2] pruned edges: ${pruned.count()}")
    val out = java.nio.file.Files
      .createTempDirectory("graft_p15probe2").toString
    println(s"[p15probe2] pruned part write: ${timeMs(
      pruned.write.mode("overwrite").parquet(s"$out/part"))} ms")
    println(s"[p15probe2] RAW sym part write: ${timeMs(
      sym.write.mode("overwrite").parquet(s"$out/raw"))} ms")
    spark.stop()
  }
}
