package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-15 banded-engine dissection: how many candidate pairs does
  * the d07/s16 banding generate at a given SF, how hot are the
  * buckets, and where does the scoring stage's CPU go (pair volume vs
  * per-pair cost). Usage: runMain graft.tools.R15Probe [sfDir]
  */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val banded = Similarity.bandedWithVecs(
      emb, "vec_id", "embedding", 12, 4, 64, 42L).cache()
    println(s"[probe] band rows = ${banded.count()}")
    val m = banded.groupBy("tbl", "bkt").agg(count(lit(1)).as("m"))
    val stats = m.agg(
      sum(col("m") * (col("m") - 1) / 2).as("pairs"),
      max(col("m")).as("max_m"),
      count(lit(1)).as("n_buckets")).head()
    println(s"[probe] candidate pairs (sum m(m-1)/2) = ${stats.get(0)}" +
      s" max bucket = ${stats.get(1)} buckets = ${stats.get(2)}")
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val n = Similarity.scoredPairsFromBanded(banded, 2048)
        .filter(col("sim") > 0.3).count()
      println(f"[probe] pass $pass: scored+filtered=$n " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
