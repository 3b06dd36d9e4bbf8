package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Why p18's upper-decade exponent exceeds 1: the maintained graph's
  * above-threshold edge set is the ANSWER, and on the replicated
  * fixture the true near-dup mass grows ~quadratically in copies
  * (every vector gains c-1 near-twins). This probe counts the exact
  * above-threshold pair mass (sim > thr, a < b, distinct) per scale
  * point so wall/pair can be compared across scales — the
  * per-OUTPUT cost is the operator's honest unit at 100 TB, where
  * near-dup density does NOT grow with corpus size the way a
  * key-shifted replication makes it.
  * Usage: runMain graft.tools.P18Probe <sfDir> [thr=0.3] */
object P18Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val thr = if (args.length > 1) args(1).toDouble else 0.3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val t0 = System.nanoTime()
    val n = graft.operators.Similarity
      .bucketLocalScoredPairs(emb, "vec_id", "embedding",
        numTables = 12, planesPerTable = 4, dim = 64, seed = 42L,
        maxBucketRows = 2048)
      .filter(col("sim") > thr && col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct().count()
    println(f"[p18probe] $dir thr=$thr pairs=$n t=${(System.nanoTime - t0) / 1e9}%.2f")
    spark.stop()
  }
}
