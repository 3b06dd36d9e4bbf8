package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Cost of the frozen-centroid cell assignment (nearestCellCol's
  * k unrolled CosineSim structs) at sf1.0 — is it another JIT-blowup
  * like the hyperplane bucketing was?
  * Usage: runMain graft.tools.R15CellProbe [sfDir] [k]
  */
object R15CellProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/scale/sf1.0")
    val k = if (args.length > 1) args(1).toInt else 10
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
      .repartition(32).cache()
    emb.count()
    val cents = Similarity.trainCentroids(emb, "vec_id", "v", k,
      maxIter = 1)
    def time(label: String)(df: => DataFrame): Unit =
      (1 to 2).foreach { p =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[cellprobe] $label pass$p wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    time("baseline select")(emb.select(col("vec_id")))
    time(s"assignCells k=$k")(
      Similarity.assignCells(emb, "vec_id", "v", cents))
    spark.stop()
  }
}
