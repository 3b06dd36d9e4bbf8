package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Similarity}

/** Round-13 scale-aware ANN geometry probe on the FRESH (non-
  * replicated) fixture: at 10× corpus the FIXED r12 geometries lose
  * recall (pq cb=64/cm=64: 0.961 @ 2k → 0.809 @ 20k; ivfpq
  * nprobe=10/10 cells: 0.928 → 0.543) — quantization confusion grows
  * with candidate count while the re-rank set stays fixed. Measure
  * the standard scaling levers: candMult ∝ n for PQ, numCells ≈ √n
  * with nprobe a fraction for IVF-PQ.
  * Usage: R13AnnScaleProbe <sfDir> */
object R13AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1.0f")
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val k = 5
    val n = emb.count()
    val qs = Sampling.hashSample(emb, "vec_id", 0.02, seed = 7L).cache()
    val truth = Similarity.knnBruteAgg(emb, qs, "vec_id", "embedding", k)
      .select(col("q_id"), col("cand_id")).cache()
    truth.count()
    println(s"# queries=${qs.count()} corpus=$n k=$k sf=$sfDir")

    def recallOf(ann: DataFrame): Double = {
      val r = truth.join(
          ann.select(col("q_id"), col("cand_id"), lit(1L).as("__hit")),
          Seq("q_id", "cand_id"), "left")
        .agg(count(lit(1)).as("nt"),
          sum(coalesce(col("__hit"), lit(0L))).as("nf")).head()
      r.getLong(1).toDouble / r.getLong(0)
    }
    def row(name: String)(mk: => DataFrame): Unit = {
      mk.count()
      val t0 = System.nanoTime()
      val rec = recallOf(mk)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-40s $rec%7.3f $sec%7.2f")
    }

    // PQ: grow the re-rank set with the corpus (candMult ∝ n)
    for (cm <- Seq(64, 128, 256, 512))
      row(s"pq cb=64 candMult=$cm") {
        Similarity.pqKnn(emb, qs, "vec_id", "embedding", k,
          codebookK = 64, candMult = cm)
      }
    row("pq cb=128 candMult=256") {
      Similarity.pqKnn(emb, qs, "vec_id", "embedding", k,
        codebookK = 128, candMult = 256)
    }
    // IVF-PQ: numCells ~ sqrt(n), nprobe a fraction of cells
    val cells = math.max(10, math.sqrt(n.toDouble).round.toInt)
    for ((nc, np) <- Seq((cells, cells / 8), (cells, cells / 4),
        (cells / 2, cells / 8), (40, 10)))
      row(s"ivfpq cells=$nc nprobe=$np cb=64 cm=64") {
        Similarity.ivfPqKnn(emb, qs, "vec_id", "embedding", k,
          numCells = nc, nprobe = np, codebookK = 64, candMult = 64)
      }
    spark.stop()
  }
}
