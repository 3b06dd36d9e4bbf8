package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Similarity}

/** Round-12 ANN recall-vs-cost sweep (verdict task 5): measure
  * recall@k against exact brute-force truth on a hash-sampled query
  * set, per configuration, with wall time — the table that justifies
  * a production config at recall >= 0.85 rather than the spec's old
  * 0.6 floor. Usage: R12RecallSweep <sfDir> */
object R12RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1.0")
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
    val qs = Sampling.hashSample(emb, "vec_id", 0.02, seed = 7L).cache()
    val nq = qs.count()
    val truth = Similarity.knnBruteAgg(emb, qs, "vec_id", "embedding", k)
      .select(col("q_id"), col("cand_id")).cache()
    truth.count()
    println(s"# queries=$nq corpus=${emb.count()} k=$k sf=$sfDir")
    println(f"${"method"}%-34s ${"recall"}%7s ${"sec"}%7s")

    def recallOf(ann: DataFrame): Double = {
      val r = truth.join(
          ann.select(col("q_id"), col("cand_id"), lit(1L).as("__hit")),
          Seq("q_id", "cand_id"), "left")
        .agg(count(lit(1)).as("nt"),
          sum(coalesce(col("__hit"), lit(0L))).as("nf")).head()
      r.getLong(1).toDouble / r.getLong(0)
    }
    def row(name: String)(mk: => DataFrame): Unit = {
      mk.count() // warm (codebook training, codegen)
      val t0 = System.nanoTime()
      val rec = recallOf(mk)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-34s $rec%7.3f $sec%7.2f")
    }

    // PQ: codebookK x candMult
    for (cb <- Seq(32, 64, 128); cm <- Seq(16, 32, 64))
      row(s"pq cb=$cb candMult=$cm") {
        Similarity.pqKnn(emb, qs, "vec_id", "embedding", k,
          codebookK = cb, candMult = cm)
      }
    // IVF-PQ: nprobe x codebookK (numCells fixed at the s08 config)
    for (np <- Seq(3, 5, 8, 10); cb <- Seq(32, 64))
      row(s"ivfpq nprobe=$np cb=$cb") {
        Similarity.ivfPqKnn(emb, qs, "vec_id", "embedding", k,
          numCells = 10, nprobe = np, codebookK = cb)
      }
    // LSH: planes x (the multiprobe the impl ships)
    for (pl <- Seq(4, 5, 6))
      row(s"lsh planes=$pl") {
        Similarity.lshAnn(emb, qs, "vec_id", "embedding", k,
          numPlanes = pl)
      }
    // brute reference cost
    row("brute (exact reference)") {
      Similarity.knnBruteAgg(emb, qs, "vec_id", "embedding", k)
    }
    spark.stop()
  }
}
