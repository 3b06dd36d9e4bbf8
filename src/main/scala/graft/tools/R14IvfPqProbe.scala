package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Similarity}

/** Round-14 write-once IVF-PQ layout measurement on the FRESH 20k
  * corpus: publish cost (paid once), probe recall + wall at
  * nprobe/numCells fractions ≤ 0.25, against (a) exact truth and
  * (b) the per-query s08 path (ivfPqKnn defaults) the layout is
  * meant to beat. Usage: R14IvfPqProbe [sfDir] */
object R14IvfPqProbe {
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
      val t0 = System.nanoTime()
      val rec = recallOf(mk)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-48s $rec%7.3f $sec%7.2f")
    }

    def publish(name: String, numCells: Int, coarseIters: Int,
        margin: Double, probes: Seq[Int]): Unit = {
      val t0 = System.nanoTime()
      Similarity.writeIvfPqLayout(emb, "vec_id", "embedding",
        name, numCells = numCells, coarseIters = coarseIters,
        replicateMargin = margin)
      val pubSec = (System.nanoTime() - t0) / 1e9
      val stored = graft.operators.Layouts.manifest(spark)
        .filter(col("layout") === name)
        .select(col("n_rows")).head().getLong(0)
      val factor = stored.toDouble / n
      println(f"publish $name (cells=$numCells it=$coarseIters " +
        f"margin=$margin): $pubSec%7.2f s, storage x$factor%.2f")
      for (np <- probes)
        row(s"$name nprobe=$np/$numCells") {
          Similarity.ivfPqAnnFromLayout(spark, name,
            qs, "vec_id", "embedding", k, nprobe = np)
        }
    }

    val cells = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    publish("graft_ivfpq_probe", cells, 5, 0.0,
      Seq(cells / 4, cells * 2 / 5, cells * 3 / 5))
    publish("graft_ivfpq_probe_r05", cells, 5, 0.05, Seq(cells / 4))
    publish("graft_ivfpq_probe_r10", cells, 5, 0.10,
      Seq(cells / 8, cells / 4))
    publish("graft_ivfpq_probe_c64", 64, 5, 0.10, Seq(16))

    // the per-query baseline the layout must beat (s08 defaults)
    row("ivfPqKnn per-query (s08 defaults)") {
      Similarity.ivfPqKnn(emb, qs, "vec_id", "embedding", k)
    }
    spark.stop()
  }
}
