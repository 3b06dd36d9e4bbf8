package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Similarity}

/** Round-14 incremental-append measurement on the FRESH corpus: the
  * claim under test is that a published IVF-PQ index absorbs new
  * batches at O(batch) cost (vs a full republish), that recall over
  * the grown corpus survives frozen quantizers trained on the base
  * 80%, and that compaction undoes the append path's file-geometry
  * debt without touching results. Usage: R14AppendProbe [sfDir] */
object R14AppendProbe {
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
    val emb = graft.Tables.load(spark, sfDir, "embeddings").cache()
    val n = emb.count()
    val k = 5
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val rest = emb.filter(col("vec_id") % 5 === 0)
    val qs = Sampling.hashSample(emb, "vec_id", 0.02, seed = 7L).cache()
    val truth = Similarity.knnBruteAgg(emb, qs, "vec_id", "embedding", k)
      .select(col("q_id"), col("cand_id")).cache()
    truth.count()
    println(s"# corpus=$n base=${base.count()} queries=${qs.count()} k=$k sf=$sfDir")

    def recallOf(ann: DataFrame): Double = {
      val r = truth.join(
          ann.select(col("q_id"), col("cand_id"), lit(1L).as("__hit")),
          Seq("q_id", "cand_id"), "left")
        .agg(count(lit(1)).as("nt"),
          sum(coalesce(col("__hit"), lit(0L))).as("nf")).head()
      r.getLong(1).toDouble / r.getLong(0)
    }
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val table = "graft_ivfpq_append_probe"
    val cells = math.max(16,
      math.ceil(math.sqrt(base.count().toDouble)).toInt)
    val (_, pubSec) = timed {
      Similarity.writeIvfPqLayout(base, "vec_id", "embedding", table,
        numCells = cells, replicateMargin = 0.10)
    }
    println(f"publish base (cells=$cells, margin=0.10): $pubSec%7.2f s")
    def probe(tag: String): Unit = {
      val (rec, sec) = timed {
        recallOf(Similarity.ivfPqAnnFromLayout(spark, table,
          qs, "vec_id", "embedding", k, nprobe = cells / 4))
      }
      val files = spark.table(table).inputFiles.length
      println(f"probe $tag%-28s recall=$rec%6.3f wall=$sec%6.2f files=$files")
    }
    probe("base only (4/5 corpus)")
    val chunks = 8
    (0 until chunks).foreach { c =>
      val (audit, sec) = timed {
        Similarity.appendIvfPqLayout(
          rest.filter(col("vec_id") % chunks === c),
          "vec_id", "embedding", table).head()
      }
      println(f"append $c: ${audit.getAs[Long]("batch_vecs")}%5d vecs " +
        f"${audit.getAs[Long]("batch_codes")}%5d codes " +
        f"err_ratio=${audit.getAs[Double]("err_ratio")}%5.3f " +
        f"skew=${audit.getAs[Double]("cell_skew")}%5.2f " +
        f"retrain=${audit.getAs[Boolean]("retrain_recommended")} " +
        f"wall=$sec%5.2f s")
    }
    probe(s"after $chunks appends")
    val ((before, after), cSec) =
      timed(Similarity.compactIvfPqLayout(spark, table))
    println(f"compact: $before files -> $after in $cSec%6.2f s")
    probe("after compaction")
    spark.stop()
  }
}
