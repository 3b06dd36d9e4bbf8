package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Piecewise cost of the quantized band build (bucketLocalThresholdPairs'
  * qbanded pipeline) — which projection eats the CPU at sf1.0?
  * Usage: runMain graft.tools.R15QProbe [sfDir]
  */
object R15QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/scale/sf1.0")
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vc = emb.select(col("vec_id"), col("embedding").as("v"))
      .repartition(32).cache()
    vc.count()
    val vd = transform(col("v"), _.cast("double"))
    val maxAbs = aggregate(vd, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    val tableBuckets = (0 until 12).map { t =>
      struct(lit(t).as("tbl"),
        graft.operators.Similarity.hyperplaneBucket(col("v"), 4, 64,
          42L + 7919L * t).as("bkt"))
    }
    def time(label: String)(df: => DataFrame): Unit =
      (1 to 2).foreach { p =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[qprobe] $label pass$p wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    time("base: vc count only")(vc.select(col("vec_id")))
    time("maxAbs HOF")(vc.select(col("vec_id"), maxAbs.as("__ma")))
    time("qv transform")(
      vc.select(col("vec_id"), col("v"), maxAbs.as("__ma"))
        .select(col("vec_id"), transform(col("v"), x =>
          when(col("__ma") > 0.0,
            greatest(lit(-127.0), least(lit(127.0),
              round(x.cast("double") * 127.0 / col("__ma")))))
            .otherwise(lit(0.0)).cast("byte")).as("qv")))
    time("l2norm HOF")(vc.select(col("vec_id"),
      Similarity.l2norm(transform(col("v"), _.cast("double"))).as("__n")))
    time("buckets x12 (dotNative)")(vc.select(col("vec_id"),
      explode(array(tableBuckets: _*)).as("tb")))
    time("buckets x12 (native fused)")(vc.select(col("vec_id"),
      posexplode(Similarity.hyperplaneBuckets(col("v"), 12, 4, 64, 42L))))
    // parity: native fused buckets vs the when(dotNative)-sum per table
    val oldB = vc.select(col("vec_id"),
        explode(array(tableBuckets: _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    val newB = vc.select(col("vec_id"),
        posexplode(Similarity.hyperplaneBuckets(col("v"), 12, 4, 64, 42L)))
      .select(col("vec_id"), col("pos").as("tbl"), col("col").as("bkt"))
    val diff = oldB.exceptAll(newB).count() + newB.exceptAll(oldB).count()
    println(s"[qprobe] bucket parity diff rows = $diff")
    // full qbanded as in bucketLocalThresholdPairs
    val qb = vc
      .select(col("vec_id"), col("v"), maxAbs.as("__ma"))
      .select(col("vec_id"),
        transform(col("v"), x =>
          when(col("__ma") > 0.0,
            greatest(lit(-127.0), least(lit(127.0),
              round(x.cast("double") * 127.0 / col("__ma")))))
            .otherwise(lit(0.0)).cast("byte")).as("qv"),
        (col("__ma") / 127.0).as("__s"),
        Similarity.l2norm(transform(col("v"), _.cast("double"))).as("__n"),
        explode(array(tableBuckets: _*)).as("tb"))
      .select(col("vec_id"), col("qv"), col("__s"), col("__n"),
        aggregate(col("qv"), lit(0L),
          (acc, x) => acc + abs(x.cast("long"))).as("__sa"),
        col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    time("full qbanded")(qb)
    spark.stop()
  }
}
