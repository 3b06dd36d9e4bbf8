package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off attribution probe for the round-10→11 p15 sweep
  * regression (2.79 s → 5.88 s in the sweep, ~4.5 s isolated):
  * times each phase of the single-batch p15 body separately so the
  * extra cost lands on a named line (band build / pair scoring /
  * LSM appends / the BandState bucketed saveAsTable / final read)
  * instead of "the fold got slower". Not part of the driver
  * contract; findings recorded in SCALE.md / BENCH_FULL.md.
  *
  * Usage: runMain graft.tools.P15Probe [sfDir]
  */
object P15Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.tuneLocal(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeMs(f: => Unit): Long = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000
    }
    // warmup (codegen/session init outside the timings)
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()

    // end-to-end, same entry Bench runs
    val full = timeMs {
      graft.streaming.Streams.streamingKnnGraph(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    println(s"[p15probe] full streamingKnnGraph: $full ms")

    // phase-by-phase replica of the one-batch body
    val b = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = java.nio.file.Files
      .createTempDirectory("graft_p15probe").toString
    val bands = new graft.streaming.BandState(
      spark, base, Seq("tbl", "bkt"))
    val newBands = graft.operators.Similarity.embBandTable(
      b, "vec_id", "embedding", 12, 4, 64, 42L).cache()
    println(s"[p15probe] band build+cache: ${timeMs(newBands.count())} ms")
    val within = newBands.alias("a").join(newBands.alias("b"),
        col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .distinct()
    val vecs = b.select(col("vec_id"), col("embedding").as("v"))
    val scored = within
      .join(vecs.select(col("vec_id").as("a_id"), col("v").as("va")), "a_id")
      .join(vecs.select(col("vec_id").as("b_id"), col("v").as("vb")), "b_id")
      .select(col("a_id"), col("b_id"),
        graft.operators.Similarity.cosine(col("va"), col("vb")).as("sim"))
    val sym = scored.select(explode(array(
        struct(col("a_id").as("vec_id"), col("b_id").as("nbr_id"),
          col("sim")),
        struct(col("b_id").as("vec_id"), col("a_id").as("nbr_id"),
          col("sim")))).as("e"))
      .select(col("e.vec_id"), col("e.nbr_id"), col("e.sim"))
    println(s"[p15probe] pairs+score+sym (noop): ${
      timeMs(sym.write.format("noop").mode("overwrite").save())} ms")
    val graphSt = new graft.streaming.LsmState(
      spark, s"$base/graph", graft.streaming.Streams.graphFold(5, None), 8)
    val vecsSt = new graft.streaming.LsmState(
      spark, s"$base/vecs", identity, 8)
    println(s"[p15probe] graph LSM append: ${
      timeMs(graphSt.append(0, sym))} ms")
    println(s"[p15probe] vecs LSM append: ${
      timeMs(vecsSt.append(0, vecs))} ms")
    println(s"[p15probe] bands saveAsTable append: ${
      timeMs(bands.append(0, newBands))} ms")
    println(s"[p15probe] fold view + rank read (noop): ${
      timeMs(graphSt.result().write.format("noop").mode("overwrite")
        .save())} ms")
    println(s"[p15probe] BandState.drop: ${timeMs(bands.drop())} ms")

    // multi-batch drive: 16 triggers, with and without compaction —
    // the difference IS the generation-compaction cost VERDICT r10
    // asked to attribute (band-table rewrite + graph/vecs fold every
    // compactEvery batches)
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_p15probe_src").toString
    b.repartition(16).write.mode("overwrite").parquet(srcDir)
    def drain(compactEvery: Int): Long = {
      val base2 = java.nio.file.Files
        .createTempDirectory("graft_p15probe_mb").toString
      val stream = spark.readStream.schema(b.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val t = timeMs {
        graft.streaming.Streams.incrementalKnnGraph(
            stream, base2, compactEvery = compactEvery)
          .write.format("noop").mode("overwrite").save()
      }
      new graft.streaming.BandState(
        spark, base2, Seq("tbl", "bkt")).drop()
      t
    }
    val noCompact = drain(compactEvery = 1000)
    val withCompact = drain(compactEvery = 4) // 4 compactions over 16
    println(s"[p15probe] 16-batch drain, no compaction: $noCompact ms")
    println(s"[p15probe] 16-batch drain, compactEvery=4: $withCompact ms")
    println(s"[p15probe] => per-compaction cost ~ ${
      (withCompact - noCompact) / 4} ms")
    spark.stop()
  }
}
