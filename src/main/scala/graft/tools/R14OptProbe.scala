package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-14 OPTIMIZATION phase-timer for the p20 pipeline: where does
  * the key's wall actually go — publish (count/train/assign+encode/
  * write/manifest), the stream machinery, the per-batch append, the
  * final profile aggregate? Usage: R14OptProbe [sfDir] */
object R14OptProbe {
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
    // warmup: codegen/session init paid outside the timings
    graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"[p20-phase] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      a
    }

    (1 to 2).foreach { pass =>
      println(s"== pass $pass ==")
      val table = "graft_p20_ivfpq"
      timed("dropManagedTable x3") {
        graft.streaming.Streams.dropManagedTable(spark, table)
        graft.streaming.Streams.dropManagedTable(spark, s"${table}_centroids")
        graft.streaming.Streams.dropManagedTable(spark, s"${table}_books")
      }
      val emb: DataFrame = spark.read.parquet(s"$sfDir/embeddings.parquet")
      // publish sub-steps, replicated from writeIvfPqLayout's body
      locally {
        import spark.implicits._
        val corpus = emb.filter(col("vec_id") % 5 =!= 0)
        val (numSub, codebookK, sampleN, trainIters, coarseIters, seed) =
          (8, 32, 1024, 4, 2, 42L)
        val dim = timed("  pub: dim head")(
          corpus.select(size(col("embedding"))).head.getInt(0))
        val subDim = dim / numSub
        val n = timed("  pub: count")(corpus.count())
        val cents = timed("  pub: trainCentroids (2 iters)") {
          Similarity.trainCentroids(
            corpus, "vec_id", "embedding", 16, coarseIters, seed)
        }
        val centsDf = cents.zipWithIndex.map { case (c, i) => (i, c) }
          .toDF("cell", "centroid")
        val assigned = Similarity.assignIvfCells(
          corpus, "vec_id", "embedding", cents, 0.1, 4)
        val sample = timed("  pub: residual sample collect") {
          assigned
            .join(broadcast(centsDf), Seq("cell"))
            .select(col("vec_id"),
              zip_with(transform(col("embedding"), _.cast("double")),
                col("centroid"), (a, b) => a - b).as("__res"))
            .orderBy(xxhash64(col("vec_id"), lit(seed + 1)), col("vec_id"))
            .limit(sampleN)
            .select(col("__res")).collect().map(_.getSeq[Double](0).toArray)
        }
        val books = timed("  pub: lloydEuclid driver") {
          (0 until numSub).map { s =>
            graft.operators.Similarity.lloydEuclid(
              sample.map(_.slice(s * subDim, (s + 1) * subDim)),
              codebookK, trainIters)
          }.toArray
        }
        val encoded = Similarity.encodeIvfPqCodes(
          assigned, centsDf, books, numSub, subDim)
        timed("  pub: Layouts.publish codes") {
          graft.operators.Layouts.publish(encoded, table, "ivfpq_codes",
            Seq("cell"), 8,
            props = Map("numCells" -> "16", "numSub" -> "8",
              "codebookK" -> "32", "seed" -> "42", "nprobe_default" -> "4",
              "base_rows" -> n.toString, "replicateMargin" -> "0.1",
              "maxAssign" -> "4",
              "centroids_table" -> s"${table}_centroids",
              "books_table" -> s"${table}_books"),
            propsOf = w => Map("mean_code_err" ->
              f"${w.agg(avg(col("__qerr"))).head.getDouble(0)}%.8f"))
        }
        timed("  pub: centroids+books saveAsTable") {
          val centsT = table + "_centroids"
          val booksT = table + "_books"
          graft.operators.Layouts.ensureWritable(spark, centsT)
          graft.operators.Layouts.ensureWritable(spark, booksT)
          centsDf.write.mode("overwrite").saveAsTable(centsT)
          val booksRows: Seq[(Int, Seq[Seq[Double]])] = books.zipWithIndex
            .map { case (b, i) => (i, b.map(_.toSeq).toSeq) }.toSeq
          booksRows.toDF("sub", "book")
            .write.mode("overwrite").saveAsTable(booksT)
        }
      }
      timed("publish (writeIvfPqLayout)") {
        Similarity.writeIvfPqLayout(
          emb.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding", table,
          numCells = 16, numBuckets = 8, numSub = 8, codebookK = 32,
          sampleN = 1024, trainIters = 4, coarseIters = 2)
      }
      val batch = timed("batch read+filter") {
        val b = emb.filter(col("vec_id") % 5 === 0)
        b.count()
        b
      }
      timed("appendIvfPqLayout (one batch)") {
        Similarity.appendIvfPqLayout(batch, "vec_id", "embedding", table)
          .collect()
      }
      timed("final per-cell profile") {
        spark.table(table)
          .groupBy("cell")
          .agg(count(lit(1)).as("n_codes"),
            round(avg(col("__qerr")), 4).as("mean_qerr"))
          .select(col("cell").cast("long").as("cell"), col("n_codes"),
            col("mean_qerr"))
          .orderBy("cell")
          .write.format("noop").mode("overwrite").save()
      }
      timed("full key (streamingIvfPqCodes)") {
        graft.streaming.Streams.streamingIvfPqCodes(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
