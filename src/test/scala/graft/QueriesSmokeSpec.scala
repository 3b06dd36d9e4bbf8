package graft

/** Every registered query runs and yields rows at sf0.001 (the
  * driver's t1-style smoke, locally enforced for all entries). */
class QueriesSmokeSpec extends SparkSuite {

  test("every oracle key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries impl: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name returns rows") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no accidental cartesian or nested-loop joins in any query plan") {
    // intentional full scans: the exact-verification block (d05) and
    // the brute-force KNN baselines join on pure inequality by design;
    // IVF probes cross-join a broadcast ~k-row centroid table; t08
    // broadcasts the ONE-row corpus count (scalar-subquery shape)
    // q36/t10 broadcast a ONE-row min-max/total aggregate; s06 is the
    // quantized variant of the s01 inequality-join baseline plus a
    // one-row scale broadcast
    val intentional = Set("d05_embedding_neardup", "s01_knn_brute",
      "s04_knn_topk_agg", "s03_ivf_ann", "s05_ivf_kmeans",
      "t08_tfidf_keywords", "q36_histogram", "t10_source_mixture",
      "s06_quantized_knn", "q35_column_profile", "e15_gap_fill",
      // q10 cross-joins its three ONE-row per-column distinct-count
      // aggregates into the single result row (round-12 split form:
      // column-pruned scans instead of a 3x Expand)
      "q10_distinct_count",
      "t13_stopword_detect", "a04_kmv_set_algebra", "s07_pq_ann",
      "s08_ivfpq_ann",
      // s09 is the inequality-join MIPS baseline (same shape as s01);
      // s10 cross-joins the ONE-row max-corpus-norm aggregate into the
      // augmentation map; t17 cross-joins the |classes|-row (=5) class
      // totals over the vocab to build the bounded model matrix; q43
      // cross-joins the ONE-row total onto the 20 surviving top keys
      "s09_mips_brute", "s10_mips_ann", "s11_l2_knn", "t17_lang_affinity",
      "q43_skew_profile",
      // p07 finishes the maintained (token, df) model with the same
      // ONE-row corpus-count broadcast as its batch form t13
      "p07_incremental_df",
      // d14 broadcasts the tiny eval embedding set over the corpus
      // scan (eval << corpus by construction); t20 broadcasts the
      // ONE-row total/source-count aggregate
      "d14_semantic_decontam", "t20_mixture_plan",
      // s12 cross-joins the ONE-row join-total aggregate onto the
      // |k|-row profile; t21 cross-joins the ONE-row vocab-size
      // aggregate into the model frame
      "s12_cluster_profile", "t21_word_lm_score",
      // t22 cross-joins the ONE-row feature-total aggregate into the
      // per-occurrence ratio frame; p11 finishes the maintained
      // 64-row model with the same one-row totals broadcast
      "t22_dsir_weights", "p11_incremental_dsir",
      // t24 broadcasts the ONE-row p25 threshold onto the scored docs;
      // t26 broadcasts the ONE-row quintile-threshold frame the same way
      "t24_quality_gate", "t26_curriculum_plan",
      // q45 broadcasts the ONE-row snapshot-total aggregate; e21
      // broadcasts two ONE-row percentile frames into the summary row
      "q45_drift_audit", "e21_session_profile",
      // e22 broadcasts the ONE-row latency-percentile frame
      "e22_conversion_latency",
      // s14 composes the s01-shape exact truth pass (sample × corpus,
      // intentional) with s03's bounded query × centroid probe; s15's
      // all-pairs block is intentional and bounded to its 10% sample
      "s14_recall_audit", "s15_threshold_calib")
    // these run a streaming query to completion at construction time —
    // their result frames are materialized sinks, nothing to audit
    val streamingRunners = Set("e04_streaming_counts",
      "e08_streaming_file_sink", "e09_stream_stream_join",
      "e10_streaming_dedup", "e14_streaming_upsert")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if streamingRunners(name) => None
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoop") && !intentional(name)
        if (cartesian || bnlj) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unplanned cartesian/nested-loop joins in: $offenders")
  }
}
