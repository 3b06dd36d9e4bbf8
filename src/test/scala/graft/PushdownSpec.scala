package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scan-level plan assertions: filters reach the parquet reader as
  * PushedFilters and projections prune ReadSchema — the two
  * properties that decide whether a 100 TB scan reads terabytes or
  * gigabytes. Asserted on representative queries so a refactor that
  * silently breaks pushdown (e.g. wrapping a filter column in a
  * non-pushable expression) fails the suite, not the bill.
  */
class PushdownSpec extends SparkSuite {

  private def scans(name: String): Seq[FileSourceScanExec] = {
    val plan = SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val found = plan.collect { case s: FileSourceScanExec => s }
    assert(found.nonEmpty, s"$name: no parquet scans in plan")
    found
  }

  test("q02 filter+projection reach the scan") {
    val s = scans("q02_filter_project")
    val pushed = s.flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("GreaterThan") || pushed.contains("LessThan"),
      s"no range filter pushed: $pushed")
    // projection pruning: the scan must NOT read every lineitem column
    val schemas = s.map(_.metadata.getOrElse("ReadSchema", ""))
    assert(schemas.exists(sch => !sch.contains("l_comment") &&
      sch.contains("l_")),
      s"scan reads unpruned schema: $schemas")
  }

  test("q05 LIKE-search pushes the residual-safe predicates") {
    val pushed = scans("q05_fleet_search")
      .flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.nonEmpty && pushed != "[]", s"nothing pushed: $pushed")
  }

  test("e13 range join scans push the event_type filters") {
    val pushed = scans("e13_range_join")
      .flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("EqualTo(event_type,click)") &&
      pushed.contains("EqualTo(event_type,purchase)"),
      s"event_type filters not pushed: $pushed")
  }

  test("t01 text stats scan prunes to the columns it uses") {
    val schemas = scans("t01_token_stats")
      .map(_.metadata.getOrElse("ReadSchema", ""))
    assert(schemas.exists(sch => sch.contains("doc_id") &&
      sch.contains("text") && !sch.contains("embedding") &&
      !sch.contains("source")),
      s"documents scan unpruned: $schemas")
  }

  test("q35 profiler reads only the profiled columns") {
    // the profiler has two paths (operators.Quality.profile): the
    // fused one-scan columnar job (small inputs; computes on the
    // driver, so the RETURNED frame carries no parquet scan) and the
    // general distributed plan. Both must prune: the fused path by
    // its own construction (it scans the projection of exactly the
    // profiled columns), the general path in its executed plan.
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus")
    val fusedScan = graft.operators.ExactDistinct.bareColumnarScan(
      Tables.load(spark, sfDir, "lineitem")
        .select(cols.map(org.apache.spark.sql.functions.col): _*))
    fusedScan match {
      case Some(s) =>
        // fused gate open on this fixture: the internal scan is the
        // one the profile executes — assert it is pruned
        val sch = s.metadata.getOrElse("ReadSchema", "")
        assert(sch.contains("l_quantity") && !sch.contains("l_orderkey")
          && !sch.contains("l_shipdate"), s"fused scan unpruned: $sch")
      case None =>
        val schemas = scans("q35_column_profile")
          .map(_.metadata.getOrElse("ReadSchema", ""))
        assert(schemas.exists(sch => sch.contains("l_quantity") &&
          !sch.contains("l_orderkey") && !sch.contains("l_shipdate")),
          s"profiler scan unpruned: $schemas")
    }
  }

  test("q16 counts come from footer statistics, not scans") {
    // the cache-miss path must be answered by the DSv2 pushed
    // aggregation (a plain scan-count of a 100 TB catalog is a
    // full-corpus read); the child-session flags make the subplan a
    // BatchScan with PushedAggregation: [COUNT(*)]
    val plan = SparkEntry.footerCountFrame(
        SparkEntry.metaSession(spark), s"$sfDir/lineitem.parquet")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*)]"),
      s"expected a pushed count in:\n$plan")
    // a v1 fallback renders as "FileScan parquet" (never the exec
    // class name), so guard on the rendered token and require a v2
    // BatchScan
    assert(!plan.contains("FileScan"),
      "footer count fell back to the v1 scan path")
    assert(plan.contains("BatchScan"), plan)
    // the full status query still answers correctly through the
    // fingerprint-keyed cache
    val rows = SparkEntry.queries("q16_status_metadata")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == graft.Tables.names.toSet)
    assert(rows("lineitem") ==
      spark.read.parquet(s"$sfDir/lineitem.parquet").count())
  }

  test("q16 footer counts cache against the snapshot fingerprint") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q16_cache").toString
    val path = s"$dir/t.parquet"
    Seq(1L, 2L, 3L).toDF("x").write.mode("overwrite").parquet(path)
    assert(SparkEntry.cachedFooterCount(spark, path) == 3L)
    // warm: same fingerprint → the cached count, no recount query
    assert(SparkEntry.cachedFooterCount(spark, path) == 3L)
    // staleness: a rewrite changes the file set, so the fingerprint
    // moves and the count is recomputed — status never serves a
    // count for data that changed underneath it
    val fp1 = SparkEntry.snapshotFingerprint(spark, path)
    Seq(1L, 2L, 3L, 4L, 5L).toDF("x")
      .repartition(2).write.mode("overwrite").parquet(path)
    val fp2 = SparkEntry.snapshotFingerprint(spark, path)
    assert(fp1 != fp2, "rewrite must move the snapshot fingerprint")
    assert(SparkEntry.cachedFooterCount(spark, path) == 5L,
      "stale cached count served after a rewrite")
  }

  test("q16 fingerprint: same-file-count rewrite still recounts") {
    // VERDICT r14 #5: the fingerprint used to be a 32-bit hash of the
    // entry list plus a file count — a colliding rewrite with the
    // same file count could serve a stale count. The fingerprint is
    // now the verbatim name:len:mtime list, so ANY rewrite (same file
    // count included) moves it by construction.
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q16_samecount").toString
    val path = s"$dir/t.parquet"
    Seq(1L, 2L, 3L).toDF("x")
      .repartition(1).write.mode("overwrite").parquet(path)
    assert(SparkEntry.cachedFooterCount(spark, path) == 3L)
    val fp1 = SparkEntry.snapshotFingerprint(spark, path)
    // the fingerprint is the full entry list, never a lossy digest
    assert(fp1.contains(":"), fp1)
    assert(fp1.split('|').forall(_.split(':').length == 3), fp1)
    // rewrite with the SAME file count (1 part file) but new content
    Seq(1L, 2L, 3L, 4L).toDF("x")
      .repartition(1).write.mode("overwrite").parquet(path)
    val fp2 = SparkEntry.snapshotFingerprint(spark, path)
    assert(fp1 != fp2,
      "same-file-count rewrite must move the snapshot fingerprint")
    assert(SparkEntry.cachedFooterCount(spark, path) == 4L,
      "stale cached count served after a same-file-count rewrite")
  }
}
