package graft

import org.apache.spark.sql.functions._
import graft.operators.Percentiles

class PercentilesSpec extends SparkSuite {
  import spark.implicits._

  // deterministic pseudo-random values, 3 groups of different sizes
  private lazy val data = (1 to 3).flatMap { grp =>
    val rnd = new scala.util.Random(1000 + grp)
    (0 until grp * 137).map(_ => (s"g$grp", rnd.nextDouble() * 1000))
  }.toDF("grp", "v")

  /** Type-7 reference computed on the driver. */
  private def expected(vals: Array[Double], p: Double): Double = {
    val s = vals.sorted
    val pos = (s.length - 1) * p
    val lo = s(math.floor(pos).toInt)
    val hi = s(math.ceil(pos).toInt)
    lo + (hi - lo) * (pos - math.floor(pos))
  }

  test("exactByGroup matches driver-side type-7 quantiles") {
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val got = Percentiles.exactByGroup(data, "grp", "v", ps)
      .collect().map(r => r.getString(0) -> r).toMap
    val byGroup = data.collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    for (grp <- byGroup.keys; (p, i) <- ps.zipWithIndex) {
      val want = expected(byGroup(grp), p)
      val have = got(grp).getDouble(1 + i)
      assert(math.abs(have - want) < 1e-9,
        s"$grp p=$p: got $have want $want")
    }
  }

  test("exactByGroup ignores NULL values") {
    val withNulls = data.select(col("grp"),
      when(col("v") < 100, lit(null)).otherwise(col("v")).as("v"))
    val got = Percentiles.exactByGroup(withNulls, "grp", "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val byGroup = withNulls.collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.filterNot(_.isNullAt(1)).map(_.getDouble(1))).toMap
    for (grp <- byGroup.keys)
      assert(math.abs(got(grp) - expected(byGroup(grp), 0.5)) < 1e-9)
  }

  test("a NULL group key is a group like any other") {
    val withNullGrp = data.select(
      when(col("grp") === "g2", lit(null)).otherwise(col("grp")).as("grp"),
      col("v"))
    val got = Percentiles.exactByGroup(withNullGrp, "grp", "v", Seq(0.5))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(Some("g1"), Some("g3"), None),
      s"expected a row for the NULL group, got ${got.keySet}")
    val byGroup = data.collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    assert(math.abs(got(None) - expected(byGroup("g2"), 0.5)) < 1e-9)
    assert(math.abs(got(Some("g1")) - expected(byGroup("g1"), 0.5)) < 1e-9)
  }

  test("explicit numBuckets exercises the multi-bucket path on small groups") {
    val got = Percentiles.exactByGroup(data, "grp", "v", Seq(0.25, 0.75),
        numBuckets = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    val byGroup = data.collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    for (grp <- byGroup.keys; (p, i) <- Seq(0.25, 0.75).zipWithIndex)
      assert(math.abs(got(grp).getDouble(1 + i) - expected(byGroup(grp), p))
        < 1e-9, s"$grp p=$p")
  }

  test("heavy ties: duplicate values collapse boundaries without losing ranks") {
    // 80% of values are one of 3 ties -> approx boundaries repeat and
    // many buckets are empty; exact ranks must be unaffected
    val tied = (1 to 2).flatMap { grp =>
      val rnd = new scala.util.Random(77 + grp)
      (0 until 500).map { i =>
        val v = if (i % 5 != 0) Seq(10.0, 20.0, 30.0)(i % 3)
                else rnd.nextDouble() * 100
        (s"g$grp", v)
      }
    }.toDF("grp", "v")
    val ps = Seq(0.1, 0.5, 0.9)
    val got = Percentiles.exactByGroup(tied, "grp", "v", ps, numBuckets = 16)
      .collect().map(r => r.getString(0) -> r).toMap
    val byGroup = tied.collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    for (grp <- byGroup.keys; (p, i) <- ps.zipWithIndex)
      assert(math.abs(got(grp).getDouble(1 + i) - expected(byGroup(grp), p))
        < 1e-9, s"$grp p=$p")
  }

  test("NaN values bucket and rank consistently (Spark NaN-largest order)") {
    // LowerBound must compare with Spark SQL double ordering: under
    // raw Java `<`, boundary < NaN is false, so NaN lands in bucket 0
    // yet ranks last in the window -> corrupt interpolation. With the
    // ordering aligned, NaN ranks last globally: p50 of [1,2,3,NaN]
    // is 2.5 and p100 is the NaN max.
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", Double.NaN))
      .toDF("grp", "v")
    val got = Percentiles.exactByGroup(df, "grp", "v", Seq(0.5, 1.0),
      numBuckets = 2).head()
    assert(math.abs(got.getDouble(1) - 2.5) < 1e-9,
      s"p50 over [1,2,3,NaN] must interpolate 2..3 = 2.5: $got")
    assert(got.getDouble(2).isNaN, s"p100 should be the NaN max: $got")
  }

  test("whole-table exact() matches the grouped form on one group") {
    val got = Percentiles.exact(data, "v", Seq(0.5, 0.95)).head
    val all = data.collect().map(_.getDouble(1))
    assert(math.abs(got.getDouble(0) - expected(all, 0.5)) < 1e-9)
    assert(math.abs(got.getDouble(1) - expected(all, 0.95)) < 1e-9)
  }

  test("bucketed path's ranking window partitions on (group, bucket)," +
      " never group alone") {
    // explicit numBuckets pins the bucketed machinery (the default
    // path routes these small groups to the direct per-group rank,
    // where a group-only window is bounded BY the <= 64k routing)
    val plan = Percentiles.exactByGroup(data, "grp", "v", Seq(0.5, 0.9),
        numBuckets = 4)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    val rankWindows = windows.filter(
      _.windowExpressions.exists(_.toString.contains("row_number")))
    assert(rankWindows.nonEmpty, "expected a row_number ranking window")
    rankWindows.foreach { w =>
      assert(w.partitionSpec.length >= 2 &&
        w.partitionSpec.exists(_.toString.contains("__bkt")),
        s"ranking window must partition on (group, __bkt), " +
          s"got ${w.partitionSpec.mkString(", ")} — a group-only partition " +
          "sorts the whole group in one task")
    }
  }

  test("high-cardinality regime: 10^6 groups run on the direct path " +
      "with zero boundary collects, exact values") {
    // 10^6 tiny groups — the regime where uniform bucket sizing
    // degraded to buckets=2 and the boundary collect approached its
    // budget cap; now no group exceeds one task so NO boundary
    // machinery runs at all (no __bkt window in the plan)
    val big = spark.range(0, 2000000L)
      .select((col("id") % 1000000L).as("grp"),
        ((col("id") * 2654435761L) % 10007L).cast("double").as("v"))
    val out = Percentiles.exactByGroup(big, "grp", "v", Seq(0.5))
    val plan = out.queryExecution.optimizedPlan
    val hasBucketWindow = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.exists(_.toString.contains("__bkt")) => w
    }.nonEmpty
    assert(!hasBucketWindow,
      "all-small groups must skip the boundary machinery")
    // spot-check exactness for a handful of groups against the
    // driver-side type-7 reference
    val sample = out.filter(col("grp").isin(0L, 1L, 999999L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = big.filter(col("grp").isin(0L, 1L, 999999L))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getDouble(1))).toMap
    for ((grp, vals) <- ref)
      assert(math.abs(sample(grp) - expected(vals, 0.5)) < 1e-9,
        s"group $grp")
  }

  test("fused few-group path (maxGroupsHint) equals the general path " +
      "on mixed sizes, NULL groups and ties") {
    val bigGroup = spark.range(0, 70000L)
      .select(lit("huge").as("grp"),
        ((col("id") * 2654435761L) % 100003L).cast("double").as("v"))
    val tied = (0 until 400).map(i => ("t", Seq(1.0, 2.0, 3.0)(i % 3)))
      .toDF("grp", "v")
    val mixed = data
      .select(when(col("grp") === "g2", lit(null)).otherwise(col("grp"))
        .as("grp"), col("v"))
      .unionByName(bigGroup).unionByName(tied)
    val ps = Seq(0.1, 0.5, 0.99)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => Option(r.getString(0)) ->
        (1 to ps.size).map(r.getDouble).toSeq).toMap
    val fused = toMap(Percentiles.exactByGroup(mixed, "grp", "v", ps,
      maxGroupsHint = 16))
    val general = toMap(Percentiles.exactByGroup(mixed, "grp", "v", ps))
    assert(fused.keySet == general.keySet)
    for (k <- fused.keySet; i <- ps.indices)
      assert(math.abs(fused(k)(i) - general(k)(i)) < 1e-9,
        s"group $k p=${ps(i)}")
  }

  test("a too-small maxGroupsHint falls back to the general path " +
      "with identical values") {
    val ps = Seq(0.25, 0.75)
    // data has 3 groups; hint of 1 is wrong and must fall back
    val hinted = Percentiles.exactByGroup(data, "grp", "v", ps,
        maxGroupsHint = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(hinted.keySet == Set("g1", "g2", "g3"),
      s"fallback must still produce every group: ${hinted.keySet}")
    val byGroup = data.collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    for (grp <- byGroup.keys; (p, i) <- ps.zipWithIndex)
      assert(math.abs(hinted(grp).getDouble(1 + i) -
        expected(byGroup(grp), p)) < 1e-9, s"$grp p=$p")
  }

  test("fused path answers by windowed selection — no ranking window " +
      "operator in the plan, values exact") {
    val bigGroup = spark.range(0, 200000L)
      .select(lit("huge").as("grp"),
        ((col("id") * 2654435761L) % 100003L).cast("double").as("v"))
    val mixed = data.unionByName(bigGroup)
    val out = Percentiles.exactByGroup(mixed, "grp", "v", Seq(0.5),
      maxGroupsHint = 8)
    // plan shape (r13): the sketch-windowed selection finishes on the
    // driver — the result plan has NO window rank at all (the old
    // pass-3 window is gone from the fast path)
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty,
      "windowed selection must not plan a ranking window")
    // values: exact for both regimes
    val got = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = mixed.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1))).toMap
    for ((grp, vals) <- ref)
      assert(math.abs(got(grp) - expected(vals, 0.5)) < 1e-9, s"$grp")
  }

  test("fused path over budget falls back to bucketed refinement: big " +
      "group multi-bucket, small group one bucket, same values") {
    val bigGroup = spark.range(0, 200000L)
      .select(lit("huge").as("grp"),
        ((col("id") * 2654435761L) % 100003L).cast("double").as("v"))
    val mixed = data.unionByName(bigGroup)
    val saved = Percentiles.MaxCandidateRows
    try {
      Percentiles.MaxCandidateRows = 64 // force the budget miss
      val out = Percentiles.exactByGroup(mixed, "grp", "v", Seq(0.5),
        maxGroupsHint = 8)
      // plan shape: the ranking window partitions on (group, __bkt) —
      // the big group's sort is bucket-bounded, never whole-group
      val windows = out.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.windowExpressions.exists(_.toString.contains("row_number"))
          => w
      }
      assert(windows.nonEmpty &&
        windows.forall(_.partitionSpec.exists(_.toString.contains("__bkt"))),
        "bucketed fallback must rank within (group, __bkt)")
      val got = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val ref = mixed.collect().groupBy(_.getString(0))
        .view.mapValues(_.map(_.getDouble(1))).toMap
      for ((grp, vals) <- ref)
        assert(math.abs(got(grp) - expected(vals, 0.5)) < 1e-9, s"$grp")
    } finally Percentiles.MaxCandidateRows = saved
  }

  test("mixed small/big groups: both paths run and agree with the " +
      "all-bucketed form") {
    // one group bigger than a pass-3 task (forces the bucketed path)
    // beside small groups (direct path); union must equal the
    // explicit-numBuckets single-path run row for row
    val bigGroup = spark.range(0, 70000L)
      .select(lit("huge").as("grp"),
        ((col("id") * 2654435761L) % 100003L).cast("double").as("v"))
    val mixed = data.unionByName(bigGroup)
    val ps = Seq(0.1, 0.5, 0.99)
    val adaptive = Percentiles.exactByGroup(mixed, "grp", "v", ps)
      .collect().map(r => r.getString(0) ->
        (1 to ps.size).map(r.getDouble).toSeq).toMap
    val pinned = Percentiles.exactByGroup(mixed, "grp", "v", ps,
        numBuckets = 8)
      .collect().map(r => r.getString(0) ->
        (1 to ps.size).map(r.getDouble).toSeq).toMap
    assert(adaptive.keySet == pinned.keySet)
    for (k <- adaptive.keySet; i <- ps.indices)
      assert(math.abs(adaptive(k)(i) - pinned(k)(i)) < 1e-9,
        s"group $k p=${ps(i)}")
  }

  test("single-scan path (totalRowsHint) is BIT-identical to the " +
      "probe paths on mixed sizes, NULL groups, ties and nulls") {
    val tied = (0 until 400).map(i => ("t", Seq(1.0, 2.0, 3.0)(i % 3)))
      .toDF("grp", "v")
    val mixed = data
      .select(when(col("grp") === "g2", lit(null)).otherwise(col("grp"))
        .as("grp"),
        when(col("v") < 50, lit(null)).otherwise(col("v")).as("v"))
      .unionByName(tied)
    val ps = Seq(0.0, 0.1, 0.5, 0.99, 1.0)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => Option(r.getString(0)) ->
        (1 to ps.size).map(r.getDouble).toSeq).toMap
    val n = mixed.count()
    val single = Percentiles.exactByGroup(mixed, "grp", "v", ps,
      maxGroupsHint = 16, totalRowsHint = n)
    // plan shape: ONE aggregate, no window, result is a driver-built
    // frame (the single aggregation job already happened)
    assert(single.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty)
    val got = toMap(single)
    val probed = toMap(Percentiles.exactByGroup(mixed, "grp", "v", ps,
      maxGroupsHint = 16))
    assert(got.keySet == probed.keySet)
    for (k <- got.keySet; i <- ps.indices)
      assert(got(k)(i) == probed(k)(i),
        s"group $k p=${ps(i)}: single ${got(k)(i)} probe ${probed(k)(i)}")
  }

  test("single-scan path declines when the row bound exceeds its gate " +
      "or the group hint is exceeded — values identical either way") {
    val ps = Seq(0.5, 0.9)
    val byGroup = data.collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    // row bound over the gate: probe path must serve the call
    val prev = Percentiles.MaxSingleScanRows
    try {
      Percentiles.MaxSingleScanRows = 10L
      val over = Percentiles.exactByGroup(data, "grp", "v", ps,
          maxGroupsHint = 16, totalRowsHint = data.count())
        .collect().map(r => r.getString(0) -> r).toMap
      for (grp <- byGroup.keys; (p, i) <- ps.zipWithIndex)
        assert(math.abs(over(grp).getDouble(1 + i) -
          expected(byGroup(grp), p)) < 1e-9, s"$grp p=$p (gate)")
    } finally Percentiles.MaxSingleScanRows = prev
    // group hint too small: single-scan collects hint+1 groups and
    // falls back
    val fb = Percentiles.exactByGroup(data, "grp", "v", ps,
        maxGroupsHint = 1, totalRowsHint = data.count())
      .collect().map(r => r.getString(0) -> r).toMap
    assert(fb.keySet == Set("g1", "g2", "g3"))
    for (grp <- byGroup.keys; (p, i) <- ps.zipWithIndex)
      assert(math.abs(fb(grp).getDouble(1 + i) -
        expected(byGroup(grp), p)) < 1e-9, s"$grp p=$p (hint)")
  }
}
