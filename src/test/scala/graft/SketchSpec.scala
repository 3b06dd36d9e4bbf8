package graft

import org.apache.spark.sql.functions._

class SketchSpec extends SparkSuite {

  test("HLL sketch rollup: daily-union estimate matches direct and exact") {
    val ev = Tables.load(spark, sfDir, "events")
    // two-level: per-day sketches unioned per type (the a02 path)
    val unioned = ev
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // one-level: sketch the raw data directly
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, ex) =>
      assert(unioned(t) == direct(t),
        s"$t: union-of-daily must equal direct sketch (mergeability)")
      assert(math.abs(unioned(t) - ex).toDouble / ex < 0.05,
        s"$t: HLL rollup error > 5%: ${unioned(t)} vs $ex")
    }
  }

  test("Misra-Gries: superset guarantee + undercount bound under eviction") {
    import spark.implicits._
    // 5 heavy keys (1000 each) in a 2000-key tail; m=64 forces heavy
    // eviction and 8 partitions force partial merges
    val heavy = (1 to 5).flatMap(i => Seq.fill(1000)(s"h$i"))
    val tail = (1 to 2000).flatMap(i => Seq.fill(3)(f"t$i%04d"))
    val n = heavy.size + tail.size
    val m = 64
    val df = spark.sparkContext.parallelize(heavy ++ tail, 8).toDF("key")
    val summary = df
      .agg(graft.operators.Sketches.mgSummary(col("key"), m).as("s"))
      .select(explode(col("s")).as("c"))
      .select(col("c.key"), col("c.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary.size <= m)
    val bound = n.toDouble / (m + 1)
    (1 to 5).foreach { i =>
      val k = s"h$i"
      assert(summary.contains(k),
        s"heavy key $k (freq 1000 > n/(m+1)=$bound) evicted")
      assert(summary(k) <= 1000L, s"$k overcounted: ${summary(k)}")
      assert(summary(k) >= 1000L - bound,
        s"$k undercount beyond n/(m+1): ${summary(k)}")
    }
  }

  test("Misra-Gries survives >64KB keys through the shuffle (serialization)") {
    import spark.implicits._
    // writeUTF would throw past 65535 modified-UTF-8 bytes; keys are
    // whole column values, so giant keys are a legitimate input
    val bigKey = "x" * 100000
    val df = spark.sparkContext
      .parallelize(Seq.fill(10)(bigKey) ++ Seq("small"), 4).toDF("key")
    val got = graft.operators.Sketches.heavyHitters(df, col("key"), 8, 1)
      .collect()
    assert(got.length == 1 && got.head.getString(0) == bigKey &&
      got.head.getLong(1) == 10L)
  }

  test("heavyHitters: exact top-k despite bounded sketch state") {
    import spark.implicits._
    val heavy = (1 to 5).flatMap(i => Seq.fill(100 * i)(s"h$i"))
    val tail = (1 to 1000).flatMap(i => Seq.fill(2)(f"t$i%04d"))
    val df = spark.sparkContext.parallelize(heavy ++ tail, 8).toDF("key")
    val got = graft.operators.Sketches.heavyHitters(df, col("key"), 64, 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == List("h5" -> 500L, "h4" -> 400L, "h3" -> 300L,
      "h2" -> 200L, "h1" -> 100L))
  }

  test("KMV: exact below k; estimates within 15% under real sketching") {
    import spark.implicits._
    import graft.operators.Sketches
    // A = 1..10000, B = 5001..15000: |A∩B|=5000, |A∪B|=15000, J=1/3
    val rows = (1 to 10000).map(i => ("A", i.toLong)) ++
      (5001 to 15000).map(i => ("B", i.toLong))
    val k = 512
    val sk = spark.sparkContext.parallelize(rows, 8).toDF("s", "v")
      .select(col("s"), xxhash64(col("v")).as("h"))
      .groupBy("s").agg(Sketches.kmvSketch(col("h"), k).as("sk"))
    val wide = sk.groupBy().pivot("s").agg(first(col("sk")))
    val est = wide.select(
      Sketches.kmvEstimate(col("A"), k).as("ea"),
      Sketches.kmvEstimate(col("B"), k).as("eb"),
      Sketches.kmvJaccard(col("A"), col("B"), k).as("j"),
      Sketches.kmvIntersect(col("A"), col("B"), k).as("i")).head
    assert(math.abs(est.getDouble(0) - 10000) / 10000 < 0.15,
      s"card A: ${est.getDouble(0)}")
    assert(math.abs(est.getDouble(1) - 10000) / 10000 < 0.15,
      s"card B: ${est.getDouble(1)}")
    assert(math.abs(est.getDouble(2) - 1.0 / 3) < 0.07,
      s"jaccard: ${est.getDouble(2)}")
    assert(math.abs(est.getDouble(3) - 5000) / 5000 < 0.25,
      s"intersection: ${est.getDouble(3)}")
    // exact regime: cardinality < k ⇒ estimate is the exact count
    val small = (1 to 100).map(i => ("S", i.toLong))
    val s2 = small.toDF("s", "v")
      .select(col("s"), xxhash64(col("v")).as("h"))
      .groupBy("s").agg(Sketches.kmvSketch(col("h"), k).as("sk"))
      .select(Sketches.kmvEstimate(col("sk"), k).as("e")).head
    assert(s2.getDouble(0) == 100.0)
  }

  test("GK sketch: merged per-day sketches hit exact percentiles within bound") {
    import graft.operators.Sketches
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("value").cast("double").as("v"))
    val merged = ev
      .groupBy("event_type", "day")
      .agg(Sketches.gkSketch(col("v")).as("sk"))
      .groupBy("event_type")
      .agg(Sketches.gkMerge(col("sk")).as("msk"))
      .select(col("event_type"),
        Sketches.gkQuantiles(col("msk"), Seq(0.5, 0.99)).as("q"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // GK guarantees RANK error (<= 2*eps after merge), NOT value
    // error — events.value is heavy-tailed, so p99's value error is
    // unbounded. Check the empirical rank of each estimate instead:
    // fraction of values <= estimate must sit within the target
    // percentile ± (2*eps + slack), eps = 0.01.
    merged.foreach { case (t, ests) =>
      Seq(0.5, 0.99).zip(ests).foreach { case (target, est) =>
        val rank = ev.filter(col("event_type") === t)
          .agg(avg((col("v") <= est).cast("double")).as("r"))
          .head.getDouble(0)
        assert(math.abs(rank - target) <= 0.03,
          s"$t p$target: estimate $est sits at empirical rank $rank")
      }
    }
  }

  test("GK sketch: merge of splits equals-ish one-shot; serde round-trips") {
    import spark.implicits._
    import graft.operators.Sketches
    val xs = (1 to 10000).map(_.toDouble)
    // one-shot sketch over all values
    val whole = xs.toDF("v")
      .agg(Sketches.gkSketch(col("v")).as("sk"))
      .select(Sketches.gkQuantiles(col("sk"), Seq(0.25, 0.5, 0.75)).as("q"))
      .head.getSeq[Double](0)
    // 10 stored split sketches, merged via the binary column
    val split = xs.zipWithIndex.map { case (v, i) => (i % 10, v) }
      .toDF("part", "v")
      .groupBy("part").agg(Sketches.gkSketch(col("v")).as("sk"))
      .agg(Sketches.gkMerge(col("sk")).as("msk"))
      .select(Sketches.gkQuantiles(col("msk"), Seq(0.25, 0.5, 0.75)).as("q"))
      .head.getSeq[Double](0)
    whole.zip(split).zip(Seq(2500.0, 5000.0, 7500.0)).foreach {
      case ((w, s), truth) =>
        // both within 2*eps rank error of truth (eps=0.01 → ±200 ranks)
        assert(math.abs(w - truth) <= 200, s"one-shot $w vs $truth")
        assert(math.abs(s - truth) <= 200, s"merged $s vs $truth")
    }
  }

  test("bloom rollup: merged filters = one-shot bytes; no false negatives; FPR bounded") {
    import graft.operators.Sketches
    import org.apache.spark.util.sketch.BloomFilter
    val items = 4096L
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id").cast("long").as("u"),
        date_trunc("day", col("ts")).as("day"))
    // merged per-day filters must be BYTE-identical to one filter
    // built over all days (merge is bitwise OR over the same layout)
    val mergedBytes = ev.groupBy("day")
      .agg(Sketches.bloomSketch(col("u"), items).as("bf"))
      .agg(Sketches.bloomMerge(col("bf"), items).as("m"))
      .head.getAs[Array[Byte]](0)
    val oneShotBytes = ev
      .agg(Sketches.bloomSketch(col("u"), items).as("bf"))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(mergedBytes, oneShotBytes),
      "merged per-day filters differ from the one-shot build")
    val bf = BloomFilter.readFrom(mergedBytes)
    // no false negatives: every truly active user must probe true
    val actives = ev.select("u").distinct().collect().map(_.getLong(0))
    actives.foreach(u => assert(bf.mightContainLong(u),
      s"false negative for active user $u"))
    // FPR: non-members flagged at roughly the configured 1%
    val nonMembers = (1000000L until 1010000L).filterNot(actives.toSet)
    val fp = nonMembers.count(bf.mightContainLong).toDouble / nonMembers.size
    info(s"bloom FPR on ${nonMembers.size} non-members = $fp")
    assert(fp <= 0.05, s"FPR too high: $fp")
  }

  test("CMS rollup: merged = one-shot bytes; never undercounts; error bounded") {
    import graft.operators.Sketches
    import org.apache.spark.util.sketch.CountMinSketch
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id").cast("long").as("u"),
        date_trunc("day", col("ts")).as("day"))
    // counter linearity: merged per-day sketches must serialize
    // byte-identically to one sketch built over all days
    val mergedBytes = ev.groupBy("day")
      .agg(Sketches.cmsSketch(col("u")).as("cms"))
      .agg(Sketches.cmsMerge(col("cms")).as("m"))
      .head.getAs[Array[Byte]](0)
    val oneShotBytes = ev
      .agg(Sketches.cmsSketch(col("u")).as("cms"))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(mergedBytes, oneShotBytes),
      "merged per-day sketches differ from the one-shot build")
    val cms = CountMinSketch.readFrom(mergedBytes)
    val exact = ev.groupBy("u").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    exact.foreach { case (u, n) =>
      val est = cms.estimateCount(java.lang.Long.valueOf(u))
      assert(est >= n, s"CMS undercounted user $u: $est < $n")
      // eps = 0.001 → overestimate ≤ eps·N whp; 3× slack for the tail
      assert(est - n <= math.max(3, 0.003 * total),
        s"CMS overestimate too large for $u: $est vs $n (N=$total)")
    }
  }

  test("sketches reject non-positive state sizes at construction") {
    // k=0 / m=0 used to surface as a NoSuchElementException deep in an
    // executor task (buf.last on an empty TreeSet); fail fast instead
    import org.apache.spark.sql.GraftBridge.{expression => ex}
    intercept[IllegalArgumentException] {
      graft.plans.KmvSketch(ex(lit(1L)), 0)
    }
    intercept[IllegalArgumentException] {
      graft.plans.MisraGries(ex(lit("x")), 0)
    }
    intercept[IllegalArgumentException] { new graft.plans.MGSummary(-1) }
  }

  test("approx sketches land near exact values") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val rows = li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_p50"),
        percentile(col("l_extendedprice"), lit(0.5)).as("exact_p50"))
      .collect()
    rows.foreach { r =>
      val (ap, ep) = (r.getAs[Long]("approx_parts"), r.getAs[Long]("exact_parts"))
      assert(math.abs(ap - ep).toDouble / ep < 0.05,
        s"HLL error > 5%: $ap vs $ep")
      val (aq, eq) = (r.getAs[Double]("approx_p50"), r.getAs[Double]("exact_p50"))
      assert(math.abs(aq - eq) / eq < 0.05, s"quantile error > 5%: $aq vs $eq")
    }
  }
}
