package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import org.apache.spark.sql.GraftBridge
import graft.plans.LowerBound

/** Exact interpolated percentiles per group (quantile_cont / type-7
  * semantics: pos = (n-1)·p, result = lower + (upper-lower)·frac) via
  * distributed order statistics — no per-group single-task sort.
  *
  * Plan shape — four bounded passes, each a single Spark job; all
  * driver-side state is capped by fixed budgets:
  *
  *  0. '''Sizing''': max group size and group count from one
  *     column-pruned scan, reduced to ONE driver row. The bucket
  *     count derives from these: enough buckets to bound the
  *     per-bucket sort (~64k rows), never more than a global boundary
  *     budget spread across the observed groups — so production
  *     shuffle-partition counts no longer inflate the cut list (the
  *     round-3 mistake this rewrite fixes).
  *  1. '''Boundaries''': per-group approximate quantiles
  *     (`percentile_approx`, LOW accuracy — boundaries only balance
  *     load, they never affect values) split each group's range into
  *     `buckets` buckets. The boundary table (|groups| ×
  *     (buckets−1) doubles, ≤ the 2^20 global budget ≈ 8 MB) is
  *     collected and re-created as a driver-backed broadcast so
  *     bucket assignment is byte-identical across later passes.
  *  2. '''Counts''': per-(group, bucket) counts — ≤ |groups|·buckets
  *     rows, same budget — collected; cumulative offsets, group
  *     totals n and the ≤ 2·|ps| buckets per group containing a
  *     target rank floor((n-1)p)+1 / ceil((n-1)p)+1 are computed on
  *     the driver and re-broadcast. (Driver compute replaces a
  *     window-over-tiny-table + self-join subtree: one fewer
  *     broadcast-exchange job, measurably faster.)
  *  3. '''Boundary rows''': the data is re-scanned, filtered to the
  *     needed buckets via the broadcast (each ~n/buckets rows),
  *     ranked locally within (group, bucket) — a hash-partitioned
  *     window over bounded partitions — and offset-shifted to exact
  *     global ranks. Only the two boundary rows per
  *     (group, percentile) reach the final one-row-per-group
  *     aggregate.
  *
  * Spark's built-in `percentile` aggregate buffers a value→count map
  * per group and a single `Window.partitionBy(group).orderBy(value)`
  * sorts each whole group in one task; both collapse at corpus scale.
  * Here the largest sort is one bucket, bucket assignment is an
  * O(log buckets) codegen'd binary search ([[graft.plans.LowerBound]]),
  * and skew in a hot bucket is bounded by the boundary resolution of
  * pass 1.
  *
  * Bucketing changes only load balance, never values: any boundary
  * placement yields the same exact ranks, so results are bit-identical
  * to the single-sort form.
  *
  * Determinism requirement: passes 2 and 3 re-evaluate the input, so
  * `df` must be deterministic (boundaries and offsets are pinned on
  * the driver, but the pass-3 rows must be the rows pass 2 counted).
  * For a non-deterministic source (rand()/sample/changing files),
  * persist or checkpoint it first — deliberately the caller's choice:
  * at corpus scale a column-pruned re-scan is usually cheaper than
  * caching a projected copy of the data.
  *
  * NULL handling: NULL values are excluded (quantile_cont semantics);
  * a NULL group key is a group like any other — both distributed
  * joins against driver-pinned tables are null-safe (`<=>`).
  */
object Percentiles {

  /** Per-bucket row target: buckets scale with the largest group so a
    * pass-3 bucket sort stays ~64k rows until the cap is hit. */
  private val TargetRowsPerBucket = 1L << 16

  /** Global boundary/count budget: |groups|·buckets never exceeds
    * this, so driver collects and broadcasts stay ≤ ~8 MB no matter
    * how many groups the data has. */
  private val MaxTotalBoundaries = 1L << 20

  /** Per-group bucket ceiling (keeps pass 1's quantile cut list and
    * the per-row binary search shallow even for one colossal group:
    * 4096 buckets ⇒ a 256M-row group still sorts ≤ 64k per task). */
  private val MaxBucketsPerGroup = 4096L

  /** Whole-table exact percentiles (no grouping): one output row with
    * a column per requested percentile. Same distributed order
    * statistics as [[exactByGroup]] over a single constant group. */
  def exact(
      df: DataFrame,
      valueCol: String,
      ps: Seq[Double],
      numBuckets: Int = -1,
      totalRowsHint: Long = -1L): DataFrame =
    exactByGroup(
      df.select(lit(0).as("__all"), col(valueCol)),
      "__all", valueCol, ps, numBuckets,
      // the group column is a literal: exactly one group, so the
      // fused single-sizing-job path is always safe here
      maxGroupsHint = 1, totalRowsHint = totalRowsHint).drop("__all")

  /** Probe resolution of the fused few-group path: one fixed
    * 127-cut approximate-quantile sketch doubles as sizing AND
    * boundary source, merging the old passes 0 and 1 into one job.
    * Boundary fractions i/B are snapped to the nearest probe cut —
    * only load balance moves (by ≤ n/256 rows per boundary), never
    * values. */
  private val ProbeCuts = 128

  /** Ceiling on `maxGroupsHint`: the fused path collects one row per
    * group (key + 127 doubles ≈ 1 KB), so the driver table stays
    * ≤ ~8 MB — the same budget the boundary table honors. */
  val MaxHintGroups = 8192

  /** Row gate of the single-scan path: collecting the full per-group
    * sorted value arrays is ≤ 2²³ doubles ≈ 64 MB primitive payload —
    * bounded driver state in the same spirit as the ExactDistinct
    * fast path's 2²⁴-row gate. Above it, the probe-based machinery
    * (2 scans, O(n/32) candidate collect) takes over. Mutable ONLY so
    * PercentilesSpec can force the fallback without 8M-row fixtures;
    * production never writes it. */
  private[graft] var MaxSingleScanRows = 1L << 23

  /** One output row per group: a column per requested percentile,
    * named p50/p90/... from the fraction.
    *
    * @param numBuckets range buckets per group; -1 (default) sizes
    *   from the data: ceil(maxGroupRows / 64k), clamped to [2, 4096]
    *   and to the global boundary budget divided by the group count.
    * @param maxGroupsHint caller's upper bound on the group-column
    *   cardinality (≤ [[MaxHintGroups]]); any positive value enables
    *   the fused few-group path — one sizing+boundary job instead of
    *   two, per-group bucket counts instead of one uniform count. A
    *   hint that turns out too small falls back to the general path
    *   (same values either way); -1 (default) = unknown/unbounded.
    * @param totalRowsHint caller's upper bound on df's ROW count (a
    *   parquet footer count, or the row count of the table the frame
    *   derives from). When both hints are present and the bound fits
    *   [[MaxSingleScanRows]], the r14 SINGLE-SCAN path runs: ONE
    *   aggregation job collects each group's exact sorted values
    *   (sort_array(collect_list)) and the driver reads the type-7
    *   order statistics off them directly — one scan, no probe, no
    *   second pass, values identical by construction. A bound that is
    *   too small is the caller's bug ONLY if it under-reports
    *   (the gate may then admit an over-budget collect); bounds come
    *   from footers, which are exact. -1 (default) = unknown. */
  def exactByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double],
      numBuckets: Int = -1,
      maxGroupsHint: Int = -1,
      totalRowsHint: Long = -1L): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"percentile fractions must be in [0,1]: $ps")
    require(ps.map(tag).distinct.size == ps.size,
      s"duplicate percentile fractions: $ps")
    require(maxGroupsHint <= MaxHintGroups,
      s"maxGroupsHint must be <= $MaxHintGroups (driver-table budget); " +
        s"omit the hint for high-cardinality group columns")
    val spark = df.sparkSession
    val g = col(groupCol)
    val v = col(valueCol)
    // NULL values are excluded before ranking (quantile_cont ignores
    // them; ranking them would shift every cut position)
    val allVals = df.select(g, v).filter(v.isNotNull)

    // SINGLE-SCAN PATH (r14): both cardinalities bounded and small —
    // ONE aggregation job returns each group's exact sorted value
    // array; the driver indexes the two boundary order statistics per
    // percentile and interpolates (same type-7 arithmetic as
    // finishRanked). The collect is ≤ totalRowsHint doubles — at the
    // 2²³-row gate that is 64 MB of PRIMITIVE payload, but the
    // driver-side Row materialization boxes them (java.lang.Double +
    // Seq wrappers, ~3-4× the primitive bytes), so real peak heap at
    // the gate is ~200-300 MB transient; the gate is sized against a
    // multi-GB driver, and the executor-side aggregation buffers see
    // the same boxing one GROUP at a time (bounded by the largest
    // group, not the corpus). The per-group sort runs executor-side
    // in sort_array. A hint the data outgrows falls back to the probe
    // paths below — same values either way: more groups than promised
    // are caught by the limit() probe, and more ROWS than promised
    // (an under-reporting totalRowsHint — hints come from parquet
    // footers, so this means a caller bug) are caught post-collect by
    // re-summing the group counts, so a dishonest bound degrades to
    // the distributed path instead of silently trusting the caller.
    if (numBuckets <= 1 && maxGroupsHint > 0 && totalRowsHint > 0 &&
        totalRowsHint <= MaxSingleScanRows) {
      val rows = allVals.groupBy(g.as("__g"))
        .agg(count(lit(1)).as("__gn"),
          sort_array(collect_list(v.cast("double"))).as("__vals"))
        .limit(maxGroupsHint + 1).collect()
      if (rows.length <= maxGroupsHint &&
          rows.map(_.getLong(1)).sum <= totalRowsHint) {
        val outRows = rows.toSeq.map { r =>
          val n = r.getLong(1)
          val vals = r.getSeq[Double](2)
          val pvals = ps.map { p =>
            val pos = (n - 1) * p
            val lo = vals(math.floor(pos).toInt)
            val hi = vals(math.ceil(pos).toInt)
            Double.box(lo + (hi - lo) * (pos - math.floor(pos)))
          }
          Row.fromSeq(r.get(0) +: pvals)
        }
        val outSchema = StructType(df.schema(groupCol) +:
          ps.map(p => StructField("p" + tag(p),
            org.apache.spark.sql.types.DoubleType)))
        return spark.createDataFrame(
          spark.sparkContext.parallelize(outRows, 1), outSchema)
      }
      // hint exceeded: fall through to the probe-based paths
    }

    // FEW-GROUP FUSED PATH: when the caller bounds the group
    // cardinality (an upper bound is enough — a wrong hint only
    // falls back), ONE aggregation job answers sizing AND boundary
    // placement: per group, the exact count plus a fixed-resolution
    // approximate-quantile probe. From the probe, TWO finishes:
    //
    //  - '''Sketch-windowed selection''' (r13, the common case): the
    //    probe's deterministic rank guarantee (GK summaries, rank
    //    error ≤ εn with ε = 1/accuracy) brackets every target rank
    //    inside a value window [vlo, vhi] a couple of probe cuts
    //    wide. ONE more scan then answers everything exactly: per
    //    (group, window) the exact `count(v < vlo)` and the actual
    //    window rows (collect_list — ~n/32 rows, budget-checked
    //    BEFORE launching, duplicate runs widened from the probe
    //    itself). The driver sorts each window (≤ a few hundred k
    //    doubles) and reads the target order statistic at position
    //    rank − below. Two scans total, no shuffle of data rows, no
    //    window sort. A post-hoc validity check (target position
    //    inside the collected window) re-runs the bucketed path if
    //    the sketch ever under-delivered, so correctness NEVER rests
    //    on the sketch guarantee.
    //  - '''Bucketed refinement''' (fallback): the r12 shape — the
    //    driver subsets the probe cuts as per-group bucket
    //    boundaries and passes 2-3 rank only the buckets containing
    //    a target. Taken when a window would blow the candidate
    //    budget: colossal groups (window ~n/32 only fits the driver
    //    for n ≲ 2²⁶) or duplicate-heavy data. This is the same
    //    multi-round selection machine, just with one more round —
    //    the 100 TB regime by design.
    if (numBuckets <= 1 && maxGroupsHint > 0) {
      val fr = (1 until ProbeCuts).map(i => lit(i.toDouble / ProbeCuts))
      val statsRows = allVals.groupBy(g.as("__g"))
        .agg(count(lit(1)).as("__gn"),
          percentile_approx(v.cast("double"), array(fr: _*), lit(256))
            .as("__pb"))
        .limit(maxGroupsHint + 1).collect()
      if (statsRows.length <= maxGroupsHint) {
        windowedSelect(spark, allVals, df.schema(groupCol), g, v, ps,
          statsRows) match {
          case Some(out) => return out
          case None => // budget/validity miss: bucketed refinement
        }
        val perGroupCap = math.max(2L,
          MaxTotalBoundaries / math.max(1, statsRows.length))
        val bndRows = statsRows.map { r =>
          val n = r.getLong(1)
          val probe = r.getSeq[Double](2)
          val want = (n + TargetRowsPerBucket - 1) / TargetRowsPerBucket
          val bg = math.min(math.min(ProbeCuts.toLong, perGroupCap),
            math.min(MaxBucketsPerGroup, math.max(1L, want))).toInt
          // boundary i/bg → nearest probe cut j/ProbeCuts; distinct
          // (colliding snaps just merge two buckets) and clamped to
          // the probe's interior cuts
          val idx = (1 until bg).map { i =>
            math.min(ProbeCuts - 1,
              math.max(1, math.round(ProbeCuts.toDouble * i / bg).toInt))
          }.distinct
          Row(r.get(0), idx.map(j => probe(j - 1)).toArray.toSeq)
        }.toSeq
        val bndSchema = StructType(Seq(
          StructField("__g", df.schema(groupCol).dataType),
          StructField("__bnds", org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType))))
        val bnds = broadcast(spark.createDataFrame(
          spark.sparkContext.parallelize(bndRows, 1), bndSchema))
        return bucketedFrom(spark, allVals, g, v, ps, bnds)
      }
      // hint exceeded: the group column is higher-cardinality than
      // the caller believed — fall through to the general path,
      // whose budgets do not depend on the hint
    }

    // HIGH-CARDINALITY REGIME (round 12): a group whose rows fit one
    // pass-3 task (n_g <= TargetRowsPerBucket) needs NO boundary
    // machinery — a per-group window rank IS its exact order
    // statistics, with zero driver state. Routing those directly
    // means only genuinely-big groups consume the boundary budget:
    // a million-group corpus of small groups (the regime where the
    // old uniform-bucket sizing degraded to buckets=2 and the budget
    // collect approached its 8 MB cap) now runs entirely on the
    // direct path, and the budget divides among the few groups that
    // are actually larger than a task (at most n / 64k of them, by
    // counting). The degraded regime now requires > 512k groups EACH
    // > 64k rows — n > 3·10^10 rows of uniformly huge groups — and
    // still only costs skewed bucket sorts, never wrong values
    // (SCALE.md §percentiles; PercentilesSpec pins a 10^6-group case
    // and small/big-path equality). Explicit numBuckets keeps the
    // old single-path behavior for callers that pin bucketing.
    if (numBuckets <= 1) {
      val sizes = allVals.groupBy(g.as("__sg"))
        .agg(count(lit(1)).as("__gn"))
      val bigStats = sizes.filter(col("__gn") > TargetRowsPerBucket)
        .agg(max(col("__gn")).as("mx"), count(lit(1)).as("ng")).head()
      val smallRanked = {
        val wg = Window.partitionBy(g).orderBy(v)
        allVals
          .join(sizes.filter(col("__gn") <= TargetRowsPerBucket),
            g <=> col("__sg"))
          .select(g, v, col("__gn").as("__n"))
          .withColumn("__rn", row_number().over(wg))
      }
      val smallOut = finishRanked(smallRanked, g, v, ps)
      if (bigStats.isNullAt(0)) return smallOut
      val maxN = bigStats.getLong(0)
      val nBig = math.max(1L, bigStats.getLong(1))
      val cap = math.max(2L,
        math.min(MaxBucketsPerGroup, MaxTotalBoundaries / nBig))
      val want = (maxN + TargetRowsPerBucket - 1) / TargetRowsPerBucket
      val buckets = math.max(2L, math.min(cap, want)).toInt
      val bigVals = allVals
        .join(sizes.filter(col("__gn") > TargetRowsPerBucket),
          g <=> col("__sg"))
        .select(g, v)
      return smallOut.unionByName(
        bucketedPath(spark, bigVals, g, v, ps, buckets))
    }
    bucketedPath(spark, allVals, g, v, ps, numBuckets)
  }

  /** Deterministic rank error of the fused probe: Spark's GK
    * summaries guarantee |est − true| ≤ n/accuracy. */
  private val SketchAcc = 256

  /** Total candidate-row budget of the windowed selection across all
    * (group, window) pairs (~32 MB of doubles on the driver — the
    * same order as the boundary budget). Exceeding it falls back to
    * bucketed refinement, it never errors. Mutable ONLY so
    * PercentilesSpec can force the fallback without 4M-row fixtures;
    * production never writes it. */
  private[graft] var MaxCandidateRows = 1L << 22

  /** One-round sketch-windowed selection (see the fused-path comment
    * in [[exactByGroup]]): returns None when a window's upper-bound
    * row count blows [[MaxCandidateRows]] or when the collected
    * window fails the post-hoc validity check — both re-route to the
    * bucketed path, so the sketch guarantee is an optimization, not
    * a correctness dependency. */
  private def windowedSelect(
      spark: org.apache.spark.sql.SparkSession,
      vals: DataFrame,
      gField: StructField,
      g: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column,
      ps: Seq[Double],
      statsRows: Array[Row]): Option[DataFrame] = {
    val P = ProbeCuts
    val eps = 1.0 / SketchAcc
    // Per group: target ranks (floor/ceil of every (n-1)p) and their
    // probe-cut windows [jlo, jhi] (0 = unbounded below, P =
    // unbounded above), merged into clusters while they overlap.
    // Window validity: cut j's true rank is within n(j/P ± ε), so
    // jlo = ⌊P((t−1)/n − ε)⌋ has rank ≤ t−1 (its value sits at or
    // below the target) and jhi = ⌈P(t/n + ε)⌉ has rank ≥ t.
    case class Cluster(cid: Int, jlo: Int, jhi: Int,
        vlo: Option[Double], vhi: Option[Double], targets: Seq[Long])
    val perGroup = statsRows.map { r =>
      val key = r.get(0)
      val n = r.getLong(1)
      val probe = r.getSeq[Double](2) // value at cut j is probe(j-1)
      val targets = ps.flatMap { p =>
        val pos = (n - 1) * p
        Seq(math.floor(pos).toLong + 1, math.ceil(pos).toLong + 1)
      }.distinct.sorted
      val wins = targets.map { t =>
        val jlo = math.max(0,
          math.floor(P * ((t - 1).toDouble / n - eps)).toInt)
        val jhi = {
          val j = math.ceil(P * (t.toDouble / n + eps)).toInt
          if (j > P - 1) P else j
        }
        (t, jlo, jhi)
      }
      val clusters = wins.foldLeft(List.empty[(Int, Int, List[Long])]) {
        case (acc, (t, jlo, jhi)) => acc match {
          case (clo, chi, ts) :: rest if jlo <= chi =>
            (clo, math.max(chi, jhi), t :: ts) :: rest
          case _ => (jlo, jhi, List(t)) :: acc
        }
      }.reverse.zipWithIndex.map { case ((jlo, jhi, ts), i) =>
        Cluster(i, jlo, jhi,
          if (jlo >= 1) Some(probe(jlo - 1)) else None,
          if (jhi <= P - 1) Some(probe(jhi - 1)) else None,
          ts.reverse)
      }
      (key, n, probe, clusters)
    }
    // Budget check from the probe alone, BEFORE launching the scan.
    // Upper-bounds each cluster's true row count, widening boundary
    // values across their full duplicate run of probe cuts (a heavy
    // duplicate at a window edge otherwise hides arbitrary mass):
    // rows ≤ vhi all rank below the first cut ABOVE vhi's run.
    val totalEst = perGroup.iterator.map { case (_, n, probe, cls) =>
      cls.iterator.map { c =>
        val hi = c.vhi match {
          case None => n
          case Some(x) =>
            var j = c.jhi
            while (j <= P - 2 && probe(j) == x) j += 1
            math.min(n, math.ceil(n * ((j + 1).toDouble / P + eps)).toLong)
        }
        val lo = c.vlo match {
          case None => 0L
          case Some(x) =>
            var j = c.jlo
            while (j >= 2 && probe(j - 2) == x) j -= 1
            math.max(0L, math.floor(n * ((j - 1).toDouble / P - eps)).toLong)
        }
        math.max(0L, hi - lo)
      }.sum
    }.sum
    if (totalEst > MaxCandidateRows) return None

    val cRows: Seq[Row] = perGroup.toSeq.flatMap { case (key, _, _, cls) =>
      cls.map(c => Row(key, c.cid,
        c.vlo.map(Double.box).orNull, c.vhi.map(Double.box).orNull))
    }
    val cSchema = StructType(Seq(
      StructField("__g", gField.dataType),
      StructField("__cid", IntegerType),
      StructField("__vlo", org.apache.spark.sql.types.DoubleType),
      StructField("__vhi", org.apache.spark.sql.types.DoubleType)))
    val cdf = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(cRows, 1), cSchema))
    val vd = v.cast("double")
    // ONE scan: the broadcast join fans each row out to its group's
    // clusters (≤ 2|ps| of them); per (group, cluster) the exact
    // strict below-count and the sorted window rows come back from
    // the same aggregate. collect_list drops the nulls the when()
    // leaves for out-of-window rows.
    val inWin = (col("__vlo").isNull || vd >= col("__vlo")) &&
      (col("__vhi").isNull || vd <= col("__vhi"))
    val agged = vals.join(cdf, g <=> col("__g"))
      .groupBy(col("__g"), col("__cid"))
      .agg(
        sum(when(col("__vlo").isNotNull && vd < col("__vlo"), 1L)
          .otherwise(0L)).as("__below"),
        sort_array(collect_list(when(inWin, vd))).as("__cand"))
      .collect()
    val byKey = agged.map { r =>
      ((r.get(0), r.getInt(1)), (r.getLong(2), r.getSeq[Double](3)))
    }.toMap
    val outRows = perGroup.map { case (key, n, _, cls) =>
      // target rank → exact order statistic, or None on any miss
      val at = scala.collection.mutable.HashMap.empty[Long, Double]
      var ok = true
      cls.foreach { c =>
        byKey.get((key, c.cid)) match {
          case Some((below, cand)) =>
            c.targets.foreach { t =>
              val idx = t - below
              if (idx >= 1 && idx <= cand.length)
                at(t) = cand((idx - 1).toInt)
              else ok = false
            }
          case None => ok = false
        }
      }
      if (!ok) return None // sketch under-delivered: refine instead
      val pvals = ps.map { p =>
        val pos = (n - 1) * p
        val lo = at(math.floor(pos).toLong + 1)
        val hi = at(math.ceil(pos).toLong + 1)
        Double.box(lo + (hi - lo) * (pos - math.floor(pos)))
      }
      Row.fromSeq(key +: pvals)
    }.toSeq
    val outSchema = StructType(gField +:
      ps.map(p => StructField("p" + tag(p),
        org.apache.spark.sql.types.DoubleType)))
    Some(spark.createDataFrame(
      spark.sparkContext.parallelize(outRows, 1), outSchema))
  }

  /** The boundary-bucket machinery (passes 1-3 of the scaladoc) over
    * `vals`, which must already be null-filtered. */
  private def bucketedPath(
      spark: org.apache.spark.sql.SparkSession,
      vals: DataFrame,
      g: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column,
      ps: Seq[Double],
      buckets: Int): DataFrame = {

    // Pass 1: per-group bucket boundaries, pinned on the driver so the
    // bucket function is identical in passes 2 and 3. Low accuracy is
    // deliberate: boundaries only balance load, so a rank error of
    // ~n/(8·buckets) merely skews bucket sizes a little.
    val accuracy = math.max(100, 8 * buckets)
    val qs = (1 until buckets).map(i => lit(i.toDouble / buckets))
    val bndsAgg = vals.groupBy(g.as("__g"))
      .agg(percentile_approx(v.cast("double"), array(qs: _*), lit(accuracy))
        .as("__bnds"))
    val bnds = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(bndsAgg.collect().toSeq, 1),
      bndsAgg.schema))
    bucketedFrom(spark, vals, g, v, ps, bnds)
  }

  /** Passes 2-3 over `vals` given a driver-pinned per-group boundary
    * table `bnds` (`__g`, `__bnds: array<double>`; possibly ragged —
    * a group with an EMPTY array is one whole bucket, i.e. the direct
    * small-group shape). Shared by the general path (uniform bucket
    * count from pass 1) and the fused few-group path (per-group
    * subsets of one probe sketch) — which is why the two are
    * value-identical by construction. */
  private def bucketedFrom(
      spark: org.apache.spark.sql.SparkSession,
      vals: DataFrame,
      g: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column,
      ps: Seq[Double],
      bnds: DataFrame): DataFrame = {

    // bucket = #boundaries strictly below the value (binary search —
    // O(log buckets) per row, codegen'd): monotone in the value, so
    // bucket order == value order within every group. The group join
    // is null-safe: a NULL group keeps its boundary row.
    val lowerBound = GraftBridge.column(LowerBound(
      GraftBridge.expression(col("__bnds")),
      GraftBridge.expression(v.cast("double"))))
    def bucketed = vals.join(bnds, g <=> col("__g"))
      .withColumn("__bkt", lowerBound)
      .select(g, v, col("__bkt"))

    // Pass 2: per-(group, bucket) counts — tiny, budget-bounded —
    // collected; offsets, totals and the needed-bucket set are driver
    // arithmetic on ≤ |groups|·buckets rows.
    val cnts = bucketed.groupBy(g, col("__bkt"))
      .agg(count(lit(1)).as("__cnt")).collect()
    val neededRows = cnts.groupBy(_.get(0)).iterator.flatMap {
      case (grp, rows) =>
        val sorted = rows.sortBy(_.getInt(1))
        val n = sorted.iterator.map(_.getLong(2)).sum
        val targets = ps.flatMap { p =>
          val pos = (n - 1) * p
          Seq(math.floor(pos).toLong + 1, math.ceil(pos).toLong + 1)
        }.distinct
        var off = 0L
        sorted.flatMap { r =>
          val o = off
          off += r.getLong(2)
          if (targets.exists(t => t > o && t <= o + r.getLong(2)))
            Some(Row(grp, r.getInt(1), o, n))
          else None
        }
    }.toSeq
    val ndSchema = StructType(Seq(
      StructField("__g", bnds.schema("__g").dataType),
      StructField("__bkt2", IntegerType),
      StructField("__off", LongType),
      StructField("__n", LongType)))
    val nd = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(neededRows, 1), ndSchema))

    // Pass 3: rank only the needed buckets. The window partitions on
    // (group, bucket) — bounded ~n/buckets rows each — and the local
    // rank is shifted by the bucket offset to the exact global rank.
    val wLoc = Window.partitionBy(g, col("__bkt")).orderBy(v)
    val ranked = bucketed
      .join(nd, g <=> col("__g") && col("__bkt") === col("__bkt2"))
      .withColumn("__rn", col("__off") + row_number().over(wLoc))
    finishRanked(ranked, g, v, ps)
  }

  /** Shared finishing aggregate: from rows carrying exact global
    * ranks (`__rn`) and group totals (`__n`), pick the two boundary
    * rows per (group, percentile) and interpolate (type 7). Both the
    * direct small-group path and the bucketed path end here, which
    * is WHY they are value-identical by construction. */
  /** Output-column naming: integer percents name as p50/p90;
    * fractional ones keep their decimals with '_' (p12_5) so nearby
    * fractions cannot collide. */
  private def tag(p: Double): String = {
    val pct = p * 100
    if (pct == pct.round.toDouble) pct.round.toString
    else pct.toString.replace('.', '_')
  }

  private def finishRanked(
      ranked: DataFrame,
      g: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column,
      ps: Seq[Double]): DataFrame = {
    require(ps.map(tag).distinct.size == ps.size,
      s"duplicate percentile fractions: $ps")
    val boundaryAggs = ps.flatMap { p =>
      val pos = (col("__n") - 1) * p
      Seq(
        max(when(col("__rn") === floor(pos) + 1, v)).as(s"__lo_${tag(p)}"),
        max(when(col("__rn") === ceil(pos) + 1, v)).as(s"__hi_${tag(p)}"),
        max(pos - floor(pos)).as(s"__frac_${tag(p)}"))
    }
    val agged = ranked.groupBy(g)
      .agg(boundaryAggs.head, boundaryAggs.tail: _*)
    val outCols = g +: ps.map { p =>
      val (lo, hi, frac) = (col(s"__lo_${tag(p)}"), col(s"__hi_${tag(p)}"),
        col(s"__frac_${tag(p)}"))
      (lo + (hi - lo) * frac).as("p" + tag(p))
    }
    agged.select(outCols: _*)
  }
}
