package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles per group (quantile_cont / type-7
  * semantics: pos = (n-1)·p, result = lower + (upper-lower)·frac) via
  * distributed order statistics — no per-group single-task sort.
  *
  * Plan shape (three passes over the data, all shuffles bounded):
  *
  *  1. '''Boundaries''': per-group approximate quantiles
  *     (`percentile_approx`) split each group's value range into
  *     `numBuckets` buckets. The boundary table (|groups| rows) is
  *     collected and re-created as a driver-backed broadcast so the
  *     bucket assignment is byte-identical across the later passes
  *     (re-evaluating an approx aggregate could legally produce
  *     different — equally valid — boundaries).
  *  2. '''Counts''': one hash-aggregate over (group, bucket) yields
  *     per-bucket counts, cumulative offsets and the group total n.
  *     From n the target global ranks floor((n-1)p)+1 / ceil((n-1)p)+1
  *     are known, so the (few) buckets containing a target rank are
  *     identified on this tiny table.
  *  3. '''Boundary rows''': the data is re-scanned, filtered to the
  *     needed buckets (≤ 2·|ps| per group, each ~n/numBuckets rows),
  *     ranked locally within (group, bucket) — a hash-partitioned
  *     window over bounded partitions — and offset-shifted to global
  *     ranks. Only the two boundary rows per (group, percentile) reach
  *     the final aggregate.
  *
  * Spark's built-in `percentile` aggregate buffers a value→count map
  * per group (memory-bound for high-cardinality doubles) and a single
  * `Window.partitionBy(group).orderBy(value)` sorts each whole group
  * in one task; both collapse at corpus scale. Here the largest sort
  * is one bucket (~n/numBuckets rows), and skew in a hot bucket is
  * bounded by the boundary resolution of pass 1.
  *
  * Bucketing changes only load balance, never values: any boundary
  * placement yields the same exact ranks, so results are bit-identical
  * to the single-sort form. Driver memory holds |groups|·numBuckets
  * doubles — bounded by the same cardinality as the operator's own
  * one-row-per-group output.
  */
object Percentiles {

  /** One output row per group: a column per requested percentile,
    * named p50/p90/... from the fraction.
    *
    * @param numBuckets range buckets per group; -1 (default) derives
    *   16 × spark.sql.shuffle.partitions so bucket size tracks the
    *   configured parallelism at any data scale. */
  def exactByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double],
      numBuckets: Int = -1): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"percentile fractions must be in [0,1]: $ps")
    val spark = df.sparkSession
    val buckets =
      if (numBuckets > 1) numBuckets
      else 16 * spark.sessionState.conf.numShufflePartitions
    val g = col(groupCol)
    val v = col(valueCol)
    // NULL values are excluded before ranking (quantile_cont ignores
    // them; ranking them would shift every cut position)
    val vals = df.select(g, v).filter(v.isNotNull)

    // Pass 1: per-group bucket boundaries, pinned on the driver so the
    // bucket function is identical in passes 2 and 3.
    val qs = (1 until buckets).map(i => lit(i.toDouble / buckets))
    val bndsAgg = vals.groupBy(g)
      .agg(percentile_approx(v.cast("double"), array(qs: _*), lit(10000))
        .as("__bnds"))
    val bnds = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(bndsAgg.collect().toSeq, 1),
      bndsAgg.schema))

    // bucket = #boundaries strictly below the value: monotone in the
    // value, so bucket order == value order within every group
    val bucketed = vals.join(bnds, Seq(groupCol))
      .withColumn("__bkt", size(filter(col("__bnds"), b => v > b)))
      .drop("__bnds")

    // Pass 2: tiny (group, bucket) count table → offsets, totals, and
    // the set of buckets that contain a target rank. The windows here
    // run over ≤ `buckets` rows per group.
    val wOff = Window.partitionBy(g).orderBy(col("__bkt"))
    val offs = bucketed.groupBy(g, col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum("__cnt").over(wOff.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__n", sum("__cnt").over(Window.partitionBy(g)))
    val targetRanks = array(ps.flatMap { p =>
      val pos = (col("__n") - 1) * p
      Seq((floor(pos) + 1).cast("long"), (ceil(pos) + 1).cast("long"))
    }: _*)
    val needed = offs.filter(exists(targetRanks,
      t => t > col("__off") && t <= col("__off") + col("__cnt")))

    // Pass 3: rank only the needed buckets. The window partitions on
    // (group, bucket) — bounded ~n/buckets rows each — and the local
    // rank is shifted by the bucket offset to the exact global rank.
    val wLoc = Window.partitionBy(g, col("__bkt")).orderBy(v)
    val ranked = bucketed
      .join(broadcast(needed.select(g, col("__bkt"), col("__off"), col("__n"))),
        Seq(groupCol, "__bkt"))
      .withColumn("__rn", col("__off") + row_number().over(wLoc))

    // integer percents name as p50/p90; fractional ones keep their
    // decimals with '_' (p12_5) so nearby fractions cannot collide
    def tag(p: Double): String = {
      val pct = p * 100
      if (pct == pct.round.toDouble) pct.round.toString
      else pct.toString.replace('.', '_')
    }
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
