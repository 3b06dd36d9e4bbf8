package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable exact percentiles: one window sort per group + linear
  * interpolation at the cut positions (quantile_cont / type-7
  * semantics: pos = (n-1)·p, result = lower + (upper-lower)·frac).
  *
  * Spark's built-in `percentile` aggregate buffers a value→count map
  * per group (slow and memory-bound for high-cardinality doubles);
  * this form is a sort shuffle partitioned by group — the layout that
  * survives 100 TB, since each group sorts distributed and only the
  * two boundary rows per (group, percentile) reach the aggregate.
  */
object Percentiles {

  /** One output row per group: a column per requested percentile,
    * named p50/p90/... from the fraction. */
  def exactByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"percentile fractions must be in [0,1]: $ps")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val wAll = Window.partitionBy(col(groupCol))
    // NULL values are excluded before ranking (quantile_cont ignores
    // them; ranking them would shift every cut position)
    val ranked = df.select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
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
      val v = col(valueCol)
      Seq(
        max(when(col("__rn") === floor(pos) + 1, v)).as(s"__lo_${tag(p)}"),
        max(when(col("__rn") === ceil(pos) + 1, v)).as(s"__hi_${tag(p)}"),
        max(pos - floor(pos)).as(s"__frac_${tag(p)}"))
    }
    val agged = ranked.groupBy(col(groupCol))
      .agg(boundaryAggs.head, boundaryAggs.tail: _*)
    val outCols = col(groupCol) +: ps.map { p =>
      val (lo, hi, frac) = (col(s"__lo_${tag(p)}"), col(s"__hi_${tag(p)}"),
        col(s"__frac_${tag(p)}"))
      (lo + (hi - lo) * frac).as("p" + tag(p))
    }
    agged.select(outCols: _*)
  }
}
