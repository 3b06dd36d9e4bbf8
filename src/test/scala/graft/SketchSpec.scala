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
