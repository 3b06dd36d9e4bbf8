package graft

import org.apache.spark.sql.functions._

class SketchSpec extends SparkSuite {

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
