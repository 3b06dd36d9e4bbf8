package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Percentiles

/** Round-12 high-cardinality percentile measurement (verdict task 6):
  * exactByGroup at >= 10^6 synthetic groups, before/after shapes —
  * the direct small-group path vs the pinned all-bucketed machinery
  * (numBuckets=2, what the old uniform sizing degraded to at this
  * cardinality). Also a skewed case: 10^6 small groups + one 10^7-row
  * monster, which the adaptive split routes to both paths. */
object R12PctProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
    }
    // 10^6 groups x 20 rows = 2x10^7 values
    val uniform = spark.range(0, 20000000L)
      .select((col("id") % 1000000L).as("grp"),
        ((col("id") * 2654435761L) % 100003L).cast("double").as("v"))
    t("uniform 1e6 groups: adaptive (direct path)") {
      Percentiles.exactByGroup(uniform, "grp", "v", Seq(0.5, 0.9))
        .count()
    }
    t("uniform 1e6 groups: pinned buckets=2 (old)") {
      Percentiles.exactByGroup(uniform, "grp", "v", Seq(0.5, 0.9),
        numBuckets = 2).count()
    }
    // skew: 10^6 small groups + one 10^7-row group
    val monster = spark.range(0, 10000000L)
      .select(lit(-1L).as("grp"),
        ((col("id") * 40503L) % 65537L).cast("double").as("v"))
    val skewed = uniform.unionByName(monster)
    t("skewed (+1e7-row group): adaptive split") {
      Percentiles.exactByGroup(skewed, "grp", "v", Seq(0.5, 0.9))
        .count()
    }
    t("skewed (+1e7-row group): pinned buckets=2 (old)") {
      Percentiles.exactByGroup(skewed, "grp", "v", Seq(0.5, 0.9),
        numBuckets = 2).count()
    }
    spark.stop()
  }
}
