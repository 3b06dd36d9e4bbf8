package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13: where do q18's seconds go at sf1.0? Times the fused path's
  * three jobs in isolation (probe agg / bucket counts / boundary
  * ranks) plus candidate replacements for the probe job. */
object R13PctProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1.0")
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
      .filter(col("v").isNotNull)
    def t(name: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    t("scan+count only") { li.groupBy("g").count().collect() }
    val fr = (1 until 128).map(i => lit(i.toDouble / 128))
    t("probe: pa(127 cuts, acc 256)") {
      li.groupBy("g").agg(count(lit(1)),
        percentile_approx(col("v").cast("double"), array(fr: _*), lit(256)))
        .collect()
    }
    t("probe: pa(127 cuts, acc 1024)") {
      li.groupBy("g").agg(count(lit(1)),
        percentile_approx(col("v").cast("double"), array(fr: _*), lit(1024)))
        .collect()
    }
    val fr31 = (1 until 32).map(i => lit(i.toDouble / 32))
    t("probe: pa(31 cuts, acc 256)") {
      li.groupBy("g").agg(count(lit(1)),
        percentile_approx(col("v").cast("double"), array(fr31: _*), lit(256)))
        .collect()
    }
    t("full q18 (current)") {
      graft.SparkEntry.queries("q18_percentiles")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
