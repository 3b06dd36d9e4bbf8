package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Q10Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1.0")
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def t(name: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    t("expand 3-distinct (old)") {
      li.agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
        .write.format("noop").mode("overwrite").save()
    }
    t("crossjoin 3x (new)") {
      def dc(c: String, as: String) =
        li.select(col(c)).distinct().agg(count(col(c)).as(as))
      dc("l_partkey", "n_parts").crossJoin(dc("l_suppkey", "n_supps"))
        .crossJoin(dc("l_orderkey", "n_orders"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
