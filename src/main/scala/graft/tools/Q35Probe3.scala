package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Q35Probe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1.0")
    val aqe = if (args.length > 1) args(1) else "true"
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def t(name: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s (aqe=$aqe)")
    }
    val num = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val str = Seq("l_returnflag", "l_linestatus")
    t("expand multi-distinct") {
      li.agg(
        count(col(num(0))), countDistinct(col(num(0))), min(col(num(0))), max(col(num(0))),
        count(col(num(1))), countDistinct(col(num(1))), min(col(num(1))), max(col(num(1))),
        count(col(num(2))), countDistinct(col(num(2))), min(col(num(2))), max(col(num(2))),
        count(col(num(3))), countDistinct(col(num(3))), min(col(num(3))), max(col(num(3))),
        count(col(str(0))), countDistinct(col(str(0))),
        count(col(str(1))), countDistinct(col(str(1))))
        .write.format("noop").mode("overwrite").save()
    }
    t("crossjoin profile (new)") {
      graft.operators.Quality.profile(li, num, str).orderBy("column_name")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
