package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Quality

/** Round-12 q35 decomposition probe: times each profile branch alone,
  * then the union, at the given sf dir. */
object Q35Probe {
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
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus")) {
      t(s"branch $c") {
        li.select(col(c).as("__v")).groupBy("__v")
          .agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(when(col("__v").isNotNull, col("__c"))), lit(0L))
              .as("n"),
            count(col("__v")).as("nd"), min("__v"), max("__v"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    t("full profile") {
      Quality.profile(li,
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        Seq("l_returnflag", "l_linestatus"))
        .orderBy("column_name")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

/** Variants for the dominant extendedprice-distinct branch. */
object Q35Probe2 {
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
    import spark.implicits._
    def t(name: String)(f: => Any): Unit = {
      f
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s ($r)")
    }
    println("distinct extprice: " + li.select(countDistinct($"l_extendedprice")).first())
    t("scan only") {
      li.select($"l_extendedprice").write.format("noop").mode("overwrite").save(); 0 }
    t("distinct+count") {
      li.select($"l_extendedprice").distinct()
        .agg(count($"l_extendedprice")).first().getLong(0) }
    t("groupBy+count (current)") {
      li.select($"l_extendedprice".as("__v")).groupBy("__v")
        .agg(count(lit(1)).as("__c"))
        .agg(count($"__v")).first().getLong(0) }
    t("array-packed distinct") {
      li.select($"l_extendedprice".as("v"))
        .withColumn("p", spark_partition_id())
        .groupBy("p").agg(collect_set($"v").as("vs"))
        .select(explode($"vs").as("v")).distinct()
        .agg(count($"v")).first().getLong(0) }
    t("stats agg (no distinct)") {
      li.agg(count($"l_quantity"), min($"l_quantity"), max($"l_quantity"),
        count($"l_extendedprice"), min($"l_extendedprice"), max($"l_extendedprice"),
        count($"l_discount"), min($"l_discount"), max($"l_discount"),
        count($"l_tax"), min($"l_tax"), max($"l_tax"),
        count($"l_returnflag"), count($"l_linestatus")).first(); 0 }
    spark.stop()
  }
}
