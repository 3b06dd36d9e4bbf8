package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement probe: formatter-based vs arithmetic yyyyMMdd
  * parsing on the sf1.0 orders table, interleaved in one JVM so host
  * noise hits both variants equally. Not part of the library surface.
  *
  * MEASURED OUTCOME (quiet box, 3 interleaved rounds, sf1.0): the
  * to_date("yyyyMMdd") formatter wins — 1.67-1.72 s vs 2.31-2.49 s
  * for the range-guard + make_date arithmetic, identical results
  * (0 divergent rows). MakeDate builds a validity-checked
  * java.time.LocalDate per row, which costs more than Spark 4's
  * digit-pattern parse; the intuition "formatter = slow interpreted
  * path" does not hold here. parseYyyymmdd therefore stays on the
  * formatter (functions/Normalize.scala).
  */
object DateParseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf1.0")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val ival = date_format(col("o_orderdate"), "yyyyMMdd").cast("int")
    val mixed = when(col("o_orderkey") % 100 === 0, lit(99999999))
      .otherwise(ival)

    def formatter(c: Column): Column = to_date(c.cast("string"), "yyyyMMdd")
    def arith(c: Column): Column = {
      val i = c.cast("int")
      when(i.between(10000000, 99999999),
        make_date((i / 10000).cast("int"),
          ((i / 100) % 100).cast("int"),
          (i % 100).cast("int")))
    }

    def run(name: String, c: Column): Unit = {
      val df = orders.select(col("o_orderkey"),
        date_format(c, "yyyy-MM-dd").as("parsed_date"))
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warmup both, then interleave 3 measured rounds
    run("warm_formatter", formatter(mixed))
    run("warm_arith", arith(mixed))
    for (_ <- 1 to 3) { run("formatter", formatter(mixed)); run("arith", arith(mixed)) }
    // sanity: identical results
    val diff = orders.select(formatter(mixed).as("a"), arith(mixed).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    println(s"divergent_rows: $diff")
    spark.stop()
  }
}
