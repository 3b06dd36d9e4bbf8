package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Normalize, TextFns}

/** Round-12 parity + timing probe for the native CPU-path
  * expressions (JsonLongField, PiiScan, DateToYyyymmdd/YyyymmddToIso)
  * against the built-in compositions they replace — counts divergent
  * rows over the full sf dir (must print 0), then interleaved A/B
  * timings. Usage: R12Probe <sfDir> [mode] */
object R12Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }

    // ---- q22: JSON extract parity ----
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val maybeCorrupt = when(col("event_id") % 50 === 0,
      concat(lit("x"), col("props"))).otherwise(col("props"))
    val oldK = from_json(maybeCorrupt,
      new org.apache.spark.sql.types.StructType()
        .add("k", org.apache.spark.sql.types.LongType)).getField("k")
    val newK = Normalize.jsonLongField(maybeCorrupt, "k")
    val jsonDiv = events.select(col("event_id"), oldK.as("o"), newK.as("n"))
      .where(!(col("o") <=> col("n"))).count()
    println(s"q22 divergent rows: $jsonDiv")

    // ---- n07: PII parity ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val injected = when(col("doc_id") % 10 === 0,
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or 555-123-4567"))).otherwise(col("text"))
    val oldPii = docs.select(col("doc_id"),
      size(regexp_extract_all(injected, lit(TextFns.EmailRe), lit(0)))
        .cast("long").as("e"),
      size(regexp_extract_all(injected, lit(TextFns.PhoneRe), lit(0)))
        .cast("long").as("p"),
      TextFns.redactPii(injected).as("r"))
    val newPii = docs.select(col("doc_id"),
        TextFns.piiScan(injected).as("s"))
      .select(col("doc_id"), col("s.n_emails").as("e"),
        col("s.n_phones").as("p"), col("s.redacted").as("r"))
    val piiDiv = oldPii.alias("a").join(newPii.alias("b"), "doc_id")
      .where(!(col("a.e") <=> col("b.e")) || !(col("a.p") <=> col("b.p")) ||
        !(col("a.r") <=> col("b.r"))).count()
    println(s"n07 divergent rows: $piiDiv")

    // ---- n05: date parity ----
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val oldIval = date_format(col("o_orderdate"), "yyyyMMdd").cast("int")
    val newIval = Normalize.dateToYyyymmdd(col("o_orderdate"))
    val mixedOld = when(col("o_orderkey") % 100 === 0, lit(99999999))
      .otherwise(oldIval)
    val mixedNew = when(col("o_orderkey") % 100 === 0, lit(99999999))
      .otherwise(newIval)
    val dateDiv = orders.select(
      oldIval.as("oi"), newIval.as("ni"),
      date_format(Normalize.parseYyyymmdd(mixedOld), "yyyy-MM-dd").as("os"),
      Normalize.yyyymmddToIso(mixedNew).as("ns"))
      .where(!(col("oi") <=> col("ni")) || !(col("os") <=> col("ns")))
      .count()
    println(s"n05 divergent rows: $dateDiv")

    // ---- timings ----
    t("q22 old from_json") {
      events.select(col("event_id"), oldK.as("k")).orderBy("event_id")
        .write.format("noop").mode("overwrite").save(); 0L }
    t("q22 new JsonLongField") {
      events.select(col("event_id"), newK.as("k")).orderBy("event_id")
        .write.format("noop").mode("overwrite").save(); 0L }
    t("n07 old regex x4") {
      oldPii.orderBy("doc_id").write.format("noop").mode("overwrite").save(); 0L }
    t("n07 new PiiScan") {
      newPii.orderBy("doc_id").write.format("noop").mode("overwrite").save(); 0L }
    t("n05 old java.time") {
      orders.select(col("o_orderkey"),
        date_format(Normalize.parseYyyymmdd(mixedOld), "yyyy-MM-dd")
          .as("parsed_date")).orderBy("o_orderkey")
        .write.format("noop").mode("overwrite").save(); 0L }
    t("n05 new DateInt") {
      orders.select(col("o_orderkey"),
        Normalize.yyyymmddToIso(mixedNew).as("parsed_date"))
        .orderBy("o_orderkey")
        .write.format("noop").mode("overwrite").save(); 0L }
    spark.stop()
  }
}
