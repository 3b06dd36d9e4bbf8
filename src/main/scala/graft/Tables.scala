package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source layer: parquet readers + temp-view registry.
  *
  * Mirrors the reference's published table set (hangarbay
  * pipelines/publish.py:36 loads each parquet as a named table) over the
  * driver's TPC-H-ish testdata. Reads are plain `spark.read.parquet` so
  * Catalyst keeps full pushdown/pruning freedom; no caching here — at
  * 100 TB the scan must stream, and hot dims get broadcast at join
  * sites instead.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark has no
      // native type for: read the raw int64 nanos and truncate to
      // microsecond timestamps (same truncation DuckDB applies).
      // `div` keeps the arithmetic in 64-bit integers — a double
      // roundtrip would lose precision on epoch-nanos magnitudes.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register every table as a temp view (analog of the reference's
    * DuckDB catalog, hangarbay/api.py:379 list_tables). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
