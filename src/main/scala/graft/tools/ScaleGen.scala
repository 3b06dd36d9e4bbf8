package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the round-11 sf1.0 rehearsal: replicate the
  * driver's sf0.1 tables `copies`× by KEY-SHIFTED union — copy k adds
  * k·10⁸ to every entity key, copy 0 is the source verbatim (so
  * literal key lookups keep hitting). Why replication and not fresh
  * synthesis: it preserves every per-key distribution EXACTLY (block
  * sizes, group cardinalities, text/shingle statistics, FK fan-outs
  * all stay constant while row counts scale), which is precisely what
  * a scaling-exponent measurement wants — a healthy operator should
  * time ~linearly in copies, and any super-linear key is the
  * operator's fault, not the data's. Dimensions (region, nation) stay
  * fixed, TPC-H style; events keep their timestamps (10× density in
  * the same time range — the streaming-fold stress we want) under
  * fresh per-copy user/event ids; embeddings get a tiny deterministic
  * first-component nudge per copy so replicated vectors are not
  * exactly tied in top-k orderings.
  *
  * Output is one PLAIN parquet file per table (name.parquet), the
  * same layout the driver ships, so graft.Tables.load AND the DuckDB
  * oracle read it unchanged. Deterministic end to end — no RNG, no
  * clock.
  *
  * Usage: runMain graft.tools.ScaleGen <srcDir> <outDir> [copies=10]
  */
object ScaleGen {
  private val Off = 100000000L // key shift per copy, >> any source key

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, args(0), args(1),
      if (args.length > 2) args(2).toInt else 10)
    finally spark.stop()
  }

  /** Session-agnostic body (specs drive it on the shared suite
    * session; main owns session lifecycle). */
  def run(spark: SparkSession, srcDir: String, outDir: String,
      copies: Int): Unit = {
    new java.io.File(outDir).mkdirs()

    def read(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")

    /** Union `copies` key-shifted replicas; `shift` maps (df, offset)
      * to the shifted replica. Copy 0 must be the identity. */
    def replicate(df: DataFrame)(shift: (DataFrame, Long) => DataFrame)
        : DataFrame =
      (0 until copies).map(k => shift(df, k * Off)).reduce(_ unionByName _)

    def shiftCols(cols: String*)(df: DataFrame, off: Long): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(off)))

    /** Write as the driver's single-file layout: name.parquet as a
      * plain file (DuckDB's read_parquet takes it directly) — but
      * with row groups sized so the file carries ~32 of them instead
      * of ONE. Round 12 found every sf1.0 scan was single-task: the
      * default 128 MB parquet.block.size put each table in one row
      * group, and row groups are the parallelism quantum for BOTH
      * engines (Spark assigns row groups to splits by midpoint;
      * DuckDB parallelizes per row group) — a 113 MB lineitem
      * monofile serialized every scan-bound key onto one core, in
      * both engines. Real 100 TB corpora arrive as thousands of
      * files with 8-128 MB row groups; ~32 groups per table is the
      * realistic fixture, and it is identical ROWS in the identical
      * order (chunking only). */
    def write(df: DataFrame, name: String): Unit = {
      val srcBytes = new java.io.File(s"$srcDir/$name.parquet").length()
      val block = math.max(1L << 20, srcBytes * copies / 32)
      val tmp = s"$outDir/_tmp_$name"
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", block)
        .parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $tmp"))
      val dst = new java.io.File(s"$outDir/$name.parquet")
      if (dst.exists()) dst.delete()
      java.nio.file.Files.move(part.toPath, dst.toPath)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
      println(s"[scalegen] $name: ${spark.read.parquet(dst.toString).count()} rows")
    }

    // dimensions: fixed
    write(read("region"), "region")
    write(read("nation"), "nation")
    // entities: every key column shifts by the same per-copy offset,
    // so each replica's FK graph is internally consistent
    write(replicate(read("customer"))(shiftCols("c_custkey")), "customer")
    write(replicate(read("supplier"))(shiftCols("s_suppkey")), "supplier")
    write(replicate(read("part"))(shiftCols("p_partkey")), "part")
    write(replicate(read("orders"))(
      shiftCols("o_orderkey", "o_custkey")), "orders")
    write(replicate(read("lineitem"))(
      shiftCols("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    write(replicate(read("events"))(
      shiftCols("event_id", "user_id")), "events")
    write(replicate(read("documents"))(shiftCols("doc_id")), "documents")
    write(replicate(read("embeddings")) { (df, off) =>
      val k = off / Off
      shiftCols("vec_id")(df, off)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            when(i === 0, x + lit((k * 1e-3).toFloat)).otherwise(x)))
    }, "embeddings")
  }
}
