package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[2,8,8192] runs the SAME dump
    // under REAL executor processes (multi-process correctness
    // rehearsal — custom expressions, aggregate buffers, and
    // streaming state must serialize for real); SPARK_GRAFT_JARS
    // ships the app jar to the executors in that mode. Same contract
    // as Bench.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val jars = sys.env.get("SPARK_GRAFT_JARS")
    val b0 = graft.Sessions.tuneLocal(SparkSession.builder())
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
    val spark = jars.fold(b0)(j => b0.config("spark.jars", j))
      .config("spark.sql.session.timeZone", "UTC")
      // permissive coercion (invalid cast/parse -> NULL) matches the
      // reference's pandas errors="coerce" semantics
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // bucketed layouts here are only ever read by probes that WANT
      // the bucketed scan (pruned point lookups, co-located joins) --
      // see graft.operators.Layouts; keep the planner from silently
      // un-bucketing them, and no operator mutates this mid-session
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q01,t21 — builder-side iteration filter (the
    // driver runs unfiltered; tools/check.py takes the same subset)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // Isolate queries from each other (mirrors Bench): cached frames
      // left behind by dedup/LM pipelines otherwise accumulate across
      // all 127+ queries until block-manager eviction/GC churn taxes
      // whichever query runs next.
      spark.catalog.clearCache()
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // drop any stale output from a previous run so a failure can
        // never masquerade as a pass downstream
        val dir = new java.io.File(s"$outDir/$name")
        if (dir.exists()) {
          dir.listFiles().foreach(_.delete()); dir.delete()
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
