package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** One-off measurement probe behind the round-11 d09 rewrite; kept as
  * the runnable record of WHY fuzzyMatchPairs forces its own
  * shuffle. Findings at sf1.0 (150k names, 15.5M in-block candidate
  * pairs, 32 cores):
  *
  *  1. levenshtein itself was never the problem: 16M threshold-form
  *     evals run in ~1.5 s inside whole-stage codegen (the 3-arg
  *     banded DP is ~1.7x the 2-arg full DP on 18-char names, and
  *     prunes 70% of rows here before they reach the later filter).
  *  2. The killer was TASK COUNT. The planner broadcasts the
  *     dimension-sized name table, so the m²-pair join + verify
  *     inherit the stream side's file splits — ONE task on a
  *     single-file corpus (measured 42-50 s single-task vs ~5 s
  *     spread, identical pair set).
  *  3. repartition(n, blockCols) alone did NOT fix it: the pair
  *     join's per-column null-safe <=> equality makes the planner
  *     rewrite join keys to coalesce/isnull composites, which do not
  *     match the repartition keys, so an ENSURE_REQUIREMENTS
  *     exchange lands after the user shuffle — and AQE, sizing by
  *     INPUT bytes (a few MB) rather than join output, coalesced it
  *     back to 2 partitions (measured: final stage 2 tasks, 42 s).
  *     Joining on one struct key with === (null fields compare equal
  *     inside a struct — same semantics, spec'd) makes the join keys
  *     equal the repartition keys verbatim; no rewrite, no second
  *     exchange, nothing for AQE to coalesce. Final stage 32 tasks,
  *     ~4.5 s; d09 end-to-end 84 s -> 7.4 s.
  */
object D09Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.tuneLocal(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) -
          si.submissionTime.getOrElse(0L)) / 1000.0
        println(f"STAGE ${si.stageId}%3d tasks=${si.numTasks}%4d wall=${dur}%8.2f s")
      }
    })
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf1.0")
    val c = graft.Tables.load(spark, dir, "customer")
    val q = graft.operators.Dedup.fuzzyMatchPairs(c,
      col("c_custkey"), col("c_name"),
      Seq(col("c_mktsegment"), substring(col("c_name"), 1, 16)),
      maxDistance = 1)
    val t0 = System.nanoTime()
    q.write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"TOTAL: $secs%.2f s")
    spark.stop()
  }
}
