package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Round-12 CC gate boundary measurement (verdict task 8): time the
  * driver union-find vs the distributed fixpoint on the SAME edge
  * set, at sizes bracketing the 2^21-symmetric-edge gate, built as
  * adversarial consecutive-id chains (worst case for the fixpoint:
  * diameter = n) plus the realistic d12 minhash pair set from the
  * given sf dir. Usage: R12CcProbe <sfDir> */
object R12CcProbe {
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
    import spark.implicits._

    def time(name: String)(f: => Map[Long, Long]): Map[Long, Long] = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        s"  (${r.size} nodes)")
      r
    }
    def leaders(pairs: org.apache.spark.sql.DataFrame, cutoff: Long) =
      Dedup.clusterLeaders(pairs, smallCutoff = cutoff)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // chain graphs around the gate: pairs = n-1, symmetric edges =
    // 2(n-1); the gate is 2^21 symmetric edges -> n ~ 2^20+1 pairs
    for (n <- Seq(1 << 18, 1 << 20, (1 << 20) + 2, 1 << 21)) {
      val pairs = spark.range(1, n)
        .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
        .cache()
      pairs.count()
      val symEdges = 2L * (n - 1)
      println(s"-- chain n=$n (symmetric edges=$symEdges, " +
        s"gate=${2L << 20})")
      val uf = time(s"  union-find (forced, cutoff=MaxValue)") {
        leaders(pairs, Long.MaxValue)
      }
      val fx = time(s"  fixpoint   (forced, cutoff=0)") {
        leaders(pairs, 0L)
      }
      require(uf == fx, "paths disagree!")
      time(s"  gated default (cutoff=2^21)") {
        leaders(pairs, 2L << 20)
      }
      pairs.unpersist()
    }

    // realistic: the d02 minhash candidate pair set at this SF
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val mh = Dedup.minHashCandidatePairs(docs, col("doc_id"), col("text"))
      .select(col("a_id").cast("long").as("a_id"),
        col("b_id").cast("long").as("b_id")).cache()
    val np = mh.count()
    println(s"-- d02 minhash pairs at $sfDir: $np pairs")
    val a = time("  union-find (forced)") { leaders(mh, Long.MaxValue) }
    val b = time("  fixpoint   (forced)") { leaders(mh, 0L) }
    require(a == b, "paths disagree on minhash pairs!")
    spark.stop()
  }
}
