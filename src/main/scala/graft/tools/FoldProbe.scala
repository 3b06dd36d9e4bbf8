package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.LsmState

/** Measured evidence for the round-10 fold-state claim: per-batch
  * wall time of the LSM store stays FLAT as accumulated state grows
  * (with bounded compaction spikes at the cadence), while the naive
  * union-and-overwrite fold the LSM replaced grows linearly with the
  * corpus. The O(batch)-write SPEC audits bytes; this probe audits
  * time. Results are recorded in SCALE.md. Not part of the driver
  * contract.
  *
  * Usage: runMain graft.tools.FoldProbe [sfDir] [nBatches]
  */
object FoldProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = graft.Sessions.tuneLocal(SparkSession.builder()).master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // equal-size deltas sliced from lineitem (the largest table)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        pmod(col("l_orderkey") + col("l_linenumber"), lit(nBatches))
          .as("__b"))
    val deltas = (0 until nBatches).map { i =>
      val d = li.filter(col("__b") === i).drop("__b").cache()
      d.count() // materialize so slicing cost is outside the timings
      d
    }

    def timeMs(f: => Unit): Long = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000
    }

    // --- LSM: append O(batch), compact every 8
    val lsmRoot = java.nio.file.Files
      .createTempDirectory("graft_foldprobe_lsm").toString
    val st = new LsmState(spark, lsmRoot, identity, compactEvery = 8)
    val lsm = deltas.zipWithIndex.map { case (d, i) =>
      timeMs { st.append(i.toLong, d); st.maybeCompact(i.toLong) }
    }

    // --- naive: union prior snapshot with the delta, overwrite all
    // (the round-9 shape the LSM replaced), alternating dirs so the
    // read side is never the overwrite target
    val nvRoot = java.nio.file.Files
      .createTempDirectory("graft_foldprobe_naive").toString
    var cur: Option[String] = None
    val naive = deltas.zipWithIndex.map { case (d, i) =>
      timeMs {
        val out = s"$nvRoot/v$i"
        val all = cur.map(p => spark.read.parquet(p).unionByName(d))
          .getOrElse(d)
        all.write.mode("overwrite").parquet(out)
        cur = Some(out)
      }
    }

    val total = deltas.map(_.count()).sum
    println(s"rows=$total batches=$nBatches rows/batch=${total / nBatches}")
    println("| batch | lsm ms | naive ms |")
    println("|---|---|---|")
    lsm.zip(naive).zipWithIndex.foreach { case ((l, n), i) =>
      val mark = if ((i + 1) % 8 == 0) " (compaction)" else ""
      println(s"| $i | $l$mark | $n |")
    }
    println(f"| sum | ${lsm.sum} | ${naive.sum} |")
    // final-state sanity: both folds hold every delta exactly once
    val lsmRows = st.result().count()
    val nvRows = spark.read.parquet(cur.get).count()
    require(lsmRows == total && nvRows == total,
      s"fold diverged: lsm=$lsmRows naive=$nvRows expect=$total")
    spark.stop()
  }
}
