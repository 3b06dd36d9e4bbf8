package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** r13: floor probe — direct ColumnarBatch iteration vs toRdd rows
  * for the q10 distinct-set pass. */
object R13ColProbe {
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
    def t(name: String)(f: => Unit): Unit = {
      f
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-34s $best%8.3f s")
    }
    t("columnar distinct sets (fresh plan)") {
      val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
      val scan = df.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec if s.supportsColumnar => s
      }.get
      val parts = scan.executeColumnar().mapPartitions { it =>
        val sets = Array.fill(3)(new graft.operators.LongOpenSet(1 << 12))
        while (it.hasNext) {
          val b = it.next()
          val n = b.numRows()
          var i = 0
          while (i < 3) {
            val v = b.column(i)
            val s = sets(i)
            var r = 0
            while (r < n) {
              if (!v.isNullAt(r)) s.add(v.getLong(r))
              r += 1
            }
            i += 1
          }
        }
        Iterator.single(sets.map(_.toArray))
      }.collect()
      require(parts.nonEmpty)
    }
    spark.stop()
  }
}
