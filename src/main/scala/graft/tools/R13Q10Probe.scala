package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13: q10 anatomy — expand-vs-crossjoin, AQE on/off, partial-agg
  * pre-shrink, and a one-stage driver-merge form. */
object R13Q10Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1.0")
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def t(name: String)(f: => Unit): Unit = {
      f
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-34s $best%8.3f s")
    }
    def expand(): Unit =
      li.agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders")).collect()
    t("expand (aqe on)") { expand() }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("expand (aqe off)") { expand() }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // one-stage: per-partition distinct via partial agg semantics in
    // mapPartitions with a primitive open-addressing set, then merge
    // the (small) distinct sets on the driver
    t("mapPartitions sets + driver merge") {
      val df = li.select(col("l_partkey"), col("l_suppkey"),
        col("l_orderkey"))
      val parts = df.queryExecution.toRdd.mapPartitions { it =>
        val sets = Array.fill(3)(new graft.operators.LongOpenSet(1 << 12))
        while (it.hasNext) {
          val row = it.next()
          var i = 0
          while (i < 3) {
            if (!row.isNullAt(i)) sets(i).add(row.getLong(i))
            i += 1
          }
        }
        Iterator.single(sets.map(_.toArray))
      }.collect()
      val merged = Array.fill(3)(new graft.operators.LongOpenSet(1 << 16))
      parts.foreach { arrs =>
        var i = 0
        while (i < 3) {
          val a = arrs(i); var j = 0
          while (j < a.length) { merged(i).add(a(j)); j += 1 }
          i += 1
        }
      }
      require(merged.map(_.size).forall(_ > 0))
    }
    spark.stop()
  }
}
// (appended prototype — shard-shuffle exact distinct)
object R13Q10Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1.0")
    val spark = graft.Sessions.tuneLocal(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def t(name: String)(f: => Unit): Unit = {
      f
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-34s $best%8.3f s")
    }
    t("pre-shrink + dataset agg") {
      import spark.implicits._
      val df = li.select(col("l_partkey"), col("l_suppkey"),
        col("l_orderkey"))
      val pre = df.queryExecution.toRdd.mapPartitions { it =>
        val sets = Array.fill(3)(new graft.operators.LongOpenSet(1 << 12))
        while (it.hasNext) {
          val row = it.next()
          var i = 0
          while (i < 3) {
            if (!row.isNullAt(i)) sets(i).add(row.getLong(i))
            i += 1
          }
        }
        sets.iterator.zipWithIndex.flatMap { case (s, i) =>
          s.toArray.iterator.map(k => (i, k))
        }
      }
      val out = spark.createDataset(pre)
        .groupBy($"_1").agg(countDistinct($"_2"))
        .collect()
      require(out.length == 3)
    }
    t("UNUSED shard-shuffle exact distinct") {
      val df = li.select(col("l_partkey"), col("l_suppkey"),
        col("l_orderkey"))
      val R = 32
      val counts = df.queryExecution.toRdd.mapPartitions { it =>
        val sets = Array.fill(3)(new graft.operators.LongOpenSet(1 << 12))
        while (it.hasNext) {
          val row = it.next()
          var i = 0
          while (i < 3) {
            if (!row.isNullAt(i)) sets(i).add(row.getLong(i))
            i += 1
          }
        }
        sets.iterator.zipWithIndex.flatMap { case (s, i) =>
          val keys = s.toArray
          val bufs = Array.fill(R)(new scala.collection.mutable.ArrayBuilder.ofLong)
          var j = 0
          while (j < keys.length) {
            val k = keys(j)
            var h = k
            h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
            h ^= h >>> 27
            bufs(((h >>> 8) % R).toInt.abs) += k
            j += 1
          }
          (0 until R).iterator.map(r => (i * R + r, bufs(r).result()))
        }
      }.partitionBy(new org.apache.spark.HashPartitioner(3 * R) {
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      }).mapPartitions { it =>
        val s = new graft.operators.LongOpenSet(1 << 12)
        var colIdx = -1
        while (it.hasNext) {
          val (key, arr) = it.next()
          colIdx = key / R
          var j = 0
          while (j < arr.length) { s.add(arr(j)); j += 1 }
        }
        if (colIdx < 0) Iterator.empty
        else Iterator.single((colIdx, s.size))
      }.collect()
      val byCol = counts.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      require(byCol.size == 3 && byCol.values.forall(_ > 0))
    }
    spark.stop()
  }
}
