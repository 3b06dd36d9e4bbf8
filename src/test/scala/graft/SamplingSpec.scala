package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSuite {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("hashSample is deterministic and near the requested rate") {
    val a = Sampling.hashSample(docs, "doc_id", 0.4)
    val b = Sampling.hashSample(docs, "doc_id", 0.4)
    assert(a.collect().map(_.getLong(0)).toSet ==
      b.collect().map(_.getLong(0)).toSet)
    val rate = a.count().toDouble / docs.count()
    assert(math.abs(rate - 0.4) < 0.1, s"rate $rate far from 0.4")
  }

  test("stratified sampling caps only the targeted strata") {
    val sampled = Sampling.stratifiedHashSample(docs, "lang", "doc_id",
      Map("en" -> 0.5), defaultFraction = 1.0)
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("en") < before("en")) // en reduced
    (before.keySet - "en").foreach(l =>
      assert(after(l) == before(l), s"untargeted stratum $l changed"))
  }

  test("weightedSample is deterministic, k-sized, and weight-monotone") {
    import spark.implicits._
    // 400 ids, weights 1..4 by id%4+1: inclusion odds must rise with
    // weight. Average over 30 seeds for a stable statistic.
    val df = (0 until 400).map(i => (i.toLong, (i % 4 + 1).toDouble))
      .toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", col("w"), 50)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(df, "id", col("w"), 50)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 50, "not deterministic or wrong k")
    val hits = Array.fill(4)(0)
    (0 until 30).foreach { s =>
      Sampling.weightedSample(df, "id", col("w"), 50, seed = s)
        .collect().foreach(r => hits((r.getLong(0) % 4).toInt) += 1)
    }
    assert(hits(3) > 2 * hits(0),
      s"weight-4 ids must be drawn far more than weight-1: ${hits.toList}")
    assert(hits(0) < hits(1) && hits(1) < hits(2) && hits(2) < hits(3),
      s"inclusion must be monotone in weight: ${hits.toList}")
  }

  test("weightedSample excludes non-positive weights and plans top-k") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, 0.0), (3L, -1.0), (4L, Double.NaN),
      (5L, 2.0)).toDF("id", "w")
    val kept = Sampling.weightedSample(df, "id", col("w"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L),
      s"zero/negative/NaN weights must be excluded: $kept")
    val plan = Sampling.weightedSample(docs, "doc_id",
      length(col("text")), 10).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must plan as per-partition top-k + merge:\n$plan")
  }

  test("hashSplit: covers, near-target proportions, stable under growth") {
    import org.apache.spark.sql.functions.col
    val split = Sampling.hashSplit(docs.select(col("doc_id")), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split.size == docs.count())
    val n = split.size.toDouble
    val frac = split.values.groupBy(identity).view.mapValues(_.size / n)
    assert(math.abs(frac("train") - 0.8) < 0.08, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.06, s"val ${frac("val")}")
    assert(math.abs(frac("test") - 0.1) < 0.06, s"test ${frac("test")}")
    // growth stability: a subset's assignments are unchanged — the
    // property a random split loses on every new data drop
    val subset = Sampling
      .hashSplit(docs.select(col("doc_id"))
        .filter(col("doc_id") < 100), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (id, s) => assert(split(id) == s) }
  }

  test("stratifiedBudget takes exactly min(budget, stratum size)") {
    val out = Sampling.stratifiedBudget(docs, "lang", "doc_id", 30)
    val sizes = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (l, n) =>
      assert(sizes(l) == math.min(30L, n), s"$l: ${sizes(l)}")
    }
  }

  test("groupedWeightedSample equals the per-group window form exactly") {
    import org.apache.spark.sql.expressions.Window
    val agg = Sampling.groupedWeightedSample(
        docs, "source", "doc_id", length(col("text")), 10)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"))).toSet
    // the window form with the SAME hash-derived keys: heap top-k
    // must reproduce it bit for bit (ties broken by id in both)
    val u = (pmod(xxhash64(lit(42L), col("doc_id")), lit(1L << 40))
      .cast("double") + 0.5) / lit((1L << 40).toDouble)
    val key = pow(u, lit(1.0) / length(col("text")).cast("double"))
    val w = Window.partitionBy("source")
      .orderBy(col("__wkey").desc, col("doc_id"))
    val win = docs.filter(length(col("text")) > 0)
      .withColumn("__wkey", key)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 10)
      .select(col("source"), col("__rn").cast("long").as("rank"),
        col("doc_id"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"))).toSet
    assert(agg == win,
      s"missing=${(win -- agg).take(3)} extra=${(agg -- win).take(3)}")
  }

  test("hashShard: total, in-range, id-deterministic, roughly balanced") {
    val docs = Tables.load(spark, sfDir, "documents")
    val n = docs.count()
    val sharded = Sampling.hashShard(docs, col("doc_id"), 16)
    assert(sharded.count() == n) // map-side: no rows gained or lost
    val byShard = sharded.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byShard.keySet.subsetOf((0L until 16L).toSet),
      s"out-of-range shards: ${byShard.keySet.filterNot((0L until 16L).toSet)}")
    // md5-derived: the assignment is a pure function of the id, so an
    // independent recomputation agrees row for row
    val again = Sampling.hashShard(
      docs.select("doc_id"), col("doc_id"), 16)
    val disagree = sharded.select("doc_id", "shard")
      .join(again.withColumnRenamed("shard", "shard2"), "doc_id")
      .filter(col("shard") =!= col("shard2")).count()
    assert(disagree == 0)
    // balance: no empty shard and no shard above 3x the fair share
    // (md5 is uniform; 500 ids over 16 shards averages ~31)
    assert(byShard.size == 16, s"empty shards: ${byShard.size}/16")
    assert(byShard.values.max <= 3 * n / 16,
      s"skewed shard: max=${byShard.values.max}, fair=${n / 16}")
  }

  test("t22 DSIR weights are positive and upweight the target source") {
    val w = SparkEntry.queries("t22_dsir_weights")(spark, sfDir)
    val joined = w.join(docs.select("doc_id", "source"), "doc_id")
    val nonPos = joined.filter(col("dsir_weight") <= 0).count()
    assert(nonPos == 0, s"$nonPos docs with non-positive importance weight")
    // the importance ratio must recover its own target distribution:
    // src0 docs (the target) should average a higher weight than the
    // raw pool — the property a resampler depends on
    val Array(tgt, raw) = joined
      .groupBy((col("source") === "src0").as("isTgt"))
      .agg(avg(col("dsir_weight")).as("m"))
      .orderBy(col("isTgt").desc)
      .collect().map(_.getAs[Double]("m"))
    assert(tgt > raw,
      s"target mean weight $tgt not above raw mean $raw — not discriminating")
  }
}
