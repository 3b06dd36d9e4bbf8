package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators for training-data curation.
  *
  * All deterministic (seeded or hash-based) so pipeline reruns and
  * task retries produce identical corpora — rand()-based sampling
  * changes under retry, which silently breaks dataset reproducibility
  * at scale.
  */
object Sampling {

  /** Deterministic per-row Bernoulli sample: keep rows whose
    * seeded hash of the id falls under the fraction. Stable across
    * runs, partitionings and retries (unlike df.sample). */
  /** Deterministic train/val/test split: each row's bucket derives
    * from md5 of its id (engine-reproducible, like
    * [[graft.functions.TextFns.featureBucket]]), so the assignment is
    * stable across runs, retries, engines, and corpus growth — a row
    * keeps its split when new data arrives, the property random
    * splits lose. Zero shuffle: one map-side hash per row. */
  def hashSplit(
      df: DataFrame,
      idCol: Column,
      valPct: Int = 10,
      testPct: Int = 10): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct < 100,
      s"bad split: val=$valPct test=$testPct")
    val bucket =
      conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    df.withColumn("split",
      when(bucket < 100 - valPct - testPct, "train")
        .when(bucket < 100 - testPct, "val")
        .otherwise("test"))
  }

  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      seed: Long = 42L): DataFrame =
    df.filter(
      pmod(xxhash64(lit(seed), col(idCol)), lit(1000000L)) <
        (fraction * 1000000L).toLong)

  /** Stratified sampling with per-stratum fractions (cap a dominant
    * language, upweight a rare one). Strata missing from the map fall
    * back to `defaultFraction`. */
  def stratifiedHashSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (k, f)) => when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(
      pmod(xxhash64(lit(seed), col(idCol)), lit(1000000L)) <
        (frac * 1000000L).cast("long"))
  }

  /** Weighted sampling WITHOUT replacement, k rows, inclusion odds
    * proportional to `weight` — Efraimidis–Spirakis A-ES: each row
    * draws a deterministic uniform u from a seeded hash of its id and
    * ranks by u^(1/w); the top k are the sample. The quality-weighted
    * corpus draw ("sample 10M docs, prefer high quality") that
    * rand()-based approaches can't do reproducibly.
    *
    * Plan shape: one map-side key computation + a global top-k, which
    * Spark executes as per-partition top-k + merge
    * (TakeOrderedAndProject) — no global sort, no shuffle of the
    * non-sampled mass. Rows with weight <= 0, NULL or NaN are
    * excluded (a NaN key would sort first under Spark's NaN-largest
    * descending order and hijack the sample). */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weight: Column,
      k: Int,
      seed: Long = 42L): DataFrame = {
    // u in (0,1): (hash mod 2^40 + 0.5) / 2^40; key = u^(1/w),
    // ordered desc with id tiebreak for full determinism
    val u = (pmod(xxhash64(lit(seed), col(idCol)), lit(1L << 40))
      .cast("double") + 0.5) / lit((1L << 40).toDouble)
    val key = pow(u, lit(1.0) / weight.cast("double"))
    df.filter(weight.isNotNull && !isnan(weight.cast("double")) &&
        weight.cast("double") > 0)
      .withColumn("__wkey", key)
      .orderBy(col("__wkey").desc, col(idCol))
      .limit(k)
      .drop("__wkey")
  }

  /** Grouped weighted sampling without replacement: k rows per
    * stratum by the same Efraimidis–Spirakis key as
    * [[weightedSample]], but the per-group top-k runs through the
    * bounded-heap aggregate ([[graft.plans.TopKPairs]]) — k-row
    * state per group, map-side partials, no per-group window sort
    * and no shuffle of the non-sampled mass. The "sample k docs PER
    * SOURCE, prefer high quality" corpus-mixture draw. Same
    * exclusions as weightedSample (weight NULL/NaN/<=0). */
  def groupedWeightedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      weight: Column,
      k: Int,
      seed: Long = 42L): DataFrame = {
    val u = (pmod(xxhash64(lit(seed), col(idCol)), lit(1L << 40))
      .cast("double") + 0.5) / lit((1L << 40).toDouble)
    val key = pow(u, lit(1.0) / weight.cast("double"))
    df.filter(weight.isNotNull && !isnan(weight.cast("double")) &&
        weight.cast("double") > 0)
      .select(col(strataCol), col(idCol), key.as("__wkey"))
      .groupBy(col(strataCol))
      .agg(Similarity.topKAgg(col("__wkey"), col(idCol), k).as("top"))
      .select(col(strataCol), posexplode(col("top")))
      .select(col(strataCol), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol))
  }

  /** Deterministic shard assignment for training-data export: md5 of
    * the id, mod `numShards` — the same engine-portable derivation as
    * [[hashSplit]], so a shard is a stable property of the row (safe
    * under retries, appends, and re-exports) rather than of any
    * partitioning accident. Map-side only, zero shuffle; feed the
    * result to `df.write.partitionBy("shard")` (or
    * [[graft.operators.Scale.partitionedWrite]]) to lay the corpus
    * out as N self-describing shard directories. */
  def hashShard(df: DataFrame, idCol: Column, numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    df.withColumn("shard",
      conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
        .cast("long") % numShards)
  }

  /** Exact per-stratum top-N by a deterministic hash order — a fixed
    * BUDGET per stratum rather than a rate (the "take 1M docs per
    * language" shape). One window per stratum partition. */
  def stratifiedBudget(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      budget: Int,
      seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(xxhash64(lit(seed), col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= budget)
      .drop("__rn")
  }
}
