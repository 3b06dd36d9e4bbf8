package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-backed operators beyond Spark's built-ins (HLL lives in
  * a01/a02 via hll_sketch_agg): frequent-items via Misra–Gries with
  * an exact verification pass.
  */
object Sketches {

  /** Misra–Gries candidate summary as an aggregate column
    * ([[graft.plans.MisraGries]]): array<struct<key, est>> of at most
    * `m` entries, guaranteed to contain every key with frequency
    * > n/(m+1). */
  def mgSummary(key: Column, m: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.MisraGries(GraftBridge.expression(key), m)
        .toAggregateExpression())
  }

  /** KMV distinct-set sketch ([[graft.plans.KmvSketch]]) over a
    * 64-bit hash column: array<bigint> of the k smallest distinct
    * (unsigned-order-transformed) hashes. */
  def kmvSketch(hash: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.KmvSketch(GraftBridge.expression(hash), k)
        .toAggregateExpression())
  }

  private val TwoPow64 = 1.8446744073709552E19

  /** Distinct-count estimate from a KMV sketch: (k−1)/u_k with u_k
    * the k-th smallest hash normalized to [0,1); a sketch smaller
    * than k IS the distinct hash set, so the count is exact. */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit(k - 1.0) /
        (element_at(sketch, k).cast("double") / TwoPow64 + 0.5))

  /** The k smallest of A∪B — itself a valid KMV sketch of the union
    * (closure under union is the point of KMV). */
  def kmvUnion(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Jaccard estimate: the union sketch is a uniform sample of A∪B,
    * so the fraction of it present in BOTH input sketches estimates
    * |A∩B| / |A∪B| — the estimate HLL sketches cannot give. Plain
    * array built-ins: sketches compare engine-side, no UDFs. */
  def kmvJaccard(a: Column, b: Column, k: Int): Column = {
    val merged = kmvUnion(a, b, k)
    size(array_intersect(merged, array_intersect(a, b))).cast("double") /
      size(merged)
  }

  /** Distinct-intersection estimate: Jaccard × |A∪B| estimate.
    * Convenience composition — array expressions get no CSE, so this
    * builds the union sketch twice; in hot paths materialize
    * [[kmvUnion]] in a select first and derive both factors from the
    * materialized column (the a04 query shows the staged shape). */
  def kmvIntersect(a: Column, b: Column, k: Int): Column =
    kmvJaccard(a, b, k) * kmvEstimate(kmvUnion(a, b, k), k)

  /** Greenwald-Khanna quantile sketch of a double column as a STORED
    * binary ([[graft.plans.GkSketch]]) — the quantile member of the
    * stored-sketch family: persist one per day/partition, answer any
    * range's percentiles later by merging. */
  def gkSketch(value: Column, relativeError: Double = 0.01): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.GkSketch(GraftBridge.expression(value), relativeError)
        .toAggregateExpression())
  }

  /** Merge stored GK sketch binaries ([[graft.plans.GkMerge]]):
    * rollup aggregate over the binary sketch column. */
  def gkMerge(sketch: Column, relativeError: Double = 0.01): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.GkMerge(GraftBridge.expression(sketch), relativeError)
        .toAggregateExpression())
  }

  /** Quantile estimates from a stored GK sketch binary
    * ([[graft.plans.GkQuery]]): array<double>, NULL on empty. */
  def gkQuantiles(sketch: Column, percentiles: Seq[Double]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.GkQuery(GraftBridge.expression(sketch), percentiles))
  }

  /** Bloom membership filter of a long-key column as a STORED binary
    * ([[graft.plans.BloomSketchAgg]]). */
  def bloomSketch(key: Column, expectedItems: Long,
      fpp: Double = 0.01): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.BloomSketchAgg(
        GraftBridge.expression(key), expectedItems, fpp)
        .toAggregateExpression())
  }

  /** Merge stored bloom filter binaries ([[graft.plans.BloomMergeAgg]]);
    * parameters must match the build side. */
  def bloomMerge(sketch: Column, expectedItems: Long,
      fpp: Double = 0.01): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.BloomMergeAgg(
        GraftBridge.expression(sketch), expectedItems, fpp)
        .toAggregateExpression())
  }

  /** Count-min frequency sketch of a long-key column as a STORED
    * binary ([[graft.plans.CmsSketchAgg]]): point-frequency estimates
    * that never undercount, mergeable by counter linearity. */
  def cmsSketch(key: Column, eps: Double = 0.001,
      confidence: Double = 0.99): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.CmsSketchAgg(GraftBridge.expression(key), eps, confidence)
        .toAggregateExpression())
  }

  /** Merge stored count-min sketch binaries
    * ([[graft.plans.CmsMergeAgg]]); parameters must match the build
    * side — merged counters are byte-identical to a one-shot build. */
  def cmsMerge(sketch: Column, eps: Double = 0.001,
      confidence: Double = 0.99): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.CmsMergeAgg(GraftBridge.expression(sketch), eps, confidence)
        .toAggregateExpression())
  }

  /** EXACT top-k heavy hitters without a full-cardinality groupBy:
    * pass 1 aggregates an m-counter Misra–Gries summary (bounded
    * state, map-side partials — the shuffle is m rows, not one per
    * distinct key); pass 2 re-counts ONLY candidate keys exactly (the
    * ≤m candidates broadcast into a semi-join, so non-candidate rows
    * die map-side before the shuffle) and takes the top k.
    *
    * Exactness requires the true top-k inside the candidate set,
    * which MG guarantees whenever the k-th frequency exceeds
    * n/(m+1) — size m accordingly (SketchSpec asserts the bound).
    * Keys are compared as strings; ties break key-ascending. */
  def heavyHitters(df: DataFrame, keyCol: Column, m: Int, k: Int): DataFrame = {
    val keyed = df.select(keyCol.cast("string").as("key"))
    val cands = keyed.agg(mgSummary(col("key"), m).as("cands"))
      .select(explode(col("cands")).as("c"))
      .select(col("c.key").as("key"))
    keyed
      .join(broadcast(cands), Seq("key"), "left_semi")
      .groupBy("key")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)
  }
}
