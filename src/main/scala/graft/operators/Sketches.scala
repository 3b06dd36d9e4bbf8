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
