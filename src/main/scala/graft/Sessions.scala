package graft

import org.apache.spark.sql.SparkSession

/** Session conf defaults every graft entry point applies
  * (Bench/Verify/Cli mains, the test suite, the measurement
  * probes) — performance posture that belongs to the ENGINE, not to
  * any one query.
  *
  * `objectHashAggregate.sortBased.fallbackThreshold`: every
  * TypedImperativeAggregate here (the top-k heaps, KMV/CMS/Bloom/GK
  * sketches) plans as ObjectHashAggregate, which abandons hashing
  * and SORTS THE WHOLE INPUT once a partition sees more than this
  * many distinct groups — at Spark's default of 128, the k-NN
  * graph's "bounded-heap, no sort" aggregate silently degraded into
  * a sort of ~3×10⁸ candidate rows at sf1.0 (measured 5.6× on the
  * p15 pre-prune: 57 s → 10 s). 2¹⁷ groups × the ~KB heap/sketch
  * buffers this engine aggregates ≈ 100-200 MB per task — safe at
  * the 8-cores/8-GiB executor shape the memory rehearsal pins —
  * while cardinalities beyond it (no current operator's group count
  * per task) still fall back to sort rather than OOM. */
object Sessions {
  val tuning: Map[String, String] = Map(
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" ->
      (1 << 17).toString)

  def tune(b: SparkSession.Builder): SparkSession.Builder =
    tuning.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
