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

  /** Additional IO posture for LOCAL measurement/verify sessions
    * (Bench, Verify, the probes, the test suite) — NOT part of
    * [[tuning]] because it is sized to the local fixtures, not to a
    * production cluster.
    *
    * The local testdata ships as one parquet file per table with
    * small row groups (~1-4 MB; tools.ScaleGen). Spark's default
    * 128 MB `maxPartitionBytes` packs ALL of a table's row groups
    * into one split, so every scan-bound operator runs its map work
    * on a single core — round 12 measured q35's profile 3× slower
    * than its shape deserved purely from this. 4 MB splits put
    * roughly one row group per task at the fixture's block size
    * (row groups are the parallelism quantum: Spark assigns each to
    * the split holding its midpoint). `openCostInBytes` drops with
    * it so many-small-file sources (LSM fold parts) still pack
    * sensibly. On a 1000-executor cluster reading 100 TB the
    * DEFAULTS are right (128 MB splits ≈ one HDFS/S3 block, else
    * 25M tasks); these two knobs are the local-mode translation of
    * the same per-core-work target. */
  val localIo: Map[String, String] = Map(
    "spark.sql.files.maxPartitionBytes" -> (4L << 20).toString,
    "spark.sql.files.openCostInBytes" -> (1L << 20).toString)

  def tuneLocal(b: SparkSession.Builder): SparkSession.Builder =
    localIo.foldLeft(tune(b)) { case (bb, (k, v)) => bb.config(k, v) }
}
