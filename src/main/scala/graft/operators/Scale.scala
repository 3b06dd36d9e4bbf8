package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

import graft.plans.{BloomMightContain, LowerBound}

/** Scale-out utilities: skew-salted joins and pruned data layouts.
  *
  * AQE handles moderate skew at runtime (skew-join splitting); the
  * salted join is the explicit form for pathological hot keys where
  * one key exceeds a single executor's memory — the standard recipe
  * on a 1000-executor cluster.
  */
object Scale {

  /** Skew-salted equi-join: the big (skewed) side gets a
    * deterministic salt derived from a secondary column, the small
    * side is replicated numSalts times, and the join key becomes
    * (key, salt) — splitting each hot key's rows across numSalts
    * reducers. Results are identical to a plain inner join on `key`.
    *
    * `saltSource` must be a column of the big side (any
    * high-cardinality column; a row id is ideal) — using a hash of it
    * keeps the salt deterministic across retries, unlike rand(). */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltSource: Column,
      numSalts: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(numSalts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until numSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Derive [[saltedJoin]]'s salt factor from a MEASURED skew profile
    * — the wiring from measurement (the q43 hot-key report) to remedy.
    * The hottest key's reducer would receive `hot` rows where the
    * average shuffle partition receives `total / parallelism`; the
    * salt factor is the number of ways the hot key must split so its
    * slice matches an average partition's load, clamped to
    * [1, maxSalts]. 1 means the keys are balanced and salting would
    * only add replication cost. One cheap two-level aggregate job
    * (map-side partials; the shuffle carries one row per distinct
    * key, the second level collapses to a single row).
    *
    * @param parallelism target reducer count; <= 0 reads
    *   spark.sql.shuffle.partitions (the count the real join will use)
    */
  def suggestNumSalts(
      big: DataFrame,
      key: String,
      maxSalts: Int = 64,
      parallelism: Int = 0): Int = {
    val p = if (parallelism > 0) parallelism
      else big.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val row = big.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("hot"), sum(col("n")).as("total")).head()
    if (row.isNullAt(0)) 1
    else {
      val hot = row.getLong(0)
      val avgPerPartition = math.max(1.0, row.getLong(1).toDouble / p)
      math.max(1, math.min(maxSalts,
        math.ceil(hot / avgPerPartition).toInt))
    }
  }

  /** [[saltedJoin]] with the salt factor derived from the measured
    * profile ([[suggestNumSalts]]): balanced keys take the plain join
    * (no replication cost), skewed keys split by exactly the multiple
    * the measurement says they need. The measurement job scans only
    * the key column — at 100 TB it's a fraction of the join it tunes,
    * and in a recurring pipeline the factor can be measured once per
    * snapshot and passed to [[saltedJoin]] directly. */
  def autoSaltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltSource: Column,
      maxSalts: Int = 64): DataFrame = {
    val n = suggestNumSalts(big, key, maxSalts)
    if (n <= 1) big.join(small, Seq(key))
    else saltedJoin(big, small, key, saltSource, n)
  }

  /** Cost-based equi-join strategy gate: ONE measurement pass picks
    * plain / broadcast / salted, completing the q43→remedy wiring.
    * Decision order mirrors what a cluster pays for: (1) a small
    * side under `broadcastRows` ships to every executor and the big
    * side never shuffles at all — skew is then irrelevant, so
    * broadcast wins outright; (2) otherwise the big side's measured
    * key skew ([[suggestNumSalts]]) decides between the plain
    * shuffle join and [[saltedJoin]] at exactly the replication the
    * measurement says the hot key needs. Results are identical to a
    * plain inner join in every regime (spec-asserted per regime).
    *
    * The two measurement jobs are bounded: a count capped at
    * `broadcastRows + 1` via limit on the small side, and the
    * key-column aggregate of [[suggestNumSalts]] on the big side
    * (skipped entirely when broadcast already won). At 100 TB both
    * are a fraction of the join they tune; in a recurring pipeline
    * measure once per snapshot and call the chosen form directly. */
  def adaptiveJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltSource: Column,
      broadcastRows: Long = 1000000L,
      maxSalts: Int = 64): DataFrame = {
    val smallCapped = small.limit(
      (broadcastRows + 1).min(Int.MaxValue.toLong).toInt).count()
    if (smallCapped <= broadcastRows)
      big.join(org.apache.spark.sql.functions.broadcast(small), Seq(key))
    else autoSaltedJoin(big, small, key, saltSource, maxSalts)
  }

  /** Bloom-pruned equi-join: semi-join reduction for the case where
    * the small side is too big to BROADCAST but its key set fits a
    * bloom filter. The filter is built distributed over the small
    * side's keys (one aggregate job, a few MB of bits for tens of
    * millions of keys), then probed MAP-SIDE on the big side — inside
    * the scan's codegen, before the shuffle — so non-matching fact
    * rows never enter the exchange. At 100 TB this is the difference
    * between shuffling the whole fact table and shuffling the ~match
    * fraction (plus fpp).
    *
    * Correctness is unconditional: bloom filters have false positives
    * (removed by the exact join) but no false negatives, so the
    * result is identical to the plain join — which is exactly how the
    * oracle checks it.
    *
    * @param expectedItems sizing hint for the filter; <= 0 counts the
    *   small side first (one extra cheap job). */
  def bloomPrunedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    val items = if (expectedItems > 0) expectedItems
      else math.max(small.count(), 1L)
    // build and probe must hash the same representation: cast both
    // sides to long (putLong / mightContainLong)
    val bf = small.select(col(smallKey).cast("long").as("__k"))
      .stat.bloomFilter("__k", items, fpp)
    val pruned = big.filter(GraftBridge.column(BloomMightContain(
      GraftBridge.expression(col(bigKey).cast("long")), bf)))
    pruned.join(small, pruned(bigKey) === small(smallKey))
  }

  /** Compact a parquet directory to ~`targetFileBytes` output files —
    * the small-file remedy every long-lived 100 TB layout needs (a
    * streaming sink or over-parallel writer leaves thousands of tiny
    * files; each costs a task, a footer read, and an open per scan).
    * File count is sized from the ACTUAL on-disk bytes; coalesce (no
    * shuffle) when reducing, repartition when the directory has fewer
    * files than needed. Writes to `destPath` (compact-then-swap is
    * the caller's atomicity contract — never rewrite in place). */
  def compact(
      df: DataFrame,
      srcPath: String,
      destPath: String,
      targetFileBytes: Long = 128L << 20): Unit = {
    val spark = df.sparkSession
    val bytes = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .load(srcPath)
      .agg(sum(col("length"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val current = df.rdd.getNumPartitions
    val sized =
      if (nFiles < current) df.coalesce(nFiles)
      else if (nFiles > current) df.repartition(nFiles)
      else df
    sized.write.mode("overwrite").parquet(destPath)
  }

  /** Z-order (Morton curve) layout write: quantile-bucket codes of
    * TWO columns are bit-interleaved into one sort key; the data is
    * range-partitioned and sorted by it. Each output file then covers
    * a small rectangle in (colA, colB) space, so parquet min/max
    * stats prune files/row groups for predicates on EITHER column —
    * where a single-column sort prunes one column and leaves the
    * other spanning every file. The standard multi-dimension
    * clustering layout for a 100 TB table queried on several keys.
    *
    * Mechanics: per-column boundaries from one `percentile_approx`
    * pass (boundary placement only balances the curve, never affects
    * correctness), codes assigned via the codegen'd binary-search
    * [[graft.plans.LowerBound]], interleave in plain shift/or
    * expressions — everything stays in whole-stage codegen. NULLs
    * sort first (range partitioning on a null z-value). */
  def zOrderedWrite(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      numFiles: Int = 64,
      bits: Int = 8): Unit = {
    val nCuts = (1 << bits) - 1
    val cuts = array((1 to nCuts).map(i =>
      lit(i.toDouble / (nCuts + 1))): _*)
    def cutsOf(c: String) =
      percentile_approx(col(c).cast("double"), cuts, lit(1000))
    val bounds = df.agg(cutsOf(colA).as("a"), cutsOf(colB).as("b")).head()
    def code(c: String, idx: Int): Column = GraftBridge.column(LowerBound(
      GraftBridge.expression(
        typedLit(bounds.getSeq[Double](idx).toSeq)),
      GraftBridge.expression(col(c).cast("double"))))
    val (a, b) = (code(colA, 0), code(colB, 1))
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i + 1)
          .cast("long"))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i)
          .cast("long"))
    }
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }

  /** Write a table partitioned by low-cardinality columns and sorted
    * within files — the layout that turns full scans into pruned
    * scans (PartitionFilters) and enables row-group skipping on the
    * sort key at 100 TB. */
  def partitionedWrite(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(path)
}
