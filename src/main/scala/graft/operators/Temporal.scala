package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators over event streams: gap sessionization and
  * as-of (backward) joins.
  *
  * Both are single-shuffle designs: partition by the entity key, sort
  * within partition by time — the canonical scalable layout (no
  * global sort, no driver loops). Window state is bounded per key.
  */
object Temporal {

  /** Merge a stored rollup with a delta's partial aggregates WITHOUT
    * rescanning history — the incremental daily-ETL pattern: additive
    * aggregates (counts, sums) are associative, so yesterday's rollup
    * table plus today's delta partials re-aggregate to exactly the
    * full recompute. At 100 TB this is the difference between
    * scanning one day and scanning the archive.
    *
    * Both inputs must carry the same `keys` and the same additive
    * measure columns `sumCols` (the delta side already aggregated to
    * partials with the same expressions). Non-additive aggregates
    * (avg, distinct) must be carried as additive parts
    * (sum+count, sketches — see a02's HLL rollup) — not ratios. */
  def mergeRollup(
      base: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String]): DataFrame =
    base.unionAll(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same key exceeds `gapSeconds`. Returns
    * one row per session with count and span (epoch-micros bounds).
    *
    * `key`/`ts`/`tie` name columns of `events`; `tie` makes the
    * within-key order total so session ids are deterministic. */
  def sessionize(
      events: DataFrame,
      key: String,
      ts: String,
      tie: String,
      gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    val cum = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col(ts), 1).over(byKey))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(ts)) - unix_micros(col("__prev")) >
            gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(cum))
      .groupBy(col(key), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col(ts))).as("start_us"),
        max(unix_micros(col(ts))).as("end_us"))
  }

  /** Top opening event-type paths across sessions — the funnel-
    * EXPLORATION report that precedes a funnel definition (e11
    * measures a path you already chose; this surfaces which paths
    * exist and how common they are): each session's first `depth`
    * event types joined with '>' form its path, counted across all
    * sessions, top `topK` by frequency.
    *
    * One shuffle at 100 TB: the session labeling reuses
    * [[sessionize]]'s (key-partition, time-sort) window; the
    * per-session ranking window partitions by (key, session_id) —
    * a superset of the key partitioning, so Spark adds only a sort,
    * no second exchange. Path cardinality is bounded by
    * |event types|^depth, so the final count is a tiny hash
    * aggregate and the top-k is TakeOrdered (per-partition heap +
    * k-row driver merge). Ordering (n_sessions desc, path) is total,
    * so the limit is deterministic and engine-portable. */
  def sessionPaths(
      events: DataFrame,
      key: String,
      ts: String,
      tie: String,
      typeCol: String,
      gapSeconds: Long,
      depth: Int = 3,
      topK: Int = 20): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    val cum = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bySess = Window.partitionBy(col(key), col("session_id"))
      .orderBy(col(ts), col(tie))
    events
      .withColumn("__prev", lag(col(ts), 1).over(byKey))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(ts)) - unix_micros(col("__prev")) >
            gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(cum))
      .withColumn("__rn", row_number().over(bySess))
      .filter(col("__rn") <= depth)
      .groupBy(col(key), col("session_id"))
      // collect_list order is nondeterministic — sort by the rank
      // carried inside the struct, then project the types out
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__rn").as("rn"),
            col(typeCol).as("t")))),
          s => s.getField("t")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topK)
  }

  /** Backward as-of join: for each left row, the latest right row
    * with right.ts <= left.ts on the same key; ties on ts resolve to
    * the largest right `value`. `left` must carry columns (key, ts,
    * …payload); `right` exactly (key, ts, value). Output: left's
    * payload columns + `matched_<value>`.
    *
    * Implemented as the union-and-carry pattern: tag both sides,
    * union, ONE shuffle on the key, sort by (ts, tag, value) within
    * partition, carry the last non-null right value forward. Right
    * rows sort before left rows at equal ts, giving <= semantics.
    * At 100 TB this is one shuffle of left+right — no per-row range
    * probe, no broadcast of the big side. */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      value: String): DataFrame = {
    val payload = left.columns.filterNot(c => c == key || c == ts).toSeq
    val valueType = right.schema(value).dataType
    val l = left
      .withColumn("__tag", lit(1))
      .withColumn(value, lit(null).cast(valueType))
    val r = payload.foldLeft(
        right.withColumn("__tag", lit(0))) { (acc, c) =>
      acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col).toSeq: _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__tag"), col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(s"matched_$value",
        last(col(value), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select((payload.map(col) :+ col(s"matched_$value")): _*)
  }

  /** Binned range (interval) join: every left row pairs with the
    * right rows whose timestamp falls in
    * `[left.ts + lowerUs, left.ts + upperUs]` (bounds inclusive,
    * epoch-micros arithmetic). No equi-key required.
    *
    * Spark plans a bare inequality join as BroadcastNestedLoop or a
    * cartesian product — quadratic and undistributable at scale. This
    * form converts it to an EQUI-join: bucket time into fixed bins of
    * width `upperUs - lowerUs`, explode each LEFT row into the (≤2)
    * bins its window overlaps, hash-join on the bin id, then apply
    * the exact range predicate. Each matching pair survives exactly
    * once (the right row's bin is a single value and the exploded
    * left bins are distinct). Cost: one hash shuffle of each side on
    * the bin id + ≤2× left duplication — the same shape DuckDB's
    * IEJoin and Flink's interval join optimize to, expressed with
    * stock Catalyst operators so AQE/codegen still apply.
    *
    * `left`/`right` must not share column names (rename before the
    * call); `leftTs`/`rightTs` are timestamp columns. Bin arithmetic
    * stays in exact integer space (pmod + exact double division of a
    * multiple of the width — both < 2^53, so IEEE division is exact;
    * no float-boundary bin misses). */
  def rangeJoin(
      left: DataFrame,
      leftTs: String,
      right: DataFrame,
      rightTs: String,
      lowerUs: Long,
      upperUs: Long): DataFrame = {
    require(upperUs > lowerUs,
      s"empty range: lowerUs=$lowerUs upperUs=$upperUs")
    val w = upperUs - lowerUs
    def binOf(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(w))) / lit(w)).cast("long")
    val lUs = unix_micros(col(leftTs))
    val rUs = unix_micros(col(rightTs))
    val l = left.withColumn("__bin",
      explode(array_distinct(array(
        binOf(lUs + lit(lowerUs)), binOf(lUs + lit(upperUs))))))
    val r = right.withColumn("__bin", binOf(rUs))
    l.join(r, Seq("__bin"))
      .filter(rUs >= lUs + lit(lowerUs) && rUs <= lUs + lit(upperUs))
      .drop("__bin")
  }

  /** Time-series regularization: resample each key's event stream
    * onto the corpus's daily grid, forward-filling the latest value —
    * the gap-fill step before any windowed feature extraction over
    * irregular events (days with no events carry the last observation
    * forward; days before a key's first event stay NULL).
    *
    * Scale shape: last-observation-per-(key, day) is one windowed
    * pick; the grid is |keys| × |days| rows built from a broadcast
    * one-row bounds aggregate (days explode map-side, never
    * collected); the forward fill is ONE shuffle on the key with a
    * running `last(ignoreNulls)` window — bounded state per key, no
    * driver loops. `tie` breaks same-timestamp ties (latest event_id
    * wins). */
  def resampleDailyFill(
      events: DataFrame,
      key: String,
      ts: String,
      tie: String,
      value: String): DataFrame = {
    val perDay = Window.partitionBy(col(key), col("__d"))
      .orderBy(col(ts).desc, col(tie).desc)
    val lastPerDay = events
      .select(col(key), to_date(col(ts)).as("__d"), col(ts), col(tie),
        col(value))
      .withColumn("__rn", row_number().over(perDay))
      .filter(col("__rn") === 1)
      .select(col(key), col("__d"), col(value))
    val days = events
      .agg(min(to_date(col(ts))).as("__d0"), max(to_date(col(ts))).as("__d1"))
      .select(explode(expr("sequence(__d0, __d1, interval 1 day)"))
        .as("__d"))
    val grid = events.select(col(key)).distinct()
      .crossJoin(broadcast(days))
    val fill = Window.partitionBy(col(key)).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastPerDay, Seq(key, "__d"), "left")
      .withColumn("__v", last(col(value), ignoreNulls = true).over(fill))
      .select(col(key), col("__d").as("day"), col("__v").as(value))
  }

  /** As-of join through the custom physical operator
    * ([[graft.plans.AsOfJoinExec]]): same semantics as
    * [[asofBackward]], but planned as a native sort-merge with O(1)
    * merge state instead of a union + running window. Key/ts/value
    * must be long-typed (timestamps qualify — micros internally). */
  def asofBackwardExec(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      value: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val spark = left.sparkSession
    graft.plans.AsOfJoin.install(spark)
    val node = graft.plans.AsOfJoinNode.create(
      GraftBridge.logicalPlan(left), GraftBridge.logicalPlan(right),
      GraftBridge.expression(left.col(key)),
      GraftBridge.expression(left.col(ts)),
      GraftBridge.expression(right.col(key)),
      GraftBridge.expression(right.col(ts)),
      GraftBridge.expression(right.col(value)),
      s"matched_$value")
    GraftBridge.ofRows(spark, node)
  }
}
