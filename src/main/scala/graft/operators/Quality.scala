package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Publish-time data-quality audit — the validation layer a registry
  * publish runs before swapping a snapshot live (the reference
  * enforces schemas at normalize time, pipelines/normalize.py +
  * hangarbay/schemas.py; these are the row/key/reference-level checks
  * on top).
  *
  * Every check emits one (check_name, n_violations) row. Scale shape:
  * row-predicate checks over one table FUSE into a single scan
  * ([[expectAll]] — N sums in one map-side aggregate, unpivoted);
  * uniqueness is one hash-agg; referential integrity is one anti-join
  * (parent side broadcast when small, shuffle otherwise — Catalyst's
  * choice). Nothing collects; an audit over a 100 TB table costs the
  * scans, not the checks.
  */
object Quality {

  /** N row-predicate expectations over ONE scan of `df`: each is a
    * conditional sum in the same map-side aggregate, then the single
    * result row is unpivoted to (check_name, n_violations) rows. */
  def expectAll(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val sums = checks.map { case (name, violation) =>
      coalesce(sum(when(violation, 1L).otherwise(0L)), lit(0L))
        .as(s"__c_${name}")
    }
    val one = df.agg(sums.head, sums.tail: _*)
    val stacked = checks.map { case (name, _) =>
      s"'${name.replace("'", "''")}', `__c_${name}`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${checks.size}, $stacked) AS (check_name, n_violations)")
  }

  /** Duplicate-key count: rows beyond the first per key value. */
  def expectUnique(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1), lit(0L)).cast("long")
        .as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Orphaned-child count: child keys with no matching parent row
    * (NULL child keys are not orphans — use a not-null expectation
    * for those). */
  def expectReferential(
      child: DataFrame,
      parent: DataFrame,
      name: String,
      childKey: String,
      parentKey: String): DataFrame =
    // aliased on both sides: child and parent key often share a name
    child.select(col(childKey).as("__ck")).filter(col("__ck").isNotNull)
      .join(parent.select(col(parentKey).as("__pk")),
        col("__ck") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Functional-dependency consistency audit: how functional is
    * lhs → rhs? Per lhs key: row count, distinct rhs values, the
    * DOMINANT rhs value (max count; ties broken by MIN value, so the
    * election is deterministic and engine-portable — mode() tie
    * order differs across engines), rows agreeing with it, and the
    * agreement ratio. ratio = 1.0 for every key ⟺ the FD holds
    * exactly; anything lower localizes the violating keys — the
    * profiling step before enforcing a dependency or repairing to
    * the majority value (Metanome-style FD discovery reduced to the
    * one candidate pair under test).
    *
    * Two hash aggregates, both shuffling on the lhs key (the second
    * reuses the first's partitioning — no extra exchange): scales as
    * any groupBy; output is |lhs domain| rows. */
  def fdConsistency(df: DataFrame, lhs: Column, rhs: Column): DataFrame =
    df.groupBy(lhs.as("key"), rhs.as("val"))
      .agg(count(lit(1)).as("n"))
      .groupBy("key")
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_vals"),
        min(struct((-col("n")).as("negn"), col("val").as("v")))
          .as("__dom"))
      .select(col("key"), col("n_rows"), col("n_vals"),
        col("__dom.v").as("dominant_val"),
        (-col("__dom.negn")).as("n_consistent"),
        (floor((-col("__dom.negn")) / col("n_rows") * 10000) / 10000)
          .as("consistency"))

  /** One-pass column profiler: per-column row/null/distinct counts
    * plus min/max, over a SINGLE aggregate of one scan — the
    * "describe my table" primitive a registry status call needs
    * without N per-column scans.
    *
    * Numeric columns report min/max as doubles (`min_num`/`max_num`);
    * string columns as strings (`min_str`/`max_str`) — keeping the
    * output schema fixed and engine-portable (no numeric→string casts,
    * whose text forms differ across engines). Exact multi-column
    * distinct counts plan through Catalyst's Expand (one shuffle,
    * input replicated ×|cols| map-side — the canonical exact plan;
    * swap in approx_count_distinct per column if a 100 TB profile can
    * tolerate ~2% error and wants the Expand gone). String min/max
    * aggregate in a SEPARATE pass: their immutable string buffers
    * disqualify HashAggregate, and a SortAggregate downstream of the
    * Expand would sort |rows|×|cols| — split off, they run as a
    * grouping-free streaming fold (5× measured on the lineitem
    * profile) and the two one-row results cross-join for free. The
    * per-column unpivot of the single row is driver-trivial. */
  def profile(
      df: DataFrame,
      numericCols: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    require(numericCols.nonEmpty || stringCols.nonEmpty, "no columns")
    val all = numericCols ++ stringCols
    // Shape (round 12): ONE full-width scan computes every hash-able
    // statistic (counts, null counts, numeric min/max) in a single
    // row; each column's EXACT distinct count runs as its OWN
    // two-phase distinct branch (partial dedup map-side, shuffle of
    // distinct values only); string min/max keep their separate tiny
    // aggregate (immutable agg buffers would drag the main aggregate
    // to SortAggregate). The one-row frames crossJoin (broadcast-
    // trivial) and unpivot. The previous one-scan form put N exact
    // countDistincts in a single aggregate, which Catalyst plans as
    // an Expand — one projected copy of every row PER column feeding
    // a giant multi-key distinct-agg: measured 14× DuckDB at sf1.0.
    // Here every branch is a parallel stage of one job, each scan is
    // column-pruned, and the only material shuffle is per-column
    // distinct values (Q35Probe: 8.6 s → ~0.8 s at sf1.0).
    val hashable = all.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        count(lit(1)).minus(count(col(c))).cast("long").as(s"__nulls_$c")) ++
      (if (numericCols.contains(c))
        Seq(min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c"))
      else Seq.empty)
    }
    val stringy = stringCols.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val distincts = all.map { c =>
      df.select(col(c)).distinct().agg(count(col(c)).as(s"__dist_$c"))
    }
    val statRow = df.agg(hashable.head, hashable.tail: _*)
    val withStr =
      if (stringy.isEmpty) statRow
      else statRow.crossJoin(
        broadcast(df.agg(stringy.head, stringy.tail: _*)))
    val one = distincts.foldLeft(withStr)((acc, d) => acc.crossJoin(d))
    val rows = all.map { c =>
      val numeric = numericCols.contains(c)
      struct(
        lit(c).as("column_name"),
        col(s"__n_$c").as("n"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"),
        (if (numeric) col(s"__min_$c") else lit(null).cast("double"))
          .as("min_num"),
        (if (numeric) col(s"__max_$c") else lit(null).cast("double"))
          .as("max_num"),
        (if (numeric) lit(null).cast("string") else col(s"__min_$c"))
          .as("min_str"),
        (if (numeric) lit(null).cast("string") else col(s"__max_$c"))
          .as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Equi-width histogram in two aggregate passes: a one-row min/max
    * aggregate (broadcast — it is a single row) then a bucket-id
    * hash-agg with map-side partials. No sort, no collect; the only
    * shuffle is the nBuckets-row final combine. The top edge closes
    * the last bucket (max lands in bucket nBuckets-1, not nBuckets).
    *
    * Bucket arithmetic is plain IEEE double ops in a fixed shape
    * (`(v - mn) / w`, `w = (mx - mn) / nBuckets`) so an oracle
    * writing the SAME shape is bit-identical. Degenerate input
    * (mn == mx or a single row) folds into bucket 0. */
  def histogram(df: DataFrame, value: Column, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets=$nBuckets")
    val mm = df.agg(min(value).cast("double").as("__mn"),
      max(value).cast("double").as("__mx"))
    val w = (col("__mx") - col("__mn")) / nBuckets
    val v = value.cast("double")
    val bucket = when(col("__mx") === col("__mn"), 0L)
      .otherwise(least(floor((v - col("__mn")) / w), lit(nBuckets - 1L)))
      .cast("long")
    df.join(broadcast(mm))
      .filter(value.isNotNull)
      .select(bucket.as("bucket"), col("__mn"), col("__mx"))
      .groupBy("bucket", "__mn", "__mx")
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (col("__mn") + col("bucket") * ((col("__mx") - col("__mn")) / nBuckets))
          .as("lo"),
        (col("__mn") + (col("bucket") + 1) *
          ((col("__mx") - col("__mn")) / nBuckets)).as("hi"),
        col("n"))
  }

  /** Combine check frames into the audit report, pass/fail flagged. */
  def audit(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionAll _)
      .withColumn("status",
        when(col("n_violations") === 0, lit("pass")).otherwise(lit("fail")))
}
