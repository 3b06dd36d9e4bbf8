package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** LSM-shaped durable fold state for `foreachBatch` pipelines — the
  * storage half of every corpus-sized incremental fold here
  * (p03/p06/p14/p15/p16/p17, e14's upsert, p08-p10's verdict
  * accumulators, p05's IVF index).
  *
  * WHY: the naive fold (union prior snapshot with the batch delta,
  * `mode("overwrite")` the whole thing) writes O(corpus) per
  * micro-batch — at 100 TB a 1 TB/day ingest would rewrite a 100 TB
  * snapshot daily, making the "incremental" claim's cost O(corpus),
  * not O(batch). The LSM shape fixes the write path:
  *
  *   - [[append]]: each micro-batch writes ONLY its delta as one part
  *     dir (`parts/b<id>`), `mode("overwrite")` keyed on the batch id
  *     so a checkpoint replay overwrites instead of duplicating —
  *     O(batch) bytes per trigger, always.
  *   - [[maybeCompact]]: every `compactEvery` batches the accumulated
  *     parts fold into a compacted snapshot (versioned dir + atomic
  *     pointer) and the parts are removed — O(state), amortized
  *     1/compactEvery per batch, exactly a log-structured merge
  *     tree's level merge.
  *   - [[view]]/[[result]]: readers fold (compacted ∪ ≤compactEvery
  *     parts) through the state's `fold` function.
  *
  * Each compacted snapshot carries a `_folded` manifest naming the
  * parts merged into it, and [[view]] excludes manifest-listed parts
  * — so a crash between the pointer move and part cleanup can NEVER
  * present a part's rows twice, and reads pay no defensive
  * dedup shuffle. The `fold` contract is therefore purely
  * semantic: applied to the duplicate-free union of the snapshot and
  * live parts, it merges per-batch partial states into the exact
  * global state — a per-key monoid aggregate (`groupBy(k).agg(
  * min/max/sum…)`, latest-per-key, bounded top-k) — or `identity`
  * when parts are already disjoint rows of the final state (per-id
  * verdicts, anti-joined accepted sets, discovered-once pair sets).
  *
  * Crash-window inventory (each safe):
  *   - died mid-part-write → replay rewrites the part (overwrite);
  *   - died after part write, before checkpoint commit → the batch
  *     replays and overwrites its part with identical content
  *     (callers computing a delta AGAINST the current state must
  *     exclude the replaying batch's own part — `view(except)` — so
  *     the recompute is deterministic);
  *   - died mid-compaction before the pointer move → old pointer and
  *     parts intact, the next compaction redoes the work;
  *   - died after the pointer move, before part cleanup → leftover
  *     parts are named by the new snapshot's `_folded` manifest and
  *     excluded from every view until removed;
  *   - batch replays after its own compaction's pointer move → the
  *     rewrite diverts to a sibling path (`v<id>c`): reading a path
  *     while overwriting it is rejected by Spark.
  *
  * Reference analog: the reference rebuilds its DuckDB publish from
  * each full snapshot (pipelines/publish.py); this is the
  * ingest-incremental replacement for that rebuild at a scale where
  * rebuilding is not an option.
  */
final class LsmState(
    spark: SparkSession,
    root: String,
    fold: DataFrame => DataFrame,
    compactEvery: Int = 8) {
  require(compactEvery >= 1, s"compactEvery must be >= 1: $compactEvery")

  private val latestFile = java.nio.file.Paths.get(root, "_latest")
  private val partsRoot = java.nio.file.Paths.get(root, "parts")

  def readPtr(): Option[String] =
    if (java.nio.file.Files.exists(latestFile))
      Some(java.nio.file.Files.readString(latestFile).trim)
        .filter(_.nonEmpty)
    else None

  private def listParts(except: Option[Long]): Seq[String] =
    if (java.nio.file.Files.isDirectory(partsRoot)) {
      val skip = except.map(id => s"b$id")
      val s = java.nio.file.Files.list(partsRoot)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("b") &&
          !skip.contains(p.getFileName.toString))
        .map(_.toString).toList.sorted
      finally s.close()
    } else Nil

  /** Part names the pointed-at snapshot already folded (its `_folded`
    * manifest) — excluded from every view so a compaction crash
    * between the pointer move and part cleanup can't double-present
    * rows. Missing manifest (pre-manifest state dirs) → empty. */
  private def foldedParts(): Set[String] = readPtr() match {
    case None => Set.empty
    case Some(p) =>
      val mf = java.nio.file.Paths.get(p, "_folded")
      if (java.nio.file.Files.exists(mf))
        java.nio.file.Files.readString(mf).split("\n")
          .map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
  }

  /** The folded current state: compacted snapshot ∪ live unfolded
    * parts, merged through `fold`. `except` excludes one batch's own
    * part — a replaying batch probing the state it is about to
    * rewrite must not see its own pre-crash output, or the recompute
    * isn't deterministic (worst case: an anti-join fold rejects the
    * whole batch against itself and publishes an empty part). */
  def view(except: Option[Long] = None): Option[DataFrame] = {
    val folded = foldedParts()
    val live = listParts(except).filterNot(p =>
      folded.contains(java.nio.file.Paths.get(p).getFileName.toString))
    val srcs = readPtr().toSeq ++ live
    if (srcs.isEmpty) None
    else Some(fold(srcs.map(spark.read.parquet(_)).reduce(_ unionByName _)))
  }

  /** O(batch): write this batch's delta as its own part dir,
    * overwrite-keyed on the batch id (checkpoint replays are
    * idempotent). */
  def append(id: Long, delta: DataFrame): Unit =
    delta.write.mode("overwrite").parquet(s"$root/parts/b$id")

  /** Amortized compaction: every `compactEvery` batches, fold the
    * whole view into a fresh versioned snapshot, record the folded
    * part names in the snapshot's `_folded` manifest (underscore
    * prefix — parquet readers ignore it), move the durable pointer,
    * then (and only then) remove the folded parts. */
  def maybeCompact(id: Long): Unit =
    if ((id + 1) % compactEvery == 0) view().foreach { v =>
      // a batch replaying after its own pointer move must not read
      // v<id> while overwriting it — divert to a sibling path
      val preferred = s"$root/v$id"
      val out =
        if (readPtr().contains(preferred)) s"$root/v${id}c"
        else preferred
      // every part on disk is in the new snapshot's lineage: either
      // folded right now, or already folded into the prior snapshot
      // this one subsumes
      val folded = listParts(None)
        .map(p => java.nio.file.Paths.get(p).getFileName.toString)
      v.write.mode("overwrite").parquet(out)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(out, "_folded"), folded.mkString("\n"))
      LsmState.writePointerAtomic(latestFile, out)
      // only after the pointer is durable; a crash here leaves
      // parts the manifest already masks out of every view
      listParts(None).foreach(LsmState.deleteRecursively)
    }

  /** Final folded state — what callers hand to readers once the
    * stream drains. */
  def result(): DataFrame = view().getOrElse(
    sys.error(s"no state at $root: stream produced no batches"))
}

private[streaming] object LsmState {

  /** Atomically publish a pointer: temp file + ATOMIC_MOVE so readers
    * see the old path or the new, never a truncated one; the temp is
    * removed if the move fails (no-op after a successful move). */
  def writePointerAtomic(
      latestFile: java.nio.file.Path, value: String): Unit = {
    val tmp = java.nio.file.Files.createTempFile(
      latestFile.getParent, "_latest", ".tmp")
    try {
      java.nio.file.Files.writeString(tmp, value)
      java.nio.file.Files.move(tmp, latestFile,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally {
      java.nio.file.Files.deleteIfExists(tmp)
      ()
    }
  }

  def deleteRecursively(path: String): Unit = {
    val dir = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(dir)) {
      val files = java.nio.file.Files.walk(dir)
      try files.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally files.close()
    }
  }
}

/** The bucketed-table sibling of [[LsmState]] for band/bucket INDEX
  * state (p14's MinHash bands, p15/p17's hyperplane bands): one
  * bucketed+sorted table per fold, APPENDED per micro-batch.
  *
  * WHY a table and not LSM parquet parts like the sibling state: the
  * band table is the stored side of every later batch's cross-probe
  * equi-join — the one join in these folds whose left side is
  * O(index), not O(batch). From plain parquet that side re-shuffles
  * EVERY batch once the batch outgrows the broadcast threshold (the
  * 100 TB regime); a bucketed scan reports its hash partitioning, so
  * only the O(batch) probe side exchanges. And appending to ONE
  * bucketed table (each writer task splits its output into bucket
  * files; the spec is validated against the existing table) keeps the
  * per-batch band write O(batch) — the round-9 versioned-table form
  * rewrote the whole O(index) band set every batch.
  *
  * Replay discipline: appends are NOT naturally idempotent, so each
  * batch leaves a marker file after its append and a replaying batch
  * skips the append when its marker exists. The residual window (died
  * after the append, before the marker) can duplicate one batch's
  * band rows: candidate pairs stay exact — every pair generator
  * dedups its per-batch candidates — and the duplicate rows are inert
  * index bloat bounded by crash count, not corpus size.
  *
  * Lifecycle: the table name is a SHA-256 digest of the fold's base
  * dir (collision-proof across concurrent folds, unlike a 32-bit
  * hashCode), so a restarted fold on the same base resumes the same
  * table. Short-lived callers (the verification wrappers) drop the
  * table once the fold's result is materialized ([[drop]]); a
  * production fold keeps it for the life of the pipeline and drops it
  * at decommission. */
private[graft] final class BandState(
    spark: SparkSession,
    base: String,
    bucketCols: Seq[String],
    numBuckets: Int = 8) {

  val table: String = BandState.tableName(base)
  private val marksDir = java.nio.file.Paths.get(base, "band_marks")

  /** The accumulated band index, or None before the first append.
    * Refreshes the relation first: the per-batch appends run through
    * the micro-batch's CLONED session, whose write-side cache
    * invalidation doesn't reach this session's cached file listing —
    * without the refresh a cross-probe silently scans a stale band
    * set and misses cross-batch candidates. */
  def scan(): Option[DataFrame] =
    if (spark.catalog.tableExists(table)) {
      spark.catalog.refreshTable(table)
      Some(spark.table(table))
    } else None

  /** Append one batch's bands, marker-guarded for replay idempotence.
    * The first append clears any stale managed location a crashed
    * prior JVM left behind (its catalog entry died with it). */
  def append(id: Long, bands: DataFrame): Unit = {
    val mark = marksDir.resolve(s"b$id")
    if (!java.nio.file.Files.exists(mark)) {
      if (!spark.catalog.tableExists(table))
        Streams.dropManagedTable(spark, table)
      bands.write
        .bucketBy(numBuckets, bucketCols.head, bucketCols.drop(1): _*)
        .sortBy(bucketCols.head, bucketCols.drop(1): _*)
        .mode("append").saveAsTable(table)
      java.nio.file.Files.createDirectories(marksDir)
      java.nio.file.Files.write(mark, Array.emptyByteArray)
      ()
    }
  }

  def drop(): Unit = Streams.dropManagedTable(spark, table)
}

private[graft] object BandState {
  /** Collision-proof fold-scoped table name: first 16 hex chars of
    * SHA-256(base) — two folds on different base dirs can never race
    * on one table the way a 32-bit hashCode could. */
  def tableName(base: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(base.getBytes("UTF-8"))
    s"graft_bands_${digest.take(8).map("%02x".format(_)).mkString}"
  }
}
