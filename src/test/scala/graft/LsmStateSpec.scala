package graft

import org.apache.spark.sql.functions._

import graft.streaming.LsmState

/** Direct unit coverage of the LSM fold state store, independent of
  * the streaming folds built on it: for arbitrary append/compact
  * interleavings the folded view must equal the direct fold of every
  * delta ever appended — the store's one invariant. */
class LsmStateSpec extends SparkSuite {

  private def delta(rng: scala.util.Random, n: Int) = {
    import spark.implicits._
    Seq.fill(n)((rng.nextInt(20).toLong, rng.nextInt(100).toLong))
      .toDF("k", "v")
  }

  test("fold(view) equals fold(all deltas) under every compaction cadence") {
    val rng = new scala.util.Random(42)
    for (cadence <- Seq(1, 2, 3, 10)) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_lsm_prop_$cadence").toString
      val st = new LsmState(spark, root,
        _.groupBy("k").agg(sum(col("v")).as("v")), cadence)
      val deltas = (0 until 5).map(i => delta(rng, 10 + rng.nextInt(20)))
      deltas.zipWithIndex.foreach { case (d, i) =>
        st.append(i.toLong, d)
        st.maybeCompact(i.toLong)
      }
      val got = st.result().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = deltas.reduce(_ unionByName _)
        .groupBy("k").agg(sum(col("v")).as("v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"cadence $cadence diverged")
      // cadence 1 compacts every batch: no live parts remain
      if (cadence == 1) {
        val parts = Option(new java.io.File(s"$root/parts").listFiles())
          .map(_.map(_.getName).count(_.startsWith("b"))).getOrElse(0)
        assert(parts == 0, s"cadence-1 left $parts parts")
      }
      // snapshot retirement: at most ONE v* dir survives any number
      // of compactions — superseded snapshots are dead storage
      val vdirs = Option(new java.io.File(root).listFiles())
        .map(_.map(_.getName).filter { n =>
          val id = n.stripSuffix("c").drop(1)
          n.startsWith("v") && id.nonEmpty && id.forall(_.isDigit)
        }.toSeq).getOrElse(Nil)
      assert(vdirs.length <= 1,
        s"cadence $cadence left superseded snapshots: $vdirs")
    }
  }

  test("view(except) hides exactly the named batch's part") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_lsm_except").toString
    val st = new LsmState(spark, root, identity, compactEvery = 10)
    st.append(0, Seq((1L, "a")).toDF("id", "v"))
    st.append(1, Seq((2L, "b")).toDF("id", "v"))
    val without = st.view(except = Some(1L)).get
      .collect().map(_.getLong(0)).toSet
    assert(without == Set(1L), s"except view: $without")
    val full = st.view().get.collect().map(_.getLong(0)).toSet
    assert(full == Set(1L, 2L))
    // except of a batch id with no part is a no-op
    assert(st.view(except = Some(9L)).get.count() == 2L)
  }

  test("refresh() lets a detached reader observe a foreign writer's appends") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_lsm_refresh").toString
    val writer = new LsmState(spark, root, identity, compactEvery = 2)
    writer.append(0, Seq((1L, "a")).toDF("id", "v"))
    val reader = new LsmState(spark, root, identity, compactEvery = 2)
    assert(reader.result().count() == 1L)
    // the reader's control state is cached as of first read: a
    // foreign append is invisible until refresh()
    writer.append(1, Seq((2L, "b")).toDF("id", "v"))
    assert(reader.result().count() == 1L,
      "detached reader must be stable-as-of-first-read before refresh")
    reader.refresh()
    assert(reader.result().count() == 2L,
      "refresh must re-read pointer, parts, and manifest")
  }

  test("re-appending a batch id overwrites, never duplicates (replay contract)") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_lsm_replay").toString
    val st = new LsmState(spark, root, identity, compactEvery = 10)
    st.append(0, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    st.append(0, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(st.result().count() == 2L, "replayed append duplicated rows")
  }

  test("crash between pointer move and part cleanup: manifest masks folded parts") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_lsm_crash_parts").toString
    val st = new LsmState(spark, root, identity, compactEvery = 2)
    st.append(0, Seq((1L, "a")).toDF("id", "v"))
    st.append(1, Seq((2L, "b")).toDF("id", "v"))
    st.maybeCompact(1)
    // simulate the crash window: resurrect a folded part AFTER the
    // pointer moved (as if cleanup never ran) — the snapshot's
    // _folded manifest must mask it out of every view
    Seq((1L, "a")).toDF("id", "v").write
      .mode("overwrite").parquet(s"$root/parts/b0")
    val ids = st.result().collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == Seq(1L, 2L),
      s"a manifest-listed part was double-presented: $ids")
    // and the next compaction reaps it for good
    st.append(2, Seq((3L, "c")).toDF("id", "v"))
    st.append(3, Seq((4L, "d")).toDF("id", "v"))
    st.maybeCompact(3)
    val parts = Option(new java.io.File(s"$root/parts").listFiles())
      .map(_.map(_.getName).count(_.startsWith("b"))).getOrElse(0)
    assert(parts == 0, s"crash-window part survived the next compaction")
    assert(st.result().count() == 4L)
  }

  test("crash between pointer move and retirement: next sweep reaps stale snapshots") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_lsm_crash_vers").toString
    val st = new LsmState(spark, root, identity, compactEvery = 2)
    st.append(0, Seq((1L, "a")).toDF("id", "v"))
    st.append(1, Seq((2L, "b")).toDF("id", "v"))
    st.maybeCompact(1)
    // simulate: a superseded snapshot the retirement sweep never
    // reached (pointer does not name it)
    Seq((9L, "stale")).toDF("id", "v").write
      .mode("overwrite").parquet(s"$root/v0")
    // views resolve through the pointer alone — stale dir invisible
    assert(!st.result().collect().map(_.getLong(0)).contains(9L))
    st.append(2, Seq((3L, "c")).toDF("id", "v"))
    st.append(3, Seq((4L, "d")).toDF("id", "v"))
    st.maybeCompact(3)
    val vdirs = new java.io.File(root).listFiles()
      .map(_.getName).filter { n =>
        val id = n.stripSuffix("c").drop(1)
        n.startsWith("v") && id.nonEmpty && id.forall(_.isDigit)
      }.toSeq
    assert(vdirs.length == 1,
      s"stale snapshot survived the next retirement sweep: $vdirs")
    assert(st.result().count() == 4L)
  }

  test("empty-state result raises; empty view is None") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lsm_empty").toString
    val st = new LsmState(spark, root, identity)
    assert(st.view().isEmpty)
    val e = intercept[RuntimeException](st.result())
    assert(e.getMessage.contains("no state"))
  }
}
