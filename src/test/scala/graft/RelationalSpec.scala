package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** snapshotDiff semantics: classification, changed-column lists,
  * NULL-key handling, and the change-sized output contract. */
class RelationalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val snapA = Seq(
    (Some(1L), "ACME", 10.0),   // unchanged
    (Some(2L), "BETA", 20.0),   // value change
    (Some(3L), "GAMM", 30.0),   // removed in B
    (Some(4L), "DELT", 40.0),   // both columns change
    (None: Option[Long], "NULL-KEY", 1.0) // NULL key, changed
  ).toDF("k", "name", "bal")

  private lazy val snapB = Seq(
    (Some(1L), "ACME", 10.0),
    (Some(2L), "BETA", 25.0),
    (Some(4L), "DELTA", 44.0),
    (Some(5L), "NEW", 50.0),    // added in B
    (None: Option[Long], "NULL-KEY2", 1.0)
  ).toDF("k", "name", "bal")

  private lazy val diff = Relational
    .snapshotDiff(snapA, snapB, Seq("k"), Seq("name", "bal"))
    .collect()
    .map(r => Option(r.get(0)).map(_.toString).getOrElse("null") ->
      (r.getString(1), r.getString(2))).toMap

  test("classifies added, removed and changed rows") {
    assert(diff.get("1").isEmpty, "identical rows must be dropped")
    assert(diff("2") == ("changed", "bal"))
    assert(diff("3") == ("removed", ""))
    assert(diff("4") == ("changed", "name,bal"))
    assert(diff("5") == ("added", ""))
  }

  test("NULL keys join to each other, not to 'added'+'removed'") {
    assert(diff("null") == ("changed", "name"),
      s"NULL key must null-safe-join across snapshots: $diff")
  }

  test("null value vs value is a change; null vs null is not") {
    val a = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "v")
    val b = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "v")
    val d = Relational.snapshotDiff(a, b, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed"), s"got $d")
  }

  test("diff of a snapshot against itself is empty") {
    assert(Relational.snapshotDiff(snapA, snapA, Seq("k"),
      Seq("name", "bal")).isEmpty)
  }

  test("applyChangeset(A, changes) reproduces snapshot B exactly") {
    // the exact changeset that turns snapA into snapB, incl. the
    // NULL-key upsert and a delete
    val changes = Seq(
      (Some(2L), "BETA", 25.0, false),
      (Some(4L), "DELTA", 44.0, false),
      (None: Option[Long], "NULL-KEY2", 1.0, false),
      (Some(3L), "GAMM", 30.0, true),   // delete
      (Some(5L), "NEW", 50.0, false)    // insert
    ).toDF("k", "name", "bal", "is_delete")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (Option(r.get(0)), r.getString(1), r.getDouble(2))).toSet
    val merged = Relational.applyChangeset(snapA, changes,
      Seq("k"), Seq("name", "bal"))
    assert(rows(merged) == rows(snapB),
      s"merge diverged from the target snapshot:\n${rows(merged)}")
  }

  private lazy val snapStack = Seq(
    // key 1: A -> A -> B   (one change)
    (1L, Some("A"), "d1"), (1L, Some("A"), "d2"), (1L, Some("B"), "d3"),
    // key 2: stable        (one open interval)
    (2L, Some("X"), "d1"), (2L, Some("X"), "d2"), (2L, Some("X"), "d3"),
    // key 3: null -> C     (null-safe change detection)
    (3L, None: Option[String], "d1"), (3L, Some("C"), "d2"),
    // key 4: appears late  (first snapshot opens the interval)
    (4L, Some("Z"), "d3")
  ).toDF("k", "seg", "dt")

  test("scdHistory emits one row per attribute-state interval") {
    val rows = Relational.scdHistory(snapStack, Seq("k"), Seq("seg"), "dt")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("null"),
        r.getString(2), Option(r.getString(3)).getOrElse("open")))
      .toSet
    assert(rows == Set(
      (1L, "A", "d1", "d3"), (1L, "B", "d3", "open"),
      (2L, "X", "d1", "open"),
      (3L, "null", "d1", "d2"), (3L, "C", "d2", "open"),
      (4L, "Z", "d3", "open")), s"got $rows")
  }

  test("scdHistory plans ONE shuffle for both windows") {
    val hist = Relational.scdHistory(snapStack, Seq("k"), Seq("seg"), "dt")
    val exec = hist.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val shuffles = exec.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.size == 1,
      s"change-lag and interval-lead must reuse one key partitioning:\n$exec")
  }
}
