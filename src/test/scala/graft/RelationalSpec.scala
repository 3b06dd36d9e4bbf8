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
}
