package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

class QualitySpec extends SparkSuite {
  import spark.implicits._

  test("expectAll counts each violation class in one scan") {
    val df = Seq((1, Some("a")), (2, None), (-3, Some("b")))
      .toDF("x", "s")
    val rep = Quality.expectAll(df, Seq(
        "x_positive" -> (col("x") <= 0),
        "s_not_null" -> col("s").isNull))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("x_positive" -> 1L, "s_not_null" -> 1L))
    // fused: exactly one aggregate pass over the source
    val aggs = Quality.expectAll(df, Seq(
        "a" -> (col("x") <= 0), "b" -> col("s").isNull))
      .queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
    assert(aggs.size == 1, s"expected one fused aggregate, got $aggs")
  }

  test("expectAll on an empty table reports zero violations, not null") {
    val rep = Quality.expectAll(Seq.empty[Int].toDF("x"),
        Seq("x_positive" -> (col("x") <= 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("x_positive" -> 0L))
  }

  test("expectUnique counts rows beyond the first per key") {
    val df = Seq(1, 1, 1, 2, 3, 3).toDF("k")
    val rep = Quality.expectUnique(df, "k_unique", Seq("k")).head()
    assert(rep.getString(0) == "k_unique" && rep.getLong(1) == 3L)
  }

  test("expectReferential counts orphans, ignoring NULL child keys") {
    val child = Seq(Some(1), Some(2), None, Some(9)).toDF("ck")
    val parent = Seq(1, 2, 3).toDF("pk")
    val rep = Quality
      .expectReferential(child, parent, "ck_ref", "ck", "pk").head()
    assert(rep.getString(0) == "ck_ref" && rep.getLong(1) == 1L,
      s"only the orphan 9 counts: $rep")
  }

  test("audit unions checks and flags pass/fail") {
    val df = Seq(1, -1).toDF("x")
    val rep = Quality.audit(Seq(
        Quality.expectAll(df, Seq("neg" -> (col("x") < 0))),
        Quality.expectUnique(df, "uniq", Seq("x"))))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(rep == Map("neg" -> "fail", "uniq" -> "pass"))
  }
}
