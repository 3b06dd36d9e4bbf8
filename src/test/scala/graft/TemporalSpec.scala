package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gap, counts events per session") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 10:10:00"), 101L),
      (1L, ts("2024-01-01 11:30:00"), 102L), // > 30 min gap -> new session
      (2L, ts("2024-01-01 09:00:00"), 103L)
    ).toDF("user_id", "ts", "event_id")
    val res = Temporal.sessionize(events, "user_id", "ts", "event_id", 1800L)
      .orderBy("user_id", "session_id").collect()
    assert(res.length == 3)
    assert(res(0).getAs[Long]("n_events") == 2) // user 1 session 1
    assert(res(1).getAs[Long]("n_events") == 1) // user 1 session 2
    assert(res(2).getAs[Long]("n_events") == 1) // user 2
  }

  test("sessionPaths builds ordered first-k paths and ranks them") {
    val events = Seq(
      // user 1, session 1: a > b > c (and a 4th event that must drop)
      (1L, ts("2024-01-01 10:00:00"), 100L, "a"),
      (1L, ts("2024-01-01 10:05:00"), 101L, "b"),
      (1L, ts("2024-01-01 10:10:00"), 102L, "c"),
      (1L, ts("2024-01-01 10:15:00"), 103L, "d"),
      // user 1, session 2 (gap > 30 min): a > b
      (1L, ts("2024-01-01 12:00:00"), 104L, "a"),
      (1L, ts("2024-01-01 12:01:00"), 105L, "b"),
      // user 2: a > b > c again — paths count across users
      (2L, ts("2024-01-01 09:00:00"), 106L, "a"),
      (2L, ts("2024-01-01 09:01:00"), 107L, "b"),
      (2L, ts("2024-01-01 09:02:00"), 108L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val res = Temporal
      .sessionPaths(events, "user_id", "ts", "event_id", "event_type",
        1800L, depth = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(res.toSeq == Seq(("a>b>c", 2L), ("a>b", 1L)),
      s"unexpected paths: ${res.toSeq}")
  }

  test("asofBackward picks latest right <= left ts, ties to max value") {
    val left = Seq(
      (1L, ts("2024-01-05 00:00:00"), 900L),
      (1L, ts("2024-01-01 00:00:00"), 901L), // exactly at right ts: <= match
      (2L, ts("2024-01-05 00:00:00"), 902L), // key without right rows
      (1L, ts("2023-12-31 00:00:00"), 903L)  // before all right rows -> null
    ).toDF("k", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L),
      (1L, ts("2024-01-01 00:00:00"), 11L), // tie: max orderkey wins
      (1L, ts("2024-01-04 00:00:00"), 12L)
    ).toDF("k", "ts", "o_orderkey")
    val res = Temporal.asofBackward(left, right, "k", "ts", "o_orderkey")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("matched_o_orderkey"))).toMap
    assert(res(900L).contains(12L))
    assert(res(901L).contains(11L))
    assert(res(902L).isEmpty)
    assert(res(903L).isEmpty)
  }

  test("custom AsOfJoinExec matches the composed form exactly") {
    val events = Tables.load(spark, sfDir, "events")
      .select(col("user_id").as("k"), col("ts"), col("event_id"))
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey").as("k"), col("o_orderdate").as("ts"),
        col("o_orderkey"))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "matched_o_orderkey").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val composed = toMap(
      Temporal.asofBackward(events, orders, "k", "ts", "o_orderkey"))
    val native = toMap(
      Temporal.asofBackwardExec(events, orders, "k", "ts", "o_orderkey"))
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("custom AsOfJoinExec handles ties, misses and empty keys") {
    val left = Seq(
      (1L, ts("2024-01-05 00:00:00"), 900L),
      (1L, ts("2024-01-01 00:00:00"), 901L),
      (2L, ts("2024-01-05 00:00:00"), 902L),
      (1L, ts("2023-12-31 00:00:00"), 903L)
    ).toDF("k", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L),
      (1L, ts("2024-01-01 00:00:00"), 11L),
      (1L, ts("2024-01-04 00:00:00"), 12L)
    ).toDF("k", "ts", "o_orderkey")
    val res = Temporal.asofBackwardExec(left, right, "k", "ts", "o_orderkey")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("matched_o_orderkey"))).toMap
    assert(res(900L).contains(12L))
    assert(res(901L).contains(11L))
    assert(res(902L).isEmpty)
    assert(res(903L).isEmpty)
  }

  test("asof query matches per-event latest-order semantics on testdata") {
    val events = Tables.load(spark, sfDir, "events")
      .select(col("user_id").as("k"), col("ts"), col("event_id"))
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey").as("k"), col("o_orderdate").as("ts"),
        col("o_orderkey"))
    val res = Temporal.asofBackward(events, orders, "k", "ts", "o_orderkey")
    assert(res.count() == events.count())
  }

  test("resampleDailyFill: grid complete, gaps forward-filled, pre-history null") {
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00"), 100L, 5.0),
      (1L, ts("2024-01-02 12:00:00"), 101L, 7.0), // later same day wins
      (1L, ts("2024-01-04 09:00:00"), 102L, 9.0), // Jan 3 gap -> carries 7.0
      (2L, ts("2024-01-03 08:00:00"), 103L, 1.0)  // Jan 1-2 pre-history null
    ).toDF("user_id", "ts", "event_id", "value")
    val got = Temporal
      .resampleDailyFill(events, "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    // grid: 2 users x 3 days (Jan 2..4)
    assert(got.size == 6)
    assert(got((1L, "2024-01-02")).contains(7.0))
    assert(got((1L, "2024-01-03")).contains(7.0)) // gap filled
    assert(got((1L, "2024-01-04")).contains(9.0))
    assert(got((2L, "2024-01-02")).isEmpty) // before first event
    assert(got((2L, "2024-01-03")).contains(1.0))
    assert(got((2L, "2024-01-04")).contains(1.0))
  }

  test("rangeJoin matches the naive inequality join, bounds inclusive") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 11:00:00"))
    ).toDF("lid", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00")), // == lower bound of lid 1
      (11L, ts("2024-01-01 10:30:00")), // == upper bound of lid 1
      (12L, ts("2024-01-01 10:30:00.000001")), // 1 us past lid 1's window
      (13L, ts("2024-01-01 09:59:59.999999")), // 1 us before: out
      (14L, ts("2024-01-01 11:29:00")) // in for lid 2
    ).toDF("rid", "r_ts")
    val got = Temporal.rangeJoin(left, "ts", right, "r_ts",
        0L, 30L * 60L * 1000000L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 14L)))
  }

  test("rangeJoin agrees with naive cross-filter on testdata, no BNL plan") {
    val ev = Tables.load(spark, sfDir, "events")
    val l = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("lid"), col("ts"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("rid"), col("ts").as("r_ts"))
    val win = 30L * 60L * 1000000L
    val binned = Temporal.rangeJoin(l, "ts", r, "r_ts", 0L, win)
    val naive = l.join(r,
      unix_micros(col("r_ts")) >= unix_micros(col("ts")) &&
        unix_micros(col("r_ts")) <= unix_micros(col("ts")) + win)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val gotPairs = pairs(binned)
    assert(gotPairs == pairs(naive))
    assert(gotPairs.nonEmpty, "degenerate fixture: no in-window pairs")
    // a matching pair must appear exactly once despite the bin explode
    assert(binned.count() == gotPairs.size.toLong)
    val exec = binned.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val bad = exec.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bad.isEmpty, s"range join fell back to a quadratic plan:\n$exec")
  }
}
