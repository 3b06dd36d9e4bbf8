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
}
