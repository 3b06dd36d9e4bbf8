package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal
import graft.streaming.Streams

class StreamsSpec extends SparkSuite {

  test("stateful session counts equal the window-function form") {
    val stateful = Streams.statefulSessionCounts(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val windowed = Temporal.sessionize(
        Tables.load(spark, sfDir, "events"), "user_id", "ts", "event_id", 1800L)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Number]("user_id").longValue ->
        r.getAs[Long]("n")).toMap
    assert(stateful == windowed)
  }

  test("streaming tumbling counts equal batch group-by") {
    val streamed = Streams.tumblingCounts(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n")).toMap
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n")).toMap
    assert(streamed == batch)
  }
}
