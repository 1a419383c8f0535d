package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.streaming.StreamOps

/** Streaming variants must agree with their batch counterparts when the
  * finite parquet source is fully drained. */
class StreamingSpec extends AnyFunSuite with SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("streaming tumbling counts == batch tumbling counts") {
    val q = StreamOps.runToMemory(
      StreamOps.tumblingCounts(StreamOps.eventsStream(spark, dir)),
      "stream_tumbling")
    try {
      val streamed = spark.table("stream_tumbling")
        .select("win_start", "event_type", "n")
      val batch = Tables.events(spark, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("win_start"), col("event_type"), col("n"))
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("streaming session windows produce per-user sessions") {
    val q = StreamOps.runToMemory(
      StreamOps.sessionCounts(StreamOps.eventsStream(spark, dir)),
      "stream_sessions")
    try {
      val out = spark.table("stream_sessions")
      assert(out.count() > 0)
      // session event counts cover all events exactly once
      val total = out.agg(sum(col("n_events"))).head().getLong(0)
      assert(total == Tables.events(spark, dir).count())
    } finally q.stop()
  }
}

class StreamingStateSpec extends AnyFunSuite with SparkSpec {
  test("flatMapGroupsWithState user stats == batch GROUP BY") {
    val dir = "/root/testdata/sf0.001"
    implicit val s = spark
    val out = StreamOps.drainToBatch(
      StreamOps.userStats(StreamOps.eventsStream(spark, dir)), "update")
    val batch = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"))
    assert(out.count() > 0)
    assert(out.exceptAll(batch).isEmpty && batch.exceptAll(out).isEmpty)
  }
}

class StreamingDedupSpec extends AnyFunSuite with SparkSpec {
  test("stateful streaming dedup leaves distinct event ids") {
    val dir = "/root/testdata/sf0.001"
    implicit val s = spark
    val out = StreamOps.drainToBatch(
      StreamOps.dedupedEvents(StreamOps.eventsStream(spark, dir)),
      outputMode = "append")
    val n = Tables.events(spark, dir).select("event_id", "ts").distinct().count()
    assert(out.count() == n)
  }
}
