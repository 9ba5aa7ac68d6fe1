package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedTypeCounts over a MemoryStream equals the batch result") {
    implicit val sq = spark.sqlContext
    val data = Seq(
      (ts("2024-01-01 00:05:00"), "click", 1.0, 1L),
      (ts("2024-01-01 00:20:00"), "click", 2.0, 1L),
      (ts("2024-01-01 00:40:00"), "view", 3.0, 2L),
      (ts("2024-01-01 01:10:00"), "click", 4.0, 1L))
    val stream = MemoryStream[(Timestamp, String, Double, Long)]
    stream.addData(data: _*)
    val events = stream.toDF()
      .toDF("ts", "event_type", "value", "user_id")
    val q = StreamingOps.windowedTypeCounts(events, "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("win_counts")
      .select(col("win_start"), col("event_type"), col("n_events"),
        col("sum_value").cast("double"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val batch = StreamingOps.windowedTypeCounts(
        data.toDF("ts", "event_type", "value", "user_id"),
        "30 minutes", "1 hour")
      .select(col("win_start"), col("event_type"), col("n_events"),
        col("sum_value").cast("double"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(batch.contains((ts("2024-01-01 00:00:00"), "click", 2L, 3.0)))
  }

  test("sessionWindowCounts groups events within the gap") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    stream.addData(
      (ts("2024-01-01 00:00:00"), 1L),
      (ts("2024-01-01 00:10:00"), 1L), // same session (gap 30m)
      (ts("2024-01-01 02:00:00"), 1L)) // new session
    val events = stream.toDF().toDF("ts", "user_id")
    val q = StreamingOps.sessionWindowCounts(events, "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("sess_counts")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_counts")
      .select("user_id", "n_events").as[(Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 1L), (1L, 2L)))
  }
}
