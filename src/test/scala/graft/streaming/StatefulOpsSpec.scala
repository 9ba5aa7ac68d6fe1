package graft.streaming

import graft.SparkSpec
import graft.ops.EtlOps.RichDF
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    ("u1", ts("2024-01-01 00:00:00"), "e1"),
    ("u1", ts("2024-01-03 00:00:00"), "e2"), // gap 2d  -> 0
    ("u1", ts("2024-01-06 00:00:00"), "e3"), // gap 5d  -> 1
    ("u2", ts("2024-01-02 00:00:00"), "e4")) // first   -> 1

  test("streaming gap marks equal the batch gapMark operator") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(String, Timestamp, String)]
    stream.addData(rows: _*)
    val q = StatefulOps.gapMarkStream(
        stream.toDF().toDF("k", "ts", "id"), 3)
      .writeStream.format("memory").queryName("gap_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("gap_stream")
      .as[(String, Int)].collect().toMap
    val batch = rows.toDF("k", "ts", "id")
      .gapMark(Seq("k"), "ts", "id", 3, "flag")
      .select("id", "flag").as[(String, Int)].collect().toMap
    assert(streamed == batch)
    assert(batch == Map("e1" -> 1, "e2" -> 0, "e3" -> 1, "e4" -> 1))
  }

  test("state carries across micro-batches") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(String, Timestamp, String)]
    val q = StatefulOps.gapMarkStream(
        stream.toDF().toDF("k", "ts", "id"), 3)
      .writeStream.format("memory").queryName("gap_stream2")
      .outputMode("append").start()
    stream.addData(("u1", ts("2024-01-01 00:00:00"), "a"))
    q.processAllAvailable()
    stream.addData(("u1", ts("2024-01-02 00:00:00"), "b"), // 1d after marked a -> 0
      ("u1", ts("2024-01-09 00:00:00"), "c")) // 8d -> 1
    q.processAllAvailable()
    q.stop()
    val got = spark.table("gap_stream2").as[(String, Int)].collect().toMap
    assert(got == Map("a" -> 1, "b" -> 0, "c" -> 1))
  }
}
