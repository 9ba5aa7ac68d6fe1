package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed containment join equals the naive non-equi join") {
    val rnd = new Random(13)
    val points = (1 to 400).map(i => (i.toLong, rnd.nextInt(100000).toLong))
      .toDF("pid", "pt")
    val intervals = (1 to 60).map { i =>
      val s = rnd.nextInt(95000).toLong
      (i.toLong, s, s + rnd.nextInt(8000).toLong)
    }.toDF("iv_id", "s", "e")
    val bucketed = RangeJoin
      .bucketedRangeJoin(points, "pt", intervals, "s", "e", 3000L)
      .select("pid", "iv_id").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
        col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iv_id").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("each matching (point, interval) pair appears exactly once") {
    val points = Seq((1L, 50L)).toDF("pid", "pt")
    // interval spans many buckets; the point must still match once
    val intervals = Seq((7L, 0L, 1000L)).toDF("iv_id", "s", "e")
    val got = RangeJoin
      .bucketedRangeJoin(points, "pt", intervals, "s", "e", 10L)
      .select("pid", "iv_id").collect()
    assert(got.length == 1)
  }

  test("the bucketed plan is an equi-join, not a nested loop") {
    val points = Seq((1L, 5L)).toDF("pid", "pt")
    val intervals = Seq((1L, 0L, 10L)).toDF("iv_id", "s", "e")
    val plan = RangeJoin
      .bucketedRangeJoin(points, "pt", intervals, "s", "e", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
