package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("v").desc, col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("g"), col("rn"), col("id"))
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val tk = TopKAgg.topK(k)
    df.groupBy(col("g")).agg(tk(col("v"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rn"),
        col("col._2").as("id"))
  }

  test("aggregator top-k equals the window form, ties broken on id") {
    val rows = for {
      g <- 1 to 7; i <- 1 to 40
    } yield (g.toLong, ((g * 31 + i * 17) % 13).toLong, (g * 1000 + i).toLong)
    val df = rows.toDF("g", "v", "id") // heavy ties: v has 13 values
    for (k <- Seq(1, 3, 5, 50)) { // k > group size must also work
      val expected = windowTopK(df, k).collect().map(_.toSeq).toSet
      val got = aggTopK(df, k).collect().map(_.toSeq).toSet
      assert(got == expected, s"k=$k mismatch")
    }
  }

  test("empty input and single-row groups") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("g", "v", "id")
    assert(aggTopK(empty, 3).count() == 0)
    val single = Seq((1L, 5L, 10L)).toDF("g", "v", "id")
    assert(aggTopK(single, 3).as[(Long, Int, Long)].collect().toSeq ==
      Seq((1L, 1, 10L)))
  }

  test("plans as ObjectHashAggregate with a partial merge before the exchange") {
    val df = Seq((1L, 2L, 3L)).toDF("g", "v", "id")
    val p = aggTopK(df, 5).queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"not object-hash:\n$p")
    // partial aggregate must sit below the exchange: the k-bound
    // happens map-side, which is the whole point at scale
    val lines = p.linesIterator.toSeq
    val exchIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val partialIdx = lines.lastIndexWhere(_.contains("ObjectHashAggregate"))
    assert(exchIdx >= 0 && partialIdx > exchIdx,
      s"no partial aggregate below the exchange:\n$p")
  }
}
