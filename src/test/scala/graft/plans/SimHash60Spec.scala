package graft.plans

import graft.SparkSpec
import graft.text.SimHash
import org.apache.spark.sql.functions._

class SimHash60Spec extends SparkSpec {
  import spark.implicits._

  test("native simhash matches the 60-fold declarative form") {
    val texts = Seq("the quick brown fox", "a a a b",
      "", "solo", "many different words in this one here")
    val df = texts.toDF("t")
      .withColumn("hs", SimHash.tokenHashes(col("t")))
    val got = df.select(col("t"),
        SimHash.simhashFromHashes(col("hs")).as("native"),
        SimHash.simhashFromHashesFold(col("hs")).as("fold"))
      .as[(String, Long, Long)].collect()
    got.foreach { case (t, n, f) => assert(n == f, s"text '$t'") }
    assert(got.find(_._1 == "").exists(_._2 == 0L))
  }
}
