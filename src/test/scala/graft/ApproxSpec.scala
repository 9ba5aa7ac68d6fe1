package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates for the scales where exact is the wrong trade:
  * at 100 TB an exact count-distinct shuffles every key; the HLL++
  * sketch is one pass, mergeable, and a few percent off. These specs
  * pin the accuracy contract (rsd default 5%) against exact counts on
  * real tables so the sketch path is tested, not just available. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact on real key columns") {
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey")) {
      val (approx, exact) = Tables(spark, dir, "lineitem")
        .agg(approx_count_distinct(col(c)).as("a"),
          countDistinct(col(c)).as("e"))
        .as[(Long, Long)].head()
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.05, s"$c: approx=$approx exact=$exact err=$err")
    }
  }

  test("approx percentile within one bucket of exact median on cents") {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val (approx, exact) = Tables(spark, dir, "orders")
      .agg(percentile_approx(cents, lit(0.5), lit(10000)).as("a"),
        median(cents).as("e"))
      .as[(Long, Double)].head()
    assert(math.abs(approx - exact) / exact < 0.01,
      s"approx=$approx exact=$exact")
  }
}
