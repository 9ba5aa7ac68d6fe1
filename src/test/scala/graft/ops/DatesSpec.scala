package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DatesSpec extends SparkSpec {
  import spark.implicits._

  test("parseRefDate parses the sliced JS format with offset, coerces " +
      "garbage to null") {
    val got = Seq("Mon Jan 05 2024 10:00:00 GMT-0500 (hora)", "garbage")
      .toDF("s")
      .select(Dates.parseRefDate(col("s"), 5).cast("string"))
      .as[Option[String]].collect()
    assert(got(0).contains("2024-01-05 15:00:00"))
    assert(got(1).isEmpty)
  }

  test("edad buckets match the reference day thresholds") {
    val got = Seq(0, 29, 30, 364, 365, 800).toDF("d")
      .select(col("d"), Dates.edadNum(col("d")),
        Dates.edadUnit(col("d")))
      .as[(Int, Long, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(0) == ((0L, "Días")))
    assert(got(29) == ((29L, "Días")))
    assert(got(30) == ((1L, "Meses")))
    assert(got(364) == ((12L, "Meses")))
    assert(got(365) == ((1L, "Años")))
    assert(got(800) == ((2L, "Años")))
  }
}
