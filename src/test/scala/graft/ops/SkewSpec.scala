package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the unsalted join result") {
    // heavily skewed: 90% of facts share key 1
    val facts = ((1 to 90).map(i => (1, s"f$i")) ++
      (1 to 10).map(i => (i + 1, s"g$i"))).toDF("k", "payload")
    val dim = (1 to 11).map(i => (i, s"d$i")).toDF("k", "attr")
    val plain = facts.join(dim, Seq("k")).select("k", "payload", "attr")
      .as[(Int, String, String)].collect().toSet
    val salted = Skew.saltedJoin(facts, dim, "k", "payload", 8)
      .select("k", "payload", "attr")
      .as[(Int, String, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 100)
  }

  test("left joins preserve unmatched fact rows") {
    val facts = Seq((1, "a"), (2, "b")).toDF("k", "p")
    val dim = Seq((1, "d")).toDF("k", "attr")
    val got = Skew.saltedJoin(facts, dim, "k", "p", 4, "left")
      .select("k", "attr").as[(Int, Option[String])].collect().toSet
    assert(got == Set((1, Some("d")), (2, None)))
  }
}
