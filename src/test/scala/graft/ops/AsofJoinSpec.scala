package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof attaches the most recent right row ≤ left ts per key") {
    val left = Seq((1, 5, "e1"), (1, 10, "e2"), (1, 2, "e0"), (2, 7, "x"))
      .toDF("k", "t", "ev")
    val right = Seq((1, 3, 100L), (1, 7, 200L), (2, 9, 300L))
      .toDF("rk", "rt", "payload")
    val got = AsofJoin.asof(left, right, "k", "rk", "t", "rt",
        Seq("payload"))
      .select("ev", "payload").as[(String, Option[Long])].collect().toMap
    assert(got == Map("e0" -> None, // before any right row
      "e1" -> Some(100L), "e2" -> Some(200L),
      "x" -> None)) // key 2's only right row is later
  }

  test("equal timestamps match (right sorts before left)") {
    val left = Seq((1, 5, "e")).toDF("k", "t", "ev")
    val right = Seq((1, 5, 42L)).toDF("rk", "rt", "p")
    val got = AsofJoin.asof(left, right, "k", "rk", "t", "rt", Seq("p"))
      .select("p").as[Option[Long]].first()
    assert(got.contains(42L))
  }
}
