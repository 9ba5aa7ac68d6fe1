package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RulesSpec extends SparkSpec {
  import spark.implicits._

  test("chainUpdate: later rules overwrite earlier, unmatched keep init") {
    val df = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("t", "n")
    val got = Rules.chainUpdate(df, "v", lit(0), Seq(
        (col("t") === "a", lit(10)),
        (col("n") <= 2, lit(20)))) // overlaps "a" — must win
      .select("t", "v").as[(String, Int)].collect().toMap
    assert(got == Map("a" -> 20, "b" -> 20, "c" -> 0))
  }

  test("priorityPick: first predicate any row satisfies wins; no-match " +
      "groups vanish") {
    val df = Seq(
      ("g1", "ped", 10), ("g1", "neutral", 1), // pred0 matches -> ped
      ("g2", "neutral", 2), ("g2", "neutral", 1), // pred2 -> first by order
      ("g3", "gyn", 5)) // no predicate matches -> dropped
      .toDF("g", "kind", "ord")
    val got = Rules.priorityPick(df, Seq("g"),
        Seq(col("kind") === "ped", col("kind") === "neutral"),
        Seq(col("ord")))
      .select("g", "kind", "ord").as[(String, String, Int)].collect().toSet
    assert(got == Set(("g1", "ped", 10), ("g2", "neutral", 1)))
  }

  test("semiMarker flags groups containing a marker row") {
    val df = Seq((1, "x"), (1, "m"), (2, "y")).toDF("g", "s")
    val got = Rules.semiMarker(df, "g", col("s") === "m", "has")
      .select("g", "s", "has").as[(Int, String, Boolean)].collect().toSet
    assert(got == Set((1, "x", true), (1, "m", true), (2, "y", false)))
  }

  test("semiMarkerWindow is result-identical to the join form") {
    val df = Seq((1, "x"), (1, "m"), (2, "y"), (3, "m")).toDF("g", "s")
    val joinForm = Rules.semiMarker(df, "g", col("s") === "m", "has")
      .select("g", "s", "has").as[(Int, String, Boolean)].collect().toSet
    val winForm = Rules.semiMarkerWindow(df, "g", col("s") === "m", "has")
      .select("g", "s", "has").as[(Int, String, Boolean)].collect().toSet
    assert(winForm == joinForm)
    assert(winForm == Set((1, "x", true), (1, "m", true),
      (2, "y", false), (3, "m", true)))
  }
}
