package graft.plans

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

class CharShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private def native(c: org.apache.spark.sql.Column, k: Int) =
    GraftBridge.column(CharShingleHashes(GraftBridge.expression(c), k, 8))

  test("matches hashing the declarative shingle array (ascii + unicode)") {
    val df = Seq("abcdef", "ab", "", "añejo café").toDF("t")
    val ref = df.select(col("t"), TextFunctions.shingleHashes(
      TextFunctions.shinglesAll(col("t"), 3)).as("r"))
      .as[(String, Seq[Long])].collect().toMap
    val got = df.select(col("t"), native(col("t"), 3).as("g"))
      .as[(String, Seq[Long])].collect().toMap
    ref.foreach { case (t, r) => assert(got(t) == r, s"text '$t'") }
  }

  test("short text yields empty, k=1 hashes every char") {
    val got = Seq(("xy")).toDF("t")
      .select(native(col("t"), 5), native(col("t"), 1))
      .as[(Seq[Long], Seq[Long])].first()
    assert(got._1.isEmpty && got._2.length == 2)
  }
}
