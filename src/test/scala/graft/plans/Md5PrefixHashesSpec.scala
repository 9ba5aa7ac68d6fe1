package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

class Md5PrefixHashesSpec extends SparkSpec {
  import spark.implicits._

  private def native(c: org.apache.spark.sql.Column, hexLen: Int) =
    GraftBridge.column(Md5PrefixHashes(GraftBridge.expression(c), hexLen))

  test("matches the conv(substring(md5)) expression tree at 8 and 15 " +
      "hex chars") {
    val df = Seq(Seq("abc", "", "ünïcode", "x")).toDF("arr")
    for (len <- Seq(8, 15)) {
      val ref = df.select(transform(col("arr"), s =>
        conv(substring(md5(s), 1, len), 16, 10).cast("long")).as("r"))
        .as[Seq[Long]].first()
      val got = df.select(native(col("arr"), len).as("g"))
        .as[Seq[Long]].first()
      assert(got == ref, s"hexLen=$len")
    }
  }

  test("null elements stay null; empty array stays empty") {
    val df = Seq((Seq(Option("a"), None), Seq.empty[String]))
      .toDF("a", "b")
    val got = df.select(native(col("a"), 8), native(col("b"), 8))
      .as[(Seq[Option[Long]], Seq[Long])].first()
    assert(got._1(0).isDefined && got._1(1).isEmpty)
    assert(got._2.isEmpty)
  }
}
