package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("redact masks all occurrences of every class, in order") {
    val df = Seq(
      (1L, "mail a@b.com and c.d@e.org call +1-555-0100 now"),
      (2L, "no pii here"),
      (3L, "tricky a@b.co end"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      Redact.redact(col("text")).as("r")).as[(Long, String)]
      .collect().toMap
    assert(got(1L) == "mail <EMAIL> and <EMAIL> call <PHONE> now")
    assert(got(2L) == "no pii here")
    assert(got(3L) == "tricky <EMAIL> end")
  }

  test("report counts per class on sequentially-redacted text") {
    val df = Seq((1L, "a@b.com x@y.org +1-555-0100 +4-999-1234"))
      .toDF("doc_id", "text")
    val row = Redact.report(df, "text", "doc_id")
      .select("n_0", "n_1", "redacted").as[(Int, Int, String)].head()
    assert(row._1 == 2 && row._2 == 2)
    assert(row._3 == "<EMAIL> <EMAIL> <PHONE> <PHONE>")
  }

  test("phone pattern needs a leading + and 8+ tail chars") {
    val df = Seq((1L, "+1-555-0100 ok, 555-0100 bare, +12 short"))
      .toDF("doc_id", "text")
    val r = df.select(Redact.redact(col("text")).as("r")).as[String].head()
    assert(r == "<PHONE> ok, 555-0100 bare, +12 short")
  }
}
