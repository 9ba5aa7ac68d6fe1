package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import java.sql.Date

class ExportSpec extends SparkSpec {
  import spark.implicits._

  test("publish formats dates and projects the publish subset in order") {
    val df = Seq((1, Date.valueOf("2024-02-28"), "x", 9.9))
      .toDF("id", "fecha", "keep", "drop_me")
    val got = Export.publish(df, Seq("fecha"), "yyyy/MM/dd",
      Seq("fecha", "id", "keep"))
    assert(got.columns.toSeq == Seq("fecha", "id", "keep"))
    assert(got.as[(String, Int, String)].first() == (("2024/02/28", 1, "x")))
  }

  test("csv round-trips with header; singleFile yields one part") {
    val dir = Files.createTempDirectory("export").toString + "/out"
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Export.csv(df, dir, singleFile = true)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length == 1)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.as[(String, String)].collect().toSet ==
      Set(("1", "a"), ("2", "b")))
  }
}
