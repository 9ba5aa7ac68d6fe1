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

  test("publish takes dotted/spaced column names literally (reference's publish list)") {
    val df = Seq((Date.valueOf("2024-01-05"), "dx0", "qx", 1L))
      .toDF("FECHA_FACT", "DX_PRINCIPAL.0", "GRUPO QX", "validacion")
    val got = Export.publish(df, Seq("FECHA_FACT"), "yyyy/MM/dd",
      Seq("FECHA_FACT", "DX_PRINCIPAL.0", "GRUPO QX", "validacion"))
    assert(got.columns.toSeq ==
      Seq("FECHA_FACT", "DX_PRINCIPAL.0", "GRUPO QX", "validacion"))
    assert(got.as[(String, String, String, Long)].first() ==
      (("2024/01/05", "dx0", "qx", 1L)))
    // and the reference's full xlsx publish works over such names
    val path = Files.createTempDirectory("pub").resolve("out.xlsx").toString
    Export.xlsx(got, path)
    val back = BatchLoad.promoteHeader(Xlsx.read(spark, Seq(path)))
    assert(back.columns.toSeq ==
      Seq("FECHA_FACT", "DX_PRINCIPAL.0", "GRUPO QX", "validacion"))
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
