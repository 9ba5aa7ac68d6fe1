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

  test("comprobar composition publishes the exact csv bytes") {
    // the reference's second output: lookup-miss rows → distinct →
    // name split → publish subset → single-file header'd csv
    // (capital_sendas.py:273-318, :602-603)
    import graft.ops.EtlOps.RichDF
    import graft.ops.Names
    import org.apache.spark.sql.functions._
    val capital = Seq(
      (1L, "MARIA DE LA CRUZ PEREZ"),
      (1L, "MARIA DE LA CRUZ PEREZ"), // duplicate row → one csv line
      (2L, "JUAN GOMEZ"),
      (3L, "ANA SOL RIOS"))
      .toDF("doc", "nombre_completo")
    val bases = Seq((2L, "ips-a"), (2L, "ips-b")).toDF("doc", "ips")
    val comprobar = capital
      .firstMatchJoin(bases, Seq("doc"), Seq(col("ips")))
      .filter(col("ips").isNull)
      .select(col("doc"), col("nombre_completo")).distinct()
      .withColumn("p", Names.splitFullName(col("nombre_completo")))
      .select(col("doc"), col("p.nombre1").as("nombre1"),
        col("p.nombre2").as("nombre2"),
        col("p.apellido1").as("apellido1"),
        col("p.apellido2").as("apellido2"))
    val published = Export.publish(comprobar, Nil, "yyyy/MM/dd",
      Seq("doc", "nombre1", "nombre2", "apellido1", "apellido2"))
      .orderBy("doc")
    val dir = Files.createTempDirectory("comprobar").toString + "/out"
    Export.csv(published.coalesce(1).sortWithinPartitions("doc"), dir,
      singleFile = true)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val bytes = new String(Files.readAllBytes(part.toPath), "UTF-8")
    // empty strings are written quoted ("") — distinct from null (,)
    assert(bytes ==
      """doc,nombre1,nombre2,apellido1,apellido2
        |1,MARIA,"",DE LA CRUZ,PEREZ
        |3,ANA,"",SOL,RIOS
        |""".stripMargin)
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
