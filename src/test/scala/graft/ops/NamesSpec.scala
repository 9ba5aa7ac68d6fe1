package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NamesSpec extends SparkSpec {
  import spark.implicits._

  private def split(names: String*): Map[String, (String, String, String, String)] =
    names.toDF("n")
      .withColumn("p", Names.splitFullName(col("n")))
      .select(col("n"), col("p.nombre1"), col("p.nombre2"),
        col("p.apellido1"), col("p.apellido2"))
      .as[(String, String, String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("plain token counts map to reference positions") {
    val m = split("JUAN", "JUAN PEREZ", "JUAN PEREZ GOMEZ",
      "JUAN CARLOS PEREZ GOMEZ", "JUAN CARLOS LUIS PEREZ GOMEZ")
    assert(m("JUAN") == (("JUAN", "", "", "")))
    assert(m("JUAN PEREZ") == (("JUAN", "", "PEREZ", "")))
    assert(m("JUAN PEREZ GOMEZ") == (("JUAN", "", "PEREZ", "GOMEZ")))
    assert(m("JUAN CARLOS PEREZ GOMEZ") ==
      (("JUAN", "CARLOS", "PEREZ", "GOMEZ")))
    // >4 parts: middles join as nombre2, last two are apellidos
    assert(m("JUAN CARLOS LUIS PEREZ GOMEZ") ==
      (("JUAN", "CARLOS LUIS", "PEREZ", "GOMEZ")))
  }

  test("particles glue to the following token, including runs") {
    val m = split(
      "MARIA DE LA CRUZ PEREZ",     // DE LA CRUZ is one part (3 parts)
      "JUAN DEL VALLE",             // DEL VALLE one part (2 parts)
      "ANA DE LOS RIOS DE LA CRUZ") // two glued groups (3 parts)
    assert(m("MARIA DE LA CRUZ PEREZ") ==
      (("MARIA", "", "DE LA CRUZ", "PEREZ")))
    assert(m("JUAN DEL VALLE") == (("JUAN", "", "DEL VALLE", "")))
    assert(m("ANA DE LOS RIOS DE LA CRUZ") ==
      (("ANA", "", "DE LOS RIOS", "DE LA CRUZ")))
  }

  test("trailing particle runs are dropped; all-particle names degrade " +
      "to empties") {
    val m = split("JUAN PEREZ DE", "DE LA")
    assert(m("JUAN PEREZ DE") == (("JUAN", "", "PEREZ", "")))
    assert(m("DE LA") == (("", "", "", "")))
  }
}
